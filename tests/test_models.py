"""ANN model persistence (operators/models.py): train once, persist as
parquet model tables, reload bit-identically — the 100 TB lifecycle
(one bounded-sample training job, then weeks of encode/search jobs
answering from persisted state, like the sketch state tables).

The load-side contract under test: a LOADED model folds the identical
double literals into encode/search plans, so every downstream result is
bit-identical to the freshly-trained model's — not merely close."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.catalog import load_table
from data_engineering_nd_datalake_project_4_spark.operators import models
from data_engineering_nd_datalake_project_4_spark.operators.similarity import (
    ivfpq_adc_topk,
    ivfpq_encode,
    ivfpq_train,
    kmeans,
    pq_adc_topk,
    pq_encode,
    pq_train,
)


def _emb(spark, sf_dir, n=200):
    return (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < n)
        .select("vec_id", "embedding")
    )


def test_pq_model_roundtrip_bit_identical_search(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    cbs = pq_train(emb, m=4, k=8, iters=3)
    path = str(tmp_path / "pq_model")
    models.save_pq_model(spark, cbs, path)
    loaded = models.load_pq_model(spark, path)

    # the model itself round-trips exactly (Python float -> parquet
    # DOUBLE -> Python float is the identity on IEEE doubles)
    assert loaded == cbs

    # and therefore the whole serve path is bit-identical: same codes,
    # same ADC distances, same ranking
    queries = emb.filter(F.col("vec_id") < 3)
    fresh = pq_adc_topk(pq_encode(emb, cbs), queries, cbs, k=5).orderBy(
        "query_id", "adc_dist", "neighbor_id"
    )
    served = pq_adc_topk(pq_encode(emb, loaded), queries, loaded, k=5).orderBy(
        "query_id", "adc_dist", "neighbor_id"
    )
    assert fresh.collect() == served.collect()


def test_ivfpq_model_roundtrip_bit_identical_search(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    coarse, cbs = ivfpq_train(emb, nlist=4, m=4, k=8, iters=3)
    path = str(tmp_path / "ivfpq_model")
    models.save_ivfpq_model(spark, coarse, cbs, path)
    lcoarse, lcbs = models.load_ivfpq_model(spark, path)
    assert lcoarse == coarse
    assert lcbs == cbs

    queries = emb.filter(F.col("vec_id") < 3)
    fresh = ivfpq_adc_topk(
        ivfpq_encode(emb, coarse, cbs), queries, coarse, cbs, k=5, nprobe=2
    ).orderBy("query_id", "adc_dist", "neighbor_id")
    served = ivfpq_adc_topk(
        ivfpq_encode(emb, lcoarse, lcbs), queries, lcoarse, lcbs, k=5, nprobe=2
    ).orderBy("query_id", "adc_dist", "neighbor_id")
    assert fresh.collect() == served.collect()


def test_kmeans_model_roundtrip_bit_identical_assignments(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    assigned, centroids = kmeans(emb, "vec_id", "embedding", k=4, iters=2)
    path = str(tmp_path / "km_model")
    models.save_kmeans_model(spark, centroids, path)
    loaded = models.load_kmeans_model(spark, path)
    assert loaded == centroids


def test_empty_models_roundtrip(spark, sf_dir, tmp_path):
    """The `empty` soak contract extends to model state: a model trained
    on zero vectors persists and reloads as the typed empty model (zero
    centroid rows read back under DECLARED schemas — an inferred read of
    an empty dir would fail UNABLE_TO_INFER_SCHEMA)."""
    none = _emb(spark, sf_dir).filter(F.lit(False))
    cbs = pq_train(none, m=4, k=8, iters=2)
    assert cbs == []
    p1 = str(tmp_path / "pq_empty")
    models.save_pq_model(spark, cbs, p1)
    assert models.load_pq_model(spark, p1) == []

    coarse, books = ivfpq_train(none, nlist=4, m=4, k=8, iters=2)
    assert (coarse, books) == ([], [])
    p2 = str(tmp_path / "ivfpq_empty")
    models.save_ivfpq_model(spark, coarse, books, p2)
    assert models.load_ivfpq_model(spark, p2) == ([], [])


def test_model_kind_and_shape_validation(spark, sf_dir, tmp_path):
    emb = _emb(spark, sf_dir)
    cbs = pq_train(emb, m=4, k=8, iters=2)
    path = str(tmp_path / "pq_as_km")
    models.save_pq_model(spark, cbs, path)
    with pytest.raises(ValueError, match="want kmeans"):
        models.load_kmeans_model(spark, path)
    with pytest.raises(ValueError, match="want ivfpq"):
        models.load_ivfpq_model(spark, path)
    with pytest.raises(ValueError, match="unknown model kind"):
        models.save_model(spark, str(tmp_path / "x"), "faiss", codebooks=cbs)
    with pytest.raises(ValueError, match="kmeans persists centroids"):
        models.save_model(spark, str(tmp_path / "x"), "kmeans", codebooks=cbs)

    # torn model: meta promises more codebook entries than the table has
    torn = str(tmp_path / "torn")
    models.save_pq_model(spark, cbs, torn)
    spark.createDataFrame(
        [("pq", 4, 99, None, 64)], models._META_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(f"{torn}/meta.parquet")
    with pytest.raises(ValueError, match="torn"):
        models.load_pq_model(spark, torn)


def test_overwrite_republish(spark, sf_dir, tmp_path):
    """Retrain-and-republish: a second save at the same path fully
    replaces the first model."""
    emb = _emb(spark, sf_dir)
    path = str(tmp_path / "republish")
    cbs_a = pq_train(emb, m=4, k=8, iters=1)
    cbs_b = pq_train(emb, m=4, k=4, iters=2)
    assert cbs_a != cbs_b
    models.save_pq_model(spark, cbs_a, path)
    models.save_pq_model(spark, cbs_b, path)
    assert models.load_pq_model(spark, path) == cbs_b
