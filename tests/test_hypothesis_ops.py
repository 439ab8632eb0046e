"""Randomized property tests (hypothesis): operator semantics vs a pandas
reference model on arbitrary small inputs. Few examples, tiny data — each
example runs real Spark jobs."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators.dedup import (
    canonical_text_key,
    latest_per_key,
)

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),   # key
        st.integers(min_value=0, max_value=50),  # ts
        st.integers(min_value=0, max_value=9),   # id (tie-break)
    ),
    min_size=1,
    max_size=30,
)


def _spark():
    from data_engineering_nd_datalake_project_4_spark.session import get_spark

    return get_spark(app_name="tests", shuffle_partitions=8)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(ROWS)
def test_latest_per_key_matches_pandas_reference(rows):
    spark = _spark()
    df = spark.createDataFrame(rows, "k INT, ts INT, id INT")
    got = {
        (r["k"], r["ts"], r["id"])
        for r in latest_per_key(df, ["k"], [F.desc("ts"), F.desc("id")]).collect()
    }
    pdf = pd.DataFrame(rows, columns=["k", "ts", "id"])
    ref = {
        tuple(g.sort_values(["ts", "id"], ascending=False).iloc[0])
        for _, g in pdf.groupby("k")
    }
    assert got == ref


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]), min_size=1, max_size=6),
        min_size=1,
        max_size=15,
    )
)
def test_canonical_key_is_permutation_invariant(token_lists):
    spark = _spark()
    texts = [" ".join(toks) for toks in token_lists]
    reversed_texts = [" ".join(reversed(toks)) for toks in token_lists]
    df = spark.createDataFrame(
        list(zip(texts, reversed_texts)), "t1 STRING, t2 STRING"
    ).select(
        canonical_text_key("t1").alias("k1"), canonical_text_key("t2").alias("k2")
    )
    assert df.filter(F.col("k1") != F.col("k2")).count() == 0


def test_udtf_chunking_matches_catalyst_chunking(spark, sf_dir):
    """The Python UDTF and the pure-Catalyst chunk_tokens must emit the
    same (doc_id, chunk_idx, start, chunk) rows — lateral-join the UDTF,
    compare set-equal."""
    from data_engineering_nd_datalake_project_4_spark.catalog import load_table
    from data_engineering_nd_datalake_project_4_spark.functions.udfs import ChunkTokensUDTF
    from data_engineering_nd_datalake_project_4_spark.operators.text import chunk_tokens

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("udtf_docs")
    spark.udtf.register("chunk_tokens_udtf", ChunkTokensUDTF)
    via_udtf = spark.sql(
        """SELECT d.doc_id, c.chunk_idx, c.start, c.chunk
           FROM udtf_docs d, LATERAL chunk_tokens_udtf(d.text, 32, 24) c"""
    )
    via_catalyst = chunk_tokens(docs, "text", "doc_id", size=32, stride=24).select(
        "doc_id", "chunk_idx", "start", "chunk"
    )
    a = {tuple(r) for r in via_udtf.collect()}
    b = {tuple(r) for r in via_catalyst.collect()}
    assert a == b and len(a) > 0


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=25),
    st.integers(min_value=10, max_value=60),
)
def test_pack_first_fit_matches_python_reference(sizes, target):
    """First-fit packing on one shard must equal the sequential Python
    reference for arbitrary doc-size sequences and targets."""
    from data_engineering_nd_datalake_project_4_spark.operators.packing import pack_first_fit

    spark = _spark()
    # doc_id = 8*i keeps every doc in shard 0 (id % 8) with id order = i order
    rows = [(8 * i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_first_fit(df, "text", "doc_id", target, n_shards=8).collect()
    }
    ref, pid, filled = {}, 0, 0
    for i, n in enumerate(sizes):
        if filled > 0 and filled + n > target:
            pid += 1
            filled = 0
        ref[8 * i] = pid
        filled += n
    assert got == ref


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"]), min_size=0, max_size=12),
    st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "zz"]), min_size=1, max_size=12),
)
def test_incremental_dedup_matches_set_model(corpus_texts, batch_texts):
    """Survivors == batch docs whose text is neither in the corpus set nor
    earlier in the batch — checked against a plain Python set model."""
    import tempfile

    from data_engineering_nd_datalake_project_4_spark.operators import incremental

    spark = _spark()
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus_texts)] or [(0, "__seed__")],
        "doc_id LONG, text STRING",
    )
    batch = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(batch_texts)], "doc_id LONG, text STRING"
    )
    with tempfile.TemporaryDirectory() as tmp:
        store = tmp + "/store"
        incremental.build_fingerprint_store(corpus, "text", "doc_id", store)
        got = sorted(
            r["doc_id"]
            for r in incremental.incremental_dedup(
                spark, batch, "text", "doc_id", store
            ).collect()
        )
    seen = set(corpus_texts) | ({"__seed__"} if not corpus_texts else set())
    ref = []
    for i, t in enumerate(batch_texts):
        if t not in seen:
            ref.append(100 + i)
            seen.add(t)
    assert got == sorted(ref)


# --- span dedup vs a python reference model ---------------------------------

SPAN_DOCS = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=12
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


def _span_model(texts, n=3, min_docs=2):
    """Python reference: per-doc span stats + scrubbed text."""
    toks = {i: t.split(" ") for i, t in enumerate(texts) if t is not None}
    spans = {}  # gram -> set of doc ids
    per_doc = {}
    for i, tk in toks.items():
        if len(tk) < n:
            continue
        per_doc[i] = [tuple(tk[s : s + n]) for s in range(len(tk) - n + 1)]
        for g in per_doc[i]:
            spans.setdefault(g, set()).add(i)
    dup = {g for g, ids in spans.items() if len(ids) >= min_docs}
    stats, scrub = {}, {}
    for i, tk in toks.items():
        covered = set()
        n_spans = n_dup = 0
        for s, g in enumerate(per_doc.get(i, [])):
            n_spans += 1
            if g in dup:
                n_dup += 1
                covered.update(range(s, s + n))
        if n_spans:
            stats[i] = (n_spans, n_dup)
        kept = [t for p, t in enumerate(tk) if p not in covered]
        scrub[i] = (" ".join(kept), len(tk), len(tk) - len(kept))
    return stats, scrub


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(SPAN_DOCS)
def test_span_family_matches_python_model(texts):
    from data_engineering_nd_datalake_project_4_spark.operators import text as T

    spark = _spark()
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id INT, text STRING")
    stats_m, scrub_m = _span_model(texts, n=3, min_docs=2)

    got_stats = {
        r["doc_id"]: (r["n_spans"], r["n_dup_spans"])
        for r in T.duplicate_spans(df, n=3, min_docs=2).collect()
    }
    assert got_stats == stats_m

    got_scrub = {
        r["doc_id"]: (r["new_text"], r["n_tokens"], r["n_removed_tokens"])
        for r in T.strip_duplicate_spans(df, n=3, min_docs=2).collect()
    }
    assert got_scrub == scrub_m
