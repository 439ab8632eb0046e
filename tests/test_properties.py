"""Property checks (SURVEY.md §5.2) — invariants that need no oracle, plus
recall properties for the probabilistic operators (MinHashLSH, SimHash, IVF)
against exact ground truth on planted duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.catalog import load_table
from data_engineering_nd_datalake_project_4_spark.operators import dedup, similarity
from data_engineering_nd_datalake_project_4_spark.operators.dedup import (
    canonical_text_key,
    minhash_lsh_candidate_pairs,
    simhash64,
)


def test_distinct_idempotent(spark, sf_dir):
    d = load_table(spark, sf_dir, "customer")
    once = d.distinct()
    twice = once.distinct()
    assert once.count() == twice.count()


def test_semi_anti_partition_left(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    semi = c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi")
    anti = c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
    assert semi.count() + anti.count() == c.count()
    assert semi.intersect(anti).count() == 0


def test_rollup_total_equals_plain_agg(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    rolled = (
        o.rollup("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("o_orderstatus").isNull())
        .collect()
    )
    assert rolled[0]["n"] == o.count()


def test_exact_dedup_by_hash_equals_dropduplicates(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    by_hash = dedup.exact_dedup_by_hash(d, "text", [F.asc("doc_id")])
    assert by_hash.count() == d.dropDuplicates(["text"]).count()


@pytest.fixture(scope="module")
def planted_dup_pairs(spark, sf_dir):
    """Ground truth: pairs of docs sharing the canonical token-set key
    (TESTDATA plants 25 such groups at sf0.001)."""
    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(F.col("doc_id"), canonical_text_key("text").alias("k"))
    a = keyed.select(F.col("doc_id").alias("id_a"), F.col("k").alias("ka"))
    b = keyed.select(F.col("doc_id").alias("id_b"), F.col("k").alias("kb"))
    pairs = (
        a.join(b, (F.col("ka") == F.col("kb")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
        .collect()
    )
    assert len(pairs) > 0, "testdata should contain planted near-dup groups"
    return {(r["id_a"], r["id_b"]) for r in pairs}


def test_minhash_lsh_full_recall_on_identical_token_sets(spark, sf_dir, planted_dup_pairs):
    """Docs with IDENTICAL token sets have identical unigram MinHash
    signatures → identical band hashes → recall must be 1.0 (this is a
    deterministic property, not a probabilistic bound)."""
    d = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidate_pairs(d, "text", "doc_id", num_hashes=32, bands=8, shingle_n=1)
    got = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    missed = planted_dup_pairs - got
    assert not missed, f"LSH missed {len(missed)} planted pairs: {sorted(missed)[:5]}"


def test_prefix_filter_candidates_are_exact_superset(spark, sf_dir):
    """Prefix filtering is EXACT: its candidate set must contain every pair
    with jaccard >= t (guaranteed by construction, unlike LSH banding), and
    chaining it into ngram_jaccard_pairs must reproduce the all-pairs result
    verbatim — this is what lets q34 keep its exact all-pairs oracle."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    full = dedup.ngram_jaccard_pairs(d, "text", "doc_id", n=1, threshold=0.8)
    truth = {(r["id_a"], r["id_b"]) for r in full.collect()}

    cand = dedup.prefix_filter_candidate_pairs(d, "text", "doc_id", n=1, threshold=0.8)
    cset = {(r["id_a"], r["id_b"]) for r in cand.collect()}
    missed = truth - cset
    assert not missed, f"prefix filter missed true pairs: {sorted(missed)[:5]}"

    chained = dedup.ngram_jaccard_pairs(
        d, "text", "doc_id", n=1, threshold=0.8, candidates=cand
    )
    got = {(r["id_a"], r["id_b"]) for r in chained.collect()}
    assert got == truth


def test_prefix_filter_orders_verify_to_identical_pairs(spark, sf_dir):
    """The two global shingle orders — 'df' (ascending document
    frequency, the PPJoin ordering that keeps candidate buckets flat as
    the corpus grows; the round-10 second-decade fix) and 'hash'
    (order-by-value) — are both valid total orders, so both candidate
    sets are exact supersets and verification lands on the SAME final
    pair set. The df order must also produce no more candidates than
    hash on a skew-heavy corpus (its entire point)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())

    results = {}
    counts = {}
    for order in ("df", "hash"):
        cand = dedup.prefix_filter_candidate_pairs(
            d, "text", "doc_id", n=3, threshold=0.8, order=order
        )
        counts[order] = cand.count()
        verified = dedup.ngram_jaccard_pairs(
            d, "text", "doc_id", n=3, threshold=0.8, candidates=cand
        )
        results[order] = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    assert results["df"] == results["hash"]
    assert counts["df"] <= counts["hash"], counts


def test_simhash_banding_equals_all_pairs(spark, sf_dir):
    """Pigeonhole banding (k = max_hamming+1 bands) must reproduce the
    all-pairs hamming<=d result EXACTLY — a pair within d bit flips cannot
    differ in every one of d+1 bands. This is what lets q36 use the
    bucketed join without changing its declared semantics."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    fp = dedup.simhash_fingerprints(d, "text", "doc_id", shingle_n=1)
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fb"))
    truth = {
        (r["id_a"], r["id_b"], r["h"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dedup.hamming64(F.col("fa"), F.col("fb")).alias("h"))
        .filter(F.col("h") <= 8)
        .collect()
    }
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_near_dup_pairs(fp, "doc_id", "fp", max_hamming=8).collect()
    }
    assert banded == truth


def test_simhash_zero_distance_on_identical_token_sets(spark, sf_dir, planted_dup_pairs):
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", simhash64(F.col("text"), shingle_n=1).alias("fp"))
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fb"))
    ids = list({i for p in planted_dup_pairs for i in p})
    joined = (
        a.filter(F.col("id_a").isin(ids))
        .join(b.filter(F.col("id_b").isin(ids)), F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dedup.hamming64(F.col("fa"), F.col("fb")).alias("h"))
        .collect()
    )
    dist = {(r["id_a"], r["id_b"]): r["h"] for r in joined}
    for pair in planted_dup_pairs:
        assert dist[pair] == 0, f"identical token sets must simhash identically: {pair}"


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    exact = similarity.brute_force_topk(emb, qs, k=5)
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    exploded = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = (
        exploded.groupBy("label", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(F.col("label").alias("centroid_id"), F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )
    approx = similarity.ivf_topk(emb, qs, cent, k=5, nprobe=3)
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    # testdata embeddings are unclustered (max pairwise cosine ~0.33), so
    # label-centroid IVF recall ≈ bucket coverage ≈ nprobe/K = 0.3; with
    # clustered data recall would approach 1. Assert better-than-floor.
    assert recall >= 0.25, f"IVF nprobe=3/10 recall {recall:.2f} below coverage floor"


def test_rp_bucket_preserves_identical_vectors(spark, sf_dir):
    """Identical embeddings must land in the same sign-LSH bucket."""
    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    doubled = emb.union(emb)
    b = similarity.random_projection_buckets(doubled, "embedding", n_bits=8)
    n_per_vec = b.groupBy("vec_id").agg(F.countDistinct("rp_bucket").alias("nb")).collect()
    assert all(r["nb"] == 1 for r in n_per_vec)


def test_union_except_roundtrip(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").select("c_nationkey").distinct()
    s = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("c_nationkey")
    ).distinct()
    u = c.union(s).distinct()
    assert u.subtract(c).subtract(s).count() == 0
    assert u.count() >= max(c.count(), s.count())


def test_winnowing_fingerprints_edit_robustness(spark):
    """Winnowing claim: a single-token edit changes at most `window`
    window-hashes, so the selected-fingerprint sets of the original and the
    edited doc overlap heavily."""
    from data_engineering_nd_datalake_project_4_spark.operators.text import winnowing_fingerprints

    base = " ".join(f"tok{i}" for i in range(200))
    edited = " ".join(("XXX" if i == 100 else f"tok{i}") for i in range(200))
    df = spark.createDataFrame([(1, base), (2, edited)], "doc_id INT, text STRING")
    fps = {r["doc_id"]: set(r["fingerprints"]) for r in
           winnowing_fingerprints(df, "text", "doc_id", window=5, keep_mod=4).collect()}
    inter = len(fps[1] & fps[2])
    union = len(fps[1] | fps[2])
    assert union > 0 and inter / union > 0.7, (inter, union)


def test_operators_handle_empty_input(spark):
    """Every core operator must be a no-op (not an error) on empty input."""
    from data_engineering_nd_datalake_project_4_spark.operators.dedup import (
        canonical_near_dedup_groups,
        latest_per_key,
        minhash_lsh_candidate_pairs,
    )
    from data_engineering_nd_datalake_project_4_spark.operators.text import word_counts
    from data_engineering_nd_datalake_project_4_spark.operators.similarity import brute_force_topk

    empty_docs = spark.createDataFrame([], "doc_id LONG, text STRING")
    empty_events = spark.createDataFrame([], "user_id LONG, ts TIMESTAMP, event_id LONG")
    empty_vecs = spark.createDataFrame([], "vec_id LONG, embedding ARRAY<FLOAT>")

    assert word_counts(empty_docs, "text").count() == 0
    assert canonical_near_dedup_groups(empty_docs, "text", "doc_id").count() == 0
    assert minhash_lsh_candidate_pairs(empty_docs, "text", "doc_id").count() == 0
    assert latest_per_key(empty_events, ["user_id"], [F.desc("ts")]).count() == 0
    assert brute_force_topk(empty_vecs, empty_vecs).count() == 0


def test_blocked_cosine_equals_catalyst_kernel(spark, sf_dir):
    """The blocked-matmul scale path must produce the identical pair set to
    the per-pair Catalyst kernel."""
    from data_engineering_nd_datalake_project_4_spark.operators.dedup import embedding_near_dup_pairs
    from data_engineering_nd_datalake_project_4_spark.operators.similarity import blocked_all_pairs_cosine

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    # threshold 0.2: unclustered testdata embeddings max out near cosine 0.33,
    # so higher thresholds would vacuously compare empty sets
    cat = {(r["id_a"], r["id_b"]) for r in
           embedding_near_dup_pairs(emb, "embedding", "vec_id", threshold=0.2).collect()}
    blk = {(r["id_a"], r["id_b"]) for r in
           blocked_all_pairs_cosine(emb, "vec_id", "embedding", threshold=0.2, block_size=64).collect()}
    assert cat == blk and len(cat) > 0
    # block size is a pure physical knob: the sizing discipline must not
    # change the pair set (the --gemm lane runs sized blocks)
    blk2 = {(r["id_a"], r["id_b"]) for r in
            blocked_all_pairs_cosine(emb, "vec_id", "embedding", threshold=0.2, block_size=128).collect()}
    assert blk2 == cat


def test_sized_gemm_block_bounds():
    """sized_gemm_block: power of two, clamped to [256, 2048], monotone
    in N — the exchange constant shrinks as the corpus grows while the
    8·B² kernel matrix stays ≤32 MB (tools/bench_scale.py --gemm)."""
    from data_engineering_nd_datalake_project_4_spark.operators.similarity import sized_gemm_block

    assert sized_gemm_block(0) == 256
    assert sized_gemm_block(5_000) == 256
    assert sized_gemm_block(50_000) == 2048
    assert sized_gemm_block(500_000) == 2048
    prev = 0
    for n in (10, 100, 1_000, 10_000, 100_000, 1_000_000):
        b = sized_gemm_block(n)
        assert 256 <= b <= 2048 and b & (b - 1) == 0 and b >= prev
        prev = b


def test_approx_percentile_accuracy(spark, sf_dir):
    """approx_percentile with accuracy=10000 must sit within a tight rank
    band of the exact percentile at test scale."""
    o = load_table(spark, sf_dir, "orders")
    rows = o.groupBy("o_orderpriority").agg(
        F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000)).alias("approx"),
        F.percentile("o_totalprice", F.lit(0.5)).alias("exact"),
    ).collect()
    for r in rows:
        assert abs(r["approx"] - r["exact"]) / r["exact"] < 0.05, r


def test_stratified_sample_rates(spark, sf_dir):
    from data_engineering_nd_datalake_project_4_spark.operators.dedup import stratified_sample

    d = load_table(spark, sf_dir, "documents")
    frac = {"en": 1.0, "fr": 0.5, "es": 0.5, "de": 0.25, "zh": 0.25}
    before = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    after = {r["lang"]: r["n"] for r in
             stratified_sample(d, "lang", frac, 42).groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, f in frac.items():
        got = after.get(lang, 0) / before[lang]
        assert abs(got - f) < 0.25, (lang, got, f)
    # determinism for fixed seed
    again = {r["lang"]: r["n"] for r in
             stratified_sample(d, "lang", frac, 42).groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert after == again


def test_weighted_corpus_mix(spark, sf_dir):
    from data_engineering_nd_datalake_project_4_spark.operators.dedup import weighted_corpus_mix

    d = load_table(spark, sf_dir, "documents")
    en = d.filter(F.col("lang") == "en")
    zh = d.filter(F.col("lang") == "zh")
    mix = weighted_corpus_mix([(en, 1.0), (zh, 0.3)], seed=7)
    n_en, n_zh = en.count(), zh.count()
    got = {r["lang"]: r["n"] for r in mix.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got["en"] == n_en
    assert 0 < got.get("zh", 0) < n_zh


def test_interval_join_equals_theta_join(spark, sf_dir):
    """Binned interval join must equal the naive range-predicate join."""
    from data_engineering_nd_datalake_project_4_spark.operators.joins import interval_point_join

    e = load_table(spark, sf_dir, "events")
    left = e.filter(F.col("event_id") < 50).select(
        F.col("event_id").alias("l_id"),
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + 600_000_000).alias("t"),
    )
    right = e.select(F.col("event_id").alias("r_id"), F.unix_micros("ts").alias("p"))
    binned = {(r["l_id"], r["r_id"]) for r in
              interval_point_join(left, right, "s", "t", "p", 600_000_000).collect()}
    naive = {(r["l_id"], r["r_id"]) for r in
             left.join(right, (F.col("p") >= F.col("s")) & (F.col("p") <= F.col("t"))).collect()}
    assert binned == naive and len(binned) > 0


def test_connected_components_path_and_islands(spark):
    # path 1-2-3-4-5 (diameter 4 -> needs multiple propagation rounds),
    # triangle 10-11-12, isolated edge 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (21, 20)],
        ["id_a", "id_b"],
    )
    got = {
        (r["node"], r["component"])
        for r in dedup.connected_components(edges).collect()
    }
    want = {(n, 1) for n in (1, 2, 3, 4, 5)} | {
        (n, 10) for n in (10, 11, 12)
    } | {(20, 20), (21, 20)}
    assert got == want


def test_connected_components_empty_edges(spark):
    edges = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup.connected_components(edges).count() == 0


def test_kmeans_matches_numpy_replication(spark, sf_dir):
    """similarity.kmeans is an exact distributed replication of Lloyd's
    algorithm: same deterministic init (k smallest ids), same argmin
    tie-break (first/lowest cluster), so assignments must equal a numpy
    run bit-for-bit (double sums differ only in association order — far
    below any assignment decision boundary on this data)."""
    import numpy as np

    k, iters = 8, 4
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = similarity.kmeans(emb, "vec_id", "embedding", k=k, iters=iters)
    got = {r["id"]: r["cluster"] for r in assigned.collect()}

    rows = sorted(
        ((r["vec_id"], np.array(r["embedding"], dtype=np.float64)) for r in emb.collect()),
        key=lambda t: t[0],
    )
    ids = np.array([t[0] for t in rows])
    X = np.stack([t[1] for t in rows])
    C = X[:k].copy()
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        a = d2.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = X[a == c].mean(axis=0)
    expect = dict(zip(ids.tolist(), a.tolist()))
    assert got == expect
    assert len(centroids) == k and all(len(c) == X.shape[1] for c in centroids)


def test_count_min_sketch_bounds(spark, sf_dir):
    """CMS never underestimates, and overestimates by at most e/width * N
    (within the 1-e^-depth confidence — deterministic here since the hash
    seeds are fixed). Also: merging two half-sketches equals the sketch of
    the union."""
    import math

    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", " ")).alias("token"))
    width, depth = 1024, 5
    cms = sketches.build_cms(tok, "token", width, depth).cache()

    exact = {r["token"]: r["c"] for r in
             tok.groupBy("token").agg(F.count(F.lit(1)).alias("c")).collect()}
    n = sum(exact.values())
    items = tok.distinct()
    est = {r["item"]: r["est"] for r in
           sketches.cms_estimate(cms, items, "token", width, depth).collect()}

    assert set(est) == set(exact)
    bound = math.e / width * n
    for t, c in exact.items():
        assert est[t] >= c, t
        assert est[t] <= c + bound, (t, est[t], c, bound)

    # mergeability: sketch(half1) + sketch(half2) == sketch(all), with the
    # halves a deterministic hash-partition of the data
    tagged = tok.withColumn("__h", F.pmod(F.xxhash64("token"), F.lit(2)))
    a = sketches.build_cms(tagged.filter("__h = 0"), "token", width, depth)
    b = sketches.build_cms(tagged.filter("__h = 1"), "token", width, depth)
    merged = {(r["row"], r["bucket"]): r["cnt"]
              for r in sketches.merge_cms(a, b).collect()}
    whole = {(r["row"], r["bucket"]): r["cnt"] for r in cms.collect()}
    assert merged == whole


def test_cms_weighted_build_and_distinct_probe_equivalence(spark, sf_dir):
    """build_cms(weight_col=) from a pre-aggregated (value, count) frame
    produces the IDENTICAL sketch as the per-instance build, in both hash
    families; cms_estimate(items_distinct=True) on the counts frame gives
    the identical estimates — the one-corpus-pass q94 shape."""
    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    tok = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("n"))
    for hf in ("xxhash64", "portable"):
        plain = {(r["row"], r["bucket"]): r["cnt"]
                 for r in sketches.build_cms(tok, "token", hash_fn=hf).collect()}
        weighted = {(r["row"], r["bucket"]): r["cnt"]
                    for r in sketches.build_cms(
                        counts, "token", hash_fn=hf, weight_col="n").collect()}
        assert plain == weighted, hf
        cms = sketches.build_cms(counts, "token", hash_fn=hf, weight_col="n")
        e1 = {r["item"]: r["est"]
              for r in sketches.cms_estimate(cms, tok, "token", hash_fn=hf).collect()}
        e2 = {r["item"]: r["est"]
              for r in sketches.cms_estimate(
                  cms, counts, "token", hash_fn=hf, items_distinct=True).collect()}
        assert e1 == e2, hf


def test_grouped_heavy_hitters_bounds_and_exact_head(spark):
    """grouped_heavy_hitters: (1) every reported estimate >= the true
    in-group count and every absent candidate reports nothing (CMS
    one-sided error, per group); (2) on a planted Zipfian corpus with a
    wide sketch the per-group top-k IS the exact top-k; (3) the grouped
    sketch has at most depth*width cells per group."""
    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    rows = []
    freqs = {"en": {"the": 40, "cat": 25, "sat": 10, "unique_en": 1},
             "fr": {"le": 50, "chat": 20, "the": 5},
             None: {"mix": 15, "the": 3}}
    for g, fs in freqs.items():
        for tok, c in fs.items():
            rows += [(g, tok)] * c
    df = spark.createDataFrame(rows, "lang string, token string")
    for hf in ("xxhash64", "portable"):
        out = sketches.grouped_heavy_hitters(
            df, "token", ["lang"], k=3, candidate_pool=8, hash_fn=hf
        ).collect()
        got = {}
        for r in out:
            got.setdefault(r["lang"], []).append((r["item"], r["est"]))
        for g, items in got.items():
            for tok, est in items:
                assert est >= freqs[g].get(tok, 0), (hf, g, tok)
        # wide sketch, tiny vocab: no collisions -> exact head per group
        assert [t for t, _ in got["en"]] == ["the", "cat", "sat"], hf
        assert [t for t, _ in got["fr"]] == ["le", "chat", "the"], hf
        assert got[None][0] == ("mix", 15), hf
        # absent-from-group candidates must not appear
        assert all(t != "le" for t, _ in got["en"]), hf
    cms = sketches.build_cms(df, "token", group_cols=["lang"])
    per_group = {r["lang"]: r["c"] for r in
                 cms.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert all(c <= 5 * 2048 for c in per_group.values())


def test_grouped_heavy_hitters_validation(spark):
    import pytest as _pytest

    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    df = spark.createDataFrame([("a", "x")], "g string, v string")
    with _pytest.raises(ValueError, match="candidate_pool"):
        sketches.grouped_heavy_hitters(df, "v", ["g"], k=5, candidate_pool=3)
    with _pytest.raises(ValueError, match="group_cols"):
        sketches.grouped_heavy_hitters(df, "v", [], k=1, candidate_pool=2)


def test_int8_quantization_preserves_cosine(spark, sf_dir, tmp_path):
    """int8-quantized embeddings: codes bounded to [-127,127], cosine of
    the dequantized vector vs the original >= 0.999, and the quantized
    parquet is materially smaller at rest."""
    import os

    from data_engineering_nd_datalake_project_4_spark.functions import cosine_similarity
    from data_engineering_nd_datalake_project_4_spark.operators.similarity import dequantize, quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb, "embedding")
    checked = q.select(
        F.array_max(F.transform("qvec", lambda c: F.abs(c.cast("int")))).alias("cmax"),
        cosine_similarity(
            F.col("embedding"), dequantize(F.col("qvec"), F.col("qscale"))
        ).alias("cos"),
    ).collect()
    assert all(r["cmax"] <= 127 for r in checked)
    assert all(r["cos"] >= 0.999 for r in checked)

    def _dir_bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d) for f in fs if f.endswith(".parquet")
        )

    full = str(tmp_path / "full")
    quant = str(tmp_path / "quant")
    emb.select("vec_id", "embedding").coalesce(1).write.parquet(full)
    q.select("vec_id", "qvec", "qscale").coalesce(1).write.parquet(quant)
    assert _dir_bytes(quant) < 0.55 * _dir_bytes(full)


def test_hll_sketch_estimates_close_to_exact(spark, sf_dir):
    from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY

    est = {
        r["c_mktsegment"]: r["est"]
        for r in REGISTRY["q115_hll_sketch"].spark_fn(spark, sf_dir).collect()
    }
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    exact = {
        r["c_mktsegment"]: r["d"]
        for r in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    exact["ALL"] = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert set(est) == set(exact)
    for k, e in est.items():
        # default lgConfigK=12 → rsd ~1.6%; allow 5%
        assert abs(e - exact[k]) <= max(2, 0.05 * exact[k]), (k, e, exact[k])


def test_cms_sketch_persists_and_merges_across_batches(spark, sf_dir, tmp_path):
    """The production incremental pattern: per-batch sketches land in a
    parquet state table, later batches merge cell-wise — estimates from
    (persisted batch-1 sketch ⊕ batch-2 sketch) must EQUAL the single-scan
    sketch (same hash seeds → identical grids, merge = exact addition)."""
    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    b1 = li.filter(F.col("l_partkey") % 2 == 0)
    b2 = li.filter(F.col("l_partkey") % 2 == 1)

    state = str(tmp_path / "cms_state")
    sketches.build_cms(b1, "l_partkey").write.mode("overwrite").parquet(state)
    merged = sketches.merge_cms(
        spark.read.parquet(state), sketches.build_cms(b2, "l_partkey")
    )
    single = sketches.build_cms(li, "l_partkey")

    probe = li.distinct().limit(50)
    est_m = {r["item"]: r["est"] for r in sketches.cms_estimate(merged, probe, "l_partkey").collect()}
    est_s = {r["item"]: r["est"] for r in sketches.cms_estimate(single, probe, "l_partkey").collect()}
    assert est_m == est_s


def test_merge_into_idempotent_and_branches(spark):
    """MERGE semantics edge cases: applying the same merge twice is a no-op
    (update to the same values), inserts land once, deletes remove."""
    from data_engineering_nd_datalake_project_4_spark.operators.merge import merge_into, src

    tgt = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k int, tag string, v double"
    )
    s = spark.createDataFrame(
        [(2, 99.0, False), (3, 0.0, True), (4, 44.0, False)],
        "k int, nv double, kill boolean",
    )
    once = merge_into(
        tgt, s, "k",
        update_set={"v": src("nv")},
        insert_values={"tag": F.lit("new"), "v": src("nv")},
        delete_condition=src("kill"),
    )
    rows = {r["k"]: (r["tag"], r["v"]) for r in once.collect()}
    assert rows == {1: ("a", 10.0), 2: ("b", 99.0), 4: ("new", 44.0)}  # 3 deleted

    # Re-applying the same merge: keys 1/2/4 are stable (update to same
    # values), but the deleted key 3 is now NOT MATCHED, so the insert
    # branch re-creates it — faithful SQL MERGE semantics (the delete
    # condition guards only the MATCHED branch), NOT idempotent by design.
    twice = merge_into(
        once, s, "k",
        update_set={"v": src("nv")},
        insert_values={"tag": F.lit("new"), "v": src("nv")},
        delete_condition=src("kill"),
    )
    rows2 = {r["k"]: (r["tag"], r["v"]) for r in twice.collect()}
    assert rows2 == {1: ("a", 10.0), 2: ("b", 99.0), 3: ("new", 0.0), 4: ("new", 44.0)}


def test_scd2_single_event_and_constant_runs(spark):
    """SCD2 edges: one event -> one open interval (valid_to NULL); a
    constant attribute stream collapses to a single interval."""
    from data_engineering_nd_datalake_project_4_spark.operators.timeseries import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, "2020-01-01 00:00:00", "x", 1),
            (2, "2020-01-01 00:00:00", "y", 1),
            (2, "2020-01-01 01:00:00", "y", 2),
            (2, "2020-01-01 02:00:00", "y", 3),
        ],
        "uid int, ts string, attr string, eid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = scd2_intervals(df, "uid", "ts", "attr", tie_break="eid").collect()
    by_uid = {}
    for r in out:
        by_uid.setdefault(r["uid"], []).append(r)
    assert len(by_uid[1]) == 1 and by_uid[1][0]["valid_to"] is None
    assert len(by_uid[2]) == 1  # constant attr: one interval despite 3 events
    assert by_uid[2][0]["valid_to"] is None


def test_time_weighted_avg_step_function(spark):
    """LOCF TWA hand check: value 1.00 for 10s then 3.00 for 30s ->
    (1*10 + 3*30)/40 = 2.5; the trailing observation carries no weight."""
    from data_engineering_nd_datalake_project_4_spark.operators.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [
            (7, "2020-01-01 00:00:00", 1.00, 1),
            (7, "2020-01-01 00:00:10", 3.00, 2),
            (7, "2020-01-01 00:00:40", 9.99, 3),  # last value never weighted
        ],
        "uid int, ts string, value double, eid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = time_weighted_avg(df, "uid", "ts", "value", tie_break="eid").collect()[0]
    assert r["twa"] == 2.5
    assert r["total_duration_us"] == 40_000_000


def test_time_weighted_avg_all_null_values_pass_guard(spark):
    """The decimal-sum overflow guard (assert_true) must NOT fire for a
    group whose values are all NULL — a NULL __wsum with zero non-NULL
    products is legitimate data, not overflow; twa comes back NULL."""
    from data_engineering_nd_datalake_project_4_spark.operators.timeseries import time_weighted_avg

    df = spark.createDataFrame(
        [
            (7, "2020-01-01 00:00:00", None, 1),
            (7, "2020-01-01 00:00:10", None, 2),
        ],
        "uid int, ts string, value double, eid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    r = time_weighted_avg(df, "uid", "ts", "value", tie_break="eid").collect()[0]
    assert r["twa"] is None
    assert r["total_duration_us"] == 10_000_000


def test_halflife_decay_score_hand_check(spark):
    """Decay hand check, half-life 10s anchored at the newest row (t=30):
    ages 0/10/25s -> k = 0/1/2 halvings -> 8/1 + 4/2 + 8/4 = 12.0 exactly
    (each term a pure power-of-two scaling). NULL ts/value rows excluded,
    a row older than max_halvings half-lives dropped, not underflowed."""
    from data_engineering_nd_datalake_project_4_spark.operators.timeseries import (
        halflife_decay_score,
    )

    df = spark.createDataFrame(
        [
            (7, "2020-01-01 00:00:30", 8.0),
            (7, "2020-01-01 00:00:20", 4.0),
            (7, "2020-01-01 00:00:05", 8.0),
            (7, "2019-12-31 00:00:00", 1e9),  # > 62 half-lives: dropped
            (7, None, 5.0),
            (7, "2020-01-01 00:00:30", None),
            (9, None, None),  # key with no surviving obs: no output row
        ],
        "uid int, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = halflife_decay_score(
        df, "uid", "ts", "value", half_life_seconds=10
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["uid"] == 7
    assert r["decay_score"] == 12.0
    assert r["n_events"] == 3


def test_scd2_leading_null_attr_opens_interval(spark):
    """A partition whose FIRST attr is NULL must still open an interval
    (row-number first-row detection, not lag-is-NULL — a leading NULL attr
    eqNullSafe-matches the NULL lag and would otherwise vanish)."""
    from data_engineering_nd_datalake_project_4_spark.operators.timeseries import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, "2020-01-01 00:00:00", None, 1),
            (1, "2020-01-01 01:00:00", None, 2),  # merges into the NULL run
            (1, "2020-01-01 02:00:00", "x", 3),
        ],
        "uid int, ts string, attr string, eid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = sorted(
        scd2_intervals(df, "uid", "ts", "attr", tie_break="eid").collect(),
        key=lambda r: r["valid_from"],
    )
    assert len(out) == 2
    assert out[0]["attr"] is None and out[0]["valid_to"] == out[1]["valid_from"]
    assert out[1]["attr"] == "x" and out[1]["valid_to"] is None


def test_scd2_tied_timestamps_deterministic_valid_to(spark):
    """Two change points sharing (key, ts) must chain valid_to by the
    tie-break order — the lead window orders by (ts, tie_break), not ts
    alone, so the assignment is total and deterministic."""
    from data_engineering_nd_datalake_project_4_spark.operators.timeseries import scd2_intervals

    df = spark.createDataFrame(
        [
            (1, "2020-01-01 00:00:00", "a", 2),
            (1, "2020-01-01 00:00:00", "b", 1),  # same ts; eid orders b first
            (1, "2020-01-01 01:00:00", "c", 3),
        ],
        "uid int, ts string, attr string, eid int",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {
        r["attr"]: r
        for r in scd2_intervals(df, "uid", "ts", "attr", tie_break="eid").collect()
    }
    # order is b (eid=1), a (eid=2), c (eid=3): b closes at the tied ts,
    # a closes at 01:00, c stays open
    assert rows["b"]["valid_to"] == rows["a"]["valid_from"]
    assert rows["a"]["valid_to"] == rows["c"]["valid_from"]
    assert rows["c"]["valid_to"] is None


def test_merge_into_null_delete_condition_keeps_row(spark):
    """SQL MERGE deletes only when the WHEN clause is TRUE — a NULL
    delete_condition must keep the matched row (regression: ~(m & NULL) is
    NULL, which filter() silently dropped)."""
    from data_engineering_nd_datalake_project_4_spark.operators.merge import merge_into, src

    tgt = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, v double")
    s = spark.createDataFrame(
        [(1, 11.0, None), (2, 22.0, True)], "k int, nv double, kill boolean"
    )
    out = merge_into(
        tgt, s, "k", update_set={"v": src("nv")}, delete_condition=src("kill")
    )
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert rows == {1: 11.0}  # k=1 kept+updated (NULL kill), k=2 deleted


def test_simhash_pairs_max_hamming_zero_is_fp_equality(spark):
    """max_hamming=0 (single 64-bit band) must not overflow the LongType
    band mask — it compiles to a direct fingerprint equi-join."""
    fp = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5), (4, 7), (5, -12)], "doc_id int, fp long"
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dedup.simhash_near_dup_pairs(fp, "doc_id", "fp", max_hamming=0).collect()
    }
    assert got == {(1, 2, 0), (1, 3, 0), (2, 3, 0)}


def test_align_decimal_casts_rewriter():
    """The oracle rewriter must wrap exactly the DECIMAL casts (balanced
    parens, nested expressions, CASE branches) and leave every other CAST
    untouched."""
    from data_engineering_nd_datalake_project_4_spark.queries import _align_decimal_casts as a

    assert a("CAST(x AS DECIMAL(18,2))") == "CAST(CAST(x AS VARCHAR) AS DECIMAL(18,2))"
    assert a("SUM(CAST(p * (1 - d) AS DECIMAL(18,4)))") == (
        "SUM(CAST(CAST(p * (1 - d) AS VARCHAR) AS DECIMAL(18,4)))"
    )
    # nested: inner decimal cast wrapped, outer BIGINT cast untouched
    assert a("CAST(CAST(v AS DECIMAL(18,2)) * 100 AS BIGINT)") == (
        "CAST(CAST(CAST(v AS VARCHAR) AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    assert a("CAST(ts AS TIMESTAMP)") == "CAST(ts AS TIMESTAMP)"
    assert a("CAST(cents AS HUGEINT) * dur") == "CAST(cents AS HUGEINT) * dur"
    assert a("no casts here") == "no casts here"
    # case-insensitive keyword matching
    assert a("cast(x as decimal(18,2))") == "CAST(CAST(x AS VARCHAR) AS decimal(18,2))"
    # TRY_CAST is a different function (NULL-on-error): its CAST( suffix
    # must not be claimed, or the rewrite would narrow the TRY scope
    assert a("TRY_CAST(x AS DECIMAL(18,2))") == "TRY_CAST(x AS DECIMAL(18,2))"
    assert a("try_cast(x AS DECIMAL(18,2))") == "try_cast(x AS DECIMAL(18,2))"
    # string literals cannot derail the scan: unbalanced parens, fake
    # ' AS ' and even 'CAST(' inside quotes are inert
    assert a("SELECT 'CAST(' || CAST(x AS DECIMAL(9,2))") == (
        "SELECT 'CAST(' || CAST(CAST(x AS VARCHAR) AS DECIMAL(9,2))"
    )
    assert a("CAST(coalesce(s, ') AS DECIMAL(') AS VARCHAR)") == (
        "CAST(coalesce(s, ') AS DECIMAL(') AS VARCHAR)"
    )
    assert a("CAST('it''s ( AS ' AS VARCHAR)") == "CAST('it''s ( AS ' AS VARCHAR)"
    # every shipped oracle must still round-trip through the rewriter with
    # balanced parens and no stray unrouted decimal casts
    from data_engineering_nd_datalake_project_4_spark.queries import oracle_sql

    for name, sql in oracle_sql().items():
        assert sql.count("(") == sql.count(")"), name


def test_decimal_cast_cross_engine_alignment(spark):
    """The property the rewriter exists for: on half-boundary doubles,
    Spark's double->DECIMAL cast equals DuckDB's VARCHAR-routed cast (and
    NOT DuckDB's direct binary cast, which disagrees on ~half of them)."""
    import duckdb

    vals = [2.345, 2.335, 0.125, 0.135, -7.005, 99.995, 1234.565, 0.005]
    sdf = spark.createDataFrame([(v,) for v in vals], "x double").select(
        F.col("x"), F.col("x").cast("decimal(18,2)").cast("string").alias("s")
    )
    spark_render = {r["x"]: r["s"] for r in sdf.collect()}
    con = duckdb.connect()
    for v in vals:
        duck = con.execute(
            f"SELECT CAST(CAST(CAST({v!r} AS DOUBLE) AS VARCHAR) AS DECIMAL(18,2))"
        ).fetchone()[0]
        assert str(duck) == spark_render[v], (v, str(duck), spark_render[v])


def test_q129_contamination_hash_boundary(spark, tmp_path):
    """Plant the exact boundary cases around the 5-gram window: a candidate
    sharing EXACTLY ONE 5-gram with the benchmark slice, a near-miss whose
    overlap is only 4 tokens long (must not appear at all), a 2-gram-sharing
    exact copy, a <5-token doc (filtered), and a gram present in TWO bench
    docs (countDistinct must still count it once)."""
    from data_engineering_nd_datalake_project_4_spark.queries import REGISTRY

    rows = [
        # benchmark slice (doc_id < 50)
        (10, "a b c d e f"),        # grams: "a b c d e", "b c d e f"
        (40, "z z a b c d e"),      # repeats gram "a b c d e" in a 2nd doc
        # candidates (doc_id >= 50)
        (60, "x y z w v a b c d e"),  # shares exactly "a b c d e" -> 1
        (61, "q r b c d e"),          # 4-token overlap only -> no row
        (62, "a b c d e f"),          # shares both bench grams -> 2
        (63, "a b c d"),              # < 5 tokens: filtered out entirely
    ]
    df = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in rows],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    df.coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["n_shared"]
        for r in REGISTRY["q129_contamination"].spark_fn(spark, str(tmp_path)).collect()
    }
    assert out == {60: 1, 62: 2}


def test_hll_explicit_accuracy_and_merge(spark, sf_dir):
    """The explicit portable-hash HLL (q45's engine): estimate within the
    ~1.04/sqrt(m) rsd envelope of the exact count at several
    cardinalities, and registers merge by MAX exactly (shard sketches ==
    whole-corpus sketch)."""
    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    for n in (50, 1000, 20000):
        df = spark.range(n).select((F.col("id") * 7 + 3).alias("k"))
        est = sketches.hll_estimate(sketches.hll_registers(df, "k")).collect()[0]["est"]
        assert abs(est - n) / n < 0.05, (n, est)

    # merge: two disjoint shards, MAX-combined registers == one-shot build
    a = spark.range(0, 5000).select(F.col("id").alias("k"))
    b = spark.range(3000, 9000).select(F.col("id").alias("k"))
    whole = a.unionByName(b)
    merged = (
        sketches.hll_registers(a, "k")
        .unionByName(sketches.hll_registers(b, "k"))
        .groupBy("bucket")
        .agg(F.max("reg").alias("reg"))
    )
    got = {(r["bucket"], r["reg"]) for r in merged.collect()}
    want = {(r["bucket"], r["reg"]) for r in sketches.hll_registers(whole, "k").collect()}
    assert got == want

    # NULLs excluded, p validated
    import pytest

    withnull = spark.createDataFrame([(1,), (None,), (2,)], "k int")
    regs = sketches.hll_registers(withnull, "k")
    assert regs.count() <= 2
    with pytest.raises(ValueError, match="p must be"):
        sketches.hll_registers(withnull, "k", p=2)


class TestLshNearDedup:
    """End-to-end MinHash dedup (dedup.lsh_near_dedup): planted-cluster
    semantics, NULL survival, and survivors ≡ input − removed-components."""

    def _toy(self, spark):
        # two exact-duplicate families + two unique docs + one NULL doc
        rows = [
            (1, "alpha beta gamma delta epsilon zeta"),
            (2, "alpha beta gamma delta epsilon zeta"),
            (3, "alpha beta gamma delta epsilon zeta"),
            (4, "one two three four five six seven"),
            (5, "red orange yellow green blue indigo violet"),
            (6, "red orange yellow green blue indigo violet"),
            (7, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_keeps_min_id_per_planted_cluster(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import lsh_near_dedup

        out = lsh_near_dedup(
            self._toy(spark), "text", "doc_id", num_hashes=32, bands=8,
            shingle_n=1, verify_jaccard=0.5,
        )
        got = sorted(r.doc_id for r in out.collect())
        # clusters {1,2,3} and {5,6} collapse to their min ids; 4 unique;
        # NULL-text 7 always survives
        assert got == [1, 4, 5, 7]

    def test_no_verification_mode_still_exact_on_identical_docs(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import lsh_near_dedup

        out = lsh_near_dedup(
            self._toy(spark), "text", "doc_id", num_hashes=32, bands=8,
            shingle_n=1, verify_jaccard=None,
        )
        got = sorted(r.doc_id for r in out.collect())
        # identical token sets share every band — same clusters survive
        assert 1 in got and 4 in got and 5 in got and 7 in got
        assert 2 not in got and 3 not in got and 6 not in got

    def test_survivors_equal_input_minus_removed_components(self, spark, sf_dir):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import (
            connected_components,
            lsh_near_dedup,
            minhash_lsh_candidate_pairs,
        )

        d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
        out = lsh_near_dedup(
            d, "text", "doc_id", num_hashes=32, bands=8, shingle_n=3,
            max_bucket_size=100, verify_jaccard=None,
        )
        pairs = minhash_lsh_candidate_pairs(
            d.filter(F.col("text").isNotNull()), "text", "doc_id",
            num_hashes=32, bands=8, shingle_n=3, max_bucket_size=100,
        )
        labels = connected_components(pairs)
        removed = {
            r.node for r in labels.filter(F.col("node") != F.col("component")).collect()
        }
        expect = sorted(r.doc_id for r in d.collect() if r.doc_id not in removed)
        assert sorted(r.doc_id for r in out.collect()) == expect


class TestTemperatureMix:
    """Temperature-scaled corpus rebalancing (dedup.temperature_mix_sample)."""

    def _skewed(self, spark):
        # 3 domains with counts 160 / 40 / 10 and one NULL-domain doc
        rows = [(i, "big") for i in range(160)]
        rows += [(200 + i, "mid") for i in range(40)]
        rows += [(300 + i, "small") for i in range(10)]
        rows += [(400, None)]
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_quota_sum_never_overshoots(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import temperature_mix_sample

        out = temperature_mix_sample(self._skewed(spark), "source", "doc_id", 100)
        assert out.count() <= 100

    def test_temperature_flattens_shares(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import temperature_mix_sample

        df = self._skewed(spark)

        def share(t):
            out = temperature_mix_sample(df, "source", "doc_id", 100, temperature=t)
            by = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
            return by.get("big", 0), by.get("small", 0)

        b1, s1 = share(1.0)   # natural distribution
        b2, s2 = share(2.0)   # sqrt-flattened
        # higher temperature shifts quota from the dominant to the rare domain
        assert b2 < b1 and s2 >= s1

    def test_null_domain_gets_own_quota_class(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import temperature_mix_sample

        out = temperature_mix_sample(self._skewed(spark), "source", "doc_id", 200)
        assert out.filter(F.col("source").isNull()).count() >= 0  # null-safe join kept the class
        # with target ~= corpus size the NULL singleton's quota is >= 1
        got = {r.doc_id for r in out.collect()}
        assert 400 in got

    def test_deterministic_and_seed_decorrelated(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import temperature_mix_sample

        df = self._skewed(spark)
        a1 = {r.doc_id for r in temperature_mix_sample(df, "source", "doc_id", 60, seed=0).collect()}
        a2 = {r.doc_id for r in temperature_mix_sample(df, "source", "doc_id", 60, seed=0).collect()}
        b = {r.doc_id for r in temperature_mix_sample(df, "source", "doc_id", 60, seed=1).collect()}
        assert a1 == a2
        assert a1 != b

    def test_rejects_overflow_prone_target(self, spark):
        import pytest as _pytest

        from data_engineering_nd_datalake_project_4_spark.operators.dedup import temperature_mix_sample

        with _pytest.raises(ValueError, match="target_total"):
            temperature_mix_sample(self._skewed(spark), "source", "doc_id", 2_000_000)

    def test_low_temperature_overflow_trips_runtime_guard(self, spark):
        # the static target_total<=1e6 bound proves the product only for
        # T>=2; at T=0.25 a 60-row domain already gives qw = 60^4 * 1e6 >
        # (2^63-1)/1e6 — the runtime assert must fire, never a silent wrap
        # or an opaque ANSI ARITHMETIC_OVERFLOW
        import pytest as _pytest

        from data_engineering_nd_datalake_project_4_spark.operators.dedup import temperature_mix_sample

        df = spark.range(60).select(
            F.col("id").alias("doc_id"), F.lit("only").alias("source")
        )
        with _pytest.raises(Exception, match="quota weight|ASSERT"):
            temperature_mix_sample(
                df, "source", "doc_id", 1_000_000, temperature=0.25
            ).collect()

    def test_low_temperature_in_bounds_still_works(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import temperature_mix_sample

        out = temperature_mix_sample(
            self._skewed(spark), "source", "doc_id", 100, temperature=1.0
        )
        assert 0 < out.count() <= 100


class TestBm25:
    """BM25 retrieval (text.bm25_topk) vs a direct numpy-free replication."""

    def _corpus(self, spark):
        rows = [
            (1, "spark join spark spark"),        # tf(spark)=3, dl=4
            (2, "spark window filter scan"),      # tf(spark)=1, dl=4
            (3, "join join window window join"),  # no spark
            (4, "scan filter sort"),              # no query terms
            (5, None),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_matches_reference_formula(self, spark):
        import math

        from data_engineering_nd_datalake_project_4_spark.operators.text import bm25_topk

        out = bm25_topk(self._corpus(spark), "text", "doc_id", ["spark"], k=10)
        got = {r.doc_id: r.score for r in out.collect()}
        # corpus: 4 non-null docs, dl = 4,4,5,3 → avgdl = 4.0; df(spark)=2
        n, df, avgdl, k1, b = 4, 2, 4.0, 1.2, 0.75

        def ref(tf, dl):
            idf = round(math.log(1 + (n - df + 0.5) / (df + 0.5)), 6)
            c = idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
            return round(c, 6)

        assert set(got) == {1, 2}
        assert got[1] == pytest.approx(ref(3, 4), abs=2e-6)
        assert got[2] == pytest.approx(ref(1, 4), abs=2e-6)
        assert got[1] > got[2]  # higher tf wins at equal dl

    def test_rank_order_and_k(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.text import bm25_topk

        out = bm25_topk(
            self._corpus(spark), "text", "doc_id", ["spark", "join", "window"], k=2
        ).collect()
        assert [r.rk for r in out] == [1, 2]
        scores = [r.score for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_rejects_empty_query(self, spark):
        import pytest as _pytest

        from data_engineering_nd_datalake_project_4_spark.operators.text import bm25_topk

        with _pytest.raises(ValueError, match="query_terms"):
            bm25_topk(self._corpus(spark), "text", "doc_id", [])


class TestRrfFuse:
    """Reciprocal Rank Fusion (similarity.rrf_fuse)."""

    def _rank(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, rk int")

    def test_matches_hand_formula(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.similarity import rrf_fuse

        a = self._rank(spark, [(1, 1), (2, 2), (3, 3)])
        b = self._rank(spark, [(3, 1), (1, 2)])
        got = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b]).collect()}
        assert got[1] == pytest.approx(1 / 61 + 1 / 62, abs=1e-15)
        assert got[2] == pytest.approx(1 / 62, abs=1e-15)
        assert got[3] == pytest.approx(1 / 63 + 1 / 61, abs=1e-15)

    def test_doc_in_one_list_only_still_scores(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.similarity import rrf_fuse

        a = self._rank(spark, [(7, 1)])
        b = self._rank(spark, [(9, 1)])
        got = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b]).collect()}
        assert set(got) == {7, 9}
        assert got[7] == got[9] == pytest.approx(1 / 61, abs=1e-15)

    def test_consensus_beats_single_top(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.similarity import rrf_fuse

        # doc 5: rank 2 in BOTH lists; doc 6: rank 1 in one list only
        a = self._rank(spark, [(6, 1), (5, 2)])
        b = self._rank(spark, [(4, 1), (5, 2)])
        got = {r.doc_id: r.rrf_score for r in rrf_fuse([a, b]).collect()}
        assert got[5] > got[6]

    def test_rejects_empty(self):
        import pytest as _pytest

        from data_engineering_nd_datalake_project_4_spark.operators.similarity import rrf_fuse

        with _pytest.raises(ValueError, match="non-empty"):
            rrf_fuse([])


class TestGlobalRankAndSortedNeighborhood:
    def test_global_rank_is_dense_and_order_correct(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.sort import global_rank

        df = spark.createDataFrame(
            [(i, (i * 37) % 100) for i in range(500)], "id long, key long"
        )
        got = global_rank(df, ["key", "id"], num_partitions=7).collect()
        expect = {
            t[1]: n + 1
            for n, t in enumerate(sorted((r, i) for i, r in [(i, (i * 37) % 100) for i in range(500)]))
        }
        assert len(got) == 500
        assert {r.id: r.rank for r in got} == expect

    def test_snm_equals_brute_force_on_ties(self, spark):
        from data_engineering_nd_datalake_project_4_spark.operators.dedup import sorted_neighborhood_pairs

        # heavy ties on the blocking key: id tie-break must make the
        # candidate set deterministic and brute-force-equal
        df = spark.createDataFrame([(i, i // 7) for i in range(60)], "id long, key long")
        got = {
            (r.id_a, r.id_b, r.rank_gap)
            for r in sorted_neighborhood_pairs(df, ["key"], "id", window=4).collect()
        }
        order = sorted(range(60), key=lambda i: (i // 7, i))
        rank = {i: n + 1 for n, i in enumerate(order)}
        expect = {
            (a, b, rank[b] - rank[a])
            for a in rank for b in rank
            if 1 <= rank[b] - rank[a] <= 3
        }
        assert got == expect

    def test_snm_window_validation(self, spark):
        import pytest as _pytest

        from data_engineering_nd_datalake_project_4_spark.operators.dedup import sorted_neighborhood_pairs

        df = spark.createDataFrame([(1, 1)], "id long, key long")
        with _pytest.raises(ValueError, match="window"):
            sorted_neighborhood_pairs(df, ["key"], "id", window=1)


def test_hll_merge_equals_direct_build(spark, sf_dir):
    """HLL merge theorem, the q168 contract: register-wise MAX of
    per-(type, day) states == registers of the direct per-type build, so
    merged estimates are bit-identical to direct estimates — merging adds
    zero approximation. Also: grouped merge-up and two-state union merge
    agree."""
    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    e = load_table(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = sketches.hll_registers(e, "user_id", p=8, group_cols=["event_type", "day"])
    merged = sketches.hll_merge(daily, group_cols=["event_type"])
    direct = sketches.hll_registers(e, "user_id", p=8, group_cols=["event_type"])

    mrows = {(r["event_type"], r["bucket"]): r["reg"] for r in merged.collect()}
    drows = {(r["event_type"], r["bucket"]): r["reg"] for r in direct.collect()}
    assert mrows == drows

    est_m = {r["event_type"]: r["est"]
             for r in sketches.hll_estimate(merged, p=8, group_cols=["event_type"]).collect()}
    est_d = {r["event_type"]: r["est"]
             for r in sketches.hll_estimate(direct, p=8, group_cols=["event_type"]).collect()}
    assert est_m == est_d

    # two stored state tables unioned then merged == direct over the union
    d1 = sketches.hll_registers(e.filter(F.col("event_id") % 2 == 0), "user_id", p=8)
    d2 = sketches.hll_registers(e.filter(F.col("event_id") % 2 == 1), "user_id", p=8)
    u = {r["bucket"]: r["reg"] for r in sketches.hll_merge(d1.unionByName(d2)).collect()}
    w = {r["bucket"]: r["reg"] for r in sketches.hll_registers(e, "user_id", p=8).collect()}
    assert u == w


def test_cms_grouped_merge_up(spark, sf_dir):
    """merge_cms(group_cols=): per-(lang, source) sketches re-aggregate up
    to per-lang sketches identical to the direct grouped build (cell-wise
    SUM commutes with the finer grouping)."""
    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    d = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tok = d.select("lang", "source", F.explode(F.split("text", " ")).alias("token"))
    fine = sketches.build_cms(tok, "token", width=512, depth=3, group_cols=["lang", "source"])
    up = sketches.merge_cms(fine.drop("source"), group_cols=["lang"])
    direct = sketches.build_cms(tok, "token", width=512, depth=3, group_cols=["lang"])
    urows = {(r["lang"], r["row"], r["bucket"]): r["cnt"] for r in up.collect()}
    drows = {(r["lang"], r["row"], r["bucket"]): r["cnt"] for r in direct.collect()}
    assert urows == drows


def test_build_cms_drops_nulls_in_both_hash_families(spark):
    """NULL contract: NULLs are dropped uniformly. Before the filter the
    families disagreed (portable: md5(NULL)->NULL array, nothing emitted;
    xxhash64: NULL counted under the seed hash) — a nullable column got
    family-dependent totals with no warning."""
    from data_engineering_nd_datalake_project_4_spark.operators import sketches

    df = spark.createDataFrame(
        [("a",), (None,), ("a",), (None,), ("b",)], "token string"
    )
    for hf in ("xxhash64", "portable"):
        cells = sketches.build_cms(df, "token", width=64, depth=3, hash_fn=hf)
        total = cells.groupBy("row").agg(F.sum("cnt").alias("n")).collect()
        # every depth row sums to the NON-NULL instance count (3), both families
        assert all(r["n"] == 3 for r in total), (hf, total)


def test_ngram_jaccard_hashed_intersect_equals_string_sets(spark):
    """ngram_jaccard_pairs intersects 64-bit shingle hashes; the Jaccard
    must equal a python string-set computation on the same corpus
    (identical absent a ~2^-64 collision — this pins the equivalence on a
    fixture with heavy overlap, repeated tokens, and near-threshold
    pairs)."""
    texts = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "the quick brown fox jumps over the lazy cat",
        3: "the quick brown fox leaps over the lazy dog",
        4: "completely different words here nothing shared",
        5: "the quick brown fox jumps over the lazy dog",  # exact dup of 1
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            df, "text", "doc_id", n=3, threshold=0.2
        ).collect()
    }

    def sh(s):
        t = s.split(" ")
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    want = {}
    ids = sorted(texts)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh(texts[a]) & sh(texts[b]))
            j = inter / (len(sh(texts[a])) + len(sh(texts[b])) - inter)
            if j >= 0.2:
                want[(a, b)] = j
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12, (k, got[k], want[k])
    assert got[(1, 5)] == 1.0  # the exact duplicate
