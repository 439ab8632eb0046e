"""PII scrub + repeated-line boilerplate strip: planted-case semantics,
count attribution order, order preservation, degenerate corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_engineering_nd_datalake_project_4_spark.operators import text as T


def _scrub_one(spark, s: str) -> dict:
    df = spark.createDataFrame([(1, s)], "id LONG, t STRING")
    return T.pii_scrub_with_counts(df, "t", out_col="out").collect()[0].asDict()


def test_pii_scrub_each_kind(spark):
    r = _scrub_one(
        spark,
        "mail a@b.io or see https://x.io/p?q=1 call +1 555-867-5309 "
        "ssn 123-45-6789 host 10.0.0.1",
    )
    assert r["out"] == (
        "mail <EMAIL> or see <URL> call <PHONE> ssn <SSN> host <IP>"
    )
    assert (r["n_email"], r["n_url"], r["n_phone"], r["n_ssn"], r["n_ip"]) == (
        1, 1, 1, 1, 1,
    )


def test_pii_email_inside_url_counts_once_as_url(spark):
    r = _scrub_one(spark, "https://x.io/unsubscribe?email=a@b.io done")
    assert r["out"] == "<URL> done"
    assert r["n_url"] == 1 and r["n_email"] == 0


def test_pii_ssn_not_eaten_by_phone(spark):
    r = _scrub_one(spark, "123-45-6789 and 555-867-5309")
    assert r["out"] == "<SSN> and <PHONE>"


def test_pii_passthrough_and_unicode(spark):
    r = _scrub_one(spark, "héllo wörld 東京 no pii here 🙂")
    assert r["out"] == "héllo wörld 東京 no pii here 🙂"
    assert sum(r[f"n_{k}"] for k, _, _ in T.PII_PATTERNS) == 0


@pytest.fixture()
def boiler_corpus(spark):
    rows = [
        (1, "AD BANNER\nreal content one\nfooter"),
        (2, "AD BANNER\nreal content two\nfooter"),
        (3, "AD BANNER\nunique middle\nfooter"),
        (4, "only original text"),
        (5, "AD BANNER"),  # doc that is entirely boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id LONG, t STRING")


def test_boilerplate_strip_planted(spark, boiler_corpus):
    out = {
        r["doc_id"]: r.asDict()
        for r in T.strip_boilerplate(boiler_corpus, "t", "doc_id", min_docs=3).collect()
    }
    # 'AD BANNER' (4 docs) and 'footer' (3 docs) are boilerplate
    assert out[1]["kept_text"] == "real content one"
    assert out[3]["kept_text"] == "unique middle"
    assert out[4] == {
        "doc_id": 4, "kept_text": "only original text", "n_kept": 1, "n_dropped": 0,
    }
    assert out[5] == {"doc_id": 5, "kept_text": "", "n_kept": 0, "n_dropped": 1}


def test_boilerplate_preserves_line_order(spark):
    rows = [(i, f"SPAM\nline-a-{i}\nline-b-{i}\nSPAM") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id LONG, t STRING")
    out = T.strip_boilerplate(df, "t", "doc_id", min_docs=3).collect()
    for r in out:
        i = r["doc_id"]
        assert r["kept_text"] == f"line-a-{i}\nline-b-{i}"
        assert r["n_dropped"] == 2


def test_boilerplate_literal_metachar_separator(spark):
    """``sep`` is a LITERAL separator: a regex metachar like '|' or '.'
    must not split on every character (ADVICE r4: F.split regex trap)."""
    rows = [(i, f"SPAM|keep-{i}|SPAM") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id LONG, t STRING")
    out = {r["doc_id"]: r.asDict()
           for r in T.strip_boilerplate(df, "t", "doc_id", min_docs=3, sep="|").collect()}
    for i in range(4):
        assert out[i]["kept_text"] == f"keep-{i}"
        assert out[i]["n_dropped"] == 2


def test_boilerplate_none_qualifies(spark):
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "c\nd")], "doc_id LONG, t STRING"
    )
    out = {r["doc_id"]: r["kept_text"] for r in
           T.strip_boilerplate(df, "t", "doc_id", min_docs=3).collect()}
    assert out == {1: "a\nb", 2: "c\nd"}


def test_unigram_lm_scores_rank_rare_docs_lower(spark):
    """A doc of corpus-common tokens must outscore a doc of one-off rare
    tokens; all scores are <= 0 (log of probabilities); token counts are
    preserved."""
    rows = [(i, "common words appear in every single document here") for i in range(8)]
    rows += [(100, "common words appear in every single document here"),
             (101, "zq xv jk wq pf bn lm qq")]  # 8 singleton tokens
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r["doc_id"]: r for r in T.unigram_lm_scores(df, "text", "doc_id").collect()}
    assert all(r["avg_logprob"] <= 0 for r in out.values())
    assert all(r["n_tok"] == 8 for r in out.values())
    assert out[101]["avg_logprob"] < out[100]["avg_logprob"]


def test_dsir_weights_rank_target_like_docs_higher(spark):
    """DSIR hand properties: docs sharing the target slice's vocabulary
    must out-weight docs of off-target vocabulary; n_grams = 2·len-1
    (unigrams + bigrams); a NULL-text doc yields no row."""
    rows = [(i, "alpha beta gamma delta", "en") for i in range(4)]
    rows += [(10 + i, "zeta eta theta iota", "de") for i in range(4)]
    rows += [(99, None, "en")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = {
        r["doc_id"]: r
        for r in T.dsir_log_weights(
            df, df.filter(F.col("lang") == "en"), "text", "doc_id"
        ).collect()
    }
    assert 99 not in out and len(out) == 8
    assert all(r["n_grams"] == 7 for r in out.values())
    # target-vocab docs: every gram seen in target -> higher weight than
    # off-target docs whose grams the target model only Laplace-smooths
    assert out[0]["dsir_logw"] > out[10]["dsir_logw"]


def test_dsir_gram_buckets_shape(spark):
    """One row per gram occurrence (2·len-1), every bucket in
    [0, n_buckets); identical texts land on identical bucket multisets
    (the hash is content-determined, not row-determined)."""
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "solo")], "doc_id LONG, text STRING"
    )
    rows = T.dsir_gram_buckets(df, "text", "doc_id", n_buckets=64).collect()
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["__bucket"])
    assert sorted(len(v) for v in by_doc.values()) == [1, 5, 5]
    assert all(0 <= b < 64 for v in by_doc.values() for b in v)
    assert sorted(by_doc[1]) == sorted(by_doc[2])


def test_corpus_js_divergence_bounds(spark):
    """Identical snapshots -> every per-bucket contribution is EXACTLY 0.0
    (p_a = p_b = m, quantized-ln differences cancel identically);
    disjoint-vocabulary snapshots -> total JS in (0, ln 2]; counts are
    preserved per side."""
    import math

    a = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(6)], "doc_id LONG, text STRING"
    )
    same = T.corpus_js_divergence(a, a, "text", "doc_id", n_buckets=64).collect()
    assert same and all(r["js_contrib"] == 0.0 for r in same)
    assert all(r["n_a"] == r["n_b"] for r in same)

    b = spark.createDataFrame(
        [(i, "zeta eta theta") for i in range(6)], "doc_id LONG, text STRING"
    )
    diff = T.corpus_js_divergence(a, b, "text", "doc_id", n_buckets=64).collect()
    total = sum(r["js_contrib"] for r in diff)
    assert 0.0 < total <= math.log(2) + 1e-9
    # disjoint vocab: no bucket carries counts on both sides
    assert all(r["n_a"] == 0 or r["n_b"] == 0 for r in diff)


def test_corpus_manifest_properties(spark):
    """Order-independence, single-edit sensitivity, shard-merge identity."""
    rows = [(i, f"doc number {i} text") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    m = T.corpus_manifest(df).collect()[0]
    assert m["n_docs"] == 50 and m["n_tokens"] == 200

    # permutation invariance: a reshuffled corpus has the identical manifest
    perm = spark.createDataFrame(list(reversed(rows)), "doc_id LONG, text STRING") \
        .repartition(7)
    assert T.corpus_manifest(perm).collect()[0] == m

    # single-edit sensitivity
    edited = spark.createDataFrame(
        [(i, t if i != 25 else t + "!") for i, t in rows],
        "doc_id LONG, text STRING",
    )
    assert T.corpus_manifest(edited).collect()[0]["content_xor"] != m["content_xor"]

    # shard-merge identity: XOR of disjoint shard manifests == whole-corpus XOR
    a = T.corpus_manifest(df.filter("doc_id < 20")).collect()[0]
    b = T.corpus_manifest(df.filter("doc_id >= 20")).collect()[0]
    assert (a["content_xor"] ^ b["content_xor"]) == m["content_xor"]

    # per-shard form groups correctly
    sharded = df.withColumn("shard", (F.col("doc_id") % 2).cast("int"))
    per = T.corpus_manifest(sharded, by="shard").collect()
    assert {r["shard"] for r in per} == {0, 1}
    assert sum(r["n_docs"] for r in per) == 50
