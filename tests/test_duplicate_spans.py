"""Substring-level (span) dedup — operators.text.duplicate_spans.

Doc-level dedup can't see a boilerplate paragraph shared by otherwise
unique documents; these tests plant exactly that and hand-check the span
accounting. Oracle equivalence at sf0.001/sf0.01 is covered by
test_queries_oracle (q141) and the soak variants.
"""

from __future__ import annotations

import pytest

from data_engineering_nd_datalake_project_4_spark.operators import text as T

BOILER = "this software is provided as is without any warranty"  # 9 tokens


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_boilerplate_passage_found(spark):
    rows = [
        (1, BOILER + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, "iota kappa lambda mu nu xi omicron pi " + BOILER),
        (3, "rho sigma tau upsilon phi chi psi omega aa bb cc dd"),
    ]
    out = {
        r["doc_id"]: r
        for r in T.duplicate_spans(_corpus(spark, rows), n=8, min_docs=2).collect()
    }
    # docs 1 and 2 share the 9-token passage => two 8-gram spans each are
    # duplicated (positions 0-1 in doc 1, trailing two in doc 2)
    assert out[1]["n_dup_spans"] == 2
    assert out[2]["n_dup_spans"] == 2
    assert out[3]["n_dup_spans"] == 0
    # span counts: len(toks) - n + 1
    assert out[1]["n_spans"] == 17 - 8 + 1
    assert out[3]["dup_ratio"] == 0.0
    assert out[1]["dup_ratio"] == pytest.approx(2 / 10)


def test_within_doc_repeat_is_not_cross_doc_duplication(spark):
    # the same 8-gram twice in ONE doc: COUNT(DISTINCT doc_id)=1 < 2
    rows = [(1, BOILER + " filler " + BOILER), (2, "x y z " * 5)]
    out = {
        r["doc_id"]: r
        for r in T.duplicate_spans(_corpus(spark, rows), n=8, min_docs=2).collect()
    }
    assert out[1]["n_dup_spans"] == 0
    # but "x y z" * 5 self-overlap also stays un-marked
    assert out[2]["n_dup_spans"] == 0


def test_null_and_short_docs_excluded(spark):
    rows = [(1, None), (2, "one two three"), (3, BOILER), (4, BOILER)]
    out = T.duplicate_spans(_corpus(spark, rows), n=8, min_docs=2)
    ids = {r["doc_id"] for r in out.collect()}
    # doc 1 (NULL) and doc 2 (3 tokens < 8) produce no row — and no
    # phantom rows are manufactured from a NULL token array
    assert ids == {3, 4}
    vals = {r["doc_id"]: r["n_dup_spans"] for r in out.collect()}
    assert vals == {3: 2, 4: 2}  # 9-token boiler => 2 spans, all shared


def test_min_docs_three_requires_wider_spread(spark):
    rows = [(i, BOILER + f" unique{i} tail{i} pad{i}") for i in (1, 2)]
    none_yet = T.duplicate_spans(_corpus(spark, rows), n=8, min_docs=3)
    assert all(r["n_dup_spans"] == 0 for r in none_yet.collect())
    rows.append((3, "lead in tokens here " + BOILER))
    spread = T.duplicate_spans(_corpus(spark, rows), n=8, min_docs=3)
    assert all(r["n_dup_spans"] == 2 for r in spread.collect())


def test_parameter_validation(spark):
    df = _corpus(spark, [(1, BOILER)])
    with pytest.raises(ValueError, match="span length"):
        T.duplicate_spans(df, n=0)
    with pytest.raises(ValueError, match="min_docs"):
        T.duplicate_spans(df, min_docs=1)


# --- strip_duplicate_spans: the rewrite action -------------------------------


def _strip(spark, rows, **kw):
    return {
        r["doc_id"]: r
        for r in T.strip_duplicate_spans(_corpus(spark, rows), **kw).collect()
    }


def test_strip_removes_shared_passage_and_keeps_unique_text(spark):
    rows = [
        (1, BOILER + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, "iota kappa lambda mu nu xi omicron pi " + BOILER),
        (3, "rho sigma tau upsilon phi chi psi omega aa bb cc dd"),
    ]
    out = _strip(spark, rows, n=8, min_docs=2)
    # the union of doc 1's two dup spans covers tokens 0..8 (the 9-token
    # boiler passage); the unique tail survives verbatim
    assert out[1]["new_text"] == "alpha beta gamma delta epsilon zeta eta theta"
    assert out[1]["n_removed_tokens"] == 9
    assert out[2]["new_text"] == "iota kappa lambda mu nu xi omicron pi"
    assert out[3]["new_text"] == rows[2][1]  # untouched doc round-trips
    assert out[3]["n_removed_tokens"] == 0


def test_strip_passthrough_null_short_and_multispace(spark):
    rows = [
        (1, None),
        (2, "one two three"),
        (3, "a  double  spaced short doc"),  # empty tokens must round-trip
        (4, BOILER),
        (5, BOILER + " tail"),
    ]
    out = _strip(spark, rows, n=8, min_docs=2)
    assert out[1]["new_text"] is None and out[1]["n_removed_tokens"] == 0
    assert out[2]["new_text"] == "one two three"
    assert out[3]["new_text"] == "a  double  spaced short doc"
    # docs 4 and 5 share the 9-token boiler: doc 4 is fully covered
    assert out[4]["new_text"] == "" and out[4]["n_removed_tokens"] == 9
    assert out[5]["new_text"] == "tail"


def test_strip_every_row_accounted_for(spark):
    rows = [(i, BOILER if i % 2 else None) for i in range(10)]
    df = T.strip_duplicate_spans(_corpus(spark, rows))
    assert df.count() == 10
    assert {r["doc_id"] for r in df.collect()} == set(range(10))


# ---------------------------------------------------------------------------
# max_dup_spans: variable-length maximal runs (gap-and-islands merge)
# ---------------------------------------------------------------------------

def test_max_span_merges_long_boilerplate_into_one_run(spark):
    # 20-token shared paragraph => 13 overlapping 8-gram hits, ONE run of
    # span_len 20 starting where the paragraph starts in each doc
    para = " ".join(f"b{i}" for i in range(20))
    rows = [
        (1, para + " u1 u2 u3 u4 u5 u6 u7 u8"),
        (2, "v1 v2 v3 " + para),
        (3, "w1 w2 w3 w4 w5 w6 w7 w8 w9"),
    ]
    out = {(r["doc_id"]): r for r in T.max_dup_spans(_corpus(spark, rows)).collect()}
    assert set(out) == {1, 2}
    assert out[1]["span_start"] == 0 and out[1]["span_len"] == 20
    assert out[2]["span_start"] == 3 and out[2]["span_len"] == 20
    assert out[1]["n_grams"] == 20 - 8 + 1


def test_max_span_separate_runs_when_gap_exceeds_n(spark):
    # two shared 8-gram passages separated by >8 unique tokens => 2 runs
    p1 = " ".join(f"a{i}" for i in range(8))
    p2 = " ".join(f"z{i}" for i in range(8))
    gap = " ".join(f"g{i}" for i in range(10))
    rows = [(1, p1 + " " + gap + " " + p2), (2, p1 + " other filler " + p2 + " qq rr ss tt uu vv ww xx yy zz")]
    spans1 = sorted(
        (r["span_start"], r["span_len"])
        for r in T.max_dup_spans(_corpus(spark, rows)).collect()
        if r["doc_id"] == 1
    )
    assert spans1 == [(0, 8), (18, 8)]


def test_max_span_abutting_grams_merge(spark):
    # dup positions exactly n apart abut (contiguous coverage) => one run
    # of length 2n; construct via two shared 8-grams placed back-to-back
    # in doc 1 but separated in docs 2/3 (so only the two grams are dup,
    # not the bridging windows)
    p1 = " ".join(f"a{i}" for i in range(8))
    p2 = " ".join(f"z{i}" for i in range(8))
    rows = [
        (1, p1 + " " + p2),
        (2, p1 + " " + " ".join(f"m{i}" for i in range(9))),
        (3, " ".join(f"k{i}" for i in range(9)) + " " + p2),
    ]
    spans1 = [
        (r["span_start"], r["span_len"], r["n_grams"])
        for r in T.max_dup_spans(_corpus(spark, rows)).collect()
        if r["doc_id"] == 1
    ]
    assert spans1 == [(0, 16, 2)]


def test_max_span_runs_equal_strip_covered_ranges(spark):
    """Invariant: the union of [span_start, span_start+span_len) equals
    exactly the token positions strip_duplicate_spans removes."""
    para = " ".join(f"b{i}" for i in range(14))
    rows = [
        (1, "u1 u2 " + para + " u3 u4 " + BOILER),
        (2, para + " mid " + BOILER),
        (3, "solo tokens only here nothing shared at all"),
    ]
    runs = T.max_dup_spans(_corpus(spark, rows)).collect()
    covered_from_runs = {
        (r["doc_id"], p)
        for r in runs
        for p in range(r["span_start"], r["span_start"] + r["span_len"])
    }
    # read the removed positions from the operator's own covered-range
    # output (keep_positions_col) — greedy token realignment against
    # new_text misattributes positions whenever a removed token equals
    # the next kept token, so it only ever worked on all-distinct fixtures
    stripped = T.strip_duplicate_spans(
        _corpus(spark, rows), keep_positions_col="removed_positions"
    ).collect()
    covered_from_strip = {
        (r["doc_id"], p) for r in stripped for p in r["removed_positions"]
    }
    assert covered_from_runs == covered_from_strip
    # and the count column must agree with the positions array
    assert all(len(r["removed_positions"]) == r["n_removed_tokens"] for r in stripped)


def test_strip_positions_on_repeated_token_corpus(spark):
    """The corpus greedy realignment could NOT handle: the duplicated
    span starts with 'a0' and the first KEPT token is also 'a0', so a
    greedy walk pairs the kept 'a0' with position 0 (inside the span)
    and misattributes every removed position. keep_positions_col is the
    operator's own covered set — exact regardless of token repeats."""
    p1 = " ".join(f"a{i}" for i in range(8))
    rows = [
        (1, p1 + " a0 q r s t u v w x"),
        (2, p1 + " different tail tokens here now ok fine yes"),
    ]
    out = {
        r["doc_id"]: r
        for r in T.strip_duplicate_spans(
            _corpus(spark, rows), keep_positions_col="removed_positions"
        ).collect()
    }
    # only the start-0 8-gram is shared; the kept text begins with the
    # repeated 'a0' at position 8
    assert list(out[1]["removed_positions"]) == list(range(8))
    assert out[1]["new_text"].split(" ")[0] == "a0"
    assert out[1]["n_removed_tokens"] == 8
    assert list(out[2]["removed_positions"]) == list(range(8))
