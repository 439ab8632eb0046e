"""Sub-document (paragraph-granular) exact dedup — operators.dedup.subdoc_dedup.

The C4 line-dedup shape: plant a shared paragraph across documents and
hand-check that only the globally-first occurrence survives, that within-doc
repeats collapse, and that the NULL/empty/full-duplicate edge semantics hold.
Oracle equivalence at sf0.001/sf0.01 is covered by test_queries_oracle (q147)
and the soak variants.
"""

from __future__ import annotations

from data_engineering_nd_datalake_project_4_spark.operators import dedup


def _corpus(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix: str, n: int) -> str:
    return " ".join(f"{prefix}{i}" for i in range(n))


def test_shared_paragraph_kept_only_in_first_doc(spark):
    para = _words("shared", 4)  # one whole 4-token paragraph
    rows = [
        (1, para + " " + _words("a", 4)),
        (2, _words("b", 4) + " " + para),
        (3, _words("c", 4)),
    ]
    out = {
        r["doc_id"]: r
        for r in dedup.subdoc_dedup(_corpus(spark, rows), size=4).collect()
    }
    assert out[1]["deduped_text"] == para + " " + _words("a", 4)
    assert out[2]["deduped_text"] == _words("b", 4)  # shared para scrubbed
    assert out[3]["deduped_text"] == _words("c", 4)
    assert (out[1]["n_paragraphs"], out[1]["n_kept"]) == (2, 2)
    assert (out[2]["n_paragraphs"], out[2]["n_kept"]) == (2, 1)


def test_within_doc_repeat_collapses_to_first_position(spark):
    para = _words("x", 4)
    rows = [(1, para + " " + para + " " + _words("tail", 4))]
    out = dedup.subdoc_dedup(_corpus(spark, rows), size=4).collect()[0]
    assert out["n_paragraphs"] == 3
    assert out["n_kept"] == 2
    assert out["deduped_text"] == para + " " + _words("tail", 4)


def test_fully_duplicate_doc_scrubs_to_empty_not_null(spark):
    t = _words("dup", 8)
    rows = [(1, t), (2, t)]
    out = {
        r["doc_id"]: r
        for r in dedup.subdoc_dedup(_corpus(spark, rows), size=4).collect()
    }
    assert out[1]["deduped_text"] == t
    assert out[2]["deduped_text"] == ""  # scrubbed-empty, the C4 action
    assert out[2]["n_kept"] == 0


def test_null_text_passes_through_as_null(spark):
    rows = [(1, None), (2, _words("z", 4))]
    out = {
        r["doc_id"]: r
        for r in dedup.subdoc_dedup(_corpus(spark, rows), size=4).collect()
    }
    assert out[1]["deduped_text"] is None
    assert (out[1]["n_paragraphs"], out[1]["n_kept"]) == (0, 0)
    assert out[2]["deduped_text"] == _words("z", 4)


def test_tail_paragraph_shorter_than_size_is_its_own_unit(spark):
    rows = [(1, _words("p", 6))]  # 4 + 2 tokens -> 2 paragraphs
    out = dedup.subdoc_dedup(_corpus(spark, rows), size=4).collect()[0]
    assert out["n_paragraphs"] == 2
    assert out["n_kept"] == 2
    assert out["deduped_text"] == _words("p", 6)


def test_keep_first_is_global_order_not_arrival_order(spark):
    # doc 5 and doc 2 share a paragraph: doc 2 (smaller id) wins even though
    # it is listed later
    para = _words("g", 4)
    rows = [(5, para + " " + _words("five", 4)), (2, para)]
    out = {
        r["doc_id"]: r
        for r in dedup.subdoc_dedup(_corpus(spark, rows), size=4).collect()
    }
    assert out[2]["deduped_text"] == para
    assert out[5]["deduped_text"] == _words("five", 4)
