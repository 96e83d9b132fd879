"""Exact-substring dedup (operators/dedup.exact_substring_spans/_dedup —
the Lee et al. 2022 ExactSubstr operator, arXiv:2107.06499): span
detection, maximal-span merging, keep-one-copy semantics, and the
sub-quadratic plan shape."""

from __future__ import annotations

import pytest

from furchild_spark.operators import dedup

W = 4  # window length for fixtures (operator default is 50)


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id bigint, text string")


@pytest.fixture(scope="module")
def corpus(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens ≥ 2W-1
    return _docs(spark, [
        (1, f"one two {shared} three four"),          # shared at offset 2
        (2, f"{shared} something else entirely here"),  # shared at offset 0
        (3, "totally unrelated words in this doc"),
        (4, None),                                     # NULL text survives
        (5, "tiny doc"),                               # below window length
    ])


def test_spans_found_at_unaligned_offsets(spark, corpus):
    out = dedup.exact_substring_spans(
        corpus, min_tokens=W
    ).orderBy("doc_id").collect()
    got = {(r.doc_id, r.span_start, r.span_end) for r in out}
    # doc 1: tokens 2..7 are the shared passage; doc 2: tokens 0..5
    assert got == {(1, 2, 8), (2, 0, 6)}
    assert all(r.span_tokens == 6 for r in out)


def test_overlapping_windows_merge_to_one_maximal_span(spark, corpus):
    """The 6-token shared passage yields 3 overlapping 4-token windows;
    they must merge into ONE span, not three."""
    out = dedup.exact_substring_spans(corpus, min_tokens=W)
    assert out.filter("doc_id = 1").count() == 1


def test_touching_but_not_overlapping_spans_stay_split(spark):
    """Two duplicated passages separated by a unique token in ONE doc:
    coverage is discontiguous, so two spans come back."""
    a = "p1a p1b p1c p1d"
    b = "p2a p2b p2c p2d"
    df = _docs(spark, [
        (1, f"{a} UNIQUE {b}"),
        (2, f"{a} other words here now"),
        (3, f"{b} more filler tokens again"),
    ])
    out = dedup.exact_substring_spans(df, min_tokens=W)
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in out.filter("doc_id = 1").collect()}
    assert got == {(1, 0, 4), (1, 5, 9)}


def test_keep_first_spares_the_lowest_id_document(spark, corpus):
    out = dedup.exact_substring_spans(corpus, min_tokens=W, keep_first=True)
    ids = {r.doc_id for r in out.collect()}
    assert ids == {2}  # doc 1 is the keeper (min doc_id per fingerprint)


def test_dedup_rewrites_non_keepers_only(spark, corpus):
    out = {r.doc_id: r for r in dedup.exact_substring_dedup(
        corpus, min_tokens=W
    ).collect()}
    assert len(out) == 5  # every document survives, NULL/short included
    # keeper doc 1 keeps its text verbatim (canonical whitespace form)
    assert out[1].clean_text == (
        "one two alpha beta gamma delta epsilon zeta three four"
    )
    assert out[1].n_removed_tokens == 0
    # doc 2 loses exactly the shared passage
    assert out[2].clean_text == "something else entirely here"
    assert out[2].n_removed_tokens == 6
    assert out[2].n_tokens == 10
    # untouched / NULL / short docs pass through
    assert out[3].n_removed_tokens == 0
    assert out[4].clean_text == "" and out[4].n_tokens == 0
    assert out[5].clean_text == "tiny doc"


def test_within_doc_repetition_alone_is_not_marked(spark):
    """min_docs=2 counts DISTINCT documents: a passage repeated twice
    inside one doc but nowhere else is within-doc repetition
    (suppress_duplicate_chunks territory), not a cross-doc duplicate."""
    rep = "r1 r2 r3 r4"
    df = _docs(spark, [
        (1, f"{rep} middle words {rep}"),
        (2, "completely different content here"),
    ])
    assert dedup.exact_substring_spans(df, min_tokens=W).count() == 0


def test_plan_is_subquadratic_no_cartesian(spark, corpus):
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dedup.exact_substring_spans(corpus, min_tokens=W).explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    # the fingerprint groupBy is partial-aggregated (map-side combine)
    assert "partial_" in p
