"""Behavioral cases for the round-7 retrieval/curation operators:
trec_eval edge semantics, RRF determinism, DSIR selection pressure."""

from pyspark.sql import functions as F

from furchild_spark.operators import curate


def test_retrieval_eval_zero_hit_query_scores_zero(spark):
    runs = spark.createDataFrame(
        [("q1", 1, 10), ("q1", 2, 11)],
        "query_id string, rank long, doc_id long",
    )
    qrels = spark.createDataFrame(
        [("q1", 11), ("q2", 99)], "query_id string, doc_id long"
    )
    out = {r["query_id"]: r for r in curate.retrieval_eval(runs, qrels, k=10).collect()}
    # q1: 1 relevant, hit at rank 2
    assert out["q1"]["n_rel"] == 1 and out["q1"]["hits"] == 1
    assert out["q1"]["recall_at_k"] == 1.0 and out["q1"]["mrr"] == 0.5
    # q2 judged but never retrieved: zero, not absent (trec_eval semantics)
    assert out["q2"]["hits"] == 0 and out["q2"]["recall_at_k"] == 0.0
    assert out["q2"]["mrr"] == 0.0


def test_retrieval_eval_ignores_unjudged_queries(spark):
    runs = spark.createDataFrame(
        [("q_unjudged", 1, 10)], "query_id string, rank long, doc_id long"
    )
    qrels = spark.createDataFrame([("q1", 10)], "query_id string, doc_id long")
    got = {r["query_id"] for r in curate.retrieval_eval(runs, qrels).collect()}
    assert got == {"q1"}


def test_rrf_fuse_rank_only_and_tie_break(spark):
    # doc 20 ranks 1st in run B only; doc 10 ranks 1st in run A only and
    # 2nd in B -> doc 10 wins on summed reciprocal ranks
    run_a = spark.createDataFrame(
        [("q", 1, 10)], "query_id string, rank long, doc_id long"
    )
    run_b = spark.createDataFrame(
        [("q", 1, 20), ("q", 2, 10)], "query_id string, rank long, doc_id long"
    )
    out = curate.rrf_fuse([run_a, run_b], k=10, c=60).collect()
    ranked = [(r["rank"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [(1, 10), (2, 20)]
    # doc 10: 1/61 + 1/62; doc 20: 1/61 — exact 6-dp decimal sums
    scores = {r["doc_id"]: r["rrf_score"] for r in out}
    assert abs(scores[10] - (round(1 / 61, 6) + round(1 / 62, 6))) < 1e-9


def test_dsir_selects_target_like_raw_docs(spark):
    # target = 'spark spark spark' profile; raw docs: one target-like,
    # one alien — the target-like doc must win the top-1 selection
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark", True),
            (2, "spark spark spark", False),
            (3, "zzz yyy xxx www", False),
        ],
        "doc_id long, text string, tgt boolean",
    )
    out = curate.dsir_select(docs, "doc_id", "text", F.col("tgt"), k=1).collect()
    assert [r["doc_id"] for r in out] == [2]


def test_power_iteration_guards(spark):
    """Empty corpus and rounds<1 raise clear ValueErrors; an all-zero
    quantized corpus raises on the degenerate pivot instead of emitting
    NULL loadings."""
    import pytest
    from pyspark.sql import functions as F

    from furchild_spark.operators.similarity import (
        power_iteration_top_direction,
    )

    empty = spark.range(0).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="empty corpus"):
        power_iteration_top_direction(empty)

    some = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="rounds"):
        power_iteration_top_direction(some, rounds=0)

    zeros = spark.range(3).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(0.0), F.lit(0.0)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="zero pivot"):
        power_iteration_top_direction(zeros, rounds=1)
