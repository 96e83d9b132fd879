"""Property tests for the curation split/classifier operators — the
invariants these operators exist to provide, driven by hypothesis over
random small inputs (examples kept small: each check is a real Spark
job; ``deadline=None`` because Spark latency is not a property failure).

- leakage_safe_split: every connected component of the pair graph lands
  in exactly ONE split (the co-location guarantee), every doc survives
  exactly once, and singletons split exactly as plain hash_split would —
  so adding a pair graph never reshuffles unrelated documents.
- hash_split stability: a document's split NEVER changes when other
  documents are added or removed (the anti-contamination property the
  md5 threshold exists for).
- nb_quality_score: scores are a pure function of the LABELED corpus —
  adding unlabeled pool docs never moves any other doc's score.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from furchild_spark.operators import curate

_IDS = st.integers(min_value=1, max_value=30)


@given(
    ids=st.sets(_IDS, min_size=2, max_size=12),
    edges=st.lists(st.tuples(_IDS, _IDS), max_size=8),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
def test_leakage_split_colocation_and_coverage(spark, ids, edges):
    ids = sorted(ids)
    # only edges between present docs, no self-loops
    edges = [(a, b) for a, b in edges if a != b and a in ids and b in ids]
    docs = spark.createDataFrame([(i,) for i in ids], ["doc_id"])
    pairs = spark.createDataFrame(
        edges or [(-1, -2)], ["id_a", "id_b"]
    )  # sentinel pair outside the id space when hypothesis drew none
    out = curate.leakage_safe_split(docs, pairs, "doc_id").collect()

    # exactly one row per doc
    assert sorted(r.doc_id for r in out) == ids
    by_id = {r.doc_id: r for r in out}

    # union-find ground truth for components
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    for i in ids:
        root = find(i)
        # group key is the component min id; co-location follows
        assert by_id[i].group_id == root, (i, root, by_id[i])
        assert by_id[i].split == by_id[root].split
    # singletons behave exactly like plain hash_split on their own id
    singles = [i for i in ids if find(i) == i and not any(
        find(a) == i for a in ids if a != i
    )]
    if singles:
        plain = {
            r.doc_id: r.split
            for r in curate.hash_split(
                spark.createDataFrame([(i,) for i in singles], ["doc_id"]),
                "doc_id",
            ).collect()
        }
        for i in singles:
            assert by_id[i].split == plain[i]


@given(
    base=st.sets(_IDS, min_size=1, max_size=10),
    extra=st.sets(st.integers(min_value=31, max_value=60), max_size=10),
)
@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
def test_hash_split_stable_under_growth(spark, base, extra):
    a = spark.createDataFrame([(i,) for i in sorted(base)], ["doc_id"])
    b = spark.createDataFrame(
        [(i,) for i in sorted(base | extra)], ["doc_id"]
    )
    sa = {r.doc_id: r.split for r in curate.hash_split(a, "doc_id").collect()}
    sb = {r.doc_id: r.split for r in curate.hash_split(b, "doc_id").collect()}
    for i in base:
        assert sa[i] == sb[i]


@given(pool=st.sets(st.integers(min_value=100, max_value=120), max_size=5))
@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow,
                           HealthCheck.function_scoped_fixture],
)
def test_nb_scores_independent_of_pool(spark, pool):
    """The classifier is trained on LABELED rows only: adding unlabeled
    pool docs must not move any existing doc's score (the property that
    makes batch scoring embarrassingly parallel at 100 TB)."""
    labeled = [
        (1, "good clean prose", "pos"),
        (2, "fluent clean text", "pos"),
        (3, "spam junk noise", "neg"),
        (4, "junk garbage spam", "neg"),
        (5, "clean prose probe", "pool"),
    ]
    extra = [(i, f"noise probe {i}", "pool") for i in sorted(pool)]
    cols = ["doc_id", "text", "lbl"]
    kw = dict(
        is_positive=F.col("lbl") == "pos",
        is_negative=F.col("lbl") == "neg",
    )
    small = curate.nb_quality_score(
        spark.createDataFrame(labeled, cols), "doc_id", "text", **kw
    ).collect()
    big = curate.nb_quality_score(
        spark.createDataFrame(labeled + extra, cols), "doc_id", "text", **kw
    ).collect()
    s_small = {r.doc_id: r.score for r in small}
    s_big = {r.doc_id: r.score for r in big}
    for i in s_small:
        assert s_small[i] == s_big[i], i
