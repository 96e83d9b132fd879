"""Embedding similarity search: brute-force cosine top-k (correctness
baseline) + random-hyperplane LSH bucketing (the scale path).

Numeric discipline: dot products are computed over components cast
float→double→decimal(18,6); products land in decimal(37,12) and the fold sum
is *exact*, so results are bit-reproducible across engines and partition
orders (a plain double sum is order-sensitive — unacceptable when an oracle
hashes the output). Norm/sqrt/ratio happen once per pair in double.

Scale notes: the query side is broadcast (top-k search is queries ≪ corpus);
the corpus side is a map-only scan → the plan is scan + broadcast join +
per-row expression + a top-k window partitioned by query id. For a 100 TB
corpus the LSH variant first groups by bucket so each query only scans its
candidate buckets.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .util import fanout


def _dec(x):
    return x.cast("double").cast("decimal(18,6)")


# Accumulator type for exact decimal folds. Addition (30,12)+(30,12) yields
# (31,12) with NO precision-loss rounding (≤38), and the cast back to
# (30,12) is exact for the value ranges here (|dot| ≪ 10^18) — so the fold
# stays type-closed AND bit-exact. A (38,12) accumulator would NOT work:
# (38,12)+(38,12) overflows precision 38 and Spark silently rounds to
# scale 11.
_ACC = "decimal(30,12)"


def dot_exact(a, b):
    """Exact decimal dot product of two float-array columns."""
    prods = F.zip_with(a, b, lambda x, y: _dec(x) * _dec(y))
    return F.aggregate(
        prods,
        F.lit(0).cast(_ACC),
        lambda acc, x: (acc + x.cast(_ACC)).cast(_ACC),
    )


def cosine_sim(a, b):
    """Cosine similarity with exact-decimal dots, final ratio in double."""
    num = dot_exact(a, b).cast("double")
    den = F.sqrt(dot_exact(a, a).cast("double")) * F.sqrt(
        dot_exact(b, b).cast("double")
    )
    return num / den


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force top-k: broadcast the queries against the full corpus.
    Ties broken by neighbor id after rounding sim to 6 dp (keeps ranking
    deterministic across engines)."""
    # stage per-vector norms ONCE per side (not per pair): 1 dot per pair
    # instead of 3, and the norm projections stay map-side before the join
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.sqrt(dot_exact(F.col(vec_col), F.col(vec_col)).cast("double")).alias("q_norm"),
        )
    )
    c = fanout(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(dot_exact(F.col(vec_col), F.col(vec_col)).cast("double")).alias("c_norm"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                dot_exact(F.col("q_vec"), F.col("c_vec")).cast("double")
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def cosine_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    num_planes: int = 4,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the vector-space member of
    the dedup family (exact / MinHash / SimHash / Jaccard / **cosine**).

    Same shape as MinHash-LSH: hyperplane buckets generate candidates via a
    *keyed self-join* (never an O(n²) cross product), then the exact rounded
    cosine verifies. Recall is bounded by the planes: a true near-dup pair
    is missed iff some plane separates it — more planes → fewer candidates,
    lower recall; the (num_planes, threshold) pair is the tuning surface.
    """
    if dim is None:
        dim = len(corpus.select(vec_col).first()[0])
    planes = deterministic_planes(num_planes, dim, seed)
    cb = fanout(corpus).select(
        F.col(id_col),
        F.col(vec_col).alias("__vec"),
        F.sqrt(dot_exact(F.col(vec_col), F.col(vec_col)).cast("double")).alias("__norm"),
        hyperplane_bucket_expr(vec_col, planes).alias("bucket"),
    )
    a = cb.select(
        "bucket", F.col(id_col).alias("id_a"),
        F.col("__vec").alias("vec_a"), F.col("__norm").alias("norm_a"),
    )
    b = cb.select(
        "bucket", F.col(id_col).alias("id_b"),
        F.col("__vec").alias("vec_b"), F.col("__norm").alias("norm_b"),
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                dot_exact(F.col("vec_a"), F.col("vec_b")).cast("double")
                / (F.col("norm_a") * F.col("norm_b")),
                6,
            ),
        )
        .filter(F.col("cosine") >= F.lit(threshold))
        .select("bucket", "id_a", "id_b", "cosine")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_centroids: int = 8,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-flat ANN: partition the corpus into inverted lists by nearest
    centroid, probe only the query's ``nprobe`` closest lists.

    Centroid choice is pluggable; here it's the first ``num_centroids``
    corpus vectors (deterministic, oracle-reproducible) — production would
    k-means-train them, which changes recall but not this plan shape. The
    shape IS the point at 100 TB: assignment is a broadcast join against
    ``num_centroids`` rows + one argmax window, and the probe→list lookup
    is an equi join on ``cent_id`` (the inverted lists co-partition), so
    each query touches nprobe/num_centroids of the corpus instead of all
    of it. Recall < 1 by design, like every IVF index.
    """
    cent = F.broadcast(
        corpus.filter(F.col(id_col) < num_centroids).select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("cent_vec"),
            F.sqrt(dot_exact(F.col(vec_col), F.col(vec_col)).cast("double")).alias("cent_norm"),
        )
    )
    cb = fanout(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(dot_exact(F.col(vec_col), F.col(vec_col)).cast("double")).alias("c_norm"),
    )
    sim_to_cent = F.round(
        dot_exact(F.col("c_vec"), F.col("cent_vec")).cast("double")
        / (F.col("c_norm") * F.col("cent_norm")),
        6,
    )
    aw = Window.partitionBy("neighbor_id").orderBy(
        F.desc("__cent_sim"), F.asc("cent_id")
    )
    assign = (
        cb.join(cent, how="cross")
        .withColumn("__cent_sim", sim_to_cent)
        .withColumn("__rn", F.row_number().over(aw))
        .filter(F.col("__rn") == 1)
        .select("cent_id", "neighbor_id", "c_vec", "c_norm")
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.sqrt(dot_exact(F.col(vec_col), F.col(vec_col)).cast("double")).alias("q_norm"),
    )
    q_to_cent = F.round(
        dot_exact(F.col("q_vec"), F.col("cent_vec")).cast("double")
        / (F.col("q_norm") * F.col("cent_norm")),
        6,
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("__cent_sim"), F.asc("cent_id"))
    probes = F.broadcast(
        qb.join(cent, how="cross")
        .withColumn("__cent_sim", q_to_cent)
        .withColumn("__rn", F.row_number().over(pw))
        .filter(F.col("__rn") <= nprobe)
        .select("cent_id", "query_id", "q_vec", "q_norm")
    )
    scored = (
        probes.join(assign, on="cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                dot_exact(F.col("q_vec"), F.col("c_vec")).cast("double")
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def deterministic_planes(num_planes: int, dim: int, seed: int = 42) -> list[list[int]]:
    """±1 hyperplanes from a seeded PRNG — deterministic so the identical
    constants can be embedded in an oracle SQL string."""
    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(num_planes)]


def hyperplane_bucket_expr(vec_col, planes: list[list[int]]):
    """bucket_id = Σ 2^i · [plane_i · v > 0]; the ±1 planes make each dot an
    exact decimal sum of (sign-flipped) components — reproducible in SQL."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        signed = F.zip_with(
            v,
            F.array(*[F.lit(s) for s in plane]),
            lambda x, s: _dec(x) * s.cast("decimal(18,6)"),
        )
        dot = F.aggregate(
            signed,
            F.lit(0).cast(_ACC),
            lambda acc, x: (acc + x.cast(_ACC)).cast(_ACC),
        )
        bucket = bucket + F.when(dot > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket.cast("int")


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Scale-path ANN: bucket corpus and queries by hyperplane signs, search
    only within the query's bucket. Recall < 1 by design (it's *approximate*);
    at 100 TB the bucket key turns the broadcast-scan into a pruned equi join."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = deterministic_planes(num_planes, dim, seed)
    cb = fanout(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.sqrt(dot_exact(F.col(vec_col), F.col(vec_col)).cast("double")).alias("c_norm"),
        hyperplane_bucket_expr(vec_col, planes).alias("bucket"),
    )
    qb = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_vec"),
            F.sqrt(dot_exact(F.col(vec_col), F.col(vec_col)).cast("double")).alias("q_norm"),
            hyperplane_bucket_expr(vec_col, planes).alias("bucket"),
        )
    )
    scored = (
        qb.join(cb, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                dot_exact(F.col("q_vec"), F.col("c_vec")).cast("double")
                / (F.col("q_norm") * F.col("c_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "rank", "neighbor_id", "sim")
    )
