"""Embedding similarity search: brute-force cosine top-k (correctness
baseline) + random-hyperplane LSH bucketing (the scale path).

Numeric discipline — exact integer dot products:

Components are quantized ONCE per vector: ``q_i = round_half_up(x_i, 6) ×
10^6`` (an exact long; the round is Spark's float→decimal(18,6) cast, the
same quantization an ANSI-SQL oracle applies). Every pairwise dot product is
then ``Σ q_i·r_i`` — pure primitive-long multiply-adds inside whole-stage
codegen, with the true dot equal to ``sum / 10^12`` exactly. This replaces a
per-pair BigDecimal fold (measured ~5× slower) while remaining BIT-EXACT:
integer sums are exact like decimal sums, and ``(long → double) / 1e12``
rounds to the same nearest-double as casting the exact decimal to double
(the long is < 2^53, and 1e12 is exactly representable).

Overflow bound: ``dim · (|x|·10^6)² < 2^63`` — safe for |x| ≤ 300 at
dim 64, |x| ≤ 75 at dim 1024; unit-norm-scale embeddings are far inside.

Scale notes: the query side is broadcast (top-k search is queries ≪ corpus);
the corpus side is a map-only scan → the plan is scan + broadcast join +
per-row expression + a top-k window partitioned by query id. For a 100 TB
corpus the LSH variant first groups by bucket so each query only scans its
candidate buckets; IVF probes only nprobe inverted lists.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .util import fanout


def _dec(x):
    return x.cast("double").cast("decimal(18,6)")


def quantize(vec_col):
    """Long-quantized components: ``q_i = round_half_up(x_i, 6) · 10^6``.
    The decimal cast happens once per vector component here; all pairwise
    math downstream is primitive-long."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.transform(v, lambda x: (_dec(x) * F.lit(1000000)).cast("long"))


def dot_q(qa, qb):
    """Exact integer dot of two quantized arrays — value is ``dot · 10^12``."""
    return F.aggregate(
        F.zip_with(qa, qb, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def dot_q_double(qa, qb):
    """The exact dot as the nearest double (identical to casting the exact
    decimal dot to double — see module docstring)."""
    return dot_q(qa, qb).cast("double") / F.lit(1.0e12)


def norm_q(q):
    """Euclidean norm from the quantized array, in double."""
    return F.sqrt(dot_q_double(q, q))


def dot_exact(a, b):
    """Exact dot product of two float-array columns (quantize + integer
    fold). Kept as the public single-shot API; hot paths quantize once and
    use :func:`dot_q` on the staged arrays."""
    return dot_q_double(quantize(a), quantize(b))


def cosine_sim(a, b):
    """Cosine similarity with exact integer dots, final ratio in double."""
    qa, qb = quantize(a), quantize(b)
    return dot_q_double(qa, qb) / (norm_q(qa) * norm_q(qb))


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
    # stage quantized components + norm ONCE per side (not per pair): the
    # per-pair work is one long fold, and the projections stay map-side
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            quantize(vec_col).alias("q_q"),
        ).select("query_id", "q_q", norm_q(F.col("q_q")).alias("q_norm"))
    )
    c = fanout(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        quantize(vec_col).alias("c_q"),
    ).select("neighbor_id", "c_q", norm_q(F.col("c_q")).alias("c_norm"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                dot_q_double(F.col("q_q"), F.col("c_q"))
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
    cb = (
        fanout(corpus)
        .select(F.col(id_col), quantize(vec_col).alias("__q"))
        .select(
            F.col(id_col),
            "__q",
            norm_q(F.col("__q")).alias("__norm"),
            bucket_from_q(F.col("__q"), planes).alias("bucket"),
        )
    )
    a = cb.select(
        "bucket", F.col(id_col).alias("id_a"),
        F.col("__q").alias("q_a"), F.col("__norm").alias("norm_a"),
    )
    b = cb.select(
        "bucket", F.col(id_col).alias("id_b"),
        F.col("__q").alias("q_b"), F.col("__norm").alias("norm_b"),
    )
    return (
        a.join(b, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                dot_q_double(F.col("q_a"), F.col("q_b"))
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
        corpus.filter(F.col(id_col) < num_centroids)
        .select(F.col(id_col).alias("cent_id"), quantize(vec_col).alias("cent_q"))
        .select("cent_id", "cent_q", norm_q(F.col("cent_q")).alias("cent_norm"))
    )
    cb = fanout(corpus).select(
        F.col(id_col).alias("neighbor_id"), quantize(vec_col).alias("c_q")
    ).select("neighbor_id", "c_q", norm_q(F.col("c_q")).alias("c_norm"))
    sim_to_cent = F.round(
        dot_q_double(F.col("c_q"), F.col("cent_q"))
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
        .select("cent_id", "neighbor_id", "c_q", "c_norm")
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"), quantize(vec_col).alias("q_q")
    ).select("query_id", "q_q", norm_q(F.col("q_q")).alias("q_norm"))
    q_to_cent = F.round(
        dot_q_double(F.col("q_q"), F.col("cent_q"))
        / (F.col("q_norm") * F.col("cent_norm")),
        6,
    )
    pw = Window.partitionBy("query_id").orderBy(F.desc("__cent_sim"), F.asc("cent_id"))
    probes = F.broadcast(
        qb.join(cent, how="cross")
        .withColumn("__cent_sim", q_to_cent)
        .withColumn("__rn", F.row_number().over(pw))
        .filter(F.col("__rn") <= nprobe)
        .select("cent_id", "query_id", "q_q", "q_norm")
    )
    scored = (
        probes.join(assign, on="cent_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                dot_q_double(F.col("q_q"), F.col("c_q"))
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


def bucket_from_q(q_col, planes: list[list[int]]):
    """bucket_id = Σ 2^i · [plane_i · v > 0] over the quantized array. The
    ±1 planes make each signed dot an exact long sum, and ``sum > 0`` agrees
    exactly with the decimal formulation (positive scale factor)."""
    q = F.col(q_col) if isinstance(q_col, str) else q_col
    bucket = F.lit(0)
    for i, plane in enumerate(planes):
        signed = F.zip_with(
            q,
            F.array(*[F.lit(s).cast("long") for s in plane]),
            lambda x, s: x * s,
        )
        dot = F.aggregate(
            signed, F.lit(0).cast("long"), lambda acc, x: acc + x
        )
        bucket = bucket + F.when(dot > 0, F.lit(2 ** i)).otherwise(F.lit(0))
    return bucket.cast("int")


def hyperplane_bucket_expr(vec_col, planes: list[list[int]]):
    """Bucket id straight from the float array (quantize + bucket_from_q)."""
    return bucket_from_q(quantize(vec_col), planes)


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
    cb = (
        fanout(corpus)
        .select(F.col(id_col).alias("neighbor_id"), quantize(vec_col).alias("c_q"))
        .select(
            "neighbor_id",
            "c_q",
            norm_q(F.col("c_q")).alias("c_norm"),
            bucket_from_q(F.col("c_q"), planes).alias("bucket"),
        )
    )
    qb = F.broadcast(
        queries
        .select(F.col(id_col).alias("query_id"), quantize(vec_col).alias("q_q"))
        .select(
            "query_id",
            "q_q",
            norm_q(F.col("q_q")).alias("q_norm"),
            bucket_from_q(F.col("q_q"), planes).alias("bucket"),
        )
    )
    scored = (
        qb.join(cb, on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim",
            F.round(
                dot_q_double(F.col("q_q"), F.col("c_q"))
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
