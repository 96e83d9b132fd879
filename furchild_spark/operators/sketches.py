"""Deterministic distributed sketches.

The built-in approximate aggregates (``approx_count_distinct`` — HLL++,
``percentile_approx``) are engine-specific: their estimates differ
between Spark and any oracle, between Spark versions, and sometimes
between runs, so they can never sit behind a value-hash parity gate and
their results are not reproducible artifacts. The sketches here are
**deterministic by construction** — md5 over the item value, exact
integer arithmetic — so the same corpus always yields the same sketch on
any engine, which is what a 100 TB pipeline needs when a cardinality
estimate feeds a downstream decision that must replay byte-stable.

KMV (k minimum values) cardinality sketch (Bar-Yossef et al. 2002;
Beyer et al. SIGMOD'07 "On Synopses for Distinct-Value Estimation"):
hash every item to a uniform 60-bit integer, keep the k smallest
distinct hashes per group; if the k-th smallest is ``h_k`` then
``(k-1) * 2^60 / h_k`` estimates the distinct count (the k-th order
statistic of n uniform draws on [0,1] concentrates at k/n). Standard
error ~ 1/sqrt(k-2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 60 bits: 15 hex chars of the md5 — fits a signed long with headroom,
# and the DuckDB oracle can rebuild the same integer with exact shifts
# (CAST(strpos(hex digit) AS BIGINT) << 4*i), no float precision loss.
HASH_BITS = 60
HASH_SPACE = float(1 << HASH_BITS)  # 2^60, exactly representable


def kmv_hash(col) -> F.Column:
    """Uniform 60-bit integer hash of a string column, deterministic and
    engine-portable (md5 prefix, base-16 to long)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    item_col: str,
    k: int = 64,
    merge_buckets: int = 32,
) -> DataFrame:
    """Per-group distinct-count estimate via a KMV sketch.

    Two-phase k-min, exploiting that k-min is associative —
    ``kmin(A ∪ B) = kmin(kmin(A) ∪ kmin(B))`` — with every step either
    map-side-combined or a spill-safe sort:

    - dedupe (group, hash) with a hash aggregate (partial combine, so
      repeated items collapse map-side);
    - phase 1 ranks within (group, salt) where the salt is a
      deterministic hash of the VALUE (not the partition — partition
      ids are run-dependent and would break replay): each of
      ``merge_buckets`` shards keeps its k smallest via a windowed
      row_number, a sort that spills instead of growing an aggregation
      buffer (the collect_set formulation would hold a hot group's
      whole distinct-hash set in one reducer's memory);
    - phase 2 ranks the ≤ merge_buckets × k survivors per group — a
      bounded input (64×32 longs) regardless of corpus size, so the
      per-group window is never a hot spot.

    Returns (group, n_mins, kth_min, kmv_estimate): when a group has
    fewer than k distinct hashes the sketch IS the exact count and the
    estimate equals n_mins; kth_min is null in that case.
    """
    hv = kmv_hash(F.col(item_col))
    # NULL items hash to NULL, which Spark's ascending window ranks
    # FIRST — a NULL would eat a k-min slot and bias the estimate (and
    # DuckDB ranks nulls LAST, so the oracle would diverge). A sketch
    # counts distinct VALUES; drop nulls before ranking.
    base = (
        df.select(F.col(group_col).alias("grp"), hv.alias("hv"))
        .filter(F.col("hv").isNotNull())
        .distinct()
    )
    w1 = Window.partitionBy("grp", "salt").orderBy("hv")
    p1 = (
        base.withColumn(
            "salt", F.pmod(F.xxhash64(F.col("hv")), F.lit(merge_buckets))
        )
        .withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .select("grp", "hv")
    )
    w2 = Window.partitionBy("grp").orderBy("hv")
    p2 = p1.withColumn("rn", F.row_number().over(w2)).filter(F.col("rn") <= k)
    n_mins = F.count(F.lit(1))
    kth = F.max(F.when(F.col("rn") == k, F.col("hv")))
    est = F.when(n_mins < k, n_mins.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / kth.cast("double")
    )
    return p2.groupBy("grp").agg(
        n_mins.cast("long").alias("n_mins"),
        kth.cast("long").alias("kth_min"),
        F.round(est, 4).alias("kmv_estimate"),
    ).select(
        F.col("grp").alias(group_col), "n_mins", "kth_min", "kmv_estimate"
    )


def kmv_intersection(
    df: DataFrame,
    group_col: str,
    item_col: str,
    base_group: str,
    k: int = 64,
) -> DataFrame:
    """Estimate |distinct(base) ∩ distinct(g)| for every other group g —
    KMV sketch algebra (Beyer et al. SIGMOD'07 §4): merge the two
    sketches, keep the k smallest of the union, count how many of those
    appear in BOTH inputs (k∩), then
    ``est_inter = (k∩ / |L|) · est_union`` where ``est_union`` is the
    plain KMV estimate on the merged k-min set L. This is how a planner
    prices a join (or a curator measures vocabulary overlap between two
    corpus slices) from two 16 KB sketches instead of two corpus scans.

    The per-group k-min here is a single ranked window (the groups'
    distinct-hash sets are vocabulary-scale); for open-ended item
    domains reuse kmv_distinct's salted two-phase k-min as the input.
    Replication of the base sketch across groups broadcasts the ≤k-row
    sketch against the ≤|groups|-row group list (Catalyst folds the
    constant key into a BroadcastNestedLoopJoin — bounded on BOTH
    sides, the whitelisted scalar-broadcast class, never data-sized).

    Returns (group, n_common_mins, kmv_overlap_estimate), one row per
    non-base group.
    """
    hv = kmv_hash(F.col(item_col))
    hashed = (
        df.select(F.col(group_col).alias("grp"), hv.alias("hv"))
        .filter(F.col("hv").isNotNull())  # same null rule as kmv_distinct
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("hv")
    sk = (
        hashed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "hv")
    )
    a = sk.filter(F.col("grp") == base_group).select(
        "hv", F.lit(1).alias("in_a"), F.lit(1).alias("j")
    )
    b = sk.filter(F.col("grp") != base_group).select(
        F.col("grp").alias("grp_b"), "hv", F.lit(1).alias("in_b")
    )
    groups = b.select("grp_b").distinct().withColumn("j", F.lit(1))
    rep_a = groups.join(F.broadcast(a), on="j").select(
        "grp_b", "hv", "in_a", F.lit(0).alias("in_b")
    )
    u = rep_a.unionByName(
        b.select("grp_b", "hv", F.lit(0).alias("in_a"), "in_b")
    )
    merged = u.groupBy("grp_b", "hv").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    w2 = Window.partitionBy("grp_b").orderBy("hv")
    top = merged.withColumn("rn", F.row_number().over(w2)).filter(
        F.col("rn") <= k
    )
    n_l = F.count(F.lit(1))
    h_k = F.max(F.when(F.col("rn") == k, F.col("hv")))
    k_inter = F.sum(F.col("in_a") * F.col("in_b"))
    est_union = F.when(n_l < k, n_l.cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / h_k.cast("double")
    )
    est_inter = (k_inter.cast("double") / n_l.cast("double")) * est_union
    return top.groupBy("grp_b").agg(
        k_inter.cast("long").alias("n_common_mins"),
        F.round(est_inter, 4).alias("kmv_overlap_estimate"),
    ).select(
        F.col("grp_b").alias(group_col),
        "n_common_mins",
        "kmv_overlap_estimate",
    )


def cms_bucket(col, row: int, width: int) -> F.Column:
    """Bucket of ``col`` in CMS row ``row``: md5 of the salted value,
    60-bit prefix mod width. Salting with the row index gives the d
    pairwise-independent-ish hash functions; md5 keeps it deterministic
    and engine-portable (the oracle rebuilds the identical bucket)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        kmv_hash(F.concat(F.lit(f"{row}:"), c)), F.lit(width)
    ).cast("long")


def cms_sketch(
    df: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) of an item stream:
    a depth × width grid of counters, ``cms[r][bucket_r(x)] += 1`` for
    every occurrence. Built as ONE hash aggregation over the exploded
    (row, bucket) pairs — depth-fold row growth but map-side combined
    down to ≤ depth × width rows per partition, so the shuffle carries
    the sketch, not the stream. The whole sketch is ``depth*width``
    longs (8 KB at 4×256) regardless of corpus size; sketches of corpus
    shards merge by cell-wise addition (the same groupBy), which is why
    a 100 TB frequency profile can be maintained incrementally.

    Returns (row, bucket, cnt)."""
    c = F.col(item_col)
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        cms_bucket(c, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb")
    ).select("rb.row", "rb.bucket")
    return pairs.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame, candidates: DataFrame, item_col: str,
    depth: int = 4, width: int = 256,
) -> DataFrame:
    """Point-estimate candidate frequencies from a CMS: for each
    candidate, min over the d rows of its bucket counters (each cell
    over-counts by colliding items, never under-counts, so min is the
    tightest upper bound — est ≥ true, E[err] ≤ e·N/width). The
    candidate set joins the 8 KB sketch by (row, bucket) with the
    sketch broadcast — the stream itself is never rescanned, which is
    the point of carrying the sketch. The join is LEFT with empty cells
    counting 0: a candidate absent from the stream must estimate ≤ its
    collision mass (possibly 0), not vanish from the output or take the
    min over only its non-empty cells."""
    c = F.col(item_col)
    probes = candidates.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("long").alias("row"),
                        cms_bucket(c, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(item_col, "rb.row", "rb.bucket")
    return (
        probes.join(F.broadcast(sketch), on=["row", "bucket"], how="left")
        .groupBy(item_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("long").alias("cms_estimate")
        )
    )
