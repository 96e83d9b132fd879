"""Training-batch assembly operators: deterministic epoch shuffle and
length-bucketed batching.

Both are the last mile of a training-data pipeline — after curation the
corpus must be (a) shuffled reproducibly per epoch and (b) grouped into
batches of similar sequence length so padding waste stays bounded.

Scale notes: both operators are a single window pass over a
hash-derived or length-derived key — one exchange each, no joins, no
driver-side state. The md5-based shuffle key makes epochs reproducible
across engines and cluster sizes (no RNG, no partition-order
dependence): epoch e of corpus C is a pure function of (e, doc ids).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epoch: int,
    rank_col: str = "shuffle_rank",
    shard_prefix_chars: int = 2,
) -> DataFrame:
    """Deterministic global shuffle order for one training epoch:
    ``rank = row_number() over (order by md5(epoch || ':' || id), id)``
    — computed WITHOUT a global single-partition sort.

    A naive ``Window.orderBy(key)`` funnels the whole corpus through one
    task. Instead the first ``shard_prefix_chars`` hex chars of the key
    define 16^c shards that are MONOTONE in key order (fixed-width
    lowercase hex ⇒ lexicographic = numeric prefix order), so the global
    rank decomposes exactly into: per-shard ``row_number`` (parallel,
    one hash-partitioned window exchange) + the exclusive prefix-sum of
    shard counts (16^c rows — a trivially small second pass, broadcast
    back). md5 uniformity balances the shards. 2 chars = 256 shards is
    right for local testing; use 4 (65 536) at 100 TB.

    The hash order is uniform, reproducible, and changes completely
    between epochs; the id tiebreak keeps the rank total even under
    (vanishingly unlikely) hash ties. Epoch e of corpus C is a pure
    function of (e, ids) — no RNG, no partition-order dependence.
    """
    key = F.md5(F.concat(F.lit(f"{epoch}:"), F.col(id_col).cast("string")))
    keyed = df.withColumn("__key", key).withColumn(
        "__shard",
        F.conv(F.substring("__key", 1, shard_prefix_chars), 16, 10).cast("long"),
    )
    w = Window.partitionBy("__shard").orderBy(
        F.col("__key").asc(), F.col(id_col).asc()
    )
    ranked = keyed.withColumn("__rn", F.row_number().over(w))
    counts = keyed.groupBy("__shard").agg(F.count(F.lit(1)).alias("__n"))
    w_off = Window.orderBy("__shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("__shard", "__offset")
    return (
        ranked.join(F.broadcast(offsets), on="__shard")
        .withColumn(rank_col, (F.col("__offset") + F.col("__rn")).cast("long"))
        .drop("__key", "__shard", "__rn", "__offset")
    )


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    length_col: str,
    batch_size: int,
    bucket_width: int = 64,
    sub_shard_chars: int = 2,
) -> DataFrame:
    """Assign (length_bucket, batch_id, pos_in_batch): sequences are
    grouped into ``bucket_width``-sized length bands, ordered
    deterministically within each band by ``(length, md5(id), id)``, and
    chopped into batches of ``batch_size`` — the standard
    padding-minimization batching (pad only to the band's max, not the
    corpus max).

    A window partitioned only by the band serializes a fat band into one
    task — and fat bands are the REALISTIC case (post-chunking corpora
    concentrate at one length). The md5-of-id tiebreak exists precisely
    so the band rank can decompose like :func:`epoch_shuffle`'s: the
    hash's hex prefix sub-shards every (band, length) group uniformly
    and MONOTONICALLY in the band order, so per-(band, length, sub-shard)
    row_numbers (parallel) plus an exclusive prefix sum over the small
    per-group count table (broadcast back) reproduce the exact band
    rank. Any deterministic total order is equally valid for batching;
    this one is the order that distributes.

    Batch ids are unique only within a band; (length_bucket, batch_id)
    is the global key — a globally-dense batch id would cost an extra
    corpus pass for zero benefit to the loader.
    """
    h = F.md5(F.col(id_col).cast("string"))
    base = df.select(
        F.col(id_col),
        F.col(length_col),
        (F.col(length_col) / F.lit(bucket_width)).cast("long").alias("length_bucket"),
        h.alias("__h"),
        F.conv(F.substring(h, 1, sub_shard_chars), 16, 10)
        .cast("long")
        .alias("__sub"),
    )
    w = Window.partitionBy("length_bucket", length_col, "__sub").orderBy(
        F.col("__h").asc(), F.col(id_col).asc()
    )
    ranked = base.withColumn("__rn", F.row_number().over(w))
    counts = base.groupBy("length_bucket", length_col, "__sub").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_off = (
        Window.partitionBy("length_bucket")
        .orderBy(F.col(length_col).asc(), F.col("__sub").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.withColumn(
        "__offset", F.coalesce(F.sum("__n").over(w_off), F.lit(0))
    ).select("length_bucket", length_col, "__sub", "__offset")
    band_rn = F.col("__offset") + F.col("__rn") - F.lit(1)
    return (
        ranked.join(F.broadcast(offsets), on=["length_bucket", length_col, "__sub"])
        .withColumn("batch_id", (band_rn / F.lit(batch_size)).cast("long"))
        .withColumn("pos_in_batch", (band_rn % F.lit(batch_size)).cast("long"))
        .select(
            id_col, length_col, "length_bucket", "batch_id", "pos_in_batch"
        )
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    length_col: str,
    budget: int,
    sub_shard_chars: int = 2,
) -> DataFrame:
    """GPT-style sequence packing: lay every document's tokens on ONE
    deterministic global token stream (order = ``(md5(id), id)``, the
    :func:`epoch_shuffle` key — no RNG, engine-independent), then chop
    the stream into fixed ``budget``-token packs. Documents straddle
    pack boundaries (split, not padded) — exactly the
    concatenate-then-chunk batching of GPT/Llama pretraining, so there
    is ZERO padding waste by construction; every pack except the last
    is exactly full.

    Returns one row per (document × pack it touches):
    ``pack_id``, ``pack_pos`` (where the segment starts inside the
    pack), ``doc_offset`` (which part of the doc this segment is),
    ``seg_len``. Zero-length documents carry no tokens and are dropped.

    Scale shape: the global running token offset is the same
    distributable prefix sum as :func:`length_bucketed_batches` — md5
    hex prefix sub-shards are MONOTONE in the global order, so
    per-shard window cumsums (parallel) plus an exclusive prefix sum
    over the tiny per-shard total table (broadcast back) reproduce the
    exact global offsets: one bounded-width window exchange, one
    broadcast join, and an in-row explode of at most
    ``1 + len/budget`` pack segments. No global single-partition
    window, no driver state."""
    h = F.md5(F.col(id_col).cast("string"))
    base = df.filter(F.col(length_col) > 0).select(
        F.col(id_col),
        F.col(length_col).cast("long").alias("__n"),
        h.alias("__h"),
        F.conv(F.substring(h, 1, sub_shard_chars), 16, 10)
        .cast("long")
        .alias("__sub"),
    )
    w = (
        Window.partitionBy("__sub")
        .orderBy(F.col("__h").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn("__local0", F.coalesce(F.sum("__n").over(w), F.lit(0)))
    totals = base.groupBy("__sub").agg(F.sum("__n").alias("__t"))
    w_off = (
        Window.orderBy(F.col("__sub").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__offset", F.coalesce(F.sum("__t").over(w_off), F.lit(0))
    ).select("__sub", "__offset")
    g0 = F.col("__offset") + F.col("__local0")
    g1 = g0 + F.col("__n")
    B = F.lit(budget).cast("long")
    placed = local.join(F.broadcast(offsets), on="__sub").select(
        F.col(id_col),
        g0.alias("__g0"),
        g1.alias("__g1"),
    )
    p = F.col("pack_id")
    seg_start = F.greatest(F.col("__g0"), p * B)
    seg_end = F.least(F.col("__g1"), (p + F.lit(1)) * B)
    return (
        placed.withColumn(
            "pack_id",
            # integral `div`, not `/`: float division is exact only to
            # 2^53 and this offset is a TOKEN count over the whole corpus
            F.explode(
                F.sequence(
                    F.expr(f"__g0 div {int(budget)}").cast("long"),
                    F.expr(f"(__g1 - 1) div {int(budget)}").cast("long"),
                )
            ),
        )
        .select(
            F.col(id_col),
            p.cast("long").alias("pack_id"),
            (seg_start - p * B).cast("long").alias("pack_pos"),
            (seg_start - F.col("__g0")).cast("long").alias("doc_offset"),
            (seg_end - seg_start).cast("long").alias("seg_len"),
        )
    )
