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
    df: DataFrame, id_col: str, epoch: int, rank_col: str = "shuffle_rank"
) -> DataFrame:
    """Deterministic global shuffle order for one training epoch:
    ``rank = row_number() over (order by md5(epoch || ':' || id), id)``.

    The hash order is uniform, reproducible, and changes completely
    between epochs; the id tiebreak keeps the rank total even under
    (vanishingly unlikely) hash ties. One window exchange; at scale the
    downstream writer pairs this with ``repartitionByRange(rank)`` so
    output shards are contiguous rank ranges.
    """
    key = F.md5(F.concat(F.lit(f"{epoch}:"), F.col(id_col).cast("string")))
    w = Window.orderBy(key.asc(), F.col(id_col).asc())
    return df.withColumn(rank_col, F.row_number().over(w).cast("long"))


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    length_col: str,
    batch_size: int,
    bucket_width: int = 64,
) -> DataFrame:
    """Assign (length_bucket, batch_id, pos_in_batch): sequences are
    grouped into ``bucket_width``-sized length bands, ordered
    deterministically within each band (length, id), and chopped into
    batches of ``batch_size`` — the standard padding-minimization
    batching (pad only to the band's max, not the corpus max).

    One window exchange partitioned by the length band. Batch ids are
    unique only within a band; (length_bucket, batch_id) is the global
    key, which keeps the operator a single pass — a globally-unique dense
    batch id would need a second pass over band counts for zero benefit
    to the loader.
    """
    bucket = (F.col(length_col) / F.lit(bucket_width)).cast("long").alias(
        "length_bucket"
    )
    w = Window.partitionBy("length_bucket").orderBy(
        F.col(length_col).asc(), F.col(id_col).asc()
    )
    rn = F.row_number().over(w) - F.lit(1)
    return (
        df.select(F.col(id_col), F.col(length_col), bucket)
        .withColumn("batch_id", (rn / F.lit(batch_size)).cast("long"))
        .withColumn("pos_in_batch", (rn % F.lit(batch_size)).cast("long"))
    )
