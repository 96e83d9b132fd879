"""Corpus deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

Scale notes (the design constraint is ~100 TB of documents on a 1000-executor
cluster):

- **Never all-pairs.** Candidate generation is always a *grouping* problem:
  exact → groupBy(fingerprint); MinHash → groupBy(band, band_signature);
  Jaccard → self-join restricted to a bucket key. Each is one shuffle on a
  high-cardinality key; AQE handles skewed buckets.
- **No Python UDFs.** Hashing is md5/xxhash64 builtins; shingling is
  higher-order array functions — the whole pipeline stays in whole-stage
  codegen until the final (tiny) candidate-pair verification join.
- md5-over-string is used (not xxhash64) wherever a DuckDB oracle needs to
  reproduce the value; xxhash64 variants exist for pure-Spark speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text, shingles, tokens
from .util import fanout


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct normalized text with
    the survivor id (min id) and the duplicate count. Single shuffle on the
    128-bit fingerprint; partial aggregation makes the map side do the heavy
    lifting at scale."""
    return (
        df.select(F.col(id_col), F.md5(normalize_text(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Return the deduplicated corpus (survivor row per fingerprint)."""
    groups = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(groups, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def shingle_set(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """(id, shingle) distinct pairs — the set representation used by both
    MinHash signatures and exact-Jaccard verification. Tokens are staged
    through their own projection (see text.with_text_stats perf note)."""
    staged = fanout(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    return (
        staged.select(F.col(id_col), F.explode(shingles("__toks", k)).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, id_col: str, num_perm: int = 16, hash_fn: str = "md5"
) -> DataFrame:
    """MinHash signature rows (id, perm, minhash).

    Permutation i is simulated by hashing ``i ':' shingle``; the signature
    value is the minimum hash over the document's shingle set. ``md5`` keeps
    the value reproducible in ANSI SQL oracles; ``xxhash64`` is the faster
    pure-Spark variant (one 64-bit op vs a 128-bit digest + hex string).
    """
    perms = F.explode(F.sequence(F.lit(0), F.lit(num_perm - 1))).alias("perm")
    rows = sh.select(F.col(id_col), perms, F.col("shingle"))
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.col("perm"), F.col("shingle"))
    else:
        h = F.md5(F.concat(F.col("perm").cast("string"), F.lit(":"), F.col("shingle")))
    return (
        rows.withColumn("h", h)
        .groupBy(id_col, "perm")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_band_signatures(
    sigs: DataFrame, id_col: str, rows_per_band: int = 4
) -> DataFrame:
    """Collapse per-permutation minhashes into one signature per (id, band):
    band = perm div rows_per_band, signature = md5 of the ordered minhashes.
    sort_array(collect_list(struct(perm, minhash))) guarantees a
    deterministic order without a second window shuffle."""
    band = (F.col("perm") / F.lit(rows_per_band)).cast("int").alias("band")
    return (
        sigs.select(F.col(id_col), band, F.col("perm"), F.col("minhash"))
        .groupBy(id_col, "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list(F.struct("perm", "minhash"))),
                        lambda s: s["minhash"].cast("string"),
                    ),
                )
            ).alias("band_sig")
        )
    )


def lsh_candidate_pairs(banded: DataFrame, id_col: str) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band signature.
    Self-join on (band, band_sig) — a key-partitioned equi join, NOT a
    cartesian product; bucket sizes are small by construction."""
    a = banded.select(
        F.col("band"), F.col("band_sig"), F.col(id_col).alias("id_a")
    )
    b = banded.select(
        F.col("band"), F.col("band_sig"), F.col(id_col).alias("id_b")
    )
    return (
        a.join(b, on=["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_verify(
    sh: DataFrame, pairs: DataFrame, id_col: str, threshold: float = 0.5
) -> DataFrame:
    """Exact Jaccard over candidate pairs via shingle-set joins — runs only
    on the (small) candidate set, so the expensive exactness is bounded by
    LSH recall, not corpus size."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    # shingle is part of the second join key → stays an equi join (hash
    # partitioned on (id_b, shingle)), never a filter over a wide product.
    inter = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a"), on="id_a")
        .join(sh.withColumnRenamed(id_col, "id_b"), on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("sz", "sz_a"), on="id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("sz", "sz_b"), on="id_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("id_a", "id_b", "n_inter", "jaccard")
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    rows_per_band: int = 4,
    shingle_k: int = 3,
    threshold: float = 0.5,
    hash_fn: str = "md5",
) -> DataFrame:
    """End-to-end banded MinHash-LSH near-dup detection:
    shingle → minhash → band → bucket-join candidates → exact-Jaccard verify.
    """
    # The shingle set feeds four distinct subtrees (signatures, pair sizes,
    # and both sides of the intersection join); persisting it turns four
    # tokenize+explode+distinct recomputes into one — the same
    # materialize-the-set-representation step a 100 TB run would write to
    # intermediate storage.
    sh = shingle_set(df, id_col, text_col, shingle_k).persist()
    sigs = minhash_signatures(sh, id_col, num_perm, hash_fn)
    banded = lsh_band_signatures(sigs, id_col, rows_per_band)
    pairs = lsh_candidate_pairs(banded, id_col)
    return jaccard_verify(sh, pairs, id_col, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash from md5 hex nibbles, exact-integer end to end.

    Bit j of a token's hash = 1 iff hex digit j of md5(token) is in [8..f].
    The document SimHash sets bit j when the (+1/-1) vote sum over all token
    *occurrences* is positive. Explode + groupBy = one shuffle on id; the
    16-way bit expansion is a generated-column explode, all codegen'd.
    """
    toks = tokens(text_col)
    tok_rows = fanout(df).select(F.col(id_col), F.explode(toks).alias("tok"))
    hashed = tok_rows.withColumn("h", F.md5(F.col("tok")))
    bit_rows = hashed.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(1), F.lit(16))).alias("j"),
        F.col("h"),
    ).withColumn(
        "vote",
        F.when(F.substring(F.col("h"), F.col("j"), 1).isin(*"89abcdef"), 1).otherwise(-1),
    )
    votes = bit_rows.groupBy(id_col, "j").agg(F.sum("vote").alias("v"))
    bit_value = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(j - 1 AS INT))")
    return votes.groupBy(id_col).agg(
        F.sum(F.when(F.col("v") > 0, bit_value).otherwise(F.lit(0)))
        .cast("long")
        .alias("simhash")
    )


# ---------------------------------------------------------------------------
# bucketed n-gram Jaccard
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bucket_col: str,
    threshold: float = 0.1,
) -> DataFrame:
    """Token-set Jaccard for pairs *within a bucket* (e.g. same source /
    same LSH band) — the bucketing keeps the self-join keyed, never O(n²)
    over the corpus.

    Formulated relationally — explode distinct tokens, self-join on
    (bucket, token), count shared tokens per pair — instead of a per-pair
    ``array_intersect``: pairs sharing zero tokens are never materialized
    (any jaccard ≥ threshold > 0 needs ≥1 shared token), and the
    intersection becomes a hash join + partial-aggregated count rather than
    row-at-a-time array scans. Both matter at corpus scale.
    """
    # persisted: feeds sizes + both sides of the intersection self-join
    tok_rows = (
        fanout(df).select(
            F.col(bucket_col).alias("bucket"),
            F.col(id_col),
            tokens(text_col).alias("__toks"),
        )
        .select("bucket", F.col(id_col), F.explode(F.array_distinct("__toks")).alias("tok"))
        .persist()
    )
    sizes = tok_rows.groupBy("bucket", id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = tok_rows.select("bucket", F.col(id_col).alias("id_a"), "tok")
    b = tok_rows.select("bucket", F.col(id_col).alias("id_b"), "tok")
    inter = (
        a.join(b, on=["bucket", "tok"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("bucket", "id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sz_a = sizes.select(
        "bucket", F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")
    )
    sz_b = sizes.select(
        "bucket", F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")
    )
    return (
        inter.join(sz_a, on=["bucket", "id_a"])
        .join(sz_b, on=["bucket", "id_b"])
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= F.lit(threshold))
        .select("bucket", "id_a", "id_b", "jaccard")
    )
