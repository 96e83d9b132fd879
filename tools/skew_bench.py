"""Micro-benchmark: prefix-filtered vs naive token self-join for
ngram_jaccard under hot-token skew (the r3 'weak' flag, reproduced).

Builds a corpus from sf0.1 documents with ONE universal stop token
injected into every document (the k-squared blowup profile), optionally
scaled N-fold by unioning id-shifted copies, and times:

- naive:  explode distinct tokens, self-join on (bucket, tok), count
          shared per pair (the pre-round-4 formulation);
- prefix: operators.dedup.ngram_jaccard_pairs (AllPairs/PPJoin prefix
          filtering, hot tokens ordered last and dropped from prefixes).

Usage: python tools/skew_bench.py [--sparse] [--fuzzy] [--threshold T]
[scale ...] (default: dense real corpus, T=0.1, scales 1 2 4). --sparse
builds the pathological profile instead: documents that share ONLY stop
tokens, so every naive join row is skew waste; with a realistic near-dup
threshold (T >= 0.7) the prefix filter drops the stop tokens from every
prefix while the naive join still pays the full k-squared row count.
Each variant is timed twice (min reported) so codegen compilation does
not pollute the comparison.

--fuzzy benchmarks the entity-resolution blocking instead (the r4
'weak' flag): a hot-letter vocabulary (EVERY name starts with the same
character, 64 length classes) where first-char-only blocking degenerates
to all-pairs. Compares that naive blocking + unbounded levenshtein
against the shipped (first char, exact length)-window join + bounded
levenshtein(l, r, 3); pair sets are asserted identical.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from furchild_spark.engine.session import get_spark  # noqa: E402
from furchild_spark.operators import dedup  # noqa: E402
from furchild_spark.operators.text import tokens  # noqa: E402
from furchild_spark.operators.util import fanout  # noqa: E402


def naive_pairs(df, id_col, text_col, bucket_col, threshold=0.1):
    """The pre-round-4 formulation, now exposed as strategy="count"."""
    return (
        dedup.ngram_jaccard_pairs(
            df, id_col, text_col, bucket_col, threshold, strategy="count"
        ),
        None,
    )


def _sparse_corpus(spark, n_docs: int):
    """Documents sharing ONLY three universal stop tokens: 20 unique
    tokens each (derived from doc_id) + the stop tokens. Every naive join
    row for a stop token is pure skew waste — no pair can reach a
    realistic near-dup threshold."""
    uniq = F.concat_ws(
        " ", *[F.concat(F.lit(f"u{j}x"), F.col("id").cast("string")) for j in range(20)]
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.lit("one_bucket").alias("source"),
        F.concat(uniq, F.lit(" stopa stopb stopc")).alias("text"),
    )


def _name_vocab(spark, n: int):
    """Hot-letter vocabulary: every name shares its first character (the
    degenerate case for first-char blocking) across 64 length classes.
    Adjacent ids differ only in their numeric infix, so real near-matches
    exist (edit distance 1-3 between e.g. ...1008x and ...1009x)."""
    return spark.range(n).select(
        F.concat(
            F.lit("aname"),
            F.col("id").cast("string"),
            F.repeat(F.lit("x"), (F.col("id") % 64).cast("int")),
        ).alias("p_name")
    )


def fuzzy_naive(names):
    """First-char-only blocking + unbounded levenshtein — the pre-round-5
    formulation, quadratic in the hottest letter block."""
    a = names.select(F.col("p_name").alias("name_a"))
    b = names.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (F.substring("name_a", 1, 1) == F.substring("name_b", 1, 1))
            & (F.col("name_a") < F.col("name_b")),
        )
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
        .filter(F.levenshtein("name_a", "name_b") <= 3)
        .select("name_a", "name_b")
    )


def fuzzy_blocked(names):
    """(first char, exact length) equi key, one side exploded across its
    ±2 length window, bounded levenshtein — the shipped formulation
    (queries/curation.py fuzzy_match_names)."""
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.substring("p_name", 1, 1).alias("blk_char"),
        F.length("p_name").alias("blk_len"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.substring("p_name", 1, 1).alias("blk_char"),
        F.explode(
            F.sequence(F.length("p_name") - 2, F.length("p_name") + 2)
        ).alias("blk_len"),
    )
    return (
        a.join(b, ["blk_char", "blk_len"])
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b", 3) >= 0)
        .select("name_a", "name_b")
    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sparse = "--sparse" in args
    fuzzy = "--fuzzy" in args
    args = [a for a in args if a not in ("--sparse", "--fuzzy")]
    threshold = 0.1
    if "--threshold" in args:
        i = args.index("--threshold")
        threshold = float(args[i + 1])
        del args[i : i + 2]
    scales = [int(x) for x in (args or ["1", "2", "4"])]
    spark = get_spark(app_name="skew_bench")

    if fuzzy:
        for scale in scales:
            names = _name_vocab(spark, 5000 * scale).persist()
            n = names.count()

            def _timed_count(fn):
                best = None
                for _ in range(2):
                    t0 = time.perf_counter()
                    cnt = fn().count()
                    dt = time.perf_counter() - t0
                    best = dt if best is None else min(best, dt)
                    # NOT spark.catalog.clearCache(): that would also drop
                    # the persisted `names` vocabulary both variants are
                    # meant to time against, so run 2 (and the other
                    # variant) would silently re-derive the input
                return best, cnt

            dt_blk, n_blk = _timed_count(lambda: fuzzy_blocked(names))
            dt_naive, n_naive = _timed_count(lambda: fuzzy_naive(names))
            names.unpersist()
            assert n_blk == n_naive, (n_blk, n_naive)
            print(
                f"mode=fuzzy scale={scale} names={n} pairs={n_blk} "
                f"blocked={dt_blk:.2f}s naive={dt_naive:.2f}s "
                f"naive/blocked={dt_naive / dt_blk:.2f}x",
                flush=True,
            )
        return

    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet").select(
        "doc_id", "source",
        F.concat(F.col("text"), F.lit(" zzcommonstopword")).alias("text"),
    )
    base.count()

    def timed(fn):
        best, result = None, None
        for _ in range(2):  # min-of-2: first run pays codegen compilation
            t0 = time.perf_counter()
            result = fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
            spark.catalog.clearCache()
        return best, result

    for scale in scales:
        if sparse:
            df = _sparse_corpus(spark, 5000 * scale)
        else:
            df = base
            for i in range(1, scale):
                df = df.unionByName(
                    base.select(
                        (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                        "source",
                        "text",
                    )
                )
        df = df.persist()
        n = df.count()

        dt_prefix, n_pairs = timed(
            lambda: dedup.ngram_jaccard_pairs(
                df, "doc_id", "text", "source", threshold
            ).count()
        )
        dt_naive, n_pairs_naive = timed(
            lambda: naive_pairs(df, "doc_id", "text", "source", threshold)[0].count()
        )
        df.unpersist()

        assert n_pairs == n_pairs_naive, (n_pairs, n_pairs_naive)
        print(
            f"mode={'sparse' if sparse else 'dense'} t={threshold} "
            f"scale={scale} docs={n} pairs={n_pairs} "
            f"prefix={dt_prefix:.2f}s naive={dt_naive:.2f}s "
            f"naive/prefix={dt_naive / dt_prefix:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
