"""Scale-cliff probe: build a deterministic sf1 dataset (10× sf0.1) and
sweep every catalog entry once, recording per-entry wall seconds and the
ratio to the committed sf0.1 bench minimum. The sf0.1 bench can't see a
super-linear candidate-generation or explode fan-out; a 10× step can.

The upstream testdata tree is read-only and ships no sf1, so the data is
synthesized here: ten key-shifted copies of every sf0.1 fact table, all
foreign keys shifted by the same per-copy offset so join integrity and
key uniqueness hold exactly (region/nation are fixed dimensions and copy
as-is). Duplicated text/embedding payloads are intentional — they stress
the dedup/ANN entries with 10-way duplicate clusters, the worst
realistic profile for candidate generation.

Usage:
    python tools/sf1_run.py [--gen-only] [--skip-gen] [--distinct] [names ...]

Writes .sf1/ (gitignored) next to the repo tables and SF1_DETAIL.json;
the committed SF1.md is hand-finished from the printed table.

``--distinct`` flips the payload profile: instead of duplicating
text/embeddings verbatim, every copy's document tokens get a per-copy
suffix (zero cross-copy shared shingles/windows) and every copy's
embeddings rotate by the copy index (rotation preserves norms but
decorrelates directions, so cross-copy cosines drop to noise). The
dedup/ANN families' TRUE output then grows ~linearly instead of
duplicate-quadratically — the probe that separates "the plan is
super-linear" from "the answer is super-linear". Defaults to sweeping
just those families; results land in SF1_DISTINCT_DETAIL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from furchild_spark.engine.session import get_spark  # noqa: E402
from furchild_spark.queries import QUERIES  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF1_DIR = os.path.join(ROOT, ".sf1")
SF1_DISTINCT_DIR = os.path.join(ROOT, ".sf1d")
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10
OFF = 100_000_000  # clears every sf0.1 key range

# the families whose cost is dominated by duplicate structure — the
# --distinct sweep's default scope
DEDUP_ANN_ENTRIES = [
    "exact_dedup", "exact_dedup_incremental",
    "minhash_neardup", "minhash_neardup_incremental",
    "ngram_jaccard", "ngram_jaccard_neardup", "simhash",
    "contamination_check", "semdedup", "semdedup_ivf",
    "semdedup_incremental",
    "embedding_cosine_neardup",
    "exact_substring_spans", "exact_substring_dedup",
    "boilerplate_chunk_removal", "curation_pipeline",
    "leakage_safe_split", "streaming_dedup_e2e", "streaming_neardup_e2e",
    "ann_cosine_topk", "ann_lsh_topk", "ann_lsh_topk_probe0",
    "ann_ivf_topk", "ann_pq_topk", "ann_pq_rerank_topk",
    "ann_ivfpq_topk", "ann_sq8_topk",
]

# per-table key columns that must shift per copy to stay unique / joined
SHIFT_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def _perturb(c, table: str, i: int):
    """--distinct payload decorrelation for copy ``i`` (copy 0 is the
    untouched original). Deterministic, no RNG."""
    if i == 0:
        return c
    if table == "documents":
        # a per-copy suffix on EVERY token: token counts and lengths stay
        # realistic, but no shingle/window/fingerprint crosses copies
        return c.withColumn(
            "text",
            F.when(
                F.col("text").isNotNull(),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda x: F.concat(x, F.lit(f"q{i}")),
                    ),
                    " ",
                ),
            ),
        )
    if table == "embeddings":
        # rotate the 64-dim vector by i positions: norm-preserving, but
        # rotated high-entropy vectors are near-orthogonal to the
        # originals, so cross-copy cosines fall to noise level
        return c.withColumn(
            "embedding",
            F.concat(
                F.slice("embedding", i + 1, 64 - i),
                F.slice("embedding", 1, i),
            ),
        )
    return c


def generate(spark, out_dir: str = SF1_DIR, distinct: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t, keys in SHIFT_COLS.items():
        src = spark.read.parquet(f"{SRC_DIR}/{t}.parquet")
        if not keys:  # fixed dimension
            out = src
        else:
            parts = []
            for i in range(COPIES):
                c = src
                for k in keys:
                    c = c.withColumn(k, F.col(k) + F.lit(i * OFF))
                if distinct:
                    c = _perturb(c, t, i)
                parts.append(c)
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
        out.write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")
        print(f"wrote {t}", flush=True)


def main() -> None:
    args = sys.argv[1:]
    gen_only = "--gen-only" in args
    skip_gen = "--skip-gen" in args
    distinct = "--distinct" in args
    default_names = (
        [n for n in DEDUP_ANN_ENTRIES if n in QUERIES]
        if distinct else sorted(QUERIES)
    )
    names = [a for a in args if not a.startswith("--")] or default_names
    sweep_dir = SF1_DISTINCT_DIR if distinct else SF1_DIR
    detail_path = os.path.join(
        ROOT, "SF1_DISTINCT_DETAIL.json" if distinct else "SF1_DETAIL.json"
    )

    spark = get_spark(app_name="sf1_run")
    if not skip_gen:
        generate(spark, out_dir=sweep_dir, distinct=distinct)
    if gen_only:
        return

    # sf0.1 reference minima for the ratio column
    ref: dict[str, float] = {}
    try:
        with open(os.path.join(ROOT, "BENCH_DETAIL.json")) as fh:
            ref = json.load(fh).get("queries", {})
    except (OSError, ValueError):
        pass

    def run_once(name: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name].fn(spark, sweep_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        it = (
            spark.sparkContext._jsc.sc()
            .getPersistentRDDs().values().iterator()
        )
        while it.hasNext():
            it.next().unpersist(False)
        return dt

    results: dict[str, dict] = {}
    t_all = time.monotonic()
    for i, name in enumerate(names):
        try:
            dt = run_once(name)
            # one back-to-back retime where compile noise could mask or
            # fake a cliff (cheap entries are dominated by the ~1 s
            # codegen anyway)
            if dt > 2.0:
                dt = min(dt, run_once(name))
            r01 = ref.get(name)
            ratio = round(dt / r01, 1) if r01 and r01 > 0.05 else None
            results[name] = {"sf1_sec": round(dt, 3), "sf01_sec": r01,
                             "ratio": ratio}
            flag = " <-- SUPERLINEAR?" if ratio and ratio > 20 else ""
            print(
                f"{i+1:3d}/{len(names)} {name:42s} {dt:7.2f}s "
                f"(sf0.1 {r01 if r01 is not None else '-'} -> "
                f"x{ratio if ratio is not None else '-'}){flag}",
                flush=True,
            )
        except Exception as e:  # a failure IS the finding — keep sweeping
            results[name] = {"error": str(e)[:300]}
            print(f"{i+1:3d}/{len(names)} {name:42s} ERROR {str(e)[:120]}",
                  flush=True)
    total = round(time.monotonic() - t_all, 1)
    # a subset re-run MERGES into the existing detail file instead of
    # clobbering the full-sweep record (total_sec then describes only
    # the latest invocation; per-entry rows are the source of truth)
    merged = results
    if set(names) != set(default_names):
        # a SET comparison, not a count: an explicit name list that
        # happens to match the default length must still merge, never
        # clobber the full-sweep record
        try:
            with open(detail_path) as fh:
                prior = json.load(fh).get("entries", {})
            # stamp carried-over rows so stale operator versions are
            # distinguishable from this invocation's measurements
            merged = {
                **{
                    n: {**r, "merged_from_prior": True}
                    for n, r in prior.items()
                },
                **results,
            }
        except (OSError, ValueError):
            pass
    with open(detail_path, "w") as fh:
        json.dump({"total_sec": total, "n": len(merged), "copies": COPIES,
                   "distinct": distinct,
                   "entries": merged}, fh, indent=1, sort_keys=True)
    errs = [n for n, r in results.items() if "error" in r]
    hot = sorted(
        (r["ratio"], n) for n, r in results.items() if r.get("ratio")
    )[-15:]
    print(f"\nTOTAL {total}s for {len(names)} entries; errors: {errs}")
    print("highest sf1/sf0.1 ratios:")
    for ratio, n in reversed(hot):
        print(f"  x{ratio:6.1f} {n}")


if __name__ == "__main__":
    main()
