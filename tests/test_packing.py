"""pack_sequences (operators/batching.py): GPT-style concat-and-chop
packing invariants on crafted inputs — the catalog oracle
(`sequence_packing`) checks full-corpus parity; these pin the packing
algebra itself."""

from __future__ import annotations

from pyspark.sql import functions as F

from furchild_spark.operators.batching import pack_sequences


def _pack(spark, rows, budget):
    df = spark.createDataFrame(rows, "id long, n long")
    return pack_sequences(df, "id", "n", budget=budget).collect()


def test_every_pack_full_except_tail(spark):
    rows = [(i, 37 + (i * 13) % 91) for i in range(40)]
    out = _pack(spark, rows, budget=128)
    total = sum(n for _, n in rows)
    by_pack = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], 0)
        by_pack[r["pack_id"]] += r["seg_len"]
    n_packs = max(by_pack) + 1
    assert set(by_pack) == set(range(n_packs)), "pack ids must be dense"
    for p in range(n_packs - 1):
        assert by_pack[p] == 128, f"pack {p} not full: {by_pack[p]}"
    assert by_pack[n_packs - 1] == total - 128 * (n_packs - 1)


def test_segments_reassemble_docs_without_gaps(spark):
    rows = [(1, 100), (2, 300), (3, 5), (4, 250)]  # 300 > budget: spans
    out = _pack(spark, rows, budget=128)
    segs = {}
    for r in out:
        segs.setdefault(r["id"], []).append(r)
    for i, n in rows:
        parts = sorted(segs[i], key=lambda r: r["doc_offset"])
        # contiguous coverage [0, n) with no overlap
        assert parts[0]["doc_offset"] == 0
        pos = 0
        for p in parts:
            assert p["doc_offset"] == pos
            assert 0 <= p["pack_pos"] < 128
            assert p["pack_pos"] + p["seg_len"] <= 128
            pos += p["seg_len"]
        assert pos == n
        # consecutive segments land in consecutive packs, each continuing
        # at pack_pos 0 (the doc flows across the boundary)
        for a, b in zip(parts, parts[1:]):
            assert b["pack_id"] == a["pack_id"] + 1 and b["pack_pos"] == 0


def test_pack_positions_tile_each_pack_exactly(spark):
    rows = [(i, 50) for i in range(20)]
    out = _pack(spark, rows, budget=160)
    by_pack = {}
    for r in out:
        by_pack.setdefault(r["pack_id"], []).append(r)
    for p, rs in by_pack.items():
        rs.sort(key=lambda r: r["pack_pos"])
        pos = 0
        for r in rs:
            assert r["pack_pos"] == pos, "segments must tile with no holes"
            pos += r["seg_len"]


def test_zero_length_docs_dropped_and_determinism(spark):
    rows = [(1, 10), (2, 0), (3, 20)]
    out = _pack(spark, rows, budget=16)
    assert {r["id"] for r in out} == {1, 3}
    again = _pack(spark, rows, budget=16)
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
