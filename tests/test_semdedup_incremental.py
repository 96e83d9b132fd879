"""Semantics of the incremental SemDeDup operator
(operators/similarity.semdedup_incremental) on crafted vectors — the
edges the sf0.01 oracle data may never exercise:

- a batch vector with a LOWER id than its corpus duplicate still drops
  (the corpus is already kept — no id ordering across the boundary);
- the intra-batch rule stays lower-id-wins;
- a batch disjoint from the corpus keeps everything non-self-similar;
- the corpus is only read, never re-verdicted (output rows == batch rows).
"""

from __future__ import annotations

import pytest

from furchild_spark.operators import similarity


def _emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


@pytest.fixture(scope="module")
def corpus(spark):
    # two well-separated directions; ids 0/1 double as the centroid set
    return _emb(spark, [
        (0, [1, 0, 0, 0]),
        (1, [0, 1, 0, 0]),
        (10, [0.9, 0.1, 0, 0]),   # near direction-0
    ])


def _verdicts(spark, corpus, batch_rows, threshold=0.9):
    out = similarity.semdedup_incremental(
        _emb(spark, batch_rows), corpus,
        "vec_id", "embedding", threshold=threshold, num_centroids=2,
    )
    return {r["vec_id"]: r["is_dup"] for r in out.collect()}


def test_corpus_wins_even_over_lower_batch_ids(spark, corpus):
    # batch id 2 < corpus id 10, yet the batch row duplicates the
    # corpus row -> it must DROP (within-corpus dedup would keep the
    # lower id; across the boundary the corpus always wins)
    v = _verdicts(spark, corpus, [(2, [0.9, 0.1, 0, 0])])
    assert v == {2: True}


def test_intra_batch_lower_id_survives(spark, corpus):
    # two batch rows duplicate each other along a direction far from
    # every corpus vector: lower id kept, higher id dropped
    v = _verdicts(spark, corpus, [
        (100, [0, 0, 1, 0]),
        (200, [0, 0, 0.99, 0.01]),
    ])
    assert v == {100: False, 200: True}


def test_disjoint_batch_all_kept(spark, corpus):
    v = _verdicts(spark, corpus, [
        (100, [0, 0, 1, 0]),
        (200, [0, 0, 0, 1]),
    ])
    assert v == {100: False, 200: False}


def test_output_is_batch_only_with_assignments(spark, corpus):
    out = similarity.semdedup_incremental(
        _emb(spark, [(2, [0.9, 0.1, 0, 0]), (3, [0, 0.8, 0.2, 0])]),
        corpus, "vec_id", "embedding", threshold=0.9, num_centroids=2,
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    assert set(rows) == {2, 3}  # never re-verdicts corpus ids
    # assignment goes to the nearest frozen corpus centroid (0 resp. 1)
    assert rows[2]["cent_id"] == 0
    assert rows[3]["cent_id"] == 1
