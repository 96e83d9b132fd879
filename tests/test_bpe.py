"""BPE merge training: hand-computable trajectory, including the
greedy-chain case ("aaaa" must merge to [aa, aa], not [aa, a, a]) and
deterministic tie-breaking."""

from furchild_spark.operators import text


def test_bpe_trajectory_with_greedy_chains(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa ab")], "doc_id long, text string"
    )
    out = text.bpe_train(docs, "text", rounds=3).orderBy("round").collect()
    got = [(r["round"], r["p1"], r["p2"], r["pair_count"]) for r in out]
    # round 1: (a,a) appears 3x per "aaaa" (x2 words) + 0 in "ab" = 6
    # greedy application: aaaa -> [aa, aa]  (chain merges alternate)
    # round 2: (aa,aa) = 2;  round 3: only (a,b) = 1 remains
    assert got == [(1, "a", "a", 6), (2, "aa", "aa", 2), (3, "a", "b", 1)]


def test_bpe_tie_breaks_lexicographically(spark):
    # "ab" and "ba" pair counts tie at 2; (a,b) < (b,a) lexically
    docs = spark.createDataFrame(
        [(1, "ab ab ba ba")], "doc_id long, text string"
    )
    out = text.bpe_train(docs, "text", rounds=1).collect()
    assert [(r["p1"], r["p2"], r["pair_count"]) for r in out] == [("a", "b", 2)]
