"""bpe_apply: the serving half round-trips the trainer's merges."""

from pyspark.sql import functions as F

from furchild_spark.operators import text


def test_bpe_apply_round_trips_training(spark):
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa ab"), (2, "ab aaaa")], "doc_id long, text string"
    )
    merges = [
        (r["p1"], r["p2"])
        for r in text.bpe_train(docs, "text", rounds=3).orderBy("round").collect()
    ]
    assert merges == [("a", "a"), ("aa", "aa"), ("a", "b")]
    out = {r["doc_id"]: r for r in
           text.bpe_apply(docs, merges, "doc_id", "text").collect()}
    # "aaaa" -> [aa,aa] -> [aaaa]; "ab" -> [ab]
    assert out[1]["bpe_tokens"] == ["aaaa", "aaaa", "ab"]
    assert out[2]["bpe_tokens"] == ["ab", "aaaa"]
    assert out[1]["n_tokens"] == 3


def test_bpe_apply_is_map_only(spark):
    import contextlib, io

    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    df = text.bpe_apply(docs, [("l", "l"), ("h", "e")], "doc_id", "text")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "Exchange" not in p and "Join" not in p


def test_vocab_factored_apply_is_bit_identical(spark):
    """bpe_apply_by_vocab shares the word->subwords fold with bpe_apply,
    so the two paths must agree token-for-token on every document —
    including empty/NULL texts (left-join passthrough with empty
    arrays) and repeated words (one fold, many occurrences)."""
    from furchild_spark.operators import text

    rows = [
        (1, "the thesis rests on these tests"),
        (2, "tests tests tests"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    rules = [("e", "s"), ("t", "h"), ("th", "e")]
    a = {r.doc_id: r for r in text.bpe_apply(df, rules).collect()}
    b = {r.doc_id: r for r in text.bpe_apply_by_vocab(df, rules).collect()}
    assert set(a) == set(b) == {1, 2, 3, 4}
    for k in a:
        assert a[k].bpe_tokens == b[k].bpe_tokens
        assert a[k].n_tokens == b[k].n_tokens
    assert b[4].bpe_tokens == [] and b[4].n_tokens == 0


# ---------------------------------------------------------------------------
# WordPiece family (greedy longest-match over a frequency vocab)
# ---------------------------------------------------------------------------

def test_wordpiece_greedy_longest_match_and_roundtrip(spark):
    """Greedy takes the LONGEST piece at each position (even when a
    shorter match would yield fewer total pieces — the defining WordPiece
    behavior), unknown regions fall back to single chars, and the pieces
    always concatenate back to the word."""
    from pyspark.sql import functions as F

    from furchild_spark.operators.text import wordpiece_apply

    vocab = spark.createDataFrame(
        [("abcd",), ("ab",), ("cd",), ("abc",), ("a",), ("b",), ("c",),
         ("d",), ("x",)],
        ["piece"],
    )
    words = spark.createDataFrame(
        [("abcd",), ("abcx",), ("xxab",), ("dcba",)], ["word"]
    )
    out = {
        r.word: list(r.pieces)
        for r in wordpiece_apply(words, vocab, "word").collect()
    }
    assert out["abcd"] == ["abcd"]          # length-4 wins outright
    # greedy: 'abc' first → leftover 'x' (3+1), never 'ab'+'cx'
    assert out["abcx"] == ["abc", "x"]
    assert out["xxab"] == ["x", "x", "ab"]
    assert out["dcba"] == ["d", "c", "b", "a"]  # char fallback everywhere
    for w, ps in out.items():
        assert "".join(ps) == w


def test_wordpiece_vocab_threshold_and_char_floor(spark):
    """Every observed single char is in the vocab unconditionally;
    longer pieces need min_frac of occurrence mass (weighted by word
    occurrences, overlaps counted)."""
    from furchild_spark.operators.text import wordpiece_vocab

    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab zq")], ["doc_id", "text"]
    )
    v = {r.piece for r in wordpiece_vocab(
        docs, "text", min_frac=0.5
    ).collect()}
    # chars always present
    assert {"a", "b", "z", "q"} <= v
    # total word occurrences = 4, so the 0.5 threshold is mass >= 2:
    # 'aa' holds 2 overlapping slots x3 'aaab' occurrences = 6 -> in;
    # 'zq' holds 1 -> out
    assert "aa" in v
    assert "zq" not in v


def test_unigram_viterbi_beats_greedy_and_breaks_ties_long(spark):
    """The defining Unigram-LM behavior: a SHORTER first piece wins when
    whole-word likelihood says so (greedy WordPiece would take 'abc' and
    strand 'd'); exact-likelihood ties break to the longer last piece."""
    from pyspark.sql import functions as F

    from furchild_spark.operators.text import unigram_apply

    scores = spark.createDataFrame(
        [("ab", "-1.0"), ("abc", "-10.0"), ("cd", "-1.0"),
         ("c", "-3.0"), ("d", "-3.0"), ("a", "-5.0"), ("b", "-5.0"),
         ("x", "-2.0"), ("xx", "-4.0")],
        ["piece", "s"],
    ).select("piece", F.col("s").cast("decimal(18,6)").alias("score"))
    words = spark.createDataFrame([("abcd",), ("xx",)], ["word"])
    out = {r.word: r for r in unigram_apply(words, scores, "word").collect()}
    assert list(out["abcd"].pieces) == ["ab", "cd"]
    assert out["abcd"].logp == -2.0
    # 'x'+'x' = -4.0 exactly ties 'xx' = -4.0 -> longer last piece wins
    assert list(out["xx"].pieces) == ["xx"]
    assert out["xx"].logp == -4.0


def test_unigram_apply_max_piece_len_over_four(spark):
    """The rolling DP window is generated from max_piece_len: a length-5
    vocab piece must be considered (a hardcoded 4-slot window would
    silently index out of bounds -> NULL -> never pick it)."""
    from pyspark.sql import functions as F

    from furchild_spark.operators.text import unigram_apply

    scores = spark.createDataFrame(
        [("abcde", "-1.0"), ("a", "-3.0"), ("b", "-3.0"), ("c", "-3.0"),
         ("d", "-3.0"), ("e", "-3.0")],
        ["piece", "s"],
    ).select("piece", F.col("s").cast("decimal(18,6)").alias("score"))
    words = spark.createDataFrame([("abcde",)], ["word"])
    out = unigram_apply(words, scores, "word", max_piece_len=5).collect()[0]
    assert list(out.pieces) == ["abcde"]
    assert out.logp == -1.0
    # and with the default window the same word falls back to chars
    out4 = unigram_apply(words, scores, "word", max_piece_len=4).collect()[0]
    assert list(out4.pieces) == ["a", "b", "c", "d", "e"]
    assert out4.logp == -15.0


def test_unigram_apply_empty_word_and_bad_window(spark):
    """A zero-length word segments to an EMPTY piece array (not NULL):
    sequence(1, 0) is descending in Spark, so the fold is sliced to the
    word length. max_piece_len < 1 raises up front."""
    import pytest
    from pyspark.sql import functions as F

    from furchild_spark.operators.text import unigram_apply

    scores = spark.createDataFrame(
        [("a", "-1.0")], ["piece", "s"]
    ).select("piece", F.col("s").cast("decimal(18,6)").alias("score"))
    words = spark.createDataFrame([("",), ("a",)], ["word"])
    out = {r.word: r for r in unigram_apply(words, scores, "word").collect()}
    assert list(out[""].pieces) == []
    assert out[""].n_pieces == 0
    assert out[""].logp == 0.0
    assert list(out["a"].pieces) == ["a"]
    with pytest.raises(ValueError, match="max_piece_len"):
        unigram_apply(words, scores, "word", max_piece_len=0)
# to append into tests/test_bpe_apply.py after review


def test_unigram_em_round_invariants(spark):
    """EM-round invariants on a seeded corpus: (1) every single char of
    the seed vocab survives with a finite score; (2) the surviving
    multi-char set shrinks monotonically as keep_frac drops; (3) every
    piece used by the post-EM segmentation is in the pruned vocab."""
    from pyspark.sql import functions as F

    from furchild_spark.operators.text import (
        tokens, unigram_apply, unigram_em_round, unigram_scores,
    )

    docs = spark.createDataFrame(
        [(1, "alpha beta alpha gamma alpha beta delta " * 3)],
        ["doc_id", "text"],
    )
    seed = {r["piece"] for r in unigram_scores(docs, "text").collect()}
    singles = {p for p in seed if len(p) == 1}

    kept = {}
    for frac in (0.8, 0.4, 0.1):
        s1 = unigram_em_round(docs, "text", keep_frac=frac)
        rows = s1.collect()
        pieces = {r["piece"] for r in rows}
        assert singles <= pieces  # chars always survive
        assert all(r["score"] is not None for r in rows)
        kept[frac] = {p for p in pieces if len(p) > 1}
    assert kept[0.1] <= kept[0.4] <= kept[0.8]

    s1 = unigram_em_round(docs, "text", keep_frac=0.8)
    vocab1 = {r["piece"] for r in s1.collect()}
    wc = (
        docs.select(F.explode(tokens("text")).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("wc"))
    )
    seg = unigram_apply(wc, s1, "word")
    used = {p for r in seg.collect() for p in r["pieces"]}
    assert used <= vocab1
