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
