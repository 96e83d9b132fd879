"""Unit tests for the curation operators (operators/curate.py).

The catalog oracle (tools/check_correctness.py, `sessionize_events`,
`hash_split`, `vocab_idf`, `pii_redact`, `dup_clusters`) checks full-corpus
parity vs DuckDB; these tests pin the semantics on small crafted inputs the
synthetic corpus cannot exercise — real PII strings, exact gap boundaries,
multi-hop duplicate chains.
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from furchild_spark.operators import curate


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


def test_sessionize_gap_boundary(spark):
    # gaps: exactly 60s (same session), 61s (new session)
    rows = [
        Row(u=1, eid=1, ts=_ts(0, 0)),
        Row(u=1, eid=2, ts=_ts(1, 0)),    # +60s  -> same session
        Row(u=1, eid=3, ts=_ts(2, 1)),    # +61s  -> new session
        Row(u=2, eid=4, ts=_ts(0, 0)),    # other user -> own session 1
    ]
    df = spark.createDataFrame(rows)
    out = curate.sessionize(df, "u", "ts", gap_seconds=60, tiebreak_col="eid")
    got = {r["eid"]: r["session_seq"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}


def test_session_rollup_values(spark):
    rows = [
        Row(u=1, eid=1, ts=_ts(0), v=1.5),
        Row(u=1, eid=2, ts=_ts(10), v=2.25),
        Row(u=1, eid=3, ts=_ts(59), v=10.0),  # 49 min gap -> new session
    ]
    df = spark.createDataFrame(rows)
    out = curate.session_rollup(df, "u", "ts", "v", gap_seconds=1800, tiebreak_col="eid")
    by_seq = {r["session_seq"]: r for r in out.collect()}
    assert by_seq[1]["n_events"] == 2
    assert by_seq[1]["value_sum"] == pytest.approx(3.75)
    assert by_seq[1]["duration_sec"] == 600
    assert by_seq[2]["n_events"] == 1
    assert by_seq[2]["duration_sec"] == 0


def test_hash_split_deterministic_and_stable(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = curate.hash_split(df, "doc_id", 0.8, 0.1)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    # md5 is uniform: 80/10/10 ±5pp at n=1000
    assert 750 <= counts["train"] <= 850
    # growth-stability: the first 500 ids keep their assignment verbatim
    sub = curate.hash_split(
        spark.range(0, 500).withColumnRenamed("id", "doc_id"), "doc_id", 0.8, 0.1
    )
    full = {r["doc_id"]: r["split"] for r in out.filter("doc_id < 500").collect()}
    assert {r["doc_id"]: r["split"] for r in sub.collect()} == full


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            Row(id=1, text="mail a@b.com or visit https://x.io/p?q=1 now"),
            Row(id=2, text="call +971 50 123 4567 twice: 04-123-4567."),
            Row(id=3, text="clean text with no pii at all"),
        ]
    )
    out = {r["id"]: r for r in curate.redact_pii(df, "id", "text").collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_urls"] == 1
    assert out[1]["redacted_text"] == "mail <EMAIL> or visit <URL> now"
    assert out[2]["n_phones"] == 2
    assert "<PHONE>" in out[2]["redacted_text"]
    assert "4567" not in out[2]["redacted_text"]
    assert out[3]["redacted_text"] == "clean text with no pii at all"
    assert out[3]["n_urls"] == out[3]["n_emails"] == out[3]["n_phones"] == 0


def test_connected_components_multihop(spark):
    # chain 1-2-3-4 (diameter 3, needs >1 propagation round) + pair 10-11
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3), Row(id_a=3, id_b=4),
         Row(id_a=10, id_b=11)]
    )
    got = {r["node"]: r["cluster_id"]
           for r in curate.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_iteration_cap(spark):
    # a long path exercises the max_iter bound: with enough rounds the
    # far end still converges to the global min
    n = 12
    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(n)])
    got = {r["node"]: r["cluster_id"]
           for r in curate.connected_components(pairs, max_iter=20).collect()}
    assert set(got.values()) == {0}


def test_salted_join_matches_plain_join(spark):
    from furchild_spark.operators import skew

    left = spark.createDataFrame(
        [Row(k=1, line=i) for i in range(50)] + [Row(k=2, line=99)]
    )
    right = spark.createDataFrame([Row(k=1, name="hot"), Row(k=3, name="miss")])
    got = skew.salted_join(left, right, on="k", salt_from="line", salt_factor=4)
    plain = left.join(right, on="k")
    assert got.count() == plain.count() == 50
    assert sorted(got.columns) == sorted(plain.columns)
    # inner-join semantics: unmatched keys on both sides drop
    assert got.filter("k != 1").count() == 0


def test_salted_join_left_outer(spark):
    from furchild_spark.operators import skew

    left = spark.createDataFrame([Row(k=1, line=1), Row(k=2, line=2)])
    right = spark.createDataFrame([Row(k=1, name="x")])
    got = {r["k"]: r["name"]
           for r in skew.salted_join(left, right, "k", "line", how="left").collect()}
    assert got == {1: "x", 2: None}


def test_salted_distinct_count_exact(spark):
    from furchild_spark.operators import skew

    # hot group with duplicate values across salt buckets must not
    # double-count: 100 events over 10 distinct users
    rows = [Row(g="hot", u=f"u{i % 10}") for i in range(100)] + [
        Row(g="cold", u="solo")
    ]
    df = spark.createDataFrame(rows)
    got = {r["g"]: r["n_distinct"]
           for r in skew.salted_distinct_count(df, "g", "u", 16).collect()}
    assert got == {"hot": 10, "cold": 1}


def test_stratified_sample_membership_stable(spark):
    df = spark.range(0, 400).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias("src"),
    )
    full = curate.stratified_hash_sample(df, "doc_id", "src", {"a": 1.0, "b": 0.25})
    ids_full = {r["doc_id"] for r in full.collect()}
    # stratum a: fraction 1.0 keeps everything
    assert all(i in ids_full for i in range(0, 400, 2))
    # growing stratum a must not change stratum b's membership
    bigger = df.unionByName(
        spark.range(1000, 1400).select(
            F.col("id").alias("doc_id"), F.lit("a").alias("src")
        )
    )
    again = curate.stratified_hash_sample(bigger, "doc_id", "src", {"a": 1.0, "b": 0.25})
    assert {r["doc_id"] for r in again.filter("src = 'b'").collect()} == {
        i for i in ids_full if i % 2 == 1
    }


def test_chunk_documents_windows_and_overlap(spark):
    # 10 tokens, max 4, overlap 2 -> step 2: starts 0,2,4,6,8
    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([Row(doc_id=1, text=text), Row(doc_id=2, text="")])
    out = curate.chunk_documents(df, "doc_id", "text", max_tokens=4, overlap=2)
    rows = sorted(
        ((r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in out.collect())
    )
    assert rows[0] == (0, "t0 t1 t2 t3", 4)
    assert rows[1] == (1, "t2 t3 t4 t5", 4)  # 2-token overlap with chunk 0
    # the old trailing start 8 would yield "t8 t9" — fully contained in
    # chunk 3 ("t6 t7 t8 t9"); redundant trailing chunks are now dropped
    assert rows[-1] == (3, "t6 t7 t8 t9", 4)
    covered = {t for _, txt, _ in rows for t in txt.split(" ")}
    assert covered == {f"t{i}" for i in range(10)}  # full coverage kept
    assert len(rows) == 4
    # empty document -> no chunks
    assert out.filter("doc_id = 2").count() == 0
    # every token covered
    covered = set()
    for _, txt, _ in rows:
        covered.update(txt.split())
    assert covered == {f"t{i}" for i in range(10)}


def test_bucketed_range_join_boundaries(spark):
    from furchild_spark.operators.rangejoin import bucketed_range_join

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([Row(lid=1, lts=base)])
    right = spark.createDataFrame(
        [
            Row(rid=10, rts=base - dt.timedelta(seconds=31)),   # out (below)
            Row(rid=11, rts=base - dt.timedelta(seconds=30)),   # in (boundary)
            Row(rid=12, rts=base),                              # in
            Row(rid=13, rts=base + dt.timedelta(seconds=30)),   # in (boundary)
            Row(rid=14, rts=base + dt.timedelta(seconds=31)),   # out (above)
            # far away but same 60s bucket arithmetic family
            Row(rid=15, rts=base + dt.timedelta(hours=1)),
        ]
    )
    got = {
        r["rid"]
        for r in bucketed_range_join(left, right, "lts", "rts", -30, 30).collect()
    }
    assert got == {11, 12, 13}


def test_bucketed_range_join_matches_across_bucket_edge(spark):
    """A pair whose timestamps straddle a bucket boundary must still match
    (the 2-bucket replication exists exactly for this)."""
    from furchild_spark.operators.rangejoin import bucketed_range_join

    t_left = dt.datetime(2024, 1, 1, 12, 0, 59)
    t_right = dt.datetime(2024, 1, 1, 12, 1, 1)  # +2s, next 60s bucket
    left = spark.createDataFrame([Row(lid=1, lts=t_left)])
    right = spark.createDataFrame([Row(rid=2, rts=t_right)])
    assert bucketed_range_join(left, right, "lts", "rts", -30, 30).count() == 1


def test_bucketed_range_join_plan_is_keyed(spark):
    """The interval predicate must compile to an equi join on the bucket,
    never a BroadcastNestedLoopJoin/cartesian."""
    import contextlib
    import io

    from furchild_spark.operators.rangejoin import bucketed_range_join

    base = dt.datetime(2024, 1, 1)
    left = spark.createDataFrame([Row(lid=i, lts=base) for i in range(3)])
    right = spark.createDataFrame([Row(rid=i, rts=base) for i in range(3)])
    df = bucketed_range_join(left, right, "lts", "rts", -30, 30)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    assert "__bucket" in p


def test_tfidf_top_terms_ranking(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="rare rare common"),
            Row(doc_id=2, text="common"),
            Row(doc_id=3, text="common other"),
        ]
    )
    out = curate.tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    top1 = {r["doc_id"]: r["token"] for r in out if r["rank"] == 1}
    # 'rare' (df=1, tf=2) dominates 'common' (df=3) for doc 1
    assert top1[1] == "rare"
    # doc 2's only token is 'common' with idf ln(3/3)=0 → score 0 but ranked
    assert top1[2] == "common"


def test_vocab_idf_counts(spark):
    df = spark.createDataFrame(
        [Row(doc_id=1, text="a b a"), Row(doc_id=2, text="a c"),
         Row(doc_id=3, text="c c d")]
    )
    got = {r["token"]: (r["df"], r["idf"])
           for r in curate.vocab_df_idf(df, "text").collect()}
    assert got["a"][0] == 2 and got["b"][0] == 1 and got["c"][0] == 2
    assert got["d"][1] == pytest.approx(1.098612, abs=1e-6)  # ln(3/1)


def test_connected_components_raises_when_not_converged(spark):
    """A diameter-8 chain cannot converge in 2 rounds; silently returning
    partial labels would be wrong — the operator must raise (ADVICE r2)."""
    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        curate.connected_components(pairs, max_iter=2)


def test_salted_join_rejects_right_and_full(spark):
    """Right/full outer would emit unmatched right rows once per salt
    replica — the operator must refuse those join types (ADVICE r2)."""
    from furchild_spark.operators import skew

    left = spark.createDataFrame([Row(k="a", x=1)])
    right = spark.createDataFrame([Row(k="a", y=2), Row(k="b", y=3)])
    for how in ("right", "full", "outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            skew.salted_join(left, right, on="k", salt_from="x", how=how)


def test_connected_components_checkpoint_interval(spark):
    """Same labels regardless of checkpoint cadence: a 6-node chain needs
    several propagation rounds, and interval=3 must converge to the
    identical clustering as the per-round default (monotone propagation —
    skipping checks can only delay detection, never change the fixpoint)."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], "id_a long, id_b long"
    )
    expect = {(i, 0) for i in range(6)}
    for k in (1, 3):
        got = {
            (r["node"], r["cluster_id"])
            for r in curate.connected_components(
                pairs, checkpoint_interval=k
            ).collect()
        }
        assert got == expect, f"interval={k}"


def test_connected_components_interval_still_raises_at_cap(spark):
    """The final round checkpoints+checks even off-cadence, so a
    non-converged long chain still raises instead of returning wrong
    labels."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        curate.connected_components(pairs, max_iter=3, checkpoint_interval=2)


def test_suppress_duplicate_chunks(spark):
    from furchild_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            # doc 0 and 1 share their first 8 tokens exactly (boilerplate)
            (0, "a b c d e f g h unique zero tail words here now ok fine"),
            (1, "a b c d e f g h other one ending text goes right here x"),
            # doc 2 is entirely the shared chunk → survives with empty text
            (2, "a b c d e f g h"),
            # doc 3 shares nothing
            (3, "totally different content with no overlap at all"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.suppress_duplicate_chunks(docs).collect()}
    assert len(out) == 4
    assert out[2]["cleaned_text"] == ""          # all-boilerplate doc kept
    assert out[2]["n_removed"] == 1
    assert out[0]["cleaned_text"] == "unique zero tail words here now ok fine"
    assert out[1]["n_removed"] == 1
    assert out[3]["n_removed"] == 0
    assert out[3]["cleaned_text"] == docs.collect()[3]["text"]


def test_suppress_duplicate_chunks_null_and_empty_text(spark):
    """Review regression: NULL/empty text must yield exactly one ''
    chunk (no phantom [0,-1] sequence) and the doc must survive."""
    from furchild_spark.operators import text as T

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   "), (3, "real content words")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.suppress_duplicate_chunks(docs).collect()}
    assert set(out) == {0, 1, 2, 3}
    for d in (0, 1, 2):
        assert out[d]["n_chunks"] == 1
        # the '' chunk is shared by three docs → boilerplate → removed
        assert out[d]["n_removed"] == 1 and out[d]["cleaned_text"] == ""
    assert out[3]["n_removed"] == 0


def test_chunk_documents_no_redundant_trailing_chunk(spark):
    """Review regression: a 25-token doc at max=32/overlap=8 (step=24)
    must emit ONE chunk — the old code emitted a second chunk fully
    contained in the first."""
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(25))),
         (2, " ".join(f"t{i}" for i in range(40))),
         (3, " ".join(f"t{i}" for i in range(24)))],
        "doc_id long, text string",
    )
    out = curate.chunk_documents(docs, "doc_id", "text",
                                 max_tokens=32, overlap=8)
    by_id = {}
    for r in out.collect():
        by_id.setdefault(r.doc_id, []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0].n_tokens == 25
    assert len(by_id[3]) == 1
    # 40 tokens: chunk0 [0,32), chunk1 [24,40) adds tokens 32..39 → kept
    assert len(by_id[2]) == 2
    assert by_id[2][1].n_tokens == 16
    # every token still covered
    covered = set()
    for r in by_id[2]:
        covered.update(r.chunk_text.split(" "))
    assert covered == {f"t{i}" for i in range(40)}


def test_redact_pii_counts_match_replacements(spark):
    """Review regression: an email inside a URL counts once (as the URL),
    so counts always equal the placeholder occurrences."""
    docs = spark.createDataFrame(
        [(1, "visit https://x.com/user@mail.com now"),
         (2, "mail me at a@b.co or c@d.org")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           curate.redact_pii(docs, "doc_id", "text").collect()}
    assert out[1].n_urls == 1 and out[1].n_emails == 0
    assert out[1].redacted_text.count("<URL>") == 1
    assert "<EMAIL>" not in out[1].redacted_text
    assert out[2].n_emails == 2


def test_bm25_duplicate_query_terms_score_once(spark):
    """BM25 scores a query's term SET (r6 ADVICE): repeating a term in
    the query workload must not double that term's contribution."""
    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "cherry date")],
        "doc_id int, text string",
    )
    q1 = spark.createDataFrame(
        [("q", "apple"), ("q", "banana")], "query_id string, term string"
    )
    q2 = spark.createDataFrame(
        [("q", "apple"), ("q", "apple"), ("q", "banana")],
        "query_id string, term string",
    )
    r1 = sorted(tuple(r) for r in
                curate.bm25_topk(docs, "doc_id", "text", q1, k=5).collect())
    r2 = sorted(tuple(r) for r in
                curate.bm25_topk(docs, "doc_id", "text", q2, k=5).collect())
    assert r1 == r2


def test_leakage_safe_split_colocates_groups(spark):
    """Every member of a dup cluster gets the CLUSTER's split (keyed by
    min id), singletons split independently, all docs survive — and the
    group key is the cluster min id, so the property that prevents
    train/eval straddle holds by construction."""
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 11)], ["doc_id"]
    )
    # two clusters {1,2,3} and {7,8}; 4,5,6,9,10 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], ["id_a", "id_b"]
    )
    out = curate.leakage_safe_split(docs, pairs, "doc_id").collect()
    assert len(out) == 10
    by_id = {r.doc_id: r for r in out}
    assert {by_id[i].group_id for i in (1, 2, 3)} == {1}
    assert {by_id[i].group_id for i in (7, 8)} == {7}
    for i in (4, 5, 6, 9, 10):
        assert by_id[i].group_id == i
    # co-location: one split per group
    assert len({by_id[i].split for i in (1, 2, 3)}) == 1
    assert len({by_id[i].split for i in (7, 8)}) == 1
    assert set(by_id) == set(range(1, 11))


def test_nb_quality_score_prior_and_direction(spark):
    """Zero-token docs score exactly the class prior; a doc made of
    positive-corpus tokens outscores one made of negative-corpus tokens;
    every input row returns exactly once."""
    import math

    rows = [
        (1, "good clean prose", "pos"),
        (2, "good fluent clean prose text", "pos"),
        (3, "spam junk noise", "neg"),
        (4, "junk spam garbage noise spam", "neg"),
        (5, "clean prose indeed", "pool"),
        (6, "spam noise everywhere", "pool"),
        (7, "", "pool"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lbl"])
    out = curate.nb_quality_score(
        df, "doc_id", "text",
        is_positive=F.col("lbl") == "pos",
        is_negative=F.col("lbl") == "neg",
    ).collect()
    assert len(out) == 7
    by_id = {r.doc_id: r for r in out}
    prior = round(math.log(2 / 2), 6)  # 2 pos docs, 2 neg docs
    assert by_id[7].n_toks == 0
    assert by_id[7].score == pytest.approx(prior, abs=1e-9)
    assert by_id[5].score > 0 > by_id[6].score
