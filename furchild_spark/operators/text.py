"""Text analysis operators (tokenize / normalize / quality / lang-id).

All pure Column expressions — JVM-side, whole-stage-codegen friendly. At
100 TB these are embarrassingly parallel map-only transforms: no shuffle,
filters push down to the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .util import fanout

# Tiny stopword lists used by the quality/lang-id heuristics. Deliberately
# small and hard-coded so the same list can be embedded in oracle SQL.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
SQLISH_WORDS = ("table", "query", "join", "scan", "sort", "agg", "merge")


def normalize_text(col) -> Column:
    """lower + collapse whitespace + trim — the canonical form used by all
    dedup fingerprints (so near-dup candidates agree on token boundaries)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def tokens(col) -> Column:
    """Whitespace tokens of the *normalized* text, empty strings removed."""
    return F.filter(F.split(normalize_text(col), " "), lambda x: x != "")


def regex_tokens(col) -> Column:
    """BPE-ish regex tokenization: alpha runs, digit runs, single symbols.
    Mirrors the common pre-tokenizer split used before BPE merges."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), F.lit(0))


def shingles(tok_col, k: int = 3) -> Column:
    """k-token shingles (n-grams joined by single spaces) from a token array.
    ``transform(sequence(...))`` keeps it JVM-side; empty when < k tokens."""
    c = F.col(tok_col) if isinstance(tok_col, str) else tok_col
    n = F.size(c)
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(c, (i + j + 1).cast("int")) for j in range(k)]
        ),
    )


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring columns: char/token counts, distinct ratio, mean token
    length, stopword ratio, and a simple `is_quality` gate.

    ``sum(token lengths)`` is derived as chars-minus-spaces of the normalized
    text (exact for single-space-joined tokens) to stay in builtins.

    ⚠ Perf: the normalized text and token array are STAGED through their own
    projection (``select``) before fan-out. Composing them inline would make
    every downstream expression re-run the regexp+split per reference —
    Catalyst's CollapseProject deliberately keeps the boundary when an
    expensive expression is referenced more than once, so this is the
    idiomatic fix (measured 10× on the shingle pipeline).
    """
    stop_rx = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
    staged = fanout(df).select(
        "*",
        normalize_text(text_col).alias("__norm"),
        tokens(text_col).alias("__toks"),
    )
    return (
        staged.withColumn("n_chars", F.length(F.col(text_col)))
        .withColumn("n_tokens", F.size("__toks"))
        .withColumn("n_uniq_tokens", F.size(F.array_distinct("__toks")))
        .withColumn("alpha_chars", F.length(F.regexp_replace(F.col("__norm"), " ", "")))
        .withColumn(
            "mean_token_len",
            F.col("alpha_chars").cast("double") / F.col("n_tokens").cast("double"),
        )
        .withColumn(
            "n_stopwords",
            F.size(F.regexp_extract_all(F.col("__norm"), F.lit(stop_rx), F.lit(0))),
        )
        .withColumn(
            "stopword_ratio",
            F.col("n_stopwords").cast("double") / F.col("n_tokens").cast("double"),
        )
        .withColumn(
            "uniq_ratio",
            F.col("n_uniq_tokens").cast("double") / F.col("n_tokens").cast("double"),
        )
        .withColumn(
            "is_quality",
            F.col("n_tokens").between(5, 10000) & (F.col("stopword_ratio") < 0.5),
        )
        .drop("__norm", "__toks")
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram-free heuristic language/register ID: compare stopword-family
    hit counts. On real corpora the lists would be per-language character
    n-grams; the *shape* (counts → argmax, all JVM-side) is the point."""
    en_rx = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
    sql_rx = r"\b(" + "|".join(SQLISH_WORDS) + r")\b"
    staged = fanout(df).select("*", normalize_text(text_col).alias("__norm"))
    return (
        staged.withColumn(
            "c_en", F.size(F.regexp_extract_all(F.col("__norm"), F.lit(en_rx), F.lit(0)))
        )
        .withColumn(
            "c_sql", F.size(F.regexp_extract_all(F.col("__norm"), F.lit(sql_rx), F.lit(0)))
        )
        .withColumn(
            "lang_pred",
            F.when(F.col("c_en") >= F.col("c_sql"), F.lit("en")).otherwise(
                F.lit("dsl")
            ),
        )
        .drop("__norm")
    )


def doc_fingerprint(df: DataFrame, id_col: str, text_col: str, k: int = 3) -> DataFrame:
    """Single-permutation MinHash fingerprint: min(md5(shingle)) — a compact
    rolling-hash-style document signature. Equal fingerprints ⇒ very likely
    shared shingles; used as a cheap pre-filter before full MinHash.

    Tokens and shingles are staged through separate projections — see the
    perf note on :func:`with_text_stats` (10× measured on this function)."""
    staged = fanout(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    staged = staged.select(F.col(id_col), shingles("__toks", k).alias("__sh"))
    return staged.select(
        F.col(id_col),
        F.size("__sh").alias("n_shingles"),
        F.array_min(F.transform("__sh", F.md5)).alias("fingerprint"),
    )


def suppress_duplicate_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 8,
    max_docs: int = 1,
) -> DataFrame:
    """Corpus-level duplicate-passage suppression (the C4/RefinedWeb
    "remove lines repeated across documents" step, with fixed
    ``chunk_tokens``-token windows as the passage unit since the corpus
    has no line structure): a chunk whose exact text appears in MORE
    than ``max_docs`` distinct documents is boilerplate and is dropped
    from every document; survivors reassemble in order. Documents whose
    chunks are all boilerplate survive with empty text (they then fall
    to the length-based quality gate, not silently vanish).

    Scale shape — the honest cost of corpus-level dedup, kept minimal:
    one explode (map-side), ONE shuffle to count distinct docs per chunk
    (partial-aggregated), one keyed join back, one shuffle to regroup
    documents. No driver-side state; the frequency side could broadcast
    only if the boilerplate set were known small, which at 100 TB it is
    not — so it stays a shuffle join.
    """
    # NULL text → size() = -1 and a descending sequence(0, -1) would
    # fabricate two phantom chunks; coalesce + greatest pins every doc to
    # ≥1 chunk (an empty doc contributes one '' chunk and so still
    # survives to the output, honoring the no-silent-vanish contract)
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n_chunks = F.greatest(
        F.lit(1), F.ceil(F.size(toks) / F.lit(chunk_tokens))
    ).cast("int")
    chunks = df.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * chunk_tokens + 1, chunk_tokens)
                ),
            )
        ).alias("idx", "chunk"),
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct(id_col).alias("__nd")
    )
    flagged = chunks.join(freq, on="chunk").withColumn(
        "__keep", F.col("__nd") <= F.lit(max_docs)
    )
    kept_struct = F.when(
        F.col("__keep"), F.struct(F.col("idx"), F.col("chunk"))
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["chunk"],
                ),
            ).alias("cleaned_text"),
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.sum(F.when(~F.col("__keep"), 1).otherwise(0))
            .cast("long")
            .alias("n_removed"),
        )
    )


def bigram_repetition(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", Table A1): the fraction of bigrams that
    occur more than once and the share taken by the single most frequent
    bigram — the standard gates against boilerplate/spam docs whose text
    loops. Per doc: (n_bigrams, n_distinct_bigrams, dup_bigram_frac,
    top_bigram, top_bigram_frac); docs with < 2 tokens emit nothing.

    Shape: explode bigram shingles → one hash agg on (doc, gram) — the
    fan-out is map-side combined — then doc-keyed window functions
    compute totals, dup mass and the (cnt DESC, gram ASC)-ranked top on
    one exchange. All keys carry the doc id, so nothing concentrates:
    at 100 TB this is two doc-partitioned shuffles, no skew, no
    driver state. Fractions are quotients of exact integers (IEEE-
    deterministic, hash-portable); top-bigram ties break lexically.

    ⚠ The token array is STAGED through its own projection (the
    shingle_sets pattern): inlining ``tokens(text)`` into ``shingles``
    duplicates the regex+split at every element_at reference — measured
    ~5× slower on the bench before staging."""
    staged = fanout(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    grams = staged.select(
        F.col(id_col),
        F.explode(shingles("__toks", 2)).alias("gram"),
    )
    counts = grams.groupBy(id_col, "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_doc = Window.partitionBy(id_col)
    w_rank = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc("gram"))
    return (
        counts.withColumn("n_bigrams", F.sum("cnt").over(w_doc))
        .withColumn("n_distinct_bigrams", F.count(F.lit(1)).over(w_doc))
        .withColumn(
            "dup_cnt",
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))
            ).over(w_doc),
        )
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("n_distinct_bigrams").cast("long").alias("n_distinct_bigrams"),
            (
                F.col("dup_cnt").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("dup_bigram_frac"),
            F.col("gram").alias("top_bigram"),
            (
                F.col("cnt").cast("double")
                / F.col("n_bigrams").cast("double")
            ).alias("top_bigram_frac"),
        )
    )


def bigram_lm_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CCNet-style language-model quality scoring (Wenzek et al. 2019,
    arXiv:1911.00359 §4.3): score each document by the per-token
    cross-entropy of its token stream under a bigram MLE model — CCNet
    buckets a corpus into head/middle/tail by exactly this statistic.
    The model here is trained on the corpus itself (one aggregation),
    so the operator is self-contained: ``P(w2|w1) = C(w1 w2) / C(w1·)``
    where ``C(w1·)`` counts w1 as a bigram CONTEXT (non-final token),
    making every probability well-defined and ≤ 1.

    Shape at 100 TB: one bigram explode (map-side combined groupBy →
    the model table, bounded by the distinct-bigram count ≪ corpus
    tokens), one derived context rollup over that already-aggregated
    table, one join of doc-bigrams to the model on the bigram string
    (AQE broadcasts it when the vocabulary is small), one doc-keyed
    agg. No window over the full corpus, no driver state.

    Cross-engine parity: counts are exact integers; ``ln(cu/cb)`` is
    computed as the log of one bigint/bigint quotient (≥ 1, so the
    result is a POSITIVE zero when P=1 — ``-ln(cb/cu)`` would emit
    ``-0.0`` and hash-diverge), rounded to 6 dp; per-doc sums are
    DECIMAL(18,6) (order-independent); the final mean divides once and
    rounds to 6 dp. Docs with < 2 tokens survive with
    ``n_bigrams = 0`` and a NULL entropy (left join back to the doc
    set), so the output stays one-row-per-document.

    Output: ``(doc_id, n_bigrams, cross_entropy)`` — low entropy =
    head-like fluent text, high = tail/noise, exactly CCNet's axis.
    """
    staged = fanout(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    grams = staged.select(
        F.col(id_col), F.explode(shingles("__toks", 2)).alias("bg")
    )
    model = grams.groupBy("bg").agg(F.count(F.lit(1)).alias("cb"))
    ctx = (
        model.groupBy(F.split("bg", " ").getItem(0).alias("w1"))
        .agg(F.sum("cb").alias("cu"))
    )
    scored = model.join(
        ctx, F.split(model.bg, " ").getItem(0) == ctx.w1
    ).select(
        "bg",
        F.round(
            F.log(F.col("cu").cast("double") / F.col("cb").cast("double")), 6
        ).alias("logp"),
    )
    per_doc = (
        grams.join(scored, on="bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("logp").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("cross_entropy"),
        )
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            "cross_entropy",
        )
    )


def bpe_train(docs: DataFrame, text_col: str = "text", rounds: int = 5) -> DataFrame:
    """BPE vocabulary induction (Sennrich, Haddow & Birch 2015,
    arXiv:1508.07909) as distributed relational iteration: learn the
    first ``rounds`` merge rules over the corpus.

    The corpus is touched ONCE — the initial word-type count (explode →
    groupBy). Every subsequent round operates on the word-TYPE table
    (vocabulary-sized, ≪ corpus — exactly how real BPE trainers work),
    so 100 TB of text costs one token shuffle plus vocab-bounded
    iteration. Per round: (1) adjacent symbol pairs come from an IN-ROW
    zip_with over each word's symbol array, weighted by word frequency
    (map-side combined groupBy); (2) the best pair is a deterministic
    TakeOrdered(1) — ``(count DESC, s1 ASC, s2 ASC)`` — broadcast back;
    (3) the merge applies as an IN-ROW ``F.aggregate`` fold implementing
    single-pass greedy left-to-right non-overlapping replacement (the
    fold merges when the accumulator's last element equals p1 and the
    incoming symbol equals p2; a just-merged token is ``p1+p2`` ≠ ``p1``,
    so cascade merges within a round are impossible — byte-for-byte the
    scan semantics every BPE implementation uses). The word table is
    ``localCheckpoint``-ed per round so the plan does not grow with the
    round count (the connected-components pattern).

    Output: the learned merge table ``(round, p1, p2, pair_count)`` —
    one row per round. If any round's count, tie-break, or greedy
    application diverged, every later row diverges too, so the tiny
    output certifies the whole training trajectory.
    """
    words = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    cur = words.select(
        "word",
        "freq",
        F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)),
        ).alias("syms"),
    ).localCheckpoint(eager=True)

    merge_rows = []
    for r in range(1, rounds + 1):
        pair_arr = F.zip_with(
            F.slice(F.col("syms"), F.lit(1), F.size("syms") - 1),
            F.slice(F.col("syms"), F.lit(2), F.size("syms") - 1),
            lambda a, b: F.struct(a.alias("s1"), b.alias("s2")),
        )
        best = (
            cur.select("freq", F.explode(pair_arr).alias("pr"))
            .groupBy(F.col("pr.s1").alias("s1"), F.col("pr.s2").alias("s2"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("s1"), F.asc("s2"))
            .limit(1)
            .localCheckpoint(eager=True)
        )
        merge_rows.append(
            best.select(
                F.lit(r).cast("long").alias("round"),
                F.col("s1").alias("p1"),
                F.col("s2").alias("p2"),
                F.col("cnt").cast("long").alias("pair_count"),
            )
        )
        bc = F.broadcast(
            best.select(
                F.col("s1").alias("__p1"),
                F.col("s2").alias("__p2"),
            )
        )
        merged_tok = F.concat(F.col("__p1"), F.col("__p2"))
        cur = (
            cur.crossJoin(bc)
            .select(
                "word",
                "freq",
                F.aggregate(
                    "syms",
                    F.array().cast("array<string>"),
                    lambda acc, s: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.col("__p1"))
                        & (s == F.col("__p2")),
                        F.concat(
                            F.slice(acc, F.lit(1), F.size(acc) - 1),
                            F.array(merged_tok),
                        ),
                    ).otherwise(F.concat(acc, F.array(s))).alias("acc"),
                ).alias("syms"),
            )
            .localCheckpoint(eager=True)
        )

    out = merge_rows[0]
    for m in merge_rows[1:]:
        out = out.unionByName(m)
    return out




def _bpe_word_subwords(w, merges: list[tuple[str, str]]):
    """One word -> its post-merge symbol array: split to characters,
    then every learned rule applies IN ORDER as the same in-row greedy
    fold the trainer uses (shared by the map-only and the
    vocab-factored apply paths)."""
    syms = F.transform(
        F.sequence(F.lit(1), F.length(w)), lambda i: w.substr(i, F.lit(1))
    )
    for p1, p2 in merges:
        merged = F.lit(p1 + p2)
        # closing over the loop vars is safe: F.aggregate invokes the
        # lambda EAGERLY to build the expression tree, so each round
        # captures its own (p1, p2)
        syms = F.aggregate(
            syms,
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(p1))
                & (s == F.lit(p2)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(merged)
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
    return syms


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned BPE merge rules — the serving half of
    :func:`bpe_train`. ``merges`` is the ordered rule list (p1, p2), the
    tiny driver-side artifact a tokenizer ships (collect the ≤vocab-sized
    merge table once; it is the model, like broadcast centroids). Each
    document tokenizes, each word splits to characters, and every rule
    applies IN ORDER as the same in-row greedy fold the trainer uses —
    so train→apply round-trips bit-for-bit. Map-only: zero shuffles,
    zero joins; at 100 TB this fuses into the scan projection.

    Output: ``(id, bpe_tokens array<string>, n_tokens)`` — the packed
    subword stream per document.
    """
    # NULL text -> empty stream, not NULL (the package-wide
    # no-silent-NULL contract; also what the oracle's coalesce asserts)
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    return docs.select(
        F.col(id_col),
        F.flatten(
            F.transform(toks, lambda w: _bpe_word_subwords(w, merges))
        ).alias("bpe_tokens"),
    ).select(
        id_col,
        "bpe_tokens",
        F.size("bpe_tokens").cast("long").alias("n_tokens"),
    )


def bpe_apply_by_vocab(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """:func:`bpe_apply` factored through the VOCABULARY: the rule fold
    (the expensive part — per symbol, per rule, an array rebuild) runs
    once per DISTINCT word instead of once per token occurrence, then a
    token→word join maps every occurrence to its precomputed subwords
    and a per-document regroup reassembles the stream in order.

    Same output contract as :func:`bpe_apply`, bit-for-bit (shared
    fold). The trade: two shuffles (vocab distinct + doc regroup) and a
    vocab-sized join side, bought against fold work proportional to
    |vocab| instead of |tokens| — the dedup-before-expensive-work move
    (SURVEY §4). On natural corpora tokens/vocab is 10-100×, and the
    measured win on the fixture corpus is ~3× end-to-end. Prefer the
    map-only :func:`bpe_apply` when the pipeline around it is shuffle-
    free and the corpus is token-light; prefer this form inside
    already-shuffling pipelines and at 100 TB, where the vocab side
    stays broadcastable long after per-token folding stops scaling.
    """
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    base = docs.select(F.col(id_col), toks.alias("__t"))
    ex = base.select(
        F.col(id_col), F.posexplode("__t").alias("__pos", "__w")
    )
    vsub = (
        ex.select(F.col("__w")).distinct()
        .select("__w", _bpe_word_subwords(F.col("__w"), merges).alias("__syms"))
    )
    agg = (
        ex.join(vsub, on="__w")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                F.col("__pos").alias("p"),
                                F.col("__syms").alias("s"),
                            )
                        )
                    ),
                    lambda x: x["s"],
                )
            ).alias("bpe_tokens")
        )
    )
    return (
        base.select(id_col)
        .join(agg, on=id_col, how="left")
        .select(
            id_col,
            F.coalesce(
                "bpe_tokens", F.array().cast("array<string>")
            ).alias("bpe_tokens"),
            F.coalesce(F.size("bpe_tokens"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# WordPiece-style tokenizer: frequency vocabulary + greedy longest-match
# ---------------------------------------------------------------------------

def wordpiece_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_frac: float = 1.0 / 500.0,
) -> DataFrame:
    """Corpus-derived piece vocabulary for greedy longest-match
    segmentation (the WordPiece/BERT tokenizer family, Wu et al. 2016
    arXiv:1609.08144 §4.1 — vocabulary induction here is frequency
    thresholding rather than the likelihood criterion, which keeps the
    construction fully relational and oracle-replayable; the APPLY side
    is exactly WordPiece's greedy longest-match-first).

    A piece is any word substring of length ≤ ``max_piece_len`` whose
    occurrence-weighted corpus count reaches ``min_frac`` of total word
    occurrences — plus EVERY observed single character unconditionally,
    so segmentation can never get stuck. Overlapping occurrences count
    (each (position, length) slot of each word occurrence), making the
    count a pure sum over the word-type table. ``min_frac`` is applied
    as the exact integer test ``cnt · round(1/min_frac) ≥ total`` so
    oracles can restate it without float thresholds — i.e. it is
    effectively snapped to ``1/round(1/min_frac)``.

    Shape at 100 TB: one token shuffle builds the word-type table
    (map-side combined; types ≪ occurrences), the substring explode is
    bounded at ``len(word) × max_piece_len`` rows PER TYPE, and the
    relative threshold caps the vocabulary at ``max_piece_len/min_frac``
    pieces by construction (a piece needs min_frac of all occurrence
    mass) — so the vocab always broadcasts, at any corpus size.

    Output: ``(piece, cnt)`` rows.
    """
    wc = (
        fanout(docs)
        .select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    # expr(): Spark's substring() Column API wants literal pos/len; the
    # SQL form keeps the (i, l) slot enumeration in one in-row
    # comprehension over the word type
    sub = wc.select(
        "wc",
        F.explode(
            F.expr(
                "flatten(transform(sequence(1, length(word)), i -> "
                "  filter(transform(sequence(1, {L}), l -> "
                "    case when i + l - 1 <= length(word) "
                "         then substring(word, i, l) end), "
                "    p -> p is not null)))".format(L=max_piece_len)
            )
        ).alias("piece"),
    )
    cnt = sub.groupBy("piece").agg(F.sum("wc").alias("cnt"))
    total = wc.agg(F.sum("wc").alias("total"))
    return (
        cnt.crossJoin(F.broadcast(total))
        .filter(
            (F.length("piece") == 1)
            | (F.col("cnt") * F.lit(int(round(1 / min_frac))) >= F.col("total"))
        )
        .select("piece", "cnt")
    )


def wordpiece_apply(
    words: DataFrame,
    vocab: DataFrame,
    word_col: str = "word",
    max_piece_len: int = 4,
) -> DataFrame:
    """Greedy longest-match-first segmentation (the WordPiece serving
    algorithm): at each position take the LONGEST vocab piece starting
    there, falling back to the single character (always in vocab by
    construction). No tie-break is ever needed — at one position there
    is exactly ONE candidate substring per length.

    Map-only: the vocabulary rides as per-length sorted arrays in one
    broadcast row (bounded by construction, see
    :func:`wordpiece_vocab`), and the walk is an in-row ``aggregate``
    fold over at most ``len(word)`` steps — no shuffle, no UDF, fuses
    into the scan. Adds ``pieces array<string>`` and ``n_pieces``.
    """
    by_len = vocab.groupBy(F.length("piece").alias("__l")).agg(
        F.sort_array(F.collect_list("piece")).alias("__ps")
    )
    packed = by_len.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("__l", "__ps")))
        ).alias("__v")
    )

    # expr() formulation: one in-row aggregate fold; `__v` is the
    # per-length vocab map column, and the candidate cascade tries the
    # longest length first (single chars always hit, so the ELSE arm is
    # the guaranteed fallback)
    casc = " ".join(
        f"WHEN array_contains(__v[{L}], substring({word_col}, acc.pos + 1, {L})) "
        f"THEN substring({word_col}, acc.pos + 1, {L})"
        for L in range(max_piece_len, 1, -1)
    )
    seg = (
        "aggregate(sequence(1, length({w})), "
        "  named_struct('pos', 0, 'ps', cast(array() as array<string>)), "
        "  (acc, x) -> case when acc.pos >= length({w}) then acc else "
        "    named_struct("
        "      'pos', acc.pos + length(case {casc} else substring({w}, acc.pos + 1, 1) end), "
        "      'ps', array_append(acc.ps, case {casc} else substring({w}, acc.pos + 1, 1) end)) "
        "  end, "
        "  acc -> acc.ps)"
    ).format(w=word_col, casc=casc)
    return (
        words.crossJoin(F.broadcast(packed))
        .withColumn("pieces", F.expr(seg))
        .withColumn("n_pieces", F.size("pieces").cast("long"))
        .drop("__v")
    )


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer: Viterbi segmentation under piece log-probabilities
# ---------------------------------------------------------------------------

def unigram_scores(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_frac: float = 1.0 / 500.0,
) -> DataFrame:
    """Piece log-probabilities for Unigram-LM segmentation (Kudo 2018,
    arXiv:1804.10959 — SentencePiece's unigram model; vocabulary here is
    the frequency-thresholded substring inventory of
    :func:`wordpiece_vocab` — the paper's SEED vocabulary; the EM
    pruning round the paper runs on top is :func:`unigram_em_round`.
    The APPLY side is the paper's exact Viterbi decode).

    ``score(p) = round(ln(cnt(p) / Σ cnt over vocab), 6)`` — one ln of a
    bigint/bigint quotient, so both engines compute the identical
    decimal. Output: ``(piece, score decimal(18,6))``.
    """
    v = wordpiece_vocab(docs, text_col, max_piece_len, min_frac)
    tm = v.agg(F.sum("cnt").alias("__tm"))
    return v.crossJoin(F.broadcast(tm)).select(
        "piece",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("__tm").cast("double")),
            6,
        ).cast("decimal(18,6)").alias("score"),
    )


def unigram_apply(
    words: DataFrame,
    scores: DataFrame,
    word_col: str = "word",
    max_piece_len: int = 4,
) -> DataFrame:
    """Viterbi segmentation: the piece sequence maximizing the summed
    log-probability (unlike WordPiece's greedy walk, a shorter piece now
    wins when the whole-word likelihood says so). Exact-decimal DP, so
    the argmax is engine-portable; ties between equal-likelihood paths
    break to the LONGER last piece — deterministic on both sides.

    Map-only shape: the (piece → score) table rides as one broadcast map
    (bounded by the vocab construction), and the DP is an in-row fold
    carrying a ROLLING window of the last ``max_piece_len`` (dp, path)
    states — no per-position table, no shuffle, no UDF. The same rolling
    trick is what makes the oracle a single-row-per-word recursive CTE.

    Adds ``pieces array<string>``, ``n_pieces``, ``logp double``.
    """
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    packed = scores.agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("piece", "score")))
        ).alias("__m")
    )
    w = word_col
    # candidate for length L at target position x: dp[x-L] + score(piece);
    # acc.d[0] is dp[x-1], d[1] dp[x-2], ... (0-based Spark [] access)
    # decimal addition widens (18,6)+(18,6) → (19,6); aggregate() needs
    # the merge's struct type to EXACTLY match the zero's, so every dp
    # sum is cast back down (|logp| is bounded by word_len × |min score|
    # ≪ 10^12, so the narrow cast is lossless)
    cands = ", ".join(
        f"case when {('acc.d[' + str(L - 1) + ']')} is not null "
        f"  and __m[substring({w}, x - {L} + 1, {L})] is not null "
        f"then named_struct("
        f"  'dp', cast({('acc.d[' + str(L - 1) + ']')} "
        f"        + __m[substring({w}, x - {L} + 1, {L})] "
        f"        as decimal(18,6)), "
        f"  'L', {L}, "
        f"  'sg', case when {('acc.s[' + str(L - 1) + ']')} = '' "
        f"        then substring({w}, x - {L} + 1, {L}) "
        f"        else concat({('acc.s[' + str(L - 1) + ']')}, '\\u001f', "
        f"                    substring({w}, x - {L} + 1, {L})) end) end"
        for L in range(1, max_piece_len + 1)
    )
    # paths join on the unit separator, not '+': tokens are whitespace-
    # split, so '+' CAN occur inside a word and would corrupt the
    # piece-count split; \\x1f cannot (control chars never survive
    # tokenization of real text)
    state_t = "struct<d: array<decimal(18,6)>, s: array<string>>"
    # the rolling window carries exactly max_piece_len (dp, path) slots;
    # both the zero state and the shift are GENERATED from max_piece_len
    # (a hardcoded 4-slot window would silently drop length-5+ candidates
    # via out-of-bounds array access, which returns NULL under non-ANSI
    # Spark instead of erroring)
    init_d = ", ".join(
        ["cast(0.0 as decimal(18,6))"]
        + ["cast(null as decimal(18,6))"] * (max_piece_len - 1)
    )
    init_s = ", ".join(["''"] + ["cast(null as string)"] * (max_piece_len - 1))
    shift_d = ", ".join(f"acc.d[{i}]" for i in range(max_piece_len - 1))
    shift_s = ", ".join(f"acc.s[{i}]" for i in range(max_piece_len - 1))
    # zero-length words: sequence(1, 0) is the DESCENDING [1, 0] (step
    # defaults to -1 when start > stop), which would walk the fold with
    # all-NULL candidates; slice to the word length so an empty word
    # folds over an empty array and keeps the zero state
    seg = (
        "aggregate(slice(sequence(1, greatest(length({w}), 1)), 1, length({w})), "
        "  cast(named_struct("
        "    'd', array({init_d}), "
        "    's', array({init_s})) "
        "   as {state_t}), "
        "  (acc, x) -> cast("
        "    named_struct("
        "      'd', array(array_max(filter(array({cands}), c -> c is not null)).dp{shift_d}, "
        "      's', array(array_max(filter(array({cands}), c -> c is not null)).sg{shift_s}) as {state_t}), "
        "  acc -> named_struct('logp', acc.d[0], 'sg', acc.s[0]))"
    ).format(
        w=w,
        cands=cands,
        state_t=state_t,
        init_d=init_d,
        init_s=init_s,
        shift_d=(", " + shift_d + ")") if shift_d else ")",
        shift_s=(", " + shift_s + ")") if shift_s else ")",
    )
    out = (
        words.crossJoin(F.broadcast(packed))
        .withColumn("__r", F.expr(seg))
        .withColumn(
            "pieces",
            F.when(F.length(F.col(w)) == 0, F.array().cast("array<string>"))
            .otherwise(F.split(F.col("__r.sg"), "\x1f")),
        )
        .withColumn("n_pieces", F.size("pieces").cast("long"))
        .withColumn("logp", F.col("__r.logp").cast("double"))
        .drop("__m", "__r")
    )
    return out


def unigram_em_round(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_frac: float = 1.0 / 500.0,
    keep_frac: float = 0.8,
) -> DataFrame:
    """One hard-EM iteration over the frequency-seeded unigram vocab —
    the pruning round of Kudo 2018 (arXiv:1804.10959 §3.2; SentencePiece
    seeds a large vocabulary, re-estimates piece probabilities from the
    corpus segmentation, and drops the lowest-contribution pieces until
    the target size). Hard EM (Viterbi counts, not forward-backward
    expectations) keeps every quantity an exact decimal/bigint, so a
    DuckDB oracle replays the round bit-for-bit.

    - **E-step**: Viterbi-segment every word TYPE under the seed scores
      (:func:`unigram_scores`); piece usage counts are weighted by the
      type's corpus frequency. Map-only fold per word + one piece-level
      aggregate.
    - **M-step**: ``score'(p) = round₆(ln(cnt'(p) / Σ cnt'))`` over the
      SURVIVING vocab, where multi-char pieces keep only the top
      ``keep_frac`` by usage (``cnt DESC, piece ASC`` — deterministic;
      unused multis prune implicitly via cnt=0) and single chars always
      survive with usage floored at 1 (coverage: a char used only inside
      longer pieces must not become ln(0)).

    The prune rank runs one SinglePartition window — bounded BY
    CONSTRUCTION, not by data: a multi-char piece needs ``min_frac`` of
    the corpus occurrence mass to enter the seed vocab, so there are at
    most ``max_piece_len / min_frac`` of them regardless of corpus size.

    Returns ``(piece, score decimal(18,6))`` — drop-in for
    :func:`unigram_apply`.
    """
    # same artifact discipline as unigram_em_train: both inputs and the
    # result are vocab/word-type-sized (bounded by the seeding threshold
    # / Zipf), so checkpoint them once — the seed scores are consumed
    # twice inside the step (packed decode map + prune base), and
    # callers consume the returned scores repeatedly (decode + vocab
    # count); without the checkpoints every consumer re-runs the
    # corpus-seeding scan AND the full-vocabulary Viterbi E-step
    scores0 = unigram_scores(
        docs, text_col, max_piece_len, min_frac
    ).localCheckpoint()
    return _unigram_em_step(
        _word_counts(docs, text_col), scores0, max_piece_len, keep_frac
    ).localCheckpoint()


def _word_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _unigram_em_step(
    wc: DataFrame,
    scores: DataFrame,
    max_piece_len: int,
    keep_frac: float,
    target_vocab: int | None = None,
    n_singles: int | None = None,
) -> DataFrame:
    """One hard-EM iteration given current scores (the shared core of
    :func:`unigram_em_round` and :func:`unigram_em_train`). With
    ``target_vocab`` set, the multi-piece keep budget is
    ``max(floor(n·keep_frac), target_vocab - n_singles)`` — Kudo 2018's
    never-overshoot rule: shrink by the prune ratio per round, but stop
    exactly AT the target instead of sailing below it."""
    seg = unigram_apply(wc, scores, "word", max_piece_len)
    used = (
        seg.select("wc", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wc").cast("long").alias("cnt"))
    )
    base = scores.select("piece").join(used, on="piece", how="left").select(
        "piece",
        F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt"),
    )
    singles = base.filter(F.length("piece") == 1).select(
        "piece", F.greatest("cnt", F.lit(1)).cast("long").alias("cnt")
    )
    multis = base.filter((F.length("piece") > 1) & (F.col("cnt") > 0))
    rank_w = Window.orderBy(F.desc("cnt"), F.asc("piece"))
    n_multi = multis.select(F.count(F.lit(1)).alias("__n"))
    # integer keep budget: floor(n * keep_frac) via exact integer
    # arithmetic (keep_frac quantized to percent so both engines
    # compute the identical cutoff)
    keep = F.col("__rn") * 100 <= F.col("__n") * int(round(keep_frac * 100))
    if target_vocab is not None:
        keep = keep | (F.col("__rn") <= F.lit(target_vocab - n_singles))
    kept_multis = (
        multis.withColumn("__rn", F.row_number().over(rank_w))
        .crossJoin(F.broadcast(n_multi))
        .filter(keep)
        .select("piece", "cnt")
    )
    vocab1 = singles.unionByName(kept_multis)
    tm1 = vocab1.agg(F.sum("cnt").alias("__tm"))
    return vocab1.crossJoin(F.broadcast(tm1)).select(
        "piece",
        F.round(
            F.log(F.col("cnt").cast("double") / F.col("__tm").cast("double")),
            6,
        ).cast("decimal(18,6)").alias("score"),
    )


def unigram_em_train(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    min_frac: float = 1.0 / 500.0,
    keep_frac: float = 0.8,
    target_vocab: int = 100,
    max_rounds: int = 10,
) -> DataFrame:
    """Kudo 2018's full training loop (arXiv:1804.10959 §3.2, r10
    VERDICT #7): EM-prune rounds REPEAT until the vocabulary reaches the
    target size, not one round. Each round keeps the top
    ``max(floor(n_multi·keep_frac), target_vocab - n_singles)`` pieces
    by Viterbi usage, so the loop shrinks geometrically and lands
    exactly at the target (or just under it, when fewer multis survive
    with nonzero usage than the budget allows).

    Driver-side control flow mirrors the power-iteration precedent: the
    loop condition reads ONE bounded scalar per round (the vocab size —
    at most ``max_piece_len/min_frac + alphabet`` by the seeding bound);
    all per-piece work stays distributed. ``max_rounds`` bounds the loop
    when the target is unreachable (e.g. target below the single-char
    alphabet, which always survives for coverage)."""
    # both artifacts are vocab/word-type-sized (bounded by the seeding
    # threshold) — checkpoint once so the corpus is scanned exactly twice
    # (substring seeding + word counts) no matter how many rounds run
    scores = unigram_scores(
        docs, text_col, max_piece_len, min_frac
    ).localCheckpoint()
    wc = _word_counts(docs, text_col).localCheckpoint()
    n_singles = scores.filter(F.length("piece") == 1).count()
    for _ in range(max_rounds):
        if scores.count() <= target_vocab:
            break
        scores = _unigram_em_step(
            wc, scores, max_piece_len, keep_frac,
            target_vocab=target_vocab, n_singles=n_singles,
        ).localCheckpoint()
    return scores
