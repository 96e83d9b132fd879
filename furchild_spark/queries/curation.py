"""Curation-operator queries: sessionization, deterministic splits,
vocabulary/IDF, PII redaction, duplicate-cluster connected components.

All have full DuckDB oracles — including the iterative connected-components
operator, whose fixpoint (min reachable node id per node) is re-derived in
SQL with a recursive CTE: both engines compute the same unique fixpoint, so
hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from furchild_spark.operators import curate, dedup, skew
from .catalog import money, query, table
from ._oracle_fragments import _MINHASH_CTES, _NORM, _TOKS


# ---------------------------------------------------------------------------
# sessionization over the event stream
# ---------------------------------------------------------------------------

@query(
    "sessionize_events",
    section="LLM-curation sessionization (gap-based, exact-integer micros)",
    headline=True,
    oracle="""
WITH x AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), s AS (
  SELECT user_id, session_seq,
    MIN(ts) AS session_start, MAX(ts) AS session_end,
    CAST((epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS BIGINT) AS duration_sec,
    COUNT(*) AS n_events,
    CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum
  FROM (
    SELECT *, SUM(is_new) OVER (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS UNBOUNDED PRECEDING
    ) AS session_seq FROM x
  )
  GROUP BY user_id, session_seq
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, session_start,
  session_end, duration_sec, CAST(n_events AS BIGINT) AS n_events, value_sum
FROM s
""",
)
def sessionize_events(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return curate.session_rollup(
        e, "user_id", "ts", "value", gap_seconds=1800, tiebreak_col="event_id"
    ).select(
        "user_id",
        "session_seq",
        "session_start",
        "session_end",
        "duration_sec",
        F.col("n_events").cast("long").alias("n_events"),
        "value_sum",
    )


# ---------------------------------------------------------------------------
# deterministic train/val/test split
# ---------------------------------------------------------------------------

_T1, _T2 = curate.split_thresholds(0.8, 0.1)

@query(
    "hash_split",
    section="LLM-curation deterministic md5-threshold train/val/test split",
    oracle=f"""
SELECT doc_id,
  CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{_T1}' THEN 'train'
       WHEN md5(CAST(doc_id AS VARCHAR)) < '{_T2}' THEN 'val'
       ELSE 'test' END AS split
FROM documents
""",
)
def hash_split(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curate.hash_split(d, "doc_id", 0.8, 0.1).select("doc_id", "split")


# ---------------------------------------------------------------------------
# vocabulary / document frequency / IDF
# ---------------------------------------------------------------------------

@query(
    "vocab_idf",
    section="LLM-curation vocabulary building (document frequency + IDF)",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS token FROM documents
), n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT token, COUNT(*) AS df,
  round(ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6) AS idf
FROM tok GROUP BY token
""",
)
def vocab_idf(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curate.vocab_df_idf(d, "text")


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

@query(
    "pii_redact",
    section="LLM-curation PII scrubbing (URL/email/phone, RE2 patterns)",
    oracle=f"""
WITH red AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(text, '{curate.URL_RX}', '<URL>', 'g'),
        '{curate.EMAIL_RX}', '<EMAIL>', 'g'),
      '{curate.PHONE_RX}', '<PHONE>', 'g') AS redacted_text
  FROM documents
)
SELECT doc_id,
  CAST(len(string_split(redacted_text, '<URL>')) - 1 AS BIGINT) AS n_urls,
  CAST(len(string_split(redacted_text, '<EMAIL>')) - 1 AS BIGINT) AS n_emails,
  CAST(len(string_split(redacted_text, '<PHONE>')) - 1 AS BIGINT) AS n_phones,
  redacted_text
FROM red
""",
)
def pii_redact(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curate.redact_pii(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# duplicate clusters: connected components over MinHash near-dup pairs
# ---------------------------------------------------------------------------

@query(
    "dup_clusters",
    section="LLM-curation near-dup cluster assignment (iterative min-label CC)",
    oracle=_MINHASH_CTES.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + f"""
, verified AS (
  SELECT id_a, id_b FROM (
    SELECT i.id_a, i.id_b,
      CAST(i.n_inter AS DOUBLE) / CAST(za.sz + zb.sz - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.id_a
    JOIN sizes zb ON zb.doc_id = i.id_b
  ) WHERE jaccard >= 0.3
),
nodes AS (
  SELECT id_a AS node FROM verified UNION SELECT id_b FROM verified
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION SELECT id_b, id_a FROM verified
),
reach(src, dst) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN sym e ON r.dst = e.src
)
SELECT src AS node, MIN(dst) AS cluster_id FROM reach GROUP BY src
""",
)
def dup_clusters(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        d, "doc_id", "text", num_perm=16, rows_per_band=4, shingle_k=3,
        threshold=0.3, hash_fn="md5",
    ).select("id_a", "id_b")
    # near-dup clusters are near-cliques (diameter 2-3): checking every
    # 2nd round halves checkpoint materializations at identical labels
    return curate.connected_components(pairs, checkpoint_interval=2)


# ---------------------------------------------------------------------------
# deterministic stratified sampling (per-source mixture weights)
# ---------------------------------------------------------------------------

_STRATA = {"src0": 1.0, "src1": 0.5, "src2": 0.25}
_STRATA_DEFAULT = 0.1


def _strata_case() -> str:
    arms = " ".join(
        f"WHEN source = '{k}' THEN '{curate.hex_threshold(f)}'"
        for k, f in _STRATA.items()
    )
    return f"CASE {arms} ELSE '{curate.hex_threshold(_STRATA_DEFAULT)}' END"


@query(
    "stratified_sample",
    section="LLM-curation deterministic stratified sampling (per-stratum md5 "
    "thresholds — reproducible data mixtures)",
    oracle=f"""
SELECT doc_id, source FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) < {_strata_case()}
""",
)
def stratified_sample(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curate.stratified_hash_sample(
        d, "doc_id", "source", _STRATA, _STRATA_DEFAULT
    ).select("doc_id", "source")


# ---------------------------------------------------------------------------
# skew mitigation: salted join + salted exact distinct-count
# ---------------------------------------------------------------------------

@query(
    "salted_join_rollup",
    section="scale-skew salted equi join (hot-key pre-split + replicated dim; "
    "result identical to the plain join)",
    oracle="""
SELECT o_orderpriority,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
  COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
""",
)
def salted_join_rollup(spark, sf_dir):
    _m = money

    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    joined = skew.salted_join(
        li, o, on="l_orderkey", salt_from=["l_linenumber", "l_partkey"],
        salt_factor=8,
    )
    return joined.groupBy("o_orderpriority").agg(
        F.sum(_m("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _m("l_discount")))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "tfidf_top_terms",
    section="LLM-curation TF-IDF keyword extraction (tf x idf, per-doc top-k)",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKS}) AS token FROM documents
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
), dtok AS (
  SELECT doc_id, unnest(list_distinct({_TOKS})) AS token FROM documents
), idf AS (
  SELECT token,
    round(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)), 6) AS idf
  FROM dtok GROUP BY token
), scored AS (
  SELECT tf.doc_id, tf.token, tf.tf,
    round(CAST(tf.tf AS DOUBLE) * idf.idf, 6) AS score
  FROM tf JOIN idf USING (token)
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, CAST(tf AS BIGINT) AS tf, score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, token ASC
  ) AS rank FROM scored
) WHERE rank <= 3
""",
)
def tfidf_top_terms(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curate.tfidf_top_terms(d, "doc_id", "text", k=3)


@query(
    "chunk_documents",
    section="LLM-curation sliding-window chunking (token-bounded, map-only "
    "sequence preparation)",
    oracle=f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
starts AS (
  SELECT doc_id, t, s FROM (
    SELECT doc_id, t, unnest(range(0, len(t), 24)) AS s
    FROM tok WHERE len(t) > 0
  ) WHERE s = 0 OR s + 8 < len(t)
), ch AS (
  SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_idx,
    list_slice(t, s + 1, s + 32) AS chunk
  FROM starts
)
SELECT doc_id, chunk_idx,
  CAST(len(chunk) AS BIGINT) AS n_tokens,
  array_to_string(chunk, ' ') AS chunk_text
FROM ch
""",
)
def chunk_documents(spark, sf_dir):
    d = table(spark, sf_dir, "documents")
    return curate.chunk_documents(d, "doc_id", "text", max_tokens=32, overlap=8)


# ---------------------------------------------------------------------------
# time-bucketed range join (interval predicate as a keyed join)
# ---------------------------------------------------------------------------

@query(
    "range_join_cooccurrence",
    section="scale-rangejoin time-bucketed interval join (±30s co-occurrence; "
    "keyed equi join + residual filter, never a nested loop)",
    oracle="""
SELECT a.event_id AS err_id, COUNT(*) AS n_nearby,
  COUNT(DISTINCT b.event_type) AS n_types
FROM events a
JOIN events b
  ON b.ts >= a.ts - INTERVAL 30 SECOND
 AND b.ts <= a.ts + INTERVAL 30 SECOND
 AND b.event_id <> a.event_id
WHERE a.event_type = 'error'
GROUP BY a.event_id
""",
)
def range_join_cooccurrence(spark, sf_dir):
    from furchild_spark.operators.rangejoin import bucketed_range_join

    e = table(spark, sf_dir, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"), F.col("ts").alias("err_ts")
    )
    others = e.select(
        F.col("event_id").alias("other_id"),
        F.col("ts").alias("other_ts"),
        F.col("event_type").alias("other_type"),
    )
    j = bucketed_range_join(errors, others, "err_ts", "other_ts", -30, 30)
    return (
        j.filter(F.col("err_id") != F.col("other_id"))
        .groupBy("err_id")
        .agg(
            F.count(F.lit(1)).alias("n_nearby"),
            F.countDistinct("other_type").alias("n_types"),
        )
    )


@query(
    "skewed_distinct_count",
    section="scale-skew salted two-phase EXACT countDistinct (distinct space "
    "partitioned by hash(value) % factor; hot group spread over 16 reducers)",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
FROM events GROUP BY event_type
""",
)
def skewed_distinct_count(spark, sf_dir):
    e = table(spark, sf_dir, "events")
    return skew.salted_distinct_count(e, "event_type", "user_id", salt_factor=16)


# ---------------------------------------------------------------------------
# the full curation pipeline, composed end-to-end
# ---------------------------------------------------------------------------

_Q_T1, _Q_T2 = curate.split_thresholds(0.8, 0.1)
_STOP_RE = r"\b(the|a|of|and|to|in|is|it)\b"


@query(
    "curation_pipeline",
    section="LLM-curation END-TO-END composition: MinHash near-dup pairs → "
    "CC clusters → canonical survivor → quality gate → deterministic split",
    oracle=_MINHASH_CTES.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + f"""
, verified AS (
  SELECT id_a, id_b FROM (
    SELECT i.id_a, i.id_b,
      CAST(i.n_inter AS DOUBLE) / CAST(za.sz + zb.sz - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.id_a
    JOIN sizes zb ON zb.doc_id = i.id_b
  ) WHERE jaccard >= 0.3
),
nodes AS (
  SELECT id_a AS node FROM verified UNION SELECT id_b FROM verified
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION SELECT id_b, id_a FROM verified
),
reach(src, dst) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN sym e ON r.dst = e.src
),
cl AS (SELECT src AS node, MIN(dst) AS cluster_id FROM reach GROUP BY src),
stats AS (
  SELECT doc_id,
    len({_TOKS}) AS n_tokens,
    (len({_TOKS}) BETWEEN 5 AND 10000
     AND CAST(len(regexp_extract_all({_NORM}, '{_STOP_RE}')) AS DOUBLE)
         / CAST(len({_TOKS}) AS DOUBLE) < 0.5) AS is_q
  FROM documents
)
SELECT s.doc_id, CAST(s.n_tokens AS BIGINT) AS n_tokens,
  CASE WHEN md5(CAST(s.doc_id AS VARCHAR)) < '{_Q_T1}' THEN 'train'
       WHEN md5(CAST(s.doc_id AS VARCHAR)) < '{_Q_T2}' THEN 'val'
       ELSE 'test' END AS split
FROM stats s LEFT JOIN cl ON s.doc_id = cl.node
WHERE (cl.cluster_id IS NULL OR s.doc_id = cl.cluster_id) AND s.is_q
""",
)
def curation_pipeline(spark, sf_dir):
    """What a real training-data run executes as ONE composed plan:
    banded MinHash candidates → exact-Jaccard verify → connected
    components → keep each cluster's min-id representative (plus all
    singletons) → Gopher-style quality gate → deterministic md5 split.
    Catalyst sees the whole composition, so the quality-gate projection
    and the final split stay fused with the scan while only the dedup
    legs shuffle. The oracle recomputes every stage relationally —
    pipeline-level parity, not per-operator."""
    from furchild_spark.operators import text

    d = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        d, "doc_id", "text", num_perm=16, rows_per_band=4, shingle_k=3,
        threshold=0.3, hash_fn="md5",
    ).select("id_a", "id_b")
    clusters = curate.connected_components(pairs, checkpoint_interval=2)
    stats = text.with_text_stats(d, "text").select(
        "doc_id", "n_tokens", "is_quality"
    )
    surv = (
        stats.join(clusters, stats.doc_id == clusters.node, "left")
        .filter(
            (F.col("cluster_id").isNull()
             | (F.col("doc_id") == F.col("cluster_id")))
            & F.col("is_quality")
        )
        .select("doc_id", F.col("n_tokens").cast("long"))
    )
    return curate.hash_split(surv, "doc_id", 0.8, 0.1).select(
        "doc_id", "n_tokens", "split"
    )


# ---------------------------------------------------------------------------
# blocked fuzzy string matching (entity resolution)
# ---------------------------------------------------------------------------

@query(
    "fuzzy_match_names",
    section="§2 entity resolution (engine extra): blocked levenshtein "
    "self-join over a deduplicated vocabulary",
    oracle="""
WITH names AS (SELECT DISTINCT p_name FROM part)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
FROM names a
JOIN names b
  ON substr(a.p_name, 1, 1) = substr(b.p_name, 1, 1)
 AND a.p_name < b.p_name
WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 3
""",
)
def fuzzy_match_names(spark, sf_dir):
    """Entity-resolution candidate matching: near-identical names within
    edit distance 3.  The scale discipline is the same as every dedup
    operator here — never pair raw rows:

    1. **Dedupe first**: the self-join runs over the DISTINCT name
       vocabulary (bounded by the name grammar, not the fact-table row
       count — 64 vs 2000 rows even at sf0.01).
    2. **Block on (first char, EXACT length)**: first-character blocking
       alone is quadratic in the hottest letter over an open vocabulary
       (millions of names → billions of within-block pairs).  Composing
       the exact length into the equi key splits every letter block by
       length; one side replicates across its ±2 admissible window
       (sequence+explode, a fixed ×5 — the length-difference filter is a
       hard lower bound on edit distance, so recall vs the plain
       first-char block is UNCHANGED and each qualifying pair matches on
       exactly one key).  Measured on a hot-letter vocabulary
       (tools/skew_bench.py --fuzzy): 8.8× faster at 20k names (3.6 s vs
       32.0 s) and the gap widens quadratically — blocked time tracks
       the true pair count while first-char-only tracks k².  The
       remaining trade is the standard one:
       a pair differing in its first character is missed by design.  If
       a block is still hot (many same-length names under one letter),
       the escalation path is Ed-Join positional q-gram prefixes — not
       needed at any tested scale.
    3. **Bounded levenshtein**: the threshold form short-circuits the
       O(len²) DP once the running distance exceeds 3, so per-pair cost
       is O(k·len) not O(len²).  Returns -1 above the bound → the dist
       filter becomes `>= 0`.  Semantics identical to the oracle's
       unbounded `levenshtein() <= 3` (native in DuckDB), asserted by
       the hash compare.
    """
    names = table(spark, sf_dir, "part").select("p_name").distinct()
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
    dist = F.levenshtein("name_a", "name_b", 3).cast("bigint")
    return (
        a.join(b, ["blk_char", "blk_len"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", dist)
        .filter(F.col("dist") >= 0)
        .select("name_a", "name_b", "dist")
    )


# ---------------------------------------------------------------------------
# exact-parity statistical moments (stddev / correlation without stddev())
# ---------------------------------------------------------------------------

@query(
    "stats_moments",
    section="§2.5 second-order statistics with exact cross-engine parity "
    "(engine extra): stddev and correlation from decimal moment sums, "
    "never the built-in floating aggregates",
    oracle="""
WITH m AS (
  SELECT c_mktsegment,
    COUNT(*) AS n,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(c_acctbal   AS DECIMAL(18,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
           * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))
           * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS syy,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
           * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sxy
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
)
SELECT c_mktsegment, n,
  sx / CAST(n AS DOUBLE) AS mean_price,
  ROUND(sqrt((sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 4)
    AS stddev_pop_price,
  ROUND((sxy - sx * sy / CAST(n AS DOUBLE))
    / (sqrt(sxx - sx * sx / CAST(n AS DOUBLE))
       * sqrt(syy - sy * sy / CAST(n AS DOUBLE))), 9) AS corr_price_bal
FROM m
""",
)
def stats_moments(spark, sf_dir):
    """The built-in floating aggregates (stddev, corr, covar) sum doubles
    in partition order, so their last few bits differ between engines and
    even between runs — useless under a hash-parity gate and genuinely
    non-reproducible at scale. This entry shows the reproducible form:
    accumulate the five moment sums (Σx, Σy, Σx², Σy², Σxy) as EXACT
    decimals in one map-side-combined pass, cast once to double, and
    evaluate the textbook formulas in a fixed expression order — each
    step IEEE-deterministic, so both engines produce bit-identical
    statistics. One shuffle on the segment key; the moment pass costs the
    same as a plain SUM."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    price = money("o_totalprice")
    bal = money("c_acctbal")
    m = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(price).cast("double").alias("sx"),
            F.sum(bal).cast("double").alias("sy"),
            F.sum(price * price).cast("double").alias("sxx"),
            F.sum(bal * bal).cast("double").alias("syy"),
            F.sum(price * bal).cast("double").alias("sxy"),
        )
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    # The second moments' decimal sums exceed 2^53 in integer form, and
    # THERE the engines' decimal->double casts differ by one ulp (Spark
    # correctly rounds the BigDecimal; DuckDB divides an int128 cast by
    # 10^scale — two roundings). Derived statistics are therefore rounded
    # below that noise floor (stddev to 1e-4 absolute, corr to 1e-9);
    # the mean uses only the scale-2 first moment, whose integer form
    # fits in 2^53, so its cast is exact on both engines and it ships
    # unrounded.
    return m.select(
        "c_mktsegment", "n",
        (sx / n).alias("mean_price"),
        F.round(F.sqrt((sxx - sx * sx / n) / n), 4).alias("stddev_pop_price"),
        F.round(
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            9,
        ).alias("corr_price_bal"),
    )


# ---------------------------------------------------------------------------
# temperature-scaled mixture resampling (training-mix rebalancing)
# ---------------------------------------------------------------------------

@query(
    "temperature_resample",
    section="§2 training-mix rebalancing (engine extra): temperature-"
    "scaled source downsampling with deterministic md5 membership",
    oracle="""
WITH tok AS (
  SELECT source,
    COUNT(*) AS n_docs,
    SUM(CAST(len(string_split(lower(trim(text)), ' ')) AS BIGINT))
      AS n_tokens
  FROM documents GROUP BY source
), rates AS (
  SELECT source, n_docs, n_tokens,
    sqrt(CAST((SELECT MIN(n_tokens) FROM tok) AS DOUBLE)
         / CAST(n_tokens AS DOUBLE)) AS rate
  FROM tok
), thresholds AS (
  SELECT source, n_docs, rate,
    lower(lpad(hex(CAST(floor(rate * 1152921504606846976.0) AS BIGINT)),
               15, '0')) AS thresh
  FROM rates
)
SELECT d.source, t.n_docs,
  COUNT(*) FILTER (
    WHERE t.rate >= 1.0
       OR lower(substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) < t.thresh
  ) AS n_kept,
  t.rate
FROM documents d JOIN thresholds t ON d.source = t.source
GROUP BY d.source, t.n_docs, t.rate
""",
)
def temperature_resample(spark, sf_dir):
    """Rebalance a training mixture toward flat (temperature T=2): each
    source keeps ``rate = sqrt(min_tokens / its_tokens)`` of its
    documents, so token-heavy sources are downsampled hardest and the
    smallest source keeps everything — the LLaMA/Pile-style mix
    flattening, T fixed at 2 so the scaling is a bare ``sqrt`` (IEEE
    correctly-rounded on both engines; an arbitrary ``pow`` is not).

    Determinism chain, engine-independent end-to-end: exact integer
    token sums → one double divide + sqrt (both correctly rounded) →
    ``floor(rate·2^60)`` → fixed-width hex threshold → md5-prefix
    membership. No RNG anywhere: a document's keep/drop never changes
    when OTHER sources grow, and replays are byte-stable.

    Scale: per-source stats are config-scale (a mixture has dozens of
    sources, like a dimension table), so the rate table broadcasts; the
    corpus is touched twice map-only (token count, membership) with one
    tiny-key shuffle each."""
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower(F.trim(F.col("text"))), " ")).cast("long")
    tok = (
        d.select("source", n_tokens.alias("n_tokens"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("n_tokens"))
    )
    min_tok = tok.agg(F.min("n_tokens").alias("min_tokens"))
    rates = (
        tok.crossJoin(F.broadcast(min_tok))
        .withColumn(
            "rate",
            F.sqrt(
                F.col("min_tokens").cast("double")
                / F.col("n_tokens").cast("double")
            ),
        )
        .withColumn(
            "thresh",
            F.lower(
                F.lpad(
                    F.hex(
                        F.floor(F.col("rate") * F.lit(1152921504606846976.0))
                        .cast("bigint")
                    ),
                    15, "0",
                )
            ),
        )
        .select("source", "n_docs", "rate", "thresh")
    )
    # rate >= 1 must keep EVERYTHING: floor(1.0·2^60) is 16 hex digits,
    # which the 15-digit threshold cannot express (lpad would truncate it
    # to 2^56 and silently keep ~1/16 of the smallest source — found by
    # review, confirmed on testdata). The explicit rate guard keeps the
    # threshold math in the strict-subunity domain where it is exact.
    kept = (F.col("rate") >= 1.0) | (
        F.lower(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15))
        < F.col("thresh")
    )
    return (
        d.join(F.broadcast(rates), "source")
        .groupBy("source", "n_docs", "rate")
        .agg(F.count(F.when(kept, 1)).alias("n_kept"))
        .select("source", "n_docs", "n_kept", "rate")
    )


# ---------------------------------------------------------------------------
# DSIR importance-resampling selection (paper: arXiv:2302.03169)
# ---------------------------------------------------------------------------

@query(
    "dsir_select",
    section="LLM-curation DSIR domain selection (hashed n-gram importance "
    "log-ratios, deterministic top-k; public paper arXiv:2302.03169, no "
    "reference counterpart)",
    oracle=f"""
WITH tok AS (SELECT doc_id, source, {_TOKS} AS t FROM documents),
feat AS (
  SELECT doc_id, source, unnest(
    list_concat(t,
      list_transform(range(1, CASE WHEN len(t) >= 2 THEN len(t) ELSE 1 END),
                     i -> t[i] || ' ' || t[i+1]))) AS feat
  FROM tok
),
fb AS (SELECT doc_id, source, substr(md5(feat), 1, 2) AS bucket FROM feat),
bc AS (
  SELECT bucket,
    SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) + 1 AS cp,
    SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) + 1 AS cq
  FROM fb GROUP BY bucket
),
tot AS (SELECT SUM(cp) AS tp, SUM(cq) AS tq FROM bc),
lr AS (
  SELECT bucket,
    round(ln(CAST(cp * tq AS DOUBLE) / CAST(cq * tp AS DOUBLE)), 6) AS logratio
  FROM bc CROSS JOIN tot
),
w AS (
  SELECT fb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
    CAST(SUM(CAST(logratio AS DECIMAL(18,6))) AS DOUBLE) AS logw
  FROM fb JOIN lr USING (bucket)
  WHERE fb.source <> 'src0'
  GROUP BY fb.doc_id
)
SELECT doc_id, n_feats, logw FROM w ORDER BY logw DESC, doc_id ASC LIMIT 50
""",
)
def dsir_select(spark, sf_dir):
    """DSIR selection (operators/curate.dsir_select): target = the
    'src0' domain, raw = every other source; the 50 raw docs whose
    hashed unigram∪bigram profile is most target-like win. ONE feature
    explode feeds a 256-group aggregate (map-side combined, vocabulary-
    free by construction); the log-ratio table broadcasts back onto the
    raw feature rows; selection is orderBy+limit → TakeOrderedAndProject
    (never a SinglePartition window). The oracle rebuilds buckets,
    smoothing, totals, and the top-k relationally."""
    d = table(spark, sf_dir, "documents")
    return curate.dsir_select(
        d, "doc_id", "text", is_target=F.col("source") == "src0", k=50
    )


# ---------------------------------------------------------------------------
# trained quality classifier (GPT-3-style NB log-odds, hashing trick)
# ---------------------------------------------------------------------------

@query(
    "quality_classifier",
    section="LLM-curation trained quality classifier — the GPT-3 corpus "
    "filter (arXiv:2005.14165 App. A): Naive Bayes log-odds over hash-"
    "bucketed tokens (fastText hashing trick), trained on curated-vs-"
    "crawl weak labels, scoring the unlabeled pool; no reference "
    "counterpart",
    oracle=f"""
WITH tok AS (SELECT doc_id, source, unnest({_TOKS}) AS t FROM documents),
fb AS (SELECT doc_id, source, substr(md5(t), 1, 3) AS b FROM tok),
cnt AS (
  SELECT b,
    SUM(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END) AS cp,
    SUM(CASE WHEN source IN ('src2', 'src3') THEN 1 ELSE 0 END) AS cq
  FROM fb WHERE source IN ('src0', 'src1', 'src2', 'src3') GROUP BY b
),
tot AS (SELECT SUM(cp) AS tp, SUM(cq) AS tq FROM cnt),
w AS (
  SELECT b,
    round(ln(CAST((cp + 1) * (tq + 4096) AS DOUBLE)
             / CAST((cq + 1) * (tp + 4096) AS DOUBLE)), 6) AS w
  FROM cnt CROSS JOIN tot
),
wdef AS (
  SELECT round(ln(CAST(tq + 4096 AS DOUBLE)
                  / CAST(tp + 4096 AS DOUBLE)), 6) AS wd FROM tot
),
pri AS (
  SELECT round(ln(
    CAST(SUM(CASE WHEN source IN ('src0', 'src1') THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(SUM(CASE WHEN source IN ('src2', 'src3') THEN 1 ELSE 0 END) AS DOUBLE)
  ), 6) AS prior FROM documents
),
sc AS (
  SELECT fb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_toks,
    SUM(CAST(COALESCE(w.w, (SELECT wd FROM wdef)) AS DECIMAL(18,6))) AS s
  FROM fb LEFT JOIN w USING (b) GROUP BY fb.doc_id
)
SELECT d.doc_id, COALESCE(sc.n_toks, 0) AS n_toks,
  CAST(COALESCE(sc.s, CAST(0 AS DECIMAL(18,6)))
       + CAST((SELECT prior FROM pri) AS DECIMAL(18,6)) AS DOUBLE) AS score
FROM documents d LEFT JOIN sc USING (doc_id)
WHERE d.source NOT IN ('src0', 'src1', 'src2', 'src3')
ORDER BY score DESC, d.doc_id ASC LIMIT 50
""",
)
def quality_classifier(spark, sf_dir):
    """Trained quality filter (operators/curate.nb_quality_score): the
    GPT-3 recipe — treat src0/src1 as the curated reference corpus
    (WebText's role), src2/src3 as the raw-crawl negative sample, train
    NB log-odds over 4096 hash buckets, then score the 16 unlabeled
    sources and keep the 50 most reference-like documents. Training is
    one bounded 4096-group aggregate; scoring is a broadcast join; the
    top-k is orderBy+limit -> TakeOrderedAndProject. The oracle rebuilds
    buckets, smoothing, the unseen-bucket fallback, the doc-count
    prior, and the top-k relationally."""
    d = table(spark, sf_dir, "documents")
    pos = F.col("source").isin("src0", "src1")
    neg = F.col("source").isin("src2", "src3")
    scored = curate.nb_quality_score(
        d, "doc_id", "text", is_positive=pos, is_negative=neg
    )
    pool = d.filter(~pos & ~neg).select("doc_id")
    return (
        scored.join(pool, on="doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# leakage-safe (group-aware) split
# ---------------------------------------------------------------------------

@query(
    "leakage_safe_split",
    section="LLM-curation leakage-safe split: near-duplicates co-locate "
    "in ONE split (group split over MinHash near-dup connected "
    "components — Lee et al. 2022 arXiv:2107.06499 §6.2 measured "
    "train->val leakage through near-dups); all docs survive, the "
    "guarantee is co-location, not removal",
    oracle=_MINHASH_CTES.replace("WITH tok", "WITH RECURSIVE tok", 1)
    + f"""
, verified AS (
  SELECT id_a, id_b FROM (
    SELECT i.id_a, i.id_b,
      CAST(i.n_inter AS DOUBLE) / CAST(za.sz + zb.sz - i.n_inter AS DOUBLE) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.id_a
    JOIN sizes zb ON zb.doc_id = i.id_b
  ) WHERE jaccard >= 0.3
),
nodes AS (
  SELECT id_a AS node FROM verified UNION SELECT id_b FROM verified
),
sym AS (
  SELECT id_a AS src, id_b AS dst FROM verified
  UNION SELECT id_b, id_a FROM verified
),
reach(src, dst) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT r.src, e.dst FROM reach r JOIN sym e ON r.dst = e.src
),
cl AS (SELECT src AS node, MIN(dst) AS cluster_id FROM reach GROUP BY src)
SELECT d.doc_id,
  COALESCE(cl.cluster_id, d.doc_id) AS group_id,
  CASE WHEN md5(CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)) < '{_Q_T1}'
         THEN 'train'
       WHEN md5(CAST(COALESCE(cl.cluster_id, d.doc_id) AS VARCHAR)) < '{_Q_T2}'
         THEN 'val'
       ELSE 'test' END AS split
FROM documents d LEFT JOIN cl ON d.doc_id = cl.node
""",
)
def leakage_safe_split(spark, sf_dir):
    """Group split (operators/curate.leakage_safe_split): banded MinHash
    candidates -> exact-Jaccard verify -> connected components -> every
    doc keyed by its cluster min-id (singletons by themselves) -> md5
    threshold split ON THE GROUP KEY, so a near-dup pair can never
    straddle train/eval. One row per document. The oracle replays the
    full chain (recursive-CTE CC) and the group-keyed CASE split."""
    d = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(
        d, "doc_id", "text", num_perm=16, rows_per_band=4, shingle_k=3,
        threshold=0.3, hash_fn="md5",
    ).select("id_a", "id_b")
    return curate.leakage_safe_split(d, pairs, "doc_id", 0.8, 0.1)
