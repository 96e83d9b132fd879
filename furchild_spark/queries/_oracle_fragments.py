"""Shared DuckDB oracle SQL fragments used by several catalog modules.

Lives in its own module (no ``@query`` registrations) so that importing it
never perturbs catalog registration order — the driver executes entries in
registration order, and ``queries/__init__.py`` sequences the module
imports deliberately.
"""

# The canonical normalization, as DuckDB SQL (mirror of text.normalize_text)
_NORM = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
_TOKS = f"list_filter(string_split({_NORM}, ' '), x -> x <> '')"

# MinHash signature → banded candidate-pair CTE chain (mirror of
# operators.dedup.minhash_near_duplicates with md5 hashing, 16 perms,
# 4 rows per band, 3-token shingles).
_MINHASH_CTES = f"""
WITH tok AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh0 AS (
  SELECT doc_id,
    unnest(list_transform(range(1, CASE WHEN len(t) >= 3 THEN len(t) - 1 ELSE 1 END),
                          i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
  FROM tok
),
sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
perms AS (SELECT unnest(range(0, 16)) AS p),
mh AS (
  SELECT doc_id, p, MIN(md5(CAST(p AS VARCHAR) || ':' || shingle)) AS minhash
  FROM sh CROSS JOIN perms GROUP BY doc_id, p
),
bands AS (
  SELECT doc_id, CAST(p // 4 AS INT) AS band,
         md5(string_agg(minhash, ',' ORDER BY p)) AS band_sig
  FROM mh GROUP BY doc_id, CAST(p // 4 AS INT)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.band_sig = b.band_sig
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.id_a, c.id_b, COUNT(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
)
"""
