"""The driver-facing query catalog.

Every entry pairs a Spark DataFrame query with an equivalent ANSI-SQL
oracle string (DuckDB dialect) over the same parquet tables; the driver
runs both at sf0.01 and hash-compares row counts, schemas, and values
(CORRECTNESS_r{N}.json). Each entry is tagged with the SURVEY.md §2 row
it demonstrates.

Cross-engine hash-parity rules (learned the hard way, enforced throughout):

- **Never sum raw doubles** — double addition is order-sensitive and Spark
  partition order ≠ DuckDB scan order. Cast to decimal first (exact sums),
  cast the final value back to double.
- double *division* of identical operands is IEEE-deterministic → fine.
- Both engines cast double→decimal via the shortest decimal repr with
  HALF_UP ties, so per-value casts agree.
- Integer-ish outputs are cast to BIGINT on both sides (pandas int64).
- No decimal/float32 types in final schemas — only string/boolean/long/
  double/date/timestamp.
- Window orderings always carry explicit tiebreaks (and explicit NULLS
  FIRST/LAST on both sides) so rank assignment is unique.
- **Decimal→double casts are only exact-parity while the decimal's
  integer form fits in 2^53** (scale-2 money sums do; second-moment sums
  at scale 4 do not). Above that, Spark correctly rounds the BigDecimal
  while DuckDB divides an int128 cast by 10^scale — two roundings, one
  ulp apart. Either keep the comparison in decimal end-to-end
  (denominator-cleared, see tpch_q11) or round derived statistics below
  the noise floor (see stats_moments).
"""

from .catalog import QUERIES, Query, query, table  # noqa: F401

# Registration order IS the driver's execution order (queries() preserves
# dict insertion), and the driver's correctness run has historically
# truncated after ~50 entries. Import order here no longer decides the
# window: _PRIORITY below explicitly re-orders QUERIES after all modules
# have registered.
from . import curation  # noqa: F401,E402
from . import models_oracle  # noqa: F401,E402
from . import streaming_e2e  # noqa: F401,E402
from . import engine_e2e  # noqa: F401,E402  # write-path proofs (S3/S6/S8)
from . import lifecycle_e2e  # noqa: F401,E402  # full-refresh/seed/hooks/store-failures
from . import relational  # noqa: F401,E402
from . import llmops  # noqa: F401,E402
from . import analytics  # noqa: F401,E402  # engine extras
from . import txlog_e2e  # noqa: F401,E402  # transactional table format
from . import tpch  # noqa: F401,E402  # remaining TPC-H decision-support shapes
from . import timeseries  # noqa: F401,E402  # gap-fill/funnel/retention/rolling-DAU
from . import sqlapi  # noqa: F401,E402  # spark.sql front-end proofs
from . import sql_compiled  # noqa: F401,E402  # reference SQL executed as written

# Driver-window priority (round 5, now computed): the driver's
# correctness run records EXACTLY the first 50 registered entries (hard
# cap in r2/r3/r4, not a time box), so registration order decides which
# entries earn driver evidence this round. Rather than hand-repacking a
# static list every round (r4's approach — which drifted the moment
# CORRECTNESS_r04.json landed), the order is derived from the evidence
# files themselves:
#
#   1. entries with NO green driver row in any CORRECTNESS_r*.json
#      (never checked, or checked and red) — these need the hard signal;
#   2. then proven entries, OLDEST green evidence first, so stale rows
#      are re-validated against HEAD on a rolling cadence;
#   3. alphabetical within each age class, for a stable, diff-able order.
#
# A green row means rows+schema+hash all matched; a red row (e.g. r4's
# mixture_report) keeps its entry in the unproven class. If no
# CORRECTNESS files exist (fresh clone), everything ties at round 0 and
# the order is simply alphabetical. The guard test
# tests/test_plans.py::test_driver_window_ordering_is_evidence_driven
# re-derives the same ordering independently and fails on divergence.


def _last_green_round() -> "dict[str, int]":
    """name -> latest round with a fully-green driver row (absent if none)."""
    import glob as _glob
    import json as _json
    import os as _os
    import re as _re

    root = _os.path.dirname(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    )
    green: dict[str, int] = {}
    for path in sorted(_glob.glob(_os.path.join(root, "CORRECTNESS_r*.json"))):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as fh:
                rows = _json.load(fh)
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green[name] = max(green.get(name, 0), rnd)
    return green


_green = _last_green_round()
_ordered = sorted(QUERIES, key=lambda n: (_green.get(n, 0), n))
_reordered = {n: QUERIES[n] for n in _ordered}
QUERIES.clear()
QUERIES.update(_reordered)
