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
"""

from .catalog import QUERIES, Query, query, table  # noqa: F401

# Registration order IS the driver's execution order (queries() preserves
# dict insertion). Round 2's driver run stopped after the first 50 entries,
# leaving the curation family and the models_oracle tail unchecked — so the
# previously-unchecked families register FIRST, guaranteeing them a
# CORRECTNESS row even if a future run truncates again.
from . import curation  # noqa: F401,E402
from . import models_oracle  # noqa: F401,E402
from . import streaming_e2e  # noqa: F401,E402
from . import engine_e2e  # noqa: F401,E402  # write-path proofs (S3/S6/S8)
from . import relational  # noqa: F401,E402
from . import llmops  # noqa: F401,E402
from . import analytics  # noqa: F401,E402  # engine extras — safe to truncate
