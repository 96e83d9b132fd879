"""Generate CATALOG.md: one row per driver-facing catalog entry, grouped
by section, with the SURVEY.md §2 tags and oracle status. Run after
adding entries; the file is committed so reviewers can navigate the
catalog without importing the package.

Usage: python tools/gen_catalog_doc.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from furchild_spark.queries import QUERIES  # noqa: E402


def main() -> None:
    lines = [
        "# Catalog",
        "",
        f"{len(QUERIES)} driver-facing entries. Every entry pairs a Spark "
        "DataFrame query with a full DuckDB oracle; the driver hash-compares "
        "rows, schema, and values at sf0.01 (`CORRECTNESS_r{N}.json`), and "
        "`tools/check_correctness.py` replicates the gate locally at any sf.",
        "",
        "Registration order = driver execution order (never-driver-checked "
        "entries first; see `furchild_spark/queries/__init__.py`).",
        "",
        "| # | entry | section (SURVEY §2 tag / capability) | oracle |",
        "|---|---|---|---|",
    ]
    for i, (name, q) in enumerate(QUERIES.items(), 1):
        oracle = "full" if q.oracle else "rows-only"
        section = (q.section or "").replace("|", "\\|")
        star = " ★" if q.headline else ""
        lines.append(f"| {i} | `{name}`{star} | {section} | {oracle} |")
    lines += [
        "",
        "★ = headline entry (appears in bench.py's compact driver line).",
        "",
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CATALOG.md",
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}: {len(QUERIES)} entries")


if __name__ == "__main__":
    main()
