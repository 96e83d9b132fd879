"""Generate CATALOG.md: one row per driver-facing catalog entry, grouped
by section, with the SURVEY.md §2 tags, oracle status, and per-entry
driver evidence (latest green CORRECTNESS round, or red/unproven). Run
after adding entries; the file is committed so reviewers can navigate
the catalog without importing the package.

Usage: python tools/gen_catalog_doc.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from furchild_spark.queries import QUERIES  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Entries with a known scale or portability weakness that is not yet
# closed — each maps to a one-line note rendered in its row. The round-4
# verdict's two weak components are both closed (fuzzy_match_names:
# (first char, length)-window blocking + bounded levenshtein, measured in
# tools/skew_bench.py --fuzzy; mixture_report: HUGEINT oracle column cast
# to BIGINT and the derived average rounded to 6 dp), so this map is
# empty; add entries here the moment a verdict or review flags one.
WEAK_NOTES: dict[str, str] = {}


def driver_evidence() -> dict[str, str]:
    """name -> 'green rN' / 'RED rN' / '' (never driver-checked)."""
    state: dict[str, tuple[int, bool]] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            ok = bool(
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            )
            # green always wins (latest green round shown); a red row
            # records only while the entry has never been green. Files
            # glob in round order, so rnd is monotonically increasing.
            if ok:
                state[name] = (rnd, True)
            elif name not in state or not state[name][1]:
                state[name] = (rnd, False)
    return {
        name: (f"green r{rnd}" if ok else f"RED r{rnd}")
        for name, (rnd, ok) in state.items()
    }


def main() -> None:
    evidence = driver_evidence()
    n_green = sum(1 for v in evidence.values() if v.startswith("green"))
    lines = [
        "# Catalog",
        "",
        f"{len(QUERIES)} driver-facing entries ({n_green} with a green "
        "driver row in some CORRECTNESS round). Every entry pairs a Spark "
        "DataFrame query with a full DuckDB oracle; the driver hash-compares "
        "rows, schema, and values at sf0.01 (`CORRECTNESS_r{N}.json`), and "
        "`tools/check_correctness.py` replicates the gate locally at any sf.",
        "",
        "Registration order = driver execution order, derived from the "
        "evidence files (unproven entries first, then oldest green evidence "
        "first; see `furchild_spark/queries/__init__.py`).",
        "",
        f"Known-weak entries: {len(WEAK_NOTES)}."
        + (" All prior verdict flags are closed." if not WEAK_NOTES else ""),
        "",
        "| # | entry | section (SURVEY §2 tag / capability) | oracle | driver evidence |",
        "|---|---|---|---|---|",
    ]
    for i, (name, q) in enumerate(QUERIES.items(), 1):
        oracle = "full" if q.oracle else "rows-only"
        section = (q.section or "").replace("|", "\\|")
        star = " ★" if q.headline else ""
        ev = evidence.get(name, "—")
        if name in WEAK_NOTES:
            ev += f" · WEAK: {WEAK_NOTES[name]}"
        lines.append(f"| {i} | `{name}`{star} | {section} | {oracle} | {ev} |")
    lines += [
        "",
        "★ = headline entry (appears in bench.py's compact driver line). "
        "— = not yet driver-checked (judge-verified locally; first in line "
        "for the next round's 50-entry window).",
        "",
    ]
    out = os.path.join(ROOT, "CATALOG.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out}: {len(QUERIES)} entries, {n_green} driver-green")


if __name__ == "__main__":
    main()
