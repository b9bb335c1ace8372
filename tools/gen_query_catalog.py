"""Regenerate docs/QUERIES.md — the index of every queries() entry.

Run:  python tools/gen_query_catalog.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graph_db_clustering_spark.queries.corpus import ORACLE, QUERIES  # noqa: E402


def main() -> None:
    lines = [
        "# Query catalog",
        "",
        "Auto-generated index of every `queries()` entry "
        f"({len(QUERIES)} total, {len(ORACLE)} DuckDB-oracle-checked).",
        "Regenerate with `python tools/gen_query_catalog.py`.",
        "",
        "| Entry | Oracle | Summary |",
        "| --- | --- | --- |",
    ]
    for name in sorted(QUERIES):
        doc = (QUERIES[name].__doc__ or "").strip().splitlines()
        first = " ".join(ln.strip() for ln in doc[:2]).strip() if doc else ""
        if len(first) > 110:
            first = first[:107] + "..."
        first = first.replace("|", "\\|")
        kind = "sql" if name in ORACLE else "rows"
        lines.append(f"| `{name}` | {kind} | {first} |")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "QUERIES.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(QUERIES)} entries")


if __name__ == "__main__":
    main()
