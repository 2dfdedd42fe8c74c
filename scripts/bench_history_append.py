#!/usr/bin/env python3
"""Append one round's quiet close-run bench column to BENCH_HISTORY.md.

Usage: scripts/bench_history_append.py <bench_summary.json> <colname>

Reads the Bench main's file artifact (the object written to
target/bench_summary.json, committed under bench/ per the r13 policy),
appends `| <sec> |` to every existing table row (empty cell when the
query is absent from the artifact), extends the header/separator, and
adds new rows at the bottom for queries the table has never seen.
Idempotence guard: refuses if the header already contains the column.
"""
import json
import re
import sys

HIST = "BENCH_HISTORY.md"


def main() -> None:
    artifact, col = sys.argv[1], sys.argv[2]
    with open(artifact) as f:
        queries = json.load(f)["queries"]
    lines = open(HIST).read().split("\n")
    out = []
    seen = set()
    header_i = None
    last_row_i = None
    for i, ln in enumerate(lines):
        if ln.startswith("| query |"):
            header_i = i
            if f"| {col} |" in ln or ln.rstrip().endswith(f"| {col} |"):
                sys.exit(f"column {col} already present")
            out.append(ln.rstrip() + f" {col} |")
        elif header_i is not None and i == header_i + 1 and set(ln) <= set("|- "):
            out.append(ln.rstrip() + "---|")
        elif ln.startswith("| **total** |"):
            with open(artifact) as f:
                total = json.load(f)["summary"]["total"]
            out.append(ln.rstrip() + f" **{total:.2f}** |")
        elif ln.startswith("| q"):
            name = ln.split("|")[1].strip()
            seen.add(name)
            sec = queries.get(name)
            cell = f" {sec:.2f} |" if sec is not None else "  |"
            out.append(ln.rstrip() + cell)
            last_row_i = len(out) - 1
        else:
            out.append(ln)
    if header_i is None or last_row_i is None:
        sys.exit("table not found")
    ncols = out[header_i].count("|") - 2  # columns between 'query' and end
    new_rows = [
        f"| {name} |" + "  |" * (ncols - 1) + f" {queries[name]:.2f} |"
        for name in sorted(queries)
        if name not in seen
    ]
    out[last_row_i + 1:last_row_i + 1] = new_rows
    with open(HIST, "w") as f:
        f.write("\n".join(out))
    print(f"appended column {col}: {len(seen)} cells, {len(new_rows)} new rows")


if __name__ == "__main__":
    main()
