#!/usr/bin/env python3
"""Regenerate bench/medians.json from BENCH_HISTORY.md.

For each per-query row of the history table, takes the median of the
LAST up-to-6 non-empty cells (recent rounds reflect the current
implementation of each query; older cells may predate a rework).
Bench.main loads this file to decide which queries deserve a per-query
load annotation: a cell slower than 3x its median gets its own
/proc busy/steal/load1 row in bench_summary (VERDICT r14 item 6 — the
25-query load windows could not pin a single slow cell inside a quiet
window).

Run after appending a round column to BENCH_HISTORY.md:
    python3 scripts/gen_medians.py
"""
import json
import re
import statistics
from pathlib import Path

root = Path(__file__).resolve().parent.parent
rows = {}
for line in (root / "BENCH_HISTORY.md").read_text().splitlines():
    if not line.startswith("| q"):
        continue
    cells = [c.strip() for c in line.strip().strip("|").split("|")]
    name = cells[0]
    if name.startswith("**"):
        continue
    vals = []
    for c in cells[1:]:
        c = c.replace("**", "").strip()
        if re.fullmatch(r"[0-9]+(\.[0-9]+)?", c):
            vals.append(float(c))
    if vals:
        rows[name] = round(statistics.median(vals[-6:]), 3)

out = root / "bench" / "medians.json"
out.write_text(json.dumps(rows, indent=0, sort_keys=True) + "\n")
print(f"wrote {out}: {len(rows)} medians")
