#!/usr/bin/env python3
"""Diff N query-dump directories produced by graft.Verify /
graft.DeterminismSweep (dev-box tooling; python3 + duckdb are the
driver-side stack, not library dependencies).

Each dump dir holds one parquet dir per query plus a _manifest.json of
the queries the dump INTENDED to run. Query names are the union of all
manifests and all result dirs — so a query that failed to dump in one
pass, or threw in EVERY pass and left no result dir anywhere (the
Verify loop catches per-query failures), surfaces as a divergence
instead of silently shrinking the compared surface. For every name,
all dumps are loaded, columns sorted by name, rows sorted by all
columns, values compared as strings (the driver's hash convention).
Exit 1 on any divergence or missing query.
"""
import sys, os, glob, json
import duckdb

dirs = sys.argv[1:]
assert len(dirs) >= 2, "need at least two dump dirs"
con = duckdb.connect()

def load(d, name):
    return con.execute(
        f"SELECT * FROM read_parquet('{os.path.join(d, name)}/*.parquet')").df()

names = {
    os.path.basename(p)
    for d in dirs for p in glob.glob(os.path.join(d, "*"))
    if os.path.isdir(p)}
for d in dirs:
    m = os.path.join(d, "_manifest.json")
    if os.path.exists(m):
        names |= set(json.load(open(m)))
names = sorted(names)
assert names, f"no query dumps under any of {dirs}"
bad = []
for name in names:
    frames = []
    for d in dirs:
        if not os.path.isdir(os.path.join(d, name)):
            bad.append((name, f"missing in {d}"))
            break
        df = load(d, name)
        df = df.reindex(sorted(df.columns), axis=1)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        frames.append(df.astype(str))
    else:
        for i, f in enumerate(frames[1:], start=1):
            if list(f.columns) != list(frames[0].columns):
                bad.append((name, f"schema differs in {dirs[i]}"))
            elif len(f) != len(frames[0]):
                bad.append((name, f"rowcount {len(frames[0])} vs {len(f)} in {dirs[i]}"))
            elif not f.equals(frames[0]):
                bad.append((name, f"values differ in {dirs[i]}"))
print(f"[determinism] {len(names)} queries x {len(dirs)} dumps compared")
if bad:
    for name, why in bad:
        print(f"[determinism] DIVERGENT {name}: {why}")
    sys.exit(1)
print("[determinism] all dumps identical")
