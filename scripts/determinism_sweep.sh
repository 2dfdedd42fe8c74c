#!/bin/bash
# Fresh-JVM determinism sweep (CI-style; VERDICT r11 task 6).
#
# Proves the SessionCache staging/memoization layer cannot change
# results: dumps the full query surface three times — cold and
# memoization-warm inside ONE JVM, then cold again in a SECOND fresh
# JVM — and diffs every query's sorted rows across the three dumps.
# Any divergence is a P0 (a hash the driver measures would depend on
# JVM history).
#
# Usage: scripts/determinism_sweep.sh [sfDir] [outBase]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/graft_determinism}"
rm -rf "$OUT"
sbt -batch "runMain graft.DeterminismSweep $SF $OUT/jvm1"
sbt -batch "runMain graft.Verify $SF $OUT/jvm2"
python3 scripts/determinism_compare.py "$OUT/jvm1/cold" "$OUT/jvm1/warm" "$OUT/jvm2"
