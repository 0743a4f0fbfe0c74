#!/bin/bash
# Snapshot a committed BENCH_FULL.json as the immutable cross-round bench
# baseline BENCH_BASELINE_r<N>.json, with identity fields injected so the
# consumer (Bench.resolvePrev) can name the boundary it chained against.
#
# Why this exists: the BENCH_FULL.json convention path is overwritten by
# every bench run, so "whatever sits there" drifted into an intra-round
# snapshot two driver rounds running (r14/r15 verdicts, task 1). A
# baseline file is written ONCE at round close from a named commit and
# never rewritten — Bench prefers the newest BENCH_BASELINE_r*.json over
# the convention path.
#
# Usage: tools/snapshot_baseline.sh <round> [git-ref]   (ref default HEAD)
set -euo pipefail
round=$1
ref=${2:-HEAD}
sha=$(git rev-parse --short "$ref")
out="BENCH_BASELINE_r${round}.json"
if [ -e "$out" ]; then
  echo "$out already exists — baselines are immutable; pick the next round" >&2
  exit 1
fi
git show "$ref:BENCH_FULL.json" \
  | sed "s/^{/{\"baseline_round\":${round},\"baseline_git\":\"${sha}\",/" > "$out"
python3 -c "import json,sys; d=json.load(open('$out')); \
print('wrote $out from $ref ($sha): sf', d['sf'], 'total', d['value'], \
'queries', len(d['queries']))"
