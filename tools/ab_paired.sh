#!/usr/bin/env bash
# Paired-A/B grown-scale benchmark protocol (promoted from round-10
# session lore; see BASELINE.md "Paired-A/B protocol").
#
# This host's wall-clock drifts up to 2.2x across sessions for the
# SAME code, so cross-session single-rep numbers cannot support a
# perf claim. The only comparison that survives the drift: build the
# baseline ref in a worktree, ALTERNATE baseline/current probe runs
# back-to-back in one session, and compare per-query MINIMA.
#
# Usage:
#   tools/ab_paired.sh <baseline-ref> <sf-dir> <names-csv> [reps] [out.jsonl]
# e.g.
#   tools/ab_paired.sh a9d6c75 /tmp/grow_sf10 gr_triangle_count 2 \
#     probes/round11_ab.jsonl
#
# Each rep runs graft.ProbeMain (one JVM, all names once) in the
# baseline worktree then in the current repo, appending rows like
#   {"side":"base","sha":"...","rep":1,"probe":"...","sec":12.3,...}
# Verdict basis: min(sec) per (side, probe) over all reps.
#
# LIFETIME CAVEAT (round-11 lesson): if the invoking harness caps the
# script's wall time, the in-flight JVM gets SIGTERM'd and the probe
# emits error rows containing "SparkContext was shut down" — that is
# an EXTERNAL kill, not a query failure. For long query sets, invoke
# this script once per rep (REPS=1, same OUT file — rows append) so
# every invocation fits the cap; the summary below recomputes minima
# over everything accumulated in OUT.
set -euo pipefail

REF=${1:?baseline ref}
SFDIR=${2:?sf dir}
NAMES=${3:?query names csv}
REPS=${4:-2}
OUT=${5:-probes/ab_paired_$(date +%Y%m%d_%H%M%S).jsonl}

cd "$(git rev-parse --show-toplevel)"
BASE_SHA=$(git rev-parse "$REF")
CUR_SHA=$(git rev-parse HEAD)
WT=/tmp/ab_${BASE_SHA:0:10}

if [ ! -d "$WT" ]; then
  git worktree add --detach "$WT" "$BASE_SHA"
fi
# ProbeMain depends only on QueryCatalog (stable since round 3) —
# copy it in so baselines that predate it still expose the same probe
# surface with loud name resolution.
mkdir -p "$WT/src/test/scala/graft"
cp src/test/scala/graft/ProbeMain.scala "$WT/src/test/scala/graft/ProbeMain.scala"

echo "[ab] compiling baseline $BASE_SHA in $WT ..." >&2
(cd "$WT" && sbt -batch "Test/compile" >/dev/null)
echo "[ab] compiling current $CUR_SHA ..." >&2
sbt -batch "Test/compile" >/dev/null

probe() { # $1=dir $2=side $3=sha $4=rep
  # `|| true` on the pipeline: under set -euo pipefail, an sbt run
  # that emits zero probe rows (OOM, harness SIGTERM before the first
  # row) would otherwise abort the WHOLE script mid-rep — discarding
  # the reps already accumulated in $OUT and the summary over them.
  local rows
  rows=$( (cd "$1" && SPARK_GRAFT_PROBE_NAMES="$NAMES" SPARK_GRAFT_SF_DIRS="$SFDIR" \
    sbt -batch "Test/runMain graft.ProbeMain" 2>/dev/null) \
    | grep '^{"probe"' || true)
  if [ -z "$rows" ]; then
    echo "[ab] WARNING: $2 rep $4 produced no probe rows (sbt failed or was killed)" >&2
  else
    printf '%s\n' "$rows" \
      | sed "s/^{/{\"side\":\"$2\",\"sha\":\"$3\",\"rep\":$4,/" >> "$OUT"
  fi
}

mkdir -p "$(dirname "$OUT")"
for rep in $(seq 1 "$REPS"); do
  echo "[ab] rep $rep/$REPS: baseline ..." >&2
  probe "$WT" base "$BASE_SHA" "$rep"
  echo "[ab] rep $rep/$REPS: current ..." >&2
  probe . cur "$CUR_SHA" "$rep"
done

echo "[ab] wrote $OUT" >&2
python3 - "$OUT" <<'EOF'
import json, sys, collections
rows = [json.loads(l) for l in open(sys.argv[1]) if l.strip()]
best = collections.defaultdict(dict)
for r in rows:
    if "sec" not in r: print("ERROR row:", r); continue
    d = best[r["probe"]]
    d[r["side"]] = min(d.get(r["side"], float("inf")), r["sec"])
print(f"{'probe':32s} {'base_min':>9s} {'cur_min':>9s} {'ratio':>6s}")
for p, d in sorted(best.items()):
    b, c = d.get("base"), d.get("cur")
    if b is None or c is None:
        print(f"{p:32s} MISSING side: base={b} cur={c}")
    else:
        ratio = f"{c/b:6.2f}" if b > 0 else "   inf"
        print(f"{p:32s} {b:9.2f} {c:9.2f} {ratio}")
EOF
