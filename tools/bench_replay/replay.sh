#!/usr/bin/env bash
# Paired A/B bench replay (dev harness, not part of the library API).
#
# The round-over-round BENCH_r*.json comparison is known-noisy: this host
# drifts +/-10% on IDENTICAL code across a session (measured in r14's
# 6-leg hand-built replay, committed under tools/bench_replay/r14/). The
# honest signal is a PAIRED ratio from interleaved legs of both trees on
# the same host, same session. This script codifies that 8-leg analysis
# into one command:
#
#   tools/bench_replay/replay.sh <commitA> <commitB> [legs] [sfDir] [out]
#
#   commitA/commitB  any git refs (e.g. the previous round tag and HEAD)
#   legs             total legs, even, default 8 (order ABBA BAAB ...)
#   sfDir            default /root/testdata/sf0.1
#   out              output dir, default tools/bench_replay/replay_out
#
# Each commit is checked out ONCE into its own git worktree and compiled
# once; legs then run the compiled classes directly under `java` (no sbt
# in the timed path), alternating in a balanced ABBA pattern so slow host
# drift cancels. Per-leg BENCH_DETAIL json lands in <out>/leg<N>_<tag>.json;
# pair_ratios.py then emits <out>/REPLAY.json with the paired verdict.
set -euo pipefail

A_REF=${1:?usage: replay.sh <commitA> <commitB> [legs] [sfDir] [out]}
B_REF=${2:?usage: replay.sh <commitA> <commitB> [legs] [sfDir] [out]}
LEGS=${3:-8}
SFDIR=${4:-/root/testdata/sf0.1}
OUT=${5:-tools/bench_replay/replay_out}
REPO=$(git rev-parse --show-toplevel)
WT=/tmp/graft-bench-replay
mkdir -p "$OUT" "$WT"

build() { # build <ref> <tag> -> prints classes dir
  local ref=$1 tag=$2
  local dir="$WT/$tag"
  # resolve the ref in the MAIN repo: inside a reused worktree, symbolic
  # refs like HEAD would otherwise resolve to the worktree's own previous
  # checkout (the r15 first-run footgun — leg B silently measured a stale
  # tree)
  local sha
  sha=$(git -C "$REPO" rev-parse --verify "$ref^{commit}")
  if [ ! -d "$dir" ]; then
    git -C "$REPO" worktree add --detach "$dir" "$sha" >&2
  else
    git -C "$dir" checkout --detach "$sha" >&2
  fi
  git -C "$dir" rev-parse --short HEAD | sed "s/^/$tag measures /" >&2
  (cd "$dir" && sbt -batch compile >&2)
  echo "$dir/target/scala-2.13/classes"
}

echo "building A=$A_REF" >&2
A_CP=$(build "$A_REF" A)
echo "building B=$B_REF" >&2
B_CP=$(build "$B_REF" B)

ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done

run_leg() { # run_leg <legIdx> <tag> <classesDir>
  local leg=$1 tag=$2 cp=$3
  local detail="$OUT/leg${leg}_${tag}.json"
  echo "leg $leg: $tag" >&2
  SPARK_GRAFT_SF_DIR="$SFDIR" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_BENCH_DETAIL="$detail" \
  java $ADD_OPENS -Xmx"${SPARK_DRIVER_MEM:-8g}" \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$cp:/opt/spark/jars/*" graft.Bench \
    > "$OUT/leg${leg}_${tag}.stdout" 2> "$OUT/leg${leg}_${tag}.stderr"
  tail -1 "$OUT/leg${leg}_${tag}.stdout" >&2
}

# balanced interleave: ABBA for the first half, BAAB for the second, so
# neither tree systematically runs later in the session; fewer than 4 legs
# falls back to plain alternation (a 2-leg run is a smoke test, not a
# measurement)
pattern() {
  local n=$1 i
  for ((i = 0; i < n; i++)); do
    if [ "$n" -lt 4 ]; then
      if [ $((i % 2)) -eq 0 ]; then echo A; else echo B; fi
      continue
    fi
    local q=$((i % 4))
    local base
    { [ $q -eq 0 ] || [ $q -eq 3 ]; } && base=A || base=B
    if [ $((i * 2 / n)) -eq 0 ]; then
      echo "$base"
    else
      if [ "$base" = A ]; then echo B; else echo A; fi
    fi
  done
}

leg=1
for tag in $(pattern "$LEGS"); do
  if [ "$tag" = A ]; then run_leg "$leg" A "$A_CP"; else run_leg "$leg" B "$B_CP"; fi
  leg=$((leg + 1))
done

python3 "$(dirname "$0")/pair_ratios.py" "$OUT" "$A_REF" "$B_REF"
echo "done: $OUT/REPLAY.json" >&2
