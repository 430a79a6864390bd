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
# pattern() below is A/B-balanced only for even leg counts: an odd count
# would hand one tree an extra timed leg via the plain-alternation
# remainder — exactly the systematic bias the pairing exists to cancel.
if [ $((LEGS % 2)) -ne 0 ]; then
  echo "error: legs must be even (got $LEGS)" >&2
  exit 1
fi
SFDIR=${4:-/root/testdata/sf0.1}
OUT=${5:-tools/bench_replay/replay_out}
REPO=$(git rev-parse --show-toplevel)
# NOT under /tmp/graft-*: the cold-cache discipline ("rm -rf /tmp/graft-*"
# before a driver-faithful Verify) would delete the checked-out worktrees
# and leave git's registry pointing at missing dirs
WT=/tmp/bench-replay-worktrees
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
    # clear any registry entry whose dir was deleted out from under git
    # (e.g. a /tmp cleanup between runs) before re-adding the same path
    git -C "$REPO" worktree prune >&2
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

# balanced interleave built from 4-leg ABBA/BAAB blocks (alternating so
# neither tree systematically runs later in the session); any remainder
# falls back to plain AB alternation. Unlike a half-session flip, the
# block construction stays A/B-balanced for EVERY even leg count (legs=6
# used to emit 2 A vs 4 B with A pinned to the endpoints — exactly the
# drift profile the pairing is meant to cancel).
pattern() {
  local n=$1 i
  local blocks=$((n / 4)) rem=$((n % 4))
  for ((i = 0; i < blocks; i++)); do
    if [ $((i % 2)) -eq 0 ]; then printf 'A\nB\nB\nA\n'; else printf 'B\nA\nA\nB\n'; fi
  done
  for ((i = 0; i < rem; i++)); do
    if [ $((i % 2)) -eq 0 ]; then echo A; else echo B; fi
  done
}

# One UNTIMED warm-up leg per tree before the timed legs: the /tmp/graft-*
# build-once caches (fixtures, streamed states, persisted indexes) are
# shared across legs, so without a warm-up the FIRST timed leg absorbs
# every build cost and skews its tree's median (worst at 4 legs, where
# the median of 2 is the mean). Running one leg of EACH tree untimed also
# covers the cross-tree caveat: cache keys carry StateFormatVersion but
# not the code itself, so a B tree whose state-build logic changed WITHOUT
# a version bump would otherwise silently benchmark against A-built state
# — the warm-up makes each tree build (or adopt) its caches before any
# timed measurement, and a version-bumped B builds its own.
echo "warm-up legs (untimed)" >&2
SPARK_GRAFT_BENCH_REPS=1 run_leg 0 A "$A_CP"
mv "$OUT/leg0_A.json" "$OUT/warmup_A.json"
SPARK_GRAFT_BENCH_REPS=1 run_leg 0 B "$B_CP"
mv "$OUT/leg0_B.json" "$OUT/warmup_B.json"

leg=1
for tag in $(pattern "$LEGS"); do
  if [ "$tag" = A ]; then run_leg "$leg" A "$A_CP"; else run_leg "$leg" B "$B_CP"; fi
  leg=$((leg + 1))
done

python3 "$(dirname "$0")/pair_ratios.py" "$OUT" "$A_REF" "$B_REF"

# Emit the artifact README FROM the artifacts (the gen_validation_readme
# lesson: hand-written descriptions drift — r16's claimed the logs were
# not committed while git carried them). The README lists exactly the
# files present; which of them get committed is the committer's choice,
# and the README makes no claim about it.
{
  echo "# Paired bench replay"
  echo
  echo "Command: replay.sh $A_REF $B_REF $LEGS $SFDIR $OUT"
  echo "A = $A_REF ($(git -C "$REPO" rev-parse --short "$A_REF^{commit}"))"
  echo "B = $B_REF ($(git -C "$REPO" rev-parse --short "$B_REF^{commit}"))"
  echo "Pattern: ABBA/BAAB blocks, $LEGS timed legs + 1 untimed warm-up"
  echo "leg per tree (warmup_{A,B}.json). Verdict: REPLAY.json"
  echo "(paired median(B)/median(A) over the common queries, min-of-legs"
  echo "per query per tree)."
  echo
  echo "Files in this directory when the run finished:"
  ls "$OUT" | sed 's/^/- /'
} > "$OUT/README.md"
echo "done: $OUT/REPLAY.json" >&2
