#!/usr/bin/env bash
# Decorrelated scale ladder — the repeatable form of the r15 §3 measurement
# (r15 verdict #5): build DECORRELATED 10x/30x/100x blow-ups of sf0.1 and
# bench the heavy-hitter queries on each point, so "per-edge cost falls
# with scale" is a re-runnable check instead of a one-session worktree
# exercise.
#
# Why decorrelate: a plain N-fold copy leaves every copy's vectors in the
# SAME orientation, so LSH buckets go Nx denser and within-bucket pair
# generation ~N^2 — a synthetic quadratic no real Nx corpus exhibits.
# ScaleUp's `decorrelate` mode composes each copy's rotation with a
# per-copy deterministic +-1 diagonal orthogonal transform: intra-copy
# cosines are preserved EXACTLY (the workload scales linearly in true
# pairs), cross-copy cosines collapse to noise. The residual super-linear
# edge growth that survives decorrelation is the cosine>=0.4 threshold's
# own accidental crossings (~3.2 sigma at dim 64) — fixture-owned, not an
# engine artifact; see ROUND15.md §3 for the full decomposition and the
# r15 reference numbers (dec 10x/30x/100x: 1.11 / 0.38 / 0.27 ms/edge).
#
# Usage: tools/scale_ladder.sh [factors...]   (default: 10 30 100)
#   env: SPARK_GRAFT_LADDER_ONLY  queries to bench (default dd08+q61+trio)
#        SPARK_GRAFT_CPUS         bench threads (default 32)
# Fixtures land in /tmp/graft_scale<N>d and are LEFT for re-use (delete
# them to rebuild). Expect ~2 GB and ~10 min at 100x.
set -euo pipefail
cd "$(dirname "$0")/.."

if [ $# -gt 0 ]; then FACTORS=("$@"); else FACTORS=(10 30 100); fi
# dd08 = the CC/near-dup heavy hitter (ms/edge curve); q61 = the
# single-fact-scan aggregate whose win only shows once the scan dominates
# (added to the default set by the r16 verdict, measured r17: 2.9/3.1/4.1 s
# at 10x/30x/100x — wall nearly flat in fact rows). The tx trio rides along
# so Bench's host-drift detector AND its self-healing retry stay armed on
# the ladder — the one tool whose cross-scale comparisons are most
# drift-sensitive ran blind without them (r17 review); it costs seconds
# per pass against dd08's minutes.
ONLY="${SPARK_GRAFT_LADDER_ONLY:-dd08_semantic_clusters,q61_rfm_segments,tx01_token_counts,tx02_quality,tx03_langid}"
# graft.Bench defaults to 4 threads when unset; the ROUND15 §3 reference
# numbers this script points at were measured at 32 — export the
# documented default so ladder results are actually comparable (r16 ADVICE)
export SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}"

sbt -batch compile >/tmp/scale_ladder_compile.log 2>&1 || {
  tail -n 20 /tmp/scale_ladder_compile.log; exit 1; }

# Bench writes bench_detail.json into the repo root; without a snapshot
# the ladder's last factor (2-5 queries on a /tmp fixture) would replace
# the round's full-suite detail artifact in the location the driver and
# judge read it from (r17 review). Restore on ANY exit.
DETAIL="bench_detail.json"
DETAIL_BAK=""
if [ -f "$DETAIL" ]; then
  DETAIL_BAK="$(mktemp /tmp/bench_detail_bak.XXXXXX)"
  cp "$DETAIL" "$DETAIL_BAK"
fi
restore_detail() {
  if [ -n "$DETAIL_BAK" ]; then mv -f "$DETAIL_BAK" "$DETAIL"
  # fresh checkout: nothing to restore, but the ladder's last factor must
  # not LEAVE a 2-5-query /tmp-fixture detail file where the driver/judge
  # read the full-suite artifact (r17 ADVICE)
  else rm -f "$DETAIL"; fi
}
trap restore_detail EXIT

for f in "${FACTORS[@]}"; do
  out="/tmp/graft_scale${f}d"
  if [ ! -d "$out" ]; then
    echo "== building decorrelated ${f}x at $out =="
    # build into a staging dir and mv into place: a failed/interrupted
    # ScaleUp otherwise leaves a PARTIAL $out that the existence check
    # above happily "reuses", and ms/edge 'improves' spuriously against
    # the reference table (r17 review)
    rm -rf "${out}.build"
    sbt -batch "runMain graft.tools.ScaleUp /root/testdata/sf0.1 ${out}.build $f decorrelate" \
      >"/tmp/scale_ladder_build_${f}.log" 2>&1 || {
        tail -n 20 "/tmp/scale_ladder_build_${f}.log"
        rm -rf "${out}.build"; exit 1; }
    mv "${out}.build" "$out"
  else
    echo "== reusing $out =="
  fi
  echo "== bench $ONLY at ${f}x (min-of-2 passes inside one invocation) =="
  # grep the JSON line, not tail: sbt prints its [success] trailer AFTER
  # the program's stdout, so tail -1 returned the trailer and swallowed
  # the measurement (caught validating this script end-to-end in r16)
  SPARK_GRAFT_SF_DIR="$out" SPARK_GRAFT_ONLY="$ONLY" \
    sbt -batch "runMain graft.Bench" 2>&1 | grep '^{'
done
echo "ladder done — compare ms/edge against ROUND15.md §3's reference table"
