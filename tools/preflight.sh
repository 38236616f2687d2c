#!/usr/bin/env bash
# End-of-round gate: refuse to snapshot a broken tree.
#
# r6 shipped a non-compiling tree; r7 shipped an unexercised streaming
# family into a changed fixture. This script is the answer to both:
#   1. `sbt compile Test/compile` must pass (r6's failure mode).
#   2. The QueriesSpec slice for every test family whose SOURCE file was
#      touched this round must pass (r7's failure mode) — plus the
#      streaming family unconditionally, since it is the one that breaks
#      on fixture drift (watermark/event-time types).
#
# Usage: tools/preflight.sh [since-ref]      (default: last snapshot commit)
# Exit nonzero on any failure; the snapshot commit must not proceed.
set -euo pipefail
cd "$(dirname "$0")/.."

SINCE="${1:-$(git log --grep 'end-of-round snapshot' -n1 --format=%H)}"
[ -n "$SINCE" ] || SINCE=HEAD~1
echo "preflight: diffing against $SINCE"

echo "== gate 1: compile + Test/compile =="
sbt -batch compile Test/compile >/tmp/preflight_compile.log 2>&1 || {
  tail -30 /tmp/preflight_compile.log; echo "PREFLIGHT FAIL: compile"; exit 1; }
echo "compile OK"

# Map touched main-source files -> spec globs to run. Streaming always runs.
TOUCHED=$(git diff --name-only "$SINCE" -- 'src/main/scala/**' 2>/dev/null || true)
SPECS="graft.streaming.* *QueriesSpec"
declare -A FAM=(
  [pipeline]="graft.pipeline.*"
  [operators]="graft.operators.*"
  [functions]="graft.functions.*"
  [sources]="graft.sources.* *SourceFormatsSpec"
  [plans]="graft.plans.*"
)
NFAM=0
for dir in "${!FAM[@]}"; do
  if echo "$TOUCHED" | grep -q "graft/$dir/"; then
    SPECS="$SPECS ${FAM[$dir]}"; NFAM=$((NFAM + 1))
  fi
done
# streaming runs unconditionally as a slice but still counts toward width
if echo "$TOUCHED" | grep -q "graft/streaming/"; then NFAM=$((NFAM + 1)); fi
# Wide rounds escape slice selection's premise (that untouched families
# can't break): >3 families touched means cross-family seams moved — run
# the FULL suite, which at that point costs barely more than the slices.
if [ "$NFAM" -gt 3 ]; then
  echo "== gate 2: $NFAM families touched (>3) -> FULL sbt test =="
  sbt -batch test >/tmp/preflight_test.log 2>&1 || {
    tail -40 /tmp/preflight_test.log; echo "PREFLIGHT FAIL: full suite"; exit 1; }
else
echo "== gate 2: specs for touched families: $SPECS =="
# testOnly with globs that match nothing is a no-op success, which is fine —
# the QueriesSpec glob always matches and is the oracle-shaped end-to-end net.
sbt -batch "Test/testOnly $SPECS" >/tmp/preflight_test.log 2>&1 || {
  tail -40 /tmp/preflight_test.log; echo "PREFLIGHT FAIL: specs"; exit 1; }
fi
# informational only — sbt's exit code above is the gate; '|| true' keeps a
# phrasing change in sbt's summary from failing the preflight under set -e
grep -E 'Tests: succeeded|All tests passed' /tmp/preflight_test.log | tail -3 || true
echo "PREFLIGHT OK"
