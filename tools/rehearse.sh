#!/usr/bin/env bash
# 10x ingestion rehearsal with kill -9 resume (r11 order #1; ROUND13.md).
#
# Variants, all against one generated multi-GB month (graft.tools.Rehearse):
#   A  control: one uninterrupted run                       -> outA
#   B  deterministic kill: Runtime.halt(137) right after the
#      4th table overwrite returns (kill -9 semantics), then
#      resume to completion                                 -> outB == outA
#   C  external kill -9: SIGKILL aimed into the load phase
#      by the REHEARSE_PHASE marker + a timed delay, then
#      resume to completion                                 -> outC == outA
#   D  multi-contributor rebuild: Empresas9 download fails
#      all 3 attempts (falhou), month completes on 9 parts;
#      operator reset -> resume must rebuild rfb_empresas
#      from ALL TEN contributors and touch nothing else     -> outD == outA
#
# Usage: tools/rehearse.sh [BASE=/tmp/rehearse13] [ROWS=1000000]
set -uo pipefail
cd "$(dirname "$0")/.."

BASE=${1:-/tmp/rehearse13}
ROWS=${2:-1000000}
C_KILL_DELAY=${C_KILL_DELAY:-8}
MONTH=202601
mkdir -p "$BASE"

CP="target/scala-2.13/classes:/opt/spark/jars/*"
JFLAGS=(
  --add-opens java.base/java.lang=ALL-UNNAMED
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED
  --add-opens java.base/java.io=ALL-UNNAMED
  --add-opens java.base/java.net=ALL-UNNAMED
  --add-opens java.base/java.nio=ALL-UNNAMED
  --add-opens java.base/java.util=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED
  --add-opens java.base/sun.security.action=ALL-UNNAMED
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC
  -Dfile.encoding=UTF-8 -Xmx24g
)
export LC_ALL=C.utf8

J() { java "${JFLAGS[@]}" -cp "$CP" graft.tools.Rehearse "$@"; }

step() { echo; echo "==== $* ===="; }

fail=0
check() { # check <name> <rc> <expected-rc>
  if [ "$2" -eq "$3" ]; then echo "PASS $1 (rc=$2)"
  else echo "FAIL $1 (rc=$2, expected $3)"; fail=1; fi
}

step "gen $ROWS rows/part -> $BASE/src"
J gen "$BASE/src" "$ROWS" 2>&1 | tail -2 | tee "$BASE/gen.log"
du -sh "$BASE/src" | tee -a "$BASE/gen.log"

step "A: control run"
J run "$BASE/src" "$BASE/workA" "$BASE/outA" 2>&1 | tail -3 | tee "$BASE/runA.log"
check "A control" $? 0

step "B: halt after 4 table overwrites (expect rc 137)"
export REHEARSE_KILL_AFTER_TABLES=4
J run "$BASE/src" "$BASE/workB" "$BASE/outB" >"$BASE/runB1.log" 2>&1
check "B halt fired" $? 137
unset REHEARSE_KILL_AFTER_TABLES
tail -2 "$BASE/runB1.log"

step "B: resume to completion"
J run "$BASE/src" "$BASE/workB" "$BASE/outB" 2>&1 | tail -3 | tee "$BASE/runB2.log"
check "B resume" $? 0

step "B: compare outB vs control"
J compare "$BASE/outA" "$BASE/outB" $MONTH 2>&1 | grep REHEARSE_CMP | tee "$BASE/cmpB.log"
check "B content-equal" $? 0

step "C: external kill -9 ${C_KILL_DELAY}s into the load phase"
: >"$BASE/runC1.log"
J run "$BASE/src" "$BASE/workC" "$BASE/outC" >"$BASE/runC1.log" 2>&1 &
CPID=$!
while ! grep -q "REHEARSE_PHASE:load:begin" "$BASE/runC1.log"; do
  if ! kill -0 "$CPID" 2>/dev/null; then
    echo "FAIL C: run exited before the load phase"; fail=1; break
  fi
  sleep 0.5
done
if kill -0 "$CPID" 2>/dev/null; then
  sleep "$C_KILL_DELAY"
  kill -9 "$CPID" 2>/dev/null
  wait "$CPID" 2>/dev/null
  rc=$?
  check "C SIGKILL delivered" $rc 137
fi

step "C: resume to completion"
J run "$BASE/src" "$BASE/workC" "$BASE/outC" 2>&1 | tail -3 | tee "$BASE/runC2.log"
check "C resume" $? 0

step "C: compare outC vs control"
J compare "$BASE/outA" "$BASE/outC" $MONTH 2>&1 | grep REHEARSE_CMP | tee "$BASE/cmpC.log"
check "C content-equal" $? 0

step "D: run with Empresas9 download failing all 3 attempts"
J run "$BASE/src" "$BASE/workD" "$BASE/outD" "Empresas9.zip:3" 2>&1 | tail -3 | tee "$BASE/runD1.log"
check "D first run" $? 0
grep -o '"pendentes":"[^"]*"' "$BASE/runD1.log"
find "$BASE/outD" -maxdepth 2 -name "ref_month=$MONTH" -printf '%T@ %p\n' \
  | sort -k2 >"$BASE/d_mtimes_before.txt"

step "D: operator reset of the failed download, resume"
J reset-download "$BASE/workD/manifesto_$MONTH.json" 2>&1 | grep REHEARSE
J run "$BASE/src" "$BASE/workD" "$BASE/outD" 2>&1 | tail -3 | tee "$BASE/runD2.log"
check "D resume" $? 0
find "$BASE/outD" -maxdepth 2 -name "ref_month=$MONTH" -printf '%T@ %p\n' \
  | sort -k2 >"$BASE/d_mtimes_after.txt"
# only rfb_empresas may have been rewritten
CHANGED=$(join -j2 -o 1.1,2.1,0 <(sort -k2 "$BASE/d_mtimes_before.txt") \
  <(sort -k2 "$BASE/d_mtimes_after.txt") | awk '$1 != $2 {print $3}')
echo "tables rewritten on resume: ${CHANGED:-none}"
if [ "$(echo "$CHANGED" | grep -c . )" -eq 1 ] && \
   echo "$CHANGED" | grep -q rfb_empresas; then
  echo "PASS D only rfb_empresas rewritten"
else
  echo "FAIL D rewrite set: $CHANGED"; fail=1
fi

step "D: compare outD vs control (empresas must hold ALL TEN parts)"
J compare "$BASE/outA" "$BASE/outD" $MONTH 2>&1 | grep REHEARSE_CMP | tee "$BASE/cmpD.log"
check "D content-equal" $? 0

step "result"
if [ "$fail" -eq 0 ]; then echo "REHEARSAL: ALL VARIANTS PASS"
else echo "REHEARSAL: FAILURES ABOVE"; exit 1; fi
