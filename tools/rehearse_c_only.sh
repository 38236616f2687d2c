#!/usr/bin/env bash
# Re-run ONLY variant C (external kill -9 mid-load) against an existing
# rehearsal base: tools/rehearse_c_only.sh [BASE] [DELAY_S]
set -uo pipefail
cd "$(dirname "$0")/.."
BASE=${1:-/tmp/rehearse13}
DELAY=${2:-10}
MONTH=202601
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

rm -rf "$BASE/workC2" "$BASE/outC2"
: >"$BASE/runC2_1.log"
J run "$BASE/src" "$BASE/workC2" "$BASE/outC2" >"$BASE/runC2_1.log" 2>&1 &
CPID=$!
while ! grep -q "REHEARSE_PHASE:load:begin" "$BASE/runC2_1.log"; do
  kill -0 "$CPID" 2>/dev/null || { echo "died before load"; exit 1; }
  sleep 0.5
done
sleep "$DELAY"
kill -9 "$CPID" 2>/dev/null
wait "$CPID" 2>/dev/null
echo "kill rc=$? (expect 137)"
# prove the kill landed MID-load: at least one table dir must be absent or
# carry swap residue in outC2
find "$BASE/outC2" -maxdepth 2 \( -name "ref_month=$MONTH" -o -name "_staging_*" -o -name "_backup_*" \) 2>/dev/null | sort
J run "$BASE/src" "$BASE/workC2" "$BASE/outC2" 2>&1 | tail -2
J compare "$BASE/outA" "$BASE/outC2" $MONTH 2>&1 | grep REHEARSE_CMP
echo "C2 rc=$?"
