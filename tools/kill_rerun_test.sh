#!/bin/bash
# Kill/rerun resumability evidence: start the pipeline, SIGKILL the forked
# JVM mid-run, rerun to completion, and validate the output table is exactly
# complete (no loss, no duplicates) with metrics consistent.
# Usage: tools/kill_rerun_test.sh [nDocs] [killAfterSeconds]
set -u
N=${1:-150000}
DELAY=${2:-18}
BASE=$(mktemp -d /tmp/graft-killtest-XXXX)
OUT="$BASE/out"; METRICS="$BASE/metrics"
echo "workdir $BASE  docs=$N  kill after ${DELAY}s"

GRAFT_PID_FILE="$BASE/runner.pid" sbt -batch "runMain graft.RunPipeline $N $OUT $METRICS" >"$BASE/run1.log" 2>&1 &
SBT_PID=$!
sleep "$DELAY"
# kill the forked runner JVM, hard. Its argv hides behind a java @argfile
# (pgrep/proc scans can't see the class name), so the runner writes its own
# pid to $GRAFT_PID_FILE at startup.
if [ -f "$BASE/runner.pid" ] && kill -0 "$(cat "$BASE/runner.pid")" 2>/dev/null; then
  RUN_PID=$(cat "$BASE/runner.pid")
  kill -9 "$RUN_PID" && echo "SIGKILLed runner JVM pid $RUN_PID"
  kill -9 "$SBT_PID" 2>/dev/null
else
  echo "runner already finished (or not yet forked) at kill time"
  kill -9 "$SBT_PID" 2>/dev/null
fi
wait "$SBT_PID" 2>/dev/null
echo "--- state after kill:"
ls "$OUT" 2>/dev/null | head; ls "$METRICS" 2>/dev/null | head

echo "--- rerun to completion:"
sbt -batch "runMain graft.RunPipeline $N $OUT $METRICS" 2>&1 | grep RUN_RESULT
echo "--- third run must be a no-op:"
sbt -batch "runMain graft.RunPipeline $N $OUT $METRICS" 2>&1 | grep RUN_RESULT

echo "--- validation (completeness, uniqueness, metrics consistency):"
python3 - "$OUT" "$METRICS" "$N" <<'EOF'
import sys, glob, duckdb
out, metrics, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
con = duckdb.connect()
import json, pathlib
def live_dirs(table):
    cur = int(open(f"{table}/current").read().strip())
    snap = json.load(open(f"{table}/snap-{cur}.json"))
    return [f"{table}/{d}/*.parquet" for d in snap["dataDirs"]]
docs = "', '".join(live_dirs(out))
r = con.sql(f"SELECT count(*) AS n, count(DISTINCT doc_id) AS d, sum(len(spans)) AS s FROM read_parquet(['{docs}'])").fetchone()
m = "', '".join(live_dirs(metrics))
mm = con.sql(f"SELECT sum(doc_count), sum(span_count) FROM read_parquet(['{m}'])").fetchone()
print(f"docs rows={r[0]} distinct={r[1]} spans={r[2]}; metrics docs={mm[0]} spans={mm[1]}")
ok = (r[0] == n and r[1] == n and mm[0] == n and mm[1] == r[2])
print("KILL/RERUN TEST:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
EOF
