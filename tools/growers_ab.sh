#!/bin/bash
# Shuffle-geometry A/B for the top x10 growers (r16 VERDICT item 6):
# q_bucket_rollup 5.95, q_tpch_q12 5.25, q_tpch_q4 4.43,
# q_interval_join 4.38 — all sub-linear but top of the x10 table, all
# sub-second at 1x. Hypothesis: the ratios are 200-wide-shuffle /
# startup geometry at 6 M rows (a 200-task stage on sf0.1-sized input
# is scheduling-floor-bound, deflating the 1x denominator; at x10 the
# same stage amortizes), not a plan defect. Test: re-measure the four
# queries at 1x and 10x under BOTH shuffle widths (the stress pack's
# 200 and the bench's 32) in the same serial session methodology. If
# geometry is the cause, the 32-wide 1x times drop markedly (fewer
# near-empty tasks) and the 32-wide x10/1x ratio lands materially
# lower; a plan defect would keep the ratio regardless of width.
#
# Usage: tools/growers_ab.sh <round>   (run SERIALLY, never beside
# another JVM; workdirs are the campaign's persistent /tmp copies)
set -u
cd "$(dirname "$0")/.."
R="${1:?usage: tools/growers_ab.sh <round number>}"
JOPTS=$(for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
  java.nio java.util java.util.concurrent java.util.concurrent.atomic \
  sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do \
  echo --add-opens java.base/$p=ALL-UNNAMED; done)
COMMON="-Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -Xmx32g"
CP="target/scala-2.13/classes:/opt/spark/jars/*"
Q="q_bucket_rollup,q_tpch_q12,q_tpch_q4,q_interval_join"
LOG=/tmp/r${R}_growers.log
: > "$LOG"

run() { # $1 replicas  $2 workdir  $3 shuffle  $4 out
  echo "$(date -u +%H:%M:%S) growers replicas=$1 shuffle=$3" >> "$LOG"
  SPARK_GRAFT_STRESS_ONLY="$Q" SPARK_GRAFT_STRESS_REPLICAS=$1 \
    SPARK_GRAFT_STRESS_SHUFFLE=$3 SPARK_GRAFT_STRESS_OUT=$4 \
    SPARK_GRAFT_BENCH_REPS=5 \
    java $JOPTS $COMMON -cp "$CP" graft.StressSmoke /root/testdata/sf0.1 "$2" \
    >> "$LOG" 2>&1
  echo "$(date -u +%H:%M:%S) done rc=$? out=$4" >> "$LOG"
}

run 1  /tmp/graft_sf1shape_r1 200 /tmp/r${R}_grow_1x_200.json
run 1  /tmp/graft_sf1shape_r1 32  /tmp/r${R}_grow_1x_32.json
run 10 /tmp/graft_sf1shape    200 /tmp/r${R}_grow_10x_200.json
run 10 /tmp/graft_sf1shape    32  /tmp/r${R}_grow_10x_32.json

python3 - "$R" <<'EOF'
import json, subprocess, sys
r = sys.argv[1]
def load(p):
    d = json.load(open(p))
    assert not d.get("failed"), (p, d.get("failed"))
    return d
runs = {(rep, w): load(f"/tmp/r{r}_grow_{rep}x_{w}.json")
        for rep in (1, 10) for w in (200, 32)}
shas = {d["head_sha"] for d in runs.values()}
assert len(shas) == 1, shas
out = {"metric": "growers_ab", "unit": "sec", "head_sha": shas.pop(),
       "reps": 5, "queries": {}}
for q in runs[(1, 200)]["queries"]:
    e = {}
    for rep in (1, 10):
        for w in (200, 32):
            e[f"x{rep}_w{w}_sec"] = runs[(rep, w)]["queries"][q]
    e["ratio_w200"] = round(e["x10_w200_sec"] / e["x1_w200_sec"], 2)
    e["ratio_w32"] = round(e["x10_w32_sec"] / e["x1_w32_sec"], 2)
    out["queries"][q] = e
path = f"GROWERS_r{r}.json"
open(path, "w").write(json.dumps(out, indent=1) + "\n")
print(json.dumps(out, indent=1))
EOF
echo "$(date -u +%H:%M:%S) GROWERS COMPLETE" >> "$LOG"
