#!/bin/bash
# Retry-until-idle battery capture (the protocol SCALING.md's committed
# captures used, scripted): run graft.Bench at $1 (sf dir) with $2 cpus,
# up to $3 attempts. A gate-ok uncontended battery is kept at
# $CAPDIR/$4 and the loop stops; a gate-failing battery is
# preserved as $CAPDIR/rejected_<n>_$4 (r17 verdict item 6 —
# rejections stay auditable, never displaced) and the committed
# BENCH_FULL/BENCH_TOTAL are restored from git before the next try.
set -u
# NAME should follow gen_floors.py's committed-capture convention
# (bench_<sf>_<n>.json) so a clean capture feeds the floor regeneration;
# rejected_* names are outside its glob by design.
SF="$1"; CPUS="$2"; TRIES="$3"; NAME="$4"
CAPDIR="${CAPDIR:-bench_captures/r19}"
mkdir -p "$CAPDIR"
for i in $(seq 1 "$TRIES"); do
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" \
    sbt -batch "runMain graft.Bench" > "/tmp/bench_retry_${NAME}_$i.log" 2>&1
  if grep -q '"kept_committed":true' BENCH_FULL.json 2>/dev/null; then
    # guard fired: fresh battery failed its gate; archive the rejection
    cp BENCH_REJECTED.json "$CAPDIR/rejected_${i}_${NAME}"
    git checkout -- BENCH_FULL.json BENCH_TOTAL.json BENCH_REJECTED.json 2>/dev/null
    rm -f BENCH_REJECTED_*.json
    echo "try $i: gate-fail (archived rejected_${i}_${NAME}); sleeping"
    sleep 120
  else
    ok=$(python3 -c "import json; j=json.load(open('BENCH_FULL.json')); print(j['floor_gate']['ok'] and not j['contended'])")
    if [ "$ok" = "True" ]; then
      cp BENCH_FULL.json "$CAPDIR/${NAME}"
      echo "try $i: CLEAN — kept $CAPDIR/${NAME}"
      exit 0
    else
      cp BENCH_FULL.json "$CAPDIR/rejected_${i}_${NAME}"
      git checkout -- BENCH_FULL.json BENCH_TOTAL.json 2>/dev/null
      rm -f BENCH_REJECTED_*.json
      echo "try $i: not clean (gate=$ok); sleeping"
      sleep 120
    fi
  fi
done
echo "no clean battery in $TRIES tries"
exit 1
