#!/bin/bash
# VERDICT r3 next #1(b): measure the c1_full-first vs c1_small-first
# stage-order tradeoff under the EXACT driver budget (timeout 450, cold
# process each run).  Alternates orders; parses each emitted JSON line
# for value/phases; appends a summary to /tmp/bench_order_results.txt.
# Run only when the chip is reachable (each run costs up to 450 s).
export PYTHONPATH=/root/.axon_site:/root/repo
cd /root/repo
RES=/tmp/bench_order_results.txt
echo "=== bench order experiment $(date) HEAD=$(git rev-parse --short HEAD)" >> $RES
for i in 1 2 3; do
  for order in full small; do
    if [ "$order" = full ]; then
      STAGES="c1_full,c1_small,dot,linreg,kmeans,pagerank,verify"
    else
      STAGES="c1_small,c1_full,dot,linreg,kmeans,pagerank,verify"
    fi
    LOG=/tmp/bench_order_${order}_$i.json
    echo "--- run $i order=$order $(date)" >> $RES
    SPARTAN_BENCH_STAGES=$STAGES timeout 450 python bench.py > $LOG 2>/tmp/bench_order_${order}_$i.err
    rc=$?
    python - "$LOG" "$rc" >> $RES <<'EOF'
import json, sys
try:
    rec = json.loads(open(sys.argv[1]).read().strip().splitlines()[-1])
    d = rec.get("bench_diag", {})
    print(f"    rc={sys.argv[2]} value={rec.get('value')} "
          f"completed={d.get('completed')} elapsed={d.get('elapsed_s')}")
    for p in d.get("phases", [])[:12]:
        print(f"      phase {p}")
except Exception as e:
    print(f"    rc={sys.argv[2]} UNPARSEABLE: {e}")
EOF
    sleep 60
  done
done
echo "=== experiment done $(date)" >> $RES
