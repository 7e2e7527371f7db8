#!/bin/bash
# Round-4 healthy-window flagship hunter: probe the host every ~2 min;
# when a healthy window appears (matmul < 0.6 s AND memsum > 4 GB/s),
# run the flagship-only bench (GRAFT_SKIP_QUERIES=1) and save the line.
# Exits after a successful healthy-window run or after ~5 h.
cd /root/repo
DEADLINE=$(( $(date +%s) + 18000 ))
OUT=/tmp/healthy_bench_r4.jsonl
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  PROBE=$(python3 -c "
import sys; sys.path.insert(0,'/root/repo')
from bench import host_probe
import json; p=host_probe(); print(json.dumps(p))")
  echo "$(date -Is) probe $PROBE" >> "$OUT"
  OK=$(python3 -c "
import json,sys
p=json.loads('$PROBE')
print(1 if p['host_matmul_sec']<0.6 and p['host_memsum_gbps']>4.0 else 0)")
  if [ "$OK" = "1" ]; then
    echo "$(date -Is) healthy window, running flagship bench" >> "$OUT"
    GRAFT_SKIP_QUERIES=1 GRAFT_WAIT_HEALTHY=0 python bench.py >> "$OUT" 2>/tmp/healthy_bench_r4.err
    # require the run itself to have ended healthy (post-probe)
    TAIL=$(tail -1 "$OUT")
    DONE=$(python3 -c "
import json,sys
try:
    p=json.loads('''$TAIL''')
    print(1 if p.get('host_matmul_sec_post',9)<0.6 and p.get('host_memsum_gbps_post',0)>4.0 else 0)
except Exception:
    print(0)")
    if [ "$DONE" = "1" ]; then
      echo "$(date -Is) healthy-window flagship run captured" >> "$OUT"
      echo "$(date -Is) running scaling pair in the same window" >> "$OUT"
      if python bench.py --scaling >> "$OUT" 2>>/tmp/healthy_bench_r4.err; then
        # gate the capture like the flagship leg: the window must still
        # be healthy AFTER the pair, or the number is labeled tainted
        POSTP=$(python3 -c "
import sys; sys.path.insert(0,'/root/repo')
from bench import host_probe
import json; print(json.dumps(host_probe()))")
        echo "$(date -Is) post-scaling probe $POSTP" >> "$OUT"
        POSTOK=$(python3 -c "
import json
p=json.loads('$POSTP')
print(1 if p['host_matmul_sec']<0.6 and p['host_memsum_gbps']>4.0 else 0)")
        if [ "$POSTOK" = "1" ]; then
          echo "$(date -Is) scaling pair captured HEALTHY-WINDOW" >> "$OUT"
        else
          echo "$(date -Is) scaling pair recorded but window degraded mid-run (tainted)" >> "$OUT"
        fi
      else
        echo "$(date -Is) scaling pair FAILED (see /tmp/healthy_bench_r4.err)" >> "$OUT"
      fi
      exit 0
    fi
  fi
  sleep 110
done
echo "$(date -Is) no healthy window before deadline" >> "$OUT"
exit 1
