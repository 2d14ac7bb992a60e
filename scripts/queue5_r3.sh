#!/usr/bin/env bash
# Round-3 queue #5: complete the W8A16-vs-W8A8 sweep with the multi-row-
# block estimate fix.
set -u
mkdir -p /tmp/evidence
cd /root/repo

for _ in $(seq 1 720); do
  grep -q "queue4 done" /tmp/evidence/queue4.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/evidence/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/evidence/$name.log" | tail -1 | head -c 220))"
}

run prefill_a8_ab3 2400 python scripts/prefill_a8_ab.py 8b 512,1024,2048,4096

echo "=== queue5 done ($(date +%H:%M:%S)) ==="
