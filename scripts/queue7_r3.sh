#!/usr/bin/env bash
# Round-3 queue #7: megakernel tile-size sweep (per-tile fixed cost is the
# residual body gap: ~0.5 us x ~1600 tiles at 2 MB tiles).
set -u
mkdir -p /tmp/evidence
cd /root/repo

for _ in $(seq 1 720); do
  grep -q "queue6 done" /tmp/evidence/queue6.log 2>/dev/null && break
  sleep 10
done

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"/tmp/evidence/$name.log" 2>&1
  echo "$name: exit $? ($(grep -v WARNING "/tmp/evidence/$name.log" | tail -1 | head -c 220))"
}

run mega_ab_tiles_8b 2400 python scripts/mega_ab.py 8b env QWEN3_TPU_MEGA_TILE_BYTES 2097152,3145728,4194304
run mega_ab_tiles_06b 1800 python scripts/mega_ab.py 0.6b env QWEN3_TPU_MEGA_TILE_BYTES 2097152,4194304

echo "=== queue7 done ($(date +%H:%M:%S)) ==="
