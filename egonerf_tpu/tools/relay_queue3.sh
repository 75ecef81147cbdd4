#!/bin/bash
# Third wave: cluttered-scene A/Bs for the cull rescue variants (the
# pre-registered default-flip protocol requires BOTH scenes to pass) plus
# the keep192 Gumbel in-situ bench toggle.  Starts after wave 2's marker.
#
# Usage: mkdir -p /tmp/relayqueue && \
#   nohup bash egonerf_tpu/tools/relay_queue3.sh > /tmp/relayqueue/watch3.log 2>&1 &
set -u
cd /root/repo
mkdir -p /tmp/relayqueue
echo $$ > /tmp/relayqueue/pid3
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STATE=/tmp/relayqueue/done
touch "$STATE"

DEADLINE=$(( $(date +%s) + 11*3600 ))

relay_up() { timeout 2 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; }

wait_relay() {
  local announced=0
  while ! relay_up; do
    if [ "$(date +%s)" -ge "$DEADLINE" ]; then
      echo "$(date -u +%FT%TZ) relay never returned; giving up"; exit 1
    fi
    [ "$announced" = 0 ] && { echo "$(date -u +%FT%TZ) waiting for relay"; announced=1; }
    sleep 60
  done
  [ "$announced" = 1 ] && echo "$(date -u +%FT%TZ) relay is UP"
}

run() {
  local tag=$1; shift
  if grep -qx "$tag" "$STATE"; then
    echo "$(date -u +%FT%TZ) SKIP  $tag (already done)"; return
  fi
  local attempt rc
  for attempt in 1 2 3; do
    wait_relay
    echo "$(date -u +%FT%TZ) START $tag (attempt $attempt): $*"
    "$@" > "/tmp/relayqueue/$tag.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ] && ! grep -q '"error"' "/tmp/relayqueue/$tag.log"; then
      echo "$(date -u +%FT%TZ) DONE  $tag"; echo "$tag" >> "$STATE"; return
    fi
    echo "$(date -u +%FT%TZ) FAIL  $tag (exit $rc, attempt $attempt)"
    if relay_up && [ "$rc" -ne 0 ]; then
      echo "$(date -u +%FT%TZ) $tag failed with the relay up — a real error, not retrying"
      return
    fi
  done
  echo "$(date -u +%FT%TZ) $tag gave up after 3 attempts"
}

while ! grep -q "wave 2 complete" /tmp/relayqueue/watch2.log 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -u +%FT%TZ) wave 2 never completed; starting anyway"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) wave 2 complete — starting wave 3"

run bq_keep192_tau1      env BENCH_QUICK=1 BENCH_TRAIN_KEEP=192 BENCH_TRAIN_CULL_TAU=1 python bench.py
run cull_ab_g1_cluttered python -m egonerf_tpu.tools.cull_ab 192,128 --tau=1 --scene=cluttered --no_baseline
run cull_ab_fe4_cluttered python -m egonerf_tpu.tools.cull_ab 128 --full_every=4 --scene=cluttered --no_baseline

echo "$(date -u +%FT%TZ) wave 3 complete"
