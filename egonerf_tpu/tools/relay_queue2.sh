#!/bin/bash
# Second experiment wave: the cull RESCUE variants (Gumbel-top-K keep,
# periodic full step), measured under the pre-registered protocol in
# NOTES.md.  Starts only after the first queue's marker line appears so
# the two watchers never interleave jobs; every tool still takes the chip
# flock as the hard serialization.
#
# Usage: mkdir -p /tmp/relayqueue && \
#   nohup bash egonerf_tpu/tools/relay_queue2.sh > /tmp/relayqueue/watch2.log 2>&1 &
set -u
cd /root/repo
mkdir -p /tmp/relayqueue
echo $$ > /tmp/relayqueue/pid2
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

# wait for queue 1 to finish so its measurements stay contention-free
while ! grep -q "queue complete" /tmp/relayqueue/watch.log 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -u +%FT%TZ) queue 1 never completed; starting anyway"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) queue 1 complete — starting wave 2"

run bq_keep128_tau1   env BENCH_QUICK=1 BENCH_TRAIN_KEEP=128 BENCH_TRAIN_CULL_TAU=1 python bench.py
run bq_keep128_fe4    env BENCH_QUICK=1 BENCH_TRAIN_KEEP=128 BENCH_TRAIN_KEEP_FULL_EVERY=4 python bench.py
run cull_ab_g1        python -m egonerf_tpu.tools.cull_ab 192,128 --tau=1
run cull_ab_fe4       python -m egonerf_tpu.tools.cull_ab 128 --full_every=4

echo "$(date -u +%FT%TZ) wave 2 complete"
