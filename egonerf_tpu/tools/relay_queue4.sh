#!/bin/bash
# Fourth wave: quality evidence refresh — the 30k reference-scale record
# under round-3 numerics, and the seed-variance noise band behind every
# ±0.1 dB comparison.  No wait-for-marker: wave 2/3 are complete and the
# chip flock is the serialization.
#
# Usage: mkdir -p /tmp/relayqueue && \
#   nohup bash egonerf_tpu/tools/relay_queue4.sh > /tmp/relayqueue/watch4.log 2>&1 &
set -u
cd /root/repo
mkdir -p /tmp/relayqueue
echo $$ > /tmp/relayqueue/pid4
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STATE=/tmp/relayqueue/done
touch "$STATE"

DEADLINE=$(( $(date +%s) + 9*3600 ))

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
    local cmd=("$@")
    if [ "$attempt" -gt 1 ] && [[ "${cmd[*]}" == *quality_run* ]]; then
      cmd+=(--resume)
    fi
    echo "$(date -u +%FT%TZ) START $tag (attempt $attempt): ${cmd[*]}"
    "${cmd[@]}" > "/tmp/relayqueue/$tag.log" 2>&1
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

run seed_variance     python -m egonerf_tpu.tools.seed_variance 1,2
run quality_refscale30k python -m egonerf_tpu.tools.quality_run refscale30k

echo "$(date -u +%FT%TZ) wave 4 complete"
