#!/bin/bash
# Fifth wave: re-validate the second model family (TensorVMSplit quality
# preset) under the current round-3 code.  Serialized by the chip flock.
#
# Usage: nohup bash egonerf_tpu/tools/relay_queue5.sh > /tmp/relayqueue/watch5.log 2>&1 &
set -u
cd /root/repo
mkdir -p /tmp/relayqueue
echo $$ > /tmp/relayqueue/pid5
export PYTHONUNBUFFERED=1
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
STATE=/tmp/relayqueue/done
touch "$STATE"

DEADLINE=$(( $(date +%s) + 8*3600 ))

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

# wait for wave 4's marker so the 30k quality run stays contention-free
while ! grep -q "wave 4 complete" /tmp/relayqueue/watch4.log 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -u +%FT%TZ) wave 4 never completed; starting anyway"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) wave 4 complete — starting wave 5"

run quality_tensorf_r3   python -m egonerf_tpu.tools.quality_run tensorf

echo "$(date -u +%FT%TZ) wave 5 complete"
