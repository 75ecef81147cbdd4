#!/bin/bash
# Poll the axon TPU relay; the moment it answers, run the queued TPU
# experiments strictly sequentially (only ONE process may use the chip —
# CLAUDE.md platform gotchas; each tool also takes the chip flock).
# Survives this shell's parent dying; logs under /tmp/relayqueue/.
#
# v2 hardening (the relay has died twice mid-round): if a job fails AND
# the relay is down, the queue re-waits for the relay and RETRIES the job
# (up to 3 attempts) instead of letting every subsequent guarded tool
# exit bounded and burning the whole queue on one outage.  Completed jobs
# are recorded in /tmp/relayqueue/done so a watcher restart skips them.
#
# Queue (most valuable first, in case the relay dies again mid-queue):
#   1. in-situ train_keep throughput toggles (BENCH_QUICK ablation protocol)
#   2. cull_ab 192,128         — train_keep quality A/B at production shape
#   3. eval_bench (30k ckpt)   — eval_keep sweep: sec/image + PSNR-vs-full
#   4. quality_run refscale    — the 10k quality re-run under round-3 numerics
#   5. full bench.py           — headline record after any default changes
#
# Usage: mkdir -p /tmp/relayqueue && \
#        nohup bash egonerf_tpu/tools/relay_queue.sh > /tmp/relayqueue/watch.log 2>&1 &
# (the mkdir must happen in the INVOKING shell — it performs the redirection
# before this script's own mkdir runs)
set -u
cd /root/repo
mkdir -p /tmp/relayqueue
echo $$ > /tmp/relayqueue/pid
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

run() {  # run <tag> <cmd...>; retry on relay-outage failures, never abort queue
  local tag=$1; shift
  if grep -qx "$tag" "$STATE"; then
    echo "$(date -u +%FT%TZ) SKIP  $tag (already done)"; return
  fi
  local attempt rc
  for attempt in 1 2 3; do
    wait_relay
    local cmd=("$@")
    # quality_run supports --resume: retries continue the interrupted run
    # from its periodic checkpoints instead of starting over
    if [ "$attempt" -gt 1 ] && [[ "${cmd[*]}" == *quality_run* ]]; then
      cmd+=(--resume)
    fi
    echo "$(date -u +%FT%TZ) START $tag (attempt $attempt): ${cmd[*]}"
    "${cmd[@]}" > "/tmp/relayqueue/$tag.log" 2>&1
    rc=$?
    # bench.py exits 0 with an {"error": ...} JSON line when the relay is
    # unreachable — treat that as failure too
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

wait_relay
echo "$(date -u +%FT%TZ) relay is UP — starting queue"

run bench_quick_base      env BENCH_QUICK=1 python bench.py
run bench_quick_keep192   env BENCH_QUICK=1 BENCH_TRAIN_KEEP=192 python bench.py
run bench_quick_keep128   env BENCH_QUICK=1 BENCH_TRAIN_KEEP=128 python bench.py
run cull_ab               python -m egonerf_tpu.tools.cull_ab 192,128
run cull_ab_cluttered     python -m egonerf_tpu.tools.cull_ab 192,128 --scene=cluttered
run quality_refscale      python -m egonerf_tpu.tools.quality_run refscale
# the 30k checkpoint lived in /tmp and was wiped by a reboot; sweep the
# fresh refscale (10k) checkpoint instead
run eval_bench            python -m egonerf_tpu.tools.eval_bench /tmp/egonerf_quality/refscale 0,192,128,96,64
run bench_full            python bench.py

echo "$(date -u +%FT%TZ) queue complete"
