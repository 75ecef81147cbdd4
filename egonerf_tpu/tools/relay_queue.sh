#!/bin/bash
# Poll the axon TPU relay; the moment it answers, run the queued TPU
# experiments strictly sequentially (only ONE process may use the chip —
# CLAUDE.md platform gotchas).  Survives this shell's parent dying; logs
# everything under /tmp/relayqueue/.
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

DEADLINE=$(( $(date +%s) + 11*3600 ))
while ! timeout 2 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "$(date -u +%FT%TZ) relay never returned; giving up" ; exit 1
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) relay is UP — starting queue"

run() {  # run <tag> <cmd...>; never abort the queue on one failure
  local tag=$1; shift
  echo "$(date -u +%FT%TZ) START $tag: $*"
  "$@" > "/tmp/relayqueue/$tag.log" 2>&1
  echo "$(date -u +%FT%TZ) DONE  $tag (exit $?)"
}

run bench_quick_base      env BENCH_QUICK=1 python bench.py
run bench_quick_keep192   env BENCH_QUICK=1 BENCH_TRAIN_KEEP=192 python bench.py
run bench_quick_keep128   env BENCH_QUICK=1 BENCH_TRAIN_KEEP=128 python bench.py
run cull_ab               python -m egonerf_tpu.tools.cull_ab 192,128
run eval_bench            python -m egonerf_tpu.tools.eval_bench /tmp/egonerf_quality/refscale30k 0,192,128,96,64
run cull_ab_cluttered     python -m egonerf_tpu.tools.cull_ab 192,128 --scene=cluttered
run quality_refscale      python -m egonerf_tpu.tools.quality_run refscale
run bench_full            python bench.py

echo "$(date -u +%FT%TZ) queue complete"
