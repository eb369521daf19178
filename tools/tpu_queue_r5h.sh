#!/bin/bash
# Round-5 queue, part H: HuGS AMG — squeeze the last two knobs.
#
# Part G landed 33.0 s/image with points_per_batch=256 + max_masks=64 and
# showed transfer volume (not dispatch count) was the 135.5s bottleneck.
# Remaining candidates against the 33.0 control:
#   1. hugs_ppb512_mm64 — halve dispatches again (32 -> 16 jit calls/img;
#      new decoder shape, fresh remote compile; watch HBM: ~4.8 GB mask
#      upsample intermediate)
#   2. hugs_ppb256_mm32 — halve the per-batch transfer (6.3 -> 3.1 MB);
#      VALID ONLY if no budget warning fires in the log
# Part G is drained (QUEUE_G COMPLETE); still gate on it for relaunch
# safety. State in /root/repo/.runs_r5 — gitignored, NOT restart-proof:
# harvest + commit as soon as jobs finish.
#
#   setsid nohup bash tools/tpu_queue_r5h.sh \
#       > /root/repo/.runs_r5/q/driver_h.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

GATE_T0=$(date +%s)
while ! grep -q "QUEUE_G COMPLETE" "$Q/q/queue_g.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 7200 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (2h); proceeding" >> "$Q/q/queue_h.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 60s" >> "$Q/q/queue_h.log"
sleep 60

probe() {
  while true; do
    if timeout 420 python "$Q/q/probe.py" >> "$Q/q/probe.log" 2>&1; then
      return 0
    fi
    echo "$(date -u +%FT%TZ) probe failed/hung; retry in 300s" >> "$Q/q/probe.log"
    sleep 300
  done
}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 cap=$2; shift 2
  if [ -f "$Q/q/$name.done" ]; then
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_h.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_h.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_h.log"
  else
    local rc=$?
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $rc)" >> "$Q/q/queue_h.log"
  fi
}

run hugs_ppb512_mm64 3600 python tools/rehearse_hugs_scale.py \
    --points_per_batch 512 --max_masks 64 --work_dir "$Q/hugs_h_ppb512"

run hugs_ppb256_mm32 3600 python tools/rehearse_hugs_scale.py \
    --points_per_batch 256 --max_masks 32 --work_dir "$Q/hugs_h_mm32"

echo "$(date -u +%FT%TZ) QUEUE_H COMPLETE" >> "$Q/q/queue_h.log"
