#!/bin/bash
# Round-5 queue, part J: three quality capstones.
#
#   1. xor_tuned_ctl — kubric_nerfacto_tpu.yml @3000 steps under CURRENT
#      code. The standing 34.73 PSNR number predates the corner-packed
#      backward default flip (commit 6233bfe); this re-run both refreshes
#      the equal-steps control for the addhash comparison and checks the
#      flipped default for a quality regression at scale.
#   2. addhash_wallclock — kubric_nerfacto_tpu_addhash.yml @4500 steps =
#      the xor control's wall-clock (3000 x 0.68 s ~= 4500 x 0.449 s).
#      Tests the "throughput recipe" claim where it matters: quality at
#      EQUAL WALL-CLOCK, not equal steps (equal steps already measured:
#      33.32 vs 34.73).
#   3. bf16_flagship_10k — kubric_1024_base_tpu_bf16.gin @10000 steps:
#      the newly-recommended flagship default at the same convergence
#      scale as the fp32 10k row (28.27 PSNR / 0.9744 SSIM, PARITY.md).
# Gates on part I. State in /root/repo/.runs_r5 — gitignored, NOT
# restart-proof: harvest + commit as soon as jobs finish.
#
#   setsid nohup bash tools/tpu_queue_r5j.sh \
#       > /root/repo/.runs_r5/q/driver_j.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

GATE_T0=$(date +%s)
while ! grep -q "QUEUE_I COMPLETE" "$Q/q/queue_i.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 7200 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (2h); proceeding" >> "$Q/q/queue_j.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 60s" >> "$Q/q/queue_j.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_j.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_j.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_j.log"
  else
    local rc=$?
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $rc)" >> "$Q/q/queue_j.log"
  fi
}

run xor_tuned_ctl 7200 python tools/validate_quality.py \
    --config configs/nerfacto/kubric_nerfacto_tpu.yml \
    --steps 3000 --save-dir "$Q/xor_tuned_ctl"

run addhash_wallclock 7200 python tools/validate_quality.py \
    --config configs/nerfacto/kubric_nerfacto_tpu_addhash.yml \
    --steps 4500 --save-dir "$Q/addhash_wallclock"

run bf16_flagship_10k 14400 python tools/validate_quality.py \
    --config configs/mipnerf360/kubric_1024_base_tpu_bf16.gin \
    --steps 10000 --save-dir "$Q/bf16_flagship_10k"

echo "$(date -u +%FT%TZ) QUEUE_J COMPLETE" >> "$Q/q/queue_j.log"
