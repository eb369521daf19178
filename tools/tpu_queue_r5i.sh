#!/bin/bash
# Round-5 queue, part I: two quality questions the tables still leave open.
#
#   1/2. bf16_flagship_ab — the README claims the *_tpu_bf16.gin overlays'
#        quality delta is invisible; that claim has never carried a
#        hardware number. Paired 3000-step runs of kubric_1024_base.gin
#        (fp32 control) and kubric_1024_base_tpu_bf16.gin on the same
#        procedural scene give the delta directly.
#   3.   nerfw_strongreg — the flagship NeRF-W row is a diagnosed
#        degenerate optimum (transient absorbs the scene; PARITY.md): the
#        reference's nerfw_density_loss_mult=0.01 is too weak at 1024-wide
#        transient capacity on 32 images. One run at 0.3 shows whether the
#        collapse is knob-fixable at scale (expect: static branch retains
#        the scene, clean-test PSNR comparable to the glo4 base control
#        23.25; β-localization stays > 1).
# Gates on part H. State in /root/repo/.runs_r5 — gitignored, NOT
# restart-proof: harvest + commit as soon as jobs finish.
#
#   setsid nohup bash tools/tpu_queue_r5i.sh \
#       > /root/repo/.runs_r5/q/driver_i.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

GATE_T0=$(date +%s)
while ! grep -q "QUEUE_H COMPLETE" "$Q/q/queue_h.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 7200 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (2h); proceeding" >> "$Q/q/queue_i.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 60s" >> "$Q/q/queue_i.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_i.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_i.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_i.log"
  else
    local rc=$?
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $rc)" >> "$Q/q/queue_i.log"
  fi
}

run bf16_flagship_fp32ctl 7200 python tools/validate_quality.py \
    --config configs/mipnerf360/kubric_1024_base.gin \
    --steps 3000 --save-dir "$Q/bf16ab_fp32" \
    --binding "Model.remat_mlp = True"

run bf16_flagship_bf16 7200 python tools/validate_quality.py \
    --config configs/mipnerf360/kubric_1024_base_tpu_bf16.gin \
    --steps 3000 --save-dir "$Q/bf16ab_bf16"

run nerfw_strongreg 10800 python tools/validate_quality.py \
    --config configs/mipnerf360/distractor_1024_glo4_nerfw.gin \
    --steps 3000 --save-dir "$Q/nerfw_strong" \
    --binding "Config.factor = 2" --binding "Model.remat_mlp = True" \
    --binding "Config.nerfw_density_loss_mult = 0.3"

echo "$(date -u +%FT%TZ) QUEUE_I COMPLETE" >> "$Q/q/queue_i.log"
