#!/bin/bash
# Round-5 queue, part D: the HuGS production-scale rehearsal RETRY with the
# device-side compact SAM decode path (predictor.predict_compact /
# predict_count — the round-4 attempt spent ~100 min/image shipping full-res
# f32 logits through the TPU tunnel and timed out after one image). Gates on
# part C (tools/tpu_queue_r5c.sh) writing QUEUE_C COMPLETE. State in
# /root/repo/.runs_r5 — gitignored: harvest + commit promptly.
#
#   setsid nohup bash tools/tpu_queue_r5d.sh \
#       > /root/repo/.runs_r5/q/driver_d.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

GATE_T0=$(date +%s)
while ! grep -q "QUEUE_C COMPLETE" "$Q/q/queue_c.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 32400 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (9h); proceeding" >> "$Q/q/queue_d.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 120s" >> "$Q/q/queue_d.log"
sleep 120

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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_d.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_d.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_d.log"
  else
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $?)" >> "$Q/q/queue_d.log"
  fi
}

# Production shapes: vit_h, 768x1024, 64^2 grid, crop layer 1, 128-prompt
# SfM batches (the reference kubric HuGS knobs). First image carries the
# remote compiles of the encoder + compact-decode variants.
run hugs_rehearsal_r5 10800 env NERF_HUGS_HUGS_TIMING=1 \
    python tools/rehearse_hugs_scale.py --work_dir "$Q/hugs_rehearsal"

echo "$(date -u +%FT%TZ) QUEUE_D COMPLETE" >> "$Q/q/queue_d.log"
