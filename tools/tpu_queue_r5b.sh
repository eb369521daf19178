#!/bin/bash
# Round-5 queue, part B: the additive-hash (hash_impl='add') perf + quality
# A/B. Gates on part A (tools/tpu_queue_r5.sh) writing QUEUE COMPLETE so the
# chip never sees two clients (the wedge risk class, CLAUDE.md). State in
# /root/repo/.runs_r5 — gitignored, NOT restart-proof: harvest + commit
# results as soon as jobs finish (python tools/harvest_r5.py).
#
#   setsid nohup bash tools/tpu_queue_r5b.sh \
#       > /root/repo/.runs_r5/q/driver_b.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# --- gate: wait for part A to drain (cap 8 h) ------------------------------
GATE_T0=$(date +%s)
while ! grep -q "QUEUE COMPLETE" "$Q/q/queue.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 28800 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (8h); proceeding" >> "$Q/q/queue_b.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 120s" >> "$Q/q/queue_b.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_b.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_b.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_b.log"
  else
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $?)" >> "$Q/q/queue_b.log"
  fi
}

# 1. Perf A/B: additive-hash step times at both benched nerfacto shapes.
#    Floors (tools/bench_nerfacto.fwd_descriptor_floor): base 415M -> 205M
#    descriptors/step, tuned 113M -> 69M. The xor sides are already in
#    BENCH_r04 (2.827 / 0.726 s/step).
run addhash_bench 3600 python tools/bench_nerfacto.py \
    configs/nerfacto/kubric_nerfacto_base_addhash.yml \
    configs/nerfacto/kubric_nerfacto_tpu_addhash.yml

# 2. Quality A/B: the additive hash must match xor quality to ship as the
#    TPU-native recommendation. Comparators (PARITY.md, same harness):
#    kubric_nerfacto_tpu.yml @3000 -> test PSNR 34.73/SSIM 0.9888;
#    kubric_nerfacto_base.yml @1000 -> 27.42/0.9294.
run addhash_quality_tpu 5400 python tools/validate_quality.py \
    --config configs/nerfacto/kubric_nerfacto_tpu_addhash.yml --steps 3000 \
    --save-dir "$Q/addhash_tpu"
run addhash_quality_base 5400 python tools/validate_quality.py \
    --config configs/nerfacto/kubric_nerfacto_base_addhash.yml --steps 1000 \
    --save-dir "$Q/addhash_base"

echo "$(date -u +%FT%TZ) QUEUE_B COMPLETE" >> "$Q/q/queue_b.log"
