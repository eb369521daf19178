#!/bin/bash
# Round-5 queue, part F (final): re-bank everything under the flipped
# NERF_HUGS_PACK_BWD=1 default, retry the two part-B/E casualties, and
# leave the chip idle for the driver's closing bench.
#   1. xor re-bench (base + tpu) — the packbwd default changes both.
#   2. distractor addhash twin bench — part E crashed on the (now fixed)
#      eval_embedding='zero' init bug (models/nerfacto.py _get_embedding).
#   3. addhash_quality_tpu retry @3000 — part B's attempt died to a
#      service stall at step ~450 (log truncated, no checkpoint).
#   4. bench.py full re-bank -> BENCH_r05-preview (the driver's closing
#      run is authoritative; this banks a committed copy).
# Gates on parts B..E being COMPLETE so the chip never sees two clients
# (the wedge risk class, CLAUDE.md). State in /root/repo/.runs_r5 —
# gitignored, NOT restart-proof: harvest + commit as soon as jobs finish
# (python tools/harvest_r5.py).
#
#   setsid nohup bash tools/tpu_queue_r5f.sh \
#       > /root/repo/.runs_r5/q/driver_f.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# --- gate: wait for part E to drain (cap 4 h) ------------------------------
GATE_T0=$(date +%s)
while ! grep -q "QUEUE_E COMPLETE" "$Q/q/queue_e.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 14400 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (4h); proceeding" >> "$Q/q/queue_f.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 120s" >> "$Q/q/queue_f.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_f.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_f.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_f.log"
  else
    local rc=$?
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $rc)" >> "$Q/q/queue_f.log"
  fi
}

# 1. xor shapes under the packbwd default (base was 2.828/2.663 off/on in
#    the A/B; tpu 0.725 was never measured with packbwd).
run packbwd_xor_rebench 3600 python tools/bench_nerfacto.py \
    configs/nerfacto/kubric_nerfacto_base.yml \
    configs/nerfacto/kubric_nerfacto_tpu.yml

# 2. The two addhash twins part E didn't finish (phototourism landed at
#    2.933 pre-packbwd; both re-measured under the new default).
run addhash_twins_rebench 3600 python tools/bench_nerfacto.py \
    configs/nerfacto/phototourism_nerfacto_base_addhash.yml \
    configs/nerfacto/distractor_nerfacto_base_addhash.yml

# 3. Quality retry: the additive hash at tuned shapes @3000 steps — the
#    number that decides the README recommendation (xor comparator:
#    34.73/0.9888).
run addhash_quality_tpu_retry 7200 python tools/validate_quality.py \
    --config configs/nerfacto/kubric_nerfacto_tpu_addhash.yml --steps 3000 \
    --save-dir "$Q/addhash_tpu_retry"

# 4. Full bench re-bank (flagship + extras) under the final defaults.
run bench_final 5400 python bench.py

echo "$(date -u +%FT%TZ) QUEUE_F COMPLETE" >> "$Q/q/queue_f.log"
