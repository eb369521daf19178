#!/bin/bash
# Round-5 TPU queue. Gates on the round-4 LONG queue draining (its last two
# jobs — base_flagship_L, hugs_rehearsal_L — were still on the chip when
# round 5 started; two clients on the tunnel is the wedge risk class, see
# CLAUDE.md). State lives in /root/repo/.runs_r5 — gitignored, NOT
# restart-proof: harvest + commit results the moment jobs finish
# (tools/harvest_r5.py).
#
#   setsid nohup bash tools/tpu_queue_r5.sh \
#       > /root/repo/.runs_r5/q/driver.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
R4=/root/repo/.runs_r4
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# --- gate: wait for the r4 long queue to drain (cap 5 h) ------------------
r4_drained() {
  [ -f "$R4/q/base_flagship_L.done" ] || return 1
  [ -f "$R4/q/hugs_rehearsal_L.done" ] || return 1
  return 0
}
GATE_T0=$(date +%s)
while ! r4_drained; do
  # If the r4 queue PROCESS died (restart) without finishing, take over:
  # its jobs are rerun at the end of this queue (they skip on .done).
  if ! pgrep -x -f "bash tools/tpu_queue_r4_long.sh" > /dev/null 2>&1; then
    if [ $(( $(date +%s) - GATE_T0 )) -ge 300 ]; then
      echo "$(date -u +%FT%TZ) GATE: r4 long queue process gone; proceeding" \
        >> "$Q/q/queue.log"
      break
    fi
  fi
  if [ $(( $(date +%s) - GATE_T0 )) -ge 18000 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (5h); proceeding" >> "$Q/q/queue.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 120s" >> "$Q/q/queue.log"
sleep 120

cat > "$Q/q/probe.py" <<'EOF'
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("PROBE_OK", float((x @ x).sum()), "in", round(time.time() - t0, 1), "s")
EOF

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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue.log"
  else
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $?)" >> "$Q/q/queue.log"
  fi
}

# 1. Dense-size sweep: quad crossover + oct first numbers + candidate C
#    retry (VERDICT r4 #2/#3). 5 sizes x ~6 candidates.
run fwdcopy_sweep 7200 python tools/bench_fwd_copies.py

# 2. End-to-end quad A/B at base shapes (the only benched config with a
#    quad-eligible level — the 128^3 = 2^21-row dense level; tuned/photo
#    configs have none >= 512k).
run quad_off_base 3600 env NERF_HUGS_QUAD_DENSE_MIN_ROWS=0 \
    python tools/bench_nerfacto.py configs/nerfacto/kubric_nerfacto_base.yml
run quad_on_base 3600 \
    python tools/bench_nerfacto.py configs/nerfacto/kubric_nerfacto_base.yml
# 3. Max packing: quad down to the 614k (85^3) level + oct on the 128^3
#    level — only meaningful if the sweep says those tiers win; measured
#    regardless so the harvest can pick defaults from data.
run packmax_base 3600 env NERF_HUGS_QUAD_DENSE_MIN_ROWS=524288 \
    NERF_HUGS_OCT_DENSE_MIN_ROWS=1048576 \
    python tools/bench_nerfacto.py configs/nerfacto/kubric_nerfacto_base.yml

# 4. phototourism_nerfacto_base re-bench under current code (VERDICT r4
#    weak #4 — last measured round 2 at 7.56 s/step, pre-tcnn-exact).
run photo_base 3600 python tools/bench_nerfacto.py \
    configs/nerfacto/phototourism_nerfacto_base.yml

# 5. Round-5 bench preview with whatever defaults are live at this point.
run bench_r5 3600 python bench.py

# 6. Take over unfinished r4 long-queue jobs (skip on .done).
run_r4() {  # same as run but with r4 markers/logs
  local name=$1 cap=$2; shift 2
  if [ -f "$R4/q/$name.done" ]; then
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue.log"
  if timeout "$cap" "$@" > "$R4/q/$name.log" 2>&1; then
    touch "$R4/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue.log"
  else
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $?)" >> "$Q/q/queue.log"
  fi
}
run_r4 base_flagship_L 10800 python tools/validate_quality.py \
    --config configs/mipnerf360/distractor_1024_glo4_base.gin \
    --steps 3000 --save-dir "$R4/base" --distractor \
    --binding "Config.factor = 2" --binding "Model.remat_mlp = True"
run_r4 hugs_rehearsal_L 7200 python tools/rehearse_hugs_scale.py \
    --work_dir "$R4/hugs_rehearsal"

echo "$(date -u +%FT%TZ) QUEUE COMPLETE" >> "$Q/q/queue.log"
