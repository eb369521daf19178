#!/bin/bash
# Long-job TPU queue for round 4 (companion to tpu_queue_r4.sh, which keeps
# the <15-min jobs). These four jobs are ~45 min each and WOULD straddle the
# round boundary, contending with the driver's end-of-round bench.py on the
# single TPU chip (two clients on the tunnel is the wedge risk class — see
# CLAUDE.md). So this queue GATES on the driver's BENCH_r04.json appearing
# (round-4 bench banked) before starting, with a 4 h cap in case the file
# never lands or is named differently.
#
#   setsid nohup bash tools/tpu_queue_r4_long.sh \
#       > /root/repo/.runs_r4/q/driver_long.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r4
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# --- round-boundary gate -------------------------------------------------
GATE_T0=$(date +%s)
while [ ! -f /root/repo/BENCH_r04.json ]; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 14400 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (4h); proceeding" >> "$Q/q/queue_long.log"
    break
  fi
  sleep 60
done
if [ -f /root/repo/BENCH_r04.json ]; then
  echo "$(date -u +%FT%TZ) GATE open (BENCH_r04.json present); settling 180s" \
    >> "$Q/q/queue_long.log"
  sleep 180
fi
# Also wait for the short queue to be fully drained. Key on its per-job
# .done markers, NOT the append-only queue.log: a previous pass's
# "QUEUE COMPLETE" line would open the gate while a relaunched short queue
# is still re-running failed jobs — two clients on the one chip.
short_drained() {
  local j
  for j in bench fwdcopy deinterleave_off deinterleave_on; do
    [ -f "$Q/q/$j.done" ] || return 1
  done
  return 0
}
SHORT_T0=$(date +%s)
while ! short_drained; do
  if [ $(( $(date +%s) - SHORT_T0 )) -ge 7200 ]; then
    echo "$(date -u +%FT%TZ) short-queue wait timeout; proceeding" \
      >> "$Q/q/queue_long.log"
    break
  fi
  sleep 60
done

cat > "$Q/q/probe_long.py" <<'EOF'
import time
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((128, 128))
print("PROBE_OK", float((x @ x).sum()), "in", round(time.time() - t0, 1), "s")
EOF

probe() {
  while true; do
    if timeout 420 python "$Q/q/probe_long.py" >> "$Q/q/probe_long.log" 2>&1; then
      return 0
    fi
    echo "$(date -u +%FT%TZ) probe failed/hung; retry in 300s" >> "$Q/q/probe_long.log"
    sleep 300
  done
}

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 cap=$2; shift 2
  if [ -f "$Q/q/$name.done" ]; then
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_long.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_long.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_long.log"
  else
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $?)" >> "$Q/q/queue_long.log"
  fi
}

# VERDICT r3 #1: flagship-width nerfw / hanerf / base on the poisoned scene
# (3000 steps each; factor=2 binding because the distractor gins' factor=8
# would shrink the 192x256 synthetic scene to 24x32; the base anchor needs
# --distractor or validate_quality picks the CLEAN scene). nerfw/hanerf
# first: they close the last unvalidated §2.g cell.
run nerfw_flagship_L 10800 python tools/validate_quality.py \
    --config configs/mipnerf360/distractor_1024_glo4_nerfw.gin \
    --steps 3000 --save-dir "$Q/nerfw" \
    --binding "Config.factor = 2" --binding "Model.remat_mlp = True"
run hanerf_flagship_L 10800 python tools/validate_quality.py \
    --config configs/mipnerf360/distractor_1024_glo4_hanerf.gin \
    --steps 3000 --save-dir "$Q/hanerf" \
    --binding "Config.factor = 2" --binding "Model.remat_mlp = True"
run base_flagship_L 10800 python tools/validate_quality.py \
    --config configs/mipnerf360/distractor_1024_glo4_base.gin \
    --steps 3000 --save-dir "$Q/base" --distractor \
    --binding "Config.factor = 2" --binding "Model.remat_mlp = True"
# VERDICT r3 #3: HuGS production-scale rehearsal (vit_h shapes, random init).
run hugs_rehearsal_L 7200 python tools/rehearse_hugs_scale.py \
    --work_dir "$Q/hugs_rehearsal"

echo "$(date -u +%FT%TZ) LONG QUEUE COMPLETE" >> "$Q/q/queue_long.log"
