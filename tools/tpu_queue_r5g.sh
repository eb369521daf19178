#!/bin/bash
# Round-5 queue, part G: HuGS AMG throughput sweep.
#
# Part D's rehearsal landed 135.5 s/image steady with the default
# points_per_batch=64 and NO transfer budget (every decoder batch ships
# the full 3*64-candidate bit-packed block, ~19 MB, through the tunnel).
# Two independent levers, measured in isolation and together against the
# banked 135.5 s/image control:
#   1. hugs_ppb64_mm64   — transfer budget only  (19 -> 6.3 MB/batch)
#   2. hugs_ppb256_mm0   — dispatch count only   (128 -> 32 jit calls/img)
#   3. hugs_ppb256_mm64  — both
# Gates on queue F being COMPLETE so the chip never sees two clients.
# State in /root/repo/.runs_r5 — gitignored, NOT restart-proof: harvest +
# commit as soon as jobs finish.
#
#   setsid nohup bash tools/tpu_queue_r5g.sh \
#       > /root/repo/.runs_r5/q/driver_g.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

# --- gate: wait for part F to drain (cap 2 h) ------------------------------
GATE_T0=$(date +%s)
while ! grep -q "QUEUE_F COMPLETE" "$Q/q/queue_f.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 7200 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (2h); proceeding" >> "$Q/q/queue_g.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 60s" >> "$Q/q/queue_g.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_g.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_g.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_g.log"
  else
    local rc=$?
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $rc)" >> "$Q/q/queue_g.log"
  fi
}

run hugs_ppb64_mm64 3600 python tools/rehearse_hugs_scale.py \
    --points_per_batch 64 --max_masks 64 --work_dir "$Q/hugs_g_mm64"

run hugs_ppb256_mm0 3600 python tools/rehearse_hugs_scale.py \
    --points_per_batch 256 --work_dir "$Q/hugs_g_ppb256"

run hugs_ppb256_mm64 3600 python tools/rehearse_hugs_scale.py \
    --points_per_batch 256 --max_masks 64 --work_dir "$Q/hugs_g_both"

echo "$(date -u +%FT%TZ) QUEUE_G COMPLETE" >> "$Q/q/queue_g.log"
