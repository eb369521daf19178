#!/bin/bash
# Round-5 queue, part C: the corner-packed BACKWARD A/B
# (NERF_HUGS_PACK_BWD=1 — see ops/hashgrid._pack_bwd_enabled). Gates on
# part B (tools/tpu_queue_r5b.sh) writing QUEUE_B COMPLETE. State in
# /root/repo/.runs_r5 — gitignored: harvest + commit promptly.
#
#   setsid nohup bash tools/tpu_queue_r5c.sh \
#       > /root/repo/.runs_r5/q/driver_c.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

GATE_T0=$(date +%s)
while ! grep -q "QUEUE_B COMPLETE" "$Q/q/queue_b.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 32400 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (9h); proceeding" >> "$Q/q/queue_c.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 120s" >> "$Q/q/queue_c.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_c.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_c.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_c.log"
  else
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $?)" >> "$Q/q/queue_c.log"
  fi
}

# Packed-backward A/B. The OFF sides come from addhash_bench (part B) and
# BENCH_r04 (xor base 2.827 s/step), so only the ON sides run here; xor
# base included because its dense levels pack too.
run packbwd_addhash 3600 env NERF_HUGS_PACK_BWD=1 \
    python tools/bench_nerfacto.py \
    configs/nerfacto/kubric_nerfacto_base_addhash.yml \
    configs/nerfacto/kubric_nerfacto_tpu_addhash.yml
run packbwd_xor_base 3600 env NERF_HUGS_PACK_BWD=1 \
    python tools/bench_nerfacto.py \
    configs/nerfacto/kubric_nerfacto_base.yml

echo "$(date -u +%FT%TZ) QUEUE_C COMPLETE" >> "$Q/q/queue_c.log"
