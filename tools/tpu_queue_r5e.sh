#!/bin/bash
# Round-5 queue, part E: step-time bench of the remaining addhash config
# twins (phototourism + distractor base — phototourism runs AT the
# descriptor floor under xor, so the additive hash is its biggest lever).
# Gates on part D (tools/tpu_queue_r5d.sh) writing QUEUE_D COMPLETE.
#
#   setsid nohup bash tools/tpu_queue_r5e.sh \
#       > /root/repo/.runs_r5/q/driver_e.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

GATE_T0=$(date +%s)
while ! grep -q "QUEUE_D COMPLETE" "$Q/q/queue_d.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 36000 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (10h); proceeding" >> "$Q/q/queue_e.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 120s" >> "$Q/q/queue_e.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_e.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_e.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_e.log"
  else
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $?)" >> "$Q/q/queue_e.log"
  fi
}

run addhash_twins_bench 3600 python tools/bench_nerfacto.py \
    configs/nerfacto/phototourism_nerfacto_base_addhash.yml \
    configs/nerfacto/distractor_nerfacto_base_addhash.yml

echo "$(date -u +%FT%TZ) QUEUE_E COMPLETE" >> "$Q/q/queue_e.log"
