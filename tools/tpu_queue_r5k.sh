#!/bin/bash
# Round-5 queue, part K: retry of the part-J xor control.
#
# xor_tuned_ctl hung at step 2700/3000 (client-side tunnel stall: the log
# froze for 19 min while a fresh tiny-op probe client succeeded in 53 s) and
# was killed by exact PID. Its save-dir holds checkpoints through step 2500,
# and validate_quality drives the real train.py driver, which RESUMES — the
# retry costs ~500 steps + the final held-out eval, not a full run.
# Gates on part J completing. State in /root/repo/.runs_r5 — gitignored,
# NOT restart-proof: harvest + commit as soon as jobs finish.
#
#   setsid nohup bash tools/tpu_queue_r5k.sh \
#       > /root/repo/.runs_r5/q/driver_k.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

GATE_T0=$(date +%s)
while ! grep -q "QUEUE_J COMPLETE" "$Q/q/queue_j.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 18000 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (5h); proceeding" >> "$Q/q/queue_k.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 60s" >> "$Q/q/queue_k.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_k.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_k.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_k.log"
  else
    local rc=$?
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $rc)" >> "$Q/q/queue_k.log"
  fi
}

run xor_tuned_ctl_retry 5400 python tools/validate_quality.py \
    --config configs/nerfacto/kubric_nerfacto_tpu.yml \
    --steps 3000 --save-dir "$Q/xor_tuned_ctl"

echo "$(date -u +%FT%TZ) QUEUE_K COMPLETE" >> "$Q/q/queue_k.log"
