#!/bin/bash
# Round-5 queue, part L: final bench re-run under the residual-subset
# change (commit 684dd74 trims custom-VJP residual traffic on packable
# levels — the nerfacto numbers may move a few percent; the round-close
# BENCH/PARITY should carry the shipped code's numbers).
# Gates on part K completing. State in /root/repo/.runs_r5 — gitignored,
# NOT restart-proof: harvest + commit as soon as jobs finish.
#
#   setsid nohup bash tools/tpu_queue_r5l.sh \
#       > /root/repo/.runs_r5/q/driver_l.log 2>&1 &
set -u
cd /root/repo
Q=/root/repo/.runs_r5
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

GATE_T0=$(date +%s)
while ! grep -q "QUEUE_K COMPLETE" "$Q/q/queue_k.log" 2>/dev/null; do
  if [ $(( $(date +%s) - GATE_T0 )) -ge 21600 ]; then
    echo "$(date -u +%FT%TZ) GATE timeout (6h); proceeding" >> "$Q/q/queue_l.log"
    break
  fi
  sleep 60
done
echo "$(date -u +%FT%TZ) GATE open; settling 60s" >> "$Q/q/queue_l.log"
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
    echo "$(date -u +%FT%TZ) SKIP $name (done)" >> "$Q/q/queue_l.log"
    return 0
  fi
  probe
  echo "$(date -u +%FT%TZ) START $name: $*" >> "$Q/q/queue_l.log"
  if timeout "$cap" "$@" > "$Q/q/$name.log" 2>&1; then
    touch "$Q/q/$name.done"
    echo "$(date -u +%FT%TZ) DONE  $name" >> "$Q/q/queue_l.log"
  else
    local rc=$?
    echo "$(date -u +%FT%TZ) FAIL  $name (exit $rc)" >> "$Q/q/queue_l.log"
  fi
}

run bench_shipped 3600 python bench.py

echo "$(date -u +%FT%TZ) QUEUE_L COMPLETE" >> "$Q/q/queue_l.log"
