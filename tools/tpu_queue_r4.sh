#!/bin/bash
# Serialized round-4 TPU work queue (see CLAUDE.md "Environment quirks":
# the remote TPU service can wedge for hours, background Bash tasks die
# with the session, so TPU work runs in ONE detached queue that probes
# before every job and skips already-completed jobs on relaunch).
#
#   setsid nohup bash tools/tpu_queue_r4.sh > /root/repo/.runs_r4/q/driver.log 2>&1 &
#
# State + logs live under /root/repo/.runs_r4 (NOT /tmp: /tmp is wiped on
# container restarts, which is how the round-3 queue was lost).
set -u
cd /root/repo
Q=/root/repo/.runs_r4
mkdir -p "$Q/q"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

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

# --- fast jobs first: bank results before any long run can hit a wedge ---
run bench 2400 python bench.py
run fwdcopy 3600 python tools/bench_fwd_copies.py
run deinterleave_off 3600 env NERF_HUGS_MXU_DEINTERLEAVE=0 \
    python tools/bench_nerfacto.py configs/nerfacto/kubric_nerfacto_base.yml
run deinterleave_on 3600 env NERF_HUGS_MXU_DEINTERLEAVE=1 \
    python tools/bench_nerfacto.py configs/nerfacto/kubric_nerfacto_base.yml
# The ~45-min jobs (flagship nerfw/hanerf/base distractor runs, HuGS vit_h
# rehearsal) live in tools/tpu_queue_r4_long.sh, which gates on the driver's
# round-boundary bench (BENCH_r04.json) AND on this queue's completion
# marker below, so the single chip never serves two clients at once.

echo "$(date -u +%FT%TZ) QUEUE COMPLETE" >> "$Q/q/queue.log"
