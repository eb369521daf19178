"""Chunked full-image rendering over the device mesh.

Parity target: MipNeRF360/internal/models.py:568-649. Chunks of
render_chunk_size rays are edge-padded to a device multiple, sharded over the
('data',) mesh axis, rendered by the jitted eval fn, fetched, and reassembled
into H x W buffers. 'ray_*' keys are treated as bags of rays for
visualization, not image buffers.
"""

from __future__ import annotations

from typing import Any, Callable, MutableMapping

import jax
import numpy as np

from nerf_hugs_tpu.parallel import mesh as mesh_lib
from nerf_hugs_tpu.utils import structs


def render_image(render_fn: Callable, rays: structs.Rays, train_frac,
                 variables, config, mesh, verbose: bool = False
                 ) -> MutableMapping[str, Any]:
    """Render every pixel of an image.

    render_fn: jitted (variables, train_frac, rays) -> (renderings, history).
    rays: [H, W, ...] Rays pytree (host or device).
    """
    height, width = rays.origins.shape[:2]
    num_rays = height * width
    rays = jax.tree_util.tree_map(
        lambda r: np.asarray(r).reshape((num_rays, -1)), rays)

    num_devices = max(1, len(mesh.devices.flatten()))
    chunk_size = config.render_chunk_size
    chunks = []
    idx0s = range(0, num_rays, chunk_size)
    for i_chunk, idx0 in enumerate(idx0s):
        if verbose and i_chunk % max(1, len(idx0s) // 10) == 0:
            print(f"Rendering chunk {i_chunk}/{len(idx0s) - 1}")
        chunk_rays = jax.tree_util.tree_map(
            lambda r: r[idx0:idx0 + chunk_size], rays)
        chunk_rays, padding = mesh_lib.pad_to_multiple(chunk_rays, num_devices)
        # Every host holds the full ray chunk; split it across ALL hosts'
        # devices (reference models.py:611-616 host-split semantics).
        chunk_rays = mesh_lib.put_global(chunk_rays, mesh)
        chunk_renderings, _ = render_fn(variables, train_frac, chunk_rays)
        chunk_renderings = jax.device_get(chunk_renderings)
        if padding > 0:
            # Trim pad rows from per-ray buffers only: the 'ray_*' vis bags
            # were already subsampled to vis_num_rays inside the model, so
            # their leading axis is not aligned with the padded chunk.
            chunk_renderings = [
                {k: (v if k.startswith("ray_") else v[:-padding])
                 for k, v in level.items()}
                for level in chunk_renderings]
        # Final level's buffers + every level's ray_* bags.
        chunk_rendering = chunk_renderings[-1]
        for k in chunk_renderings[0]:
            if k.startswith("ray_"):
                chunk_rendering[k] = [r[k] for r in chunk_renderings]
        chunks.append(chunk_rendering)

    rendering = jax.tree_util.tree_map(
        lambda *args: np.concatenate(args), *chunks)
    for k, z in rendering.items():
        if not k.startswith("ray_"):
            rendering[k] = z.reshape((height, width) + z.shape[1:])

    # Subsample a deterministic bundle of visualization rays.
    ray_keys = [k for k in rendering if k.startswith("ray_")]
    if ray_keys:
        n = rendering[ray_keys[0]][0].shape[0]
        perm = jax.random.permutation(jax.random.PRNGKey(0), n)
        idx = np.asarray(perm[:config.vis_num_rays])
        for k in ray_keys:
            rendering[k] = [r[idx] for r in rendering[k]]
    return rendering
