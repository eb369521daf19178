"""Benchmark the SAM ViT-H image encoder on real TPU hardware.

The HuGS pipeline's dominant compute (reference:
HuGS/generate_static_mask.py:190-202 runs the official torch SAM on GPU) is
the 632M-param ViT-H encoder over 1024x1024 crops. This measures our flax
re-implementation's jitted forward with random weights (weights only change
values, not time), fp32 and bf16.

  python tools/bench_sam.py [vit_h|vit_l|vit_b|vit_t]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

REPEATS = 8


def main():
    model_type = sys.argv[1] if len(sys.argv) > 1 else "vit_h"
    from nerf_hugs_tpu.hugs.sam.modeling import (ImageEncoderViT,
                                                 make_sam_config)
    config = make_sam_config(model_type)
    enc = ImageEncoderViT(config)
    img = jnp.zeros((1, config.image_size, config.image_size, 3), jnp.float32)
    variables = jax.jit(enc.init)(jax.random.PRNGKey(0), img)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(variables))

    for dtype in ("float32", "bfloat16"):
        dt_vars = jax.tree_util.tree_map(
            lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x,
            variables)
        fwd = jax.jit(lambda v, x: enc.apply(v, x.astype(dtype)))
        out = fwd(dt_vars, img)
        float(out.reshape(-1)[0].astype(jnp.float32))  # tunnel barrier
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            out = fwd(dt_vars, img)
        float(out.reshape(-1)[0].astype(jnp.float32))
        dt = (time.perf_counter() - t0) / REPEATS
        print(json.dumps({
            "model": model_type, "dtype": dtype, "params": n_params,
            "sec_per_image": round(dt, 3),
            "images_per_sec": round(1.0 / dt, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
