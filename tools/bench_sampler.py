"""Host-side data-pipeline throughput: native C++ sampler vs numpy fallback.

The producer thread must sustain batch_size rays/step faster than the
device consumes them (TPU-tuned nerfacto: 16384 rays / 0.87 s = 19k rays/s;
vanilla: 47k rays/s). This measures raw sampling throughput over a
synthetic 64-image scene — the same work the reference's datasets.py
per-step fancy indexing does (MipNeRF360/internal/datasets.py:560-640).

  python tools/bench_sampler.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_IMAGES = 64
H, W = 512, 512
BATCH = 16384
PATCH = 16
REPEATS = 50


def main():
    rng = np.random.RandomState(0)
    images = [rng.rand(H, W, 3).astype(np.float32) for _ in range(N_IMAGES)]
    masks = [np.ones((H, W), np.float32) for _ in range(N_IMAGES)]
    nears = [np.full((H, W), 0.1, np.float32) for _ in range(N_IMAGES)]
    fars = [np.full((H, W), 4.0, np.float32) for _ in range(N_IMAGES)]
    embeds = list(range(N_IMAGES))

    from nerf_hugs_tpu.data import native_sampler
    sampler = native_sampler.NativeSampler(images, masks, nears, fars, embeds)
    n_patches = BATCH // (PATCH * PATCH)

    sampler.sample(0, n_patches, PATCH, 1, 8)  # warm the thread pool
    t0 = time.perf_counter()
    for i in range(REPEATS):
        sampler.sample(i, n_patches, PATCH, 1, 8)
    dt = (time.perf_counter() - t0) / REPEATS
    print(json.dumps({
        "path": "native", "threads": sampler.num_threads,
        "batch": BATCH, "sec_per_batch": round(dt, 5),
        "rays_per_sec": round(BATCH / dt, 0),
    }), flush=True)


if __name__ == "__main__":
    main()
