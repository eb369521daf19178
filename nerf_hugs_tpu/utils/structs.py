"""Ray/batch pytrees shared by the data layer and all models.

Flat struct-of-arrays containers: every leaf shares the leading batch dims so
the whole Batch shards cleanly on a ('data',) mesh axis. Field set matches the
reference (MipNeRF360/internal/utils.py:31-96) so dataset/model contracts are
interchangeable.
"""

from __future__ import annotations

import enum
from typing import Any, Optional, Union

import flax
import jax.numpy as jnp
import numpy as np

Array = Union[np.ndarray, jnp.ndarray]


@flax.struct.dataclass
class Pixels:
    """Pre-ray pixel batch (image-space sampling, cast to Rays on device)."""
    pix_x_int: Array
    pix_y_int: Array
    lossmult: Array
    static_mask: Array
    near: Array
    far: Array
    embed_idx: Array
    cam_idx: Array


@flax.struct.dataclass
class Rays:
    """Flat ray batch; radii feed the Mip-NeRF cone casting."""
    pix_coords: Array     # [..., 2] normalized (x, y) pixel coords (HaNeRF mask)
    origins: Array        # [..., 3]
    directions: Array     # [..., 3] unnormalized (carry pixel-area scaling)
    viewdirs: Array       # [..., 3] unit direction
    radii: Array          # [..., 1] base radius of the pixel cone at t=1
    lossmult: Array       # [..., 1]
    static_mask: Array    # [..., 1] HuGS static mask value in [0, 1]
    near: Array           # [..., 1]
    far: Array            # [..., 1]
    embed_idx: Array      # [..., 1] int32 per-image embedding index
    cam_idx: Array        # [..., 1] int32 camera index


def dummy_rays(batch_size: int = 1) -> Rays:
    """Zero rays for model init (shape contract only, values unused)."""
    z = lambda n: jnp.zeros((batch_size, n))
    zi = lambda n: jnp.zeros((batch_size, n), jnp.int32)
    return Rays(pix_coords=z(2), origins=z(3), directions=z(3), viewdirs=z(3),
                radii=z(1), lossmult=z(1), static_mask=z(1), near=z(1),
                far=z(1), embed_idx=zi(1), cam_idx=zi(1))


@flax.struct.dataclass
class Batch:
    """One training/eval batch: rays plus (optionally) supervision."""
    rays: Union[Pixels, Rays]
    rgb: Optional[Array] = None


class DataSplit(enum.Enum):
    TRAIN = "train"
    TEST = "test"


class BatchingMethod(enum.Enum):
    """Sample each batch from all images or a few (patch-friendly) images."""
    ALL_IMAGES = "all_images"
    SINGLE_IMAGE = "single_image"


def tree_len(tree: Any) -> int:
    import jax
    leaves = jax.tree_util.tree_leaves(tree)
    return leaves[0].shape[0] if leaves else 0
