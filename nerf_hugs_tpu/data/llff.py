"""LLFF (COLMAP-posed forward-facing / 360 captures) loader.

Parity target: MipNeRF360/internal/datasets.py:633-785. Implemented later
this round; real-data layout requires COLMAP sparse/0 + images_{factor}.
"""
from nerf_hugs_tpu.data import base


class LLFF(base.Dataset):
    def _load_renderings(self, config):
        raise NotImplementedError(
            "LLFF loader lands with the COLMAP data pass; use kubric/blender/"
            "synthetic meanwhile")
