"""Phototourism (IMC-PT) loader. Parity: datasets.py:1115-1261."""
from nerf_hugs_tpu.data import base


class Phototourism(base.Dataset):
    def _load_renderings(self, config):
        raise NotImplementedError("Phototourism loader lands with the COLMAP data pass")
