"""RobustNeRF distractor dataset loader. Parity: datasets.py:1264-1399."""
from nerf_hugs_tpu.data import base


class Distractor(base.Dataset):
    def _load_renderings(self, config):
        raise NotImplementedError("Distractor loader lands with the COLMAP data pass")
