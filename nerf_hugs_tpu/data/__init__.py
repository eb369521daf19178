"""Dataset registry (reference names: MipNeRF360/internal/datasets.py:57-66,
nerfacto/datasets/__init__.py:1-13)."""

from __future__ import annotations

from nerf_hugs_tpu.configs.config import Config


def dataset_registry():
    from nerf_hugs_tpu.data import blender, kubric, llff, phototourism, \
        distractor, synthetic
    return {
        "blender": blender.Blender,
        "llff": llff.LLFF,
        "kubric": kubric.Kubric,
        "phototourism": phototourism.Phototourism,
        "distractor": distractor.Distractor,
        "synthetic": synthetic.Synthetic,
        "synthetic_distractor": synthetic.SyntheticDistractor,
        "synthetic_appearance": synthetic.SyntheticAppearance,
        # Stubs, matching the reference's NotImplementedError datasets.
        "tat_nerfpp": _not_implemented_loader("TanksAndTemplesNerfPP"),
        "tat_fvs": _not_implemented_loader("TanksAndTemplesFVS"),
        "dtu": _not_implemented_loader("DTU"),
    }


def load_dataset(split: str, data_dir: str, config: Config,
                 is_training: bool = None, sample_from_half_image: bool = False,
                 batch_size: int = None, patch_size: int = None,
                 patch_dilation: int = None, image_num_per_batch: int = None):
    """Construct the configured dataset (starts its prefetch thread)."""
    registry = dataset_registry()
    if config.dataset_loader not in registry:
        raise ValueError(
            f"unknown dataset_loader {config.dataset_loader!r}; "
            f"options: {sorted(registry)}")
    cls = registry[config.dataset_loader]
    if is_training is None:
        is_training = split == "train"
    return cls(
        split=split,
        is_training=is_training,
        sample_from_half_image=sample_from_half_image,
        batch_size=config.batch_size if batch_size is None else batch_size,
        patch_size=config.patch_size if patch_size is None else patch_size,
        patch_dilation=(config.patch_dilation if patch_dilation is None
                        else patch_dilation),
        image_num_per_batch=(config.image_num_per_batch
                             if image_num_per_batch is None
                             else image_num_per_batch),
        data_dir=data_dir,
        config=config)


def _not_implemented_loader(name):
    from nerf_hugs_tpu.data import base

    class _Stub(base.Dataset):
        def _load_renderings(self, config):
            raise NotImplementedError(
                f"{name} is a stub in the reference too "
                "(MipNeRF360/internal/datasets.py:792,841,908)")
    _Stub.__name__ = name
    return _Stub
