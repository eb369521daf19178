"""Config loaders must accept every shipped reference config by name
(BASELINE.md: config names identical)."""

import glob
import os

import pytest

from nerf_hugs_tpu.configs import gin_parser, yaml_loader
from nerf_hugs_tpu.configs.config import Config

REF = "/root/reference"
GIN_FILES = sorted(glob.glob(os.path.join(REF, "MipNeRF360/configs/*.gin")))
YAML_FILES = sorted(glob.glob(os.path.join(REF, "nerfacto/configs/*.yml")))


@pytest.mark.skipif(not GIN_FILES, reason="reference configs unavailable")
@pytest.mark.parametrize("path", GIN_FILES, ids=os.path.basename)
def test_all_reference_gin_configs_parse(path):
    config = gin_parser.parse_gin_configs([path])
    assert isinstance(config, Config)


@pytest.mark.skipif(not YAML_FILES, reason="reference configs unavailable")
@pytest.mark.parametrize("path", YAML_FILES, ids=os.path.basename)
def test_all_reference_yaml_configs_parse(path):
    config = yaml_loader.load_yaml_config(path)
    assert isinstance(config, Config)
    assert config.model_type in ("nerfacto", "nerf")


# Every config WE ship (the reference-named set plus the TPU extras:
# *_nerfacto_tpu, *_addhash, bf16 overlays) must load through its dialect.
OUR_YAML = sorted(glob.glob("configs/nerfacto/*.yml"))
OUR_GIN = sorted(glob.glob("configs/mipnerf360/*.gin"))


@pytest.mark.parametrize("path", OUR_YAML, ids=os.path.basename)
def test_all_shipped_yaml_configs_parse(path):
    config = yaml_loader.load_yaml_config(path)
    assert isinstance(config, Config)
    assert config.model_type in ("nerfacto", "nerf")


@pytest.mark.parametrize("path", OUR_GIN, ids=os.path.basename)
def test_all_shipped_gin_configs_parse(path):
    config = gin_parser.parse_gin_configs([path])
    assert isinstance(config, Config)


def test_gin_values_land_correctly():
    path = os.path.join(REF, "MipNeRF360/configs/360.gin")
    if not os.path.exists(path):
        pytest.skip("reference unavailable")
    config = gin_parser.parse_gin_configs([path])
    assert config.dataset_loader == "llff"
    assert config.near == 0.2 and config.far == 1e6
    assert config.model.raydist_fn == "reciprocal"
    assert config.model.opaque_background is True
    assert config.prop_mlp.warp_fn == "contract"
    assert config.prop_mlp.net_depth == 4
    assert config.prop_mlp.disable_rgb is True
    assert config.nerf_mlp.net_width == 1024
    assert config.nerf_mlp.warp_fn == "contract"


def test_strongreg_overlay_only_changes_the_reg():
    """distractor_1024_glo4_nerfw_strongreg.gin is a one-knob overlay: the
    measured fix for the flagship NeRF-W transient-absorption collapse
    (PARITY.md). Everything else must stay identical to the parity gin."""
    base = gin_parser.parse_gin_configs(
        ["configs/mipnerf360/distractor_1024_glo4_nerfw.gin"])
    strong = gin_parser.parse_gin_configs(
        ["configs/mipnerf360/distractor_1024_glo4_nerfw_strongreg.gin"])
    assert base.nerfw_density_loss_mult == 0.01   # reference value
    assert strong.nerfw_density_loss_mult == 0.3
    import dataclasses
    for f in dataclasses.fields(base):
        if f.name == "nerfw_density_loss_mult":
            continue
        assert getattr(base, f.name) == getattr(strong, f.name), f.name


def test_gin_bindings_override():
    config = gin_parser.parse_gin_configs(
        [], bindings=["Config.batch_size = 1024",
                      "Config.data_dir = '/tmp/x'",
                      "Model.num_glo_features = 4"])
    assert config.batch_size == 1024
    assert config.data_dir == "/tmp/x"
    assert config.model.num_glo_features == 4
    # finetune aliases resolve to the overridden batch size.
    assert config.finetune_batch_size == 1024


def test_gin_scoped_bindings_rejected_loudly():
    # The reference wraps its drivers in gin.config_scope('train'/'eval')
    # (MipNeRF360/train.py:290, eval.py:254) but no shipped config uses a
    # scoped binding; the parser deliberately rejects them instead of
    # silently misbinding (gin_parser module docstring).
    with pytest.raises(gin_parser.GinParseError, match="scopes"):
        gin_parser.parse_gin_configs(
            [], bindings=["train/Config.batch_size = 1024"])


def test_yaml_values_land_correctly():
    path = os.path.join(REF, "nerfacto/configs/kubric_nerfacto_base.yml")
    if not os.path.exists(path):
        pytest.skip("reference unavailable")
    config = yaml_loader.load_yaml_config(path)
    assert config.dataset_loader == "kubric"
    assert config.factor == 2
    assert config.batch_size == 16384
    assert config.max_steps == 25000
    assert config.image_num_per_batch == 64
    assert config.nerfacto.log2_hashmap_size == 21
    assert config.nerfacto.num_proposal_samples_per_ray == (256,)
    assert config.nerfacto.opaque_background is True
    assert config.data_loss_type == "mse"
    assert config.distortion_loss_mult == 0.0


def test_config_roundtrip_snapshot(tmp_path):
    config = Config(batch_size=2048)
    gin_text = gin_parser.config_str(config)
    assert "Config.batch_size = 2048" in gin_text
    yaml_loader.save_yaml_config(config, str(tmp_path / "config.yml"))
    assert (tmp_path / "config.yml").exists()


def test_kubric_robustnerf_gin_needs_patch_size_binding():
    """Reference quirk, pinned: kubric_1024_robustnerf0.8.gin (both repos)
    inherits patch_size=1 while robustnerf_inner_patch_size defaults to 8,
    so running it unmodified trips the same guard the reference asserts
    (train_utils.py:276-277: 'patch_size must be larger than
    robustnerf_inner_patch_size'). The reference's distractor robustnerf
    config sets Config.patch_size = 16; a binding restores the kubric run.
    """
    import jax.numpy as jnp

    from nerf_hugs_tpu.losses import zoo

    path = "configs/mipnerf360/kubric_1024_robustnerf0.8.gin"
    config = gin_parser.parse_gin_configs([path])
    assert config.patch_size == 1  # the quirk
    errors = jnp.ones((4, config.patch_size, config.patch_size, 3)) * 0.01
    with pytest.raises(ValueError, match="inner_patch_size"):
        zoo.robustnerf_mask(errors, 0.5, config)

    fixed = gin_parser.parse_gin_configs(
        [path], bindings=["Config.patch_size = 16"])
    errors = jnp.ones((4, 16, 16, 3)) * 0.01
    mask, stats = zoo.robustnerf_mask(errors, 0.5, fixed)
    assert mask.shape == (4, 16, 16, 1)
    assert float(stats["mask"]) == 1.0  # all errors under threshold


def test_every_hugs_yaml_parses_into_segment_config():
    """Every shipped configs/hugs/*.yml constructs a SegmentConfig through
    the generate_static_mask.py CLI's exact load path."""
    import glob

    import yaml

    import generate_static_mask as gsm

    paths = sorted(glob.glob("configs/hugs/*.yml"))
    assert paths, "no hugs configs shipped"
    for path in paths:
        with open(path) as f:
            config = gsm.SegmentConfig(**yaml.safe_load(f.read()))
        assert config.sam_points_per_side > 0
        budget = config.sam_max_masks_per_batch
        assert budget is None or 0 < budget <= 3 * config.sam_points_per_batch
