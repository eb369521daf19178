"""Shared tiny config for the 2-process multihost test — imported by both
the worker (under jax.distributed) and the parent pytest process (which
renders the single-process reference image), so no jax side effects here."""

from nerf_hugs_tpu.configs.config import Config, MLPConfig


def tiny_mh_config() -> Config:
    config = Config(
        dataset_loader="synthetic", batch_size=512, patch_size=1,
        image_num_per_batch=4, near=0.5, far=6.0, max_steps=10,
        lr_init=2e-3, lr_final=2e-4, lr_delay_steps=2,
        grad_max_norm=0.0, grad_max_val=0.0, data_loss_type="mse",
        interlevel_loss_mult=1.0, distortion_loss_mult=0.0,
        render_chunk_size=512)
    config.model.num_prop_samples = 8
    config.model.num_nerf_samples = 4
    config.model.num_levels = 2
    config.nerf_mlp = MLPConfig(net_depth=2, net_width=32,
                                bottleneck_width=16, net_width_viewdirs=16,
                                max_deg_point=4)
    config.prop_mlp = MLPConfig(net_depth=2, net_width=16, disable_rgb=True,
                                max_deg_point=4)
    return config
