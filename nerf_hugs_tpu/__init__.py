"""nerf_hugs_tpu: a TPU-native rebuild of the NeRF-HuGS capability set.

One JAX/XLA codebase replacing the reference's two-environment split
(JAX MipNeRF360 fork + PyTorch nerfacto/HuGS; see /root/repo/SURVEY.md).

Layout:
  core/      pure-jnp ray math: stepfuns, coordinate warps, volume rendering
  ops/       TPU kernels (Pallas) + jnp reference paths: hash grid, fused MLP, SH
  cameras/   intrinsics, poses, pixel->ray casting, COLMAP binary reader
  data/      dataset registry and host-side ray-batch pipelines
  models/    field networks + proposal sampling pipelines (mipnerf360, nerfacto, vanilla)
  losses/    data / withmask / robustnerf / nerfw / hanerf / interlevel / distortion
  train/     TrainState, optimizers, sharded train step, chunked renderer
  parallel/  mesh construction and sharding helpers
  hugs/      heuristics-guided segmentation (SAM + residual + SfM heuristics)
  metrics/   PSNR / SSIM / LPIPS / color correction
  configs/   unified config dataclass + gin-name and yaml-name loaders
  utils/     ray/batch pytrees, image IO, visualization
"""

__version__ = "0.1.0"
