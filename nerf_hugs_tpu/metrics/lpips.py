"""LPIPS (AlexNet backbone) in JAX.

Learned Perceptual Image Patch Similarity (Zhang et al. 2018), the third
metric of the reference's scoring protocol (metrics.py:30-34 uses
torchmetrics' LPIPS with net_type='alex'). Pipeline:

  1. scale inputs from [0,1] to [-1,1], normalize by LPIPS shift/scale,
  2. AlexNet conv features at the 5 ReLU taps,
  3. unit-normalize each feature map across channels,
  4. squared difference, 1x1 learned linear head per layer, spatial mean,
  5. sum over layers.

This environment has no network egress, so pretrained weights cannot be
downloaded here; `LPIPS.from_weights(path)` loads them from disk — either an
.npz with keys conv{i}_w, conv{i}_b, lin{i}_w (i in 0..4), or a PyTorch
state_dict saved from the official `lpips` package (convertible via
`convert_torch_state_dict`). MetricHarness and metrics.py gate LPIPS on the
weight file being present.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.lax as lax
import jax.numpy as jnp
import numpy as np

# AlexNet conv stack: (out_ch, kernel, stride, pad). MaxPool(3, 2) sits before
# convs 1, 2 (and after conv 4, unused for features).
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
_POOL_BEFORE = {1, 2}  # conv indices preceded by a 3x3/2 max-pool
# LPIPS input normalization (the 'scaling_layer' of the official repo).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _conv(x, w, b, stride, pad):
    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NCHW", "OIHW", "NCHW"))
    y = lax.conv_general_dilated(x, w, (stride, stride),
                                 [(pad, pad), (pad, pad)],
                                 dimension_numbers=dn)
    return y + b.reshape(1, -1, 1, 1)


def _maxpool(x, window=3, stride=2):
    return lax.reduce_window(x, -jnp.inf, lax.max,
                             (1, 1, window, window), (1, 1, stride, stride),
                             "VALID")


def _alexnet_features(params: Dict[str, jnp.ndarray], x: jnp.ndarray):
    feats = []
    for i, (_, _, stride, pad) in enumerate(_ALEX_CONVS):
        if i in _POOL_BEFORE:
            x = _maxpool(x)
        x = _conv(x, params[f"conv{i}_w"], params[f"conv{i}_b"], stride, pad)
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def _unit_normalize(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Callable LPIPS distance over [H, W, 3] images in [0, 1]."""

    def __init__(self, params: Dict[str, jnp.ndarray]):
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._fn = jax.jit(self._distance)

    @classmethod
    def from_weights(cls, path: str) -> "LPIPS":
        if path.endswith(".npz"):
            params = dict(np.load(path))
        else:
            params = convert_torch_state_dict(path)
        return cls(params)

    @classmethod
    def random_init(cls, rng_seed: int = 0) -> "LPIPS":
        """Random weights — pipeline/shape testing only, not a valid metric."""
        rng = np.random.RandomState(rng_seed)
        params, in_ch = {}, 3
        for i, (out_ch, k, _, _) in enumerate(_ALEX_CONVS):
            params[f"conv{i}_w"] = rng.randn(out_ch, in_ch, k, k).astype(
                np.float32) * np.sqrt(2.0 / (in_ch * k * k))
            params[f"conv{i}_b"] = np.zeros(out_ch, np.float32)
            params[f"lin{i}_w"] = np.abs(
                rng.randn(out_ch).astype(np.float32)) * 0.01
            in_ch = out_ch
        return cls(params)

    def _distance(self, img0, img1):
        def prep(img):
            x = jnp.asarray(img, jnp.float32)
            x = 2.0 * x - 1.0
            x = (x - _SHIFT) / _SCALE
            return x[None].transpose(0, 3, 1, 2)  # NCHW

        f0 = _alexnet_features(self.params, prep(img0))
        f1 = _alexnet_features(self.params, prep(img1))
        total = 0.0
        for i, (a, b) in enumerate(zip(f0, f1)):
            d = (_unit_normalize(a) - _unit_normalize(b)) ** 2
            w = self.params[f"lin{i}_w"].reshape(1, -1, 1, 1)
            total = total + jnp.mean(jnp.sum(d * w, axis=1))
        return total

    def __call__(self, img0, img1) -> jnp.ndarray:
        return self._fn(img0, img1)


def convert_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Convert an official-lpips (or torchmetrics) AlexNet LPIPS .pt/.pth
    state_dict into our flat param dict. Conv keys live under
    net.slice{k}.{idx}.weight; linear heads under lin{i}.model.1.weight."""
    import torch
    state = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(state, "state_dict"):
        state = state.state_dict()
    out: Dict[str, np.ndarray] = {}
    conv_keys = sorted(
        (k for k in state if k.endswith(".weight") and state[k].ndim == 4
         and not k.startswith("lin") and ".lin" not in k),
        key=lambda k: tuple(int(t) for t in k.split(".") if t.isdigit()))
    if len(conv_keys) < 5:
        raise ValueError(f"expected >=5 conv weights in {path}, "
                         f"found {len(conv_keys)}")
    for i, k in enumerate(conv_keys[:5]):
        out[f"conv{i}_w"] = state[k].numpy()
        out[f"conv{i}_b"] = state[k.replace(".weight", ".bias")].numpy()
    lin_keys = sorted(k for k in state if ".lin" in k or k.startswith("lin"))
    lin_w = [k for k in lin_keys if k.endswith("weight")]
    if len(lin_w) < 5:
        raise ValueError(f"expected 5 linear heads in {path}")
    for i, k in enumerate(sorted(lin_w)[:5]):
        out[f"lin{i}_w"] = state[k].numpy().reshape(-1)
    return out
