"""Field-level parity vs the reference's TORCH vanilla-NeRF MLP.

Builds the reference torch MLP (importable — no tinycudann in nerf.py's MLP),
maps its weights through models.torch_compat into our PointMLP, and checks
density/rgb agree on identical inputs. Validates both the architecture and
the released-checkpoint weight mapping for the third backbone.
"""

import os
import sys

import numpy as np
import pytest

REF_NERFACTO = "/root/reference/nerfacto"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_NERFACTO), reason="reference checkout unavailable")


@pytest.fixture(scope="module")
def torch_mlp_cls():
    import types
    # models/__init__.py imports nerfacto.py which imports tinycudann (not
    # vendored here); the vanilla MLP itself doesn't use it — stub it.
    tcnn = types.ModuleType("tinycudann")
    tcnn.Encoding = object
    tcnn.Network = object
    tcnn.NetworkWithInputEncoding = object
    sys.modules.setdefault("tinycudann", tcnn)
    if REF_NERFACTO not in sys.path:
        sys.path.insert(0, REF_NERFACTO)
    try:
        from models.nerf import MLP as TorchMLP
    finally:
        # Don't shadow OUR top-level train.py/eval.py later.
        sys.path.remove(REF_NERFACTO)
    return TorchMLP


@pytest.mark.parametrize("transient", [False, True])
def test_point_mlp_matches_torch(torch_mlp_cls, transient):
    import jax
    import jax.numpy as jnp
    import torch

    from nerf_hugs_tpu.configs.config import MLPConfig
    from nerf_hugs_tpu.models.torch_compat import convert_point_mlp
    from nerf_hugs_tpu.models.vanilla import PointMLP

    torch.manual_seed(0)
    net_depth, net_width = 4, 64
    tra_dim = 8 if transient else 0
    torch_mlp = torch_mlp_cls(
        net_depth=net_depth, net_width=net_width, bottleneck_width=32,
        net_width_viewdirs=32, appearance_embedding_dim=0,
        transient_embedding_dim=tra_dim, net_depth_transient=2,
        net_width_transient=16, max_deg_point=8, spatial_distortion=None)
    torch_mlp.eval()

    cfg = MLPConfig(net_depth=net_depth, net_width=net_width,
                    bottleneck_width=32, net_width_viewdirs=32,
                    max_deg_point=8, net_depth_transient=2,
                    net_width_transient=16)
    my_mlp = PointMLP(cfg, use_contraction=False, transient=transient)

    rng = np.random.RandomState(0)
    positions = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    dirs = rng.randn(64, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    emb_t = (rng.randn(64, tra_dim).astype(np.float32) if transient else None)

    with torch.no_grad():
        out_t = torch_mlp(torch.tensor(positions), torch.tensor(dirs), None,
                          torch.tensor(emb_t) if transient else None)

    params = convert_point_mlp(
        {k: v.numpy() for k, v in torch_mlp.state_dict().items()},
        net_depth=net_depth, transient=transient, net_depth_transient=2)
    out_j = my_mlp.apply(
        {"params": params}, None, jnp.asarray(positions), jnp.asarray(dirs),
        None, jnp.asarray(emb_t) if transient else None)

    np.testing.assert_allclose(np.asarray(out_j["density"]),
                               out_t["density"].numpy()[:, 0], atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_j["rgb"]),
                               out_t["rgb"].numpy(), atol=2e-4)
    if transient:
        np.testing.assert_allclose(np.asarray(out_j["density_transient"]),
                                   out_t["density_transient"].numpy()[:, 0],
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_j["rgb_transient"]),
                                   out_t["rgb_transient"].numpy(), atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_j["uncertainty"])[:, 0],
                                   out_t["uncertainty"].numpy()[:, 0],
                                   atol=2e-4)
