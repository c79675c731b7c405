"""Full-network fp32 parity: torch twin -> converter -> flax, outputs
compared end-to-end. This is the composition test behind checkpoint-import
fidelity (the reference's ``model525000.pt`` eval-parity contract)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from lss_carla_tpu.models.camencode import CamEncode
from lss_carla_tpu.models.bevencode import BevEncode
from lss_carla_tpu.utils.convert import torch_state_dict_to_variables

from torch_twin import TorchLSSTwin, randomize_bn_stats

pytestmark = pytest.mark.slow  # full-model CPU compiles


@pytest.fixture(scope="module")
def twin_and_vars():
    rng = np.random.default_rng(7)
    torch.manual_seed(7)
    twin = TorchLSSTwin(D=41, C=64, outC=1, img_hw=(64, 192))
    randomize_bn_stats(twin, rng)
    twin.eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()
          if "_pad" not in k}
    variables = torch_state_dict_to_variables(sd)
    return twin, variables, rng


def test_camencode_full_parity(twin_and_vars):
    twin, variables, rng = twin_and_vars
    x = rng.normal(size=(2, 3, 64, 192)).astype(np.float32)
    with torch.no_grad():
        want = twin.camencode(torch.from_numpy(x)).numpy()  # (B, C, D, h, w)

    cam = CamEncode(D=41, C=64)
    got, _ = cam.apply(
        {"params": variables["params"]["camencode"],
         "batch_stats": variables["batch_stats"]["camencode"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    # ours: (B, D, h, w, C) -> torch (B, C, D, h, w)
    got = np.transpose(np.asarray(got), (0, 4, 1, 2, 3))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_bevencode_full_parity(twin_and_vars):
    twin, variables, rng = twin_and_vars
    x = rng.normal(size=(1, 64, 64, 64)).astype(np.float32)  # (B,C,X,Y)
    with torch.no_grad():
        want = twin.bevencode(torch.from_numpy(x)).numpy()

    bev = BevEncode(outC=1)
    got = bev.apply(
        {"params": variables["params"]["bevencode"],
         "batch_stats": variables["batch_stats"]["bevencode"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)), False)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_end_to_end_lss_forward_parity(rng):
    """The COMPLETE pipeline — geometry, lift, voxel pooling, BEV decode —
    matches an independent torch implementation elementwise."""
    from lss_carla_tpu.configs import DataAugConf, GridConf
    from lss_carla_tpu.models.lss import compile_model
    from lss_carla_tpu.ops.geometry import create_frustum
    from torch_twin import torch_full_lss_forward

    grid_conf = GridConf(xbound=(-50.0, 50.0, 1.5625),
                         ybound=(-50.0, 50.0, 1.5625),
                         zbound=(-10.0, 10.0, 20.0),
                         dbound=(4.0, 45.0, 8.0))
    aug_conf = DataAugConf(H=128, W=384, final_dim=(64, 192))
    D = grid_conf.num_depth_bins

    torch.manual_seed(3)
    twin = TorchLSSTwin(D=D, C=64, outC=1, img_hw=(64, 192))
    randomize_bn_stats(twin, rng)
    twin.eval()
    sd = {k: v.detach().numpy() for k, v in twin.state_dict().items()
          if "_pad" not in k}
    variables = torch_state_dict_to_variables(sd)

    B, N = 1, 3
    x = rng.normal(size=(B, N, 3, 64, 192)).astype(np.float32)
    rots = np.linalg.qr(rng.normal(size=(B, N, 3, 3)))[0].astype(np.float32)
    trans = rng.normal(size=(B, N, 3)).astype(np.float32)
    intrins = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    intrins[..., 0, 0] = intrins[..., 1, 1] = 100.0
    intrins[..., 0, 2], intrins[..., 1, 2] = 96.0, 32.0
    post_rots = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_rots[..., 0, 0] = rng.uniform(0.8, 1.2, size=(B, N))
    post_trans = np.zeros((B, N, 3), dtype=np.float32)

    frustum = create_frustum(aug_conf.final_dim, 16, grid_conf.dbound)
    with torch.no_grad():
        want = torch_full_lss_forward(
            twin, grid_conf, frustum,
            torch.from_numpy(x), torch.from_numpy(rots),
            torch.from_numpy(trans), torch.from_numpy(intrins),
            torch.from_numpy(post_rots), torch.from_numpy(post_trans))

    model = compile_model(grid_conf, aug_conf, outC=1)
    got = model.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), jnp.asarray(rots), jnp.asarray(trans),
        jnp.asarray(intrins), jnp.asarray(post_rots),
        jnp.asarray(post_trans), train=False)
    got = np.asarray(got)
    assert got.shape == want.shape == (B, 1, 64, 64)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-2)
