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
