"""ResNet camera-trunk variant: endpoint contract + fp32 torch parity.

The resnet18/34 trunk is the MXU-friendly opt-in alternative to the
reference's EfficientNet-B0 camera encoder (docs/ROADMAP.md item 2). The
parity test builds a torchvision-topology twin from torch primitives
(torchvision itself is not installed here), transplants weights, and
compares both harvested endpoints elementwise.
"""

import numpy as np
import pytest
import torch
import torch.nn as tnn

import jax
import jax.numpy as jnp

from lss_carla_tpu.models.resnet import RESNET_LAYERS, ResNetTrunk
from lss_carla_tpu.utils.convert import _conv
from torch_twin import TorchBasic, randomize_bn_stats

ATOL = 5e-5


def _to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _from_nhwc(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def test_layer_plans():
    assert RESNET_LAYERS["resnet18"] == (2, 2, 2, 2)
    assert RESNET_LAYERS["resnet34"] == (3, 4, 6, 3)


def test_endpoint_shapes():
    m = ResNetTrunk("resnet18")
    x = jnp.zeros((1, 64, 128, 3))
    vars_ = jax.jit(lambda r: m.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    eps = jax.jit(lambda v: m.apply(v, x, train=False))(vars_)
    assert set(eps) == {"reduction_4", "reduction_5"}
    assert eps["reduction_4"].shape == (1, 4, 8, 256)    # stride 16
    assert eps["reduction_5"].shape == (1, 2, 4, 512)    # stride 32
    chans = ResNetTrunk.endpoint_channels("resnet18")
    assert chans == {"reduction_4": 256, "reduction_5": 512}


class _TorchResNetTrunk(tnn.Module):
    """torchvision resnet18 topology up to layer4, harvesting endpoints."""

    def __init__(self, layers=(2, 2, 2, 2)):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, stride=2, padding=1)
        feats = (64, 128, 256, 512)
        self.stages = tnn.ModuleList()
        cin = 64
        for stage, (f, reps) in enumerate(zip(feats, layers)):
            blocks = []
            for r in range(reps):
                stride = 2 if (stage > 0 and r == 0) else 1
                blocks.append(TorchBasic(cin, f, stride))
                cin = f
            self.stages.append(tnn.Sequential(*blocks))

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        outs = {}
        for i, stage in enumerate(self.stages):
            x = stage(x)
            if i == 2:
                outs["reduction_4"] = x
            elif i == 3:
                outs["reduction_5"] = x
        return outs


def _convbn(conv_t, bn_t):
    p = {"Conv_0": {"kernel": jnp.asarray(
        _conv(conv_t.weight.detach().numpy()))},
        "BatchNorm_0": {"scale": jnp.asarray(bn_t.weight.detach().numpy()),
                        "bias": jnp.asarray(bn_t.bias.detach().numpy())}}
    s = {"BatchNorm_0": {"mean": jnp.asarray(bn_t.running_mean.numpy()),
                         "var": jnp.asarray(bn_t.running_var.numpy())}}
    return p, s


def _transplant(t: _TorchResNetTrunk, layers):
    params = {"conv1": {"kernel": jnp.asarray(
        _conv(t.conv1.weight.detach().numpy()))},
        "bn1": {"scale": jnp.asarray(t.bn1.weight.detach().numpy()),
                "bias": jnp.asarray(t.bn1.bias.detach().numpy())}}
    stats = {"bn1": {"mean": jnp.asarray(t.bn1.running_mean.numpy()),
                     "var": jnp.asarray(t.bn1.running_var.numpy())}}
    for stage_i, reps in enumerate(layers):
        for r in range(reps):
            blk = t.stages[stage_i][r]
            name = f"layer{stage_i + 1}_{r}"
            bp, bs = {}, {}
            p1, s1 = _convbn(blk.conv1, blk.bn1)
            p2, s2 = _convbn(blk.conv2, blk.bn2)
            bp.update(p1)
            bp["Conv_1"] = p2["Conv_0"]
            bp["BatchNorm_1"] = p2["BatchNorm_0"]
            bs.update(s1)
            bs["BatchNorm_1"] = s2["BatchNorm_0"]
            if blk.downsample is not None:
                pd, sd = _convbn(blk.downsample[0], blk.downsample[1])
                bp["downsample_conv"] = pd["Conv_0"]
                bp["downsample_bn"] = pd["BatchNorm_0"]
                bs["downsample_bn"] = sd["BatchNorm_0"]
            params[name] = bp
            stats[name] = bs
    return {"params": params, "batch_stats": stats}


def test_resnet18_trunk_torch_parity(rng):
    layers = RESNET_LAYERS["resnet18"]
    t = _TorchResNetTrunk(layers)
    randomize_bn_stats(t, rng, affine=True)
    x = rng.normal(size=(2, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        t.eval()
        want = {k: v.numpy() for k, v in t(torch.from_numpy(x)).items()}

    m = ResNetTrunk("resnet18")
    vars_ = _transplant(t, layers)
    got = jax.jit(lambda v, xx: m.apply(v, xx, train=False))(
        vars_, jnp.asarray(_to_nhwc(x)))
    for k in want:
        np.testing.assert_allclose(_from_nhwc(got[k]), want[k], atol=ATOL,
                                   err_msg=k)


@pytest.mark.slow
def test_camencode_resnet_variant_end_to_end():
    from lss_carla_tpu.models.camencode import CamEncode
    m = CamEncode(D=41, C=64, variant="resnet18")
    x = jnp.zeros((2, 128, 352, 3))
    vars_ = jax.jit(lambda r: m.init(
        {"params": r, "dropout": r}, x, train=False))(jax.random.PRNGKey(0))
    lifted, depth = jax.jit(lambda v: m.apply(v, x, train=False))(vars_)
    assert lifted.shape == (2, 41, 8, 22, 64)
    assert depth.shape == (2, 8, 22, 41)
    np.testing.assert_allclose(np.asarray(depth.sum(-1)), 1.0, atol=1e-5)
