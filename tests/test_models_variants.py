"""EfficientNet width/depth scaling (B1-B4) for the stretch configs."""

import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.models.efficientnet import (EfficientNetTrunk, VARIANTS,
                                               block_plan, round_filters)

pytestmark = pytest.mark.slow  # full-model CPU compiles


def test_b4_plan():
    plan = block_plan("b4")
    # depth 1.8: ceil(1.8*[1,2,2,3,3,4,1]) = [2,4,4,6,6,8,2] = 32 blocks
    assert len(plan) == 32
    # width 1.4 channel scaling
    assert plan[0]["cin"] == round_filters(32, 1.4) == 48
    assert plan[-1]["cout"] == round_filters(320, 1.4) == 448


@pytest.mark.parametrize("variant", ["b1", "b4"])
def test_variant_endpoints_consistent(variant):
    m = EfficientNetTrunk(variant)
    x = jnp.zeros((1, 64, 128, 3))
    vars_ = jax.jit(lambda r: m.init({"params": r}, x, train=False))(
        jax.random.PRNGKey(0))
    eps = jax.jit(lambda v: m.apply(v, x, train=False))(vars_)
    chans = EfficientNetTrunk.endpoint_channels(variant)
    assert set(eps) == set(chans)
    for k, v in eps.items():
        assert v.shape[-1] == chans[k], (k, v.shape, chans[k])
    # stride-32 final endpoint
    assert eps["reduction_5"].shape[1:3] == (2, 4)
