"""device_normalize mode: uint8 batches + in-jit normalization must match
the host-normalized float path exactly (modulo float noise)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.data.fixtures import generate_fixture
from lss_carla_tpu.data.simbev import SegmentationData
from lss_carla_tpu.models.lss import compile_model
from lss_carla_tpu.ops.image import normalize_img


@pytest.fixture(scope="module")
def root(tmp_path_factory):
    return generate_fixture(tmp_path_factory.mktemp("simbev_dn"),
                            num_scenes=2, samples_per_scene=2, H=224, W=480)


def test_uint8_dataset_items(root):
    ds = SegmentationData(root, is_train=False, data_aug_conf=DataAugConf(),
                          grid_conf=GridConf(), device_normalize=True)
    imgs, *_ = ds[0]
    assert imgs.dtype == np.uint8
    assert imgs.shape == (6, 3, 128, 352)
    # host-normalizing the uint8 item reproduces the float path
    ds_f = SegmentationData(root, is_train=False, data_aug_conf=DataAugConf(),
                            grid_conf=GridConf(), device_normalize=False)
    imgs_f, *_ = ds_f[0]
    renorm = normalize_img(imgs.transpose(0, 2, 3, 1)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(renorm, imgs_f, atol=1e-5)


def test_model_accepts_uint8_and_matches_float():
    gc = GridConf(xbound=(-40.0, 40.0, 5.0), ybound=(-40.0, 40.0, 5.0),
                  zbound=(-10.0, 10.0, 20.0), dbound=(4.0, 36.0, 8.0))
    aug = DataAugConf(H=64, W=128, final_dim=(32, 64))
    model = compile_model(gc, aug, outC=1)
    rng = np.random.default_rng(0)
    B, N = 1, 6
    u8 = rng.integers(0, 256, size=(B, N, 3, 32, 64)).astype(np.uint8)
    f32 = normalize_img(u8.transpose(0, 1, 3, 4, 2)).transpose(0, 1, 4, 2, 3)
    eye = jnp.tile(jnp.eye(3), (B, N, 1, 1))
    z3 = jnp.zeros((B, N, 3))
    intr = eye * 60.0
    intr = intr.at[:, :, 2, 2].set(1.0)
    vars_ = jax.jit(lambda r: model.init(
        {"params": r}, jnp.asarray(f32.astype(np.float32)), eye, z3, intr,
        eye, z3, train=False))(jax.random.PRNGKey(0))
    out_f = model.apply(vars_, jnp.asarray(f32.astype(np.float32)), eye, z3,
                        intr, eye, z3, train=False)
    out_u = model.apply(vars_, jnp.asarray(u8), eye, z3, intr, eye, z3,
                        train=False)
    np.testing.assert_allclose(np.asarray(out_u), np.asarray(out_f),
                               atol=1e-4, rtol=1e-4)
