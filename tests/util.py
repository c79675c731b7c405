"""Shared tiny-config helpers to keep CPU test compiles fast."""

import numpy as np
import jax
import jax.numpy as jnp

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.models.lss import compile_model


def tiny_grid():
    # 16x16 BEV grid (divisible by 8 for BevEncode), 4 depth bins
    return GridConf(xbound=(-40.0, 40.0, 5.0), ybound=(-40.0, 40.0, 5.0),
                    zbound=(-10.0, 10.0, 20.0), dbound=(4.0, 36.0, 8.0))


def tiny_aug(H=64, W=128):
    return DataAugConf(H=H, W=W, final_dim=(32, 64))


def tiny_model(outC=1, **kw):
    return compile_model(tiny_grid(), tiny_aug(), outC=outC, **kw)


def slim_model(outC=1, **kw):
    """tiny_model with the minimum-width 'slim' trunk: for sharding-parity
    tests, whose XLA:CPU GSPMD compile time scales with trunk op count (the
    parity statement — sharded step == unsharded step — is model-agnostic).
    Full-size-model coverage lives in the torch-parity and train-loop tests."""
    return compile_model(tiny_grid(), tiny_aug(), outC=outC,
                         variant="slim", **kw)


def tiny_batch(rng, B=2, N=6, H=32, W=64):
    imgs = rng.normal(size=(B, N, 3, H, W)).astype(np.float32)
    rots = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    trans = np.zeros((B, N, 3), dtype=np.float32)
    intrins = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    intrins[..., 0, 0] = 60.0
    intrins[..., 1, 1] = 60.0
    intrins[..., 0, 2] = W / 2
    intrins[..., 1, 2] = H / 2
    post_rots = np.tile(np.eye(3, dtype=np.float32), (B, N, 1, 1))
    post_trans = np.zeros((B, N, 3), dtype=np.float32)
    binimgs = (rng.uniform(size=(B, 1, 16, 16)) < 0.1).astype(np.float32)
    return (imgs, rots, trans, intrins, post_rots, post_trans, binimgs)
