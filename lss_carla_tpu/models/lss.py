"""LiftSplatShoot — the full camera-to-BEV model as one Flax module.

Wires CamEncode -> frustum geometry -> fixed-shape splat -> BevEncode,
mirroring reference ``src/models.py:133-263`` but TPU-first:

* the frustum and grid constants are compile-time constants (the reference
  registers them as buffers and does per-step CPU inverses; here everything
  folds into a single XLA program);
* tensors are NHWC; the public ``__call__`` accepts the reference's NCHW
  image batch layout ``(B, N, 3, H, W)`` and transposes once on entry;
* the splat is the fixed-shape scatter-add / Pallas kernel from
  ``lss_carla_tpu.ops.splat`` instead of filter+argsort+QuickCumsum.

Returns logits in the reference layout ``(B, outC, X, Y)`` so losses,
metrics, and visualizations match the reference bit-for-bit in structure.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.models.bevencode import BevEncode
from lss_carla_tpu.models.camencode import CamEncode
from lss_carla_tpu.ops.geometry import create_frustum, gen_dx_bx, get_geometry
from lss_carla_tpu.ops.splat import voxel_pooling


class LiftSplatShoot(nn.Module):
    grid_conf: GridConf
    data_aug_conf: DataAugConf
    outC: int = 1
    camC: int = 64
    downsample: int = 16
    variant: str = "b0"
    splat_method: str = "scatter"
    compute_dtype: str = "float32"  # "bfloat16" for the TPU fast path
    remat: bool = False  # rematerialize encoders (trade FLOPs for HBM)
    fused_dw: bool = False  # Pallas dwconv+BN-stats fusion (EffNet, train)

    def setup(self):
        self.dx, self.bx, self.nx = gen_dx_bx(
            self.grid_conf.xbound, self.grid_conf.ybound, self.grid_conf.zbound)
        self.frustum = create_frustum(
            self.data_aug_conf.final_dim, self.downsample, self.grid_conf.dbound)
        self.D = self.frustum.shape[0]
        dtype = jnp.dtype(self.compute_dtype)
        cam_cls, bev_cls = CamEncode, BevEncode
        if self.remat:
            # checkpoint the encoders: activations are recomputed in the
            # backward pass instead of stored — fixes the f32 memory cliff
            # at larger batches (bsz 16 f32 spills without this)
            cam_cls = nn.remat(CamEncode, static_argnums=(2,))
            bev_cls = nn.remat(BevEncode, static_argnums=(2,))
        self.camencode = cam_cls(self.D, self.camC, self.variant,
                                 dtype=dtype, fused_dw=self.fused_dw)
        self.bevencode = bev_cls(self.outC, dtype=dtype)

    def get_geometry(self, rots, trans, intrins, post_rots, post_trans):
        return get_geometry(jnp.asarray(self.frustum), rots, trans, intrins,
                            post_rots, post_trans)

    def get_cam_feats(self, x, train: bool):
        """x: (B, N, 3, H, W) -> (B, N, D, fH, fW, C) lifted features.

        Accepts uint8 images (device_normalize loader mode): ImageNet
        normalization then happens inside this jitted program — 4x less
        host->device traffic than shipping float32."""
        B, N, C, H, W = x.shape
        x = x.reshape(B * N, C, H, W).transpose(0, 2, 3, 1)  # NHWC
        if x.dtype == jnp.uint8:
            from lss_carla_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD
            x = (x.astype(jnp.float32) / 255.0
                 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        lifted, depth = self.camencode(x, train)  # (BN, D, fH, fW, camC)
        self.sow("intermediates", "depth_dist", depth)
        D, fH, fW = lifted.shape[1:4]
        return lifted.reshape(B, N, D, fH, fW, self.camC)

    def get_voxels(self, x, rots, trans, intrins, post_rots, post_trans,
                   train: bool):
        geom = self.get_geometry(rots, trans, intrins, post_rots, post_trans)
        feats = self.get_cam_feats(x, train)
        return voxel_pooling(geom, feats, self.dx, self.bx, self.nx,
                             method=self.splat_method)  # (B, X, Y, nz*camC)

    def decode_bev(self, bev, train: bool = False):
        """(B, X, Y, nz*camC) pooled BEV -> (B, outC, X, Y) logits.

        Split out from ``__call__`` so camera-axis model parallelism
        (``parallel/camera.py``) can psum partial BEVs between the lift
        (``get_voxels``) and the decode: voxel pooling is a sum over frustum
        points, and points partition by source camera."""
        out = self.bevencode(bev, train)            # (B, X, Y, outC)
        return out.transpose(0, 3, 1, 2)            # reference layout (B, outC, X, Y)

    def __call__(self, x, rots, trans, intrins, post_rots, post_trans,
                 train: bool = False):
        bev = self.get_voxels(x, rots, trans, intrins, post_rots, post_trans,
                              train)
        return self.decode_bev(bev, train)


def compile_model(grid_conf, data_aug_conf, outC: int = 1,
                  **kwargs) -> LiftSplatShoot:
    """Reference-parity constructor (``src/models.py:262-263``).

    Accepts either the dataclass configs or the reference's plain dicts.
    """
    if not isinstance(grid_conf, GridConf):
        grid_conf = GridConf.from_dict(grid_conf)
    if not isinstance(data_aug_conf, DataAugConf):
        data_aug_conf = DataAugConf.from_dict(data_aug_conf)
    return LiftSplatShoot(grid_conf=grid_conf, data_aug_conf=data_aug_conf,
                          outC=outC, **kwargs)
