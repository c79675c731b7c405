"""Reference-parity symbol surface (reference ``src/tools.py``).

Users of the reference import these names from ``src.tools``; this module
re-exports the equivalents so the framework is a drop-in replacement:

    gen_dx_bx, get_rot, img_transform, normalize_img, denormalize_img,
    ego_to_cam, cam_to_ego, get_only_in_img_mask,
    SimpleLoss, get_batch_iou, get_val_info, add_ego,
    get_nusc_maps, get_local_map, plot_nusc_map, get_lidar_data

The cumsum machinery (``cumsum_trick``/``QuickCumsum``) has no direct
equivalent by design — its functional contract (sum features per voxel with
gather-backward) is the fixed-shape splat in ``lss_carla_tpu.ops.splat``;
``splat_scatter_add`` is exported here under both names for discoverability.
"""

from __future__ import annotations

import numpy as np

from lss_carla_tpu.data.augment import (  # noqa: F401
    img_transform as _img_transform_new, post_homography)
from lss_carla_tpu.ops.geometry import (  # noqa: F401
    cam_to_ego, ego_to_cam, gen_dx_bx, get_only_in_img_mask, get_rot)
from lss_carla_tpu.ops.image import (  # noqa: F401
    denormalize_img, normalize_img)
from lss_carla_tpu.data.nusc_maps import (  # noqa: F401
    get_local_map, get_nusc_maps, plot_nusc_map)
from lss_carla_tpu.data.nuscenes import get_lidar_data  # noqa: F401
from lss_carla_tpu.ops.splat import splat_scatter_add  # noqa: F401
from lss_carla_tpu.training.loss import (  # noqa: F401
    SimpleLoss, get_batch_iou)
from lss_carla_tpu.training.loop import get_val_info  # noqa: F401

# the splat op is the reference's QuickCumsum replacement
cumsum_trick = splat_scatter_add
quick_cumsum = splat_scatter_add


def img_transform(img, post_rot, post_tran, resize, resize_dims, crop,
                  flip, rotate):
    """Reference-signature wrapper (tools.py:120-144): composes the
    augmentation homography onto incoming (post_rot, post_tran)."""
    img, A, b = _img_transform_new(img, resize, resize_dims, crop, flip,
                                   rotate)
    post_rot = np.asarray(A) @ np.asarray(post_rot)
    post_tran = np.asarray(A) @ np.asarray(post_tran) + np.asarray(b)
    return img, post_rot, post_tran


def add_ego(bx, dx):
    """Draw the ego-vehicle box on the current matplotlib axes
    (reference tools.py:273-284)."""
    import matplotlib.pyplot as plt
    W = 1.85
    pts = np.array([
        [-4.084 / 2. + 0.5, W / 2.],
        [4.084 / 2. + 0.5, W / 2.],
        [4.084 / 2. + 0.5, -W / 2.],
        [-4.084 / 2. + 0.5, -W / 2.],
    ])
    pts = (pts - bx[:2]) / dx[:2]
    pts[:, [0, 1]] = pts[:, [1, 0]]
    plt.fill(pts[:, 0], pts[:, 1], '#76b900')
