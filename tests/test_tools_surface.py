"""The reference-parity symbol surface (``lss_carla_tpu.tools``) must expose
every public name the reference's ``src/tools.py`` exports, including the
map helpers (devkit-free equivalents in ``data.nusc_maps``)."""

import numpy as np


def test_reference_symbols_importable():
    from lss_carla_tpu import tools
    for name in ("gen_dx_bx", "get_rot", "img_transform", "normalize_img",
                 "denormalize_img", "ego_to_cam", "cam_to_ego",
                 "get_only_in_img_mask", "SimpleLoss", "get_batch_iou",
                 "get_val_info", "add_ego", "cumsum_trick", "quick_cumsum",
                 "get_nusc_maps", "get_local_map", "plot_nusc_map",
                 "get_lidar_data"):
        assert hasattr(tools, name), name


def test_simple_loss_callable():
    from lss_carla_tpu.tools import SimpleLoss
    import jax.numpy as jnp
    loss = SimpleLoss(pos_weight=2.13)
    v = loss(jnp.zeros((1, 1, 4, 4)), jnp.zeros((1, 1, 4, 4)))
    np.testing.assert_allclose(float(v), np.log(2.0), rtol=1e-5)


def test_add_ego_draws(monkeypatch):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from lss_carla_tpu.tools import add_ego
    fig = plt.figure()
    add_ego(np.array([-49.75, -49.75, 0.0]), np.array([0.5, 0.5, 20.0]))
    plt.close(fig)


def test_pallas_method_auto_falls_back_on_big_grids(rng):
    """200x200x64 accumulator exceeds VMEM -> silently uses scatter."""
    import jax.numpy as jnp
    from lss_carla_tpu.ops import geometry as G
    from lss_carla_tpu.ops.splat import voxel_pooling
    dx, bx, nx = G.gen_dx_bx((-50, 50, .5), (-50, 50, .5), (-10, 10, 20.))
    geom = jnp.asarray(rng.uniform(-40, 40, size=(1, 1, 2, 2, 2, 3))
                       .astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(1, 1, 2, 2, 2, 64))
                        .astype(np.float32))
    a = voxel_pooling(geom, feats, dx, bx, nx, method="pallas")
    b = voxel_pooling(geom, feats, dx, bx, nx, method="scatter")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5)
