"""Devkit-free map expansion reader + BEV underlay (reference
``tools.py:287-363`` / ``explore.py:353-358`` parity)."""

import json

import numpy as np
import pytest

from lss_carla_tpu.data.fixtures_nuscenes import (generate_nuscenes_fixture,
                                                  write_map_fixture)
from lss_carla_tpu.data.nusc_maps import (NuscMap, get_local_map,
                                          get_nusc_maps, plot_nusc_map,
                                          yaw_from_quat)


@pytest.fixture(scope="module")
def nusc_root(tmp_path_factory):
    return generate_nuscenes_fixture(tmp_path_factory.mktemp("nuscmap"),
                                     num_scenes=3, samples_per_scene=2,
                                     H=112, W=240)


def test_fixture_map_loads(nusc_root):
    maps = get_nusc_maps(nusc_root)
    assert "boston-seaport" in maps
    m = maps["boston-seaport"]
    assert len(m.geoms["road_segment"]) == 2
    assert len(m.geoms["lane"]) == 4
    assert len(m.geoms["road_divider"]) == 2
    assert len(m.geoms["lane_divider"]) == 4
    for layer, geoms in m.geoms.items():
        assert len(m.bboxes[layer]) == len(geoms)
        for g in geoms:
            assert g.ndim == 2 and g.shape[1] == 2


def test_missing_folder_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        get_nusc_maps(tmp_path)


def _ref_local_transform(pts, center):
    """The reference's transform, written independently:
    ``(pts - center[:2]) @ get_rot(yaw).T`` with
    ``get_rot(h) = [[cos h, sin h], [-sin h, cos h]]``
    (reference ``tools.py:113-117`` + ``tools.py:356-360``)."""
    yaw = np.arctan2(center[3], center[2])
    g = np.array([[np.cos(yaw), np.sin(yaw)],
                  [-np.sin(yaw), np.cos(yaw)]])
    return (np.asarray(pts, float) - center[:2]) @ g.T


def test_local_map_transform_matches_reference(tmp_path, rng):
    write_map_fixture(tmp_path, "boston-seaport")
    m = NuscMap(tmp_path, "boston-seaport")
    for _ in range(5):
        yaw = float(rng.uniform(-np.pi, np.pi))
        center = np.array([float(rng.uniform(-50, 50)),
                           float(rng.uniform(-50, 50)),
                           np.cos(yaw), np.sin(yaw)])
        lmap = get_local_map(m, center, 1e9)  # keep everything
        for layer in ("road_segment", "lane", "road_divider",
                      "lane_divider"):
            assert len(lmap[layer]) == len(m.geoms[layer])
            for got, world in zip(lmap[layer], m.geoms[layer]):
                np.testing.assert_allclose(
                    got, _ref_local_transform(world, center), atol=1e-9)


def test_local_map_heading_semantics(tmp_path):
    """A point dead ahead of the ego must land on +ego-X."""
    write_map_fixture(tmp_path, "boston-seaport")
    m = NuscMap(tmp_path, "boston-seaport")
    yaw = np.pi / 2  # ego facing world +Y
    center = (3.0, -7.0, np.cos(yaw), np.sin(yaw))
    # world point 10 m ahead: (3, -7 + 10)
    out = _ref_local_transform(np.array([[3.0, 3.0]]), np.asarray(center))
    np.testing.assert_allclose(out, [[10.0, 0.0]], atol=1e-12)
    # and the module agrees with the twin on real geometry
    lmap = get_local_map(m, center, 1e9)
    assert any(len(g) for g in lmap["road_divider"])


def test_patch_filter_drops_far_geometry(tmp_path):
    data = {
        "node": [{"token": f"n{i}", "x": x, "y": y}
                 for i, (x, y) in enumerate(
                     [(0, 0), (1, 0), (1, 1), (0, 1),
                      (500, 500), (501, 500), (501, 501), (500, 501)])],
        "line": [], "polygon": [
            {"token": "p0", "exterior_node_tokens": ["n0", "n1", "n2", "n3"]},
            {"token": "p1", "exterior_node_tokens": ["n4", "n5", "n6", "n7"]},
        ],
        "road_segment": [{"token": "s0", "polygon_token": "p0"},
                         {"token": "s1", "polygon_token": "p1"}],
        "lane": [], "road_divider": [], "lane_divider": [],
    }
    with open(tmp_path / "boston-seaport.json", "w") as f:
        json.dump(data, f)
    m = NuscMap(tmp_path, "boston-seaport")
    lmap = get_local_map(m, (0.0, 0.0, 1.0, 0.0), 50.0)
    assert len(lmap["road_segment"]) == 1  # the far square is culled


def test_scene2map_and_yaw(nusc_root):
    from lss_carla_tpu.data.nuscenes import NuScenesTables
    t = NuScenesTables(nusc_root)
    s2m = t.scene2map()
    assert set(s2m.values()) == {"boston-seaport"}
    assert len(s2m) == 3
    # yaw round-trips through the fixture's yaw-only quaternions
    for pose in list(t.ego_pose.values())[:4]:
        q = pose["rotation"]
        yaw = yaw_from_quat(q)
        np.testing.assert_allclose(
            [np.cos(yaw / 2), np.sin(yaw / 2)],
            [q[0], q[3]], atol=1e-9)


def test_plot_nusc_map_draws(tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    write_map_fixture(tmp_path, "boston-seaport")
    m = NuscMap(tmp_path, "boston-seaport")
    fig, ax = plt.subplots()
    plot_nusc_map(ax, m, (0.0, 0.0), 0.3, stretch=50.0)
    assert len(ax.patches) == 6  # 2 road segments + 4 lanes
    assert len(ax.lines) == 6   # 2 road dividers + 4 lane dividers
    plt.close(fig)


@pytest.mark.slow
def test_viz_model_preds_nuscenes_with_map(nusc_root, tmp_path):
    """End-to-end: nuScenes loader + model + map underlay -> PNGs."""
    from lss_carla_tpu.configs import GridConf
    from lss_carla_tpu.explore import viz_model_preds
    grid = GridConf(xbound=(-50.0, 50.0, 1.5625),
                    ybound=(-50.0, 50.0, 1.5625), dbound=(4.0, 45.0, 8.0))
    n = viz_model_preds(
        nusc_root, outdir=str(tmp_path / "viz"), max_batches=1, bsz=1,
        dataset="nuscenes", map_folder=str(nusc_root),
        H=112, W=240, final_dim=(32, 64), ncams=6, nworkers=0,
        grid_conf=grid)
    assert n == 1
    assert (tmp_path / "viz" / "eval000000.png").exists()
