"""Weight-converter tests: the torch->flax name map must cover the full
model tree with correctly transformed shapes."""

import numpy as np
import jax
import pytest

from lss_carla_tpu.configs import DataAugConf, GridConf
from lss_carla_tpu.models.lss import compile_model
from lss_carla_tpu.utils.convert import (build_name_map,
                                         torch_state_dict_to_variables)


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


@pytest.fixture(scope="module")
def model_vars():
    # tiny image: the param tree structure is spatial-size independent
    model = compile_model(GridConf(), DataAugConf(final_dim=(32, 64)), outC=1)
    B, N = 1, 6
    import jax.numpy as jnp
    x = jnp.zeros((B, N, 3, 32, 64))
    eye = jnp.tile(jnp.eye(3), (B, N, 1, 1))
    z3 = jnp.zeros((B, N, 3))
    init = jax.jit(lambda r: model.init({"params": r}, x, eye, z3, eye, eye,
                                        z3, train=False))
    return init(jax.random.PRNGKey(0))


def test_name_map_round_trips_full_tree(model_vars):
    """Build a synthetic torch state_dict from the name map (with
    torch-layout shapes derived from the flax tree), convert it, and require
    exact coverage of params + batch_stats."""
    name_map = build_name_map()
    flat_params = _flatten(
        jax.tree_util.tree_map(np.asarray, model_vars["params"]))
    flat_stats = _flatten(
        jax.tree_util.tree_map(np.asarray, model_vars["batch_stats"]))

    rng = np.random.default_rng(0)
    state_dict = {}
    for torch_name, (path, tf, col) in name_map.items():
        flat = flat_params if col == "params" else flat_stats
        assert path in flat, f"{torch_name} -> {path} not in model tree"
        target_shape = flat[path].shape
        if tf is not None:  # conv transforms are (2,3,1,0) transposes
            torch_shape = (target_shape[3], target_shape[2],
                           target_shape[0], target_shape[1])
        else:
            torch_shape = target_shape
        state_dict[torch_name] = rng.normal(size=torch_shape).astype(np.float32)

    variables = torch_state_dict_to_variables(state_dict)
    got_params = _flatten(variables["params"])
    got_stats = _flatten(variables["batch_stats"])

    # exact coverage, both directions
    assert set(got_params) == set(flat_params)
    assert set(got_stats) == set(flat_stats)
    for path in flat_params:
        assert got_params[path].shape == flat_params[path].shape, path
    for path in flat_stats:
        assert got_stats[path].shape == flat_stats[path].shape, path


def test_converted_values_transposed_correctly():
    name_map = build_name_map()
    path, tf, col = name_map["bevencode.conv1.weight"]
    w = np.arange(64 * 64 * 7 * 7, dtype=np.float32).reshape(64, 64, 7, 7)
    out = tf(w)
    assert out.shape == (7, 7, 64, 64)
    np.testing.assert_array_equal(out[3, 4, 5, 6], w[6, 5, 3, 4])


def test_unmapped_tensor_raises():
    with pytest.raises(KeyError):
        torch_state_dict_to_variables({"bogus.weight": np.zeros((3, 3))})


def test_skip_list_ignores_buffers():
    # unused head + registered grid buffers must be silently skipped
    sd = {"camencode.trunk._conv_head.weight": np.zeros((1280, 320, 1, 1)),
          "dx": np.zeros(3), "bx": np.zeros(3), "nx": np.zeros(3),
          "frustum": np.zeros((41, 8, 22, 3)),
          "bevencode.bn1.num_batches_tracked": np.zeros(())}
    out = torch_state_dict_to_variables(sd)
    assert out["params"] == {} and out["batch_stats"] == {}


# --- ImageNet-pretrained trunk import (reference src/models.py:43) ---

def _trunk_vars(variant="b0"):
    from lss_carla_tpu.models.efficientnet import EfficientNetTrunk
    import jax.numpy as jnp
    trunk = EfficientNetTrunk(variant)
    init = jax.jit(lambda r: trunk.init({"params": r},
                                        jnp.zeros((1, 32, 64, 3)),
                                        train=False))
    return jax.tree_util.tree_map(np.asarray,
                                  init(jax.random.PRNGKey(1)))


def _synthetic_imagenet_sd(trunk_vars, variant="b0", seed=0, head=True):
    """An efficientnet_pytorch-named ImageNet state_dict with torch-layout
    shapes (random values), plus the classifier head the converter must
    skip."""
    from lss_carla_tpu.utils.convert import build_trunk_name_map
    name_map = build_trunk_name_map(variant)
    flat = {"params": _flatten(trunk_vars["params"]),
            "batch_stats": _flatten(trunk_vars["batch_stats"])}
    rng = np.random.default_rng(seed)
    sd = {}
    for torch_name, (path, tf, col) in name_map.items():
        shape = flat[col][path].shape
        if tf is not None:
            shape = (shape[3], shape[2], shape[0], shape[1])
        sd[torch_name] = rng.normal(size=shape).astype(np.float32)
    if head:
        sd["_conv_head.weight"] = np.zeros((1280, 320, 1, 1), np.float32)
        for k in ("weight", "bias", "running_mean", "running_var"):
            sd[f"_bn1.{k}"] = np.zeros(1280, np.float32)
        sd["_bn1.num_batches_tracked"] = np.zeros((), np.int64)
        sd["_fc.weight"] = np.zeros((1000, 1280), np.float32)
        sd["_fc.bias"] = np.zeros(1000, np.float32)
    return sd


def test_imagenet_trunk_full_coverage_and_head_skipped():
    from lss_carla_tpu.utils.convert import (
        imagenet_state_dict_to_trunk_variables)
    tv = _trunk_vars()
    sd = _synthetic_imagenet_sd(tv)
    got = imagenet_state_dict_to_trunk_variables(sd)
    for col in ("params", "batch_stats"):
        flat_want = _flatten(tv[col])
        flat_got = _flatten(got[col])
        assert set(flat_got) == set(flat_want)
        for path in flat_want:
            assert flat_got[path].shape == flat_want[path].shape, path
    # value spot-check incl. layout transform: stem conv
    np.testing.assert_array_equal(
        got["params"]["conv_stem"]["kernel"],
        np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)))


def test_trunk_from_torch_file_and_merge(model_vars, tmp_path):
    import torch
    from lss_carla_tpu.utils.convert import (merge_trunk_variables,
                                             trunk_variables_from_checkpoint)
    tv = _trunk_vars()
    sd = _synthetic_imagenet_sd(tv, seed=7)
    path = tmp_path / "efficientnet-b0-imagenet.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, path)

    trunk = trunk_variables_from_checkpoint(str(path))
    merged = merge_trunk_variables(
        jax.tree_util.tree_map(np.asarray, dict(model_vars)), trunk)

    # trunk leaves replaced...
    np.testing.assert_array_equal(
        merged["params"]["camencode"]["trunk"]["conv_stem"]["kernel"],
        np.transpose(sd["_conv_stem.weight"], (2, 3, 1, 0)))
    # ...everything else untouched
    np.testing.assert_array_equal(
        merged["params"]["bevencode"]["conv1"]["kernel"],
        np.asarray(model_vars["params"]["bevencode"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(
        merged["params"]["camencode"]["depthnet"]["kernel"],
        np.asarray(model_vars["params"]["camencode"]["depthnet"]["kernel"]))


def test_trunk_from_reference_lss_checkpoint(model_vars, tmp_path):
    """A full reference LSS .pt also works as a trunk source (keys carry the
    camencode.trunk. prefix)."""
    import torch
    from lss_carla_tpu.utils.convert import (trunk_variables_from_checkpoint,
                                             variables_to_torch_state_dict)
    sd = variables_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, dict(model_vars)))
    path = tmp_path / "model_best.pt"
    torch.save({"model_state_dict":
                {k: torch.from_numpy(np.ascontiguousarray(v))
                 for k, v in sd.items()},
                "counter": 3, "epoch": 1}, path)
    trunk = trunk_variables_from_checkpoint(str(path))
    np.testing.assert_array_equal(
        trunk["params"]["conv_stem"]["kernel"],
        np.asarray(
            model_vars["params"]["camencode"]["trunk"]["conv_stem"]["kernel"]))


def test_merge_trunk_shape_mismatch_raises(model_vars):
    from lss_carla_tpu.utils.convert import merge_trunk_variables
    tv = _trunk_vars()
    bad = jax.tree_util.tree_map(np.asarray, tv)
    bad["params"]["conv_stem"]["kernel"] = np.zeros((3, 3, 3, 64), np.float32)
    with pytest.raises(ValueError):
        merge_trunk_variables(
            jax.tree_util.tree_map(np.asarray, dict(model_vars)), bad)


def test_trunk_auto_missing_raises():
    from lss_carla_tpu.utils.convert import trunk_variables_from_checkpoint
    with pytest.raises(FileNotFoundError):
        trunk_variables_from_checkpoint("auto")


def test_inverse_converter_roundtrip(model_vars):
    """flax -> torch state_dict -> flax must be the identity."""
    from lss_carla_tpu.utils.convert import variables_to_torch_state_dict
    sd = variables_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, model_vars))
    back = torch_state_dict_to_variables(sd)
    flat_orig = _flatten(jax.tree_util.tree_map(np.asarray,
                                                model_vars["params"]))
    flat_back = _flatten(back["params"])
    assert set(flat_orig) == set(flat_back)
    for path in flat_orig:
        np.testing.assert_array_equal(flat_back[path], flat_orig[path], path)
    flat_os = _flatten(jax.tree_util.tree_map(np.asarray,
                                              model_vars["batch_stats"]))
    flat_bs = _flatten(back["batch_stats"])
    assert set(flat_os) == set(flat_bs)
    for path in flat_os:
        np.testing.assert_array_equal(flat_bs[path], flat_os[path], path)
