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
