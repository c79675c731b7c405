"""Torch-reference checkpoint -> Flax variables converter.

Lets users bring reference LSS-Carla checkpoints (``model_best.pt`` /
``model525000.pt``-style, reference ``train_simbev.py:417-453``) into this
framework. Handles both the dict format (``{'model_state_dict': ...}``) and
raw state_dicts.

Tensor layout conventions converted:
* conv weight (O, I, kh, kw)            -> kernel (kh, kw, I, O)
* depthwise conv weight (C, 1, kh, kw)  -> kernel (kh, kw, 1, C)
* BN weight/bias                        -> scale/bias (params)
* BN running_mean/running_var           -> mean/var (batch_stats)

Name mapping covers the whole reference module tree: EfficientNet-B0 trunk
(stem, 16 MBConv blocks), CamEncode up1/depthnet, BevEncode conv1/bn1/
layer1-3/up1/up2. The unused torch trunk head (_conv_head/_bn1/_fc) and
torchvision-internal buffers (num_batches_tracked) are skipped.
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _depthwise(w: np.ndarray) -> np.ndarray:
    # torch (C, 1, kh, kw) -> flax grouped kernel (kh, kw, 1, C)
    return np.transpose(w, (2, 3, 1, 0))


_SKIP = re.compile(
    r"(num_batches_tracked|trunk\._conv_head|trunk\._bn1\.|trunk\._fc"
    r"|^dx$|^bx$|^nx$|^frustum$)")


def _up_targets(prefix: Tuple[str, ...]):
    """Reference Up = Sequential(conv,bn,relu,conv,bn,relu) under .conv.N"""
    return {
        "conv.0.weight": (prefix + ("ConvBNReLU_0", "Conv_0", "kernel"), _conv),
        "conv.1": (prefix + ("ConvBNReLU_0", "BatchNorm_0"), None),
        "conv.3.weight": (prefix + ("ConvBNReLU_1", "Conv_0", "kernel"), _conv),
        "conv.4": (prefix + ("ConvBNReLU_1", "BatchNorm_0"), None),
    }


def _bn_entries(torch_prefix: str, flax_path: Tuple[str, ...]):
    """Expand a BN module into its four tensors."""
    return {
        f"{torch_prefix}.weight": (flax_path + ("scale",), None, "params"),
        f"{torch_prefix}.bias": (flax_path + ("bias",), None, "params"),
        f"{torch_prefix}.running_mean": (flax_path + ("mean",), None, "batch_stats"),
        f"{torch_prefix}.running_var": (flax_path + ("var",), None, "batch_stats"),
    }


def build_trunk_name_map(
        variant: str = "b0", torch_prefix: str = "",
        flax_prefix: Tuple[str, ...] = (),
) -> Dict[str, Tuple[Tuple[str, ...], object, str]]:
    """torch name -> (flax path, transform, collection) for the bare
    EfficientNet trunk in ``efficientnet_pytorch`` naming — the naming of
    both the reference's embedded trunk (``camencode.trunk.`` prefix,
    reference ``src/models.py:43``) and a plain ImageNet checkpoint from
    ``EfficientNet.from_pretrained`` (empty prefix)."""
    m: Dict[str, Tuple[Tuple[str, ...], object, str]] = {}

    def conv_w(torch_name, path, tf=_conv):
        m[torch_prefix + torch_name] = (path + ("kernel",), tf, "params")

    def conv_b(torch_name, path):
        m[torch_prefix + torch_name] = (path + ("bias",), None, "params")

    def bn(torch_name, path):
        for k, (p, tf, col) in _bn_entries(torch_prefix + torch_name,
                                           path).items():
            m[k] = (p, tf, col)

    from lss_carla_tpu.models.efficientnet import block_plan
    plan = block_plan(variant)
    T = flax_prefix
    conv_w("_conv_stem.weight", T + ("conv_stem",))
    bn("_bn0", T + ("bn_stem",))
    for i, args in enumerate(plan):
        B = T + (f"block_{i}",)
        p = f"_blocks.{i}"
        if args["expand"] != 1:  # expand conv absent when expand_ratio == 1
            conv_w(f"{p}._expand_conv.weight", B + ("expand_conv",))
            bn(f"{p}._bn0", B + ("bn0",))
        conv_w(f"{p}._depthwise_conv.weight", B + ("depthwise_conv",),
               _depthwise)
        bn(f"{p}._bn1", B + ("bn1",))
        conv_w(f"{p}._se_reduce.weight", B + ("se_reduce",))
        conv_b(f"{p}._se_reduce.bias", B + ("se_reduce",))
        conv_w(f"{p}._se_expand.weight", B + ("se_expand",))
        conv_b(f"{p}._se_expand.bias", B + ("se_expand",))
        conv_w(f"{p}._project_conv.weight", B + ("project_conv",))
        bn(f"{p}._bn2", B + ("bn2",))
    return m


def build_name_map() -> Dict[str, Tuple[Tuple[str, ...], object, str]]:
    """torch name -> (flax path, transform, collection)."""
    m: Dict[str, Tuple[Tuple[str, ...], object, str]] = {}

    def conv_w(torch_name, path, tf=_conv):
        m[torch_name] = (path + ("kernel",), tf, "params")

    def conv_b(torch_name, path):
        m[torch_name] = (path + ("bias",), None, "params")

    def bn(torch_prefix, path):
        for k, (p, tf, col) in _bn_entries(torch_prefix, path).items():
            m[k] = (p, tf, col)

    # --- CamEncode trunk (EfficientNet-B0) ---
    m.update(build_trunk_name_map(
        "b0", torch_prefix="camencode.trunk.",
        flax_prefix=("camencode", "trunk")))

    # --- CamEncode up1 + depthnet ---
    for suffix, (path, tf) in _up_targets(("camencode", "up1")).items():
        name = f"camencode.up1.{suffix}"
        if tf is _conv:
            conv_w(name, path[:-1], _conv)
        else:
            bn(name, path)
    conv_w("camencode.depthnet.weight", ("camencode", "depthnet"))
    conv_b("camencode.depthnet.bias", ("camencode", "depthnet"))

    # --- BevEncode ---
    conv_w("bevencode.conv1.weight", ("bevencode", "conv1"))
    bn("bevencode.bn1", ("bevencode", "bn1"))
    for layer in (1, 2, 3):
        for blk in (0, 1):
            B = ("bevencode", f"layer{layer}_{blk}")
            p = f"bevencode.layer{layer}.{blk}"
            conv_w(f"{p}.conv1.weight", B + ("Conv_0",))
            bn(f"{p}.bn1", B + ("BatchNorm_0",))
            conv_w(f"{p}.conv2.weight", B + ("Conv_1",))
            bn(f"{p}.bn2", B + ("BatchNorm_1",))
            if layer > 1 and blk == 0:  # only strided blocks downsample
                conv_w(f"{p}.downsample.0.weight", B + ("downsample_conv",))
                bn(f"{p}.downsample.1", B + ("downsample_bn",))
    for suffix, (path, tf) in _up_targets(("bevencode", "up1")).items():
        name = f"bevencode.up1.{suffix}"
        if tf is _conv:
            conv_w(name, path[:-1], _conv)
        else:
            bn(name, path)
    # up2 = Sequential(Upsample, conv3x3, bn, relu, conv1x1)
    conv_w("bevencode.up2.1.weight", ("bevencode", "up2_conv", "Conv_0"))
    bn("bevencode.up2.2", ("bevencode", "up2_conv", "BatchNorm_0"))
    conv_w("bevencode.up2.4.weight", ("bevencode", "head"))
    conv_b("bevencode.up2.4.bias", ("bevencode", "head"))

    return m


def _state_dict_to_tree(state_dict, name_map, skip) -> dict:
    """Shared converter core: apply a name map to a torch state_dict."""
    params: dict = {}
    batch_stats: dict = {}
    unmapped = []
    for name, tensor in state_dict.items():
        if skip.search(name):
            continue
        arr = np.asarray(getattr(tensor, "numpy", lambda: tensor)())
        if name not in name_map:
            unmapped.append(name)
            continue
        path, tf, collection = name_map[name]
        if tf is not None:
            arr = tf(arr)
        tree = params if collection == "params" else batch_stats
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = arr
    if unmapped:
        raise KeyError(f"unmapped reference tensors: {unmapped[:10]}"
                       f"{'...' if len(unmapped) > 10 else ''}")
    return {"params": params, "batch_stats": batch_stats}


def torch_state_dict_to_variables(state_dict) -> dict:
    """Convert a reference torch state_dict (name -> numpy/tensor) to flax
    variables {"params": ..., "batch_stats": ...}."""
    return _state_dict_to_tree(state_dict, build_name_map(), _SKIP)


# ImageNet checkpoints from efficientnet_pytorch carry the classifier head
# (_conv_head/_bn1/_fc) that the reference never runs (src/models.py:63-84
# harvests block endpoints only) — skip it. Note ^_bn1\. matches only the
# top-level head BN, not the per-block _blocks.N._bn1.
_IMAGENET_SKIP = re.compile(
    r"(num_batches_tracked|^_conv_head\.|^_bn1\.|^_fc\.)")


def imagenet_state_dict_to_trunk_variables(state_dict,
                                           variant: str = "b0") -> dict:
    """Convert a bare ``efficientnet_pytorch`` ImageNet state_dict (the file
    ``EfficientNet.from_pretrained("efficientnet-b0")`` downloads; reference
    ``src/models.py:43``) into ``EfficientNetTrunk`` variables
    {"params": ..., "batch_stats": ...} rooted at the trunk."""
    name_map = build_trunk_name_map(variant)
    return _state_dict_to_tree(state_dict, name_map, _IMAGENET_SKIP)


def _tree_get(tree, path):
    node = tree
    for k in path:
        node = node[k]
    return node


def trunk_variables_from_checkpoint(path: str, variant: str = "b0") -> dict:
    """Load EfficientNet trunk variables from any supported source:

    * ``auto`` — search the torch hub cache
      (``~/.cache/torch/hub/checkpoints/efficientnet-{variant}-*.pth``),
      where ``EfficientNet.from_pretrained`` stores its download;
    * a ``.pt``/``.pth`` torch file holding either a bare ImageNet trunk
      state_dict or a full reference LSS checkpoint (keys prefixed
      ``camencode.trunk.``, dict or raw format) — the trunk is extracted;
    * an Orbax checkpoint directory written by this framework's
      ``CheckpointManager`` — the ``camencode/trunk`` subtree is extracted.

    Returns {"params": ..., "batch_stats": ...} rooted at the trunk.
    """
    import glob
    import os

    if path == "auto":
        pattern = os.path.expanduser(
            f"~/.cache/torch/hub/checkpoints/efficientnet-{variant}-*.pth")
        hits = sorted(glob.glob(pattern))
        if not hits:
            raise FileNotFoundError(
                f"pretrained_trunk='auto': no file matches {pattern}")
        path = hits[-1]

    if os.path.isdir(path):  # Orbax checkpoint from this framework
        from lss_carla_tpu.utils.checkpoint import CheckpointManager
        mgr = CheckpointManager(path)
        state, _ = mgr.restore(None)
        mgr.close()
        return {
            "params": _tree_get(state["params"], ("camencode", "trunk")),
            "batch_stats": _tree_get(state["batch_stats"],
                                     ("camencode", "trunk")),
        }

    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        ckpt = ckpt["model_state_dict"]
    sd = {k: np.asarray(v.detach().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in ckpt.items()}
    if any(k.startswith("camencode.trunk.") for k in sd):
        # full reference LSS checkpoint -> convert, then slice the trunk
        variables = torch_state_dict_to_variables(sd)
        return {
            "params": _tree_get(variables["params"], ("camencode", "trunk")),
            "batch_stats": _tree_get(variables["batch_stats"],
                                     ("camencode", "trunk")),
        }
    return imagenet_state_dict_to_trunk_variables(sd, variant)


def merge_trunk_variables(variables: dict, trunk: dict) -> dict:
    """Return a copy of full-model ``variables`` with the
    ``camencode/trunk`` subtree replaced by ``trunk``, shape-checked
    leaf-by-leaf (catches variant mismatches before a cryptic jit error)."""
    import jax

    def replace(tree, sub):
        old = _tree_get(tree, ("camencode", "trunk"))
        old_shapes = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), old)
        new_shapes = jax.tree_util.tree_map(lambda x: tuple(np.shape(x)), sub)
        if old_shapes != new_shapes:
            raise ValueError(
                "pretrained trunk does not match the model's trunk "
                f"structure/shapes:\nmodel: {old_shapes}\nloaded: {new_shapes}")
        sub = jax.tree_util.tree_map(
            lambda o, n: np.asarray(n, dtype=np.asarray(o).dtype), old, sub)
        out = dict(tree)
        out["camencode"] = dict(out["camencode"])
        out["camencode"]["trunk"] = sub
        return out

    return {
        **variables,
        "params": replace(variables["params"], trunk["params"]),
        "batch_stats": replace(variables["batch_stats"],
                               trunk["batch_stats"]),
    }


def variables_to_torch_state_dict(variables: dict) -> dict:
    """Inverse converter: flax {"params", "batch_stats"} -> reference torch
    state_dict (numpy tensors, reference naming/layouts). Round-trips with
    ``torch_state_dict_to_variables`` — lets users export checkpoints back
    to the PyTorch reference."""
    name_map = build_name_map()

    def get(tree, path):
        node = tree
        for k in path:
            node = node[k]
        return node

    out = {}
    for torch_name, (path, tf, collection) in name_map.items():
        tree = variables["params"] if collection == "params" \
            else variables["batch_stats"]
        arr = np.asarray(get(tree, path))
        if tf is not None:  # both conv transforms are (2,3,1,0) transposes
            arr = np.transpose(arr, (3, 2, 0, 1))
        out[torch_name] = arr
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a reference .pt checkpoint -> flax variables (+meta)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(ckpt, dict) and "model_state_dict" in ckpt:
        meta = {k: ckpt[k] for k in ("counter", "epoch", "val_iou")
                if k in ckpt}
        sd = ckpt["model_state_dict"]
    else:
        sd = ckpt
    variables = torch_state_dict_to_variables(
        {k: v.detach().cpu().numpy() for k, v in sd.items()})
    variables["meta"] = meta
    return variables
