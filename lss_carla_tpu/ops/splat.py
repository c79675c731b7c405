"""Fixed-shape splat (voxel pooling) — the TPU-native replacement for the
reference's rank-sort + QuickCumsum scatter.

The reference (``src/models.py:204-246`` + ``src/tools.py:182-219``) filters
out-of-grid points (data-dependent shape), sorts the survivors by voxel rank,
and reduces runs with a cumsum trick whose backward is a gather. All of that
exists only to express "sum the features of points landing in the same voxel"
on hardware without a fast scatter-add.

On TPU we keep every point (static shape ``Nprime = B*N*D*fH*fW``), map
out-of-grid points to an out-of-range sentinel index, and do one fixed-shape
scatter-add into the dense (B, nz, X, Y, C) grid. The custom VJP is the exact
gradient the reference's ``QuickCumsum.backward`` computes: gather the output
cotangent at each point's voxel (zero for dropped points).

Channels-last layout (B, X, Y, nz*C) keeps the lanes dimension = C for the
VPU/MXU; use ``to_reference_layout`` for NCHW parity comparisons.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def voxel_indices(geom: jnp.ndarray, dx, bx, nx) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Quantize ego-frame points to flat voxel ids.

    Args:
      geom: (..., 3) ego-frame points (any leading shape).
      dx, bx, nx: grid constants from ``gen_dx_bx``.

    Returns:
      (flat_id, valid): flat_id (...,) int32 in [0, nz*X*Y) for in-grid points
      (sentinel nz*X*Y for out-of-grid), valid (...,) bool.

    Quantization matches reference ``models.py:212`` exactly:
    ``((geom - (bx - dx/2)) / dx)`` truncated toward zero (torch ``.long()``
    == ``astype(int32)``), so points marginally below the lower bound that
    truncate to 0 are kept — same inclusion behavior as the reference.
    """
    dx = jnp.asarray(dx, geom.dtype)
    bx = jnp.asarray(bx, geom.dtype)
    nx = jnp.asarray(nx, jnp.int32)
    vox = ((geom - (bx - dx / 2.0)) / dx).astype(jnp.int32)  # (..., 3) = (ix, iy, iz)
    valid = ((vox[..., 0] >= 0) & (vox[..., 0] < nx[0])
             & (vox[..., 1] >= 0) & (vox[..., 1] < nx[1])
             & (vox[..., 2] >= 0) & (vox[..., 2] < nx[2]))
    # layout: ((z * X) + x) * Y + y  ->  dense (nz, X, Y)
    flat = (vox[..., 2] * nx[0] + vox[..., 0]) * nx[1] + vox[..., 1]
    num_slots = nx[0] * nx[1] * nx[2]
    flat = jnp.where(valid, flat, num_slots)  # sentinel: one past the end
    return flat.astype(jnp.int32), valid


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def splat_scatter_add(feats: jnp.ndarray, ids: jnp.ndarray, num_slots: int):
    """sum_{p: ids[p]==s} feats[p] for every slot s — one XLA scatter-add.

    feats: (P, C); ids: (P,) int32, out-of-range ids are dropped.
    Returns (num_slots, C) in feats.dtype.
    """
    return _scatter_fwd_impl(feats, ids, num_slots)


def _scatter_fwd_impl(feats, ids, num_slots):
    out = jnp.zeros((num_slots, feats.shape[-1]), feats.dtype)
    return out.at[ids].add(feats, mode="drop")


def _scatter_fwd(feats, ids, num_slots):
    return _scatter_fwd_impl(feats, ids, num_slots), ids


def _scatter_bwd(num_slots, ids, g):
    # Gradient of sum-per-voxel w.r.t. each point feature = cotangent at its
    # voxel; dropped (out-of-grid) points get zero. This is exactly what the
    # reference QuickCumsum.backward gather computes (tools.py:211-219).
    dfeats = jnp.take(g, ids, axis=0, mode="fill", fill_value=0)
    return dfeats, None


splat_scatter_add.defvjp(_scatter_fwd, _scatter_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def splat_sorted_scatter_add(feats: jnp.ndarray, ids: jnp.ndarray,
                             num_slots: int):
    """Sort-then-scatter variant of ``splat_scatter_add`` (same contract).

    Motivation (BEVPoolv2-inspired; docs/ROADMAP.md item 1): XLA's direct
    scatter-add sorts (key, 64-channel payload) pairs, moving the 41 MB
    payload through every sort pass. Here the sort sees only (key, index)
    pairs (8 B/point), the payload moves ONCE through a single row gather,
    and the scatter is marked ``indices_are_sorted`` so XLA can emit the
    streaming sorted-update path. Out-of-grid sentinel ids sort to the end
    and drop as one contiguous tail.

    Backward is identical to ``splat_scatter_add`` (gather of the output
    cotangent by UNSORTED ids — the sum per voxel is order-invariant).
    """
    return _sorted_fwd_impl(feats, ids, num_slots)


def _sorted_fwd_impl(feats, ids, num_slots):
    order = jnp.argsort(ids)                       # key-only sort (8 B/pt)
    ids_s = jnp.take(ids, order)
    feats_s = jnp.take(feats, order, axis=0)       # payload moves once
    out = jnp.zeros((num_slots, feats.shape[-1]), feats.dtype)
    return out.at[ids_s].add(feats_s, mode="drop", indices_are_sorted=True)


def _sorted_fwd(feats, ids, num_slots):
    return _sorted_fwd_impl(feats, ids, num_slots), ids


splat_sorted_scatter_add.defvjp(_sorted_fwd, _scatter_bwd)


def voxel_pooling(geom: jnp.ndarray, feats: jnp.ndarray, dx, bx, nx,
                  method: str = "scatter") -> jnp.ndarray:
    """Splat lifted camera features onto the BEV grid.

    Args:
      geom: (B, N, D, fH, fW, 3) ego-frame frustum points (``get_geometry``).
      feats: (B, N, D, fH, fW, C) lifted features.
      dx, bx, nx: grid constants.
      method: "scatter" (XLA scatter-add) or "pallas" (TPU kernel).

    Returns:
      (B, X, Y, nz*C) channels-last BEV features. Channel order is z-major
      ([z0: C chans][z1: C chans]...), matching the reference's collapse-Z
      concat (``models.py:244``) once transposed to NCHW.
    """
    B, N, D, fH, fW, C = feats.shape
    nz, X, Y = int(nx[2]), int(nx[0]), int(nx[1])
    num_slots = nz * X * Y

    flat, _ = voxel_indices(geom, dx, bx, nx)  # (B, N, D, fH, fW)
    flat = flat.reshape(B, -1)
    pts = feats.reshape(B, -1, C)

    # Perf notes (TPU v5e, B=8, P=43296, C=64, S=40000, chained-in-jit;
    # scripts/splat_bench.py, bf16 feats):
    #   XLA scatter-add (sort-based):  5.9 ms fwd / 8.7 ms fwd+bwd <- default
    #   key-only sort + sorted scatter: 6.5 ms fwd / 9.2 ms fwd+bwd
    #   Pallas sequential-RMW kernel:  9.4 ms fwd (f32, at S=20000!)
    #   host-presorted gather+cumsum+diff: 16.0 ms fwd (cumsum-bound)
    # XLA's sort-based scatter wins (kill-memo: docs/ROADMAP.md item 1);
    # the alternatives are kept for other grid/point topologies.
    if method == "pallas":
        # the Pallas kernel keeps the whole accumulator resident in VMEM;
        # grids whose accumulator exceeds ~12 MB (v5e VMEM is 16 MB) fall
        # back to the XLA scatter, which is also faster at that size (see
        # perf notes above). bf16 also falls back: Mosaic rejects the
        # kernel's sub-tile (1, C) bf16 vector loads on hardware (measured
        # on v5e; interpret mode masks it), and the scatter is faster anyway.
        acc_bytes = (num_slots + 8) * C * jnp.dtype(feats.dtype).itemsize
        if acc_bytes > 12 * 1024 * 1024 or feats.dtype != jnp.float32:
            method = "scatter"

    if method == "scatter":
        out = jax.vmap(lambda f, i: splat_scatter_add(f, i, num_slots))(pts, flat)
    elif method == "sorted":
        out = jax.vmap(
            lambda f, i: splat_sorted_scatter_add(f, i, num_slots))(pts, flat)
    elif method == "pallas":
        from lss_carla_tpu.ops.splat_pallas import splat_pallas_batched
        # compiled Mosaic kernel on TPU backends; interpreter elsewhere (CPU
        # tests) — identical semantics either way
        interpret = jax.default_backend() not in ("tpu", "axon")
        out = splat_pallas_batched(pts, flat, num_slots, interpret)
    else:
        raise ValueError(f"unknown splat method: {method}")

    out = out.reshape(B, nz, X, Y, C)
    # collapse Z into channels, z-major, channels-last
    return out.transpose(0, 2, 3, 1, 4).reshape(B, X, Y, nz * C)


def to_reference_layout(bev: jnp.ndarray) -> jnp.ndarray:
    """(B, X, Y, C') channels-last -> reference (B, C', X, Y) NCHW."""
    return bev.transpose(0, 3, 1, 2)
