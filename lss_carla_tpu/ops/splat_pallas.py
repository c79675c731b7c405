"""Pallas TPU kernel for the splat scatter-add.

Strategy: for each batch item the whole padded BEV accumulator
(num_slots x C, e.g. 40008 x 64 f32 = 10.2 MB) lives in VMEM for the entire
pass; point chunks (ids + features) stream in via the Pallas pipeline. Each
grid step accumulates its chunk into the resident accumulator with a
sequential dynamic-row update loop; the buffer is written back to HBM once
when the batch item changes. This turns the reference's
filter+argsort+cumsum+dense-scatter (4 HBM-bound passes with data-dependent
shapes) into a single streaming pass with static shapes.

Out-of-grid points carry the sentinel id ``num_slots`` which lands in the
padding rows and is sliced off, so no masking is needed in the inner loop.

Backward = gather of the output cotangent at each point's voxel (zero for
dropped points) — identical math to the scatter path's VJP and to the
reference ``QuickCumsum.backward`` (``src/tools.py:211-219``); XLA's native
gather is already fast on TPU so the VJP needs no custom kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points processed per grid step (per-chunk VMEM: CHUNK*C*4B + CHUNK*4B)
CHUNK = 2048


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _splat_kernel(ids_ref, feats_ref, out_ref):
    """Grid (B, K): accumulate one chunk into the resident accumulator."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, carry):
        idx = ids_ref[0, i]
        row = feats_ref[0, i, :]
        cur = out_ref[0, pl.ds(idx, 1), :]
        out_ref[0, pl.ds(idx, 1), :] = cur + row[None, :]
        return carry

    jax.lax.fori_loop(0, ids_ref.shape[1], body, 0, unroll=4)


def _splat_forward(pts: jnp.ndarray, ids: jnp.ndarray, num_slots: int,
                   interpret: bool = False) -> jnp.ndarray:
    """pts (B, P, C), ids (B, P) int32 with sentinel num_slots -> (B, num_slots, C)."""
    B, P, C = pts.shape
    S_pad = _round_up(num_slots + 1, 8)
    P_pad = _round_up(P, CHUNK)
    if P_pad != P:
        # padding points carry the sentinel id -> land in padding rows
        pts = jnp.pad(pts, ((0, 0), (0, P_pad - P), (0, 0)))
        ids = jnp.pad(ids, ((0, 0), (0, P_pad - P)),
                      constant_values=num_slots)
    K = P_pad // CHUNK

    out = pl.pallas_call(
        _splat_kernel,
        grid=(B, K),
        in_specs=[
            pl.BlockSpec((1, CHUNK), lambda b, k: (b, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK, C), lambda b, k: (b, k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S_pad, C), lambda b, k: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S_pad, C), pts.dtype),
        interpret=interpret,
    )(ids, pts)
    return out[:, :num_slots, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def splat_pallas_batched(pts: jnp.ndarray, ids: jnp.ndarray, num_slots: int,
                         interpret: bool = False) -> jnp.ndarray:
    """Batched Pallas splat: sum point features per voxel slot."""
    return _splat_forward(pts, ids, num_slots, interpret)


def _fwd(pts, ids, num_slots, interpret):
    return _splat_forward(pts, ids, num_slots, interpret), ids


def _bwd(num_slots, interpret, ids, g):
    # (B, num_slots, C) cotangent -> per-point gather; sentinel ids -> 0
    dpts = jax.vmap(
        lambda gb, ib: jnp.take(gb, ib, axis=0, mode="fill", fill_value=0)
    )(g, ids)
    return dpts, None


splat_pallas_batched.defvjp(_fwd, _bwd)
