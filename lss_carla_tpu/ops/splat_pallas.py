"""Pallas TPU kernel for the splat scatter-add.

Strategy: the whole padded BEV accumulator (num_slots x C, e.g. 40008 x 64
f32 = 10.2 MB) stays resident in VMEM for one batch item while point chunks
stream in via the Pallas pipeline — features into VMEM blocks, voxel ids
DMA'd from HBM into SMEM (2D (8,128) int32 tiles; narrow int32 BlockSpecs
aren't tileable). Each grid step accumulates its chunk with a sequential
dynamic-row update; the accumulator writes back to HBM once at the end.
Batch items run as a sequential ``lax.map`` of single-item kernels — a
batched grid would revolve (double-buffer) the 10.2 MB output block and
overflow the 16 MB VMEM.

This replaces the reference's filter+argsort+cumsum+dense-scatter (4
HBM-bound passes with data-dependent shapes, ``src/models.py:204-246``) and
XLA's generic scatter (measured ~7 ms at B=8 — half the train step) with a
single streaming pass.

Out-of-grid points carry the sentinel id ``num_slots`` which lands in the
padding rows and is sliced off, so no masking is needed in the inner loop.

Backward = gather of the output cotangent at each point's voxel (zero for
dropped points) — identical math to the reference ``QuickCumsum.backward``
(``src/tools.py:211-219``); XLA's native gather is fast on TPU so the VJP
needs no custom kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# points per grid step: CHUNK int32 ids in SMEM (4 KB) + CHUNK x C floats in
# VMEM (256 KB at C=64)
CHUNK = 1024


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _splat_kernel(ids_hbm, feats_ref, out_ref, ids_smem, sem):
    """Grid (K,): accumulate one chunk into the resident accumulator.

    ids_hbm: (K, CHUNK//128, 128) int32 in HBM — each step DMAs its 2D tile
    into the SMEM scratch. feats_ref: VMEM (1, CHUNK, C); out_ref: VMEM
    (S_pad, C), resident across the whole grid.
    """
    k = pl.program_id(0)

    dma = pltpu.make_async_copy(ids_hbm.at[k], ids_smem, sem)
    dma.start()

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    dma.wait()

    def body(i, carry):
        idx = ids_smem[i // 128, i % 128]
        row = feats_ref[0, pl.ds(i, 1), :]
        cur = out_ref[pl.ds(idx, 1), :]
        out_ref[pl.ds(idx, 1), :] = cur + row
        return carry

    jax.lax.fori_loop(0, CHUNK, body, 0)


def _splat_single(pts: jnp.ndarray, ids: jnp.ndarray, num_slots: int,
                  interpret: bool) -> jnp.ndarray:
    """(P_pad, C) points + (P_pad,) ids -> (S_pad, C) accumulator."""
    P_pad, C = pts.shape
    S_pad = _round_up(num_slots + 1, 8)
    K = P_pad // CHUNK
    return pl.pallas_call(
        _splat_kernel,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # ids: manual DMA
            pl.BlockSpec((1, CHUNK, C), lambda k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S_pad, C), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S_pad, C), pts.dtype),
        scratch_shapes=[
            pltpu.SMEM((CHUNK // 128, 128), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(ids.reshape(K, CHUNK // 128, 128), pts.reshape(K, CHUNK, C))


def _splat_forward(pts: jnp.ndarray, ids: jnp.ndarray, num_slots: int,
                   interpret: bool = False) -> jnp.ndarray:
    """pts (B, P, C), ids (B, P) int32 with sentinel num_slots
    -> (B, num_slots, C)."""
    B, P, C = pts.shape
    P_pad = _round_up(P, CHUNK)
    if P_pad != P:
        # padding points carry the sentinel id -> land in padding rows
        pts = jnp.pad(pts, ((0, 0), (0, P_pad - P), (0, 0)))
        ids = jnp.pad(ids, ((0, 0), (0, P_pad - P)),
                      constant_values=num_slots)

    # sequential over batch: one resident 10 MB accumulator at a time
    out = jax.lax.map(
        lambda args: _splat_single(args[0], args[1], num_slots, interpret),
        (pts, ids))
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
