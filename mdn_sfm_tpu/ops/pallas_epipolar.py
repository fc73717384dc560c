"""Pallas TPU kernel for the per-pixel epipolar residual map.

The reference materializes homogeneous coordinate tensors p1/p2 of shape
(B, 3, H·W) and runs batched 3×3 matmuls + normalization over them
(loss_functions.py:117-123, loss_utils.py:39-69). The XLA path in
:func:`mdn_sfm_tpu.geometry.epipolar_residual` already fuses this to
elementwise FMAs; this kernel goes one step further and keeps the whole
map — coordinate generation, the three F·p1 FMAs, the p2 dot product and
the Sampson normalization — in VMEM in a single pass, reading only the two
flow component planes from HBM and writing only the |residual| plane.

Used on the training hot path when the epipolar map needs no gradient
(flow/pose frozen — the default mode; the map is constant w.r.t. the mobile
decoder's parameters). The jnp path remains the autodiff-able fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geometry import fundamental_matrix

Array = jax.Array


def _kernel(F_ref, u_ref, v_ref, out_ref):
    """One (batch, row-tile) block: out = |(F·p1)·p2| / ‖(F·p1)₁₂‖.

    F_ref: scalar-prefetched (B, 9) row-major F table in SMEM;
    u/v/out: (1, TH, W) VMEM planes."""
    _, th, w = u_ref.shape
    bi = pl.program_id(0)
    tile = pl.program_id(1)

    # pixel coordinates of this tile (TPU needs ≥2-D INTEGER iota)
    y = jax.lax.broadcasted_iota(jnp.int32, (th, w), 0).astype(jnp.float32) + tile * th
    x = jax.lax.broadcasted_iota(jnp.int32, (th, w), 1).astype(jnp.float32)

    l0 = F_ref[bi, 0] * x + F_ref[bi, 1] * y + F_ref[bi, 2]  # (F·p1) rows
    l1 = F_ref[bi, 3] * x + F_ref[bi, 4] * y + F_ref[bi, 5]
    l2 = F_ref[bi, 6] * x + F_ref[bi, 7] * y + F_ref[bi, 8]

    x2 = x + u_ref[0]
    y2 = y + v_ref[0]
    num = l0 * x2 + l1 * y2 + l2
    den = jnp.sqrt(l0 * l0 + l1 * l1 + 1e-10) + 1e-10
    out_ref[0] = jnp.abs(num / den)


def _pick_tile(h: int) -> int:
    for th in (32, 16, 8):
        if h % th == 0:
            return th
    return h


@functools.partial(jax.jit, static_argnames=("interpret",))
def epipolar_abs_residual_pallas(
    flow: Array, inv_K: Array, rotation: Array, translation: Array, interpret: bool = False
) -> Array:
    """|epipolar residual| map via the Pallas kernel.

    Args:
        flow: (B, H, W, 2) pixel flow
        inv_K: (B, 3+, 3+); rotation (B, 3, 3); translation (B, 3)
    Returns:
        (B, H, W) float32 — matches |geometry.epipolar_residual(...)|.
    """
    b, h, w, _ = flow.shape
    F = fundamental_matrix(inv_K[..., :3, :3], rotation, translation)  # (B,3,3)
    Fflat = F.reshape(b, 9)
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)

    th = _pick_tile(h)
    grid = (b, h // th)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # the (B, 9) F table rides in SMEM
        grid=grid,
        in_specs=[
            # index maps also receive the prefetched scalar refs (ignored)
            pl.BlockSpec((1, th, w), lambda bi, ti, *_: (bi, ti, 0)),
            pl.BlockSpec((1, th, w), lambda bi, ti, *_: (bi, ti, 0)),
        ],
        out_specs=pl.BlockSpec((1, th, w), lambda bi, ti, *_: (bi, ti, 0)),
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(Fflat, u, v)
