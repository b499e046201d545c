"""Pallas TPU kernel for the joint-EKF covariance downdate.

The measurement update's covariance correction (``belief.add_measurements``)
is the Joseph-form downdate rewritten as ``cov - C - C^T`` with
``C = K (PHt - 0.5 K S)^T`` — the only O(D^2) pass in the belief recursion.
Under XLA it costs ~4 full passes over the (D, D) matrix: materialise
``C = K B^T``, materialise its transpose, then the 3-operand combine.  This
kernel computes per (BI, BJ) tile

    out[i, j] = cov[i, j] - K[i, :]·B[j, :] - B[i, :]·K[j, :]

in one pass: read cov once, write out once; the rank-2L factors K and B are
tiny (D x 2L) and ride along per tile row/column.

Bitwise symmetry (the filter diverges if asymmetry accumulates): tile (j, i)
computes ``dot(K_j, B_i^T) + dot(B_j, K_i^T)``, whose per-element products and
reduction order are identical to tile (i, j)'s up to the commutative final
addition — so ``out == out.T`` exactly, matching the XLA path's ``C + C^T``
construction.

Tile edges: D need not divide the 128-tile — Pallas pads out-of-range reads
and drops out-of-range writes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _make_kernel(precision):
    def _downdate_kernel(cov_ref, k_row_ref, b_row_ref, k_col_ref, b_col_ref, out_ref):
        dn = (((1,), (1,)), ((), ()))  # contract the measurement axis
        acc = jax.lax.dot_general(
            k_row_ref[:],
            b_col_ref[:],
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        acc = acc + jax.lax.dot_general(
            b_row_ref[:],
            k_col_ref[:],
            dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=precision,
        )
        out_ref[:] = cov_ref[:] - acc

    return _downdate_kernel


@functools.partial(
    jax.jit, static_argnames=("interpret", "tile", "pad_lanes", "precision")
)
def fused_downdate(
    cov: jax.Array,
    k_gain: jax.Array,
    b_half: jax.Array,
    interpret: bool = False,
    tile: int = 256,
    pad_lanes: int = 0,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """``cov - K B^T - B K^T`` in a single read+write pass over ``cov``.

    Args: cov (D, D) f32 symmetric; k_gain/b_half (D, M) f32 with M the
    measurement dimension.  M is zero-padded to ``pad_lanes`` so the factor
    tiles are lane-aligned and the MXU contraction runs on full 128-wide
    tiles (zero columns contribute exact zeros).  Batched use: ``jax.vmap``.
    """
    d = cov.shape[0]
    m = k_gain.shape[1]
    if pad_lanes and m % pad_lanes:
        pad = pad_lanes - m % pad_lanes
        k_gain = jnp.pad(k_gain, ((0, 0), (0, pad)))
        b_half = jnp.pad(b_half, ((0, 0), (0, pad)))
        m = m + pad
    grid = (pl.cdiv(d, tile), pl.cdiv(d, tile))
    return pl.pallas_call(
        _make_kernel(precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((d, d), cov.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * d * d * m, bytes_accessed=2 * d * d * 4, transcendentals=0
        ),
        interpret=interpret,
    )(cov, k_gain, b_half, k_gain, b_half)
