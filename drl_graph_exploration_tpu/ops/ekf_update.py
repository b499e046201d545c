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


def _make_step_kernel(precision, tile):
    def _step_kernel(
        cov_ref, nr_row_ref, nr_col_ref,
        k_row_ref, b_row_ref, k_col_ref, b_col_ref, out_ref,
    ):
        # Row 3 of the aux matrix carries arange(D) - r_new as f32 (exact for
        # D << 2^24); its first element recovers r_new so the band offsets
        # can be rebuilt as 2D iotas (Mosaic cannot insert a minor dim on the
        # 1-bit masks a 1D comparison would produce).
        i = pl.program_id(0)
        j = pl.program_id(1)
        shape = cov_ref.shape
        r_new = (jnp.float32(j * tile) - nr_row_ref[3, 0]).astype(jnp.int32)
        ri = (
            jax.lax.broadcasted_iota(jnp.int32, shape, 0)
            + (jnp.int32(i * tile) - r_new)
        )  # signed offset of each global row into the 3-wide band
        rj = (
            jax.lax.broadcasted_iota(jnp.int32, shape, 1)
            + (jnp.int32(j * tile) - r_new)
        )
        in_band_i = (ri >= 0) & (ri < 3)
        in_band_j = (rj >= 0) & (rj < 3)

        # odometry augmentation: rows/cols in the 3-wide band read new_rows
        # (which carries the symmetrised corner at its own band columns, so
        # the band intersection is consistent from both sides)
        nr_j = nr_row_ref[:]  # (8, T) new_rows at this tile's columns
        nr_i = nr_col_ref[:]  # (8, T) new_rows at this tile's rows
        row_exp = jnp.where(
            ri == 0,
            nr_j[0][None, :],
            jnp.where(ri == 1, nr_j[1][None, :], nr_j[2][None, :]),
        )
        col_exp = jnp.where(
            rj == 0,
            nr_i[0][:, None],
            jnp.where(rj == 1, nr_i[1][:, None], nr_i[2][:, None]),
        )
        aug = jnp.where(
            in_band_i,
            row_exp,
            jnp.where(in_band_j, col_exp, cov_ref[:]),
        )

        # measurement downdate (same bitwise-symmetric structure as
        # fused_downdate above)
        dn = (((1,), (1,)), ((), ()))
        acc = jax.lax.dot_general(
            k_row_ref[:], b_col_ref[:], dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc = acc + jax.lax.dot_general(
            b_row_ref[:], k_col_ref[:], dimension_numbers=dn,
            preferred_element_type=jnp.float32, precision=precision,
        )
        out_ref[:] = aug - acc

    return _step_kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "precision"))
def fused_step_downdate(
    cov: jax.Array,
    new_rows: jax.Array,
    k_gain: jax.Array,
    b_half: jax.Array,
    interpret: bool = False,
    tile: int = 256,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """One full-matrix pass for a whole belief step's covariance writes:

        aug = cov with rows/cols [r_new, r_new+3) replaced by ``new_rows``
        out = aug - K B^T - B K^T

    Args: cov (D, D); new_rows (8, D) — rows 0..2 are the odometry-augmented
    pose rows (already containing the symmetrised 3x3 corner at their own
    band columns), row 3 = ``arange(D) - r_new`` as f32 (the band offset; f32
    is exact for D << 2^24), rows 4..7 padding; k_gain / b_half (D, M).
    Batched use: ``jax.vmap``.
    """
    d = cov.shape[0]
    m = k_gain.shape[1]
    grid = (pl.cdiv(d, tile), pl.cdiv(d, tile))
    return pl.pallas_call(
        _make_step_kernel(precision, tile),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i, j: (0, i), memory_space=pltpu.VMEM),
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
    )(cov, new_rows, new_rows, k_gain, b_half, k_gain, b_half)


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
