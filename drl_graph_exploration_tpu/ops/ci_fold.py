"""Pallas TPU kernel: the virtual-map information fold.

The information raster is a sequential fold over poses (covariance
intersection is order-dependent).  The XLA ``lax.scan`` version writes the
(cells, 3) carry to HBM every chunk iteration; this kernel keeps the whole
fold in VMEM — one grid instance per world computes all cells, looping poses
with ``fori_loop`` while the carry planes live on-chip.  Inputs are the SoA
quantities of ``virtual_map.update_information``:

* ``poses``      (P, 3)    pose means,
* ``covs``       (P, 6)    local-frame covariance upper triangles
                           (s11, s12, s13, s22, s23, s33),
* ``active``     (P, 1)    1.0 where the pose participates,
* ``cx``, ``cy`` (R, Cp)   cell-centre coordinates (lane-padded),
* sensor/prior scalars via closure (static).

Output: three planes (a, b, d) of the per-cell symmetric 2x2 information.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def ci_fold_pallas(
    poses: jax.Array,  # (P, 3)
    covs: jax.Array,  # (P, 6)
    active: jax.Array,  # (P,) float32 (1.0 active)
    cx: jax.Array,  # (R, Cp) padded cell xs
    cy: jax.Array,  # (R, Cp)
    *,
    sigma0: float,
    sb2: float,
    sr2: float,
    cos_max_bearing: float,
    min_range: float,
    max_range: float,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    p = poses.shape[0]
    r, cpad = cx.shape

    def kernel(poses_ref, covs_ref, active_ref, cx_ref, cy_ref, oa, ob, od):
        cxv = cx_ref[:]
        cyv = cy_ref[:]
        init_a = jnp.full((r, cpad), 1.0 / sigma0**2, jnp.float32)
        init_b = jnp.zeros((r, cpad), jnp.float32)
        init_d = jnp.full((r, cpad), 1.0 / sigma0**2, jnp.float32)
        init_u = jnp.zeros((r, cpad), jnp.float32)

        def body(t, carry):
            ia, ib, idd, upd = carry
            x0 = poses_ref[t, 0]
            y0 = poses_ref[t, 1]
            th = poses_ref[t, 2]
            s11 = covs_ref[t, 0]
            s12 = covs_ref[t, 1]
            s13 = covs_ref[t, 2]
            s22 = covs_ref[t, 3]
            s23 = covs_ref[t, 4]
            s33 = covs_ref[t, 5]
            ok = active_ref[t, 0]

            ct, st = jnp.cos(th), jnp.sin(th)
            dx = cxv - x0
            dy = cyv - y0
            qx = ct * dx + st * dy
            qy = -st * dx + ct * dy
            r2 = qx * qx + qy * qy
            rr = jnp.sqrt(r2)
            # |atan2(qy,qx)| < B  <=>  qx > r*cos(B)  for symmetric FoV
            # (atan2 is not lowerable in Pallas TPU)
            vis = (
                (qx > rr * cos_max_bearing)
                & (rr < max_range)
                & (rr > min_range)
            ).astype(jnp.float32) * ok

            ir2 = 1.0 / jnp.where(r2 == 0, 1.0, r2)
            ir = 1.0 / jnp.where(rr == 0, 1.0, rr)
            hb1 = qy * ir2
            hb2 = -qx * ir2
            hr1 = -qx * ir
            hr2 = -qy * ir
            a11 = (
                s11 * hb1 * hb1 + s22 * hb2 * hb2 + s33
                + 2.0 * (s12 * hb1 * hb2 - s13 * hb1 - s23 * hb2)
            ) + sb2
            a12 = (
                s11 * hb1 * hr1 + s22 * hb2 * hr2
                + s12 * (hb1 * hr2 + hb2 * hr1)
                - s13 * hr1 - s23 * hr2
            )
            a22 = (s11 * hr1 * hr1 + s22 * hr2 * hr2 + 2.0 * s12 * hr1 * hr2) + sr2
            det_i = a11 * a22 - a12 * a12
            inv_det = 1.0 / jnp.where(det_i == 0, 1.0, det_i)
            m11 = a22 * inv_det
            m12 = -a12 * inv_det
            m22 = a11 * inv_det

            u1 = (ct * (-qy) - st * qx) * ir2
            u2 = (st * (-qy) + ct * qx) * ir2
            w1 = (ct * qx - st * qy) * ir
            w2 = (st * qx + ct * qy) * ir
            pa = m11 * u1 * u1 + 2.0 * m12 * u1 * w1 + m22 * w1 * w1
            pb = m11 * u1 * u2 + m12 * (u1 * w2 + u2 * w1) + m22 * w1 * w2
            pd = m11 * u2 * u2 + 2.0 * m12 * u2 * w2 + m22 * w2 * w2

            # covariance intersection (information planes)
            det1 = ia * idd - ib * ib
            det2 = pa * pd - pb * pb
            cc = idd * pa + ia * pd - 2.0 * ib * pb
            dd = det1 + det2 - cc
            safe = jnp.where(dd == 0, 1.0, dd)
            w = 0.5 * (2.0 * det2 - cc) / safe
            w = jnp.where(dd == 0, 0.0, w)
            w = jnp.where((w < 0) & (dd < 0) | (w > 1) & (dd > 0), 0.0, w)
            w = jnp.where((w < 0) & (dd > 0) | (w > 1) & (dd < 0), 1.0, w)
            fa = w * ia + (1 - w) * pa
            fb = w * ib + (1 - w) * pb
            fd = w * idd + (1 - w) * pd
            # first visible update replaces instead of fusing
            fa = jnp.where(upd > 0, fa, pa)
            fb = jnp.where(upd > 0, fb, pb)
            fd = jnp.where(upd > 0, fd, pd)
            take = vis > 0
            ia = jnp.where(take, fa, ia)
            ib = jnp.where(take, fb, ib)
            idd = jnp.where(take, fd, idd)
            upd = jnp.maximum(upd, vis)
            return ia, ib, idd, upd

        ia, ib, idd, _ = jax.lax.fori_loop(
            0, p, body, (init_a, init_b, init_d, init_u)
        )
        oa[:] = ia
        ob[:] = ib
        od[:] = idd

    out_shape = jax.ShapeDtypeStruct((r, cpad), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(out_shape, out_shape, out_shape),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(poses, covs, active.reshape(p, 1), cx, cy)


def update_information_pallas(
    poses: jax.Array,  # (P, 3)
    cov_local: jax.Array,  # (P, 3, 3)
    active: jax.Array,  # (P,) bool
    centers: jax.Array,  # (R, C, 2)
    config,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in core for ``virtual_map.update_information``: returns the
    (R, C, 2, 2) information raster.  Requires a symmetric FoV (the kernel
    replaces the atan2 bearing test with a cosine comparison)."""
    s = config.sensor
    if abs(s.min_bearing + s.max_bearing) > 1e-9:
        raise NotImplementedError(
            "pallas CI fold requires a symmetric sensor FoV; use the XLA path"
        )
    r, c = centers.shape[:2]
    cpad = _round_up(c, LANE)
    # pad lanes with far-away cells (never visible)
    cx = jnp.full((r, cpad), 1e9, jnp.float32).at[:, :c].set(centers[..., 0])
    cy = jnp.full((r, cpad), 1e9, jnp.float32).at[:, :c].set(centers[..., 1])
    covs6 = jnp.stack(
        [
            cov_local[:, 0, 0],
            cov_local[:, 0, 1],
            cov_local[:, 0, 2],
            cov_local[:, 1, 1],
            cov_local[:, 1, 2],
            cov_local[:, 2, 2],
        ],
        axis=-1,
    )
    ia, ib, idd = ci_fold_pallas(
        poses,
        covs6,
        active.astype(jnp.float32),
        cx,
        cy,
        sigma0=config.virtual_map.sigma0,
        sb2=s.bearing_noise**2,
        sr2=s.range_noise**2,
        cos_max_bearing=math.cos(s.max_bearing),
        min_range=s.min_range,
        max_range=s.max_range,
        interpret=interpret,
    )
    ia, ib, idd = ia[:, :c], ib[:, :c], idd[:, :c]
    return jnp.stack(
        [jnp.stack([ia, ib], -1), jnp.stack([ib, idd], -1)], -2
    )
