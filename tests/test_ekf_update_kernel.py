"""Pallas fused covariance downdate vs the XLA reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from drl_graph_exploration_tpu.ops.ekf_update import fused_downdate


def _ref(cov, k, b):
    c = k @ b.T
    return cov - c - c.T


def test_fused_downdate_matches_reference():
    key = jax.random.PRNGKey(0)
    d, m = 160, 32  # non-multiple of the 128 tile on purpose
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (d, d))
    cov = a @ a.T / d
    kg = 0.01 * jax.random.normal(k2, (d, m))
    bh = 0.01 * jax.random.normal(k3, (d, m))

    out = fused_downdate(cov, kg, bh, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(cov, kg, bh)),
                               rtol=1e-5, atol=1e-6)
    # bitwise symmetry
    o = np.asarray(out)
    assert (o == o.T).all()


def test_fused_downdate_batched():
    key = jax.random.PRNGKey(1)
    d, m, b = 128, 8, 3
    k1, k2, k3 = jax.random.split(key, 3)
    a = jax.random.normal(k1, (b, d, d))
    cov = jnp.einsum("bij,bkj->bik", a, a) / d
    kg = 0.01 * jax.random.normal(k2, (b, d, m))
    bh = 0.01 * jax.random.normal(k3, (b, d, m))
    out = jax.vmap(lambda c, k_, b_: fused_downdate(c, k_, b_, interpret=True))(
        cov, kg, bh
    )
    ref = jax.vmap(_ref)(cov, kg, bh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
