import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drl_graph_exploration_tpu.geometry import se2


KEY = jax.random.PRNGKey(0)


def random_pose(key):
    k1, k2 = jax.random.split(key)
    xy = jax.random.uniform(k1, (2,), minval=-5.0, maxval=5.0)
    t = jax.random.uniform(k2, (), minval=-np.pi, maxval=np.pi)
    return jnp.array([xy[0], xy[1], t])


def test_compose_inverse_identity():
    keys = jax.random.split(KEY, 8)
    for k in keys:
        a = random_pose(k)
        np.testing.assert_allclose(
            se2.compose(a, se2.inverse(a)), jnp.zeros(3), atol=1e-5
        )


def test_between_roundtrip():
    k1, k2 = jax.random.split(KEY)
    a, b = random_pose(k1), random_pose(k2)
    d = se2.between(a, b)
    np.testing.assert_allclose(se2.compose(a, d), b, atol=1e-5)


def test_transform_roundtrip():
    k1, k2 = jax.random.split(KEY, 2)
    pose = random_pose(k1)
    pt = jax.random.uniform(k2, (2,), minval=-5, maxval=5)
    np.testing.assert_allclose(
        se2.transform_from(pose, se2.transform_to(pose, pt)), pt, atol=1e-5
    )


def test_bearing_range_matches_manual():
    pose = jnp.array([1.0, 2.0, np.pi / 3])
    pt = jnp.array([4.0, -1.0])
    b, r = se2.bearing_range(pose, pt)
    d = np.array(pt) - np.array(pose[:2])
    np.testing.assert_allclose(r, np.linalg.norm(d), rtol=1e-6)
    expected_b = np.arctan2(d[1], d[0]) - float(pose[2])
    expected_b = np.arctan2(np.sin(expected_b), np.cos(expected_b))
    np.testing.assert_allclose(b, expected_b, atol=1e-6)


def test_bearing_range_jacobians_vs_autodiff():
    """Analytic local-frame Jacobians match autodiff through the retraction."""
    pose = jnp.array([0.5, -1.0, 0.7])
    pt = jnp.array([3.0, 2.0])
    hx, hl = se2.bearing_range_jacobians_local(pose, pt)

    def br_local(xi):
        # retract pose by local (body-frame) coords xi
        p = se2.compose(pose, xi)
        b, r = se2.bearing_range(p, pt)
        return jnp.array([b, r])

    hx_ad = jax.jacfwd(br_local)(jnp.zeros(3))
    np.testing.assert_allclose(hx, hx_ad, atol=1e-4)

    def br_pt(p):
        b, r = se2.bearing_range(pose, p)
        return jnp.array([b, r])

    hl_ad = jax.jacfwd(br_pt)(pt)
    np.testing.assert_allclose(hl, hl_ad, atol=1e-4)


def test_bearing_range_jacobians_global_vs_autodiff():
    pose = jnp.array([0.5, -1.0, 0.7])
    pt = jnp.array([3.0, 2.0])
    hx, _ = se2.bearing_range_jacobians_global(pose, pt)

    def br_global(p):
        b, r = se2.bearing_range(p, pt)
        return jnp.array([b, r])

    hx_ad = jax.jacfwd(br_global)(pose)
    np.testing.assert_allclose(hx, hx_ad, atol=1e-4)


def test_odometry_jacobians_vs_autodiff():
    pose = jnp.array([0.5, -1.0, 0.7])
    odom = jnp.array([1.0, 0.2, 0.3])
    f, g = se2.odometry_jacobians_global(pose, odom)

    f_ad = jax.jacfwd(lambda p: se2.compose(p, odom))(pose)
    np.testing.assert_allclose(f, f_ad, atol=1e-4)

    g_ad = jax.jacfwd(lambda n: se2.compose(se2.compose(pose, odom), n))(jnp.zeros(3))
    np.testing.assert_allclose(g, g_ad, atol=1e-4)


def test_local_cov_transform_trace_invariant():
    cov = jnp.array([[2.0, 0.3, 0.1], [0.3, 1.5, 0.0], [0.1, 0.0, 0.5]])
    local = se2.local_cov_transform(jnp.array(1.1), cov)
    np.testing.assert_allclose(jnp.trace(local), jnp.trace(cov), rtol=1e-5)


def test_halton_low_discrepancy():
    from drl_graph_exploration_tpu.geometry import halton

    pts = halton.halton(jnp.int32(1), 256, 2)
    assert pts.shape == (256, 2)
    assert (pts >= 0).all() and (pts < 1).all()
    # first few base-2 values: 1/2, 1/4, 3/4, 1/8 ...
    np.testing.assert_allclose(
        pts[:4, 0], [0.5, 0.25, 0.75, 0.125], atol=1e-6
    )
    np.testing.assert_allclose(pts[:3, 1], [1 / 3, 2 / 3, 1 / 9], atol=1e-6)
