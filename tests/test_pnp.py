"""Planar PnP tests, mirroring the reference's ``test_init_pose``
(tests/optimization_test.rs:83-154) plus randomized pose recovery."""

import jax.numpy as jnp
import numpy as np

from ccrs_tpu.solve import se3
from ccrs_tpu.solve.pnp import solve_pnp_planar, solve_pnp_planar_batch


def test_identity_pose_four_points():
    # world points on z=0 plane, camera at t=(0,0,5) looking down +z
    p3d = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], dtype=np.float64)
    z = 5.0
    obs = (p3d[:, :2] + 0) / (p3d[:, 2] + z)[:, None]
    rvec, tvec = solve_pnp_planar(jnp.asarray(p3d), jnp.asarray(obs))
    np.testing.assert_allclose(np.asarray(rvec), 0, atol=1e-8)
    np.testing.assert_allclose(np.asarray(tvec), [0, 0, z], atol=1e-8)


def _random_case(rng, n=40, noise=0.0):
    p3d = np.zeros((n, 3))
    p3d[:, :2] = rng.uniform(0, 0.5, (n, 2))
    rvec = rng.normal(size=3) * 0.3
    tvec = np.array([0.1, -0.2, 0.8]) + rng.normal(size=3) * 0.05
    R = np.asarray(se3.exp_so3(jnp.asarray(rvec)))
    pc = p3d @ R.T + tvec
    obs = pc[:, :2] / pc[:, 2:3] + rng.normal(size=(n, 2)) * noise
    return p3d, obs, rvec, tvec


def test_random_pose_recovery():
    rng = np.random.default_rng(3)
    for _ in range(10):
        p3d, obs, rvec, tvec = _random_case(rng)
        r, t = solve_pnp_planar(jnp.asarray(p3d), jnp.asarray(obs))
        np.testing.assert_allclose(np.asarray(r), rvec, atol=1e-7)
        np.testing.assert_allclose(np.asarray(t), tvec, atol=1e-7)


def test_masked_points_ignored():
    rng = np.random.default_rng(4)
    p3d, obs, rvec, tvec = _random_case(rng, n=60)
    # corrupt 20 points but mask them out
    obs2 = obs.copy()
    obs2[40:] += 5.0
    w = np.ones(60)
    w[40:] = 0.0
    r, t = solve_pnp_planar(jnp.asarray(p3d), jnp.asarray(obs2), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r), rvec, atol=1e-7)
    np.testing.assert_allclose(np.asarray(t), tvec, atol=1e-7)


def test_batched_frames():
    rng = np.random.default_rng(5)
    cases = [_random_case(rng) for _ in range(6)]
    p3d = jnp.asarray(np.stack([c[0] for c in cases]))
    obs = jnp.asarray(np.stack([c[1] for c in cases]))
    w = jnp.ones(p3d.shape[:2])
    r, t = solve_pnp_planar_batch(p3d, obs, w)
    for i, (_, _, rvec, tvec) in enumerate(cases):
        np.testing.assert_allclose(np.asarray(r[i]), rvec, atol=1e-7)
        np.testing.assert_allclose(np.asarray(t[i]), tvec, atol=1e-7)
