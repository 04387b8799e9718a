"""Pose-from-correspondences (PnP) for planar calibration boards, pure JAX.

Replaces the reference's ``sqpnp_simple::sqpnp_solve_glam`` (call sites
``src/optimization/linear.rs:20``, ``src/util.rs:436``).  Every call site in
the calibration pipeline passes AprilGrid board points, which are coplanar
(z=0), so the TPU-native design uses the right tool for planar targets:

1. DLT homography board(x,y) -> normalized image plane (least squares,
   one ``lstsq`` per frame, batched with vmap);
2. homography decomposition R = [h1' h2' h1'xh2'], t = h3/s with SVD
   orthogonalization (Zhang-style);
3. a fixed-iteration Gauss-Newton polish on the reprojection residual in
   the normalized plane (6x6 normal equations, Cholesky — TPU f64 supports
   Cholesky, not LU).

Supports per-point weights so padded/invalid points are masked, and is
``vmap``-able over frames (used by calib_camera's per-frame pose init,
``src/util.rs:418-439``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import se3


def _weighted_normalize(p, w):
    """Shift+scale points for DLT conditioning. p:(N,2/3[:2]), w:(N,)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    mean = jnp.sum(p * w[:, None], axis=0) / wsum
    d = jnp.linalg.norm(p - mean, axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum(jnp.sum(d * w) / wsum, 1e-12)
    return mean, scale


def homography_dlt(p_src, p_dst, w):
    """Weighted DLT homography src->dst. p_src/p_dst: (N,2); w: (N,).

    Returns 3x3 H (h22 ~ 1 after denormalization).
    """
    ms, ss = _weighted_normalize(p_src, w)
    md, sd = _weighted_normalize(p_dst, w)
    s = (p_src - ms) * ss
    d = (p_dst - md) * sd
    x, y = s[:, 0], s[:, 1]
    u, v = d[:, 0], d[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1 * w[:, None], r2 * w[:, None]], axis=0)  # (2N,9)
    # null vector via eigenvector of smallest eigenvalue of A^T A (9x9)
    AtA = A.T @ A
    _, V = jnp.linalg.eigh(AtA)
    h = V[:, 0]
    Hn = h.reshape(3, 3)
    # denormalize: H = Td^-1 Hn Ts
    Ts = jnp.array(
        [[ss, 0.0, -ss * ms[0]], [0.0, ss, -ss * ms[1]], [0.0, 0.0, 1.0]],
        dtype=p_src.dtype,
    )
    Td_inv = jnp.array(
        [[1.0 / sd, 0.0, md[0]], [0.0, 1.0 / sd, md[1]], [0.0, 0.0, 1.0]],
        dtype=p_src.dtype,
    )
    H = Td_inv @ Hn @ Ts
    return H / jnp.where(jnp.abs(H[2, 2]) > 1e-12, H[2, 2], 1.0)


def _pose_from_homography(H):
    """Zhang decomposition of a normalized-plane homography (K = I)."""
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    s = jnp.sqrt(jnp.linalg.norm(h1) * jnp.linalg.norm(h2))
    s = jnp.where(s > 1e-12, s, 1.0)
    # sign: board must be in front of the camera (t_z > 0)
    sign = jnp.where(h3[2] >= 0, 1.0, -1.0)
    r1 = sign * h1 / s
    r2 = sign * h2 / s
    r3 = jnp.cross(r1, r2)
    Q = jnp.stack([r1, r2, r3], axis=-1)
    # project onto SO(3)
    U, _, Vt = jnp.linalg.svd(Q)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], dtype=H.dtype))
    det = jnp.linalg.det(U @ Vt)
    D = D.at[2, 2].set(det)
    R = U @ D @ Vt
    t = sign * h3 / s
    return R, t


def _gn_polish(rvec, tvec, p3d, p2d, w, iters=8):
    """Gauss-Newton on e_i = (x/z, y/z) - m_i with analytic Jacobian.

    Parameterization: left-multiplied increment T <- exp(dw) * T  for
    rotation, additive for translation.
    """

    def step(carry, _):
        rvec, tvec = carry
        R = se3.exp_so3(rvec)
        pc = p3d @ R.T + tvec  # (N,3)
        x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
        zsafe = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
        e = jnp.stack([x / zsafe, y / zsafe], -1) - p2d  # (N,2)
        iz = 1.0 / zsafe
        iz2 = iz * iz
        # d(proj)/d(pc): (N,2,3)
        zero = jnp.zeros_like(x)
        Jp = jnp.stack(
            [
                jnp.stack([iz, zero, -x * iz2], -1),
                jnp.stack([zero, iz, -y * iz2], -1),
            ],
            -2,
        )
        # d(pc)/d(dw) = -[pc]_x ; d(pc)/d(dt) = I
        Jw = -Jp @ se3.hat(pc)  # (N,2,3)
        Jt = Jp
        J = jnp.concatenate([Jw, Jt], axis=-1)  # (N,2,6)
        wv = w[:, None]
        JtJ = jnp.einsum("nri,nrj->ij", J * wv[..., None], J)
        Jte = jnp.einsum("nri,nr->i", J * wv[..., None], e)
        JtJ = JtJ + 1e-12 * jnp.eye(6, dtype=J.dtype)
        L = jnp.linalg.cholesky(JtJ)
        dx = jax.scipy.linalg.cho_solve((L, True), -Jte)
        dw, dt = dx[:3], dx[3:]
        new_rvec = se3.log_so3(se3.exp_so3(dw) @ R)
        new_tvec = (se3.exp_so3(dw) @ tvec[:, None])[:, 0] + dt
        return (new_rvec, new_tvec), None

    (rvec, tvec), _ = jax.lax.scan(step, (rvec, tvec), None, length=iters)
    return rvec, tvec


def solve_pnp_planar(p3d, p2d_norm, w=None):
    """Pose of a planar target from normalized-plane observations.

    Args:
      p3d: (N,3) board points, z == 0 (the AprilGrid plane).
      p2d_norm: (N,2) observations on the normalized image plane (x/z,y/z).
      w: optional (N,) weights; 0 masks a point (padding / invalid).

    Returns:
      (rvec (3,), tvec (3,)) mapping board -> camera.  vmap over leading
      axes for a whole frame batch.
    """
    if w is None:
        w = jnp.ones(p3d.shape[0], dtype=p3d.dtype)
    H = homography_dlt(p3d[:, :2], p2d_norm, w)
    R, t = _pose_from_homography(H)
    rvec = se3.log_so3(R)
    return _gn_polish(rvec, t, p3d, p2d_norm, w)


solve_pnp_planar_batch = jax.jit(jax.vmap(solve_pnp_planar, in_axes=(0, 0, 0)))
