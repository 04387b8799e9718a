"""SE(3) / SO(3) primitives as pure JAX functions.

Device-side counterpart of the reference's nalgebra Isometry3 usage
(``src/types.rs:13-36``, ``src/optimization/factors.rs:110-118,260-270``):
axis-angle exp/log, pose composition/inverse, point transforms.  Everything
is dtype-polymorphic, batched over leading axes, and gradient-safe at the
theta -> 0 singularity (Taylor switch with the double-where trick so
``jax.jacfwd`` through poses never produces NaNs).
"""

from __future__ import annotations

import jax.numpy as jnp

_SMALL = 1e-9


def _sinc_terms(theta2):
    """Return (sin(t)/t, (1-cos(t))/t^2, (t-sin(t))/t^3) gradient-safely.

    theta2 is theta^2 (avoids sqrt at 0).  Uses Taylor series below the
    switch point; exact forms above.
    """
    small = theta2 < _SMALL
    # safe theta2 for the exact branch
    t2 = jnp.where(small, jnp.ones_like(theta2), theta2)
    t = jnp.sqrt(t2)
    sin_t, cos_t = jnp.sin(t), jnp.cos(t)
    a_exact = sin_t / t
    b_exact = (1.0 - cos_t) / t2
    c_exact = (t - sin_t) / (t2 * t)
    a_taylor = 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0
    b_taylor = 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0
    c_taylor = 1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0
    a = jnp.where(small, a_taylor, a_exact)
    b = jnp.where(small, b_taylor, b_exact)
    c = jnp.where(small, c_taylor, c_exact)
    return a, b, c


def hat(v):
    """(...,3) -> (...,3,3) skew-symmetric."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    o = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([o, -z, y], -1),
            jnp.stack([z, o, -x], -1),
            jnp.stack([-y, x, o], -1),
        ],
        -2,
    )


def exp_so3(rvec):
    """Axis-angle (...,3) -> rotation matrix (...,3,3) via Rodrigues."""
    theta2 = jnp.sum(rvec * rvec, axis=-1)
    a, b, _ = _sinc_terms(theta2)
    K = hat(rvec)
    KK = K @ K
    eye = jnp.broadcast_to(jnp.eye(3, dtype=rvec.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def log_so3(R):
    """Rotation matrix (...,3,3) -> axis-angle (...,3).

    Smooth away from theta = pi; near pi uses the symmetric-part branch.
    Matches nalgebra ``scaled_axis`` semantics (used in SE3Factor residuals,
    factors.rs:262).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    # arccos has infinite slope at +-1; a residual that is EXACTLY identity
    # (common: pose-graph init from its own first measurement) would poison
    # jacfwd with NaNs and stall the whole LM solve.  Clipping the arccos
    # domain keeps gradients finite (~1e7 at the boundary) while the branch
    # selection below keeps values exact.
    safe_cos = jnp.clip(cos_t, -1.0 + 1e-14, 1.0 - 1e-14)
    theta = jnp.arccos(safe_cos)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    sin_t = jnp.sin(theta)
    small = theta < 1e-6
    near_pi = jnp.pi - theta < 1e-6
    # generic branch: theta / (2 sin theta) * w
    safe_sin = jnp.where(small | near_pi, jnp.ones_like(sin_t), sin_t)
    generic = w * (theta / (2.0 * safe_sin))[..., None]
    # small: w/2 * (1 + theta^2/6), with theta^2 ~ 2(1-cos) (smooth in R)
    th2 = 2.0 * jnp.maximum(1.0 - cos_t, 0.0)
    small_branch = 0.5 * w * (1.0 + th2 / 6.0)[..., None]
    # near pi: axis from diagonal of (R + I)/2
    A = (R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)) / 2.0
    diag = jnp.stack([A[..., 0, 0], A[..., 1, 1], A[..., 2, 2]], -1)
    axis_abs = jnp.sqrt(jnp.maximum(diag, 0.0))
    # signs: pick the largest axis component positive, infer others from
    # off-diagonals A_ij = a_i a_j
    off = jnp.stack([A[..., 0, 1], A[..., 0, 2], A[..., 1, 2]], -1)  # xy xz yz
    imax = jnp.argmax(axis_abs, axis=-1)
    sx = jnp.where(
        imax == 0,
        jnp.ones_like(axis_abs[..., 0]),
        jnp.where(imax == 1, jnp.sign(off[..., 0]), jnp.sign(off[..., 1])),
    )
    sy = jnp.where(
        imax == 0,
        jnp.sign(off[..., 0]),
        jnp.where(imax == 1, jnp.ones_like(sx), jnp.sign(off[..., 2])),
    )
    sz = jnp.where(
        imax == 0,
        jnp.sign(off[..., 1]),
        jnp.where(imax == 1, jnp.sign(off[..., 2]), jnp.ones_like(sx)),
    )
    sx = jnp.where(sx == 0, 1.0, sx)
    sy = jnp.where(sy == 0, 1.0, sy)
    sz = jnp.where(sz == 0, 1.0, sz)
    axis = axis_abs * jnp.stack([sx, sy, sz], -1)
    norm = jnp.linalg.norm(axis, axis=-1, keepdims=True)
    axis = axis / jnp.where(norm > 0, norm, 1.0)
    pi_branch = axis * theta[..., None]
    return jnp.where(
        small[..., None], small_branch, jnp.where(near_pi[..., None], pi_branch, generic)
    )


def transform(rvec, tvec, pts):
    """Apply T=(R,t): (...,3),(...,3),(...,N,3) -> (...,N,3)."""
    R = exp_so3(rvec)
    return pts @ jnp.swapaxes(R, -1, -2) + tvec[..., None, :]


def compose(rvec_a, tvec_a, rvec_b, tvec_b):
    """T_a * T_b as (rvec,tvec)."""
    Ra = exp_so3(rvec_a)
    Rb = exp_so3(rvec_b)
    R = Ra @ Rb
    t = (Ra @ tvec_b[..., None])[..., 0] + tvec_a
    return log_so3(R), t


def inverse(rvec, tvec):
    R = exp_so3(rvec)
    Rt = jnp.swapaxes(R, -1, -2)
    return log_so3(Rt), -(Rt @ tvec[..., None])[..., 0]
