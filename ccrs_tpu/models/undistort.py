"""Undistortion: new-camera-matrix estimation, remap tables, remapping.

Covers the reference crate surface used by both examples
(``estimate_new_camera_matrix_for_undistort`` + ``init_undistort_map`` +
``remap``, call sites /root/reference/examples/convert_model.rs:27-30 and
examples/test_pnp.rs).  The map construction is one jitted computation:
every output pixel unprojects through the ideal pinhole, reprojects
through the distorted model, giving the (xmap, ymap) gather tables;
``remap`` is a batched bilinear gather.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .base import GenericModel
from .projections import project_fn, unproject_fn


def estimate_new_camera_matrix_for_undistort(
    model: GenericModel, balance: float = 1.0, new_size=None
):
    """Pinhole K for the undistorted view.

    balance = 0 keeps the tight (min) focal, 1 the wide (max) focal, like
    OpenCV's fisheye estimateNewCameraMatrixForUndistortRectify.
    Returns a 3x3 K (numpy).
    """
    w, h = model.width, model.height
    new_w, new_h = new_size if new_size is not None else (int(w), int(h))
    # OpenCV-fisheye style: undistort the 4 edge midpoints, interpolate the
    # focal between the all-visible (fmin) and no-loss (fmax) extremes.
    pts = jnp.asarray(
        [
            [(w - 1) / 2.0, 0.0],
            [w - 1.0, (h - 1) / 2.0],
            [(w - 1) / 2.0, h - 1.0],
            [0.0, (h - 1) / 2.0],
        ],
        dtype=jnp.float64,
    )
    rays, valid = unproject_fn(model.name)(jnp.asarray(model.params), pts)
    rays = np.asarray(rays)
    valid = np.asarray(valid) & (rays[:, 2] > 1e-6)
    if not valid.all():
        raise ValueError("edge midpoints do not unproject; cannot estimate K")
    m = rays[:, :2] / rays[:, 2:3]
    cn = m.mean(axis=0)
    aspect = 1.0
    minx, maxx = m[:, 0].min(), m[:, 0].max()
    miny, maxy = m[:, 1].min(), m[:, 1].max()
    f1 = new_w * 0.5 / max(cn[0] - minx, 1e-9)
    f2 = new_w * 0.5 / max(maxx - cn[0], 1e-9)
    f3 = new_h * 0.5 * aspect / max(cn[1] - miny, 1e-9)
    f4 = new_h * 0.5 * aspect / max(maxy - cn[1], 1e-9)
    fmin = min(f1, f2, f3, f4)
    fmax = max(f1, f2, f3, f4)
    balance = float(np.clip(balance, 0.0, 1.0))
    f = balance * fmin + (1.0 - balance) * fmax
    cx = -cn[0] * f + new_w * 0.5
    cy = -cn[1] * f + new_h * 0.5
    return np.array([[f, 0.0, cx], [0.0, f, cy], [0.0, 0.0, 1.0]])


@partial(jax.jit, static_argnames=("proj_name", "new_w", "new_h"))
def _maps(proj_name, params, K, new_w: int, new_h: int):
    uu, vv = jnp.meshgrid(
        jnp.arange(new_w, dtype=params.dtype), jnp.arange(new_h, dtype=params.dtype)
    )
    x = (uu - K[0, 2]) / K[0, 0]
    y = (vv - K[1, 2]) / K[1, 1]
    rays = jnp.stack([x, y, jnp.ones_like(x)], axis=-1).reshape(-1, 3)
    p2d, valid = project_fn(proj_name)(params, rays)
    p2d = jnp.where(valid[:, None], p2d, -1.0)  # invalid -> out of range
    return p2d[:, 0].reshape(new_h, new_w), p2d[:, 1].reshape(new_h, new_w)


def init_undistort_map(model: GenericModel, K, new_size):
    """(xmap, ymap) float32 arrays of shape (new_h, new_w)."""
    new_w, new_h = new_size
    xmap, ymap = _maps(
        model.name, jnp.asarray(model.params), jnp.asarray(K, dtype=jnp.float64),
        int(new_w), int(new_h),
    )
    return np.asarray(xmap, dtype=np.float32), np.asarray(ymap, dtype=np.float32)


@jax.jit
def _remap(img, xmap, ymap):
    H, W = img.shape
    x = jnp.clip(xmap, 0.0, W - 1.001)
    y = jnp.clip(ymap, 0.0, H - 1.001)
    oob = (xmap < 0) | (xmap > W - 1) | (ymap < 0) | (ymap > H - 1)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    v = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )
    return jnp.where(oob, 0.0, v)


def remap(img, xmap, ymap):
    """Bilinear remap of a grayscale or color image (uint8 in/out)."""
    img = np.asarray(img)
    if img.ndim == 2:
        out = np.asarray(_remap(jnp.asarray(img, dtype=jnp.float32), jnp.asarray(xmap), jnp.asarray(ymap)))
        return np.clip(out, 0, 255).astype(img.dtype if img.dtype != np.bool_ else np.uint8)
    chans = [
        np.asarray(_remap(jnp.asarray(img[..., c], dtype=jnp.float32), jnp.asarray(xmap), jnp.asarray(ymap)))
        for c in range(img.shape[2])
    ]
    return np.clip(np.stack(chans, axis=-1), 0, 255).astype(img.dtype)
