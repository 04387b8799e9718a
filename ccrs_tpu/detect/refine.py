"""Batched subpixel corner refinement.

The final detector stage (the reference's subpixel corner refine,
SURVEY.md §2.2 "aprilgrid"): every detected tag corner in the frame batch
refines simultaneously with a fixed-iteration cornerSubPix-style scheme —
at the saddle/corner point q, for every window pixel p:
``gradI(p) . (p - q) = 0`` weighted least squares, i.e.
``(sum w G) q = sum w G p`` with ``G = gradI gradI^T``.  One 2x2 closed-form
solve per corner per iteration; gathers are bilinear samples off the
precomputed gradient images.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

WIN = 4  # half-window (9x9)
ITERS = 6


def _grad(images):
    """Central-difference gradients, (B,H,W) -> (gx, gy)."""
    gx = jnp.zeros_like(images)
    gy = jnp.zeros_like(images)
    gx = gx.at[:, :, 1:-1].set((images[:, :, 2:] - images[:, :, :-2]) * 0.5)
    gy = gy.at[:, 1:-1, :].set((images[:, 2:, :] - images[:, :-2, :]) * 0.5)
    return gx, gy


def _bilinear(img, x, y):
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx, fy = x - x0, y - y0
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )


def refine_patches(patches, local, win: int = WIN, iters: int = ITERS):
    """Patch-based subpixel refinement, fully on device.

    Same cornerSubPix math as ``refine_corners`` but each corner works on
    its own PxP patch (gathered once by ``patches.extract_patches``): the
    per-iteration bilinear samples become dense (N, 81) take_along_axis
    reads of tiny per-corner buffers instead of scattered full-image
    gathers — the TPU-friendly formulation.  Traceable (no jit here) so it
    fuses into the caller's graph (see decode.refine_decode_fused).

    Args:
      patches: (N, P, P) float32.
      local: (N, 2) float32 patch-local (x, y) estimates.

    Returns (N, 2) refined patch-local positions.
    """
    N, P, _ = patches.shape
    gx = jnp.zeros_like(patches)
    gy = jnp.zeros_like(patches)
    gx = gx.at[:, :, 1:-1].set((patches[:, :, 2:] - patches[:, :, :-2]) * 0.5)
    gy = gy.at[:, 1:-1, :].set((patches[:, 2:, :] - patches[:, :-2, :]) * 0.5)
    gxf = gx.reshape(N, P * P)
    gyf = gy.reshape(N, P * P)

    offs = jnp.arange(-win, win + 1, dtype=patches.dtype)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    ox = ox.reshape(-1)[None, :]
    oy = oy.reshape(-1)[None, :]
    wgt = jnp.exp(-(ox * ox + oy * oy) / (2.0 * (win / 2.0) ** 2))

    def bsample(flat, x, y):
        x = jnp.clip(x, 0.0, P - 1.001)
        y = jnp.clip(y, 0.0, P - 1.001)
        x0 = jnp.floor(x).astype(jnp.int32)
        y0 = jnp.floor(y).astype(jnp.int32)
        fx = (x - x0).astype(flat.dtype)
        fy = (y - y0).astype(flat.dtype)
        idx = y0 * P + x0
        v00 = jnp.take_along_axis(flat, idx, axis=1)
        v01 = jnp.take_along_axis(flat, idx + 1, axis=1)
        v10 = jnp.take_along_axis(flat, idx + P, axis=1)
        v11 = jnp.take_along_axis(flat, idx + P + 1, axis=1)
        return (
            v00 * (1 - fx) * (1 - fy)
            + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy
            + v11 * fx * fy
        )

    def step(c, _):
        x = c[:, 0:1] + ox
        y = c[:, 1:2] + oy
        gxs = bsample(gxf, x, y)
        gys = bsample(gyf, x, y)
        a = jnp.sum(wgt * gxs * gxs, axis=1)
        b = jnp.sum(wgt * gxs * gys, axis=1)
        d = jnp.sum(wgt * gys * gys, axis=1)
        bx = jnp.sum(wgt * (gxs * gxs * x + gxs * gys * y), axis=1)
        by = jnp.sum(wgt * (gxs * gys * x + gys * gys * y), axis=1)
        det = a * d - b * b
        det = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
        qx = (d * bx - b * by) / det
        qy = (a * by - b * bx) / det
        dx = jnp.clip(qx - c[:, 0], -1.0, 1.0)
        dy = jnp.clip(qy - c[:, 1], -1.0, 1.0)
        return jnp.stack([c[:, 0] + dx, c[:, 1] + dy], axis=1), None

    refined, _ = jax.lax.scan(step, local, None, length=iters)
    total = refined - local
    norm = jnp.linalg.norm(total, axis=1, keepdims=True)
    scale = jnp.minimum(1.0, win / jnp.maximum(norm, 1e-9))
    return local + total * scale


@partial(jax.jit, static_argnames=("win", "iters"))
def refine_corners(images, corners, win: int = WIN, iters: int = ITERS):
    """Refine corners to subpixel accuracy.

    Args:
      images: (B, H, W) float32 grayscale.
      corners: (B, M, 2) float32 initial (x, y) estimates.

    Returns (B, M, 2) refined positions (per-iteration shift clamped to
    1 px; total shift clamped to the window radius so divergent corners
    stay near their initial estimate).
    """
    gx, gy = _grad(images)
    offs = jnp.arange(-win, win + 1, dtype=images.dtype)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    ox = ox.reshape(-1)
    oy = oy.reshape(-1)
    # Gaussian window like cornerSubPix
    wgt = jnp.exp(-(ox * ox + oy * oy) / (2.0 * (win / 2.0) ** 2))

    def per_image(gx_i, gy_i, corners_i):
        def step(c, _):
            x = c[:, 0:1] + ox[None, :]
            y = c[:, 1:2] + oy[None, :]
            gxs = jax.vmap(lambda xv, yv: _bilinear(gx_i, xv, yv))(x, y)
            gys = jax.vmap(lambda xv, yv: _bilinear(gy_i, xv, yv))(x, y)
            w = wgt[None, :]
            a = jnp.sum(w * gxs * gxs, axis=1)
            b = jnp.sum(w * gxs * gys, axis=1)
            d = jnp.sum(w * gys * gys, axis=1)
            bx = jnp.sum(w * (gxs * gxs * x + gxs * gys * y), axis=1)
            by = jnp.sum(w * (gxs * gys * x + gys * gys * y), axis=1)
            det = a * d - b * b
            det = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
            qx = (d * bx - b * by) / det
            qy = (a * by - b * bx) / det
            dx = jnp.clip(qx - c[:, 0], -1.0, 1.0)
            dy = jnp.clip(qy - c[:, 1], -1.0, 1.0)
            return jnp.stack([c[:, 0] + dx, c[:, 1] + dy], axis=1), None

        refined, _ = jax.lax.scan(step, corners_i, None, length=iters)
        total = refined - corners_i
        norm = jnp.linalg.norm(total, axis=1, keepdims=True)
        scale = jnp.minimum(1.0, win / jnp.maximum(norm, 1e-9))
        return corners_i + total * scale

    return jax.vmap(per_image)(gx, gy, corners)
