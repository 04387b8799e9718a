"""Pallas TPU kernel for the adaptive-threshold front-end.

The detector's first stage (tile min/max -> 3x3 tile-neighborhood dilation
-> midpoint compare -> low-contrast suppression, see
``ccrs_tpu/detect/threshold.py``) is a pure streaming image op.  The XLA
version materializes the tile min/max pyramids in HBM between fusions;
this kernel keeps the whole image (a calibration frame is ~0.25-2 MB,
comfortably inside the ~16 MB VMEM) resident and produces the binary
output in a single pass: one HBM read of the image, one HBM write of the
result, all reductions on the VPU.

The jnp implementation stays the reference; the kernel is exercised in
interpreter mode on CPU CI and compiled on TPU (equivalence-tested,
bit-identical output).

Measured on v5e (64x512x512 batch): 31.4 ms for both the XLA fusion and
this kernel — XLA already schedules this op at the HBM roofline, so the
kernel is kept as the explicit-control variant (and as the scaffold for
fusing downstream stages into the same VMEM residency later) rather than
as the default path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..detect.threshold import MIN_CONTRAST, TILE, adaptive_threshold


def _kernel(img_ref, out_ref, *, tile, min_contrast):
    # Mosaic layout rules: reshapes may only split/merge LEADING (sublane)
    # dims, and transposes don't legalize — so the row-tile reduction uses
    # a sublane reshape while everything in the lane (column) direction is
    # expressed with lane rolls + lane-index masks on full-width arrays
    # (tile stats stay block-constant at full resolution).
    assert tile == 4, "kernel is specialized for the 4px tile of AprilTag"
    H, W = img_ref.shape  # one image per grid step ((B*H, W) layout)
    th = H // tile
    x = img_ref[:, :]

    r = x.reshape(th, tile, W)
    rmin = jnp.min(r, axis=1)  # (th, W)
    rmax = jnp.max(r, axis=1)

    # all integer constants pinned to int32: under jax x64, Python ints
    # weak-promote these comparisons to int64 vectors, which Mosaic cannot
    # lower (its convert helper recurses forever).
    i32 = jnp.int32
    lane = jax.lax.broadcasted_iota(jnp.int32, (th, W), 1)
    phase = lane % i32(tile)

    def block_reduce_lanes(v, op):
        # op over lanes [4k .. 4k+3], broadcast back to all 4 lanes
        m = op(v, jnp.roll(v, -1, axis=1))
        m = op(m, jnp.roll(m, -2, axis=1))  # valid at lanes 4k
        t = jnp.where(phase >= i32(2), jnp.roll(m, 2, axis=1), m)  # 4k+2
        t = jnp.where(phase % i32(2) == i32(1), jnp.roll(t, 1, axis=1), t)
        return t

    cmin = block_reduce_lanes(rmin, jnp.minimum)  # (th, W) block-constant
    cmax = block_reduce_lanes(rmax, jnp.maximum)

    def dil(v, op):
        # columns: one tile = 4 lanes; edge-clamp via self-inclusion
        left = jnp.where(lane >= i32(tile), jnp.roll(v, tile, axis=1), v)
        right = jnp.where(lane < i32(W - tile), jnp.roll(v, -tile, axis=1), v)
        h = op(op(left, v), right)
        # rows: sublane shifts with edge replication
        up_ = jnp.concatenate([h[:1], h[:-1]], axis=0)
        down = jnp.concatenate([h[1:], h[-1:]], axis=0)
        return op(op(up_, h), down)

    nmin = dil(cmin, jnp.minimum)
    nmax = dil(cmax, jnp.maximum)
    # fold the low-contrast suppression into the threshold itself:
    # suppressed tiles get threshold -inf => every pixel classifies white.
    thresh = jnp.where(
        (nmax - nmin) >= min_contrast, (nmin + nmax) * 0.5, -jnp.inf
    )
    thr_px = jnp.repeat(thresh, tile, axis=0)  # (H, W)
    binary = x > thr_px
    # NOTE: this Mosaic version cannot lower narrow-int stores/casts
    # (bool/uint8 conversions recurse in the generic helper); emit int32
    # from the kernel and let XLA cast outside.
    out_ref[:, :] = binary.astype(jnp.int32)


@partial(jax.jit, static_argnames=("tile", "min_contrast", "interpret"))
def adaptive_threshold_pallas(
    images,
    tile: int = TILE,
    min_contrast: float = MIN_CONTRAST,
    interpret: bool = False,
):
    """Pallas adaptive threshold (no separation pass).

    images: (B, H, W) uint8/f32, H and W multiples of ``tile``.
    Returns (B, H, W) uint8 {0,1}; matches
    ``adaptive_threshold(separate=False)`` exactly (same dilation clamping).
    """
    B, H, W = images.shape
    assert H % tile == 0 and W % tile == 0, (H, W)
    x = images.astype(jnp.float32)
    kern = partial(_kernel, tile=tile, min_contrast=min_contrast)

    # one image per grid step over a (B*H, W) layout: both vmap-of-pallas
    # and 3D (1,H,W) blocks fail to legalize in this Mosaic version, but
    # plain 2D blocks walked down the row axis work fine.  The index map
    # must return an int32 literal — a Python 0 becomes i64 under jax x64
    # and poisons the grid plumbing ("func.return (i32, i64)").
    imap = lambda b: (b, jnp.int32(0))
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B * H, W), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((H, W), imap, memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((H, W), imap, memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x.reshape(B * H, W))
    return out.reshape(B, H, W).astype(jnp.uint8)


def adaptive_threshold_best(images, tile=TILE, min_contrast=MIN_CONTRAST):
    """Dispatch: pallas kernel on TPU, jnp reference elsewhere (the
    white-dilation separation pass is applied by the caller)."""
    if jax.default_backend() == "tpu":
        return adaptive_threshold_pallas(images, tile, min_contrast)
    return adaptive_threshold(images, tile, min_contrast, separate=False)
