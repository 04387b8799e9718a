"""Equivalence tests for the MXU-matmul sampling kernels (detect/sample.py).

The detector's hot kernels run as hat-weight / banded matmuls on TPU and
as 4-tap gathers / tap-loop convolutions on CPU.  These tests force BOTH
formulations (``use_matmul`` override) on the CPU backend and pin that
they compute the same quantity — so the suite's gather path certifies
the TPU matmul path's math (only bf16 rounding differs on hardware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ccrs_tpu.detect.sample import (
    build_klt_maps,
    refine_corners_mm,
    sample_bilinear_mm,
    unsharp_mm,
)


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.default_rng(7)
    return jnp.asarray(
        rng.integers(0, 256, size=(3, 96, 128)).astype(np.float32)
    )


def test_bilinear_matmul_matches_gather(imgs):
    rng = np.random.default_rng(1)
    B, H, W = imgs.shape
    sx = jnp.asarray(rng.uniform(-2, W + 2, size=(B, 257)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(-2, H + 2, size=(B, 257)).astype(np.float32))
    a = sample_bilinear_mm(imgs, sx, sy, use_matmul=True)
    b = sample_bilinear_mm(imgs, sx, sy, use_matmul=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


def test_bilinear_chunking_consistent(imgs):
    # tiny max_rows_mb forces multiple K chunks through the matmul path
    rng = np.random.default_rng(2)
    B, H, W = imgs.shape
    sx = jnp.asarray(rng.uniform(0, W - 1, size=(B, 600)).astype(np.float32))
    sy = jnp.asarray(rng.uniform(0, H - 1, size=(B, 600)).astype(np.float32))
    a = sample_bilinear_mm(imgs, sx, sy, max_rows_mb=1, use_matmul=True)
    b = sample_bilinear_mm(imgs, sx, sy, use_matmul=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


def test_unsharp_matmul_matches_taps(imgs):
    a = unsharp_mm(imgs, use_matmul=True)
    b = unsharp_mm(imgs, use_matmul=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-2)


def test_klt_maps_matmul_matches_taps(imgs):
    a = build_klt_maps(imgs, use_matmul=True)
    b = build_klt_maps(imgs, use_matmul=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                               atol=2e-2)


def test_refine_paths_agree(imgs):
    maps = build_klt_maps(imgs)
    rng = np.random.default_rng(3)
    B, _, H, W = maps.shape
    c0 = np.stack(
        [rng.uniform(8, W - 8, size=(B, 40)),
         rng.uniform(8, H - 8, size=(B, 40))],
        axis=-1,
    ).astype(np.float32)
    a = refine_corners_mm(maps, jnp.asarray(c0), use_matmul=True)
    b = refine_corners_mm(maps, jnp.asarray(c0), use_matmul=False)
    # identical Newton iteration; only the map-sampling formulation
    # differs (exact same 4-tap values in f32), so paths track closely
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_refine_finds_synthetic_saddle():
    # checkerboard saddle at a known subpixel position: refine from a
    # ~1.5 px-off start must land within 0.05 px (both formulations)
    H = W = 64
    cx_true, cy_true = 31.3, 32.6
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    img = 127.5 + 127.5 * np.tanh(0.9 * (xx - cx_true)) * np.tanh(
        0.9 * (yy - cy_true)
    )
    imgs = jnp.asarray(img[None])
    maps = build_klt_maps(imgs)
    start = jnp.asarray([[[cx_true + 1.2, cy_true - 1.4]]], jnp.float32)
    for mm in (False, True):
        out = np.asarray(refine_corners_mm(maps, start, use_matmul=mm))[0, 0]
        assert abs(out[0] - cx_true) < 0.05, (mm, out)
        assert abs(out[1] - cy_true) < 0.05, (mm, out)
