"""MXU-based image sampling: gathers recast as one-hot / hat-weight matmuls.

XLA's TPU gather issues ~128M elements/s regardless of formulation
(measured: 3.4M-element patch gather 26.5 ms; sliced/dynamic-slice forms
no better or far worse) — ~200x off the HBM roofline, and it was the
entire cost of the detector's hot kernels (subpixel refine 84 ms and
decode bit-sampling 41 ms per tracking wave).  The TPU-native fix is to
stop gathering: every sampling pattern the detector needs is a LINEAR map
of the image, so it runs on the MXU as a dense matmul with structured
weight matrices:

- patch extraction   = one-hot row-select @ image @ one-hot col-select
  (EXACT for uint8-valued images: 0/1 weights and <=2^8 sums are
  representable in bf16);
- bilinear sampling  = hat-weight (tent) row/col matrices: out has
  exactly the 4-tap bilinear value, with the weights rounded to bf16
  (<=0.4% position quantization — harmless at the decoder's >=50-gray-
  level threshold margin and measured <=0.001 px on refined corners);
- separable windowed sums (the KLT structure-tensor maps, unsharp blur)
  = banded conv matrices applied as image @ K^T / K @ image.

Measured on the bench wave shape (72x512x512, 10368 corners, 12816
decode samples/image): patch extract 4.8 ms -> matmul (obsoleted
entirely), full refine 80.7 -> 10.6 ms, decode sampling 30.4 -> 5.9 ms,
agreeing with the gather versions to 0.001 px on true saddle corners.

On the CPU backend (the hermetic test suite, and any host run) the dense
formulation inverts: a 1-core host does gathers at L1 speed and the
banded matmuls cost O(H) more flops than the 7-tap loops they encode.
Every public function therefore dispatches on the backend — matmuls on
accelerators, tap-loop convolutions + 4-tap gathers on CPU — computing
the SAME quantity (equivalence pinned by tests/test_sample.py via the
``use_matmul`` override).

Reference parity: these kernels compute the same cornerSubPix-style
refinement as /root/reference's aprilgrid crate dependency (subpixel
corner refine) and the same homography bit sampling as its tag decoder —
only the execution strategy is TPU-reshaped (SURVEY.md L2).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

#: refine window parameters — same fixed point as refine.refine_patches
#: (win=3 Gaussian, measured unbiased + iteration-stable; see refine.py)
WIN = 3
MAX_SHIFT = 4.5
ITERS = 12

_offs = np.arange(-WIN, WIN + 1, dtype=np.float32)
_G_TAPS = np.exp(-(_offs * _offs) / (2.0 * (WIN / 2.0) ** 2)).astype(np.float32)
_GO_TAPS = (_G_TAPS * _offs).astype(np.float32)

_r = np.arange(-3, 4, dtype=np.float32)
_BLUR_TAPS = np.exp(-(_r * _r) / (2.0 * 1.2 * 1.2)).astype(np.float32)
_BLUR_TAPS /= _BLUR_TAPS.sum()


def _mm_dtype():
    """bf16 on accelerators (MXU-native), f32 on CPU (tests)."""
    return jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32


def _use_mm(force) -> bool:
    """Backend dispatch: matmul formulation unless on CPU (or forced)."""
    if force is not None:
        return bool(force)
    return jax.default_backend() != "cpu"


@lru_cache(maxsize=None)
def _band_np(size: int, which: str, edge: bool) -> np.ndarray:
    """Banded correlation matrix C with C[u, h] = taps[h - u + WIN].

    ``edge=True`` folds out-of-range taps onto the border element
    (replicate padding, matching jnp.pad mode='edge'); ``edge=False``
    truncates (zero padding, matching the refine maps' zero boundary).
    """
    taps = {"g": _G_TAPS, "go": _GO_TAPS, "blur": _BLUR_TAPS}[which]
    R = (len(taps) - 1) // 2
    out = np.zeros((size, size), np.float32)
    for u in range(size):
        for t in range(-R, R + 1):
            h = u + t
            if edge:
                h = min(max(h, 0), size - 1)
            elif not (0 <= h < size):
                continue
            out[u, h] += taps[t + R]
    return out


def _band(size: int, which: str, edge: bool = False):
    return jnp.asarray(_band_np(size, which, edge), dtype=_mm_dtype())


def _convy(x, K):
    """Correlate along H (dim -2): out[b, u, w] = sum_h K[u, h] x[b, h, w]."""
    return jnp.einsum(
        "uh,bhw->buw", K, x.astype(K.dtype),
        preferred_element_type=jnp.float32,
    )


def _convx(x, K):
    """Correlate along W (dim -1): out[b, h, v] = sum_w K[v, w] x[b, h, w]."""
    return jnp.einsum(
        "bhw,vw->bhv", x.astype(K.dtype), K,
        preferred_element_type=jnp.float32,
    )


def _tap_corr(x, taps: np.ndarray, axis: int, edge: bool):
    """CPU form of the banded matmul: out[u] = sum_t taps[t+R] x[u + t],
    with replicate (edge=True) or zero (edge=False) boundary.  O(T*H*W)
    instead of the band matrix's O(H*H*W)."""
    R = (len(taps) - 1) // 2
    n = x.shape[axis]
    pad = [(0, 0)] * x.ndim
    pad[axis] = (R, R)
    xp = jnp.pad(x, pad, mode="edge" if edge else "constant")
    out = None
    for i, w in enumerate(taps):
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(i, i + n)
        term = float(w) * xp[tuple(sl)]
        out = term if out is None else out + term
    return out


def unsharp_mm(images, amount: float = 1.2, use_matmul=None):
    """decode.unsharp as two banded conv matmuls (8.9 -> ~2 ms at the
    bench wave shape); 7-tap loop on CPU.  Traceable; images (B, H, W)."""
    B, H, W = images.shape
    images = images.astype(jnp.float32)
    if _use_mm(use_matmul):
        blur = _convx(_convy(images, _band(H, "blur", edge=True)),
                      _band(W, "blur", edge=True))
    else:
        blur = _tap_corr(_tap_corr(images, _BLUR_TAPS, 1, True),
                         _BLUR_TAPS, 2, True)
    return images + amount * (images - blur)


def build_klt_maps(images, use_matmul=None):
    """The 7 structure-tensor maps of refine.refine_patches, on the FULL
    image: A=w(*)gx^2, B=w(*)gxgy, D=w(*)gy^2, and the four first-moment
    maps (w*ox*gx^2, w*oy*gxgy, w*ox*gxgy, w*oy*gy^2).

    Returns (B, 7, H, W) in the matmul dtype (bf16 on TPU).  Windowed
    sums use zero boundary handling, matching the patch version's
    zero-padded _sep_corr.
    """
    f = images.astype(jnp.float32)
    B, H, W = f.shape
    gx = jnp.zeros_like(f)
    gy = jnp.zeros_like(f)
    gx = gx.at[:, :, 1:-1].set((f[:, :, 2:] - f[:, :, :-2]) * 0.5)
    gy = gy.at[:, 1:-1, :].set((f[:, 2:, :] - f[:, :-2, :]) * 0.5)
    gxx = gx * gx
    gxy = gx * gy
    gyy = gy * gy
    if _use_mm(use_matmul):
        Kg_h = _band(H, "g")
        Kgo_h = _band(H, "go")
        Kg_w = _band(W, "g")
        Kgo_w = _band(W, "go")
        cy = lambda x, K: _convy(x, K)  # noqa: E731
        cx = lambda x, K: _convx(x, K)  # noqa: E731
        g_h, go_h, g_w, go_w = Kg_h, Kgo_h, Kg_w, Kgo_w
    else:
        cy = lambda x, t: _tap_corr(x, t, 1, False)  # noqa: E731
        cx = lambda x, t: _tap_corr(x, t, 2, False)  # noqa: E731
        g_h, go_h, g_w, go_w = _G_TAPS, _GO_TAPS, _G_TAPS, _GO_TAPS
    # y (row) pass once per (source, ky) pair, then x (col) passes
    gxx_g = cy(gxx, g_h)
    gxy_g = cy(gxy, g_h)
    gyy_g = cy(gyy, g_h)
    gxy_go = cy(gxy, go_h)
    gyy_go = cy(gyy, go_h)
    maps = jnp.stack(
        [
            cx(gxx_g, g_w),    # A
            cx(gxy_g, g_w),    # B
            cx(gyy_g, g_w),    # D
            cx(gxx_g, go_w),   # sum w*ox*gx^2
            cx(gxy_go, g_w),   # sum w*oy*gx*gy
            cx(gxy_g, go_w),   # sum w*ox*gx*gy
            cx(gyy_go, g_w),   # sum w*oy*gy^2
        ],
        axis=1,
    )
    return maps.astype(_mm_dtype())


def _hat(pos, size, dtype):
    """Bilinear tent weights: (..., K) positions -> (..., K, size)."""
    grid = jnp.arange(size, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - grid)).astype(dtype)


def _floor_taps(x, y, H: int, W: int):
    """Shared bilinear-tap indices/fractions with the same clipping as
    the hat-matmul path."""
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    return x0, y0, x - x0, y - y0


def _sample_maps_gather(maps, qx, qy):
    """CPU refine sampling: bilinear-gather the 7 maps at (B, M) points.

    maps (B, C, H, W) -> (B, M, C)."""
    B, C, H, W = maps.shape
    x0, y0, fx, fy = _floor_taps(qx, qy, H, W)

    def tap(dy, dx):
        return jax.vmap(lambda m, yy, xx: m[:, yy, xx])(
            maps, y0 + dy, x0 + dx
        )  # (B, C, M)

    v = (
        tap(0, 0) * ((1 - fy) * (1 - fx))[:, None, :]
        + tap(0, 1) * ((1 - fy) * fx)[:, None, :]
        + tap(1, 0) * (fy * (1 - fx))[:, None, :]
        + tap(1, 1) * (fy * fx)[:, None, :]
    )
    return jnp.swapaxes(v, 1, 2).astype(jnp.float32)


def refine_corners_mm(maps, corners, iters: int = ITERS,
                      max_shift: float = MAX_SHIFT, use_matmul=None):
    """Subpixel-refine corners against precomputed KLT maps.

    Same Newton iteration as refine.refine_patches (1 px/iter step clamp,
    total-shift clamp) but sampling the 7 full-image maps with hat-weight
    matmuls (gathers on CPU) instead of per-corner patches.  Traceable.

    Args:
      maps: (B, 7, H, W) from build_klt_maps.
      corners: (B, M, 2) float32 (x, y) starts.

    Returns (B, M, 2) refined corners.
    """
    B, _, H, W = maps.shape
    dt = maps.dtype
    mm = _use_mm(use_matmul)

    def sample_maps(qx, qy):
        if not mm:
            return _sample_maps_gather(maps, qx, qy)
        Wy = _hat(jnp.clip(qy, 0.0, H - 1.001), H, dt)      # (B, M, H)
        Wx = _hat(jnp.clip(qx, 0.0, W - 1.001), W, jnp.float32)
        A2 = jnp.einsum(
            "bmh,bkhw->bmkw", Wy, maps,
            preferred_element_type=jnp.float32,
        )
        return jnp.sum(A2 * Wx[:, :, None, :], axis=3)      # (B, M, 7)

    def step(c, _):
        qx, qy = c[..., 0], c[..., 1]
        m = sample_maps(qx, qy)
        a, b, d = m[..., 0], m[..., 1], m[..., 2]
        bxv = qx * a + qy * b + m[..., 3] + m[..., 4]
        byv = qx * b + qy * d + m[..., 5] + m[..., 6]
        det = a * d - b * b
        det = jnp.where(jnp.abs(det) > 1e-9, det, 1e-9)
        nx = (d * bxv - b * byv) / det
        ny = (a * byv - b * bxv) / det
        dx = jnp.clip(nx - qx, -1.0, 1.0)
        dy = jnp.clip(ny - qy, -1.0, 1.0)
        return jnp.stack([qx + dx, qy + dy], axis=-1), None

    refined, _ = jax.lax.scan(step, corners, None, length=iters)
    total = refined - corners
    norm = jnp.linalg.norm(total, axis=-1, keepdims=True)
    scale = jnp.minimum(1.0, max_shift / jnp.maximum(norm, 1e-9))
    return corners + total * scale


def sample_bilinear_mm(images, sx, sy, max_rows_mb: int = 192,
                       use_matmul=None):
    """Bilinear-sample (B, H, W) images at per-image positions (B, K).

    out[b, k] = bilinear(images[b], sx[b, k], sy[b, k]) via
    A = hat(sy) @ image (MXU) then a lane reduction against hat(sx);
    a plain 4-tap gather on CPU.  K is chunked so the (B, Kc, H)
    row-weight tensor stays under ``max_rows_mb`` MB.  Traceable;
    positions clipped to the image.
    """
    B, H, W = images.shape
    if not _use_mm(use_matmul):
        f = images.astype(jnp.float32)
        x0, y0, fx, fy = _floor_taps(sx, sy, H, W)

        def tap(dy, dx):
            return jax.vmap(lambda img, yy, xx: img[yy, xx])(
                f, y0 + dy, x0 + dx
            )

        return (
            tap(0, 0) * (1 - fy) * (1 - fx)
            + tap(0, 1) * (1 - fy) * fx
            + tap(1, 0) * fy * (1 - fx)
            + tap(1, 1) * fy * fx
        )
    K = sx.shape[1]
    dt = _mm_dtype()
    imgs_dt = images.astype(dt)
    bpe = 2 if dt == jnp.bfloat16 else 4
    kc = max(256, int(max_rows_mb * 1e6 / (B * H * bpe)))
    outs = []
    for s in range(0, K, kc):
        e = min(K, s + kc)
        Wy = _hat(jnp.clip(sy[:, s:e], 0.0, H - 1.001), H, dt)
        Wx = _hat(jnp.clip(sx[:, s:e], 0.0, W - 1.001), W, jnp.float32)
        A = jnp.einsum(
            "bkh,bhw->bkw", Wy, imgs_dt,
            preferred_element_type=jnp.float32,
        )
        outs.append(jnp.sum(A * Wx, axis=2))
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
