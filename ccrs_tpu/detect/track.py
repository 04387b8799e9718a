"""Steady-state tag tracking: the video fast path of the detector.

Calibration sequences are continuous video — frame-to-frame tag motion is
small — yet the cold pipeline pays the packed-bitmap download, the
single-core native CCL, and the host assist bookkeeping for EVERY frame
(the detect stage is the reference's own hot loop #1,
``/root/reference/src/data_loader.rs:114-127``).  Tracking replaces all of
that for the steady-state majority of frames with ONE device graph per
chunk:

  for each frame (``lax.scan``):
    predict every board tag's quad from the previous frame
      - decoded tags: constant-velocity extrapolation of their corners
      - missing tags: local homography fit from the 4 nearest decoded
        neighbors (board plane -> image; the same idea as the board-assist
        pass, but fed by the previous frame) plus the mean scene velocity
    subpixel-refine the predicted corners on the current frame
    decode and accept only on tag-id match (like assist, a far stronger
      test than open-set matching, so a relaxed hamming budget is safe)
    carry the accepted corners to the next frame

The only link traffic is the per-chunk carry upload (~1 KB) and the
(C, n_tags)-sized outputs (~100 KB) — no bitmaps, no host CCL.  Frames
where tracking is suspect fall back to the cold pipeline (see
``detector.TagDetector._detect_batch_tracked`` for the trigger policy),
so recall can never silently degrade below the cold detector's.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .decode import _decode_core, unsharp
from .families import TagFamily
from .patches import extract_patches
from .refine import refine_patches_2stage

#: id-match acceptance allows a relaxed budget, like assist.ASSIST_EXTRA_HAMMING
TRACK_EXTRA_HAMMING = 2
#: below this many accepted tags a frame cannot seed the next prediction
MIN_TRACK_TAGS = 4
#: neighbors for the local-homography prediction of missing tags
N_NEIGHBORS = 4
#: degenerate/too-small predicted quads are not worth decoding (px^2)
MIN_QUAD_AREA = 49.0
#: predictions up to this many px outside the image still count as
#: "attempted": a tag entering the view may have a slightly-stale
#: prediction straddling the border — attempting (and failing) it makes it
#: auditable by the cold-fallback trigger instead of silently skipped
EDGE_MARGIN = 8.0
#: a failed decode counts as cold-equivalent (non-triggering) only when
#: refinement moved every corner less than this (well inside the 4 px
#: capture clamp — converged localization, so the failure is decode noise)
BENIGN_MAX_DISP = 3.0
#: frames a lost tag "coasts" on its last known position (advanced by the
#: global scene velocity) before prediction falls back to the local
#: homography.  Flickering marginal tags lose one frame at a time; their
#: own last position is far more accurate than homography EXTRAPOLATION,
#: which degrades at the fisheye rim exactly where those tags live.
MAX_COAST = 8


def _fit_h_batch(src, dst):
    """Batched inhomogeneous DLT homography fit src -> dst.

    src/dst: (Q, n, 2).  Returns (Q, 3, 3) with H[2,2] == 1 fitted on
    mean/std-normalized coordinates (composed back), solved Cholesky-only
    (8x8 normal equations) — eigh/SVD are off-limits on this backend
    (f32 eigh SIGABRTs the remote compiler; see CLAUDE.md).  Near-singular
    neighbor geometry yields non-finite H; callers mask on isfinite.
    """
    Q, n, _ = src.shape
    sm = src.mean(axis=1)
    ss = src.reshape(Q, -1).std(axis=1) + 1e-12
    dm = dst.mean(axis=1)
    ds = dst.reshape(Q, -1).std(axis=1) + 1e-12
    s = (src - sm[:, None]) / ss[:, None, None]
    d = (dst - dm[:, None]) / ds[:, None, None]
    A = jnp.zeros((Q, 2 * n, 8), dtype=src.dtype)
    A = A.at[:, 0::2, 0:2].set(s)
    A = A.at[:, 0::2, 2].set(1.0)
    A = A.at[:, 0::2, 6:8].set(-d[:, :, :1] * s)
    A = A.at[:, 1::2, 3:5].set(s)
    A = A.at[:, 1::2, 5].set(1.0)
    A = A.at[:, 1::2, 6:8].set(-d[:, :, 1:2] * s)
    b = d.reshape(Q, -1)  # rows interleave (x_i, y_i) matching A
    M = jnp.einsum("qij,qik->qjk", A, A) + 1e-6 * jnp.eye(8, dtype=src.dtype)
    rhs = jnp.einsum("qij,qi->qj", A, b)

    def solve_one(Mq, rq):
        L = jnp.linalg.cholesky(Mq)
        return jax.scipy.linalg.cho_solve((L, True), rq)

    h = jax.vmap(solve_one)(M, rhs)  # (Q, 8)
    Hn = jnp.concatenate(
        [h, jnp.ones((Q, 1), dtype=src.dtype)], axis=1
    ).reshape(Q, 3, 3)
    Ts = jnp.zeros((Q, 3, 3), dtype=src.dtype)
    Ts = Ts.at[:, 0, 0].set(1.0 / ss)
    Ts = Ts.at[:, 1, 1].set(1.0 / ss)
    Ts = Ts.at[:, 0, 2].set(-sm[:, 0] / ss)
    Ts = Ts.at[:, 1, 2].set(-sm[:, 1] / ss)
    Ts = Ts.at[:, 2, 2].set(1.0)
    Td = jnp.zeros((Q, 3, 3), dtype=src.dtype)
    Td = Td.at[:, 0, 0].set(ds)
    Td = Td.at[:, 1, 1].set(ds)
    Td = Td.at[:, 0, 2].set(dm[:, 0])
    Td = Td.at[:, 1, 2].set(dm[:, 1])
    Td = Td.at[:, 2, 2].set(1.0)
    return Td @ Hn @ Ts


def _apply_h_batch(H, pts):
    """(Q, 3, 3) x (Q, n, 2) -> (Q, n, 2)."""
    p = jnp.einsum("qij,qnj->qni", H[:, :, :2], pts) + H[:, None, :, 2]
    z = p[:, :, 2]
    z = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    return p[:, :, :2] / z[:, :, None]


@partial(jax.jit, static_argnames=("family", "debug"))
def track_chunk(
    family: TagFamily, images, board_xy, first_id,
    p3c, p3v, p2c, p2v, p1c, p1v, debug: bool = False,
):
    """Track all board tags through a chunk of consecutive frames.

    Args:
      images: (C, H, W) uint8/f32 original frames, time-ordered.
      board_xy: (n_tags, 4, 2) f32 board-plane tag corner coordinates.
      first_id: int32 scalar — board tag id offset (decode tag ids are
        ``first_id + local_index``).
      p3c/p3v: (n_tags, 4, 2) corners + (n_tags,) validity of frame -3
        (enables constant-ACCELERATION prediction; pass p3v=False to
        degrade to constant velocity).
      p2c/p2v: same for frame -2; p1c/p1v: frame -1 (the seed).

    Returns (corners (C, n_tags, 4, 2), accepted (C, n_tags),
    attempted (C, n_tags), benign (C, n_tags)) where ``attempted`` marks
    tags whose predicted quad was valid and fully in-bounds — the set the
    fallback policy audits — and ``benign`` the attempted failures whose
    localization converged (cold-equivalent decode noise).
    """
    imgs = images.astype(jnp.float32)
    sharp_all = unsharp(imgs)
    n_tags = board_xy.shape[0]
    Hh, Ww = imgs.shape[1], imgs.shape[2]
    centers = board_xy.mean(axis=1)  # (n_tags, 2)
    d2_all = ((centers[:, None] - centers[None]) ** 2).sum(-1)
    exp_id = jnp.arange(n_tags, dtype=jnp.int32) + first_id.astype(jnp.int32)

    def step(carry, xs):
        img, simg = xs
        c3, v3, c2, v2, c1, v1, coast_c, coast_v, coast_age = carry
        both = v1 & v2
        vel = jnp.where(both[:, None, None], c1 - c2, 0.0)
        nv = jnp.maximum(jnp.sum(both), 1)
        gvel = jnp.sum(vel * both[:, None, None], axis=(0, 1)) / (nv * 4)
        # quadratic (constant-acceleration) extrapolation through the last
        # three observations where available, else constant velocity:
        # handheld sweeps accelerate (measured ~3-4 px/frame^2 on the
        # smooth-trajectory bench), which breaks linear prediction right
        # past the refine capture radius
        quad_ok = both & v3
        pred_quad = 3.0 * c1 - 3.0 * c2 + c3
        pred_id = jnp.where(quad_ok[:, None, None], pred_quad, c1 + vel)

        # local homography prediction (tags missing longer than MAX_COAST)
        d2m = d2_all + jnp.where(v1, 0.0, 1e12)[None, :]
        negd, idx = jax.lax.top_k(-d2m, N_NEIGHBORS)  # (n_tags, k)
        nb_ok = (-negd < 1e11).all(axis=1)  # all k neighbors decoded
        src = board_xy[idx].reshape(n_tags, -1, 2)
        dst = c1[idx].reshape(n_tags, -1, 2)
        Hs = _fit_h_batch(src, dst)
        ph = _apply_h_batch(Hs, board_xy) + gvel[None, None, :]
        h_ok = nb_ok & jnp.isfinite(ph).all(axis=(1, 2))
        ph = jnp.nan_to_num(ph)

        # recently-lost tags coast on their own last position advanced by
        # their own remembered velocity (global velocity is wrong at the
        # fisheye rim under rotation — exactly where marginal tags live;
        # homography extrapolation degrades there too)
        coast_p = coast_c + coast_v
        coasting = (~v1) & (coast_age <= MAX_COAST)
        pred = jnp.where(
            v1[:, None, None],
            pred_id,
            jnp.where(coasting[:, None, None], coast_p, ph),
        )
        pred_ok = v1 | coasting | h_ok
        # decode expects clockwise traversal in image coordinates (the
        # canonical Kalibr corner order comes out counter-clockwise)
        x, y = pred[..., 0], pred[..., 1]
        area2 = jnp.sum(x * jnp.roll(y, -1, 1) - jnp.roll(x, -1, 1) * y, axis=1)
        pred_t = jnp.where((area2 < 0)[:, None, None], pred[:, ::-1], pred)
        inb = (
            (pred[..., 0].min(1) >= -EDGE_MARGIN)
            & (pred[..., 1].min(1) >= -EDGE_MARGIN)
            & (pred[..., 0].max(1) <= Ww - 1 + EDGE_MARGIN)
            & (pred[..., 1].max(1) <= Hh - 1 + EDGE_MARGIN)
            & (0.5 * jnp.abs(area2) >= MIN_QUAD_AREA)
        )
        attempt = pred_ok & inb

        # subpixel refine on the original frame, decode on the sharpened
        corners = pred_t.reshape(-1, 2)
        cframe = jnp.zeros(corners.shape[0], dtype=jnp.int32)
        patches, local, offset = extract_patches(img[None], corners, cframe)
        quads = (refine_patches_2stage(patches, local) + offset).reshape(n_tags, 4, 2)
        dec = _decode_core(
            family, simg[None], quads, jnp.zeros(n_tags, jnp.int32), attempt
        )
        id_match = dec["tag_id"] == exp_id
        acc = (
            attempt
            & dec["contrast_ok"]
            & id_match
            & (dec["hamming"] <= family.max_hamming + TRACK_EXTRA_HAMMING)
        )
        # decode-limited failures are COLD-EQUIVALENT, not tracking misses:
        # the right tag id at a well-converged quad (refinement stayed well
        # inside its capture radius) with healthy contrast, only the
        # hamming over budget — the cold pipeline would localize the same
        # quad and run the same decode on the same pixels, so it fails the
        # (stricter, max_hamming) budget too.  Excluding these from the
        # fallback audit stops noise-flickering marginal tags from
        # triggering a cold run every frame (measured: 19.7 s of cold
        # fallbacks over a 534-frame bench without this).
        disp = jnp.linalg.norm(quads - pred_t, axis=-1).max(axis=-1)
        benign = (
            attempt
            & ~acc
            & id_match
            & dec["contrast_ok"]
            & (disp < BENIGN_MAX_DISP)
        )
        out_c = dec["corners"]
        new_c = jnp.where(acc[:, None, None], out_c, pred_id)
        new_coast = jnp.where(acc[:, None, None], out_c, coast_p)
        # per-tag velocity memory: observed motion at accept, carried
        # (unchanged) through misses; fresh re-acquisitions fall back to
        # the global mean velocity
        obs_v = jnp.where(
            (acc & v1)[:, None, None],
            out_c - c1,
            jnp.broadcast_to(gvel, coast_v.shape),
        )
        new_coast_v = jnp.where(acc[:, None, None], obs_v, coast_v)
        new_age = jnp.where(acc, 0, coast_age + 1)
        ys = (out_c, acc, attempt, benign)
        if debug:
            ys = ys + (pred, disp, dec["tag_id"], dec["hamming"],
                       dec["contrast_ok"], v1, coasting, quad_ok)
        return (
            (c2, v2, c1, v1, new_c, acc, new_coast, new_coast_v, new_age),
            ys,
        )

    init_age = jnp.where(p1v, 0, MAX_COAST + 1).astype(jnp.int32)
    init = (p3c, p3v, p2c, p2v, p1c, p1v, p1c, jnp.zeros_like(p1c), init_age)
    _, ys = jax.lax.scan(step, init, (imgs, sharp_all))
    return ys


def detections_to_arrays(res, board) -> tuple:
    """{tag_id: (4,2)} -> ((n_tags, 4, 2) f32, (n_tags,) bool) carry arrays."""
    n_tags = board.n_tags
    first = board.config.first_id
    c = np.zeros((n_tags, 4, 2), np.float32)
    v = np.zeros(n_tags, bool)
    for t, cc in res.items():
        tl = int(t) - first
        if 0 <= tl < n_tags:
            c[tl] = cc
            v[tl] = True
    return c, v
