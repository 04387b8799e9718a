"""Board-assisted tag recovery (second detection pass).

A calibration-specific capability beyond the reference detector: once some
tags of a frame decoded, the board's known geometry pins down where every
OTHER tag must be.  For each missing tag we fit a local homography from the
nearest detected tags' corners (local fits track fisheye curvature far
better than one global H), predict its quad, subpixel-refine it on the
image, and re-decode — accepting only if the decoded id matches the
prediction (a much stronger test than open-set matching, so a slightly
higher hamming budget is safe).

All predicted quads across the whole frame batch decode in one device
call, like the primary pass.
"""

from __future__ import annotations

from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ..board import Board
from .decode import decode_quads_compact
from .families import TagFamily

ASSIST_EXTRA_HAMMING = 2
MIN_TAGS_FOR_ASSIST = 4
N_NEIGHBORS = 4
_BUCKET = 256  # grow-only decode bucket


def _tag_corner_xy(board: Board, tag_local: int) -> np.ndarray:
    """(4,2) board-plane corner coordinates of local tag index."""
    return board.p3d[tag_local * 4 : tag_local * 4 + 4, :2]


def _fit_h(src: np.ndarray, dst: np.ndarray):
    """DLT homography src(board xy) -> dst(pixels); None if degenerate."""
    n = src.shape[0]
    if n < 4:
        return None
    sm, ss = src.mean(0), src.std() + 1e-12
    dm, ds = dst.mean(0), dst.std() + 1e-12
    s = (src - sm) / ss
    d = (dst - dm) / ds
    A = np.zeros((2 * n, 9))
    A[0::2, 0:2] = s
    A[0::2, 2] = 1
    A[0::2, 6:8] = -d[:, :1] * s
    A[0::2, 8] = -d[:, 0]
    A[1::2, 3:5] = s
    A[1::2, 5] = 1
    A[1::2, 6:8] = -d[:, 1:2] * s
    A[1::2, 8] = -d[:, 1]
    try:
        _, sv, Vt = np.linalg.svd(A, full_matrices=False)
    except np.linalg.LinAlgError:
        return None
    if sv[-2] < 1e-10:
        return None
    Hn = Vt[-1].reshape(3, 3)
    Ts = np.array([[1 / ss, 0, -sm[0] / ss], [0, 1 / ss, -sm[1] / ss], [0, 0, 1]])
    Td = np.array([[ds, 0, dm[0]], [0, ds, dm[1]], [0, 0, 1]])
    return Td @ Hn @ Ts


def _apply_h(H, pts):
    p = np.concatenate([pts, np.ones((pts.shape[0], 1))], 1) @ H.T
    z = np.where(np.abs(p[:, 2:3]) > 1e-12, p[:, 2:3], 1e-12)
    return p[:, :2] / z


def recover_missing_tags(
    family: TagFamily,
    board: Board,
    refine_fn,
    dev_imgs_f32,
    results: List[Dict[int, np.ndarray]],
) -> int:
    """Augment ``results`` in place; returns the number of recovered tags.

    ``refine_fn(quads (Q,4,2), qframe (Q,), total) -> refined (Q,4,2)``
    subpixel-refines the predicted corners — the detector supplies either
    the host full-image kernel (``_refine_compact``) or the device
    patch-gather path when frames are device-resident.
    """
    B, H, W = dev_imgs_f32.shape
    first = board.config.first_id
    n_tags = board.n_tags
    centers = board.p3d.reshape(n_tags, 4, 3)[:, :, :2].mean(1)

    cand = []  # (frame, tag_id, quad (4,2))
    for b, dets in enumerate(results):
        local = {t - first: c for t, c in dets.items() if 0 <= t - first < n_tags}
        if len(local) < MIN_TAGS_FOR_ASSIST or len(local) == n_tags:
            continue
        det_ids = np.array(sorted(local))
        for t in range(n_tags):
            if t in local:
                continue
            d2 = ((centers[det_ids] - centers[t]) ** 2).sum(1)
            near = det_ids[np.argsort(d2)[:N_NEIGHBORS]]
            src = np.concatenate([_tag_corner_xy(board, int(u)) for u in near])
            dst = np.concatenate([local[int(u)] for u in near])
            Hm = _fit_h(src, dst)
            if Hm is None:
                continue
            quad = _apply_h(Hm, _tag_corner_xy(board, t))
            # decode expects clockwise traversal in image coordinates (the
            # Kalibr board-corner order comes out counter-clockwise)
            area2 = np.dot(quad[:, 0], np.roll(quad[:, 1], -1)) - np.dot(
                np.roll(quad[:, 0], -1), quad[:, 1]
            )
            if area2 < 0:
                quad = quad[::-1]
            if (
                quad[:, 0].min() < 1 or quad[:, 1].min() < 1
                or quad[:, 0].max() > W - 2 or quad[:, 1].max() > H - 2
            ):
                continue
            # degenerate/too-small predictions are not worth decoding
            area = 0.5 * abs(
                np.dot(quad[:, 0], np.roll(quad[:, 1], -1))
                - np.dot(np.roll(quad[:, 0], -1), quad[:, 1])
            )
            if area < 49:
                continue
            cand.append((b, t + first, quad.astype(np.float32)))
    if not cand:
        return 0

    # refine all predicted corners on the image, then decode the compact
    # candidate list in one device call (bucketed to a static size;
    # grow-only so boundary-hovering counts don't flap the compiled shape)
    global _BUCKET
    total = len(cand)
    while _BUCKET < total:
        _BUCKET *= 2
    bucket = _BUCKET
    quads = np.zeros((bucket, 4, 2), np.float32)
    qframe = np.zeros(bucket, np.int32)
    qvalid = np.zeros(bucket, bool)
    for i, (b, t, q) in enumerate(cand):
        quads[i] = q
        qframe[i] = b
        qvalid[i] = True

    refined = refine_fn(quads, qframe, total)
    out = decode_quads_compact(
        family, dev_imgs_f32, jnp.asarray(refined), jnp.asarray(qframe),
        jnp.asarray(qvalid),
    )
    tag_id = np.asarray(out["tag_id"])
    hamming = np.asarray(out["hamming"])
    corners = np.asarray(out["corners"])

    recovered = 0
    budget = family.max_hamming + ASSIST_EXTRA_HAMMING
    for i, (b, t_expect, _) in enumerate(cand):
        if int(tag_id[i]) == t_expect and int(hamming[i]) <= budget:
            if t_expect not in results[b]:
                results[b][t_expect] = corners[i].copy()
                recovered += 1
    return recovered


def _refine_compact(imgs_f32, quads, qframe, total):
    """Subpixel-refine a compact (Q,4,2) quad list via the native kernel."""
    from .quads import _load
    import ctypes

    lib = _load()
    images = np.ascontiguousarray(imgs_f32, dtype=np.float32)
    B, H, W = images.shape
    flat = np.ascontiguousarray(quads[:total].reshape(-1, 2), np.float32).copy()
    idx = np.repeat(qframe[:total], 4).astype(np.int32)
    if flat.shape[0]:
        lib.refine_corners_native(
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            B, H, W,
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flat.shape[0], 4, 6,
        )
    out = quads.copy()
    out[:total] = flat.reshape(-1, 4, 2)
    return out
