"""Closed-form camera initialization.

Covers the reference flow try_init_camera -> init_ucm
(``src/util.rs:107-378``) and the frame-selection heuristics
(``src/util.rs:168-219``), rebuilt on the batched solvers:

- the 1000-sample radial-distortion-homography RANSAC runs as one vmapped
  batch (ccrs_tpu.solve.homography);
- division-model pose init (``src/optimization/linear.rs:5-21``) uses the
  planar PnP, batched over both init frames;
- the [f, alpha] UCM fit and the follow-up two-frame full UCM calibration
  are both ``ba_solve`` instances (theta = reduced UCM params with cx, cy
  frozen for the first stage — exactly the reference's parameter set).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..board import Board
from ..models import GenericModel
from ..models.projections import project_ucm
from ..solve.homography import homography_to_focal, radial_distortion_homography
from ..solve.lm import ba_solve
from ..solve.pnp import solve_pnp_planar_batch
from .frames import FrameBatch


def find_best_two_frames(batch: FrameBatch, random_pick: bool = False, rng=None):
    """Pick the two init frames (``src/util.rs:168-219``).

    Among frames with the maximum detection count: frame A = largest
    covered area, frame B = farthest feature-centroid from the group mean.
    ``random_pick`` (retry path) picks two random max-count frames.
    """
    counts = batch.counts()
    max_det = counts.max()
    cand = np.flatnonzero(counts == max_det)
    if len(cand) < 2:
        # Robustness improvement over the reference (util.rs:168-219, whose
        # degenerate single-max case returns the SAME frame twice and can
        # poison the two-frame init): widen to near-max frames so the two
        # init frames are always distinct when possible.
        near = np.flatnonzero(counts >= 0.9 * max_det)
        if len(near) >= 2:
            cand = near
        else:
            order = np.argsort(counts)[::-1]
            cand = order[: min(2, len(order))]
    if random_pick:
        rng = rng or np.random.default_rng()
        pick = rng.permutation(cand)
        return int(pick[0]), int(pick[1 % len(pick)])
    # feature centroids
    m = batch.mask[cand][..., None]
    pts = batch.p2d[cand]
    centers = (pts * m).sum(1) / np.maximum(m.sum(1), 1)
    avg_all = centers.mean(0)
    d2 = ((centers - avg_all) ** 2).sum(-1)
    # covered axis-aligned area
    big = np.where(batch.mask[cand][..., None], pts, np.nan)
    area = (np.nanmax(big[:, :, 0], 1) - np.nanmin(big[:, :, 0], 1)) * (
        np.nanmax(big[:, :, 1], 1) - np.nanmin(big[:, :, 1], 1)
    )
    idx_area = cand[int(np.argmax(area))]
    # farthest-centroid frame, required distinct from idx_area when
    # possible (the reference can return the same frame twice, which makes
    # the two-view init degenerate)
    order = np.argsort(d2)[::-1]
    idx_far = idx_area
    for j in order:
        if cand[j] != idx_area:
            idx_far = cand[j]
            break
    return int(idx_area), int(idx_far)


def _normalize(p2d, width, height):
    half_w, half_h = width / 2.0, height / 2.0
    half = max(half_w, half_h)
    return (p2d - np.array([half_w, half_h])) / half, half


def init_poses(board: Board, batch: FrameBatch, frame_ids, lam: float):
    """Division-model pose init (``src/optimization/linear.rs:5-21``):
    normalize by image center/half-size, undo r' = r(1+lam r^2), planar PnP.
    Returns an (n,6) rvec|tvec array.

    NOTE (parity): like the reference, the normalized coordinates keep the
    unknown focal scale, so the recovered pose absorbs it — it is only an
    initialization for the subsequent [f, alpha] fit.
    """
    p3d = jnp.asarray(board.p3d, dtype=jnp.float64)
    qn_all, w_all = [], []
    for f in frame_ids:
        q, _ = _normalize(batch.p2d[f], batch.width, batch.height)
        sc = 1.0 + lam * np.sum(q * q, axis=-1)
        qn_all.append(q / sc[..., None])
        w_all.append(batch.mask[f].astype(np.float64))
    n = len(frame_ids)
    r, t = solve_pnp_planar_batch(
        jnp.broadcast_to(p3d, (n,) + p3d.shape),
        jnp.asarray(np.stack(qn_all)),
        jnp.asarray(np.stack(w_all)),
    )
    return np.concatenate([np.asarray(r), np.asarray(t)], axis=1)


def init_ucm(
    board: Board,
    batch: FrameBatch,
    frame0: int,
    frame1: int,
    poses0: np.ndarray,
    init_f: float,
    init_alpha: float,
    fixed_focal: bool,
) -> Optional[GenericModel]:
    """Two-frame [f, alpha] UCM fit, then two-frame full UCM calibration
    (``src/util.rs:287-378``).

    Stage 1 parameterization: reduced UCM theta = [f, cx, cy, alpha] with
    cx, cy frozen at the image center and f bounded to [f/3, 3f]
    (util.rs:345-346); Huber delta 1.0.
    """
    half_w, half_h = batch.width / 2.0, batch.height / 2.0
    theta0 = jnp.asarray([init_f, half_w, half_h, init_alpha])
    lo = jnp.asarray([init_f / 3.0, 0.0, 0.0, 1e-6])
    hi = jnp.asarray([init_f * 3.0, batch.width, batch.height, 1.0])
    free = jnp.asarray([0.0 if fixed_focal else 1.0, 0.0, 0.0, 1.0])

    sel = [frame0, frame1]
    p2d = jnp.asarray(batch.p2d[sel])
    w = jnp.asarray(batch.mask[sel].astype(np.float64))
    res = ba_solve(
        project_ucm,
        theta0,
        jnp.asarray(poses0),
        jnp.asarray(board.p3d, dtype=jnp.float64),
        p2d,
        w,
        lo,
        hi,
        free,
        jnp.ones(2),
        one_focal=True,
        huber_delta=1.0,
    )
    f = float(res.theta[0])
    alpha = float(res.theta[3])
    params = np.array([f, f, half_w, half_h, alpha])
    model = GenericModel("ucm", params, batch.width, batch.height)
    # stage 2: full two-frame UCM calibration with standard bounds
    from .single import calib_camera  # local import to avoid cycle

    two = FrameBatch(
        batch.time_ns[sel], batch.p2d[sel], batch.mask[sel], batch.width, batch.height
    )
    out = calib_camera(
        board, two, model, xy_same_focal=True, disabled_distortions=0,
        fixed_focal=fixed_focal,
    )
    if out is None:
        return None
    return out[0]


def try_init_camera(
    board: Board,
    batch: FrameBatch,
    frame0: int,
    frame1: int,
    key,
    fixed_focal: Optional[float] = None,
) -> Optional[GenericModel]:
    """One initialization attempt (``src/util.rs:107-159``).

    Returns a fitted UCM model or None (caller retries with a new key).
    """
    # matched pairs on normalized coordinates
    q0, half = _normalize(batch.p2d[frame0], batch.width, batch.height)
    q1, _ = _normalize(batch.p2d[frame1], batch.width, batch.height)
    pair_mask = batch.mask[frame0] & batch.mask[frame1]
    lam, H, score = radial_distortion_homography(
        key, jnp.asarray(q0), jnp.asarray(q1), jnp.asarray(pair_mask)
    )
    lam = float(lam)
    if not np.isfinite(float(score)):
        return None
    f_unit, ok = homography_to_focal(H)
    if not bool(ok) or not np.isfinite(float(f_unit)) or float(f_unit) <= 0:
        return None
    init_f = fixed_focal if fixed_focal is not None else float(f_unit) * half
    init_alpha = abs(lam)
    poses0 = init_poses(board, batch, [frame0, frame1], lam)
    model = init_ucm(
        board, batch, frame0, frame1, poses0, init_f, init_alpha,
        fixed_focal is not None,
    )
    if model is None or model.params[0] == 0.0:
        return None
    return model
