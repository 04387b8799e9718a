"""Per-camera calibration orchestration.

Rebuilds ``init_and_calibrate_one_camera`` (``src/util.rs:831-911``) and the
retry ladder of ``calibrate_all_cameras``
(``src/bin/camera_calibration.rs:205-246``): pick two init frames, attempt
closed-form init up to 10 times (fresh PRNG key each attempt), convert the
fitted UCM to the target model, then run the full bundle adjustment.
Randomness is reproducible: every retry derives from one threaded JAX key.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ..board import Board
from ..models import GenericModel
from ..utils.profiling import stage
from ..utils.host import cpu_scope
from ..types import CalibParams, RvecTvec
from .convert import convert_model
from .frames import FrameBatch
from .initialize import find_best_two_frames, try_init_camera
from .single import calib_camera

log = logging.getLogger(__name__)

MAX_INIT_ATTEMPTS = 10  # src/util.rs:855
MAX_TRIALS = 3  # bin/camera_calibration.rs:217


def init_and_calibrate_one_camera(
    board: Board,
    batch: FrameBatch,
    target_model: GenericModel,
    calib_params: CalibParams,
    key,
    random_pick_two_frames: bool = False,
    rng=None,
) -> Optional[Tuple[GenericModel, Dict[int, RvecTvec]]]:
    frame0, frame1 = find_best_two_frames(batch, random_pick_two_frames, rng)
    log.info("init frames: %d, %d", frame0, frame1)
    # recorded for the caller's Rerun keyframe markers
    # (/cam{i}/keyframe{j}, matching src/util.rs:898-908)
    init_and_calibrate_one_camera.last_init_frames = (frame0, frame1)

    initial_camera = None
    with stage("calib/init"):
        for i in range(MAX_INIT_ATTEMPTS):
            with cpu_scope():
                key, sub = jax.random.split(key)
            initial_camera = try_init_camera(
                board, batch, frame0, frame1, sub, calib_params.fixed_focal
            )
            if initial_camera is not None:
                break
            log.info("initialization attempt %d failed, retrying", i)
            if i >= 2:
                # Robustness improvement over the reference (which burns
                # all 10 attempts on the same pair, util.rs:855-863): a
                # deterministic failure mode — e.g. a focal-degenerate
                # near-pure-translation pair — cannot be fixed by a new
                # RANSAC key, so re-pick the frames after 3 failures.
                if rng is None:
                    rng = np.random.default_rng(
                        int(jax.random.randint(sub, (), 0, 2**31 - 1))
                    )
                frame0, frame1 = find_best_two_frames(batch, True, rng)
                log.info("re-picked init frames: %d, %d", frame0, frame1)
    if initial_camera is None or initial_camera.params[0] == 0.0:
        log.warning("calibration failed: could not initialize UCM")
        return None

    final_model = target_model.copy()
    final_model.set_w_h(round(initial_camera.width), round(initial_camera.height))
    with stage("calib/convert"):
        convert_model(initial_camera, final_model, calib_params.disabled_distortion_num)
    log.info("converted to %s: %s", final_model.name, final_model.params)

    if calib_params.fixed_focal is not None:
        p = final_model.params.copy()
        p[0] = p[1] = calib_params.fixed_focal
        final_model.set_params(p)
        one_focal, fixed_focal = True, True
    else:
        one_focal, fixed_focal = calib_params.one_focal, False

    with stage("calib/ba"):
        result = calib_camera(
            board,
            batch,
            final_model,
            xy_same_focal=one_focal,
            disabled_distortions=calib_params.disabled_distortion_num,
            fixed_focal=fixed_focal,
        )
    if result is None:
        return None
    # Sanity gate (improvement over the reference, which only retries on
    # solver failure): a "converged" solution with huge reprojection error
    # usually means the init was degenerate — report failure so the retry
    # ladder picks new frames instead of shipping garbage.  The gated
    # result is still attached so the caller can fall back to the best
    # attempt when every retry fails (e.g. the requested model simply
    # cannot fit the data — pinned distortion on a fisheye).
    from .validate import reprojection_errors

    model, rtvecs = result
    with stage("calib/sanity-gate"):
        per_frame = reprojection_errors(board, batch, model, rtvecs)
    if per_frame:
        errs = np.concatenate([e for _, e, _ in per_frame])
        med = float(np.median(errs))
        if med > 2.0:
            log.warning("calibration sanity check failed (median %.2f px)", med)
            init_and_calibrate_one_camera.last_gated = (med, result)
            return None
    return result


init_and_calibrate_one_camera.last_gated = None
init_and_calibrate_one_camera.last_init_frames = None


def calibrate_camera_with_retries(
    board: Board,
    batch: FrameBatch,
    target_model: GenericModel,
    calib_params: CalibParams,
    key,
    seed: int = 0,
) -> Tuple[GenericModel, Dict[int, RvecTvec]]:
    """<=3 trials; retries pick random init frames
    (bin/camera_calibration.rs:217-242).

    If every trial is rejected only by the reprojection sanity gate (the
    solve converged but the requested model cannot represent the data,
    e.g. pinned distortion on a fisheye), the best gated attempt is
    returned with a warning — matching the reference's behavior of
    emitting the result and letting report.txt carry the bad numbers.
    Raises only when no trial produced a solution at all."""
    rng = np.random.default_rng(seed)
    best_gated = None
    for trial in range(MAX_TRIALS):
        with cpu_scope():
            key, sub = jax.random.split(key)
        init_and_calibrate_one_camera.last_gated = None
        result = init_and_calibrate_one_camera(
            board, batch, target_model, calib_params, sub,
            random_pick_two_frames=trial > 0, rng=rng,
        )
        if result is not None:
            return result
        gated = init_and_calibrate_one_camera.last_gated
        if gated is not None and (best_gated is None or gated[0] < best_gated[0]):
            # remember the trial's init frames with the attempt: a later
            # trial overwrites last_init_frames, and the keyframe markers
            # (cli.py log_keyframes) must describe the attempt actually
            # returned, not the last one tried
            best_gated = gated + (
                init_and_calibrate_one_camera.last_init_frames,
            )
    if best_gated is not None:
        log.warning(
            "all %d trials failed the sanity gate; returning the best "
            "attempt (median %.2f px) — the chosen model/options likely "
            "cannot represent this camera",
            MAX_TRIALS, best_gated[0],
        )
        init_and_calibrate_one_camera.last_init_frames = best_gated[2]
        return best_gated[1]
    raise RuntimeError(f"Failed to calibrate camera after {MAX_TRIALS} trials")
