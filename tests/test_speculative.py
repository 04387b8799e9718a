"""Speculative-calibration correctness: the warm-started final solve must
land on the same optimum as the cold solve (calib/pipeline.SpeculativeCalib
overlaps the detector's audit rounds; the warm start may only change the
LM iteration count, never the result beyond solver tolerance)."""

import numpy as np
import jax.random as jr

from ccrs_tpu.board import create_default_6x6_board
from ccrs_tpu.calib.frames import FrameBatch
from ccrs_tpu.calib.pipeline import (
    SpeculativeCalib,
    calibrate_camera_with_retries,
)
from ccrs_tpu.calib.single import calib_camera
from ccrs_tpu.detect import TagDetector, get_family
from ccrs_tpu.models import GenericModel, zeros_like_model
from ccrs_tpu.testdata import render_board_image, smooth_sequence_poses
from ccrs_tpu.types import CalibParams

GT = [190.9, 190.87, 254.94, 256.86, 0.628, 1.046]


def _render_seq(n):
    board = create_default_6x6_board()
    fam = get_family("t36h11")
    gt = GenericModel("eucm", GT, 512, 512)
    poses = smooth_sequence_poses(n, board, seed=3)
    imgs = np.stack(
        [
            render_board_image(gt, board, fam, p[:3], p[3:], noise=1.0, seed=f)
            for f, p in enumerate(poses)
        ]
    )
    return board, imgs


def test_warm_start_matches_cold_optimum():
    """calib_camera(warm_poses=cold solution) must reproduce the cold
    optimum (the warm blend with valid poses is the speculative final
    solve's exact code path)."""
    board, imgs = _render_seq(12)
    det = TagDetector("t36h11", track=False)
    dets = det.detect_batch(imgs, board=board)
    batch = FrameBatch.from_detections(
        dets, list(range(len(imgs))), board, 512, 512
    )
    model0 = GenericModel("eucm", [210.0, 210.0, 256.0, 256.0, 0.6, 1.0], 512, 512)
    cold = calib_camera(
        board, batch, model0, xy_same_focal=False,
        disabled_distortions=0, fixed_focal=False,
    )
    assert cold is not None
    model_c, rt_c = cold

    F = batch.p2d.shape[0]
    poses = np.zeros((F, 6))
    valid = np.zeros(F)
    for i, rt in rt_c.items():
        poses[i, :3], poses[i, 3:] = rt.rvec, rt.tvec
        # perturb: the speculative solution is NEAR the final optimum,
        # not exactly on it (audits correct a few frames)
        poses[i] += 1e-4 * np.sin(np.arange(6) + i)
        valid[i] = 1.0
    warm_model = model_c.copy()
    warm = calib_camera(
        board, batch, warm_model, xy_same_focal=False,
        disabled_distortions=0, fixed_focal=False,
        warm_poses=poses, warm_valid=valid,
    )
    assert warm is not None
    model_w, rt_w = warm
    np.testing.assert_allclose(model_w.params, model_c.params, atol=1e-6)
    for i in rt_c:
        np.testing.assert_allclose(
            rt_w[i].rvec, rt_c[i].rvec, atol=1e-6
        )


def test_speculative_pipeline_end_to_end():
    """Tracked detect with the on_provisional hook + warm-start retries
    must produce the same calibration as the cold pipeline."""
    board, imgs = _render_seq(24)
    times = list(range(len(imgs)))

    def run(speculate: bool):
        det = TagDetector("t36h11", track=True)
        spec = SpeculativeCalib(
            board, times, zeros_like_model("eucm"), CalibParams(),
            jr.PRNGKey(7), 512, 512,
        )
        if speculate:
            det.on_provisional = spec.on_provisional
        dets = det.detect_batch(imgs, board=board)
        batch = FrameBatch.from_detections(dets, times, board, 512, 512)
        return calibrate_camera_with_retries(
            board, batch, zeros_like_model("eucm"), CalibParams(),
            jr.PRNGKey(7), warm_provider=spec.take if speculate else None,
        )

    model_cold, _ = run(False)
    model_spec, _ = run(True)
    # same optimum within solver tolerance (not bitwise: different LM
    # trajectories); focal agreement to ~1e-4 px-equivalents
    np.testing.assert_allclose(
        model_spec.params, model_cold.params, rtol=1e-6, atol=1e-5
    )
    # and the speculation must actually have produced a warm start on a
    # clean tracked sequence (otherwise the test silently degenerates)
    spec_probe = SpeculativeCalib(
        board, times, zeros_like_model("eucm"), CalibParams(),
        jr.PRNGKey(7), 512, 512,
    )
    det = TagDetector("t36h11", track=True)
    det.on_provisional = spec_probe.on_provisional
    det.detect_batch(imgs, board=board)
    assert spec_probe.take() is not None
