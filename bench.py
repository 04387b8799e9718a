#!/usr/bin/env python
"""Headline benchmark: end-to-end detect+calibrate throughput.

Measures the full pipeline (batched AprilGrid detection -> init -> LM
bundle adjustment -> validation) on a TUM-VI-like synthetic sequence
(512x512 EUCM fisheye, default 6x6 board, rendered with noise), since the
zero-egress environment cannot download the reference's TUM-VI acceptance
dataset (BASELINE.md).

Prints ONE JSON line:
  value        = frames/sec over the measured (post-warmup) run
  vs_baseline  = value / 267 fps, where 267 fps is the driver's
                 north-star "<2 s for the ~534-frame TUM-VI calib-cam1
                 sequence on one v5e" (BASELINE.json) — vs_baseline >= 1
                 means the north-star is met.

A correctness gate runs first: the recovered EUCM parameters must match
the ground truth (focal within 1%, median reprojection < 0.3 px), so the
number can't be gamed by skipping work.
"""

import contextlib
import io
import json
import os
import sys
import time

import numpy as np

N_FRAMES = int(os.environ.get("BENCH_FRAMES", "128"))
NORTH_STAR_FPS = 534 / 2.0


def run():
    import jax
    import jax.random as jr

    from ccrs_tpu.utils import profiling

    from ccrs_tpu.board import create_default_6x6_board
    from ccrs_tpu.calib import init_and_calibrate_one_camera, validation
    from ccrs_tpu.calib.frames import FrameBatch
    from ccrs_tpu.detect import TagDetector, get_family
    from ccrs_tpu.models import GenericModel, zeros_like_model
    from ccrs_tpu.testdata import (
        default_sequence_poses,
        render_board_image,
        render_frames_device,
    )
    from ccrs_tpu.types import CalibParams

    board = create_default_6x6_board()
    fam = get_family("t36h11")
    gt = GenericModel("eucm", [190.9, 190.87, 254.94, 256.86, 0.628, 1.046], 512, 512)

    print(f"rendering {N_FRAMES} frames...", file=sys.stderr)
    poses = default_sequence_poses(N_FRAMES, board, seed=11)
    # device-resident frames: rendered on device and never downloaded — the
    # detect stage's only link traffic is thresholded bitmaps + uint8 corner
    # patches (the tunnel link, not the TPU, is this benchmark's bottleneck)
    imgs, dev_imgs = None, None
    if os.environ.get("BENCH_HOST_IMAGES", "") != "1":
        try:
            dev_imgs = render_frames_device(gt, board, fam, poses, noise=1.5, seed=11)
            dev_imgs.block_until_ready()
        except Exception as e:  # pragma: no cover - defensive
            print(f"device render failed ({e!r}); using host path", file=sys.stderr)
            dev_imgs = None

    def render_host():
        return np.stack(
            [
                render_board_image(gt, board, fam, p[:3], p[3:], noise=1.5, seed=f)
                for f, p in enumerate(poses)
            ]
        )

    if dev_imgs is None:
        imgs = render_host()
    detector = TagDetector("t36h11")
    times = list(range(N_FRAMES))

    def pipeline(key):
        dets = detector.detect_batch(imgs, board=board, dev_images=dev_imgs)
        batch = FrameBatch.from_detections(dets, times, board, 512, 512)
        result = init_and_calibrate_one_camera(
            board, batch, zeros_like_model("eucm"), CalibParams(), key
        )
        assert result is not None, "calibration failed"
        return batch, result

    # warmup: populate all jit caches (detector graphs, RANSAC, PnP, BA)
    print("warmup run (compiles)...", file=sys.stderr)
    t0 = time.perf_counter()
    try:
        batch, (model, rtvecs) = pipeline(jr.PRNGKey(0))
    except Exception as e:
        if dev_imgs is None:
            raise
        # device-resident detect failed — fall back to the host-image path
        print(f"device-resident path failed ({e!r}); falling back", file=sys.stderr)
        imgs, dev_imgs = render_host(), None
        t0 = time.perf_counter()
        batch, (model, rtvecs) = pipeline(jr.PRNGKey(0))
    warm = time.perf_counter() - t0
    print(f"warmup: {warm:.1f}s", file=sys.stderr)

    # timed runs: best of 3 (the remote-TPU link has high latency variance)
    profiling.enable()
    elapsed = float("inf")
    stages = {}
    for rep in range(3):
        profiling.reset()
        t0 = time.perf_counter()
        batch, (model, rtvecs) = pipeline(jr.PRNGKey(1))
        dt = time.perf_counter() - t0
        print(f"timed run {rep}: {dt:.2f}s", file=sys.stderr)
        if dt < elapsed:
            elapsed = dt
            stages = profiling.totals()
    profiling.reset()
    for name in sorted(stages, key=lambda k: -stages[k]):
        print(f"  stage {name:24s} {stages[name]:7.3f}s", file=sys.stderr)

    # correctness gate
    with contextlib.redirect_stdout(sys.stderr):
        avg99, median = validation(board, batch, model, rtvecs)
    focal_err = abs(model.params[0] - gt.params[0]) / gt.params[0]
    assert focal_err < 0.01, f"focal off by {focal_err:.2%}"
    assert median < 0.3, f"median reprojection {median:.3f} px"
    print(
        f"gate ok: focal err {focal_err:.2%}, median {median:.4f} px",
        file=sys.stderr,
    )

    fps = N_FRAMES / elapsed
    return {
        "metric": "end-to-end detect+calibrate throughput (512x512 EUCM AprilGrid, TUM-VI-like synthetic)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 4),
        "warmup_sec": round(warm, 1),
        "stages_sec": {k: round(v, 3) for k, v in sorted(stages.items())},
    }


if __name__ == "__main__":
    result = run()
    print(json.dumps(result))
