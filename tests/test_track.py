"""Tracking fast-path tests: recall parity with the cold detector.

The video fast path (ccrs_tpu/detect/track.py) must never silently drop a
tag the cold pipeline would find — the fallback trigger policy re-runs the
cold pipeline on any suspect frame, so per-frame detections are a superset
of the cold detector's (VERDICT round-2 item #1's "done" criterion)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ccrs_tpu.board import create_default_6x6_board
from ccrs_tpu.detect import TagDetector, get_family
from ccrs_tpu.models import GenericModel
from ccrs_tpu.testdata import (
    render_board_image,
    smooth_sequence_poses,
)


@pytest.fixture(scope="module")
def video():
    """A 14-frame smooth synthetic sequence (512x512 EUCM fisheye)."""
    board = create_default_6x6_board()
    fam = get_family("t36h11")
    model = GenericModel(
        "eucm", [190.9, 190.87, 254.94, 256.86, 0.628, 1.046], 512, 512
    )
    poses = smooth_sequence_poses(14, board, seed=3, keyframe_every=6)
    imgs = np.stack(
        [
            render_board_image(model, board, fam, p[:3], p[3:], noise=1.5, seed=f)
            for f, p in enumerate(poses)
        ]
    )
    return board, imgs


def test_track_recall_superset(video):
    """Per frame, tracked detections >= cold detections (same tags, and
    matching corners for the shared ones)."""
    board, imgs = video
    cold = TagDetector("t36h11", track=False).detect_batch(imgs, board=board)
    trk = TagDetector("t36h11", track=True).detect_batch(imgs, board=board)
    assert len(cold) == len(trk) == imgs.shape[0]
    for f, (c, t) in enumerate(zip(cold, trk)):
        missing = set(c) - set(t)
        assert not missing, f"frame {f}: tracking dropped tags {missing}"
        for tid in c:
            # both paths refine on the same image; sub-0.1 px agreement
            np.testing.assert_allclose(t[tid], c[tid], atol=0.1)


def test_track_steady_state_uses_fast_path(video):
    """On smooth video the cold fallback should fire only on cadence
    frames — the fast path must actually be exercised."""
    from ccrs_tpu.utils import profiling

    board, imgs = video
    det = TagDetector("t36h11", track=True)
    det.cold_every = 8
    profiling.enable()
    profiling.reset()
    res = det.detect_batch(imgs, board=board)
    totals = profiling.totals()
    cold_groups = profiling._counts.get("detect/quadproc", 99)
    profiling.reset()
    profiling._ENABLED = False
    assert "detect/track" in totals
    # the cold pipeline may run only a handful of fallback groups (seed +
    # cadence + occasional audit triggers), not once per frame
    assert cold_groups <= 4, f"cold pipeline ran {cold_groups} times"
    assert all(len(r) >= 20 for r in res)


def test_track_discontinuous_falls_back(video):
    """A shuffled (non-video) sequence must still match the cold detector
    exactly — every frame fails the trigger audit and re-runs cold."""
    board, imgs = video
    order = [5, 0, 9, 2, 12, 7]
    shuffled = imgs[order]
    cold = TagDetector("t36h11", track=False).detect_batch(shuffled, board=board)
    trk = TagDetector("t36h11", track=True).detect_batch(shuffled, board=board)
    for f, (c, t) in enumerate(zip(cold, trk)):
        assert set(c) <= set(t), f"frame {f}: lost {set(c) - set(t)}"


def test_track_carry_across_calls(video):
    """detect_batch called chunk-wise (like the dataloader) keeps the
    carry and stays consistent with one whole-batch call."""
    board, imgs = video
    det = TagDetector("t36h11", track=True)
    whole = det.detect_batch(imgs, board=board)
    det2 = TagDetector("t36h11", track=True)
    parts = det2.detect_batch(imgs[:7], board=board) + det2.detect_batch(
        imgs[7:], board=board
    )
    for f, (a, b) in enumerate(zip(whole, parts)):
        assert set(a) == set(b), f"frame {f}"
        for tid in a:
            np.testing.assert_allclose(a[tid], b[tid], atol=0.1)


def test_track_chunk_graph_direct():
    """Unit-level: track_chunk decodes tags from an exact-prediction seed
    and reports out-of-bounds predictions as not-attempted."""
    from ccrs_tpu.detect.track import detections_to_arrays, track_chunk

    board = create_default_6x6_board()
    fam = get_family("t36h11")
    model = GenericModel(
        "eucm", [190.9, 190.87, 254.94, 256.86, 0.628, 1.046], 512, 512
    )
    poses = smooth_sequence_poses(3, board, seed=5, keyframe_every=16)
    imgs = np.stack(
        [
            render_board_image(model, board, fam, p[:3], p[3:], noise=1.0, seed=f)
            for f, p in enumerate(poses)
        ]
    )
    cold = TagDetector("t36h11", track=False).detect_batch(
        imgs[:1], board=board
    )[0]
    assert len(cold) >= 20
    c1, v1 = detections_to_arrays(cold, board)
    n = board.n_tags
    bxy = jnp.asarray(board.p3d.reshape(n, 4, 3)[:, :, :2].astype(np.float32))
    cor, acc, att = track_chunk(
        fam, jnp.asarray(imgs), bxy, jnp.asarray(np.int32(board.config.first_id)),
        jnp.asarray(c1), jnp.zeros(n, bool), jnp.asarray(c1), jnp.asarray(v1),
    )
    acc = np.asarray(acc)
    att = np.asarray(att)
    # frame 0 re-decodes its own seed; later frames track the small motion
    assert acc[0].sum() >= len(cold) - 1
    assert acc[1].sum() >= len(cold) - 2
    assert (acc <= att).all()
