"""Pallas threshold kernel equivalence vs the jnp reference (interpreter
mode on the CPU CI mesh; the same kernel compiles on TPU)."""

import numpy as np
import jax.numpy as jnp

from ccrs_tpu.detect.threshold import adaptive_threshold
from ccrs_tpu.ops.threshold_pallas import adaptive_threshold_pallas


def test_pallas_matches_reference_random():
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 64, 128), np.uint8)
    ref = np.asarray(adaptive_threshold(jnp.asarray(imgs), separate=False))
    got = np.asarray(adaptive_threshold_pallas(jnp.asarray(imgs), interpret=True))
    np.testing.assert_array_equal(got, ref)


def test_pallas_matches_reference_board():
    from ccrs_tpu.board import create_default_6x6_board
    from ccrs_tpu.detect import get_family
    from ccrs_tpu.models import GenericModel
    from ccrs_tpu.testdata import default_sequence_poses, render_board_image

    board = create_default_6x6_board()
    m = GenericModel("eucm", [190.9, 190.87, 254.94, 256.86, 0.628, 1.046], 512, 512)
    pose = default_sequence_poses(1, board, seed=1)[0]
    img = render_board_image(m, board, get_family("t36h11"), pose[:3], pose[3:])
    ref = np.asarray(adaptive_threshold(jnp.asarray(img[None]), separate=False))
    got = np.asarray(adaptive_threshold_pallas(jnp.asarray(img[None]), interpret=True))
    np.testing.assert_array_equal(got, ref)
