"""ccrs_tpu — a TPU-native (JAX/XLA/Pallas) camera intrinsic calibration framework.

A from-scratch rebuild of the capabilities of
``powei-lin/camera-intrinsic-calibration-rs`` (the ``ccrs`` CLI), designed
TPU-first:

- the six camera models (UCM/EUCM/EUCMT/KB4/OPENCV5/FTHETA) are pure-JAX
  ``project``/``unproject`` functions, vmapped over points and frames
  (``ccrs_tpu.models``);
- the AprilGrid detector is a batched pipeline: Pallas/XLA image front-end,
  a small native C++ stage for the irregular quad extraction, and batched
  JAX decode + subpixel refinement (``ccrs_tpu.detect``);
- the bundle-adjustment solver is an on-device Levenberg–Marquardt with a
  ``lax.while_loop`` damping schedule, Huber IRLS weights, box bounds, and a
  Schur-complement solve over the intrinsics/pose block structure
  (``ccrs_tpu.solve``);
- RANSAC radial-distortion-homography initialization and SQPnP run fully
  batched under ``jit`` (``ccrs_tpu.solve.homography``, ``ccrs_tpu.solve.pnp``);
- multi-device scaling shards the frame batch over a ``jax.sharding.Mesh``
  with ``psum`` reductions of the normal equations (``ccrs_tpu.parallel``).

Dataset layouts, board/model JSON schemas and output artifacts are kept
interchangeable with the Rust reference.
"""

import os as _os

import jax

# The calibration core targets <=1e-6 px agreement with the f64 reference
# solver; enable x64 globally and keep image-path dtypes explicitly f32.
jax.config.update("jax_enable_x64", True)

# TPU f32 matmuls default to ONE bf16 MXU pass (~0.4% relative error) —
# measured to warp the f32 renderer by ~2 px and to corrupt the tracking
# homography fits, while CPU runs were exact (r03).  Geometry matmuls here
# are tiny (3x3 poses, 8x8 normal equations), so force true-f32 everywhere
# and opt back into bf16 only where it is exact (the +-1 code-matching
# matmul in detect/decode.py, the one genuinely MXU-bound op).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent XLA compilation cache: the pipeline compiles ~a dozen graphs
# (threshold/decode/refine/RANSAC/PnP/BA variants); on the remote-compile
# TPU backend each costs ~30-90s, so caching across processes matters.
_cache_dir = _os.environ.get(
    "CCRS_XLA_CACHE",
    _os.path.join(_os.path.dirname(_os.path.dirname(__file__)), ".xla_cache"),
)
try:  # pragma: no cover - best effort
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

__version__ = "0.1.0"
