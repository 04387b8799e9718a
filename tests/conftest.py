"""Test configuration: run everything on a hermetic 8-device virtual CPU mesh.

Real-TPU runs happen via bench.py / the driver; tests validate numerics and
the multi-chip sharding story on `--xla_force_host_platform_device_count=8`.

NOTE: this environment force-registers a remote-TPU ("axon") jax backend in
every interpreter via sitecustomize, ignoring JAX_PLATFORMS from the env.
`jax.config.update("jax_platforms", "cpu")` after import is the reliable
way to pin tests to the local CPU backend (otherwise every compile goes
through a ~30s remote-compile round trip and f64 gets TPU double-float
emulation precision).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
