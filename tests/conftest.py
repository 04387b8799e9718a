"""Test configuration: run everything on a hermetic 8-device virtual CPU mesh.

Real-TPU runs happen via bench.py / the driver; tests validate numerics and
the multi-chip sharding story on `--xla_force_host_platform_device_count=8`.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
