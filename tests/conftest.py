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

# Tests used to share the repo's .xla_cache with real-TPU bench runs;
# concurrent / interrupted writers produced nondeterministic aborts and
# segfaults inside jax's persistent-cache read AND write paths (r03 pytest
# logs), and running fully uncached pushes the suite past 10 min (the LM /
# wave-advance graphs are compile-heavy even on CPU).  Tests therefore keep
# a persistent cache but in their OWN directory, never shared with the
# TPU-backend cache.  Must be set before ccrs_tpu is imported (it reads the
# env var at import time).
os.environ.setdefault(
    "CCRS_XLA_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".xla_cache_cpu"),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# ROOT CAUSE of the late-suite "jaxlib serialize/deserialize/compile crashes"
# (previously misattributed to a jaxlib (de)serialization bug): mmap
# exhaustion.  Every XLA:CPU JIT-compiled function is loaded as its own
# (r-xp, r--p, rw-p) triplet of small anonymous maps and is NEVER unmapped
# (jax.clear_caches() frees Python refs but not the code pages — measured).
# The full suite compiles enough graph-internal functions to push the
# process past the kernel default vm.max_map_count=65530 (~64.7k maps
# observed at death); the crash then surfaces in whatever allocates next —
# executable serialize, cache deserialize, or backend_compile itself, which
# is why the crash site wandered between runs.  Fix: raise the limit (root
# in this image).  The persistent-cache bypass below stays as a
# defense-in-depth fallback for non-root environments, since cached COLD
# runs (everything deserialized) map fewer functions than compile+serialize
# paths do.
_limit_raised = False
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _limit = int(_f.read())
    if _limit < 262144:
        with open("/proc/sys/vm/max_map_count", "w") as _f:
            _f.write("262144")
        _limit_raised = True
    else:
        _limit_raised = True  # already high enough
except (OSError, PermissionError):
    pass  # not root: the cache bypass below keeps the map count lower


# Defense-in-depth for environments where the limit can't be raised: from
# the late compile-heavy files on, bypass the persistent compilation cache
# (serialize/deserialize each add transient map pressure right at the peak;
# in-memory jit caches still apply and most late tests reuse earlier graphs,
# so a cold-cache run only pays a few extra minutes).
_CACHE_CUTOFF_FILES = ("test_speculative", "test_stressors", "test_track")
_cache_bypassed = False


def pytest_runtest_setup(item):
    global _cache_bypassed
    if _cache_bypassed or _limit_raised:
        return
    base = item.fspath.purebasename if hasattr(item, "fspath") else ""
    if any(base.startswith(p) for p in _CACHE_CUTOFF_FILES):
        from jax._src import compiler as _compiler

        _compiler._cache_read = lambda *a, **k: (None, None)
        _compiler._cache_write = lambda *a, **k: None
        _cache_bypassed = True
