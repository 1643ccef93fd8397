"""Test harness: force JAX onto a virtual 8-device CPU mesh and enable x64.

Multi-chip sharding is validated on this virtual mesh (real hardware has one
chip); numeric golden tests use float64 on CPU.  Production code is dtype-
preserving, so the same functions run float32 on TPU.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_ENABLE_X64"] = "1"

# The hosted TPU plugin overrides JAX_PLATFORMS at import time; force it back
# via the config API (must run before any backend is initialised).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: xdist workers compiling the same program
# share one XLA compile (first worker writes, the rest read), and repeated
# suite runs start warm — the suite is compile-bound on small CPU boxes.
import tempfile  # noqa: E402

_cache_dir = os.environ.get(
    "VPLINES_TEST_JAX_CACHE",
    os.path.join(tempfile.gettempdir(), "jax_cache_vplines_tests"),
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
