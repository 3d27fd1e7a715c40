"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes a backend, so this executes at
conftest import time (pytest loads conftest before test modules).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start (overriding JAX_PLATFORMS env), which would silently route every
# "CPU" test through the remote TPU tunnel — slow and bf16-matmul-precision.
# Re-force CPU before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
