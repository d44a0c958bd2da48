"""Test configuration: CPU backend with a virtual 8-device mesh and x64.

Mirrors the project test strategy (SURVEY.md section 4): numerics are
validated on CPU in float64; multi-chip sharding is validated on a virtual
8-device CPU mesh via --xla_force_host_platform_device_count.

Environment note: in this image jax is preloaded at interpreter startup
with the axon TPU plugin as the default backend, and JAX_PLATFORMS set
after startup is ignored. Tests therefore pin the *default device* to the
CPU backend (which coexists with the TPU one) -- this keeps the suite
hermetic, avoids contending for the single-client TPU tunnel, and compiles
~6x faster. TPU execution is exercised by bench.py and the driver.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
try:
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
except RuntimeError:
    pass  # no cpu backend (unexpected); run wherever the default is
# Persistent compilation cache: the GI while-loop body is a large XLA
# computation; caching makes test reruns fast.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
