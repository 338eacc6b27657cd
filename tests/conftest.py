"""Test harness config: force CPU with an 8-device virtual mesh and enable
x64 so DP parity tests run anywhere (the driver benches on real TPU
separately). Must run before any jax computation; note the environment's
axon site hook re-sets JAX_PLATFORMS, so we use jax.config directly."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Single-vCPU environment: persistent compilation cache makes repeat test
# runs pay jit compile once, not every invocation (the full tier is
# minutes of XLA:CPU compile otherwise).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
