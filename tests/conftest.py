# Tests must run on CPU with 8 virtual devices so multi-chip sharding paths
# (shard_map / pjit over a Mesh) are exercised without real TPUs.
#
# NOTE: this environment registers a TPU PJRT plugin via sitecustomize at
# interpreter startup (jax is already imported and jax_platforms forced to
# "axon,cpu" before conftest runs), so setting JAX_PLATFORMS here is too
# late — we must update the live config instead, before any backend is
# initialized by a computation.
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: pipeline stages are compile-heavy; reruns
# of the suite should not repay XLA compilation.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()
