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


# ---------------------------------------------------------------------------
# Test tiers: `pytest -q` runs the quick tier (< ~5 min); the multi-minute
# accuracy/runner fixtures are marked `slow` and need --runslow (or -m slow).
# Full-suite runtime with --runslow is ~15 min (documented in CLAUDE.md).
# ---------------------------------------------------------------------------
import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption("--runslow", action="store_true", default=False,
                     help="also run tests marked slow")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or config.getoption("-m"):
        return
    skip_slow = pytest.mark.skip(reason="slow tier: use --runslow / -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip_slow)
