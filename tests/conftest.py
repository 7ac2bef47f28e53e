"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware. NOTE: in this environment the `axon` TPU
plugin overrides the JAX_PLATFORMS env var, so the platform must be forced
via jax.config BEFORE first backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402

# Modules dominated by compile-heavy E2E/workspace/training paths. Marked
# `slow` wholesale so `pytest -m "not slow"` gives a ~3-min inner loop while
# the full suite stays ~30 min on CPU (run "not slow" before committing; the
# full suite before shipping).
SLOW_TEST_MODULES = {
    "test_determinism",
    "test_cached_inference",
    "test_extras",
    "test_fused_inference",
    "test_fused_train",
    "test_kitchen_oracle",
    "test_models",
    "test_pallas_ops",
    "test_parallel",
    "test_parallel_sampling",
    "test_pretrain",
    "test_reference_parity",
    "test_rollout",
    "test_sharded_rollout",
    "test_studies",
    "test_sweep",
    "test_train",
    "test_video_metrics",
    "test_vision_policy",
    "test_workspaces",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SLOW_TEST_MODULES:
            item.add_marker(pytest.mark.slow)
