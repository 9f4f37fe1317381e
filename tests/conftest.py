"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4c).

Must run before jax is imported anywhere in the test process.
"""

import os

# Force-override: the ambient environment pins JAX to the TPU tunnel (axon
# PJRT plugin registered via sitecustomize); tests must run on the
# virtual-device CPU backend. The env var alone is not enough — the plugin
# re-pins the platform — so also update jax.config before any backend use.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from evoworld_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import pytest  # noqa: E402

# Modules dominated by torch-twin golden runs or end-to-end loops; the whole
# suite is ~40 min on this single-core host, the default tier must stay
# under 10 (CLAUDE.md). Run everything with `pytest tests/ -q`; skip the
# heavy tier with `pytest tests/ -q -m "not slow"`.
_SLOW_MODULES = {
    "test_torch_unet_parity",
    "test_torch_vae_parity",
    "test_torch_block_parity",
    "test_trainer_loop",
    "test_integration",
    "test_cli_entry",
    "test_i3d_parity",
    "test_dino_parity",
    "test_dreamsim",
    "test_memory_loop",
    "test_vggt",
    "test_vggt_convert",
    "test_sharding",
    "test_skyseg",
    "test_vggt_head_parity",
    "test_eval_harness",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__.split(".")[-1] in _SLOW_MODULES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def example_episode():
    """Path to the reference's shipped example episode (read-only fixture)."""
    path = "/root/reference/example/case_000"
    if not os.path.isdir(path):
        pytest.skip("reference example episode not available")
    return path
