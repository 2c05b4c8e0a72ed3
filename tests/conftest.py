"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on host-platform virtual devices instead (the driver separately
dry-run-compiles the multi-chip path via __graft_entry__.dryrun_multichip).
"""

import os

# Environment gotcha: this machine's sitecustomize imports jax at interpreter
# startup and registers a remote-TPU ("axon") platform, so jax has already
# read JAX_PLATFORMS before any test code runs.  Setting the env var here is
# therefore too late — update jax's config directly (safe while no backend
# has been initialized yet, which sitecustomize doesn't do).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the CPU backend; a jax backend was initialized "
    "before conftest could redirect it")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="session")
def golden():
    """Load a golden fixture .npz by name."""

    def _load(name):
        path = os.path.join(GOLDEN_DIR, name)
        if not os.path.exists(path):
            pytest.skip(f"golden fixture {name} missing (run tools/gen_golden.py)")
        return np.load(path)

    return _load
