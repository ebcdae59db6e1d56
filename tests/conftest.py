"""Test harness: force an 8-device virtual CPU platform before JAX import so
multi-chip sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# In the axon environment a sitecustomize hook imports jax at interpreter
# start with JAX_PLATFORMS=axon already baked in, so the env var alone cannot
# repin the platform — update the live config before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", "tests must run on the CPU platform"
assert len(jax.devices()) == 8, "expected the 8-device virtual CPU mesh"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402

REFERENCE_SRC = "/root/reference/src"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SRC)


@pytest.fixture(scope="session")
def torch_reference():
    """Import the torch reference implementation if present; otherwise skip.

    Differential tests against the upstream PyTorch code run only where the
    reference checkout exists (development environment); structural and
    oracle-based tests cover the same ground standalone.
    """
    if not reference_available():
        pytest.skip("torch reference not available")
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    torch = pytest.importorskip("torch")
    return torch
