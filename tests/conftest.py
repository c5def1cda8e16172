"""Test config: run JAX on CPU with 8 virtual devices so sharding/mesh tests
need no TPU (the TPU-native analog of a fake multi-node backend)."""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# The env var alone can be overridden by platform plugins (axon); force it.
jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# The PyTorch reference implementation (read-only) is used as the parity
# oracle with RANDOM weights — no network/checkpoints needed.
REFERENCE = "/root/reference"
if os.path.isdir(REFERENCE) and REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running parity test")


def has_reference():
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="PyTorch reference repo not available")
