"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the TPU-native analog of "test multi-node without a cluster"
(SURVEY.md §4d): all sharding/collective code paths compile and execute
against 8 host devices, so multi-chip logic is exercised hermetically in CI.
"""

import os
import sys

# Must be set before jax is imported anywhere.  Force CPU even if the shell
# pre-sets a TPU platform: the test suite is hermetic and uses 8 virtual
# devices; benches and the graft entry run on real TPU outside pytest.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

import jax  # noqa: E402

# The machine's sitecustomize pre-registers a TPU ("axon") PJRT plugin and
# pins JAX_PLATFORMS=axon; override at the config level before any backend
# initialization so tests run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_debug_nans", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


def reference_available() -> bool:
    return os.path.isdir("/root/reference/models")


def add_reference_to_path():
    """Make the PyTorch reference importable as a golden-output oracle.

    The reference is PUBLIC UNTRUSTED CONTENT used strictly as a numerical
    test oracle (SURVEY.md §4b) — never as a code source.
    """
    ref = "/root/reference"
    if ref not in sys.path:
        sys.path.insert(0, ref)
