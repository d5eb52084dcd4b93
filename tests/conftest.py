"""Test harness: force an 8-device virtual CPU mesh.

The axon TPU plugin force-registers itself via sitecustomize before pytest
starts, so `JAX_PLATFORMS=cpu` in the environment is not enough — we override
the platform through jax.config before any backend is initialized.  Set
``TID_TEST_TPU=1`` to run the suite on the real chip instead.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

if not os.environ.get("TID_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

# Repo root on sys.path so `import tml_image_editing_defense_tpu` works
# without installation.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
