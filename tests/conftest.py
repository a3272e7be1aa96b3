"""Test configuration: force an 8-device virtual CPU mesh.

Must run before jax is imported anywhere. The image's sitecustomize registers
the 'axon' TPU platform whenever PALLAS_AXON_POOL_IPS is set, so we clear it
and pin JAX_PLATFORMS=cpu.
"""

import os

os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The image's sitecustomize imports jax at interpreter startup (to register the
# axon TPU plugin), so the env vars above may be read too late — pin the
# platform through the config API as well, before any backend is initialized.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def synthetic_scene():
    from adamvs_tpu.data.synthetic import make_scene

    return make_scene(num_views=4, height=96, width=128, seed=0)


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)
