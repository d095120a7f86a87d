"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU analog of the reference's "mpirun -np 4 on localhost"
multi-node-without-a-cluster strategy (reference test/run_inference_parallel.sh):
sharding/collective code paths are exercised on 8 virtual CPU devices.
Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# A sitecustomize hook in this image force-registers the experimental TPU
# plugin and overrides JAX_PLATFORMS; pin the config back to CPU so the
# virtual 8-device mesh is what tests actually run on.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_FITS = "/root/reference/test/galaxy0001.fits"


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def galaxy_fits_path():
    if not os.path.exists(REFERENCE_FITS):
        pytest.skip("reference galaxy0001.fits not available")
    return REFERENCE_FITS
