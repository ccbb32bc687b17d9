"""Test config: run all tests on a virtual 8-device CPU mesh.

Env vars must be set before jax initializes its backends; pytest imports
conftest before collecting test modules, so this is the right place.
"""

import os

# hard override: the image presets JAX_PLATFORMS=axon (the TPU tunnel);
# tests must be hermetic on the virtual 8-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon TPU plugin overrides the JAX_PLATFORMS env var; the config update
# (before any backend init) wins
jax.config.update("jax_platforms", "cpu")

# persistent compile cache: repeated suite runs skip XLA recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_lt")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from lidar_transfer_tpu.config import HDL64, SensorSpec  # noqa: E402
from lidar_transfer_tpu.datasets import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def scene():
    return synthetic.Scene.default()


@pytest.fixture(scope="session")
def small_spec():
    """A small sensor for fast tests: 16 beams x 256 columns."""
    return SensorSpec(name="test16", beams=16, fov_up=8.0, fov_down=-22.0,
                      angle_res_hor=360.0 / 256.0)


@pytest.fixture(scope="session")
def mid_spec():
    """Mid-size sensor: 32 x 512."""
    return SensorSpec(name="test32", beams=32, fov_up=5.0, fov_down=-24.0,
                      angle_res_hor=360.0 / 512.0)


@pytest.fixture(scope="session")
def synthetic_dataset(tmp_path_factory, scene, small_spec):
    """A 5-scan synthetic KITTI tree (minimal.zip stand-in)."""
    root = tmp_path_factory.mktemp("synth_kitti")
    return synthetic.write_kitti_dataset(str(root), scene, small_spec,
                                         n_scans=5)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)
