"""Test env: force a pure-CPU JAX backend with 8 virtual devices so unit and
sharding tests run fast anywhere (the driver benches on real TPU separately).

This environment pre-registers a tunneled TPU backend via sitecustomize, so
JAX_PLATFORMS from the environment is not enough — override the config before
any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_scene():
    """A 32^3 sphere-in-cube scene with a simple material, shared by tests."""
    from vpt_tpu.scene.volume import Volume
    from vpt_tpu.utils.config import LightConfig, MaterialTF, SpectrumConfig

    volume = Volume.sphere_in_cube(32)
    material = MaterialTF.constant(albedo=0.8, alpha=0.9, anisotropy_g=0.3)
    light = LightConfig(direction=(1.0, 0.5, 0.2))
    spectrum = SpectrumConfig()
    return dict(volume=volume, material=material, light=light, spectrum=spectrum)
