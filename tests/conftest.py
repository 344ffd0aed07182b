"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon sitecustomize force-registers the tunneled TPU backend and
# overrides JAX_PLATFORMS; undo that so tests run on the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_SCENES = pathlib.Path("/root/reference/Assets/Resources/Scenes")


@pytest.fixture(scope="session")
def reference_scene_dir():
    if not REFERENCE_SCENES.is_dir():
        pytest.skip("reference scenes not available")
    return REFERENCE_SCENES
