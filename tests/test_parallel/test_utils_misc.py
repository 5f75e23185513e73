"""Small utilities: mesh construction, profiler hook."""

import os

import jax
import numpy as np
import pytest

from pockit_tpu.parallel import instance_mesh
from pockit_tpu.utils import profile_trace


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_instance_mesh_shapes():
    mesh = instance_mesh()
    assert mesh.axis_names == ("dp", "ep")
    assert mesh.devices.size == len(jax.devices())
    mesh2 = instance_mesh(ep_size=4)
    assert mesh2.devices.shape == (len(jax.devices()) // 4, 4)
    with pytest.raises(ValueError, match="divisible"):
        instance_mesh(ep_size=3)


def test_profile_trace_writes(tmp_path):
    import jax.numpy as jnp

    log_dir = str(tmp_path / "trace")
    with profile_trace(log_dir):
        jnp.ones((8, 8)).sum().block_until_ready()
    # a plugins/profile/<run> directory must exist with at least one file
    found = []
    for root, _, files in os.walk(log_dir):
        found.extend(files)
    assert found
