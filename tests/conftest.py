"""Test fixture: an 8-device CPU mesh in one process.

The reference tests boot a real local cluster of worker processes
(reference: ``spartan/tests/test_common.py`` ``ClusterTest`` — SURVEY.md
§4).  The SPMD analogue is ``--xla_force_host_platform_device_count=8``: 8
XLA CPU devices in one process with real NamedSharding/collective
semantics.  float64 is enabled for NumPy-parity oracles (the reference
accumulates reductions in f64).
"""

import os

# Must be set before the XLA CPU client is created.
_flag = "--xla_force_host_platform_device_count=8"
if _flag not in os.environ.get("XLA_FLAGS", ""):
  os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") + " " + _flag).strip()

import jax

# The axon sitecustomize force-selects the TPU platform; tests run on the
# virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest

import spartan_tpu
from spartan_tpu.core import mesh as mesh_mod


@pytest.fixture(scope="session", autouse=True)
def cluster():
  """Session-wide default mesh over the 8 virtual CPU devices."""
  assert len(jax.devices()) == 8, (
      "expected 8 virtual CPU devices; XLA_FLAGS was applied too late")
  # Tests use small arrays as stand-ins for big ones: disable the
  # replicate-small-arrays default so sharded-path semantics (collectives,
  # SPMD lowering) stay exercised.  Dedicated tests re-enable it.
  from spartan_tpu.config import FLAGS
  FLAGS.replicate_small_bytes = 0
  m = mesh_mod.make_mesh((2, 4), ("x", "y"))
  mesh_mod.set_default_mesh(m)
  yield m
  mesh_mod.set_default_mesh(None)


@pytest.fixture
def rng():
  return np.random.default_rng(42)
