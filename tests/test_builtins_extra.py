"""NumPy-parity coverage for the r1-late builtin additions."""

import numpy as np
import pytest

import spartan_tpu as sp


def test_fmod_inner_isclose(rng, cluster):
  a, b = rng.standard_normal(16), rng.standard_normal(16) + 2.0
  np.testing.assert_allclose(sp.fmod(sp.from_numpy(a), sp.from_numpy(b)).glom(),
                             np.fmod(a, b), rtol=1e-12)
  np.testing.assert_allclose(sp.inner(sp.from_numpy(a), sp.from_numpy(b)).glom(),
                             np.inner(a, b), rtol=1e-12)
  c = a + 1e-9
  np.testing.assert_array_equal(
      sp.isclose(sp.from_numpy(a), sp.from_numpy(c)).glom(),
      np.isclose(a, c))


def test_repeat_flip_roll(rng, cluster):
  a = rng.standard_normal((4, 6))
  np.testing.assert_array_equal(sp.repeat(sp.from_numpy(a), 3, axis=1).glom(),
                                np.repeat(a, 3, axis=1))
  np.testing.assert_array_equal(sp.flip(sp.from_numpy(a), axis=0).glom(),
                                np.flip(a, axis=0))
  np.testing.assert_array_equal(sp.roll(sp.from_numpy(a), 2, axis=1).glom(),
                                np.roll(a, 2, axis=1))


def test_logspace_meshgrid(cluster):
  np.testing.assert_allclose(sp.logspace(0, 3, 7).glom(),
                             np.logspace(0, 3, 7), rtol=1e-12)
  gx, gy = sp.meshgrid(np.arange(3.0), np.arange(4.0))
  nx, ny = np.meshgrid(np.arange(3.0), np.arange(4.0))
  np.testing.assert_array_equal(gx.glom(), nx)
  np.testing.assert_array_equal(gy.glom(), ny)


def test_split_matches_numpy(rng, cluster):
  a = rng.standard_normal((12, 4))
  for got, want in zip(sp.split(sp.from_numpy(a), 3),
                       np.split(a, 3)):
    np.testing.assert_array_equal(got.glom(), want)
  for got, want in zip(sp.split(sp.from_numpy(a), [2, 5], axis=0),
                       np.split(a, [2, 5], axis=0)):
    np.testing.assert_array_equal(got.glom(), want)
  with pytest.raises(ValueError):
    sp.split(sp.from_numpy(a), 5)
