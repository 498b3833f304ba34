"""Scatter-with-combiner (the shuffle escape hatch) + map_with_location
(reference: shuffle users — transpose/sort/pagerank scatters; SURVEY.md
§2.1)."""

import jax.numpy as jnp
import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.util import Assert


def test_scatter_add_histogram(rng):
  vals = rng.integers(0, 10, (100,))
  sv = sp.from_numpy(vals)

  def emit(x, coords):
    return (x,), jnp.ones_like(x, dtype=jnp.float64)

  got = sp.shuffle(sv, emit, target_shape=(10,), reducer=np.add)
  want = np.bincount(vals, minlength=10).astype(np.float64)
  Assert.all_eq(got, want)


def test_scatter_max(rng):
  vals = rng.standard_normal((64,))
  buckets = rng.integers(0, 8, (64,))
  sv, sb = sp.from_numpy(vals), sp.from_numpy(buckets)

  def emit(v, b, coords):
    return (b,), v

  got = sp.shuffle([sv, sb], emit, target_shape=(8,), reducer=np.maximum,
                   init=-np.inf).glom()
  want = np.full(8, -np.inf)
  np.maximum.at(want, buckets, vals)
  np.testing.assert_allclose(got, want, atol=1e-12)


def test_scatter_centroid_update(rng):
  """The k-means scatter-add pattern (SURVEY.md §3.5)."""
  pts = rng.standard_normal((40, 3))
  labels = rng.integers(0, 4, (40,))
  spts, slab = sp.from_numpy(pts), sp.from_numpy(labels)

  def emit(p, l, coords):
    rows = jnp.broadcast_to(l[:, None], p.shape)
    return (rows, coords[1]), p

  got = sp.shuffle([spts, slab], emit, target_shape=(4, 3), reducer=np.add)
  want = np.zeros((4, 3))
  np.add.at(want, labels, pts)
  Assert.all_close(got, want, rtol=1e-12)


def test_transpose_via_shuffle(rng):
  """Transpose expressed as a scatter — the reference's shuffle use."""
  a = rng.standard_normal((6, 9))
  sa = sp.from_numpy(a)

  def emit(x, coords):
    return (coords[1], coords[0]), x

  got = sp.shuffle(sa, emit, target_shape=(9, 6), reducer=None)
  Assert.all_eq(got, a.T)


def test_map_with_location(rng):
  a = rng.standard_normal((8, 10))
  sa = sp.from_numpy(a)

  def fn(x, coords):
    return x + coords[0] * 100 + coords[1]

  got = sp.map_with_location(sa, fn)
  rows, cols = np.indices(a.shape)
  Assert.all_close(got, a + rows * 100 + cols, rtol=1e-13)


def test_scatter_into_reduce_fusion(rng):
  """Shuffle output feeding further lazy ops stays one region."""
  vals = rng.integers(0, 5, (50,))
  sv = sp.from_numpy(vals)

  def emit(x, coords):
    return (x,), jnp.ones_like(x, dtype=jnp.float64)

  total = sp.shuffle(sv, emit, target_shape=(5,), reducer=np.add).sum()
  assert total.glom() == 50.0


def test_shuffle_into_existing_target(rng):
  """Reference form: updates merged into an existing array."""
  base = rng.standard_normal((5, 3))
  vals = rng.standard_normal((20, 3))
  buckets = rng.integers(0, 5, 20)
  sb = sp.from_numpy(base)

  def emit(p, l, coords):
    rows = jnp.broadcast_to(l[:, None], p.shape)
    return (rows, coords[1]), p

  got = sp.shuffle([sp.from_numpy(vals), sp.from_numpy(buckets)], emit,
                   reducer=np.add, target=sb).glom()
  want = base.copy()
  np.add.at(want, buckets, vals)
  np.testing.assert_allclose(got, want, atol=1e-12)
  # functional: base untouched
  np.testing.assert_array_equal(sb.glom(), base)


def test_shuffle_requires_shape_or_target():
  with pytest.raises(ValueError):
    sp.shuffle(sp.ones((4,)), lambda x, c: ((c[0],), x))
