"""Slicing: basic, strided, fancy, boolean (reference: test_slice.py +
fancy-index tests; SURVEY.md §3.4)."""

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.util import Assert


@pytest.fixture
def a(rng):
  return rng.standard_normal((16, 20))


def test_basic_slices(a):
  sa = sp.from_numpy(a)
  Assert.all_eq(sa[2:7, 3:9], a[2:7, 3:9])
  Assert.all_eq(sa[:5], a[:5])
  Assert.all_eq(sa[:, 4:], a[:, 4:])
  Assert.all_eq(sa[3], a[3])
  Assert.all_eq(sa[-2:, -3:], a[-2:, -3:])
  Assert.all_eq(sa[..., 0], a[..., 0])


def test_strided(a):
  sa = sp.from_numpy(a)
  Assert.all_eq(sa[::2], a[::2])
  Assert.all_eq(sa[1::3, ::2], a[1::3, ::2])
  Assert.all_eq(sa[::-1], a[::-1])


def test_slice_stays_lazy(a):
  sa = sp.from_numpy(a)
  expr = (sa[2:10, 2:10] * 2.0).sum()
  Assert.all_close(expr, (a[2:10, 2:10] * 2.0).sum(), rtol=1e-13)


def test_fancy_integer(a):
  sa = sp.from_numpy(a)
  idx = np.array([3, 1, 4, 1, 5])
  Assert.all_eq(sa[idx], a[idx])
  Assert.all_eq(sp.take(sa, sp.from_numpy(idx), axis=1), np.take(a, idx, axis=1))


def test_fancy_2d_index(a):
  sa = sp.from_numpy(a)
  rows = np.array([0, 2, 4])
  Assert.all_eq(sa[rows], a[rows])


def test_boolean_mask(a):
  sa = sp.from_numpy(a)
  mask = a > 0
  got = sa[sp.from_numpy(mask)].glom()
  np.testing.assert_allclose(got, a[mask], atol=1e-12)


def test_boolean_mask_lazy_pred(a):
  sa = sp.from_numpy(a)
  got = sa[sa > 0].glom()
  np.testing.assert_allclose(got, a[a > 0], atol=1e-12)


def test_write_assign(a):
  sa = sp.from_numpy(a)
  src = np.ones((3, 4))
  out = sp.write(sa, (slice(2, 5), slice(3, 7)), sp.from_numpy(src),
                 reducer=np.add)
  want = a.copy()
  want[2:5, 3:7] += src
  Assert.all_close(out, want, rtol=1e-13)
  out2 = sp.assign(sa, (slice(0, 3), slice(0, 4)), sp.from_numpy(src))
  want2 = a.copy()
  want2[0:3, 0:4] = src
  Assert.all_eq(out2, want2)


def test_multi_array_indexing(a):
  """x[rows, cols] advanced indexing (pairs, not outer product)."""
  sa = sp.from_numpy(a)
  rows = np.array([0, 3, 5])
  cols = np.array([1, 4, 2])
  Assert.all_eq(sa[sp.from_numpy(rows), sp.from_numpy(cols)], a[rows, cols])
  # raw numpy arrays in the tuple work too
  Assert.all_eq(sa[rows, cols], a[rows, cols])


def test_mixed_array_slice_indexing(a):
  sa = sp.from_numpy(a)
  rows = np.array([[0], [2], [5]])
  Assert.all_eq(sa[rows, 3], a[rows, 3])
  got = sa[np.array([1, 2]), 2:6]
  Assert.all_eq(got, a[np.array([1, 2]), 2:6])


def test_bool_in_tuple_goes_eager(a):
  sa = sp.from_numpy(a)
  mask = a[:, 0] > 0
  got = sa[sp.from_numpy(mask), 3].glom()
  np.testing.assert_allclose(got, a[mask, 3], atol=1e-12)


def test_static_int_index_bounds_raise(rng, cluster):
  """numpy parity: out-of-range STATIC integer indices raise IndexError
  at construction (jax alone would silently clamp)."""
  x = sp.from_numpy(rng.standard_normal((4, 5)))
  for bad in (lambda: x[:, 99], lambda: x[4], lambda: x[-5],
              lambda: x[..., 5], lambda: x[0, -6]):
    with pytest.raises(IndexError, match="out of bounds"):
      bad()
  # in-range forms (negative, ellipsis, newaxis, clamping slices) fine
  assert x[-4].glom().shape == (5,)
  assert x[..., 4].glom().shape == (4,)
  assert x[None, 2, :].glom().shape == (1, 5)
  assert x[1:99].glom().shape == (3, 5)


def test_concrete_fancy_index_bounds_raise(rng, cluster):
  """Concrete (host ndarray/list) gather indices out of range raise
  IndexError at construction; Expr indices keep jax clamp semantics."""
  x = sp.from_numpy(rng.standard_normal((4, 5)))
  for bad in (lambda: x[np.array([0, 99])], lambda: x[[0, -9]],
              lambda: x[np.array([1]), np.array([7])]):
    with pytest.raises(IndexError, match="out of bounds"):
      bad()
  assert x[np.array([0, 3, -1])].glom().shape == (3, 5)
  assert x[np.array([1, 2]), np.array([0, 4])].glom().shape == (2,)
  # traced indices: no data-dependent errors under jit (documented)
  assert x[sp.from_numpy(np.array([0, 1]))].glom().shape == (2, 5)


def test_index_bounds_walker_regressions(rng, cluster):
  """r3-s4 review: one walker covers scalar ints inside advanced
  tuples, multi-dim bool masks consume their rank, bool scalars are
  newaxis (never bounds-checked)."""
  x = sp.from_numpy(np.arange(20.0).reshape(4, 5))
  with pytest.raises(IndexError, match="out of bounds"):
    x[np.array([1]), 7]
  assert float(np.asarray(x[np.array([1]), 4].glom()).item()) == 9.0
  x3n = np.arange(120.0).reshape(4, 5, 6)
  x3 = sp.from_numpy(x3n)
  mask = np.zeros((4, 5), bool)
  mask[0, 0] = mask[1, 2] = True
  np.testing.assert_allclose(
      np.asarray(x3[mask, np.array([5])].glom()),
      x3n[mask, np.array([5])])
  x1 = sp.from_numpy(np.arange(5.0).reshape(1, 5))
  assert np.asarray(x1[True].glom()).shape == (1, 1, 5)
