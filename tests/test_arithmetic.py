"""Elementwise arithmetic vs NumPy oracle (reference: test_arithmetic.py,
universal assertion pattern ``Assert.all_eq(result.glom(), numpy)`` —
SURVEY.md §4)."""

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.util import Assert


@pytest.fixture
def ab(rng):
  a = rng.standard_normal((16, 24))
  b = np.abs(rng.standard_normal((16, 24))) + 0.5  # strictly positive
  return a, b


def test_add_sub_mul_div(ab):
  a, b = ab
  sa, sb = sp.from_numpy(a), sp.from_numpy(b)
  Assert.all_eq(sa + sb, a + b)
  Assert.all_eq(sa - sb, a - b)
  Assert.all_eq(sa * sb, a * b)
  Assert.all_close(sa / sb, a / b, rtol=1e-12)


def test_scalar_ops(ab):
  a, _ = ab
  sa = sp.from_numpy(a)
  Assert.all_eq(sa + 3.5, a + 3.5)
  Assert.all_eq(2.0 * sa, 2.0 * a)
  Assert.all_eq(1.0 - sa, 1.0 - a)
  Assert.all_close(sa ** 2, a ** 2, rtol=1e-12)
  Assert.all_close(10.0 / (sa + 10.0), 10.0 / (a + 10.0), rtol=1e-12)


def test_unary(ab):
  a, b = ab
  sa, sb = sp.from_numpy(a), sp.from_numpy(b)
  Assert.all_eq(-sa, -a)
  Assert.all_eq(abs(sa), np.abs(a))
  Assert.all_close(sp.sqrt(sb), np.sqrt(b), rtol=1e-13)
  Assert.all_close(sp.exp(sa), np.exp(a), rtol=1e-13)
  Assert.all_close(sp.log(sb), np.log(b), rtol=1e-13)
  Assert.all_close(sp.tanh(sa), np.tanh(a), rtol=1e-13)
  Assert.all_eq(sp.sign(sa), np.sign(a))
  Assert.all_eq(sp.floor(sa), np.floor(a))
  Assert.all_eq(sp.ceil(sa), np.ceil(a))


def test_comparisons(ab):
  a, b = ab
  sa, sb = sp.from_numpy(a), sp.from_numpy(b)
  Assert.all_eq(sa < sb, a < b)
  Assert.all_eq(sa >= sb, a >= b)
  Assert.all_eq(sa == sa, a == a)
  Assert.all_eq(sa != sb, a != b)


def test_chained_expression(ab):
  a, b = ab
  sa, sb = sp.from_numpy(a), sp.from_numpy(b)
  expr = (sa + sb) * (sa - sb) + 2.0 * sa
  Assert.all_close(expr, (a + b) * (a - b) + 2.0 * a, rtol=1e-12)


def test_where_clip(ab):
  a, b = ab
  sa, sb = sp.from_numpy(a), sp.from_numpy(b)
  Assert.all_eq(sp.where(sa > 0, sa, sb), np.where(a > 0, a, b))
  Assert.all_eq(sp.clip(sa, -0.5, 0.5), np.clip(a, -0.5, 0.5))


def test_int_ops(rng):
  a = rng.integers(1, 100, (12, 12))
  b = rng.integers(1, 100, (12, 12))
  sa, sb = sp.from_numpy(a), sp.from_numpy(b)
  Assert.all_eq(sa + sb, a + b)
  Assert.all_eq(sa // sb, a // b)
  Assert.all_eq(sa % sb, a % b)
  assert np.asarray((sa + sb).glom()).dtype == (a + b).dtype


def test_astype(ab):
  a, _ = ab
  sa = sp.from_numpy(a)
  r = sp.astype(sa, np.float32).glom()
  assert r.dtype == np.float32
  Assert.all_close(r, a.astype(np.float32), rtol=1e-6, atol=1e-6)


def test_creation_ops(cluster):
  Assert.all_eq(sp.ones((8, 8)), np.ones((8, 8)))
  Assert.all_eq(sp.zeros((8, 8)), np.zeros((8, 8)))
  Assert.all_eq(sp.full((4, 4), 7.0), np.full((4, 4), 7.0))
  Assert.all_eq(sp.arange(10), np.arange(10))
  Assert.all_eq(sp.arange(2, 20, 3), np.arange(2, 20, 3))
  Assert.all_eq(sp.eye(6), np.eye(6))
  Assert.all_close(sp.linspace(0, 1, 11), np.linspace(0, 1, 11), rtol=1e-12)


def test_rand_reproducible(cluster):
  sp.set_random_seed(7)
  a = sp.rand(8, 8).glom()
  sp.set_random_seed(7)
  b = sp.rand(8, 8).glom()
  np.testing.assert_array_equal(a, b)
  assert (a >= 0).all() and (a < 1).all()


def test_histogram(rng):
  x = rng.standard_normal(1000)
  got = sp.histogram(sp.from_numpy(x), bins=20, range=(-3, 3)).glom()
  want, _ = np.histogram(x, bins=20, range=(-3, 3))
  np.testing.assert_array_equal(got, want)


def test_take_along_axis(rng):
  a = rng.standard_normal((6, 8))
  idx = np.argsort(a, axis=1)
  got = sp.take_along_axis(sp.from_numpy(a), sp.from_numpy(idx), axis=1)
  Assert.all_eq(got, np.take_along_axis(a, idx, axis=1))


def test_searchsorted(rng):
  edges = np.sort(rng.standard_normal(32))
  q = rng.standard_normal(10)
  got = sp.searchsorted(sp.from_numpy(edges), sp.from_numpy(q)).glom()
  np.testing.assert_array_equal(got, np.searchsorted(edges, q))


def test_python_scalar_weak_typing(rng):
  """NumPy semantics: f32 array × python float stays f32 (a strong f64
  scalar would promote it — the reference matches numpy here)."""
  a32 = rng.standard_normal((8, 8)).astype(np.float32)
  out = (sp.from_numpy(a32) * 2.0 + 1.0).evaluate()
  assert out.dtype == np.float32, out.dtype
  np.testing.assert_allclose(out.glom(), a32 * 2.0 + 1.0, rtol=1e-6)
  # int array with python int scalar stays int
  i32 = rng.integers(0, 100, (8, 8)).astype(np.int32)
  out_i = (sp.from_numpy(i32) * 3 + 1).evaluate()
  assert out_i.dtype == np.int32, out_i.dtype


def test_bitwise_operators(rng):
  a = rng.standard_normal((8, 8))
  m1, m2 = a > 0, a < 0.5
  s1, s2 = sp.from_numpy(m1), sp.from_numpy(m2)
  Assert.all_eq(s1 & s2, m1 & m2)
  Assert.all_eq(s1 | s2, m1 | m2)
  Assert.all_eq(s1 ^ s2, m1 ^ m2)
  Assert.all_eq(~s1, ~m1)
  # combined with comparison sugar (the numpy mask idiom)
  sa = sp.from_numpy(a)
  Assert.all_eq((sa > 0) & (sa < 0.5), (a > 0) & (a < 0.5))
  i = rng.integers(0, 64, (8,)).astype(np.int64)
  si = sp.from_numpy(i)
  Assert.all_eq(si << 2, i << 2)
  Assert.all_eq(si >> 1, i >> 1)
  Assert.all_eq(sp.bitwise_and(si, 0xF), i & 0xF)


def test_nan_reductions_and_scans(rng):
  a = rng.standard_normal((8, 8))
  a[0, 0] = np.nan
  sa = sp.from_numpy(a)
  Assert.all_close(sp.nanmean(sa), np.nanmean(a), rtol=1e-12)
  Assert.all_eq(sp.nanmax(sa), np.nanmax(a))
  Assert.all_eq(sp.nanmin(sa, axis=0), np.nanmin(a, axis=0))
  b = rng.standard_normal((16,))
  Assert.all_eq(sp.cummax(sp.from_numpy(b)), np.maximum.accumulate(b))
  Assert.all_eq(sp.cummin(sp.from_numpy(b)), np.minimum.accumulate(b))


def test_setitem_raises_helpfully(rng):
  a = sp.from_numpy(rng.standard_normal((4, 4)))
  with pytest.raises(TypeError, match=r"at\[idx\]"):
    a[0] = 1.0


def test_digitize(rng):
  bins = np.array([0.0, 1.0, 2.5, 4.0])
  x = rng.uniform(-1, 5, 50)
  got = sp.digitize(sp.from_numpy(x), sp.from_numpy(bins)).glom()
  np.testing.assert_array_equal(got, np.digitize(x, bins))
  got_r = sp.digitize(sp.from_numpy(x), sp.from_numpy(bins), right=True).glom()
  np.testing.assert_array_equal(got_r, np.digitize(x, bins, right=True))


def test_scalar_conversions(rng):
  a = rng.standard_normal((4, 4))
  sa = sp.from_numpy(a)
  assert float(sp.sum(sa)) == pytest.approx(a.sum())
  assert int(sp.from_numpy(np.int64(42))) == 42
  if sp.sum(sa * 0.0 + 1.0) > 15.0:   # bool() of a scalar comparison
    ok = True
  assert ok
  with pytest.raises(ValueError, match="ambiguous"):
    bool(sa > 0)
  with pytest.raises(TypeError):
    float(sa)


def test_empty_and_degenerate_arrays(rng):
  e0 = sp.from_numpy(np.zeros((0, 4)))
  assert float(sp.sum(e0).glom()) == 0.0
  assert (e0 * 2.0).evaluate().shape == (0, 4)
  z = sp.from_numpy(np.float64(5.0))     # 0-d
  assert float((z * 2).glom()) == 10.0
  one = sp.from_numpy(rng.standard_normal((1, 1)))
  Assert.all_eq(one.T, one.value.glom().T)


def test_nan_reductions_surface(rng):
  a = rng.standard_normal((40, 25))
  a[rng.random((40, 25)) < 0.1] = np.nan
  sa = sp.from_numpy(a)
  np.testing.assert_allclose(float(sp.nanvar(sa).glom()), np.nanvar(a),
                             rtol=1e-12)
  np.testing.assert_allclose(np.asarray(sp.nanstd(sa, axis=0).glom()),
                             np.nanstd(a, axis=0), rtol=1e-12)
  np.testing.assert_allclose(float(sp.nanmedian(sa).glom()), np.nanmedian(a),
                             rtol=1e-12)
  np.testing.assert_allclose(float(sp.nanpercentile(sa, 30.0).glom()),
                             np.nanpercentile(a, 30.0), rtol=1e-12)
  np.testing.assert_allclose(float(sp.nanquantile(sa, 0.7).glom()),
                             np.nanquantile(a, 0.7), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(sp.nanvar(sa, axis=1, ddof=1).glom()),
                             np.nanvar(a, axis=1, ddof=1), rtol=1e-12)
