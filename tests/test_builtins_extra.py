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


def test_second_sweep_parity(rng, cluster):
  a = rng.standard_normal((6, 8))
  v3 = rng.standard_normal((4, 3))
  w3 = rng.standard_normal((4, 3))
  pairs = [
      (sp.rad2deg(sp.from_numpy(a)), np.rad2deg(a)),
      (sp.deg2rad(sp.from_numpy(a)), np.deg2rad(a)),
      (sp.cbrt(sp.from_numpy(a)), np.cbrt(a)),
      (sp.fabs(sp.from_numpy(a)), np.fabs(a)),
      (sp.remainder(sp.from_numpy(a), 2.5), np.remainder(a, 2.5)),
      (sp.cross(sp.from_numpy(v3), sp.from_numpy(w3)), np.cross(v3, w3)),
      (sp.kron(sp.from_numpy(a[:2, :2]), sp.from_numpy(a[2:4, 2:4])),
       np.kron(a[:2, :2], a[2:4, 2:4])),
      (sp.around(sp.from_numpy(a), 2), np.around(a, 2)),
      (sp.moveaxis(sp.from_numpy(a), 0, 1), np.moveaxis(a, 0, 1)),
      (sp.diff(sp.from_numpy(a), axis=1), np.diff(a, axis=1)),
      (sp.cov(sp.from_numpy(a)), np.cov(a)),
      (sp.corrcoef(sp.from_numpy(a)), np.corrcoef(a)),
      (sp.average(sp.from_numpy(a), axis=0), np.average(a, axis=0)),
  ]
  for got, want in pairs:
    np.testing.assert_allclose(got.glom(), want, rtol=1e-10, atol=1e-12)
  wts = np.abs(rng.standard_normal(8)) + 0.1
  np.testing.assert_allclose(
      sp.average(sp.from_numpy(a), axis=1, weights=sp.from_numpy(wts)).glom(),
      np.average(a, axis=1, weights=wts), rtol=1e-10)
  b = a.copy(); b[2, 3] = np.nan
  assert int(sp.nanargmax(sp.from_numpy(b.ravel())).glom()) == np.nanargmax(b.ravel())
  np.testing.assert_array_equal(
      sp.column_stack([sp.from_numpy(a[:, 0]), sp.from_numpy(a[:, 1])]).glom(),
      np.column_stack([a[:, 0], a[:, 1]]))
  np.testing.assert_array_equal(
      sp.dstack([sp.from_numpy(a), sp.from_numpy(a)]).glom(),
      np.dstack([a, a]))
  idx = rng.integers(0, 2, 8)
  np.testing.assert_array_equal(
      sp.choose(sp.from_numpy(idx), [sp.from_numpy(a[0]), sp.from_numpy(a[1])]).glom(),
      np.choose(idx, [a[0], a[1]]))
  for g_sp, g_np in zip([sp.gradient(sp.from_numpy(a), axis=0)],
                        [np.gradient(a, axis=0)]):
    np.testing.assert_allclose(g_sp.glom(), g_np, rtol=1e-10)


def test_einsum_parity_and_caching(rng, cluster):
  a = rng.standard_normal((6, 8))
  b = rng.standard_normal((8, 4))
  np.testing.assert_allclose(
      sp.einsum("ij,jk->ik", sp.from_numpy(a), sp.from_numpy(b)).glom(),
      np.einsum("ij,jk->ik", a, b), rtol=1e-12)
  np.testing.assert_allclose(
      sp.einsum("ij->j", sp.from_numpy(a)).glom(),
      np.einsum("ij->j", a), rtol=1e-12)
  # different subscripts must NOT alias in the compiled-region cache
  t1 = sp.einsum("ij,ij->", sp.from_numpy(a), sp.from_numpy(a)).glom()
  t2 = sp.einsum("ij,ij->i", sp.from_numpy(a), sp.from_numpy(a)).glom()
  np.testing.assert_allclose(t1, np.einsum("ij,ij->", a, a), rtol=1e-12)
  np.testing.assert_allclose(t2, np.einsum("ij,ij->i", a, a), rtol=1e-12)


def test_r3_surface_aliases(rng, cluster):
  a = rng.standard_normal((5, 7))
  assert float(sp.amax(sp.from_numpy(a)).glom()) == a.max()
  assert float(sp.amin(sp.from_numpy(a)).glom()) == a.min()
  np.testing.assert_array_equal(sp.asarray(a).glom(), np.asarray(a))
  np.testing.assert_array_equal(sp.array(a, dtype=np.float32).glom(),
                                np.array(a, dtype=np.float32))
  np.testing.assert_array_equal(sp.copy(sp.from_numpy(a)).glom(), a)


def test_r3_append_binary_maps(rng, cluster):
  a, b = rng.standard_normal((3, 4)), rng.standard_normal((2, 4))
  np.testing.assert_array_equal(
      sp.append(sp.from_numpy(a), sp.from_numpy(b), axis=0).glom(),
      np.append(a, b, axis=0))
  np.testing.assert_array_equal(
      sp.append(sp.from_numpy(a), sp.from_numpy(b)).glom(), np.append(a, b))
  x, y = rng.standard_normal(16), rng.standard_normal(16)
  x[3] = np.nan
  np.testing.assert_array_equal(
      sp.fmax(sp.from_numpy(x), sp.from_numpy(y)).glom(), np.fmax(x, y))
  np.testing.assert_array_equal(
      sp.fmin(sp.from_numpy(x), sp.from_numpy(y)).glom(), np.fmin(x, y))
  np.testing.assert_allclose(
      sp.logaddexp(sp.from_numpy(y), sp.from_numpy(y)).glom(),
      np.logaddexp(y, y), rtol=1e-12)


def test_r3_nan_to_num_interp_rot90(rng, cluster):
  x = rng.standard_normal(12)
  x[2], x[5], x[9] = np.nan, np.inf, -np.inf
  np.testing.assert_array_equal(sp.nan_to_num(sp.from_numpy(x)).glom(),
                                np.nan_to_num(x))
  np.testing.assert_array_equal(
      sp.nan_to_num(sp.from_numpy(x), nan=7.0, posinf=1e3, neginf=-1e3).glom(),
      np.nan_to_num(x, nan=7.0, posinf=1e3, neginf=-1e3))
  xp = np.linspace(0.0, 1.0, 11)
  fp = np.sin(xp)
  q = rng.uniform(-0.2, 1.2, 33)
  np.testing.assert_allclose(
      sp.interp(sp.from_numpy(q), sp.from_numpy(xp), sp.from_numpy(fp)).glom(),
      np.interp(q, xp, fp), rtol=1e-12)
  a = rng.standard_normal((4, 6))
  for k in range(4):
    np.testing.assert_array_equal(sp.rot90(sp.from_numpy(a), k=k).glom(),
                                  np.rot90(a, k=k))


def test_r3_index_helpers(rng, cluster):
  a = rng.standard_normal((4, 6))
  a[a < 0.3] = 0.0
  np.testing.assert_array_equal(sp.flatnonzero(sp.from_numpy(a)).glom(),
                                np.flatnonzero(a))
  idx = np.array([0, 5, 11, 23])
  got = sp.unravel_index(sp.from_numpy(idx), (4, 6))
  want = np.unravel_index(idx, (4, 6))
  assert len(got) == len(want) == 2
  for g, w in zip(got, want):
    np.testing.assert_array_equal(np.asarray(g.glom()), w)
  b = rng.standard_normal((5, 5))
  np.testing.assert_array_equal(
      sp.fill_diagonal(sp.from_numpy(b), 9.0).glom(),
      np.where(np.eye(5, dtype=bool), 9.0, b))


def test_r3_permutation_choice(cluster):
  sp.set_random_seed(1234)
  p = np.asarray(sp.permutation(257).glom())
  np.testing.assert_array_equal(np.sort(p), np.arange(257))
  a = np.arange(100.0) * 2.0
  pa = np.asarray(sp.permutation(sp.from_numpy(a)).glom())
  np.testing.assert_array_equal(np.sort(pa), a)
  m = np.arange(24.0).reshape(8, 3)
  pm = np.asarray(sp.permutation(sp.from_numpy(m)).glom())
  np.testing.assert_array_equal(np.sort(pm[:, 0]), m[:, 0])
  np.testing.assert_array_equal(pm[:, 1] - pm[:, 0], m[:, 1] - m[:, 0])

  c = np.asarray(sp.choice(50, 20, replace=False).glom())
  assert len(np.unique(c)) == 20 and c.min() >= 0 and c.max() < 50
  cr = np.asarray(sp.choice(sp.from_numpy(a), 64).glom())
  assert np.isin(cr, a).all()
  with np.testing.assert_raises(ValueError):
    sp.choice(5, 10, replace=False)


def test_r3_sweep2_elementwise(rng, cluster):
  a = rng.standard_normal((5, 7))
  b = rng.standard_normal((5, 7))
  pairs = [
      (sp.sinc(sp.from_numpy(a)), np.sinc(a)),
      (sp.signbit(sp.from_numpy(a)), np.signbit(a)),
      (sp.heaviside(sp.from_numpy(a), sp.from_numpy(b)), np.heaviside(a, b)),
      (sp.copysign(sp.from_numpy(a), sp.from_numpy(b)), np.copysign(a, b)),
      (sp.nextafter(sp.from_numpy(a), sp.from_numpy(b)), np.nextafter(a, b)),
      (sp.float_power(sp.from_numpy(np.abs(a)), sp.from_numpy(b)),
       np.float_power(np.abs(a), b)),
  ]
  for got, want in pairs:
    np.testing.assert_allclose(np.asarray(got.glom()), want, rtol=1e-12)
  ia = rng.integers(1, 100, (4, 4))
  ib = rng.integers(1, 100, (4, 4))
  np.testing.assert_array_equal(
      sp.gcd(sp.from_numpy(ia), sp.from_numpy(ib)).glom(), np.gcd(ia, ib))
  np.testing.assert_array_equal(
      sp.lcm(sp.from_numpy(ia), sp.from_numpy(ib)).glom(), np.lcm(ia, ib))
  e = rng.integers(-3, 3, (5, 7))
  np.testing.assert_allclose(
      np.asarray(sp.ldexp(sp.from_numpy(a), sp.from_numpy(e)).glom()),
      np.ldexp(a, e), rtol=1e-12)
  z = a + 1j * b
  np.testing.assert_allclose(np.asarray(sp.angle(sp.from_numpy(z)).glom()),
                             np.angle(z), rtol=1e-12)
  np.testing.assert_array_equal(sp.iscomplex(sp.from_numpy(z)).glom(),
                                np.iscomplex(z))
  np.testing.assert_array_equal(sp.isreal(sp.from_numpy(a)).glom(),
                                np.isreal(a))


def test_r3_sweep2_tuple_outputs(rng, cluster):
  a = rng.standard_normal(16) * 5
  fr, it = sp.modf(sp.from_numpy(a))
  wf, wi = np.modf(a)
  np.testing.assert_allclose(np.asarray(fr.glom()), wf, rtol=1e-12)
  np.testing.assert_allclose(np.asarray(it.glom()), wi, rtol=1e-12)
  m, e = sp.frexp(sp.from_numpy(np.abs(a) + 0.1))
  wm, we = np.frexp(np.abs(a) + 0.1)
  np.testing.assert_allclose(np.asarray(m.glom()), wm, rtol=1e-12)
  np.testing.assert_array_equal(np.asarray(e.glom()), we)
  q, r = sp.divmod(sp.from_numpy(a), 3.0)
  wq, wr = np.divmod(a, 3.0)
  np.testing.assert_allclose(np.asarray(q.glom()), wq, rtol=1e-12)
  np.testing.assert_allclose(np.asarray(r.glom()), wr, rtol=1e-12)


def test_r3_sweep2_shape_ops(rng, cluster):
  a = rng.standard_normal((4, 6))
  np.testing.assert_array_equal(
      sp.pad(sp.from_numpy(a), 2).glom(), np.pad(a, 2))
  np.testing.assert_array_equal(
      sp.pad(sp.from_numpy(a), ((1, 2), (0, 3)), mode="edge").glom(),
      np.pad(a, ((1, 2), (0, 3)), mode="edge"))
  u, v = rng.standard_normal(20), rng.standard_normal(5)
  for mode in ("full", "same", "valid"):
    np.testing.assert_allclose(
        np.asarray(sp.convolve(sp.from_numpy(u), sp.from_numpy(v),
                               mode=mode).glom()),
        np.convolve(u, v, mode=mode), rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(
      np.asarray(sp.correlate(sp.from_numpy(u), sp.from_numpy(v)).glom()),
      np.correlate(u, v), rtol=1e-9, atol=1e-12)
  x = rng.standard_normal(6)
  np.testing.assert_allclose(np.asarray(sp.vander(sp.from_numpy(x)).glom()),
                             np.vander(x), rtol=1e-10)
  np.testing.assert_allclose(
      np.asarray(sp.ediff1d(sp.from_numpy(a)).glom()),
      np.ediff1d(a), rtol=1e-12)
  np.testing.assert_allclose(float(sp.trapz(sp.from_numpy(u)).glom()),
                             np.trapezoid(u), rtol=1e-12)
  np.testing.assert_allclose(
      float(sp.trapz(sp.from_numpy(u), x=sp.from_numpy(np.sort(u))).glom()),
      np.trapezoid(u, np.sort(u)), rtol=1e-10)
  np.testing.assert_allclose(
      np.asarray(sp.insert(sp.from_numpy(u), 3, 9.0).glom()),
      np.insert(u, 3, 9.0), rtol=1e-12)
  np.testing.assert_allclose(
      np.asarray(sp.delete(sp.from_numpy(a), 1, axis=0).glom()),
      np.delete(a, 1, axis=0), rtol=1e-12)
  np.testing.assert_allclose(
      np.asarray(sp.apply_along_axis(lambda r: r - r.mean(), 1,
                                     sp.from_numpy(a)).glom()),
      np.apply_along_axis(lambda r: r - r.mean(), 1, a), rtol=1e-10)
  np.testing.assert_array_equal(sp.msort(sp.from_numpy(a)).glom(),
                                np.sort(a, axis=0))
  p = rng.standard_normal(4)
  np.testing.assert_allclose(
      np.asarray(sp.polyval(sp.from_numpy(p), sp.from_numpy(u)).glom()),
      np.polyval(p, u), rtol=1e-9)


def test_r3_sweep2_sets_and_select(rng, cluster):
  a = rng.integers(0, 20, 30)
  b = rng.integers(0, 20, 10)
  np.testing.assert_array_equal(
      sp.isin(sp.from_numpy(a), sp.from_numpy(b)).glom(), np.isin(a, b))
  np.testing.assert_array_equal(
      sp.in1d(sp.from_numpy(a), sp.from_numpy(b)).glom(),
      np.isin(a.ravel(), b))
  np.testing.assert_array_equal(
      sp.setdiff1d(sp.from_numpy(a), sp.from_numpy(b)).glom(),
      np.setdiff1d(a, b))
  np.testing.assert_array_equal(
      sp.union1d(sp.from_numpy(a), sp.from_numpy(b)).glom(),
      np.union1d(a, b))
  np.testing.assert_array_equal(
      sp.intersect1d(sp.from_numpy(a), sp.from_numpy(b)).glom(),
      np.intersect1d(a, b))
  x = rng.standard_normal(24)
  got = sp.select([sp.from_numpy(x) < -1, sp.from_numpy(x) > 1],
                  [sp.from_numpy(x) * 0 - 1, sp.from_numpy(x) * 0 + 1],
                  default=0.0)
  np.testing.assert_array_equal(np.asarray(got.glom()),
                                np.select([x < -1, x > 1],
                                          [x * 0 - 1, x * 0 + 1], 0.0))
  np.testing.assert_array_equal(
      sp.argwhere(sp.from_numpy(x > 0.5)).glom(), np.argwhere(x > 0.5))
  np.testing.assert_array_equal(
      sp.extract(sp.from_numpy(x > 0), sp.from_numpy(x)).glom(),
      np.extract(x > 0, x))
  m = rng.standard_normal((5, 4))
  np.testing.assert_array_equal(
      sp.compress(sp.from_numpy(np.array([0, 1, 1, 0, 1])),
                  sp.from_numpy(m), axis=0).glom(),
      np.compress([0, 1, 1, 0, 1], m, axis=0))


def test_r3_sweep2_index_creations_and_nan(rng, cluster):
  np.testing.assert_array_equal(sp.indices((3, 4)).glom(),
                                np.indices((3, 4)))
  np.testing.assert_array_equal(
      sp.fromfunction(lambda i, j: i * 10 + j, (3, 4)).glom(),
      np.fromfunction(lambda i, j: i * 10 + j, (3, 4)))
  for got, want in zip(sp.triu_indices(5, 1), np.triu_indices(5, 1)):
    np.testing.assert_array_equal(np.asarray(got.glom()), want)
  for got, want in zip(sp.tril_indices(5), np.tril_indices(5)):
    np.testing.assert_array_equal(np.asarray(got.glom()), want)
  for got, want in zip(sp.diag_indices(4), np.diag_indices(4)):
    np.testing.assert_array_equal(np.asarray(got.glom()), want)
  a = rng.standard_normal((4, 6))
  a[1, 2] = np.nan
  a[3, 0] = np.nan
  np.testing.assert_allclose(float(sp.nanprod(sp.from_numpy(a)).glom()),
                             np.nanprod(a), rtol=1e-10)
  np.testing.assert_allclose(
      np.asarray(sp.nancumsum(sp.from_numpy(a), axis=1).glom()),
      np.nancumsum(a, axis=1), rtol=1e-10)
  np.testing.assert_allclose(
      np.asarray(sp.nancumprod(sp.from_numpy(a), axis=0).glom()),
      np.nancumprod(a, axis=0), rtol=1e-10)
  ia = rng.integers(1, 5, (3, 3))
  np.testing.assert_array_equal(int(sp.nanprod(sp.from_numpy(ia)).glom()),
                                np.nanprod(ia))


def test_histogram_auto_range(rng, cluster):
  x = rng.standard_normal(5000)
  got = np.asarray(sp.histogram(sp.from_numpy(x), bins=20).glom())
  want, _ = np.histogram(x, bins=20)
  np.testing.assert_array_equal(got, want)
  # degenerate constant input
  c = np.full(100, 3.0)
  got = np.asarray(sp.histogram(sp.from_numpy(c), bins=4).glom())
  assert got.sum() == 100


def test_numpy_ufunc_interop_stays_lazy(rng, cluster):
  """np.sin(expr) / np.add(a, expr) dispatch to the lazy builtins via
  __array_ufunc__ (no silent whole-array materialization); uncovered
  ufunc methods still materialize-and-compute instead of raising."""
  from spartan_tpu.expr.base import Expr
  a = rng.standard_normal((6, 6))
  E = sp.from_numpy(a)
  r = np.add(a, E)
  assert isinstance(r, Expr)
  np.testing.assert_allclose(np.asarray(r.glom()), a + a, rtol=1e-12)
  r2 = np.sin(E)
  assert isinstance(r2, Expr)
  np.testing.assert_allclose(np.asarray(r2.glom()), np.sin(a), rtol=1e-12)
  acc = np.add.reduce(E)          # uncovered method → explicit fallback
  np.testing.assert_allclose(acc, a.sum(0), rtol=1e-12)
  np.testing.assert_allclose(E, a)  # np.testing on exprs keeps working


def test_at_functional_updates(rng, cluster):
  """expr.at[idx].set/add/... — jax-style sugar over write/scatter."""
  a = rng.standard_normal((6, 8))
  E = sp.from_numpy(a)
  got = np.asarray(E.at[1:3, 2:5].set(0.0).glom())
  want = a.copy(); want[1:3, 2:5] = 0.0
  np.testing.assert_array_equal(got, want)
  got = np.asarray(E.at[0].add(10.0).glom())
  want = a.copy(); want[0] += 10.0
  np.testing.assert_allclose(got, want, rtol=1e-12)
  v = rng.standard_normal(16)
  idx = np.array([1, 5, 5, 9])
  ups = np.array([1.0, 2.0, 3.0, 4.0])
  got = np.asarray(sp.from_numpy(v).at[idx].add(sp.from_numpy(ups)).glom())
  want = v.copy(); np.add.at(want, idx, ups)
  np.testing.assert_allclose(got, want, rtol=1e-12)
  got = np.asarray(E.at[2:4].mul(2.0).glom())
  want = a.copy(); want[2:4] *= 2.0
  np.testing.assert_allclose(got, want, rtol=1e-12)


def test_full_elementwise_parity_sweep(rng, cluster):
  """Every unary/binary elementwise builtin vs its numpy twin — closes
  the by-name coverage audit (r3 session 3)."""
  a = rng.uniform(0.1, 0.9, (4, 5))
  b = rng.uniform(0.1, 0.9, (4, 5))
  import scipy.special as ss
  unary = [
      ("arccos", np.arccos), ("arcsin", np.arcsin), ("arctan", np.arctan),
      ("cos", np.cos), ("cosh", np.cosh), ("sinh", np.sinh),
      ("exp2", np.exp2), ("expm1", np.expm1), ("log2", np.log2),
      ("log10", np.log10), ("log1p", np.log1p), ("rint", np.rint),
      ("trunc", np.trunc), ("reciprocal", np.reciprocal),
      ("negative", np.negative), ("positive", np.positive),
      ("absolute", np.absolute), ("conj", np.conj), ("imag", np.imag),
      ("degrees", np.degrees), ("radians", np.radians),
      ("isnan", np.isnan), ("isinf", np.isinf), ("isfinite", np.isfinite),
      ("logical_not", np.logical_not),
      ("erf", ss.erf), ("erfc", ss.erfc),
  ]
  for name, nfn in unary:
    got = np.asarray(getattr(sp, name)(sp.from_numpy(a)).glom())
    np.testing.assert_allclose(got, nfn(a), rtol=1e-10, atol=1e-12,
                               err_msg=name)
  binary = [
      ("arctan2", np.arctan2), ("hypot", np.hypot),
      ("divide", np.divide), ("true_divide", np.true_divide),
      ("floor_divide", np.floor_divide), ("multiply", np.multiply),
      ("subtract", np.subtract),
      ("equal", np.equal), ("not_equal", np.not_equal),
      ("less", np.less), ("less_equal", np.less_equal),
      ("greater", np.greater), ("greater_equal", np.greater_equal),
      ("logical_and", np.logical_and), ("logical_or", np.logical_or),
      ("logical_xor", np.logical_xor),
  ]
  for name, nfn in binary:
    got = np.asarray(getattr(sp, name)(sp.from_numpy(a),
                                       sp.from_numpy(b)).glom())
    np.testing.assert_allclose(got, nfn(a, b), rtol=1e-10, err_msg=name)
  ia = rng.integers(0, 63, (4, 5))
  ib = rng.integers(0, 5, (4, 5))
  int_binary = [
      ("bitwise_or", np.bitwise_or), ("bitwise_xor", np.bitwise_xor),
      ("left_shift", np.left_shift), ("right_shift", np.right_shift),
  ]
  for name, nfn in int_binary:
    got = np.asarray(getattr(sp, name)(sp.from_numpy(ia),
                                       sp.from_numpy(ib)).glom())
    np.testing.assert_array_equal(got, nfn(ia, ib), err_msg=name)
  np.testing.assert_array_equal(sp.invert(sp.from_numpy(ia)).glom(),
                                np.invert(ia))
  np.testing.assert_array_equal(sp.bitwise_not(sp.from_numpy(ia)).glom(),
                                np.invert(ia))
  # creation / identity / comparison helpers
  np.testing.assert_array_equal(sp.ones_like(sp.from_numpy(a)).glom(),
                                np.ones_like(a))
  np.testing.assert_array_equal(sp.zeros_like(sp.from_numpy(a)).glom(),
                                np.zeros_like(a))
  np.testing.assert_array_equal(sp.full_like(sp.from_numpy(a), 7.0).glom(),
                                np.full_like(a, 7.0))
  np.testing.assert_array_equal(sp.identity(5).glom(), np.identity(5))
  assert sp.empty((3, 2)).glom().shape == (3, 2)
  assert sp.allclose(sp.from_numpy(a), a + 1e-12)
  assert sp.array_equal(sp.from_numpy(ia), ia)
  assert not sp.array_equal(sp.from_numpy(ia), ia + 1)
  np.testing.assert_allclose(float(sp.vdot(sp.from_numpy(a),
                                           sp.from_numpy(b)).glom()),
                             np.vdot(a, b), rtol=1e-12)
  np.testing.assert_allclose(
      np.asarray(sp.matmul(sp.from_numpy(a), sp.from_numpy(b.T)).glom()),
      a @ b.T, rtol=1e-10)
  np.testing.assert_array_equal(
      sp.unique(sp.from_numpy(ib)).glom(), np.unique(ib))
  np.testing.assert_array_equal(
      sp.bincount(sp.from_numpy(ib.ravel())).glom(), np.bincount(ib.ravel()))
  assert int(sp.nanargmin(sp.from_numpy(a.ravel())).glom()) == a.argmin()
  r = np.asarray(sp.randint(3, 9, size=(200,)).glom())
  assert r.min() >= 3 and r.max() < 9 and r.dtype.kind == "i"


def test_einsum_contraction_routing(rng, cluster):
  """Two-operand pure contractions lower through TensorDotExpr (dot
  cost model); batch/trace forms keep the generic map — values match
  np.einsum in every case."""
  from spartan_tpu.expr.dot import TensorDotExpr
  from spartan_tpu.expr.reshape import TransposeExpr
  a = rng.standard_normal((4, 5))
  b = rng.standard_normal((5, 6))
  e = sp.einsum("ij,jk->ik", sp.from_numpy(a), sp.from_numpy(b))
  assert isinstance(e, TensorDotExpr)
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,jk->ik", a, b), rtol=1e-10)
  # permuted output → transpose on top of the tensordot
  e = sp.einsum("ij,jk->ki", sp.from_numpy(a), sp.from_numpy(b))
  assert isinstance(e, TransposeExpr)
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,jk->ki", a, b), rtol=1e-10)
  # higher-rank contraction + implicit output
  t = rng.standard_normal((3, 4, 5))
  m = rng.standard_normal((5, 2))
  e = sp.einsum("abc,cd->abd", sp.from_numpy(t), sp.from_numpy(m))
  assert isinstance(e, TensorDotExpr)
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("abc,cd->abd", t, m), rtol=1e-10)
  e = sp.einsum("ij,jk", sp.from_numpy(a), sp.from_numpy(b))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,jk", a, b), rtol=1e-10)
  # batch matmul / trace / summed-out axes stay on the generic map
  bt = rng.standard_normal((2, 4, 5))
  bu = rng.standard_normal((2, 5, 3))
  e = sp.einsum("bij,bjk->bik", sp.from_numpy(bt), sp.from_numpy(bu))
  assert not isinstance(e, (TensorDotExpr, TransposeExpr))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("bij,bjk->bik", bt, bu), rtol=1e-10)
  sq = rng.standard_normal((5, 5))
  e = sp.einsum("ii,ij->j", sp.from_numpy(sq), sp.from_numpy(b[:5, :5][:5]))
  np.testing.assert_allclose(
      np.asarray(e.glom()), np.einsum("ii,ij->j", sq, b[:5, :5][:5]),
      rtol=1e-10)
  e = sp.einsum("ij,jk->k", sp.from_numpy(a), sp.from_numpy(b))
  assert not isinstance(e, (TensorDotExpr, TransposeExpr))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,jk->k", a, b), rtol=1e-10)


def test_random_namespace(cluster):
  sp.random.seed(99)
  u = np.asarray(sp.random.uniform(2.0, 5.0, (2000,)).glom())
  assert 2.0 <= u.min() and u.max() < 5.0 and abs(u.mean() - 3.5) < 0.1
  nrm = np.asarray(sp.random.normal(10.0, 0.5, (2000,)).glom())
  assert abs(nrm.mean() - 10.0) < 0.1 and abs(nrm.std() - 0.5) < 0.05
  r = np.asarray(sp.random.integers(3, 7, (500,)).glom())
  assert r.min() >= 3 and r.max() < 7
  b = np.asarray(sp.random.bernoulli(0.25, (4000,)).glom())
  assert b.dtype == bool and abs(b.mean() - 0.25) < 0.05
  p = np.asarray(sp.random.permutation(100).glom())
  np.testing.assert_array_equal(np.sort(p), np.arange(100))
  assert sp.random.random((3, 4)).shape == (3, 4)
  assert sp.random.standard_normal(7).shape == (7,)


def test_review_fixes_r3s3(rng, cluster):
  """Regression tests for the session-3 code-review findings."""
  import jax.numpy as jnp
  # 1. reverse= works for NAMED scan ops (was silently ignored)
  x = rng.standard_normal(65)
  got = np.asarray(sp.scan(sp.from_numpy(x), "sum", reverse=True).glom())
  np.testing.assert_allclose(got, np.cumsum(x[::-1])[::-1], rtol=1e-12)
  m = rng.standard_normal((4, 8))
  got = np.asarray(sp.scan(sp.from_numpy(m), "max", axis=1,
                           reverse=True).glom())
  np.testing.assert_array_equal(got,
                                np.maximum.accumulate(m[:, ::-1],
                                                      axis=1)[:, ::-1])
  # 2. histogram auto-range is TRACED: fresh batches through sp.compile
  # get their own edges (was baked from the template batch)
  leaf = sp.from_numpy(rng.standard_normal(500))
  f = sp.compile(sp.histogram(leaf, bins=8), wrt=[leaf])
  wide = rng.standard_normal(500) * 100.0
  got = np.asarray(f(wide).glom())
  np.testing.assert_array_equal(got, np.histogram(wide, bins=8)[0])
  # 3. einsum operand/subscript arity mismatch raises (was silent drop)
  a, b = rng.standard_normal((3, 4)), rng.standard_normal((4, 5))
  with np.testing.assert_raises(Exception):
    sp.einsum("ij,jk->ik", sp.from_numpy(a), sp.from_numpy(b),
              sp.from_numpy(b)).glom()
  # 6. multi-dim advanced .at scatter (rows, cols) with duplicates
  base = rng.standard_normal((5, 7))
  rows = np.array([0, 2, 2, 4])
  cols = np.array([1, 3, 3, 6])
  ups = np.array([1.0, 2.0, 3.0, 4.0])
  got = np.asarray(sp.from_numpy(base).at[rows, cols].add(
      sp.from_numpy(ups)).glom())
  want = base.copy()
  np.add.at(want, (rows, cols), ups)
  np.testing.assert_allclose(got, want, rtol=1e-12)
  # 7. choice on a 2-D population raises like np.random.choice
  with np.testing.assert_raises(ValueError):
    sp.choice(sp.from_numpy(base), 3)
  # 8. ufunc dispatch propagates construction errors (no silent gather)
  with np.testing.assert_raises(Exception):
    np.add(np.ones((3, 5)), sp.from_numpy(base)).glom()


def test_at_advanced_indexing_numpy_parity(rng, cluster):
  """ADVICE r3: negative indices, partial indexing, bool masks in .at[]."""
  # 1. negative indices in multi-axis scatter normalize per axis
  base = rng.standard_normal((2, 4))
  got = np.asarray(sp.from_numpy(base).at[
      np.array([1]), np.array([-1])].set(9.0).glom())
  want = base.copy()
  want[1, -1] = 9.0
  np.testing.assert_allclose(got, want, rtol=1e-12)
  # 2. partial advanced indexing scatters whole trailing slices
  base3 = rng.standard_normal((2, 3, 4))
  got = np.asarray(sp.from_numpy(base3).at[
      np.array([0]), np.array([1])].set(7.0).glom())
  want = base3.copy()
  want[np.array([0]), np.array([1])] = 7.0
  np.testing.assert_allclose(got, want, rtol=1e-12)
  # ...with add + duplicates (scatter-add over rows)
  rows = np.array([0, 1, 0])
  ups = rng.standard_normal((3, 3, 4))
  got = np.asarray(sp.from_numpy(base3).at[rows].add(
      sp.from_numpy(ups)).glom())
  want = base3.copy()
  np.add.at(want, rows, ups)
  np.testing.assert_allclose(got, want, rtol=1e-12)
  # ...mixed int + negative array index
  base = rng.standard_normal((3, 5))
  got = np.asarray(sp.from_numpy(base).at[-1, np.array([0, -2])].add(
      2.0).glom())
  want = base.copy()
  np.add.at(want, (-1, np.array([0, -2])), 2.0)
  np.testing.assert_allclose(got, want, rtol=1e-12)
  # 3. too many indices raise IndexError at construction
  with np.testing.assert_raises(IndexError):
    sp.from_numpy(base).at[np.array([0]), np.array([0]), np.array([0])].set(1)
  # 4. boolean-mask .at updates (full mask, scalar + broadcast values)
  mask = base > 0
  got = np.asarray(sp.from_numpy(base).at[mask].set(0.0).glom())
  want = base.copy()
  want[mask] = 0.0
  np.testing.assert_allclose(got, want, rtol=1e-12)
  got = np.asarray(sp.from_numpy(base).at[mask].add(1.5).glom())
  want = base.copy()
  want[mask] += 1.5
  np.testing.assert_allclose(got, want, rtol=1e-12)
  # ...leading-axes (partial) bool mask selects whole rows
  rmask = np.array([True, False, True])
  got = np.asarray(sp.from_numpy(base).at[rmask].mul(3.0).glom())
  want = base.copy()
  want[rmask] *= 3.0
  np.testing.assert_allclose(got, want, rtol=1e-12)
  # ...max/min reducers
  got = np.asarray(sp.from_numpy(base).at[mask].max(0.5).glom())
  want = base.copy()
  np.maximum.at(want, mask, 0.5)
  np.testing.assert_allclose(got, want, rtol=1e-12)


def test_at_bool_mask_and_oob_guards(rng, cluster):
  """code-review r4: bool-mask .at[] rejects compressed-assignment forms
  (silent divergence from numpy) and wrong-shape masks; preserves the
  destination dtype; concrete OOB indices in multi-axis .at raise
  instead of wrapping."""
  base = rng.standard_normal((3, 5))
  mask = base > 0
  # compressed per-cell assignment would silently diverge → loud error
  with np.testing.assert_raises(NotImplementedError):
    sp.from_numpy(base).at[mask].set(np.arange(int(mask.sum()), dtype=float))
  # wrong-shape mask (numpy raises IndexError too)
  with np.testing.assert_raises(IndexError):
    sp.from_numpy(base).at[np.array([True])].set(0.0)
  # dtype preserved (numpy truncates on int dst; old path promoted)
  ib = np.arange(15, dtype=np.int64).reshape(3, 5)
  got = sp.from_numpy(ib).at[ib > 7].set(0.5)
  assert np.dtype(got.aval().dtype) == np.int64
  want = ib.copy()
  want[ib > 7] = 0  # int truncation of 0.5
  np.testing.assert_array_equal(np.asarray(got.glom()), want)
  # concrete OOB index raises (used to wrap via % onto a wrong element)
  with np.testing.assert_raises(IndexError):
    sp.from_numpy(base).at[np.array([1]), np.array([7])].set(-1.0)
  with np.testing.assert_raises(IndexError):
    sp.from_numpy(base).at[1, np.array([-6])].set(-1.0)


def test_at_single_axis_oob_nested_mask_and_ufunc_cast(rng, cluster):
  """code-review r4 round 2: (a) single index-array .at[idx] bounds-
  checks concrete indices (jax scatter silently DROPS OOB updates where
  numpy raises) and normalizes negatives; (b) nested bool LISTS are
  recognized as masks; (c) reducer forms refuse same_kind-uncastable
  values (numpy ufunc-at parity) while .set keeps numpy's unsafe-cast
  assignment."""
  base = rng.standard_normal((3, 5))
  # (a) OOB single index array raises (used to be a silent no-op)
  with np.testing.assert_raises(IndexError):
    sp.from_numpy(base).at[np.array([7])].set(-1.0)
  with np.testing.assert_raises(IndexError):
    sp.from_numpy(np.arange(4.0)).at[[4]].add(1.0)
  # negative indices hit the numpy element
  got = np.asarray(sp.from_numpy(base).at[np.array([-1])].set(9.0).glom())
  want = base.copy()
  want[np.array([-1])] = 9.0
  np.testing.assert_allclose(got, want)
  # (b) nested bool list == 2-D mask (used to die opaquely at eval)
  m = [[True] * 5, [False] * 5, [True] * 5]
  got = np.asarray(sp.from_numpy(base).at[m].set(0.0).glom())
  want = base.copy()
  want[np.asarray(m)] = 0.0
  np.testing.assert_allclose(got, want)
  # (c) float reducer onto int array raises like np.add.at; set() casts
  ib = np.arange(15, dtype=np.int64).reshape(3, 5)
  with np.testing.assert_raises(TypeError):
    sp.from_numpy(ib).at[ib > 7].add(1.5)
  with np.testing.assert_raises(TypeError):
    sp.from_numpy(ib).at[np.array([1])].multiply(0.5)
  ok = sp.from_numpy(ib).at[ib > 7].add(2)       # int value is fine
  assert np.dtype(ok.aval().dtype) == np.int64
  fa = rng.standard_normal(6).astype(np.float32)
  g = np.asarray(sp.from_numpy(fa).at[np.array([2])].add(1.5).glom())
  want = fa.copy()
  np.add.at(want, np.array([2]), np.float32(1.5))
  np.testing.assert_allclose(g, want, rtol=1e-6)
