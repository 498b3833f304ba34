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
