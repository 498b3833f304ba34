"""sp.linalg — np.linalg-style surface over the distributed primitives
(reference shipped these as example programs; SURVEY.md §2.5)."""

import numpy as np
import pytest

import spartan_tpu as sp


def _spd(n, rng):
  m = rng.standard_normal((n, n))
  return m @ m.T + n * np.eye(n)


def test_cholesky(rng):
  a = _spd(96, rng)
  L = np.asarray(sp.linalg.cholesky(sp.from_numpy(a), block=32).glom())
  np.testing.assert_allclose(L, np.linalg.cholesky(a), rtol=1e-9,
                             atol=1e-9)


def test_solve_triangular_vector(rng):
  n = 96
  L = np.tril(rng.standard_normal((n, n))) + n * np.eye(n)
  b = rng.standard_normal(n)
  x = np.asarray(sp.linalg.solve_triangular(
      sp.from_numpy(L), sp.from_numpy(b), lower=True, block=32).glom())
  np.testing.assert_allclose(L @ x, b, rtol=1e-9, atol=1e-9)
  u = L.T
  xu = np.asarray(sp.linalg.solve_triangular(
      sp.from_numpy(u), sp.from_numpy(b), lower=False, block=32).glom())
  np.testing.assert_allclose(u @ xu, b, rtol=1e-9, atol=1e-9)


def test_solve_triangular_matrix_rhs(rng):
  n = 64
  L = np.tril(rng.standard_normal((n, n))) + n * np.eye(n)
  B = rng.standard_normal((n, 3))
  X = np.asarray(sp.linalg.solve_triangular(
      sp.from_numpy(L), sp.from_numpy(B), lower=True, block=32).glom())
  np.testing.assert_allclose(L @ X, B, rtol=1e-9, atol=1e-9)


def test_solve_spd_direct_and_cg(rng):
  a = _spd(96, rng)
  b = rng.standard_normal(96)
  want = np.linalg.solve(a, b)
  x = np.asarray(sp.linalg.solve(sp.from_numpy(a), sp.from_numpy(b),
                                 block=32).glom())
  np.testing.assert_allclose(x, want, rtol=1e-8, atol=1e-8)
  xcg = np.asarray(sp.linalg.solve(sp.from_numpy(a), sp.from_numpy(b),
                                   method="cg", tol=1e-12).glom())
  np.testing.assert_allclose(xcg, want, rtol=1e-7, atol=1e-7)


def test_lstsq(rng):
  X = rng.standard_normal((256, 8))
  y = rng.standard_normal(256)
  want = np.linalg.lstsq(X, y, rcond=None)[0]
  w = np.asarray(sp.linalg.lstsq(sp.from_numpy(X),
                                 sp.from_numpy(y)).glom())
  np.testing.assert_allclose(w, want, rtol=1e-8, atol=1e-8)


def test_qr(rng):
  X = rng.standard_normal((512, 12))
  Q, R = sp.linalg.qr(sp.from_numpy(X))
  q, r = np.asarray(Q.glom()), np.asarray(R.glom())
  np.testing.assert_allclose(q.T @ q, np.eye(12), atol=1e-10)
  np.testing.assert_allclose(q @ r, X, atol=1e-10)
  assert np.allclose(r, np.triu(r))


def test_eigvalsh_lanczos(rng):
  m = rng.standard_normal((128, 128))
  a = (m + m.T) / 2
  want = np.linalg.eigvalsh(a)[-3:]
  got = sp.linalg.eigvalsh_lanczos(sp.from_numpy(a), k=3, m=64)
  np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_svd_lowrank(rng):
  X = rng.standard_normal((256, 32)) @ rng.standard_normal((32, 16))
  U, s, Vt = sp.linalg.svd_lowrank(sp.from_numpy(X), k=4, iterations=30)
  want = np.linalg.svd(X, compute_uv=False)[:4]
  np.testing.assert_allclose(s, want, rtol=1e-6)
  np.testing.assert_allclose(U @ np.diag(s) @ Vt,
                             (U * s) @ Vt, atol=1e-9)
