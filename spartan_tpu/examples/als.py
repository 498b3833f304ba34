"""Alternating least squares matrix factorization (the reference's ALS /
netflix example family — SURVEY.md §2.5).

Factor updates use the normal-equations form: the Gram matrices
(k×k) are tiny, so the distributed work is the two big matmuls
``R @ V`` / ``R.T @ U`` (fused regions); the small solves happen
driver-side like the reference's per-row lstsq.
"""

from __future__ import annotations

import numpy as np

import spartan_tpu as sp


def fit(R, k: int = 8, iterations: int = 10, reg: float = 0.1, seed: int = 0):
  """Factor ratings ``R (n×m) ≈ U (n×k) @ V.T (k×m)``.

  ``R`` may be dense (array/expr) or a ``sparse.SparseArray`` — the big
  products ``R @ V`` / ``R.T @ U`` then ride the lazy SpMM node
  (``sp.dot`` sparse dispatch), matching the reference's sparse-tile
  netflix/ALS path.  Zeros are treated as ratings of 0 (the reference's
  simple normal-equations ALS), so sparse and dense runs agree exactly."""
  from spartan_tpu.backend import sparse as sps
  is_sparse = isinstance(R, sps.SparseArray)
  if not is_sparse:
    R = sp.lazify(R)
  Rt = R.transpose() if is_sparse else R.T
  n, m = R.shape
  rng = np.random.default_rng(seed)
  U = rng.standard_normal((n, k)) * 0.1
  V = rng.standard_normal((m, k)) * 0.1
  eye = reg * np.eye(k)
  for _ in range(iterations):
    sv = sp.from_numpy(V)
    gram_v = np.asarray(sp.dot(sv.T, sv).glom()) + eye
    rv = np.asarray(sp.dot(R, sv).glom())
    U = np.linalg.solve(gram_v, rv.T).T
    su = sp.from_numpy(U)
    gram_u = np.asarray(sp.dot(su.T, su).glom()) + eye
    ru = np.asarray(sp.dot(Rt, su).glom())
    V = np.linalg.solve(gram_u, ru.T).T
  return U, V


def reconstruction_error(R, U, V):
  from spartan_tpu.backend import sparse as sps
  if isinstance(R, sps.SparseArray):
    R = R.todense()
  R = sp.lazify(R)
  pred = sp.dot(sp.from_numpy(U), sp.from_numpy(V).T)
  return float(sp.mean((R - pred) ** 2).glom())


def run(n: int = 256, m: int = 128, k: int = 8, iterations: int = 10,
        seed: int = 0):
  rng = np.random.default_rng(seed)
  U0 = rng.standard_normal((n, k))
  V0 = rng.standard_normal((m, k))
  R = U0 @ V0.T + 0.01 * rng.standard_normal((n, m))
  U, V = fit(sp.from_numpy(R), k, iterations)
  err = reconstruction_error(sp.from_numpy(R), U, V)
  return U, V, err
