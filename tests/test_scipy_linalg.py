"""Differential tests for the scipy.linalg surface (sp.scipy_linalg).

Every name is checked against scipy.linalg on the 8-device CPU mesh
(f64).  On-device names additionally verify they stay LAZY (return
exprs, not evaluated arrays) until glommed; host-boundary names follow
the sp.linalg.eig eager convention (test_host_boundary_is_eager).
"""

import numpy as np
import pytest
import scipy.linalg as sla

import spartan_tpu as sp

L = sp.scipy_linalg

rng = np.random.default_rng(42)
A = rng.normal(size=(16, 16))
S = A @ A.T + 16 * np.eye(16)
B = rng.normal(size=(16, 16))
b = rng.normal(size=16)


def g(x):
  return np.asarray(sp.lazify(x).glom())


def assert_close(got, want, tol=1e-9):
  got = g(got) if not isinstance(got, np.ndarray) else got
  want = np.asarray(want)
  assert got.shape == want.shape, (got.shape, want.shape)
  denom = np.max(np.abs(want)) + 1e-30
  assert np.max(np.abs(got - want)) / denom < tol


@pytest.mark.smoke
def test_expm_and_action():
  assert_close(L.expm(0.1 * A), sla.expm(0.1 * A), 1e-11)
  # merged into sp.linalg (the array-API merge pattern)
  assert sp.linalg.expm is L.expm


def test_expm_frechet():
  E = rng.normal(size=(16, 16))
  eA, fr = L.expm_frechet(0.05 * A, E)
  eAw, frw = sla.expm_frechet(0.05 * A, E)
  assert_close(eA, eAw, 1e-10)
  assert_close(fr, frw, 1e-8)


@pytest.mark.smoke
def test_lu_reconstruction():
  p, l, u = L.lu(A)
  assert_close(sp.dot(sp.dot(p, l), u), A, 1e-12)
  pl, u2 = L.lu(A, permute_l=True)
  assert_close(sp.dot(pl, u2), A, 1e-12)


def test_lu_factor_solve():
  lu_, piv = L.lu_factor(A)
  x = L.lu_solve((lu_, piv), b)
  assert_close(x, np.linalg.solve(A, b), 1e-10)
  bm = rng.normal(size=(16, 3))
  assert_close(L.lu_solve((lu_, piv), bm), np.linalg.solve(A, bm), 1e-10)


@pytest.mark.smoke
def test_cho_factor_solve():
  c = L.cho_factor(S, lower=True)
  assert_close(L.cho_solve(c, b), np.linalg.solve(S, b), 1e-10)
  c2 = L.cho_factor(S)  # upper (scipy default)
  assert_close(L.cho_solve(c2, b), np.linalg.solve(S, b), 1e-10)


def test_polar():
  u, p = L.polar(A)
  assert_close(sp.dot(u, p), A, 1e-9)
  un = g(u)
  assert np.allclose(un.T @ un, np.eye(16), atol=1e-9)
  # jax's qdwh restricts side='left' to wide operands (m < n)
  T = rng.normal(size=(8, 20))
  u2, p2 = L.polar(T, side="left")
  assert_close(sp.dot(p2, u2), T, 1e-9)


def test_eigh_tridiagonal():
  d, e = rng.normal(size=12), rng.normal(size=11)
  assert_close(L.eigh_tridiagonal(d, e),
               sla.eigh_tridiagonal(d, e, eigvals_only=True), 1e-10)


@pytest.mark.smoke
def test_block_diag_khatri_rao():
  assert_close(L.block_diag(A, B[:3, :3], b[None, :4]),
               sla.block_diag(A, B[:3, :3], b[None, :4]), 1e-14)
  assert_close(L.khatri_rao(A[:3], B[:5]), sla.khatri_rao(A[:3], B[:5]),
               1e-14)


def test_pinvh():
  assert_close(L.pinvh(S), sla.pinvh(S), 1e-9)
  # rank-deficient symmetric
  R = A[:, :5] @ A[:, :5].T
  assert_close(L.pinvh(R), sla.pinvh(R), 1e-8)


@pytest.mark.smoke
def test_structured_constructors():
  c1, r1 = rng.normal(size=7), rng.normal(size=5)
  assert_close(L.toeplitz(c1, r1), sla.toeplitz(c1, r1), 1e-14)
  assert_close(L.toeplitz(c1), sla.toeplitz(c1), 1e-14)
  assert_close(L.circulant(c1), sla.circulant(c1), 1e-14)
  assert_close(L.hankel(c1, r1), sla.hankel(c1, r1), 1e-14)
  assert_close(L.hankel(c1), sla.hankel(c1), 1e-14)
  assert_close(L.companion(np.array([2., 3, 4, 5])),
               sla.companion(np.array([2., 3, 4, 5])), 1e-14)
  assert_close(L.fiedler(c1), sla.fiedler(c1), 1e-14)
  assert_close(L.fiedler_companion(np.array([1., 2, 3, 4])),
               sla.fiedler_companion(np.array([1., 2, 3, 4])), 1e-14)
  assert_close(L.hilbert(9), sla.hilbert(9), 1e-14)
  assert_close(L.invhilbert(6), sla.invhilbert(6), 1e-12)
  assert_close(L.helmert(6), sla.helmert(6), 1e-14)
  assert_close(L.pascal(7), sla.pascal(7), 0.5)  # exact ints
  assert_close(L.leslie(c1[:4], np.abs(c1[:3])),
               sla.leslie(c1[:4], np.abs(c1[:3])), 1e-14)
  for mode in ("full", "same", "valid"):
    assert_close(L.convolution_matrix(c1, 10, mode),
                 sla.convolution_matrix(c1, 10, mode), 1e-14)


def test_convolution_matrix_matches_convolve():
  a, v = rng.normal(size=6), rng.normal(size=9)
  for mode in ("full", "same", "valid"):
    assert_close(sp.dot(L.convolution_matrix(a, 9, mode), v),
                 np.convolve(a, v, mode), 1e-13)


def test_diagnostics():
  assert L.bandwidth(np.triu(A)) == (0, 15)
  assert L.bandwidth(np.tril(A, 2)) == (15, 2)
  assert L.issymmetric(S) and not L.issymmetric(A)
  assert L.ishermitian(S)
  assert L.issymmetric(S + 1e-12 * A, atol=1e-10)


@pytest.mark.smoke
def test_schur_family():
  t, z = L.schur(A)
  assert_close(sp.dot(sp.dot(z, t), sp.transpose(z)), A, 1e-12)
  h, q = L.hessenberg(A, calc_q=True)
  assert_close(sp.dot(sp.dot(q, h), sp.transpose(q)), A, 1e-12)
  assert_close(L.hessenberg(A), sla.hessenberg(A), 1e-12)
  assert_close(L.sqrtm(S), sla.sqrtm(S), 1e-11)
  assert_close(L.logm(S), sla.logm(S), 1e-11)
  assert_close(L.funm(S, np.exp), sla.funm(S, np.exp), 1e-11)
  assert_close(L.signm(S), sla.signm(S), 1e-11)
  for name in ("cosm", "sinm", "tanm", "coshm", "sinhm", "tanhm"):
    assert_close(getattr(L, name)(0.1 * A),
                 getattr(sla, name)(0.1 * A), 1e-11)


def test_matrix_equation_solvers():
  X = L.solve_sylvester(A, B, S)
  assert_close(sp.dot(sp.lazify(A), X) + sp.dot(X, B), S, 1e-10)
  assert_close(L.solve_continuous_lyapunov(A, S),
               sla.solve_continuous_lyapunov(A, S), 1e-10)
  assert_close(L.solve_discrete_lyapunov(0.1 * A, S),
               sla.solve_discrete_lyapunov(0.1 * A, S), 1e-10)


def test_ldl_banded():
  lu_, d_, perm = L.ldl(S, lower=True)
  luw, dw, permw = sla.ldl(S, lower=True)
  assert_close(lu_, luw, 1e-12)
  assert_close(d_, dw, 1e-12)
  assert np.array_equal(perm, permw)
  ab = np.zeros((3, 16))
  ab[0, 1:] = rng.normal(size=15)
  ab[1] = 6 + rng.normal(size=16)
  ab[2, :-1] = rng.normal(size=15)
  assert_close(L.solve_banded((1, 1), ab, b),
               sla.solve_banded((1, 1), ab, b), 1e-12)
  abh = np.zeros((2, 16))
  abh[0, 1:] = 0.1 * rng.normal(size=15)
  abh[1] = 6 + rng.normal(size=16)
  assert_close(L.solveh_banded(abh, b), sla.solveh_banded(abh, b), 1e-12)


def test_orth_null_space():
  M = np.concatenate([A[:, :4], A[:, :4] @ rng.normal(size=(4, 4))],
                     axis=1)
  o = g(L.orth(M))
  assert o.shape == (16, 4)
  assert np.allclose(o.T @ o, np.eye(4), atol=1e-10)
  ns = g(L.null_space(M))
  assert ns.shape == (8, 4)
  assert np.abs(M @ ns).max() < 1e-10
  assert_close(L.subspace_angles(A[:, :3], B[:, :3]),
               sla.subspace_angles(A[:, :3], B[:, :3]), 1e-9)
  Bb, T = L.matrix_balance(A)
  Bw, Tw = sla.matrix_balance(A)
  assert_close(Bb, Bw, 1e-14)
  assert_close(T, Tw, 1e-14)


def test_on_device_names_stay_lazy():
  """The on-device surface must return exprs (no eager evaluation)."""
  from spartan_tpu.expr.base import Expr
  for e in (L.expm(A), L.lu(A)[1], L.cho_factor(S)[0], L.polar(A)[0],
            L.toeplitz(b), L.circulant(b), L.hilbert(8),
            L.khatri_rao(A[:3], B[:4]), L.pinvh(S)):
    assert isinstance(e, Expr) and not isinstance(e, sp.Val), type(e)


def test_host_boundary_is_eager():
  """TRUE Schur-family names are HostExprs — the sp.linalg.eig
  convention (sqrtm/logm/orth moved ON-device in r5)."""
  from spartan_tpu.expr.fio import HostExpr
  assert isinstance(L.funm(S, np.exp), HostExpr)
  assert isinstance(L.solve_sylvester(A, B, S), HostExpr)


def test_matrix_functions_on_device():
  """sqrtm/logm/signm run as fused device kernels (NOT HostExprs) on
  branch-safe inputs; residuals are packed so disp=False is free."""
  from spartan_tpu.expr.fio import HostExpr

  def _no_host(e):
    from spartan_tpu.expr.base import Expr
    assert isinstance(e, Expr) and not isinstance(e, HostExpr), type(e)

  X = L.sqrtm(S)
  _no_host(X)
  assert_close(X, sla.sqrtm(S), 1e-10)
  Xd, err = L.sqrtm(S, disp=False)
  assert err < 1e-10
  _no_host(L.logm(S))
  _no_host(L.signm(S))
  _no_host(L.cosm(0.1 * A))
  _no_host(L.orth(A))
  # non-symmetric but branch-safe (spectrum shifted right of 0)
  G = 0.1 * A + 3 * np.eye(16)
  assert_close(L.sqrtm(G), sla.sqrtm(G), 1e-9)
  assert_close(L.logm(G), sla.logm(G), 1e-9)
  # signm on an indefinite symmetric matrix (mixed-sign spectrum)
  Ind = S - 20.0 * np.eye(16)
  assert_close(L.signm(Ind), sla.signm(Ind), 1e-8)


def test_matrix_functions_host_fallback():
  """Branch-cut inputs (negative real eigenvalues → complex principal
  sqrt/log) gate on the packed residual and fall back to the host
  Schur path — scipy parity everywhere."""
  N = A @ np.diag(np.concatenate([[-2.0, -0.5], 3 + np.arange(14.)])) \
      @ np.linalg.inv(A)
  got = g(L.sqrtm(N))
  want = sla.sqrtm(N)
  assert np.iscomplexobj(got)
  assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 1e-8
  gotl = g(L.logm(N))
  wantl = sla.logm(N)
  assert np.max(np.abs(gotl - wantl)) / np.max(np.abs(wantl)) < 1e-8
  # complex INPUT routes host directly
  from spartan_tpu.expr.fio import HostExpr
  assert isinstance(L.sqrtm(N.astype(complex)), HostExpr)


def test_orth_null_space_rcond_and_wide():
  """rcond= honored; null_space of a WIDE matrix needs full_matrices
  SVD (row space smaller than n)."""
  W = rng.normal(size=(4, 10))
  ns = g(L.null_space(W))
  assert ns.shape == (10, 6)
  assert np.abs(W @ ns).max() < 1e-10
  assert np.allclose(ns.T @ ns, np.eye(6), atol=1e-10)
  # rcond large enough to cut every direction of a scaled matrix
  o = g(L.orth(A[:, :5], rcond=None))
  assert o.shape == (16, 5)
  M2 = np.concatenate([A[:, :3], 1e-12 * A[:, 3:5]], axis=1)
  o2 = g(L.orth(M2, rcond=1e-9))
  assert o2.shape == sla.orth(M2, rcond=1e-9).shape == (16, 3)


def test_linalg_namespace_merge():
  """Non-conflicting names merged into sp.linalg; blocked framework
  implementations keep priority for the overlap."""
  for name in ("expm", "lu", "cho_factor", "polar", "schur", "sqrtm",
               "toeplitz", "block_diag"):
    assert getattr(sp.linalg, name) is getattr(L, name)
  # the overlap keeps the sp.linalg originals (NOT scipy variants)
  import spartan_tpu.linalg as _lin
  assert sp.linalg.cholesky is _lin.cholesky
  assert sp.linalg.solve_triangular is _lin.solve_triangular


def test_gradients_flow_through_on_device_names():
  """sp.grad through expm (the whole surface is map-lowered, so one
  representative suffices)."""
  X = sp.lazify(0.1 * A)
  an = np.asarray(sp.grad(sp.sum(L.expm(X) * L.expm(X)), [X])[0].glom())
  eps = 1e-6
  fd = np.zeros_like(A)
  e0 = float(np.sum(sla.expm(0.1 * A) ** 2))
  for i in range(3):
    Ap = 0.1 * A.copy()
    Ap[0, i] += eps
    fd[0, i] = (float(np.sum(sla.expm(Ap) ** 2)) - e0) / eps
  assert np.allclose(an[0, :3], fd[0, :3], rtol=1e-3, atol=1e-5)


def test_convolution_matrix_kernel_longer_than_n():
  """same/valid offsets trim relative to the SHORTER operand (code
  review r4s3: k > n was shifted)."""
  a, v = rng.normal(size=5), rng.normal(size=3)
  for mode in ("full", "same", "valid"):
    assert_close(sp.dot(L.convolution_matrix(a, 3, mode), v),
                 np.convolve(a, v, mode), 1e-13)
    assert_close(L.convolution_matrix(a, 3, mode),
                 sla.convolution_matrix(a, 3, mode), 1e-14)


def test_exact_constructors_return_host_arrays():
  """exact=True integer matrices exceed int64 — returned as exact
  HOST numpy arrays (code review r4s3: the device route crashed)."""
  m = L.pascal(36, exact=True)
  assert isinstance(m, np.ndarray)
  assert (m == sla.pascal(36, exact=True)).all()
  ih = L.invhilbert(6, exact=True)
  assert isinstance(ih, np.ndarray)
  assert (ih == sla.invhilbert(6, exact=True)).all()


def test_ishermitian_complex():
  Ac = np.array([[1.0, 1j], [1j, 1.0]])  # symmetric, NOT hermitian
  assert L.issymmetric(np.real(Ac) * 0 + np.eye(2))
  assert not L.ishermitian(Ac)
  H = np.array([[2.0, 1 - 1j], [1 + 1j, 3.0]])
  assert L.ishermitian(H)


def test_companion_rejects_zero_leading():
  import pytest as _pt
  with _pt.raises(ValueError):
    L.companion(np.array([0., 1., 2.]))


# ---------------------------------------------------------------------------
# r5 parity sweep: remaining scipy.linalg names
# ---------------------------------------------------------------------------

def test_diagsvd_hadamard_invpascal():
  s = np.array([3.0, 2.0, 1.0])
  np.testing.assert_array_equal(g(L.diagsvd(s, 5, 3)),
                                sla.diagsvd(s, 5, 3))
  np.testing.assert_array_equal(g(L.diagsvd(s, 3, 6)),
                                sla.diagsvd(s, 3, 6))
  np.testing.assert_array_equal(L.hadamard(8), sla.hadamard(8))
  np.testing.assert_array_equal(g(L.hadamard(4, dtype=float)),
                                sla.hadamard(4, dtype=float))
  with pytest.raises(ValueError):
    L.hadamard(6)
  np.testing.assert_array_equal(L.invpascal(5), sla.invpascal(5))
  np.testing.assert_allclose(g(L.invpascal(5, exact=False)),
                             sla.invpascal(5, exact=False))


def test_rq_reconstruction():
  for shape, mode in [((6, 6), "full"), ((4, 7), "full"), ((7, 4), "full"),
                      ((4, 7), "economic"), ((7, 4), "economic")]:
    M = rng.normal(size=shape)
    R, Q = L.rq(M, mode=mode)
    Rv, Qv = g(R), g(Q)
    wr, wq = sla.rq(M, mode=mode)
    assert Rv.shape == wr.shape and Qv.shape == wq.shape
    np.testing.assert_allclose(Rv @ Qv, M, atol=1e-10)
    np.testing.assert_allclose(Qv @ Qv.T, np.eye(Qv.shape[0]), atol=1e-10)
    # same structural-zero pattern as scipy's R (signs may differ)
    np.testing.assert_allclose(Rv[wr == 0], 0, atol=1e-10)
  Ronly = g(L.rq(rng.normal(size=(5, 5)), mode="r"))
  assert Ronly.shape == (5, 5)


def test_orthogonal_procrustes():
  M = rng.normal(size=(9, 4))
  w = rng.normal(size=(4, 4))
  qw, _ = np.linalg.qr(w)
  Bm = M @ qw + 0.01 * rng.normal(size=(9, 4))
  R, scale = L.orthogonal_procrustes(M, Bm)
  wR, wscale = sla.orthogonal_procrustes(M, Bm)
  np.testing.assert_allclose(g(R), wR, atol=1e-9)
  assert abs(scale - wscale) < 1e-8 * abs(wscale)


def test_fractional_matrix_power():
  M = 0.1 * rng.normal(size=(12, 12)) + 2 * np.eye(12)
  for t in [3, -2, 0.5, 1.7, -0.3]:
    got = g(L.fractional_matrix_power(M, t))
    want = sla.fractional_matrix_power(M, t)
    np.testing.assert_allclose(got, np.real(want), atol=2e-8)
  # branch-cut spectrum → host fallback, complex result matches scipy
  N = A @ np.diag(np.concatenate([[-2.0], 2 + np.arange(15.)])) \
      @ np.linalg.inv(A)
  got = g(L.fractional_matrix_power(N, 0.5))
  np.testing.assert_allclose(got, sla.fractional_matrix_power(N, 0.5),
                             atol=1e-7)


@pytest.mark.smoke
def test_matmul_toeplitz_and_solves():
  c = rng.normal(size=6)
  r = np.concatenate([[c[0]], rng.normal(size=4)])
  x1 = rng.normal(size=5)
  x2 = rng.normal(size=(5, 3))
  for x in (x1, x2):
    got = g(L.matmul_toeplitz((c, r), x))
    np.testing.assert_allclose(got, sla.matmul_toeplitz((c, r), x),
                               atol=1e-10)
  got = g(L.matmul_toeplitz(c, rng.normal(size=6)))
  assert got.shape == (6,)
  # circulant solve, well-conditioned
  cc = np.array([5.0, 1, 0.5, 0.2])
  b = rng.normal(size=4)
  np.testing.assert_allclose(g(L.solve_circulant(cc, b)),
                             sla.solve_circulant(cc, b), atol=1e-10)
  B2 = rng.normal(size=(4, 2))
  np.testing.assert_allclose(g(L.solve_circulant(cc, B2)),
                             sla.solve_circulant(cc, B2), atol=1e-10)
  # singular handling
  csing = np.array([1.0, -1.0, 1.0, -1.0])
  with pytest.raises(np.linalg.LinAlgError):
    L.solve_circulant(csing, b)
  np.testing.assert_allclose(
      g(L.solve_circulant(csing, b, singular="lstsq")),
      sla.solve_circulant(csing, b, singular="lstsq"), atol=1e-10)
  # Toeplitz SOLVE is host-boundary Levinson
  np.testing.assert_allclose(g(L.solve_toeplitz((c[:5], r), x1)),
                             sla.solve_toeplitz((c[:5], r), x1),
                             atol=1e-10)


def test_cdf2rdf():
  M = rng.normal(size=(6, 6))
  w, v = np.linalg.eig(M)
  wr, vr = L.cdf2rdf(w, v)
  wwr, wvr = sla.cdf2rdf(w, v)
  np.testing.assert_allclose(wr, wwr, atol=1e-12)
  np.testing.assert_allclose(vr, wvr, atol=1e-12)
  # the real form reconstructs the matrix
  np.testing.assert_allclose(vr @ wr @ np.linalg.inv(vr), M, atol=1e-8)


def test_qz_and_banded_host_wrappers():
  M = rng.normal(size=(6, 6))
  Bq = rng.normal(size=(6, 6))
  AA, BB, Q, Z = (g(x) for x in L.qz(M, Bq))
  np.testing.assert_allclose(Q @ AA @ Z.T, M, atol=1e-9)
  np.testing.assert_allclose(Q @ BB @ Z.T, Bq, atol=1e-9)
  res = L.ordqz(M, Bq, sort="lhp")
  assert len(res) == 6
  # banded eigh: tridiagonal comparison vs dense eigh
  d = rng.normal(size=8) + 4
  e = rng.normal(size=7)
  band = np.zeros((2, 8)); band[0, 1:] = e; band[1] = d
  T = np.diag(d) + np.diag(e, 1) + np.diag(e, -1)
  w, v = L.eig_banded(band)
  np.testing.assert_allclose(g(w), np.linalg.eigvalsh(T), atol=1e-10)
  np.testing.assert_allclose(g(L.eigvals_banded(band)),
                             np.linalg.eigvalsh(T), atol=1e-10)
  np.testing.assert_allclose(g(L.eigvalsh_tridiagonal(d, e)),
                             np.linalg.eigvalsh(T), atol=1e-10)
  # banded cholesky + solve
  ab = g(L.cholesky_banded(band))
  np.testing.assert_allclose(ab, sla.cholesky_banded(band), atol=1e-10)
  b = rng.normal(size=8)
  np.testing.assert_allclose(g(L.cho_solve_banded((ab, False), b)),
                             np.linalg.solve(T, b), atol=1e-10)


def test_riccati_and_qr_updates():
  n = 4
  a = rng.normal(size=(n, n)) - 3 * np.eye(n)
  b = rng.normal(size=(n, 2))
  q = np.eye(n)
  r = np.eye(2)
  X = g(L.solve_continuous_are(a, b, q, r))
  np.testing.assert_allclose(
      a.T @ X + X @ a - X @ b @ np.linalg.inv(r) @ b.T @ X + q,
      0, atol=1e-8)
  Xd = g(L.solve_discrete_are(a * 0.1, b, q, r))
  assert Xd.shape == (n, n)
  # qr_update matches re-factorization
  M = rng.normal(size=(6, 4))
  Q, R = np.linalg.qr(M)
  u = rng.normal(size=6)
  v = rng.normal(size=4)
  Q1, R1 = L.qr_update(Q, R, u, v)
  np.testing.assert_allclose(Q1 @ R1, M + np.outer(u, v), atol=1e-10)
  Q2, R2 = L.qr_delete(Q, R, 1, which="row")
  np.testing.assert_allclose(Q2 @ R2, np.delete(M, 1, axis=0), atol=1e-10)
  c = float(L.expm_cond(0.1 * rng.normal(size=(5, 5))))
  assert c > 0


def test_clarkson_woodruff_sketch():
  M = rng.normal(size=(64, 8))
  S = g(L.clarkson_woodruff_transform(M, 16, rng=np.random.default_rng(5)))
  assert S.shape == (16, 8)
  # norm preservation in expectation (loose sanity bound)
  assert 0.3 < np.linalg.norm(S) / np.linalg.norm(M) < 3.0


def test_cossin_host():
  from scipy.stats import ortho_group
  X = ortho_group.rvs(6, random_state=3)
  u, cs, vdh = L.cossin(X, p=3, q=3)
  np.testing.assert_allclose(u @ cs @ vdh, X, atol=1e-10)


def test_scipy_parity_audit_is_clean():
  """The five-namespace scipy audit must stay at zero in-scope missing
  names and zero stale classification entries (tools/scipy_parity.py;
  docs/PARITY_SCIPY.md is generated from the same rows)."""
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "scipy_parity", "tools/scipy_parity.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  for r in mod.audit():
    assert r["missing"] == [], \
        f"scipy.{r['ns']} parity regressed: {r['missing']}"
    assert r["stale"] == [], \
        f"scipy.{r['ns']} stale classification: {r['stale']}"
