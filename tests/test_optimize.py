"""Differential tests for sp.optimize vs scipy.optimize.

Both calling conventions are exercised: expr-native residuals (lazy
DAG on a Val leaf) and jax-traceable callables (wrapped via one map
node) — they must agree with each other and with scipy.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.optimize as sopt

import spartan_tpu as sp

O = sp.optimize

rng = np.random.default_rng(3)
t = np.linspace(0, 3, 60)
TRUE = np.array([2.5, 1.3, 0.4])
y = TRUE[0] * np.exp(-TRUE[1] * t) + TRUE[2] + 1e-3 * rng.normal(size=60)


def _res_np(p):
  return p[0] * np.exp(-p[1] * t) + p[2] - y


@pytest.mark.smoke
def test_least_squares_both_routes():
  want = sopt.least_squares(_res_np, np.ones(3)).x

  def res_jax(p):
    return p[0] * jnp.exp(-p[1] * t) + p[2] - y

  r = O.least_squares(res_jax, np.ones(3))
  assert r.success and np.abs(r.x - want).max() < 1e-6

  def res_expr(p):
    return p[0] * sp.exp(-p[1] * sp.Val(t)) + p[2] - sp.Val(y)

  r2 = O.least_squares(res_expr, np.ones(3))
  assert r2.success and np.abs(r2.x - want).max() < 1e-6
  # result fields (scipy contract)
  assert r.fun.shape == (60,) and r.jac.shape == (60, 3)
  assert r.cost == pytest.approx(0.5 * np.dot(r.fun, r.fun))
  assert r.optimality == np.abs(r.grad).max()


def test_least_squares_gn_and_status():
  def res(p):
    return jnp.stack([p[0] - 2.0, 3.0 * (p[1] + 1.0)])

  r = O.least_squares(res, np.zeros(2), method="gn")
  assert r.success and np.abs(r.x - [2.0, -1.0]).max() < 1e-9
  # 'trf' is the bounded route (projected LM) and also works unbounded
  r2 = O.least_squares(res, np.zeros(2), method="trf")
  assert r2.success and np.abs(r2.x - [2.0, -1.0]).max() < 1e-8
  with pytest.raises(ValueError):
    O.least_squares(res, np.zeros(2), method="dogbox")
  with pytest.raises(ValueError):  # scipy contract: lm rejects bounds
    O.least_squares(res, np.zeros(2), method="lm",
                    bounds=([0.0, -2.0], [5.0, 5.0]))


@pytest.mark.smoke
def test_curve_fit_matches_scipy():
  def f(x, a, b, c):
    return a * jnp.exp(-b * x) + c

  popt, pcov = O.curve_fit(f, t, y, p0=np.ones(3))
  pw, pcw = sopt.curve_fit(lambda x, a, b, c: a * np.exp(-b * x) + c,
                           t, y, p0=np.ones(3))
  assert np.abs(popt - pw).max() < 1e-5
  assert np.abs(pcov - pcw).max() < 1e-6


def test_curve_fit_sigma_and_p0_inference():
  sigma = np.full(60, 0.5)

  def f(x, a, b, c):
    return a * jnp.exp(-b * x) + c

  popt, pcov = O.curve_fit(f, t, y, sigma=sigma)  # p0 inferred as ones
  pw, pcw = sopt.curve_fit(lambda x, a, b, c: a * np.exp(-b * x) + c,
                           t, y, sigma=sigma)
  assert np.abs(popt - pw).max() < 1e-5
  assert np.abs(pcov - pcw).max() < 1e-5
  pa, ca = O.curve_fit(f, t, y, sigma=sigma, absolute_sigma=True)
  _, caw = sopt.curve_fit(lambda x, a, b, c: a * np.exp(-b * x) + c,
                          t, y, sigma=sigma, absolute_sigma=True)
  assert np.abs(ca - caw).max() < 1e-5


@pytest.mark.smoke
def test_root_vector():
  def fv(p):
    return jnp.array([p[0] ** 2 + p[1] - 3.0, p[0] - p[1] ** 3 + 1.0])

  r = O.root(fv, np.array([1.0, 1.0]))
  want = sopt.root(lambda p: [p[0] ** 2 + p[1] - 3, p[0] - p[1] ** 3 + 1],
                   [1.0, 1.0]).x
  assert r.success and np.abs(r.x - want).max() < 1e-8
  assert np.abs(r.fun).max() < 1e-9


def test_scalar_rootfinding():
  assert abs(O.bisect(lambda x: x ** 3 - 2, 0.0, 2.0)
             - 2 ** (1 / 3)) < 1e-10
  assert abs(O.newton(lambda x: x ** 2 - 2.0, 1.0) - np.sqrt(2)) < 1e-8
  rs = O.root_scalar(lambda x: jnp.cos(x) - x, bracket=[0.0, 1.0])
  assert rs.converged and abs(rs.root - 0.7390851332151607) < 1e-9
  rs2 = O.root_scalar(lambda x: jnp.cos(x) - x, x0=0.5, method="newton")
  assert rs2.converged and abs(rs2.root - 0.7390851332151607) < 1e-7
  with pytest.raises(ValueError):
    O.bisect(lambda x: x ** 2 + 1, -1.0, 1.0)  # no sign change


def test_minimize_scalar():
  ms = O.minimize_scalar(lambda x: (x - 1.7) ** 2 + 0.3,
                         bounds=(0.0, 5.0))
  assert ms.success and abs(ms.x - 1.7) < 1e-7
  assert ms.fun == pytest.approx(0.3, abs=1e-9)


@pytest.mark.smoke
def test_minimize_callable_and_expr():
  def rosen(p):
    return jnp.sum(100 * (p[1:] - p[:-1] ** 2) ** 2 + (1 - p[:-1]) ** 2)

  m = O.minimize(rosen, np.zeros(4))
  assert m.success and np.abs(m.x - 1).max() < 1e-5
  pl = sp.lazify(np.zeros(3))
  loss = sp.sum((pl - np.array([1., 2., 3.])) ** 2)
  m2 = O.minimize(loss, wrt=[pl])
  assert m2.success and np.abs(np.asarray(m2.x) - [1, 2, 3]).max() < 1e-8
  with pytest.raises(ValueError):
    O.minimize(loss)  # expr form needs wrt


def test_host_wrappers():
  C = rng.random((6, 6))
  ri, ci = O.linear_sum_assignment(C)
  rw, cw = sopt.linear_sum_assignment(C)
  assert np.array_equal(ri, rw) and np.array_equal(ci, cw)
  A, b = rng.random((8, 4)), rng.random(8)
  xs, rn = O.nnls(A, b)
  xw, rnw = sopt.nnls(A, b)
  assert np.abs(xs - xw).max() < 1e-10 and abs(rn - rnw) < 1e-10


def test_optimize_result_attr_access():
  r = O.OptimizeResult(x=1, success=True)
  assert r.x == 1 and r["success"]
  with pytest.raises(AttributeError):
    _ = r.nope


# ---------------------------------------------------------------------
# round 5: bounds, honest diagnostics, probe-error surfacing
# ---------------------------------------------------------------------

def test_least_squares_bounds_vs_scipy():
  # unconstrained optimum (5, -3) is OUTSIDE the box — the projected LM
  # must land on scipy TRF's constrained answer
  def res_np(p):
    return np.asarray([p[0] - 5.0, p[1] + 3.0, 0.1 * (p[0] - p[1])])

  def res_j(p):
    return jnp.stack([p[0] - 5.0, p[1] + 3.0, 0.1 * (p[0] - p[1])])

  bounds = ([0.0, -1.0], [2.0, 1.0])
  # interior start: scipy TRF converges — differential row
  want = sopt.least_squares(res_np, np.array([1.0, 0.0]), bounds=bounds)
  got = O.least_squares(res_j, np.array([1.0, 0.0]), bounds=bounds)
  assert got.success
  assert np.abs(got.x - want.x).max() < 1e-6
  assert got.cost == pytest.approx(want.cost, rel=1e-8)
  # optimality is the projected-gradient KKT measure at active bounds
  assert got.optimality < 1e-6 or got.status in (2, 3)
  # boundary start: scipy 1.17 TRF stalls at x0 (ftol, cost 17) — the
  # projected LM must still reach the constrained optimum (2, -1)
  gb = O.least_squares(res_j, np.zeros(2), bounds=bounds)
  assert np.abs(gb.x - [2.0, -1.0]).max() < 1e-6 and gb.cost < 6.546
  # bounds that do NOT bind reproduce the unbounded answer
  free = O.least_squares(res_j, np.zeros(2), bounds=([-10, -10], [10, 10]))
  unb = O.least_squares(res_j, np.zeros(2))
  assert np.abs(free.x - unb.x).max() < 1e-7


def test_curve_fit_with_bounded_lsq_kw():
  # curve_fit rides least_squares; a binding bound flows through
  def f(x, a, b):
    return a * x + b

  xs = np.linspace(0, 1, 40)
  ys = 3.0 * xs + 0.5
  popt, _ = O.curve_fit(f, xs, ys, p0=[1.0, 0.0],
                        bounds=([0.0, 0.0], [2.0, 1.0]))
  wopt, _ = sopt.curve_fit(f, xs, ys, p0=[1.0, 0.0],
                           bounds=([0.0, 0.0], [2.0, 1.0]))
  assert np.abs(popt - wopt).max() < 1e-5


def test_minimize_bounds_vs_scipy():
  def rosen_j(p):
    return jnp.sum(100 * (p[1:] - p[:-1] ** 2) ** 2 + (1 - p[:-1]) ** 2)

  def rosen_np(p):
    return np.sum(100 * (p[1:] - p[:-1] ** 2) ** 2 + (1 - p[:-1]) ** 2)

  bounds = [(-2.0, 0.8), (-2.0, 0.8)]
  want = sopt.minimize(rosen_np, np.zeros(2), method="L-BFGS-B",
                       bounds=bounds)
  got = O.minimize(rosen_j, np.zeros(2), bounds=bounds)
  assert got.success
  assert got.fun == pytest.approx(want.fun, rel=1e-6, abs=1e-8)
  assert np.abs(got.x - want.x).max() < 1e-4
  # quadratic with infeasible optimum: lands exactly on the box corner
  c = np.array([4.0, -7.0, 0.2])
  q = lambda p: jnp.sum((p - c) ** 2)
  g2 = O.minimize(q, np.zeros(3), bounds=[(-1, 1)] * 3)
  assert g2.success
  assert np.abs(g2.x - np.clip(c, -1, 1)).max() < 1e-7
  # scipy Bounds object form
  g3 = O.minimize(q, np.zeros(3),
                  bounds=sopt.Bounds(-np.ones(3), np.ones(3)))
  assert np.abs(g3.x - np.clip(c, -1, 1)).max() < 1e-7


def test_root_scalar_honest_diagnostics():
  rs = O.root_scalar(lambda x: jnp.cos(x) - x, bracket=[0.0, 1.0],
                     maxiter=100)
  assert rs.converged and 0 < rs.iterations < 100
  assert rs.function_calls == 2 + 2 * rs.iterations
  # too-few iterations: converged must be False (criterion not met)
  rs2 = O.root_scalar(lambda x: jnp.cos(x) - x, bracket=[0.0, 1.0],
                      maxiter=3, xtol=1e-12)
  assert not rs2.converged and rs2.iterations == 3
  rsn = O.root_scalar(lambda x: jnp.cos(x) - x, x0=0.5, method="newton")
  assert rsn.converged and 0 < rsn.iterations < 50


def test_scalar_x0_least_squares():
  # scipy allows scalar x0; the leaf is built from the raveled vector
  r = O.least_squares(lambda p: p - 3.0, 0.0)
  assert r.success and abs(float(r.x[0]) - 3.0) < 1e-9
  # 2-D x0 is raveled the same way
  r2 = O.least_squares(lambda p: p - jnp.arange(4.0),
                       np.zeros((2, 2)))
  assert r2.success and np.abs(r2.x - np.arange(4.0)).max() < 1e-9


def test_expr_native_objective_error_surfaces():
  def buggy(p):
    raise ValueError("intentional bug in objective")

  with pytest.raises(RuntimeError, match="buggy"):
    O.least_squares(buggy, np.zeros(2))
  with pytest.raises(RuntimeError, match="buggy"):
    O.minimize(buggy, np.zeros(2))


# ---------------------------------------------------------------------------
# r5 parity sweep: scalar roots, simplex, global optimizers, wrappers
# ---------------------------------------------------------------------------

def test_rosen_family_matches_scipy():
  x = np.array([1.3, 0.7, 0.8, 1.9, 1.2])
  assert abs(float(np.asarray(sp.lazify(
      sp.optimize.rosen(x)).glom())) - sopt.rosen(x)) < 1e-10
  np.testing.assert_allclose(
      np.asarray(sp.lazify(sp.optimize.rosen_der(x)).glom()),
      sopt.rosen_der(x), atol=1e-10)
  np.testing.assert_allclose(sp.optimize.rosen_hess(x),
                             sopt.rosen_hess(x), atol=1e-10)
  p = np.array([0.1, -0.2, 0.3, 0.4, -0.5])
  np.testing.assert_allclose(sp.optimize.rosen_hess_prod(x, p),
                             sopt.rosen_hess_prod(x, p), atol=1e-10)


@pytest.mark.smoke
def test_brentq_ridder_match_scipy():
  f = lambda x: x**3 - 2 * x - 5
  want = sopt.brentq(f, 2, 3, xtol=1e-13)
  for name in ("brentq", "brenth", "ridder", "toms748"):
    got = getattr(sp.optimize, name)(f, 2, 3, xtol=1e-13)
    assert abs(got - want) < 1e-10, name
  r, info = sp.optimize.brentq(f, 2, 3, xtol=1e-13, full_output=True)
  assert info.converged and info.iterations > 0
  with pytest.raises(ValueError):
    sp.optimize.brentq(f, 3, 4)
  # a stiff one
  g = lambda x: jnp.exp(x) - 10.0
  assert abs(sp.optimize.brentq(g, 0, 5) - np.log(10)) < 1e-10


def test_fixed_point_matches_scipy():
  f = lambda x: jnp.sqrt(10.0 / (x + 4.0))
  got = sp.optimize.fixed_point(f, 1.5)
  want = sopt.fixed_point(lambda x: np.sqrt(10.0 / (x + 4.0)), 1.5)
  assert abs(float(np.asarray(got)) - float(want)) < 1e-7
  # vector + plain iteration
  fv = lambda x: jnp.array([0.5, 0.25]) * x + jnp.array([1.0, 2.0])
  gotv = sp.optimize.fixed_point(fv, np.zeros(2), method="iteration",
                                 maxiter=2000)
  np.testing.assert_allclose(np.asarray(gotv), [2.0, 8.0 / 3], atol=1e-6)


def test_fmin_nelder_mead():
  # scipy's own rosen is not jax-traceable (np.asanyarray on tracers);
  # the expr-native sp.optimize.rosen exercises the probe's Expr path
  x = sp.optimize.fmin(sp.optimize.rosen, np.array([1.3, 0.9]),
                       xtol=1e-8, ftol=1e-12, maxiter=2000)
  np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-3)
  xf, fx, it, fc, flag = sp.optimize.fmin(
      lambda p: jnp.sum((p - 3.0) ** 2), np.zeros(3), xtol=1e-9,
      ftol=1e-14, full_output=True)
  np.testing.assert_allclose(xf, 3.0, atol=1e-4)
  assert flag == 0 and it > 0


def test_legacy_min_frontends():
  f = lambda p: jnp.sum((p - 2.0) ** 2) + p[0] * p[1] * 0.1
  for name in ("fmin_bfgs", "fmin_cg", "fmin_ncg"):
    x = getattr(sp.optimize, name)(f, np.zeros(2))
    g = np.asarray(x)
    # analytic optimum of f: grad = 2(x-2) + 0.1*swap = 0
    A = np.array([[2.0, 0.1], [0.1, 2.0]])
    np.testing.assert_allclose(g, np.linalg.solve(A, [4.0, 4.0]),
                               atol=1e-5)
  x, fv, info = sp.optimize.fmin_l_bfgs_b(
      lambda p: jnp.sum((p - 2.0) ** 2), np.zeros(2),
      bounds=[(0, 1.0), (0, 1.0)])
  np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-6)
  assert info["warnflag"] == 0
  x, nit, rc = sp.optimize.fmin_tnc(
      lambda p: jnp.sum(p ** 2), np.ones(2) * 0.5,
      bounds=[(0.2, 1.0), (0.2, 1.0)])
  np.testing.assert_allclose(x, [0.2, 0.2], atol=1e-6)


def test_leastsq_fsolve_wrappers():
  def resid(p):
    return jnp.stack([p[0] * 2.0 - 3.0, p[1] + 1.0, p[0] - p[1] - 2.0])
  x, ier = sp.optimize.leastsq(resid, np.zeros(2))
  want = sopt.leastsq(lambda p: [p[0] * 2 - 3, p[1] + 1, p[0] - p[1] - 2],
                      np.zeros(2))[0]
  np.testing.assert_allclose(np.asarray(x), want, atol=1e-6)
  assert ier == 1
  def F(p):
    return jnp.stack([p[0] ** 2 - 4.0, p[1] - 1.0])
  xr = sp.optimize.fsolve(F, np.array([1.0, 0.0]))
  np.testing.assert_allclose(np.asarray(xr), [2.0, 1.0], atol=1e-8)


def test_lsq_linear_bounded_matches_scipy():
  rng = np.random.default_rng(3)
  A = rng.normal(size=(20, 5))
  b = rng.normal(size=20)
  lb = np.zeros(5)
  ub = np.full(5, 0.4)
  got = sp.optimize.lsq_linear(A, b, bounds=(lb, ub), tol=1e-12)
  want = sopt.lsq_linear(A, b, bounds=(lb, ub), tol=1e-12)
  assert got.cost <= want.cost * (1 + 1e-6)
  np.testing.assert_allclose(got.x, want.x, atol=1e-5)
  # unbounded short-circuit = lstsq
  got_u = sp.optimize.lsq_linear(A, b)
  want_u, *_ = np.linalg.lstsq(A, b, rcond=None)
  np.testing.assert_allclose(got_u.x, want_u, atol=1e-8)


@pytest.mark.smoke
def test_differential_evolution_device():
  # multimodal: Ackley-ish in 2-D; global optimum at (pi, 2)
  def f(p):
    return ((p[0] - jnp.pi) ** 2 + (p[1] - 2.0) ** 2
            + 2.0 * jnp.sin(5 * p[0]) ** 2 * jnp.sin(3 * p[1]) ** 2)
  res = sp.optimize.differential_evolution(
      f, [(0, 6), (0, 6)], seed=1, tol=1e-8, maxiter=300)
  assert res.success
  np.testing.assert_allclose(res.x, [np.pi, 2.0], atol=1e-3)
  assert res.fun < 1e-5


def test_brute_device_grid():
  f = lambda p: jnp.squeeze((p[0] - 1.5) ** 2)
  x = sp.optimize.brute(f, [(-3, 3)], Ns=31)
  assert abs(float(x) - 1.5) < 1e-4
  x2, f2, grid, fvals = sp.optimize.brute(
      lambda p: (p[0] - 1.0) ** 2 + (p[1] + 0.5) ** 2,
      [(-2, 2), (-2, 2)], Ns=11, full_output=True)
  np.testing.assert_allclose(x2, [1.0, -0.5], atol=1e-4)
  assert fvals.shape == (11, 11)


def test_scalar_min_frontends():
  f = lambda x: (x - 1.2) ** 2 + 3.0
  assert abs(sp.optimize.fminbound(f, -4, 4, xtol=1e-10) - 1.2) < 1e-6
  assert abs(sp.optimize.brent(f, brack=(-4, 0, 4)) - 1.2) < 1e-5
  assert abs(sp.optimize.golden(f, brack=(-4, 0, 4)) - 1.2) < 1e-5
  xa, xb, xc, fa, fb, fc, calls = sp.optimize.bracket(
      lambda x: float(f(x)), -5.0, -4.0)
  assert fb < fa and fb < fc and (xa < xb < xc or xc < xb < xa)


def test_derivative_helpers_and_classes():
  f = lambda x: float(np.sum(x ** 2))
  g = lambda x: 2 * x
  x0 = np.array([1.0, -2.0, 0.5])
  err = sp.optimize.check_grad(f, g, x0)
  assert err < 1e-5
  fp = sp.optimize.approx_fprime(x0, f)
  np.testing.assert_allclose(fp, 2 * x0, atol=1e-5)
  b = sp.optimize.Bounds(np.zeros(2), np.ones(2))
  lo_r, hi_r = b.residual(np.array([0.25, 0.5]))
  np.testing.assert_allclose(lo_r, [0.25, 0.5])
  lc = sp.optimize.LinearConstraint(np.eye(2), 0, 1)
  assert lc.A.shape == (2, 2)
  rr = sp.optimize.RootResults(1.5, 10, 12, 0, method="brentq")
  assert rr.converged and "1.5" in repr(rr)
  assert issubclass(sp.optimize.OptimizeWarning, UserWarning)
  # quasi-Newton classes round-trip (scipy machinery re-exports)
  H = sp.optimize.BFGS()
  H.initialize(2, "hess")
  assert isinstance(H, sp.optimize.HessianUpdateStrategy)


def test_host_boundary_optimizers():
  res = sp.optimize.linprog(np.array([1.0, 2.0]),
                            A_ub=np.array([[-1.0, -1.0]]),
                            b_ub=np.array([-1.0]), bounds=[(0, None)] * 2)
  assert res.success and abs(res.fun - 1.0) < 1e-8
  y = sp.optimize.isotonic_regression(np.array([3.0, 1.0, 2.0]))
  assert np.all(np.diff(y.x) >= 0)
  x = sp.optimize.broyden1(
      lambda v: np.asarray([v[0] + 0.5 * v[1] - 1.0,
                            0.5 * v[0] + v[1] - 2.0]),
      np.zeros(2), f_tol=1e-12)
  np.testing.assert_allclose(x, np.linalg.solve(
      np.array([[1.0, 0.5], [0.5, 1.0]]), [1.0, 2.0]), atol=1e-8)
  sol = sp.optimize.fmin_slsqp(
      lambda p: np.sum((p - 2.0) ** 2), np.zeros(2),
      bounds=[(0.0, 1.0)] * 2, iprint=0)
  np.testing.assert_allclose(sol, [1.0, 1.0], atol=1e-6)


def test_code_review_r5_regressions():
  """Fixes from the r5s5 review pass: Bounds-object DE, complex-step
  brute slices, catchable NoConvergence, powell 6-tuple, l_bfgs_b grad."""
  import scipy.optimize as so
  # DE accepts a Bounds object (scipy-standard)
  res = sp.optimize.differential_evolution(
      lambda p: jnp.sum((p - 0.5) ** 2),
      sp.optimize.Bounds(np.zeros(2), np.ones(2)), seed=0, tol=1e-8)
  np.testing.assert_allclose(res.x, 0.5, atol=1e-3)
  # brute complex-step slice = point count (mgrid convention)
  x = sp.optimize.brute(lambda p: jnp.squeeze((p[0] - 1.0) ** 2),
                        (slice(-3, 3, 61j),), finish=None)
  assert abs(float(x) - 1.0) < 0.11
  # NoConvergence raised by wrapped nonlin solvers IS ours
  assert sp.optimize.NoConvergence is so.NoConvergence
  with pytest.raises(sp.optimize.NoConvergence):
    sp.optimize.broyden1(lambda v: np.asarray([v[0] ** 2 + 1.0]),
                         np.zeros(1), maxiter=3)
  # powell full_output is scipy's 6-tuple
  out = sp.optimize.fmin_powell(lambda p: jnp.sum((p - 1.0) ** 2),
                                np.zeros(2), full_output=True)
  assert len(out) == 6 and out[2].shape == (2, 2)
  # l_bfgs_b info dict carries a real gradient + funcalls
  xb, fb, info = sp.optimize.fmin_l_bfgs_b(
      lambda p: jnp.sum((p - 2.0) ** 2), np.zeros(2),
      bounds=[(0, 5.0), (0, 5.0)])
  assert info["grad"] is not None
  np.testing.assert_allclose(info["grad"], 2 * (np.asarray(xb) - 2.0),
                             atol=1e-6)
  assert "funcalls" in info
