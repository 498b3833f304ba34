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
