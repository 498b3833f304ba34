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
  with pytest.raises(ValueError):
    O.least_squares(res, np.zeros(2), method="trf")


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
