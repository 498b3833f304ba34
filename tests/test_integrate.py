"""Differential tests for sp.integrate vs scipy.integrate.

The fused solve_ivp (adaptive Dormand-Prince in one while_loop) is
checked against scipy's RK45 at matched tolerances; the sampled rules
are exact-weight comparisons."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.integrate as si

import spartan_tpu as sp

I = sp.integrate

rng = np.random.default_rng(9)


def g(x):
  from spartan_tpu.expr.base import Expr
  return np.asarray(sp.lazify(x).glom()) if isinstance(x, Expr) \
      else np.asarray(x)


@pytest.mark.smoke
def test_sampled_rules_match_scipy():
  x = np.sort(rng.uniform(0, 4, 31))
  y = np.sin(x) + 0.1 * x
  np.testing.assert_allclose(float(g(I.trapezoid(y, x))),
                             si.trapezoid(y, x), atol=1e-12)
  np.testing.assert_allclose(g(I.cumulative_trapezoid(y, x)),
                             si.cumulative_trapezoid(y, x), atol=1e-12)
  np.testing.assert_allclose(g(I.cumulative_trapezoid(y, x, initial=0)),
                             si.cumulative_trapezoid(y, x, initial=0),
                             atol=1e-12)
  # uniform simpson, odd and even sample counts
  for n in (21, 20):
    yy = np.cos(np.linspace(0, 3, n))
    np.testing.assert_allclose(float(g(I.simpson(yy, dx=3 / (n - 1)))),
                               si.simpson(yy, dx=3 / (n - 1)), atol=1e-12)
  # non-uniform simpson
  np.testing.assert_allclose(float(g(I.simpson(y, x=x))),
                             si.simpson(y, x=x), atol=1e-10)
  ye = np.sin(np.linspace(0, 2, 30))  # even, non-uniform grid below
  xe = np.sort(rng.uniform(0, 2, 30))
  np.testing.assert_allclose(float(g(I.simpson(np.sin(xe), x=xe))),
                             si.simpson(np.sin(xe), x=xe), atol=1e-10)
  del ye
  # romb on 2^k + 1 samples
  yr = np.exp(np.linspace(0, 1, 17))
  np.testing.assert_allclose(float(g(I.romb(yr, dx=1 / 16))),
                             si.romb(yr, dx=1 / 16), atol=1e-12)
  np.testing.assert_allclose(
      g(I.cumulative_simpson(yr, dx=1 / 16)),
      si.cumulative_simpson(yr, dx=1 / 16), atol=1e-12)


def test_fixed_quad_and_newton_cotes():
  got, _ = I.fixed_quad(lambda x: jnp.exp(-x) * jnp.sin(3 * x), 0, 2,
                        n=12)
  want, _ = si.fixed_quad(lambda x: np.exp(-x) * np.sin(3 * x), 0, 2,
                          n=12)
  assert abs(got - want) < 1e-12
  an, B = I.newton_cotes(4)
  anw, Bw = si.newton_cotes(4)
  np.testing.assert_allclose(an, anw)


def test_tanhsinh_and_qmc():
  r = I.tanhsinh(lambda x: jnp.exp(-x * x), -3.0, 3.0)
  assert r.success and abs(r.integral - np.sqrt(np.pi)
                           + 2 * 2.2e-5) < 1e-4  # erf tail ~2.2e-5
  assert abs(r.integral - float(si.tanhsinh(
      lambda x: np.exp(-x * x), -3.0, 3.0).integral)) < 1e-9
  q = I.qmc_quad(lambda x: jnp.sum(x ** 2), np.zeros(2), np.ones(2),
                 n_points=512)
  assert abs(q.integral - 2.0 / 3) < 5e-3


@pytest.mark.smoke
def test_solve_ivp_rk45_matches_scipy():
  # nonlinear oscillator
  def f(t, y):
    return jnp.stack([y[1], -jnp.sin(y[0]) - 0.1 * y[1]])

  def fnp(t, y):
    return [y[1], -np.sin(y[0]) - 0.1 * y[1]]

  te = np.linspace(0, 10, 25)
  got = I.solve_ivp(f, (0, 10), [1.0, 0.0], t_eval=te, rtol=1e-8,
                    atol=1e-10)
  want = si.solve_ivp(fnp, (0, 10), [1.0, 0.0], t_eval=te, rtol=1e-10,
                      atol=1e-12)
  assert got.success
  assert got.y.shape == (2, 25)
  # cubic-Hermite t_eval interpolation is O(h^4): compare at 1e-5
  np.testing.assert_allclose(got.y, want.y, atol=1e-5)
  # endpoint (no interpolation) is tight
  np.testing.assert_allclose(got.y[:, -1], want.y[:, -1], atol=1e-7)


def test_solve_ivp_variants():
  # t_eval=None returns endpoints only (documented NotShapeable rule)
  got = I.solve_ivp(lambda t, y: -y, (0, 2), [1.0], rtol=1e-9,
                    atol=1e-12)
  assert got.t.shape == (2,) and got.y.shape == (1, 2)
  np.testing.assert_allclose(got.y[0, -1], np.exp(-2.0), atol=1e-8)
  # RK23
  g23 = I.solve_ivp(lambda t, y: -y, (0, 1), [1.0], method="RK23",
                    t_eval=np.linspace(0, 1, 5), rtol=1e-7, atol=1e-10)
  np.testing.assert_allclose(g23.y[0], np.exp(-g23.t), atol=1e-5)
  # backward integration
  gb = I.solve_ivp(lambda t, y: -y, (2, 0), [np.exp(-2.0)], rtol=1e-9,
                   atol=1e-12)
  np.testing.assert_allclose(gb.y[0, -1], 1.0, atol=1e-7)
  # args= threading
  ga = I.solve_ivp(lambda t, y, k: -k * y, (0, 1), [1.0], args=(2.0,),
                   t_eval=np.array([1.0]), rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(ga.y[0, 0], np.exp(-2.0), atol=1e-7)
  # stiff method routes host
  gs = I.solve_ivp(lambda t, y: np.asarray([-50 * (y[0] - np.cos(t))]),
                   (0, 1), [0.0], method="BDF")
  assert gs.success
  with pytest.raises(ValueError):
    I.solve_ivp(lambda t, y: -y, (0, 1), [1.0], method="RK99")
  with pytest.raises(ValueError):
    I.solve_ivp(lambda t, y: -y, (0, 1), [1.0],
                t_eval=np.array([5.0]))


def test_odeint_and_quadpack_host():
  t = np.linspace(0, 3, 7)
  got = I.odeint(lambda y, tt: -y, np.array([1.0]), t)
  np.testing.assert_allclose(got[:, 0], np.exp(-t), atol=1e-6)
  v, err = I.quad(lambda x: np.exp(-x), 0, np.inf)
  assert abs(v - 1.0) < 1e-10
  v2, _ = I.dblquad(lambda y, x: x * y, 0, 1, 0, 1)
  assert abs(v2 - 0.25) < 1e-10
  # classes re-exported for isinstance interop
  assert I.RK45 is si.RK45
  assert issubclass(I.IntegrationWarning, UserWarning)


def test_integrate_parity_audit_covers_namespace():
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "scipy_parity", "tools/scipy_parity.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  rows = {r["ns"]: r for r in mod.audit()}
  assert rows["integrate"]["missing"] == []
  assert rows["integrate"]["stale"] == []
