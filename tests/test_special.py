"""Differential tests for sp.special vs scipy.special (f64 CPU mesh)."""

import numpy as np
import pytest
import scipy.special as ss

import spartan_tpu as sp

S = sp.special
rng = np.random.default_rng(44)
xp = rng.uniform(0.1, 5.0, 64)          # positive domain
xr = rng.uniform(-4.0, 4.0, 64)         # real line
y01 = rng.uniform(0.01, 0.99, 64)       # open unit interval


def g(e):
  from spartan_tpu.expr.base import Expr
  return np.asarray(sp.lazify(e).glom()) if isinstance(e, Expr) \
      else np.asarray(e)


def close(ours, want, rtol=1e-12, atol=1e-13):
  np.testing.assert_allclose(g(ours), want, rtol=rtol, atol=atol)


@pytest.mark.smoke
def test_gamma_family():
  close(S.gammaln(xp), ss.gammaln(xp))
  close(S.gamma(xr), ss.gamma(xr), rtol=1e-10)
  close(S.gammasgn(xr), ss.gammasgn(xr))
  close(S.digamma(xp), ss.digamma(xp), rtol=1e-11)
  close(S.rgamma(xr), ss.rgamma(xr), rtol=1e-10, atol=1e-12)
  close(S.gammainc(2.5, xp), ss.gammainc(2.5, xp))
  close(S.gammaincc(2.5, xp), ss.gammaincc(2.5, xp))
  close(S.multigammaln(xp + 3, 3), ss.multigammaln(xp + 3, 3))
  close(S.poch(xp, 2.5), ss.poch(xp, 2.5), rtol=1e-11)


@pytest.mark.smoke
def test_beta_erf_family():
  close(S.beta(xp, 2.0), ss.beta(xp, 2.0), rtol=1e-11)
  close(S.betaln(xp, 2.0), ss.betaln(xp, 2.0), atol=1e-11)
  close(S.betainc(2.0, 3.5, y01), ss.betainc(2.0, 3.5, y01))
  close(S.erf(xr), ss.erf(xr))
  close(S.erfc(xr), ss.erfc(xr), rtol=1e-11)
  close(S.erfinv(y01 * 2 - 1), ss.erfinv(y01 * 2 - 1), rtol=1e-11)
  close(S.erfcinv(y01), ss.erfcinv(y01), rtol=1e-11)
  xw = np.linspace(-5, 25, 61)
  close(S.erfcx(xw), ss.erfcx(xw), rtol=1e-12)
  close(S.ndtr(xr), ss.ndtr(xr))
  close(S.ndtri(y01), ss.ndtri(y01), rtol=1e-11)
  close(S.log_ndtr(xr), ss.log_ndtr(xr))


def test_device_inverses_full_tails():
  # log-space dual-side bisection: machine-exact across both tails
  yy = np.array([1e-290, 1e-150, 1e-12, 1e-8, 0.3, 0.5, 0.7,
                 1 - 1e-8, 1 - 1e-12])
  for a in (0.5, 2.5, 8.0):
    close(S.gammaincinv(a, yy), ss.gammaincinv(a, yy), rtol=1e-11)
  qq = np.array([1e-280, 1e-12, 0.4, 0.9, 1 - 1e-10])
  close(S.gammainccinv(1.5, qq), ss.gammainccinv(1.5, qq), rtol=1e-11)
  yb = np.array([1e-60, 1e-12, 0.3, 0.5, 0.7, 1 - 1e-8, 1 - 1e-12])
  close(S.betaincinv(0.3, 8.0, yb), ss.betaincinv(0.3, 8.0, yb),
        rtol=1e-11)
  close(S.betaincinv(8.0, 0.3, yb), ss.betaincinv(8.0, 0.3, yb),
        rtol=1e-11)
  close(S.betainccinv(2.0, 3.5, y01), ss.betainccinv(2.0, 3.5, y01),
        rtol=1e-11)


@pytest.mark.smoke
def test_distribution_cdf_family():
  t = np.linspace(-6, 6, 49)
  close(S.stdtr(4.0, t), ss.stdtr(4.0, t))
  close(S.stdtrit(6.0, y01), ss.stdtrit(6.0, y01), rtol=1e-11)
  close(S.chdtr(3.0, xp), ss.chdtr(3.0, xp))
  close(S.chdtrc(3.0, xp), ss.chdtrc(3.0, xp))
  close(S.chdtri(3.0, y01), ss.chdtri(3.0, y01), rtol=1e-11)
  close(S.fdtr(3.0, 7.0, xp), ss.fdtr(3.0, 7.0, xp))
  close(S.fdtrc(3.0, 7.0, xp), ss.fdtrc(3.0, 7.0, xp))
  close(S.fdtri(3.0, 7.0, y01), ss.fdtri(3.0, 7.0, y01), rtol=1e-11)
  close(S.pdtr(3, xp), ss.pdtr(3, xp))
  close(S.pdtrc(3, xp), ss.pdtrc(3, xp))
  close(S.pdtri(3, y01), ss.pdtri(3, y01), rtol=1e-11)
  close(S.bdtr(3, 10, y01), ss.bdtr(3, 10, y01), rtol=1e-11)
  close(S.bdtrc(3, 10, y01), ss.bdtrc(3, 10, y01), rtol=1e-11)
  close(S.bdtri(3, 10, y01), ss.bdtri(3, 10, y01), rtol=1e-11)
  close(S.nbdtr(3, 5, y01), ss.nbdtr(3, 5, y01), rtol=1e-11)
  close(S.nbdtrc(3, 5, y01), ss.nbdtrc(3, 5, y01), rtol=1e-11)
  close(S.nbdtri(3, 5, y01), ss.nbdtri(3, 5, y01), rtol=1e-11)
  close(S.gdtr(2.0, 3.0, xp), ss.gdtr(2.0, 3.0, xp))
  close(S.gdtrc(2.0, 3.0, xp), ss.gdtrc(2.0, 3.0, xp))
  close(S.gdtrix(2.0, 3.0, y01), ss.gdtrix(2.0, 3.0, y01), rtol=1e-11)


def test_kolmogorov():
  x = np.linspace(0.05, 2.5, 50)
  close(S.kolmogorov(x), ss.kolmogorov(x), atol=1e-14)
  close(S.kolmogi(y01), ss.kolmogi(y01), rtol=1e-11)
  close(S.smirnov(10, 0.3), ss.smirnov(10, 0.3))  # host boundary


def test_elliptic_agm():
  m = np.linspace(-1.5, 0.99, 50)
  close(S.ellipk(m), ss.ellipk(m))
  close(S.ellipe(m), ss.ellipe(m))
  close(S.ellipkm1(np.logspace(-15, -0.1, 30)),
        ss.ellipkm1(np.logspace(-15, -0.1, 30)))
  close(S.agm(xp, xp[::-1]), ss.agm(xp, xp[::-1]))
  assert np.isinf(g(S.ellipk(np.array([1.0]))))[0]


def test_bessel_exp_families():
  close(S.j0(xp), ss.j0(xp), rtol=1e-10, atol=1e-13)
  close(S.j1(xp), ss.j1(xp), rtol=1e-10, atol=1e-13)
  close(S.jn(4, xp), ss.jn(4, xp), rtol=1e-9, atol=1e-13)
  close(S.i0(xr), ss.i0(xr), rtol=1e-11)
  close(S.i1e(xr), ss.i1e(xr), rtol=1e-11)
  close(S.exp1(xp), ss.exp1(xp), rtol=1e-11)
  close(S.expi(xp), ss.expi(xp), rtol=1e-11)
  close(S.expn(2, xp), ss.expn(2, xp), rtol=1e-11)
  si, ci = S.sici(xp)
  wsi, wci = ss.sici(xp)
  close(si, wsi)
  close(ci, wci, rtol=1e-11)
  fs, fc = S.fresnel(xr)
  wfs, wfc = ss.fresnel(xr)
  close(fs, wfs, atol=1e-12)
  close(fc, wfc, atol=1e-12)


@pytest.mark.smoke
def test_composition_layer():
  close(S.cosm1(np.linspace(-0.2, 0.2, 41)),
        ss.cosm1(np.linspace(-0.2, 0.2, 41)))
  close(S.powm1(xp, xr), ss.powm1(xp, xr), rtol=1e-11)
  close(S.exprel(np.linspace(-2, 2, 41)),
        ss.exprel(np.linspace(-2, 2, 41)))
  close(S.exp2(xr), ss.exp2(xr))
  close(S.exp10(xr), ss.exp10(xr))
  close(S.cbrt(xr), ss.cbrt(xr))
  close(S.expit(xr), ss.expit(xr))
  close(S.logit(y01), ss.logit(y01))
  close(S.log_expit(xr), ss.log_expit(xr))
  close(S.xlogy(xr, xp), ss.xlogy(xr, xp))
  close(S.xlog1py(xr, xp), ss.xlog1py(xr, xp))
  close(S.entr(xp), ss.entr(xp))
  close(S.rel_entr(xp, xp[::-1]), ss.rel_entr(xp, xp[::-1]))
  close(S.kl_div(xp, xp[::-1]), ss.kl_div(xp, xp[::-1]))
  close(S.huber(1.2, xr), ss.huber(1.2, xr))
  close(S.pseudo_huber(1.2, xr), ss.pseudo_huber(1.2, xr))
  close(S.boxcox(xp, 0.37), ss.boxcox(xp, 0.37))
  close(S.boxcox(xp, 0.0), ss.boxcox(xp, 0.0))
  close(S.boxcox1p(xp, 0.37), ss.boxcox1p(xp, 0.37))
  close(S.inv_boxcox(S.boxcox(xp, 0.37), 0.37), xp, rtol=1e-11)
  close(S.inv_boxcox1p(S.boxcox1p(xp, 0.37), 0.37), xp, rtol=1e-11)
  close(S.sindg(xr * 50), ss.sindg(xr * 50), atol=1e-12)
  close(S.cosdg(xr * 50), ss.cosdg(xr * 50), atol=1e-12)
  close(S.tandg(xr * 29), ss.tandg(xr * 29), rtol=1e-10)
  close(S.cotdg(xr * 29 + 7), ss.cotdg(xr * 29 + 7), rtol=1e-10)
  close(S.radian(30, 15, 10), ss.radian(30, 15, 10))
  close(S.diric(np.linspace(-7, 7, 101), 6),
        ss.diric(np.linspace(-7, 7, 101), 6), atol=1e-12)
  close(S.zetac(np.linspace(1.5, 30, 30)),
        ss.zetac(np.linspace(1.5, 30, 30)), rtol=1e-10)
  close(S.zeta(np.linspace(1.5, 10, 18), 2.0),
        ss.zeta(np.linspace(1.5, 10, 18), 2.0), rtol=1e-11)
  close(S.spence(xp), ss.spence(xp), rtol=1e-11)


def test_softmax_logsumexp():
  A = rng.normal(size=(8, 16))
  close(S.softmax(A, axis=1), ss.softmax(A, axis=1))
  close(S.log_softmax(A, axis=0), ss.log_softmax(A, axis=0))
  close(S.logsumexp(A, axis=1), ss.logsumexp(A, axis=1))
  close(S.logsumexp(A), ss.logsumexp(A))


@pytest.mark.smoke
def test_combinatorics():
  close(S.comb(12, 5), ss.comb(12, 5))
  close(S.comb(np.arange(10), 3), ss.comb(np.arange(10), 3))
  close(S.comb(7, 3, repetition=True), ss.comb(7, 3, repetition=True))
  assert S.comb(12, 5, exact=True) == ss.comb(12, 5, exact=True)
  close(S.perm(12, 5), ss.perm(12, 5))
  close(S.binom(xp * 3, xp), ss.binom(xp * 3, xp), rtol=1e-11)
  close(S.factorial(np.arange(12)), ss.factorial(np.arange(12)))
  assert S.factorial(21, exact=True) == ss.factorial(21, exact=True)
  close(S.factorial2(np.arange(15)), ss.factorial2(np.arange(15)),
        rtol=1e-12)


def test_orthogonal_polynomials():
  m = np.linspace(-1, 1, 41)
  for n in (0, 1, 3, 7):
    close(S.eval_legendre(n, m), ss.eval_legendre(n, m), atol=1e-13)
    close(S.eval_chebyt(n, m), ss.eval_chebyt(n, m), atol=1e-12)
    close(S.eval_chebyu(n, m), ss.eval_chebyu(n, m), atol=1e-12)
    close(S.eval_hermite(n, xr), ss.eval_hermite(n, xr), rtol=1e-11)
    close(S.eval_hermitenorm(n, xr), ss.eval_hermitenorm(n, xr),
          rtol=1e-11, atol=1e-12)
    close(S.eval_laguerre(n, xp), ss.eval_laguerre(n, xp),
          rtol=1e-11, atol=1e-12)
  close(S.eval_genlaguerre(5, 1.3, xp), ss.eval_genlaguerre(5, 1.3, xp),
        rtol=1e-10, atol=1e-12)
  close(S.eval_gegenbauer(5, 0.7, m), ss.eval_gegenbauer(5, 0.7, m),
        rtol=1e-10, atol=1e-12)


def test_hyp_and_host_boundary():
  # jax's hyp1f1 carries ~1e-4 relative noise on parts of the domain
  close(S.hyp1f1(1.5, 2.5, xr), ss.hyp1f1(1.5, 2.5, xr), rtol=1e-3)
  close(S.hyp2f1(1.2, 0.7, 2.5, y01), ss.hyp2f1(1.2, 0.7, 2.5, y01),
        rtol=1e-3)
  # host boundary names produce eager ndarrays matching scipy
  ai = S.airy(xr)
  wai = ss.airy(xr)
  for a, w in zip(ai, wai):
    np.testing.assert_allclose(a, w, rtol=1e-12)
  np.testing.assert_allclose(S.struve(0, xp), ss.struve(0, xp))
  np.testing.assert_allclose(S.yv(0.5, xp), ss.yv(0.5, xp))
  np.testing.assert_allclose(S.kv(1.5, xp), ss.kv(1.5, xp))
  np.testing.assert_allclose(S.ellipkinc(0.7, 0.3),
                             ss.ellipkinc(0.7, 0.3))
  # host boundary accepts lazy exprs too
  np.testing.assert_allclose(S.yn(1, sp.from_numpy(xp)), ss.yn(1, xp))


def test_lazy_fusion_and_expr_inputs():
  # device names return lazy Exprs that fuse into surrounding chains
  e = S.erf(sp.from_numpy(xr)) * 2.0 + S.gammaln(sp.from_numpy(xp))
  from spartan_tpu.expr.base import Expr
  assert isinstance(e, Expr)
  np.testing.assert_allclose(g(e), ss.erf(xr) * 2 + ss.gammaln(xp),
                             rtol=1e-12)
  # int input promotes like scipy
  np.testing.assert_allclose(g(S.gammaln(np.arange(1, 9))),
                             ss.gammaln(np.arange(1, 9)))


def test_namespace_completeness():
  import scipy.special as sss
  missing = [n for n in dir(sss)
             if not n.startswith("_") and not hasattr(S, n)
             and callable(getattr(sss, n))]
  assert missing == [], missing
