"""Differential tests for sp.stats vs scipy.stats (f64 CPU mesh)."""

import numpy as np
import pytest
import scipy.stats as sst

import spartan_tpu as sp

st = sp.stats
rng = np.random.default_rng(55)
X2 = rng.uniform(0.5, 9.0, (40, 6))
V = rng.standard_normal(100)
Q = rng.uniform(0.01, 0.99, 32)


def g(e):
  from spartan_tpu.expr.base import Expr
  return np.asarray(sp.lazify(e).glom()) if isinstance(e, Expr) \
      else np.asarray(e)


def close(ours, want, rtol=1e-10, atol=1e-12):
  np.testing.assert_allclose(g(ours), want, rtol=rtol, atol=atol)


_CONT = [
    ("norm", (), 0.5, 2.0),
    ("t", (5.0,), 0.3, 1.5),
    ("chi2", (4.0,), 0.0, 2.0),
    ("gamma", (2.5,), 0.0, 1.3),
    ("beta", (2.0, 3.0), 0.0, 1.0),
    ("f", (4.0, 9.0), 0.0, 1.0),
    ("expon", (), 0.0, 2.0),
    ("uniform", (), 1.0, 3.0),
    ("laplace", (), 0.2, 1.1),
    ("logistic", (), 0.0, 1.0),
    ("cauchy", (), 0.0, 1.0),
    ("lognorm", (0.8,), 0.0, 1.5),
    ("gumbel_r", (), 0.3, 1.2),
    ("gumbel_l", (), 0.0, 1.0),
    ("pareto", (2.5,), 0.0, 1.0),
    ("weibull_min", (1.7,), 0.0, 1.0),
    ("rayleigh", (), 0.0, 1.0),
    ("halfnorm", (), 0.0, 1.0),
    ("truncnorm", (-1.0, 2.0), 0.0, 1.0),
]


@pytest.mark.smoke
@pytest.mark.parametrize("name,shp,loc,scale", _CONT[:6])
def test_device_distributions_core(name, shp, loc, scale):
  _dist_roundtrip(name, shp, loc, scale)


@pytest.mark.parametrize("name,shp,loc,scale", _CONT[6:])
def test_device_distributions_rest(name, shp, loc, scale):
  _dist_roundtrip(name, shp, loc, scale)


def _dist_roundtrip(name, shp, loc, scale):
  ours, ref = getattr(st, name), getattr(sst, name)
  a = (*shp, loc, scale)
  xs = ref.rvs(*a, size=32, random_state=np.random.RandomState(7))
  close(ours.pdf(xs, *a), ref.pdf(xs, *a), rtol=1e-10)
  close(ours.logpdf(xs, *a), ref.logpdf(xs, *a), rtol=1e-10)
  close(ours.cdf(xs, *a), ref.cdf(xs, *a), rtol=1e-10)
  close(ours.sf(xs, *a), ref.sf(xs, *a), rtol=1e-10)
  close(ours.ppf(Q, *a), ref.ppf(Q, *a), rtol=1e-9, atol=1e-10)
  close(ours.isf(Q, *a), ref.isf(Q, *a), rtol=1e-9, atol=1e-10)
  wm, wv = ref.mean(*a), ref.var(*a)
  if np.isfinite(wm):
    close(ours.mean(*a), wm, rtol=1e-10)
  if np.isfinite(wv):
    close(ours.var(*a), wv, rtol=1e-10)
  # frozen convention + inverse round trip
  close(ours(*a).cdf(xs), ref(*a).cdf(xs), rtol=1e-10)
  close(ours.ppf(ours.cdf(xs, *a), *a), xs, rtol=1e-7, atol=1e-8)


@pytest.mark.smoke
def test_discrete_distributions():
  for name, shp in [("poisson", (3.5,)), ("binom", (12, 0.3)),
                    ("nbinom", (5, 0.4)), ("geom", (0.3,)),
                    ("bernoulli", (0.4,))]:
    ours, ref = getattr(st, name), getattr(sst, name)
    ks = ref.rvs(*shp, size=32, random_state=np.random.RandomState(3))
    close(ours.pmf(ks, *shp), ref.pmf(ks, *shp), rtol=1e-10)
    close(ours.logpmf(ks, *shp), ref.logpmf(ks, *shp), rtol=1e-10)
    close(ours.cdf(ks, *shp), ref.cdf(ks, *shp), rtol=1e-10)
    close(ours.ppf(Q, *shp), ref.ppf(Q, *shp))
    close(ours.mean(*shp), ref.mean(*shp), rtol=1e-12)
    close(ours.var(*shp), ref.var(*shp), rtol=1e-12)


def test_rvs_entropy_interval_support():
  s = g(st.norm.rvs(1.0, 2.0, size=20000, random_state=7))
  assert abs(s.mean() - 1.0) < 0.05 and abs(s.std() - 2.0) < 0.05
  sp_ = g(st.poisson.rvs(4.0, size=5000, random_state=3))
  assert abs(sp_.mean() - 4.0) < 0.15
  assert (sp_ == np.floor(sp_)).all()
  close(st.gamma.entropy(2.5, 0, 2.0), sst.gamma(2.5, 0, 2.0).entropy())
  close(st.bernoulli.entropy(0.3), sst.bernoulli(0.3).entropy())
  lo, hi = st.norm.interval(0.95, 1, 2)
  wlo, whi = sst.norm.interval(0.95, 1, 2)
  close(lo, wlo)
  close(hi, whi)
  slo, shi = st.uniform.support(1.0, 3.0)
  assert float(g(slo)) == 1.0 and float(g(shi)) == 4.0


@pytest.mark.smoke
def test_descriptive():
  close(st.gmean(X2), sst.gmean(X2))
  w = rng.uniform(1, 2, X2.shape)
  close(st.gmean(X2, weights=w), sst.gmean(X2, weights=w))
  close(st.hmean(X2), sst.hmean(X2))
  close(st.pmean(X2, 2.5), sst.pmean(X2, 2.5))
  close(st.moment(X2, 3), sst.moment(X2, 3))
  close(st.skew(X2), sst.skew(X2))
  close(st.skew(X2, bias=False), sst.skew(X2, bias=False))
  close(st.kurtosis(X2), sst.kurtosis(X2))
  close(st.kurtosis(X2, bias=False), sst.kurtosis(X2, bias=False))
  close(st.sem(X2), sst.sem(X2))
  close(st.zscore(X2), sst.zscore(X2))
  close(st.gzscore(X2), sst.gzscore(X2))
  close(st.zmap(X2[:3], X2), sst.zmap(X2[:3], X2))
  close(st.iqr(V), sst.iqr(V))
  close(st.iqr(V, scale="normal"), sst.iqr(V, scale="normal"))
  close(st.median_abs_deviation(V), sst.median_abs_deviation(V))
  close(st.variation(X2), sst.variation(X2))
  close(st.trim_mean(V, 0.1), sst.trim_mean(V, 0.1))
  close(st.rankdata(V), sst.rankdata(V))
  close(st.gstd(X2), sst.gstd(X2))


def test_trimmed_circular_entropy():
  close(st.tmean(V, (-1, 1)), sst.tmean(V, (-1, 1)))
  close(st.tvar(V, (-1, 1)), sst.tvar(V, (-1, 1)))
  close(st.tstd(V, (-1, 1)), sst.tstd(V, (-1, 1)))
  close(st.tsem(V, (-1, 1)), sst.tsem(V, (-1, 1)))
  close(st.tmin(V, -1), sst.tmin(V, -1))
  close(st.tmax(V, 1), sst.tmax(V, 1))
  ang = rng.uniform(0, 2 * np.pi, 50)
  close(st.circmean(ang), sst.circmean(ang))
  close(st.circvar(ang), sst.circvar(ang))
  close(st.circstd(ang), sst.circstd(ang))
  pk = rng.uniform(0.1, 1, 12)
  qk = rng.uniform(0.1, 1, 12)
  close(st.entropy(pk), sst.entropy(pk))
  close(st.entropy(pk, qk, base=2), sst.entropy(pk, qk, base=2))
  d, wd = st.describe(X2), sst.describe(X2)
  close(d.mean, wd.mean)
  close(d.variance, wd.variance)
  close(d.skewness, wd.skewness)
  close(d.kurtosis, wd.kurtosis)
  m, c = st.mode(np.round(V * 2))
  wm = sst.mode(np.round(V * 2))
  assert float(g(m)) == wm.mode and float(g(c)) == wm.count


@pytest.mark.smoke
def test_t_tests_and_correlations():
  x = rng.standard_normal(200)
  y = 0.5 * x + rng.standard_normal(200)

  def pair(res, want, tol=1e-10):
    close(res.statistic, want.statistic, rtol=tol)
    close(res.pvalue, want.pvalue, rtol=tol, atol=1e-13)
  pair(st.ttest_1samp(x, 0.1), sst.ttest_1samp(x, 0.1))
  pair(st.ttest_ind(x, y), sst.ttest_ind(x, y))
  pair(st.ttest_ind(x, y, equal_var=False),
       sst.ttest_ind(x, y, equal_var=False))
  pair(st.ttest_rel(x, y), sst.ttest_rel(x, y))
  pair(st.ttest_1samp(x, 0.1, alternative="greater"),
       sst.ttest_1samp(x, 0.1, alternative="greater"))
  pair(st.pearsonr(x, y), sst.pearsonr(x, y))
  pair(st.spearmanr(x, y), sst.spearmanr(x, y))
  b = (x > 0).astype(float)
  pair(st.pointbiserialr(b, y), sst.pointbiserialr(b, y))
  res, want = st.linregress(x, y), sst.linregress(x, y)
  close(res.slope, want.slope)
  close(res.intercept, want.intercept)
  close(res.rvalue, want.rvalue)
  close(res.pvalue, want.pvalue, atol=1e-13)
  close(res.stderr, want.stderr)
  close(res.intercept_stderr, want.intercept_stderr)


def test_anova_variance_tests():
  x = rng.standard_normal(200)
  y = 0.5 * x + rng.standard_normal(200)
  z = rng.standard_normal(150) + 0.2

  def pair(res, want, tol=1e-10):
    close(res.statistic, want.statistic, rtol=tol)
    close(res.pvalue, want.pvalue, rtol=tol, atol=1e-13)
  pair(st.f_oneway(x, y, z), sst.f_oneway(x, y, z))
  pair(st.bartlett(x, y, z), sst.bartlett(x, y, z))
  pair(st.levene(x, y, z), sst.levene(x, y, z))
  pair(st.levene(x, y, z, center="mean"),
       sst.levene(x, y, z, center="mean"))
  fo = np.array([16, 18, 16, 14, 12, 12.])
  fe = np.array([16, 16, 16, 16, 16, 8.])
  pair(st.chisquare(fo, fe), sst.chisquare(fo, fe))
  pair(st.power_divergence(fo, fe, lambda_="log-likelihood"),
       sst.power_divergence(fo, fe, lambda_="log-likelihood"))
  pv = rng.uniform(0.01, 1, 7)
  pair(st.combine_pvalues(pv), sst.combine_pvalues(pv))
  pair(st.combine_pvalues(pv, method="stouffer"),
       sst.combine_pvalues(pv, method="stouffer"))


def test_normality_and_rank_tests():
  x = rng.standard_normal(200)
  y = 0.5 * x + rng.standard_normal(200)
  z = rng.standard_normal(150) + 0.2

  def pair(res, want, tol=1e-10):
    close(res.statistic, want.statistic, rtol=tol)
    close(res.pvalue, want.pvalue, rtol=tol, atol=1e-13)
  pair(st.skewtest(x), sst.skewtest(x))
  pair(st.kurtosistest(x), sst.kurtosistest(x))
  pair(st.normaltest(x), sst.normaltest(x))
  pair(st.jarque_bera(x), sst.jarque_bera(x))
  pair(st.mannwhitneyu(x, y),
       sst.mannwhitneyu(x, y, method="asymptotic"))
  pair(st.ranksums(x, y), sst.ranksums(x, y))
  pair(st.kruskal(x, y, z), sst.kruskal(x, y, z))


def test_ks_tests():
  # device statistic exact; p is the Stephens-corrected asymptotic
  # (closer to the exact truth than scipy's own 'asymp' mode)
  x = rng.standard_normal(150)
  y = rng.standard_normal(120) + 0.3
  res, want = st.kstest(x, "norm"), sst.kstest(x, "norm")
  close(res.statistic, want.statistic)
  np.testing.assert_allclose(g(res.pvalue), want.pvalue, atol=2e-2)
  res2, want2 = st.ks_2samp(x, y), sst.ks_2samp(x, y)
  close(res2.statistic, want2.statistic)
  np.testing.assert_allclose(g(res2.pvalue), want2.pvalue, atol=2e-2)
  res3 = st.kstest(x, "gamma", args=(2.0,))
  want3 = sst.kstest(x, "gamma", args=(2.0,))
  close(res3.statistic, want3.statistic, rtol=1e-9)


def test_gaussian_kde():
  kde = st.gaussian_kde(V)
  wkde = sst.gaussian_kde(V)
  pts = np.linspace(-2, 2, 9)
  np.testing.assert_allclose(np.asarray(kde(pts)), wkde(pts),
                             rtol=1e-9)


def test_host_boundary_and_dist_reexports():
  # exotic distributions keep the full scipy API as objects
  assert abs(st.alpha.pdf(1.5, 2.0) - sst.alpha.pdf(1.5, 2.0)) < 1e-15
  res = st.shapiro(V)
  want = sst.shapiro(V)
  assert abs(res.statistic - want.statistic) < 1e-12
  w = st.wilcoxon(V)
  ww = sst.wilcoxon(V)
  assert abs(w.statistic - ww.statistic) < 1e-12
  # host-boundary function accepts lazy exprs
  res2 = st.anderson(sp.from_numpy(V))
  want2 = sst.anderson(V)
  assert abs(res2.statistic - want2.statistic) < 1e-12


def test_lazy_fusion():
  from spartan_tpu.expr.base import Expr
  e = st.norm.cdf(sp.from_numpy(V)) * 2.0
  assert isinstance(e, Expr)
  np.testing.assert_allclose(g(e), sst.norm.cdf(V) * 2, rtol=1e-12)


def test_namespace_completeness():
  missing = [n for n in dir(sst)
             if not n.startswith("_") and not hasattr(st, n)]
  assert missing == [], missing
