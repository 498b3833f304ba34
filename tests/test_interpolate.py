"""Differential tests for sp.interpolate vs scipy.interpolate (f64 mesh)."""

import numpy as np
import pytest
import scipy.interpolate as si

import spartan_tpu as sp

ip = sp.interpolate
rng = np.random.default_rng(7)
X = np.sort(rng.uniform(0, 10, 13))
X[0], X[-1] = 0.0, 10.0
Y = np.cos(X) * X * 0.3
XQ = rng.uniform(0, 10, 40)
XQO = rng.uniform(-2, 12, 40)  # includes out-of-range queries


def g(e):
  from spartan_tpu.expr.base import Expr
  return np.asarray(sp.lazify(e).glom()) if isinstance(e, Expr) \
      else np.asarray(e)


def close(ours, ref, tol=1e-9):
  np.testing.assert_allclose(g(ours), np.asarray(ref), rtol=tol,
                             atol=tol, equal_nan=True)


# ---------------------------------------------------------------- cubic

@pytest.mark.smoke
@pytest.mark.parametrize("bc", ["not-a-knot", "natural", "clamped",
                                ((1, 2.0), (2, -1.0))])
def test_cubic_spline_bcs(bc):
  ours, ref = ip.CubicSpline(X, Y, bc_type=bc), \
      si.CubicSpline(X, Y, bc_type=bc)
  close(ours(XQO), ref(XQO))
  close(ours(XQ, 2), ref(XQ, 2), 1e-7)


def test_cubic_spline_periodic():
  yy = Y.copy()
  yy[-1] = yy[0]
  ours = ip.CubicSpline(X, yy, bc_type="periodic")
  ref = si.CubicSpline(X, yy, bc_type="periodic")
  close(ours(XQ + 30.0), ref(XQ + 30.0))
  close(ours.integrate(-3.0, 27.5), ref.integrate(-3.0, 27.5))


def test_cubic_spline_small_n_and_ndim():
  for n in (2, 3):
    close(ip.CubicSpline(X[:n], Y[:n])(XQ), si.CubicSpline(X[:n], Y[:n])(XQ))
  Y2 = np.stack([Y, np.sin(X)], 1)
  close(ip.CubicSpline(X, Y2)(XQ), si.CubicSpline(X, Y2)(XQ))
  close(ip.CubicSpline(X, Y2.T, axis=1)(XQ),
        si.CubicSpline(X, Y2.T, axis=1)(XQ))


@pytest.mark.smoke
def test_pchip_akima_hermite():
  close(ip.PchipInterpolator(X, Y)(XQ), si.PchipInterpolator(X, Y)(XQ))
  close(ip.PchipInterpolator(X, Y)(XQ, 1),
        si.PchipInterpolator(X, Y)(XQ, 1))
  close(ip.Akima1DInterpolator(X, Y)(XQO),
        si.Akima1DInterpolator(X, Y)(XQO))
  close(ip.Akima1DInterpolator(X, Y, method="makima")(XQ),
        si.Akima1DInterpolator(X, Y, method="makima")(XQ))
  d = np.cos(X)
  close(ip.CubicHermiteSpline(X, Y, d)(XQO),
        si.CubicHermiteSpline(X, Y, d)(XQO))


def test_pchip_monotone_data():
  ym = np.cumsum(np.abs(Y) + 0.1)
  close(ip.PchipInterpolator(X, ym)(XQ), si.PchipInterpolator(X, ym)(XQ))


# -------------------------------------------------------- PPoly / BPoly

def test_ppoly_calculus():
  ours, ref = ip.CubicSpline(X, Y), si.CubicSpline(X, Y)
  close(ours.antiderivative()(XQ), ref.antiderivative()(XQ))
  close(ours.derivative(2)(XQ), ref.derivative(2)(XQ))
  close(ours.integrate(1.2, 8.3), ref.integrate(1.2, 8.3))
  close(ours.integrate(8.3, 1.2), ref.integrate(8.3, 1.2))
  # extrapolate=False -> nan outside
  p = ip.PPoly(ref.c, ref.x, extrapolate=False)
  r = si.PPoly(ref.c, ref.x, extrapolate=False)
  close(p(XQO), r(XQO))


def test_bpoly_roundtrip():
  ref = si.CubicSpline(X, Y)
  po = ip.PPoly(ref.c, ref.x)
  bo = ip.BPoly.from_power_basis(po)
  br = si.BPoly.from_power_basis(si.PPoly(ref.c, ref.x))
  close(bo(XQO), br(XQO))
  close(bo.derivative()(XQ), br.derivative()(XQ))
  close(bo.antiderivative()(XQ), br.antiderivative()(XQ))
  close(bo.integrate(0.4, 9.1), br.integrate(0.4, 9.1))
  close(ip.PPoly.from_bernstein_basis(bo)(XQ),
        si.PPoly.from_bernstein_basis(br)(XQ))


def test_bpoly_from_derivatives():
  xi = [0, 1, 2]
  yi = [[1, 0], [2, 1], [3, -1]]
  close(ip.BPoly.from_derivatives(xi, yi)(XQ / 5),
        si.BPoly.from_derivatives(xi, yi)(XQ / 5))


def test_ppoly_solve_roots_host():
  ref = si.CubicSpline(X, Y)
  p = ip.PPoly(ref.c, ref.x)
  np.testing.assert_allclose(np.sort(p.roots()),
                             np.sort(si.PPoly(ref.c, ref.x).roots()))


# ------------------------------------------------------------ B-splines

@pytest.mark.smoke
@pytest.mark.parametrize("k", [1, 2, 3, 5])
def test_make_interp_spline_default(k):
  close(ip.make_interp_spline(X, Y, k=k)(XQO),
        si.make_interp_spline(X, Y, k=k)(XQO), 1e-8)


@pytest.mark.parametrize("bc", ["natural", "clamped",
                                ([(2, 1.0)], [(1, -0.5)])])
def test_make_interp_spline_bc(bc):
  close(ip.make_interp_spline(X, Y, k=3, bc_type=bc)(XQ),
        si.make_interp_spline(X, Y, k=3, bc_type=bc)(XQ), 1e-8)


def test_make_interp_spline_periodic_and_2d():
  yy = Y.copy()
  yy[-1] = yy[0]
  close(ip.make_interp_spline(X, yy, k=3, bc_type="periodic")(XQO),
        si.make_interp_spline(X, yy, k=3, bc_type="periodic")(XQO), 1e-8)
  Y2 = np.stack([Y, np.sin(X)], 1)
  close(ip.make_interp_spline(X, Y2)(XQ),
        si.make_interp_spline(X, Y2)(XQ), 1e-8)


def test_bspline_object():
  br = si.make_interp_spline(X, Y, k=3)
  bo = ip.BSpline(br.t, br.c, 3)
  close(bo(XQO), br(XQO))
  close(bo(XQ, 2), br(XQ, 2))
  close(bo.derivative(2)(XQ), br.derivative(2)(XQ))
  close(bo.antiderivative()(XQ), br.antiderivative()(XQ))
  close(bo.integrate(0.7, 8.9), br.integrate(0.7, 8.9))
  close(ip.BSpline(br.t, br.c, 3, extrapolate=False)(XQO),
        si.BSpline(br.t, br.c, 3, extrapolate=False)(XQO))
  t5 = np.array([0., 1., 2., 3., 4.])
  close(ip.BSpline.basis_element(t5)(XQ / 3),
        si.BSpline.basis_element(t5)(XQ / 3))


def test_splev_family():
  tck = si.splrep(X, Y, s=0)
  close(ip.splev(XQ, tck), si.splev(XQ, tck))
  close(ip.splev(XQ, tck, der=2), si.splev(XQ, tck, der=2))
  for ext in (0, 1, 3):
    close(ip.splev(XQO, tck, ext=ext), si.splev(XQO, tck, ext=ext))
  with pytest.raises(ValueError):
    ip.splev(XQO, tck, ext=2)
  close(ip.splint(1.0, 9.0, tck), si.splint(1.0, 9.0, tck))
  to, co, ko = ip.splder(tck, 1)
  rd = si.splder(tck, 1)
  close(ip.splev(XQ, (to, co, ko)), si.splev(XQ, rd))
  close(ip.spalde(XQ[:5], tck), np.asarray(si.spalde(XQ[:5], tck)))
  # host fit returns the same tck
  np.testing.assert_allclose(ip.splrep(X, Y, s=0)[0], tck[0])


def test_make_lsq_spline_weighted():
  t = np.r_[(X[0],) * 4, [3.0, 5.0, 7.0], (X[-1],) * 4]
  w = rng.uniform(0.5, 2.0, len(X))
  close(ip.make_lsq_spline(X, Y, t, w=w)(XQ),
        si.make_lsq_spline(X, Y, t, w=w)(XQ), 1e-8)


def test_univariate_spline_family():
  close(ip.UnivariateSpline(X, Y, s=0.5)(XQ),
        si.UnivariateSpline(X, Y, s=0.5)(XQ))
  us_o, us_r = ip.UnivariateSpline(X, Y, s=0.5), \
      si.UnivariateSpline(X, Y, s=0.5)
  close(us_o.derivative()(XQ), us_r.derivative()(XQ))
  close(us_o.integral(1, 9), us_r.integral(1, 9))
  close(ip.InterpolatedUnivariateSpline(X, Y)(XQ),
        si.InterpolatedUnivariateSpline(X, Y)(XQ))
  close(ip.LSQUnivariateSpline(X, Y, [3., 5., 7.])(XQ),
        si.LSQUnivariateSpline(X, Y, [3., 5., 7.])(XQ))


def test_make_smoothing_spline_wrap():
  close(ip.make_smoothing_spline(X, Y)(XQ),
        si.make_smoothing_spline(X, Y)(XQ))


# -------------------------------------------------------------- interp1d

@pytest.mark.smoke
@pytest.mark.parametrize("kind", ["linear", "nearest", "nearest-up",
                                  "previous", "next", "zero", "slinear",
                                  "quadratic", "cubic"])
def test_interp1d_kinds(kind):
  fo = ip.interp1d(X, Y, kind=kind, bounds_error=False,
                   fill_value=(-7.0, 7.0))
  fr = si.interp1d(X, Y, kind=kind, bounds_error=False,
                   fill_value=(-7.0, 7.0))
  close(fo(XQO), fr(XQO))


def test_interp1d_extrapolate_axis_errors():
  close(ip.interp1d(X, Y, fill_value="extrapolate")(XQO),
        si.interp1d(X, Y, fill_value="extrapolate")(XQO))
  Y3 = np.stack([Y, Y * 2, Y + 1], 0)
  close(ip.interp1d(X, Y3, kind="cubic")(XQ),
        si.interp1d(X, Y3, kind="cubic")(XQ))
  with pytest.raises(ValueError):
    ip.interp1d(X, Y)(XQO)  # bounds_error default True
  # unsorted x handled via assume_sorted=False default
  perm = rng.permutation(len(X))
  close(ip.interp1d(X[perm], Y[perm])(XQ), si.interp1d(X[perm], Y[perm])(XQ))


# ------------------------------------------------------------- bivariate

def test_rect_bivariate_spline():
  xg = np.linspace(0, 5, 9)
  yg = np.linspace(-2, 2, 8)
  Z = np.sin(xg[:, None]) * np.cos(yg[None, :]) \
      + 0.1 * xg[:, None] * yg[None, :]
  ro, rr = ip.RectBivariateSpline(xg, yg, Z), \
      si.RectBivariateSpline(xg, yg, Z)
  qx = np.sort(rng.uniform(0, 5, 7))
  qy = np.sort(rng.uniform(-2, 2, 6))
  close(ro(qx, qy), rr(qx, qy))
  close(ro(qx, qy, dx=1, dy=1), rr(qx, qy, dx=1, dy=1))
  close(ro.ev(qx[:6], qy), rr.ev(qx[:6], qy))
  close(ro.integral(0.5, 4.0, -1.0, 1.5), rr.integral(0.5, 4.0, -1.0, 1.5))
  tck = si.bisplrep(*np.meshgrid(xg, yg, indexing="ij"), Z, s=0.1)
  close(ip.bisplev(qx, qy, tck), si.bisplev(qx, qy, tck))


# -------------------------------------------------------- regular grids

GX = np.linspace(0, 4, 9)
GY = np.linspace(-1, 3, 7)
GZ = np.linspace(2, 5, 6)
GV = np.sin(GX)[:, None, None] + np.cos(GY)[None, :, None] * GZ[None, None, :]
Q3 = np.stack([rng.uniform(-0.5, 4.5, 30), rng.uniform(-1.5, 3.5, 30),
               rng.uniform(1.5, 5.5, 30)], -1)
Q3IN = np.stack([rng.uniform(0, 4, 20), rng.uniform(-1, 3, 20),
                 rng.uniform(2, 5, 20)], -1)


@pytest.mark.smoke
@pytest.mark.parametrize("m", ["linear", "nearest", "slinear", "cubic",
                               "quintic"])
def test_rgi_methods(m):
  ro = ip.RegularGridInterpolator((GX, GY, GZ), GV, method=m,
                                  bounds_error=False)
  rr = si.RegularGridInterpolator((GX, GY, GZ), GV, method=m,
                                  bounds_error=False)
  # scipy's new tensor-spline path solves with an ITERATIVE sparse
  # solver (gcrotmk, ~1e-5 default tol); our dense device solve is
  # exact vs the tensor-product oracle (verified) — hence the loose
  # tolerance for the spline methods.
  tol = 2e-4 if m in ("cubic", "quintic") else 1e-10
  close(ro(Q3), rr(Q3), tol)


def test_rgi_fill_trailing_interpn_1d():
  ro = ip.RegularGridInterpolator((GX, GY, GZ), GV, bounds_error=False,
                                  fill_value=-5.0)
  rr = si.RegularGridInterpolator((GX, GY, GZ), GV, bounds_error=False,
                                  fill_value=-5.0)
  close(ro(Q3), rr(Q3))
  V2 = np.stack([GV, 2 * GV], -1)
  close(ip.RegularGridInterpolator((GX, GY, GZ), V2,
                                   bounds_error=False)(Q3IN),
        si.RegularGridInterpolator((GX, GY, GZ), V2,
                                   bounds_error=False)(Q3IN))
  close(ip.interpn((GX, GY, GZ), GV, Q3IN),
        si.interpn((GX, GY, GZ), GV, Q3IN))
  q1 = rng.uniform(-1, 5, 25)[:, None]
  close(ip.RegularGridInterpolator((GX,), np.sin(GX),
                                   bounds_error=False)(q1),
        si.RegularGridInterpolator((GX,), np.sin(GX),
                                   bounds_error=False)(q1))
  with pytest.raises(ValueError):
    ip.RegularGridInterpolator((GX, GY, GZ), GV)(Q3)  # bounds_error


# ----------------------------------------------------- scattered / RBF

PTS = rng.uniform(0, 1, (50, 2))
VALS = np.sin(PTS[:, 0] * 7) + PTS[:, 1]
QPTS = rng.uniform(0, 1, (40, 2))


@pytest.mark.smoke
def test_nearest_nd_and_griddata():
  close(ip.NearestNDInterpolator(PTS, VALS)(QPTS),
        si.NearestNDInterpolator(PTS, VALS)(QPTS))
  close(ip.NearestNDInterpolator(PTS, VALS)(QPTS[:, 0], QPTS[:, 1]),
        si.NearestNDInterpolator(PTS, VALS)(QPTS[:, 0], QPTS[:, 1]))
  close(ip.griddata(PTS, VALS, QPTS, method="nearest"),
        si.griddata(PTS, VALS, QPTS, method="nearest"))
  close(ip.griddata(PTS, VALS, QPTS, method="linear"),
        si.griddata(PTS, VALS, QPTS, method="linear"))


@pytest.mark.parametrize("kern,eps", [
    ("thin_plate_spline", None), ("cubic", None), ("gaussian", 2.0),
    ("multiquadric", 1.5), ("linear", None), ("quintic", None),
    ("inverse_quadratic", 3.0)])
def test_rbf_interpolator(kern, eps):
  close(ip.RBFInterpolator(PTS, VALS, kernel=kern, epsilon=eps)(QPTS),
        si.RBFInterpolator(PTS, VALS, kernel=kern, epsilon=eps)(QPTS),
        1e-6)


def test_rbf_options():
  close(ip.RBFInterpolator(PTS, VALS, smoothing=0.1)(QPTS),
        si.RBFInterpolator(PTS, VALS, smoothing=0.1)(QPTS), 1e-6)
  V2 = np.stack([VALS, -VALS], 1)
  close(ip.RBFInterpolator(PTS, V2)(QPTS),
        si.RBFInterpolator(PTS, V2)(QPTS), 1e-6)
  close(ip.RBFInterpolator(PTS, VALS, neighbors=15)(QPTS),
        si.RBFInterpolator(PTS, VALS, neighbors=15)(QPTS), 1e-6)


@pytest.mark.parametrize("fn", ["multiquadric", "gaussian", "linear",
                                "cubic", "thin_plate", "inverse"])
def test_rbf_legacy(fn):
  close(ip.Rbf(PTS[:, 0], PTS[:, 1], VALS, function=fn)(
      QPTS[:, 0], QPTS[:, 1]),
      si.Rbf(PTS[:, 0], PTS[:, 1], VALS, function=fn)(
          QPTS[:, 0], QPTS[:, 1]), 1e-6)


# --------------------------------------------- polynomial interpolators

XS = np.linspace(-1, 1, 11)
YS = np.cos(XS * 3)
XQS = rng.uniform(-1, 1, 30)


def test_barycentric_krogh_fh():
  close(ip.BarycentricInterpolator(XS, YS)(XQS),
        si.BarycentricInterpolator(XS, YS)(XQS), 1e-7)
  close(ip.BarycentricInterpolator(XS, YS)(XS), YS, 1e-12)  # exact hits
  close(ip.barycentric_interpolate(XS, YS, XQS),
        si.barycentric_interpolate(XS, YS, XQS), 1e-7)
  close(ip.KroghInterpolator(XS, YS)(XQS),
        si.KroghInterpolator(XS, YS)(XQS), 1e-7)
  Y2 = np.stack([YS, YS * 2], 1)
  close(ip.KroghInterpolator(XS, Y2)(XQS),
        si.KroghInterpolator(XS, Y2)(XQS), 1e-7)
  close(ip.FloaterHormannInterpolator(XS, YS, d=4)(XQS),
        si.FloaterHormannInterpolator(XS, YS, d=4)(XQS), 1e-7)
  close(ip.pchip_interpolate(XS, YS, XQS, der=1),
        si.pchip_interpolate(XS, YS, XQS, der=1))


# ------------------------------------------------------------------ N-D

def test_ndppoly_ndbspline():
  cs = si.CubicSpline(np.linspace(0, 3, 5), np.sin(np.linspace(0, 3, 5)))
  c2 = np.einsum("im,jn->ijmn", cs.c, cs.c)
  q2 = rng.uniform(0, 3, (20, 2))
  close(ip.NdPPoly(c2, (cs.x, cs.x))(q2),
        si.NdPPoly(c2, (cs.x, cs.x))(q2))
  close(ip.NdPPoly(c2, (cs.x, cs.x))(q2, nu=(1, 0)),
        si.NdPPoly(c2, (cs.x, cs.x))(q2, nu=(1, 0)))
  bs = si.make_interp_spline(np.linspace(0, 3, 7),
                             np.cos(np.linspace(0, 3, 7)))
  cnd = np.einsum("i,j->ij", bs.c, bs.c)
  close(ip.NdBSpline((bs.t, bs.t), cnd, 3)(q2),
        si.NdBSpline((bs.t, bs.t), cnd, 3)(q2))
  close(ip.NdBSpline((bs.t, bs.t), cnd, 3)(q2, nu=(2, 1)),
        si.NdBSpline((bs.t, bs.t), cnd, 3)(q2, nu=(2, 1)))


def test_host_utilities():
  np.testing.assert_allclose(ip.lagrange(XS[:6], YS[:6]).coef,
                             si.lagrange(XS[:6], YS[:6]).coef,
                             rtol=1e-7)
  p, q = ip.pade([1., 1., 0.5, 1 / 6], 2)
  pr, qr = si.pade([1., 1., 0.5, 1 / 6], 2)
  np.testing.assert_allclose(p.coef, pr.coef)
  with pytest.raises(NotImplementedError):
    ip.interp2d(GX, GY, GV[:, :, 0])
