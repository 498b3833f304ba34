"""Differential tests for sp.ndimage vs scipy.ndimage (f64 CPU mesh)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import spartan_tpu as sp

N = sp.ndimage
rng = np.random.default_rng(33)
A = rng.normal(size=(12, 14))
x1 = rng.normal(size=40)


def g(e):
  from spartan_tpu.expr.base import Expr
  return np.asarray(sp.lazify(e).glom()) if isinstance(e, Expr) \
      else np.asarray(e)


@pytest.mark.smoke
def test_correlate_convolve_all_modes():
  w = rng.normal(size=(3, 4))
  for mode in ("reflect", "constant", "nearest", "mirror", "wrap"):
    for o in (0, 1, (-1, 0)):
      np.testing.assert_allclose(
          g(N.correlate(A, w, mode=mode, cval=0.5, origin=o)),
          ndi.correlate(A, w, mode=mode, cval=0.5, origin=o), atol=1e-12)
      np.testing.assert_allclose(
          g(N.convolve(A, w, mode=mode, cval=0.5, origin=o)),
          ndi.convolve(A, w, mode=mode, cval=0.5, origin=o), atol=1e-12)
  w1 = rng.normal(size=5)
  np.testing.assert_allclose(g(N.correlate1d(A, w1, axis=0)),
                             ndi.correlate1d(A, w1, axis=0), atol=1e-12)
  np.testing.assert_allclose(g(N.convolve1d(x1, w1, origin=1)),
                             ndi.convolve1d(x1, w1, origin=1), atol=1e-12)


@pytest.mark.smoke
def test_gaussian_and_derivative_filters():
  np.testing.assert_allclose(g(N.gaussian_filter(A, 1.5)),
                             ndi.gaussian_filter(A, 1.5), atol=1e-12)
  np.testing.assert_allclose(g(N.gaussian_filter(A, (1.0, 2.0),
                                                 order=(1, 2))),
                             ndi.gaussian_filter(A, (1.0, 2.0),
                                                 order=(1, 2)),
                             atol=1e-12)
  np.testing.assert_allclose(g(N.gaussian_filter1d(x1, 2.0, order=1)),
                             ndi.gaussian_filter1d(x1, 2.0, order=1),
                             atol=1e-12)
  np.testing.assert_allclose(g(N.uniform_filter(A, (3, 5))),
                             ndi.uniform_filter(A, (3, 5)), atol=1e-12)
  np.testing.assert_allclose(g(N.laplace(A)), ndi.laplace(A), atol=1e-12)
  np.testing.assert_allclose(g(N.gaussian_laplace(A, 1.1)),
                             ndi.gaussian_laplace(A, 1.1), atol=1e-12)
  np.testing.assert_allclose(g(N.gaussian_gradient_magnitude(A, 1.1)),
                             ndi.gaussian_gradient_magnitude(A, 1.1),
                             atol=1e-12)
  for ax in (0, 1):
    np.testing.assert_allclose(g(N.sobel(A, ax)), ndi.sobel(A, ax),
                               atol=1e-12)
    np.testing.assert_allclose(g(N.prewitt(A, ax)), ndi.prewitt(A, ax),
                               atol=1e-12)


@pytest.mark.smoke
def test_rank_filters():
  fp = np.array([[1, 0, 1], [0, 1, 0], [1, 0, 1]], bool)
  for mode in ("reflect", "constant", "nearest"):
    np.testing.assert_allclose(
        g(N.minimum_filter(A, size=3, mode=mode)),
        ndi.minimum_filter(A, size=3, mode=mode), atol=1e-15)
    np.testing.assert_allclose(
        g(N.maximum_filter(A, footprint=fp, mode=mode)),
        ndi.maximum_filter(A, footprint=fp, mode=mode), atol=1e-15)
  np.testing.assert_allclose(g(N.median_filter(A, 3)),
                             ndi.median_filter(A, 3), atol=1e-15)
  np.testing.assert_allclose(g(N.rank_filter(A, 2, size=3)),
                             ndi.rank_filter(A, 2, size=3), atol=1e-15)
  np.testing.assert_allclose(g(N.rank_filter(A, -2, size=3)),
                             ndi.rank_filter(A, -2, size=3), atol=1e-15)
  np.testing.assert_allclose(
      g(N.percentile_filter(A, 30, size=(3, 3))),
      ndi.percentile_filter(A, 30, size=(3, 3)), atol=1e-15)
  np.testing.assert_allclose(
      g(N.minimum_filter1d(x1, 5)), ndi.minimum_filter1d(x1, 5),
      atol=1e-15)
  np.testing.assert_allclose(
      g(N.maximum_filter1d(x1, 4, origin=-1)),
      ndi.maximum_filter1d(x1, 4, origin=-1), atol=1e-15)
  # vectorized_filter with a jnp-traceable callable
  import jax.numpy as jnp
  np.testing.assert_allclose(
      g(N.vectorized_filter(A, jnp.mean, size=3)),
      ndi.vectorized_filter(A, np.mean, size=3), atol=1e-12)


def test_grey_morphology():
  st = np.array([[0.0, 1.0, 0.0], [1.0, 2.0, 1.0], [0.0, 1.0, 0.0]])
  for name in ("grey_erosion", "grey_dilation", "grey_opening",
               "grey_closing", "morphological_gradient",
               "morphological_laplace", "white_tophat", "black_tophat"):
    np.testing.assert_allclose(
        g(getattr(N, name)(A, size=(3, 3))),
        getattr(ndi, name)(A, size=(3, 3)), atol=1e-12, err_msg=name)
    np.testing.assert_allclose(
        g(getattr(N, name)(A, structure=st)),
        getattr(ndi, name)(A, structure=st), atol=1e-12, err_msg=name)


@pytest.mark.smoke
def test_binary_morphology():
  B = rng.random((14, 16)) > 0.6
  st2 = ndi.generate_binary_structure(2, 2)
  for name in ("binary_erosion", "binary_dilation", "binary_opening",
               "binary_closing"):
    np.testing.assert_array_equal(
        g(getattr(N, name)(B)).astype(bool),
        getattr(ndi, name)(B), err_msg=name)
    np.testing.assert_array_equal(
        g(getattr(N, name)(B, structure=st2, iterations=2)).astype(bool),
        getattr(ndi, name)(B, structure=st2, iterations=2),
        err_msg=name)
  # fill holes: a ring
  R = np.zeros((9, 9), bool)
  R[2:7, 2:7] = True
  R[3:6, 3:6] = False
  np.testing.assert_array_equal(g(N.binary_fill_holes(R)).astype(bool),
                                ndi.binary_fill_holes(R))
  # propagation inside a mask
  seed = np.zeros((9, 9), bool)
  seed[4, 4] = True
  mask = np.zeros((9, 9), bool)
  mask[2:7, 3:6] = True
  mask[8, 8] = True  # disconnected — must NOT be reached
  np.testing.assert_array_equal(
      g(N.binary_propagation(seed, mask=mask)).astype(bool),
      ndi.binary_propagation(seed, mask=mask))
  # hit-or-miss
  s1 = np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]], bool)
  np.testing.assert_array_equal(
      g(N.binary_hit_or_miss(B, s1)).astype(bool),
      ndi.binary_hit_or_miss(B, s1))


@pytest.mark.smoke
def test_label_and_measurements():
  B = rng.random((16, 18)) > 0.7
  lab_o, n_o = N.label(B)
  lab_w, n_w = ndi.label(B)
  assert n_o == n_w
  # label IDs may be permuted — compare the induced partitions
  remap = {}
  for a, b in zip(lab_o.ravel(), lab_w.ravel()):
    if a == 0 or b == 0:
      assert a == b == 0
      continue
    assert remap.setdefault(a, b) == b
  V = rng.random((16, 18))
  idx = list(range(1, n_w + 1))
  np.testing.assert_allclose(N.sum_labels(V, lab_w, idx),
                             ndi.sum_labels(V, lab_w, idx), atol=1e-12)
  np.testing.assert_allclose(N.mean(V, lab_w, idx),
                             ndi.mean(V, lab_w, idx), atol=1e-12)
  np.testing.assert_allclose(N.variance(V, lab_w, idx),
                             ndi.variance(V, lab_w, idx), atol=1e-12)
  np.testing.assert_allclose(N.standard_deviation(V, lab_w, idx),
                             ndi.standard_deviation(V, lab_w, idx),
                             atol=1e-12)
  np.testing.assert_allclose(N.minimum(V, lab_w, idx),
                             ndi.minimum(V, lab_w, idx), atol=1e-15)
  np.testing.assert_allclose(N.maximum(V, lab_w, idx),
                             ndi.maximum(V, lab_w, idx), atol=1e-15)
  assert N.maximum_position(V, lab_w, 2) == \
      ndi.maximum_position(V, lab_w, 2)
  assert N.minimum_position(V, lab_w, 2) == \
      ndi.minimum_position(V, lab_w, 2)
  com_o = N.center_of_mass(V, lab_w, idx)
  com_w = ndi.center_of_mass(V, lab_w, idx)
  np.testing.assert_allclose(np.asarray(com_o), np.asarray(com_w),
                             atol=1e-10)
  # scalar index + no-label forms
  assert abs(N.sum_labels(V) - V.sum()) < 1e-10
  assert abs(N.mean(V, lab_w, 1) - ndi.mean(V, lab_w, 1)) < 1e-12
  e_o = N.extrema(V, lab_w, 1)
  e_w = ndi.extrema(V, lab_w, 1)
  assert abs(e_o[0] - e_w[0]) < 1e-15 and e_o[2] == e_w[2]
  np.testing.assert_allclose(N.center_of_mass(V),
                             ndi.center_of_mass(V), atol=1e-10)


def test_fourier_filters():
  F = np.fft.fft2(A)
  got = g(N.fourier_gaussian(F, 2.0))
  want = ndi.fourier_gaussian(F.copy(), 2.0)
  np.testing.assert_allclose(got, want, atol=1e-12)
  got = g(N.fourier_shift(F, (1.5, -2.0)))
  want = ndi.fourier_shift(F.copy(), (1.5, -2.0))
  np.testing.assert_allclose(got, want, atol=1e-12)
  Fr = np.fft.rfft2(A)
  got = g(N.fourier_uniform(Fr, 3, n=A.shape[1]))
  want = ndi.fourier_uniform(Fr.copy(), 3, n=A.shape[1])
  np.testing.assert_allclose(got, want, atol=1e-12)


def test_interpolation_order01():
  coords = np.stack([rng.uniform(0, 11, 30), rng.uniform(0, 13, 30)])
  for order in (0, 1):
    np.testing.assert_allclose(
        g(N.map_coordinates(A, coords, order=order)),
        ndi.map_coordinates(A, coords, order=order), atol=1e-12)
  np.testing.assert_allclose(
      g(N.shift(A, (1.0, -2.0), order=1)),
      ndi.shift(A, (1.0, -2.0), order=1), atol=1e-12)
  np.testing.assert_allclose(
      g(N.affine_transform(A, np.array([[0.9, 0.1], [0.0, 1.1]]),
                           offset=(0.5, -0.25), order=1)),
      ndi.affine_transform(A, np.array([[0.9, 0.1], [0.0, 1.1]]),
                           offset=(0.5, -0.25), order=1), atol=1e-12)
  got = g(N.rotate(A, 30.0, order=1))
  want = ndi.rotate(A, 30.0, order=1)
  assert got.shape == want.shape
  np.testing.assert_allclose(got, want, atol=1e-10)
  got = g(N.rotate(A, -17.0, order=1, reshape=False))
  np.testing.assert_allclose(got, ndi.rotate(A, -17.0, order=1,
                                             reshape=False), atol=1e-10)
  # zoom endpoint-preserving scale
  got = g(N.zoom(A, 1.5, order=1))
  want = ndi.zoom(A, 1.5, order=1)
  assert got.shape == want.shape
  np.testing.assert_allclose(got, want, atol=1e-10)
  # spline order routes host and still matches
  np.testing.assert_allclose(g(N.shift(A, 0.3)), ndi.shift(A, 0.3),
                             atol=1e-12)


def test_host_boundaries_ndimage():
  B = rng.random((10, 10)) > 0.5
  np.testing.assert_allclose(N.distance_transform_edt(B),
                             ndi.distance_transform_edt(B))
  objs = N.find_objects(ndi.label(B)[0])
  assert objs == ndi.find_objects(ndi.label(B)[0])
  st = N.generate_binary_structure(2, 1)
  np.testing.assert_array_equal(st, ndi.generate_binary_structure(2, 1))
  np.testing.assert_array_equal(N.iterate_structure(st, 2),
                                ndi.iterate_structure(st, 2))
  md = N.median(rng.random(20), None, None)
  assert np.isscalar(md) or md.shape == ()


def test_ndimage_parity_audit_clean():
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "scipy_parity", "tools/scipy_parity.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  rows = {r["ns"]: r for r in mod.audit()}
  assert rows["ndimage"]["missing"] == []
  assert rows["ndimage"]["stale"] == []
