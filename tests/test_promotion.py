"""Dtype promotion parity: sp ops must promote like NumPy across the
dtype × dtype (and dtype × python-scalar) matrix — the reference is
NumPy-semantics-compatible by construction (SURVEY.md north star)."""

import numpy as np
import pytest

import spartan_tpu as sp

_DTYPES = [np.bool_, np.int32, np.int64, np.float32, np.float64]


@pytest.mark.parametrize("dt_a", _DTYPES)
@pytest.mark.parametrize("dt_b", _DTYPES)
def test_array_array_promotion(dt_a, dt_b, rng):
  a = (rng.random((4, 4)) * 3).astype(dt_a)
  b = (rng.random((4, 4)) * 3 + 1).astype(dt_b)
  got = (sp.from_numpy(a) + sp.from_numpy(b)).evaluate()
  want = a + b
  assert got.dtype == want.dtype, (dt_a, dt_b, got.dtype, want.dtype)
  np.testing.assert_allclose(got.glom(), want, rtol=1e-6)


@pytest.mark.parametrize("dt", _DTYPES)
@pytest.mark.parametrize("scalar", [2, 2.5])
def test_array_pyscalar_promotion(dt, scalar, rng):
  if dt is np.bool_ and isinstance(scalar, int):
    pytest.skip("bool+int: numpy deprecates, jax promotes to int — both "
                "communities consider the numpy behavior an accident")
  a = (rng.random((4, 4)) * 3).astype(dt)
  got = (sp.from_numpy(a) * scalar).evaluate()
  want = a * scalar
  assert got.dtype == want.dtype, (dt, scalar, got.dtype, want.dtype)


@pytest.mark.parametrize("dt", [np.int32, np.float32, np.float64])
def test_division_promotion(dt, rng):
  a = ((rng.random((4, 4)) + 1) * 3).astype(dt)
  got = (sp.from_numpy(a) / sp.from_numpy(a)).evaluate()
  want = a / a
  assert got.dtype == want.dtype, (dt, got.dtype, want.dtype)


def test_comparison_yields_bool(rng):
  a = rng.standard_normal((4, 4))
  got = (sp.from_numpy(a) > 0).evaluate()
  assert got.dtype == np.bool_


def test_const_fold_preserves_creation_dtype(rng):
  """ones(f64) + f32_array must give f64 with the optimizer ON and OFF —
  the const-fold pass must not weaken the fill's dtype."""
  from spartan_tpu.config import FLAGS
  b = rng.standard_normal((8, 8)).astype(np.float32)
  on = (sp.ones((8, 8)) + sp.from_numpy(b)).evaluate()       # f64 creation
  FLAGS.opt_const_fold = False
  try:
    off = (sp.ones((8, 8)) + sp.from_numpy(b)).evaluate()
  finally:
    FLAGS.opt_const_fold = True
  assert on.dtype == off.dtype == np.float64, (on.dtype, off.dtype)
  f32_on = (sp.ones((8, 8), dtype=np.float32) + sp.from_numpy(b)).evaluate()
  assert f32_on.dtype == np.float32


def test_numpy_scalar_is_strong(rng):
  """NEP 50: np.float64 scalars are strong (promote f32 arrays), unlike
  python floats."""
  a32 = rng.standard_normal((4, 4)).astype(np.float32)
  strong = (sp.from_numpy(a32) * sp.lazify(np.float64(2.0))).evaluate()
  weak = (sp.from_numpy(a32) * 2.0).evaluate()
  assert strong.dtype == np.float64, strong.dtype
  assert weak.dtype == np.float32, weak.dtype
  assert (a32 * np.float64(2.0)).dtype == np.float64  # numpy agrees
