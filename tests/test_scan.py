"""Prefix scans (reference: test_scan.py; SURVEY.md §2.1 scan)."""

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.util import Assert


def test_cumsum(rng):
  a = rng.standard_normal((12, 16))
  sa = sp.from_numpy(a)
  Assert.all_close(sp.cumsum(sa, axis=0), a.cumsum(axis=0), rtol=1e-13)
  Assert.all_close(sp.cumsum(sa, axis=1), a.cumsum(axis=1), rtol=1e-13)
  Assert.all_close(sp.cumsum(sa), a.cumsum(), rtol=1e-13)


def test_cumprod(rng):
  a = rng.uniform(0.9, 1.1, (10, 10))
  Assert.all_close(sp.cumprod(sp.from_numpy(a), axis=1), a.cumprod(axis=1),
                   rtol=1e-12)


def test_cummax(rng):
  a = rng.standard_normal((30,))
  got = sp.scan(sp.from_numpy(a), "max", axis=0)
  Assert.all_eq(got, np.maximum.accumulate(a))


def test_int_cumsum(rng):
  x = rng.integers(0, 10, (20,), dtype=np.int32)
  got = sp.cumsum(sp.from_numpy(x)).glom()
  assert got.dtype == np.int64
  np.testing.assert_array_equal(got, x.astype(np.int64).cumsum())


def test_custom_scan_fn(rng, cluster):
  """Extensible scan: user associative combiner via associative_scan."""
  import jax.numpy as jnp
  x = rng.standard_normal(257)
  got = np.asarray(sp.scan(sp.from_numpy(x), scan_fn=jnp.maximum).glom())
  np.testing.assert_array_equal(got, np.maximum.accumulate(x))
  # log-sum-exp running accumulation (associative in log space)
  lse = lambda a, b: jnp.logaddexp(a, b)
  got = np.asarray(sp.scan(sp.from_numpy(x), scan_fn=lse).glom())
  np.testing.assert_allclose(got, np.logaddexp.accumulate(x), rtol=1e-9)
  # reverse form
  got = np.asarray(sp.scan(sp.from_numpy(x), scan_fn=jnp.maximum,
                           reverse=True).glom())
  np.testing.assert_array_equal(got, np.maximum.accumulate(x[::-1])[::-1])
  # 2-D along an axis
  m = rng.standard_normal((8, 16))
  got = np.asarray(sp.scan(sp.from_numpy(m), scan_fn=jnp.minimum,
                           axis=1).glom())
  np.testing.assert_array_equal(got, np.minimum.accumulate(m, axis=1))
