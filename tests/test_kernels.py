"""Pallas kernels in interpret mode vs numpy oracles (compiled path runs
on real TPU via bench.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from spartan_tpu.backend.kernels import fused_reduce, matmul, spmv_pallas


def test_fused_sum_identity(rng):
  x = rng.standard_normal((64, 128)).astype(np.float32)
  got = float(fused_reduce.fused_sum(jnp.asarray(x), interpret=True))
  np.testing.assert_allclose(got, x.sum(), rtol=1e-5)


def test_fused_sum_elementwise_chain(rng):
  x = rng.standard_normal((64, 128)).astype(np.float32)
  got = float(fused_reduce.fused_sum(jnp.asarray(x),
                                     f=lambda v: 1.0 + v * 2.0,
                                     interpret=True))
  np.testing.assert_allclose(got, (1.0 + x * 2.0).sum(), rtol=1e-5)


def test_config1_kernel(rng):
  x = rng.standard_normal((128, 256)).astype(np.float32)
  got = float(fused_reduce.ones_plus_scale_sum(jnp.asarray(x), 2.0,
                                               interpret=True))
  np.testing.assert_allclose(got, (1.0 + 2.0 * x).sum(), rtol=1e-5)


def test_fused_sum_nondivisible_rows(rng):
  x = rng.standard_normal((56, 128)).astype(np.float32)  # 56 % 8 == 0
  got = float(fused_reduce.fused_sum(jnp.asarray(x), interpret=True))
  np.testing.assert_allclose(got, x.sum(), rtol=1e-5)


def test_pallas_matmul(rng):
  a = rng.standard_normal((64, 256)).astype(np.float32)
  b = rng.standard_normal((256, 128)).astype(np.float32)
  got = np.asarray(matmul.matmul(jnp.asarray(a), jnp.asarray(b),
                                 bm=32, bn=128, bk=128, interpret=True))
  np.testing.assert_allclose(got, a @ b, rtol=1e-4, atol=1e-4)


def test_pallas_matmul_epilogue(rng):
  a = rng.standard_normal((32, 128)).astype(np.float32)
  b = rng.standard_normal((128, 128)).astype(np.float32)
  got = np.asarray(matmul.matmul(jnp.asarray(a), jnp.asarray(b),
                                 bm=32, bn=128, bk=128,
                                 epilogue=lambda acc: jnp.maximum(acc, 0.0),
                                 interpret=True))
  np.testing.assert_allclose(got, np.maximum(a @ b, 0.0), rtol=1e-4,
                             atol=1e-4)


def test_pallas_spmv(rng):
  import scipy.sparse as ss
  from spartan_tpu.backend import sparse as sps
  A = ss.random(64, 80, density=0.15,
                random_state=np.random.RandomState(3), format="csr")
  S = sps.from_scipy(A, dtype=np.float32)
  x = rng.standard_normal(80).astype(np.float32)
  got = np.asarray(spmv_pallas.spmv(S.cols, S.vals, jnp.asarray(x),
                                    interpret=True))
  np.testing.assert_allclose(got, A @ x, rtol=1e-4, atol=1e-5)
