"""On-chip probe for the windowed Pallas SpMM kernel (spmm_pallas.py):
Mosaic compile acceptance + throughput vs the XLA gather lowering.

    PYTHONPATH=/root/.axon_site:/root/repo python -u tools/spmm_probe.py
"""
import time

import numpy as np
import scipy.sparse as ss

import jax
import jax.numpy as jnp

import spartan_tpu as sp
from spartan_tpu.backend import sparse as sps
from spartan_tpu.backend.kernels import spmm_pallas as smp

sp.initialize(["--log_level=40"])
print("device:", jax.devices()[0].device_kind, flush=True)


def slope_ms(fn, B, k_lo=4, k_hi=20, reps=4, extra=()):
  """extra: device arrays fn needs, passed as jit ARGUMENTS (closure
  constants embed in the program body and blow the remote-compile 413
  body limit for big operands, e.g. the densified matrix)."""
  from jax import lax

  @jax.jit
  def loop(B, k, *ex):
    def body(i, c):
      B2, c2 = lax.optimization_barrier((B, c))
      return jnp.sum(fn(B2, *ex)) * 1e-30 + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

  def sync(v):
    return float(np.asarray(jax.device_get(v)).ravel()[0])

  sync(loop(B, k_lo, *extra)); sync(loop(B, k_hi, *extra))
  t_lo, t_hi = [], []
  for _ in range(reps):
    t0 = time.perf_counter(); sync(loop(B, k_lo, *extra))
    t_lo.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); sync(loop(B, k_hi, *extra))
    t_hi.append(time.perf_counter() - t0)
  return max((min(t_hi) - min(t_lo)) / (k_hi - k_lo), 1e-9) * 1e3


# k=256/512 rows measure the r3 k-tiling (VERDICT r3 next #4: target
# >= the k=128 Gnnz/s — the strips reuse ONE pack, so per-nonzero window
# DMA cost amortizes further as k grows)
for (n, m, k, d) in [(8192, 8192, 64, 0.01), (16384, 16384, 64, 0.005),
                     (16384, 16384, 128, 0.005),
                     (16384, 16384, 256, 0.005),
                     (16384, 16384, 512, 0.005),
                     (65536, 65536, 64, 0.001)]:
  rng = np.random.default_rng(n + k)
  A = ss.random(n, m, density=d, random_state=np.random.RandomState(7),
                format="csr", dtype=np.float32)
  S = sps.from_scipy(A, dtype=np.float32)
  B = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
  nnz = S.nnz
  packed = S.to_windowed_spmm()
  if packed is None:
    print(f"n={n} d={d}: fill below gate — XLA route", flush=True)
    continue
  t0 = time.time()
  f_win = smp.make_spmm_windowed(packed)
  try:
    got = np.asarray(f_win(B))
    want = A @ np.asarray(B)
    rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-9)
    print(f"n={n} m={m} k={k} d={d}: fill={packed.fill:.2f} "
          f"compile+run {time.time()-t0:.1f}s relerr={rel:.2e}", flush=True)
  except Exception as e:
    print(f"n={n} k={k}: MOSAIC REJECTS: {str(e)[:300]}", flush=True)
    continue
  ms_win = slope_ms(f_win, B)
  cols_d, vals_d = jnp.asarray(S.cols), jnp.asarray(S.vals)

  def f_xla(Bv):
    g = jnp.take(Bv, cols_d, axis=0)
    return jnp.einsum("rm,rmk->rk", vals_d, g)

  ms_xla = slope_ms(f_xla, B)
  print(f"   windowed {ms_win:8.3f} ms  ({nnz/ms_win/1e6:7.2f} Gnnz/s)   "
        f"xla-gather {ms_xla:8.3f} ms  ({nnz/ms_xla/1e6:7.2f} Gnnz/s)   "
        f"speedup {ms_xla/ms_win:5.1f}x", flush=True)
  # densified MXU route (r3): f32 dense matmul — memory-gated
  if 4 * n * m <= 4 << 30:
    Ad = S.to_densified()

    def f_dense(Bv, Adv=None):
      return jnp.matmul(Ad if Adv is None else Adv, Bv,
                        preferred_element_type=jnp.float32)

    rel_d = np.abs(np.asarray(f_dense(B)) - want).max() / max(
        np.abs(want).max(), 1e-9)
    ms_d = slope_ms(f_dense, B, extra=(Ad,))
    print(f"   dense    {ms_d:8.3f} ms  ({nnz/ms_d/1e6:7.2f} Gnnz/s)   "
          f"relerr={rel_d:.2e}  vs windowed {ms_win/ms_d:5.1f}x",
          flush=True)
print("probe done", flush=True)
