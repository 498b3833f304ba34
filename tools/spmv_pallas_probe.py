"""On-chip benchmark of the one-hot MXU Pallas SpMV (VERDICT r1 #7).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/spmv_pallas_probe.py
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from spartan_tpu.backend.kernels import spmv_pallas
from spartan_tpu.backend import sparse as sps


def main():
  for n, kpr in [(16384, 64), (4096, 64), (65536, 16)]:
    S = sps.sprandn(n, n, density=kpr / n, seed=3)
    cols, vals = S.cols, S.vals.astype(jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    oracle = S.to_scipy() @ np.asarray(x, np.float64)
    for bf16 in (False, True):
      try:
        y = np.asarray(jax.device_get(
            spmv_pallas.spmv(cols, vals, x, use_bf16=bf16)))
        err = np.max(np.abs(y - oracle)) / np.max(np.abs(oracle))

        @jax.jit
        def loop(cols, vals, x, k, bf16=bf16):
          def body(i, c):
            (c2, x2), _ = lax.optimization_barrier(((c, x), i))
            return c + jnp.sum(
                spmv_pallas.spmv(cols, vals, x2, use_bf16=bf16)) * 1e-30
          return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

        jax.block_until_ready(loop(cols, vals, x, 4))
        jax.block_until_ready(loop(cols, vals, x, 20))
        tl, th = [], []
        for _ in range(5):
          t0 = time.perf_counter()
          jax.block_until_ready(loop(cols, vals, x, 4))
          tl.append(time.perf_counter() - t0)
          t0 = time.perf_counter()
          jax.block_until_ready(loop(cols, vals, x, 20))
          th.append(time.perf_counter() - t0)
        s = (min(th) - min(tl)) / 16
        print(f"n={n} k/r={kpr} bf16={bf16}: {s * 1e3:8.3f} ms "
              f"{S.nnz / s / 1e9:7.2f} Gnnz/s relerr={err:.2e}", flush=True)
      except Exception as e:
        print(f"n={n} bf16={bf16} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
  main()
