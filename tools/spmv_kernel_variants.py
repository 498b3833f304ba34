"""Probe Mosaic support + perf for SpMV kernel stage variants.

A) one-hot dot (precision=HIGHEST) + ohr select      (exact f32)
B) one-hot dot + take_along_axis(axis=0) rem select
C) take_along_axis(axis=1) q-gather + take_along_axis(axis=0) rem select
   (no MXU at all — pure sublane/lane gathers)

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/spmv_kernel_variants.py
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S8, L = 8, 128


def make_kernel(variant):
  def kernel(cols_ref, vals_ref, xt_ref, out_ref):
    nq = xt_ref.shape[1]
    xt = xt_ref[...]
    if variant in ("B2", "B3", "D"):
      xt_hi = xt.astype(jnp.bfloat16)
      xt_lo = (xt - xt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    for s in range(S8):
      c = cols_ref[s:s + 1, :]
      q = c // L
      r = c - q * L
      if variant == "D":
        # both stages as tpu.dynamic_gather (no MXU): indices must match
        # the table shape — broadcast the strip index row (needs nq == L)
        assert nq == L
        g = jnp.take_along_axis(xt, jnp.broadcast_to(q, (L, L)), axis=1)
      elif variant == "C":
        idx = jnp.broadcast_to(q, (L, L))
        g = jnp.take_along_axis(xt, idx, axis=1)      # g[v,e] = xt[v,q[e]]
      else:
        oh = (lax.broadcasted_iota(jnp.int32, (nq, L), 0) == q
              ).astype(jnp.bfloat16 if variant in ("B2", "B3") else xt.dtype)
        if variant in ("B2", "B3"):
          g = (lax.dot_general(xt_hi, oh, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
               + lax.dot_general(xt_lo, oh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32))
        else:
          g = lax.dot_general(xt, oh, (((1,), (0,)), ((), ())),
                              precision=lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
      if variant in ("A", "B3"):
        ohr = lax.broadcasted_iota(jnp.int32, (L, L), 0) == r
        y = jnp.sum(jnp.where(ohr, g, 0), axis=0, keepdims=True)
      else:
        # stage-2 select via dynamic_gather: indices broadcast to the
        # table shape; every output row equals the result — keep row 0
        h = jnp.take_along_axis(g, jnp.broadcast_to(r, (L, L)), axis=0)
        y = h[0:1, :]
      out_ref[s:s + 1, :] = vals_ref[s:s + 1, :] * y
  return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def spmv_v(cols, vals, x, variant="A"):
  n, k = cols.shape
  m = x.shape[0]
  nq = -(-m // L)
  xp = jnp.pad(x, (0, nq * L - m)).reshape(nq, L)
  xt = xp.T
  kp = -(-k // L) * L
  np_ = -(-n // S8) * S8
  if kp != k or np_ != n:
    cols = jnp.pad(cols, ((0, np_ - n), (0, kp - k)))
    vals = jnp.pad(vals, ((0, np_ - n), (0, kp - k)))
  out = pl.pallas_call(
      make_kernel(variant),
      grid=(np_ // S8, kp // L),
      in_specs=[
          pl.BlockSpec((S8, L), lambda i, j: (i, j), memory_space=pltpu.VMEM),
          pl.BlockSpec((S8, L), lambda i, j: (i, j), memory_space=pltpu.VMEM),
          pl.BlockSpec((L, nq), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((S8, L), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((np_, kp), jnp.float32),
  )(cols, vals, xt)
  return jnp.sum(out[:n], axis=1)


def main():
  from spartan_tpu.backend import sparse as sps
  n, kpr = 16384, 64
  S = sps.sprandn(n, n, density=kpr / n, seed=3)
  cols, vals = S.cols, S.vals.astype(jnp.float32)
  x = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
  oracle = S.to_scipy() @ np.asarray(x, np.float64)
  for variant in ("B3",):
    try:
      y = np.asarray(jax.device_get(spmv_v(cols, vals, x, variant=variant)))
      err = np.max(np.abs(y - oracle)) / np.max(np.abs(oracle))

      @jax.jit
      def loop(cols, vals, x, k, variant=variant):
        def body(i, c):
          (c2, x2), _ = lax.optimization_barrier(((c, x), i))
          return c + jnp.sum(spmv_v(cols, vals, x2, variant=variant)) * 1e-30
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
      print(f"variant {variant}: {s * 1e3:8.3f} ms {S.nnz / s / 1e9:7.2f} "
            f"Gnnz/s relerr={err:.2e}", flush=True)
    except Exception as e:
      print(f"variant {variant} FAILED: {str(e)[:300]}", flush=True)


if __name__ == "__main__":
  main()
