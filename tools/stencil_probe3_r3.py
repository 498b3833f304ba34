"""Stencil kernel v3 probe: standard Pallas pipeline + pl.Element
overlapping blocks (no manual DMA).

probe2 showed EVERY manual make_async_copy variant caps at ~250 GB/s —
the hand pipeline is the bottleneck (the standard Pallas grid pipeline
reaches 700+ GB/s in the nonaffine fused-reduce kernel).  v3 rides the
standard pipeline: the input block is an OVERLAPPING (bm+2)-row window
of the padded array via `pl.Element` start indices (i*bm), so read
amplification is only (bm+2)/bm and the pipeline manages buffering.

Two compute formulations:
  naive : 9 shifted-window FMAs
  colsum: 3 column partial sums (sublane shifts) then 3 lane windows

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/stencil_probe3_r3.py > /tmp/stencil_probe3.log 2>&1
"""
import functools
import importlib.util
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench._enable_compile_cache()

N = 8192
GENERAL = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
T0 = time.time()


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def _kernel(coeffs, bm, m, colsum, x_ref, o_ref):
  if colsum:
    acc = jnp.zeros((bm, m), jnp.float32)
    for dj in range(3):
      s = None
      for di in range(3):
        c = coeffs[di * 3 + dj]
        if c == 0.0:
          continue
        t = c * x_ref[di:di + bm, :]
        s = t if s is None else s + t
      if s is not None:
        acc = acc + s[:, dj:dj + m]
    o_ref[:] = acc
  else:
    acc = jnp.zeros((bm, m), jnp.float32)
    for di in range(3):
      for dj in range(3):
        c = coeffs[di * 3 + dj]
        if c == 0.0:
          continue
        acc = acc + c * x_ref[di:di + bm, dj:dj + m]
    o_ref[:] = acc


def stencil_v3(x, coeffs, bm=64, colsum=False, interpret=False):
  n, m = x.shape
  xp = jnp.pad(x, ((1, 7), (1, 127)))
  mp = m + 128
  return pl.pallas_call(
      functools.partial(_kernel, coeffs, bm, m, colsum),
      grid=(n // bm,),
      in_specs=[pl.BlockSpec((pl.Element(bm + 8), pl.Element(mp)),
                             lambda i: (i * bm, 0))],
      out_specs=pl.BlockSpec((bm, m), lambda i: (i, 0)),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
      interpret=interpret,
  )(xp)


def slope_gbps(fn, x):
  @jax.jit
  def loop(x, k):
    def body(i, c):
      x2, c2 = lax.optimization_barrier((x, c))
      out = fn(x2)
      return jnp.sum(out, dtype=jnp.float32) * 1e-30 + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

  s, _, _ = bench._slope_time(lambda k: (lambda: loop(x, k)),
                              k_lo=4, k_hi=20, reps=6)
  return 2 * N * N * 4 / s / 1e9


def main():
  x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (N, N),
                                        jnp.float32))()
  jax.block_until_ready(x)
  _st(f"data on device; platform={jax.devices()[0].device_kind}")

  xs = jax.random.normal(jax.random.key(1), (512, 512), jnp.float32)
  xsp = jnp.pad(xs, 1)
  want = sum(GENERAL[di * 3 + dj]
             * lax.slice(xsp, (di, dj), (di + 512, dj + 512))
             for di in range(3) for dj in range(3))

  for name, bm, colsum in [
      ("v3 bm=32 naive", 32, False),
      ("v3 bm=64 naive", 64, False),
      ("v3 bm=32 colsum", 32, True),
      ("v3 bm=64 colsum", 64, True),
      ("v3 bm=128 colsum", 128, True),
  ]:
    try:
      got = stencil_v3(xs, GENERAL, bm, colsum)
      err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
      _st(f"{name} relerr {err:.2e}")
      assert err < 1e-5
      g = slope_gbps(lambda x: stencil_v3(x, GENERAL, bm, colsum), x)
      _st(f"{name}: {g:.1f} GB/s ({g/819:.3f} of roofline)")
    except Exception as e:
      _st(f"{name}: FAILED {e!r:.300}")

  _st("probe done")


if __name__ == "__main__":
  main()
