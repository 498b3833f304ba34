"""Stencil probe v5: no-pad Element windows + carry-chained timing.

Mosaic's element_window supports OOB padding (`pl.Element(size,
padding)`), so blocks can start at row/col -1 over the UNPADDED input —
eliminating the jnp.pad materialization pass (which alone caps any
padded formulation at ~330 GB/s of the ~660 GB/s r+w streaming
roofline, measured in chain_probe_r3).  Carry-chained slope timing:
c -> stencil(c), traffic exactly read B + write B.

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/stencil_probe5_r3.py > /tmp/stencil_probe5.log 2>&1
"""
import functools
import importlib.util
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench._enable_compile_cache()

N = 8192
S = 0.9 / 4.5
GENERAL = tuple(S * v for v in
                (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
T0 = time.time()


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def _kernel(coeffs, bm, m, colsum, x_ref, o_ref):
  acc = jnp.zeros((bm, m), jnp.float32)
  if colsum:
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
  else:
    for di in range(3):
      for dj in range(3):
        c = coeffs[di * 3 + dj]
        if c == 0.0:
          continue
        acc = acc + c * x_ref[di:di + bm, dj:dj + m]
  o_ref[:] = acc


def stencil_v4(x, coeffs, bm=64, colsum=True, interpret=False):
  """No-pad variant: element windows with OOB padding read x directly."""
  n, m = x.shape
  return pl.pallas_call(
      functools.partial(_kernel, coeffs, bm, m, colsum),
      grid=(n // bm,),
      in_specs=[pl.BlockSpec(
          (pl.Element(bm + 8, (1, 7)), pl.Element(m + 128, (1, 127))),
          lambda i: (i * bm - 1, -1))],
      out_specs=pl.BlockSpec((bm, m), lambda i: (i, 0)),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
      interpret=interpret,
  )(x)


def stencil_v3(x, coeffs, bm=64, colsum=True):
  """Padded variant (one extra r+w pass) for comparison."""
  n, m = x.shape
  mp = m + 128
  xp = jnp.pad(x, ((1, 7), (1, 127)))
  return pl.pallas_call(
      functools.partial(_kernel, coeffs, bm, m, colsum),
      grid=(n // bm,),
      in_specs=[pl.BlockSpec((pl.Element(bm + 8), pl.Element(mp)),
                             lambda i: (i * bm, 0))],
      out_specs=pl.BlockSpec((bm, m), lambda i: (i, 0)),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
  )(xp)


def xla_shift(coeffs):
  def fn(x):
    n, m = x.shape
    xp = jnp.pad(x, 1)
    acc = jnp.zeros_like(x)
    for di in range(3):
      for dj in range(3):
        c = coeffs[di * 3 + dj]
        if c:
          acc = acc + c * lax.slice(xp, (di, dj), (di + n, dj + m))
    return acc
  return fn


def _copy_kernel(x_ref, o_ref):
  o_ref[:] = x_ref[:] * 0.999


def pallas_copy(x):
  return pl.pallas_call(
      _copy_kernel,
      grid=(N // 256, N // 1024),
      in_specs=[pl.BlockSpec((256, 1024), lambda i, j: (i, j))],
      out_specs=pl.BlockSpec((256, 1024), lambda i, j: (i, j)),
      out_shape=jax.ShapeDtypeStruct((N, N), x.dtype),
  )(x)


def slope_gbps(fn, x):
  @jax.jit
  def loop(x, k):
    return lax.fori_loop(0, k, lambda i, c: fn(c), x)

  s, _, _ = bench._slope_time(lambda k: (lambda: loop(x, k)),
                              k_lo=4, k_hi=20, reps=6)
  return 2 * N * N * 4 / s / 1e9


def main():
  x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (N, N),
                                        jnp.float32))()
  jax.block_until_ready(x)
  _st(f"platform={jax.devices()[0].device_kind}")

  # weather reference
  @jax.jit
  def rsum(x, k):
    def body(i, c):
      x2, c2 = lax.optimization_barrier((x, c))
      return jnp.sum(x2, dtype=jnp.float32) + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
  s, _, _ = bench._slope_time(lambda k: (lambda: rsum(x, k)),
                              k_lo=8, k_hi=40, reps=6)
  _st(f"read-only reference: {N*N*4/s/1e9:.1f} GB/s")

  # correctness incl. edges (zero-boundary semantics)
  xs = jax.random.normal(jax.random.key(1), (512, 512), jnp.float32)
  xsp = jnp.pad(xs, 1)
  want = sum(GENERAL[di * 3 + dj]
             * lax.slice(xsp, (di, dj), (di + 512, dj + 512))
             for di in range(3) for dj in range(3))

  for name, fn in [
      ("pallas copy ref", pallas_copy),
      ("v4 nopad bm=64 colsum",
       lambda x, _b=64, _c=True: stencil_v4(x, GENERAL, _b, _c)),
      ("v4 nopad bm=32 naive",
       lambda x, _b=32, _c=False: stencil_v4(x, GENERAL, _b, _c)),
      ("v3 padded bm=64 colsum",
       lambda x: stencil_v3(x, GENERAL, 64, True)),
      ("xla_shift", xla_shift(GENERAL)),
  ]:
    try:
      if name.startswith("v4"):
        got = fn(xs)
        err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
        _st(f"{name} relerr(edges incl.) {err:.2e}")
        assert err < 1e-5, "edge semantics mismatch"
      g = slope_gbps(fn, x)
      _st(f"{name}: {g:.1f} GB/s ({g/819:.3f} of 819)")
    except Exception as e:
      _st(f"{name}: FAILED {e!r:.300}")

  _st("probe done")


if __name__ == "__main__":
  main()
