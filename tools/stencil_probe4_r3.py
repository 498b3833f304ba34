"""Stencil probe v4: carry-chained slope timing (the honest harness).

copy_probe_r3 exposed the prior harness contaminating every read+write
measurement: the `jnp.sum(out)` consumer re-reads the kernel output
(+B traffic, cap 546 GB/s) and lets XLA fuse pure-XLA variants into the
reduce entirely (y=2x "measured" 1191 GB/s > roofline).  Here the loop
carries the ARRAY: c -> stencil(c), so per-iteration traffic is exactly
read B + write B and nothing fuses away.  Coefficients scaled to sum
0.9 so 20 chained applications stay finite.

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/stencil_probe4_r3.py > /tmp/stencil_probe4.log 2>&1
"""
import functools
import importlib.util
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench._enable_compile_cache()

import sys  # noqa: E402
sys.path.insert(0, "/root/repo")
from spartan_tpu.backend.kernels import stencil_pallas  # noqa: E402

N = 8192
S = 0.9 / 4.5
GENERAL = tuple(S * v for v in
                (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
T0 = time.time()


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def slope_gbps(fn, x):
  """Carry-chained: per-iteration traffic = read B + write B."""

  @jax.jit
  def loop(x, k):
    return lax.fori_loop(0, k, lambda i, c: fn(c), x)

  s, _, _ = bench._slope_time(lambda k: (lambda: loop(x, k)),
                              k_lo=4, k_hi=20, reps=6)
  return 2 * N * N * 4 / s / 1e9


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


# v3: standard pipeline, all-Element overlapping input blocks
def _v3_kernel(coeffs, bm, m, colsum, x_ref, o_ref):
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


def stencil_v3(x, coeffs, bm=64, colsum=True):
  n, m = x.shape
  xp = jnp.pad(x, ((1, 7), (1, 127)))
  mp = m + 128
  return pl.pallas_call(
      functools.partial(_v3_kernel, coeffs, bm, m, colsum),
      grid=(n // bm,),
      in_specs=[pl.BlockSpec((pl.Element(bm + 8), pl.Element(mp)),
                             lambda i: (i * bm, 0))],
      out_specs=pl.BlockSpec((bm, m), lambda i: (i, 0)),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
  )(xp)


def main():
  x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (N, N),
                                        jnp.float32))()
  jax.block_until_ready(x)
  _st(f"platform={jax.devices()[0].device_kind}")

  for name, fn in [
      ("pallas copy (r+w roofline)", pallas_copy),
      ("xla y=0.999x", lambda x: 0.999 * x),
      ("xla_shift/general", xla_shift(GENERAL)),
      ("pallas v1 dma", lambda x: stencil_pallas.stencil3x3(x, GENERAL)),
      ("pallas v3 colsum bm=64",
       lambda x: stencil_v3(x, GENERAL, 64, True)),
      ("pallas v3 naive bm=32",
       lambda x: stencil_v3(x, GENERAL, 32, False)),
  ]:
    try:
      g = slope_gbps(fn, x)
      _st(f"{name}: {g:.1f} GB/s ({g/819:.3f} of 819)")
    except Exception as e:
      _st(f"{name}: FAILED {e!r:.300}")
  _st("probe done")


if __name__ == "__main__":
  main()
