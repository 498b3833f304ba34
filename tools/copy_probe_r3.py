"""Is ~250 GB/s the v5e read+write streaming roofline?

Config-1 (read-only, scalar out) hits 750+ GB/s; every stencil variant
(read B, write B) caps at ~250.  Measure pure streaming ops to locate
the chip's read+write roofline: y = 2*x elementwise (XLA), a trivial
blocked Pallas copy, and read-only sum for cross-check.

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/copy_probe_r3.py > /tmp/copy_probe.log 2>&1
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

N = 8192
T0 = time.time()


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def slope_bytes(fn, x, nbytes):
  @jax.jit
  def loop(x, k):
    def body(i, c):
      x2, c2 = lax.optimization_barrier((x, c))
      out = fn(x2)
      return jnp.sum(out, dtype=jnp.float32) * 1e-30 + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

  s, _, _ = bench._slope_time(lambda k: (lambda: loop(x, k)),
                              k_lo=4, k_hi=20, reps=6)
  return nbytes / s / 1e9


def _copy_kernel(x_ref, o_ref):
  o_ref[:] = x_ref[:] * 2.0


def pallas_copy(x):
  return pl.pallas_call(
      _copy_kernel,
      grid=(N // 256, N // 1024),
      in_specs=[pl.BlockSpec((256, 1024), lambda i, j: (i, j))],
      out_specs=pl.BlockSpec((256, 1024), lambda i, j: (i, j)),
      out_shape=jax.ShapeDtypeStruct((N, N), x.dtype),
  )(x)


def main():
  x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (N, N),
                                        jnp.float32))()
  jax.block_until_ready(x)
  _st(f"platform={jax.devices()[0].device_kind}")
  B = N * N * 4

  for name, fn, nbytes in [
      ("xla y=2x (rw, 2B)", lambda x: 2.0 * x, 2 * B),
      ("pallas copy (rw, 2B)", pallas_copy, 2 * B),
      ("xla sum (read-only, B)", lambda x: jnp.sum(x, dtype=jnp.float32)
       .reshape(1, 1) * jnp.ones((8, 128), jnp.float32), B),
  ]:
    try:
      g = slope_bytes(fn, x, nbytes)
      _st(f"{name}: {g:.1f} GB/s ({g/819:.3f} of 819)")
    except Exception as e:
      _st(f"{name}: FAILED {e!r:.300}")
  _st("probe done")


if __name__ == "__main__":
  main()
