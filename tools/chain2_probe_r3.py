"""Can pallas_call be chained through fori_loop at streaming speed?

probe5 measured a fori-chained pallas copy at 55 ms/iter (~70x off).
Variants, all timing the marginal per-iteration cost at k=8 vs 40:
  A. fori + pallas copy (baseline pathological case, re-measure)
  B. fori + pallas copy with input_output_aliases={0:0} (in-place)
  C. lax.scan + pallas copy (xs=None, carry-chained)
  D. fori + XLA 9-tap shift (non-pallas reference)

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/chain2_probe_r3.py > /tmp/chain2_probe.log 2>&1
"""
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
T0 = time.time()


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def _copy_kernel(x_ref, o_ref):
  o_ref[:] = x_ref[:] * 0.9999


def pallas_copy(x, alias=False):
  kw = dict(input_output_aliases={0: 0}) if alias else {}
  return pl.pallas_call(
      _copy_kernel,
      grid=(N // 256, N // 1024),
      in_specs=[pl.BlockSpec((256, 1024), lambda i, j: (i, j))],
      out_specs=pl.BlockSpec((256, 1024), lambda i, j: (i, j)),
      out_shape=jax.ShapeDtypeStruct((N, N), jnp.float32),
      **kw,
  )(x)


def slope_gbps(loop_fn, x):
  s, _, _ = bench._slope_time(lambda k: (lambda: loop_fn(x, k)),
                              k_lo=8, k_hi=40, reps=6)
  return 2 * N * N * 4 / s / 1e9


def main():
  x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (N, N),
                                        jnp.float32))()
  jax.block_until_ready(x)
  _st(f"platform={jax.devices()[0].device_kind}")

  @jax.jit
  def rsum(x, k):
    def body(i, c):
      x2, c2 = lax.optimization_barrier((x, c))
      return jnp.sum(x2, dtype=jnp.float32) + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
  s, _, _ = bench._slope_time(lambda k: (lambda: rsum(x, k)),
                              k_lo=8, k_hi=40, reps=6)
  _st(f"read-only reference: {N*N*4/s/1e9:.1f} GB/s")

  @jax.jit
  def fori_plain(x, k):
    return lax.fori_loop(0, k, lambda i, c: pallas_copy(c), x)

  @jax.jit
  def fori_alias(x, k):
    return lax.fori_loop(0, k, lambda i, c: pallas_copy(c, True), x)

  @jax.jit
  def scan_copy(x, k):
    del k
    y, _ = lax.scan(lambda c, _: (pallas_copy(c), None), x, None,
                    length=40)
    return y

  @jax.jit
  def scan_copy_short(x, k):
    del k
    y, _ = lax.scan(lambda c, _: (pallas_copy(c), None), x, None,
                    length=8)
    return y

  def xshift(c):
    xp = jnp.pad(c, 1)
    acc = jnp.zeros_like(c)
    for di in range(3):
      for dj in range(3):
        acc = acc + 0.1 * lax.slice(xp, (di, dj), (di + N, dj + N))
    return acc

  @jax.jit
  def fori_xla(x, k):
    return lax.fori_loop(0, k, lambda i, c: xshift(c), x)

  for name, fn in [
      ("A fori+pallas", fori_plain),
      ("B fori+pallas aliased", fori_alias),
      ("D fori+xla shift", fori_xla),
  ]:
    try:
      g = slope_gbps(fn, x)
      _st(f"{name}: {g:.1f} GB/s ({g/819:.3f} of 819)")
    except Exception as e:
      _st(f"{name}: FAILED {e!r:.300}")

  # C: scan — two fixed lengths, marginal over 32 iters
  try:
    jax.block_until_ready(scan_copy_short(x, 0))
    jax.block_until_ready(scan_copy(x, 0))
    tl, th = [], []
    for _ in range(6):
      t0 = time.perf_counter()
      jax.block_until_ready(scan_copy_short(x, 0))
      tl.append(time.perf_counter() - t0)
      t0 = time.perf_counter()
      jax.block_until_ready(scan_copy(x, 0))
      th.append(time.perf_counter() - t0)
    s = (min(th) - min(tl)) / 32
    _st(f"C scan+pallas: {2*N*N*4/s/1e9:.1f} GB/s")
  except Exception as e:
    _st(f"C scan+pallas: FAILED {e!r:.300}")

  _st("probe done")


if __name__ == "__main__":
  main()
