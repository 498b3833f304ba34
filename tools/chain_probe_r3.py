"""Why is a carry-chained elementwise fori_loop 40x off roofline?

stencil_probe4 measured y=0.999*x chained through a fori_loop carry at
48 GB/s (expected ~400+).  Diagnose in one session:
  1. read-only sum reference (weather normalization — expect ~750)
  2. raw wall times of the chained scale loop at k=10 / k=100
  3. same with donate_argnums=0
  4. compiled-HLO copy count for the loop
  5. chained scale WITHOUT jit-of-fori: python loop of jitted scale with
     donation (the serving-style chain)

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/chain_probe_r3.py > /tmp/chain_probe.log 2>&1
"""
import importlib.util
import time

import jax
import jax.numpy as jnp
from jax import lax

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench._enable_compile_cache()

N = 8192
B = N * N * 4
T0 = time.time()


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
  x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (N, N),
                                        jnp.float32))()
  jax.block_until_ready(x)
  _st(f"platform={jax.devices()[0].device_kind}")

  # 1. read-only reference
  @jax.jit
  def rsum(x, k):
    def body(i, c):
      x2, c2 = lax.optimization_barrier((x, c))
      return jnp.sum(x2, dtype=jnp.float32) + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

  s, _, _ = bench._slope_time(lambda k: (lambda: rsum(x, k)),
                              k_lo=8, k_hi=40, reps=6)
  _st(f"read-only sum: {B/s/1e9:.1f} GB/s")

  # 2. chained scale, raw times
  @jax.jit
  def chain(x, k):
    return lax.fori_loop(0, k, lambda i, c: c * 0.999, x)

  jax.block_until_ready(chain(x, 10))
  jax.block_until_ready(chain(x, 100))
  for k in (10, 100, 10, 100):
    t0 = time.perf_counter()
    jax.block_until_ready(chain(x, k))
    _st(f"chain k={k}: {time.perf_counter()-t0:.4f}s")

  # 3. donated
  chain_d = jax.jit(lambda x, k:
                    lax.fori_loop(0, k, lambda i, c: c * 0.999, x),
                    donate_argnums=0)
  y = jnp.copy(x)
  y = chain_d(y, 10)
  jax.block_until_ready(y)
  t0 = time.perf_counter()
  y = chain_d(y, 100)
  jax.block_until_ready(y)
  t100 = time.perf_counter() - t0
  t0 = time.perf_counter()
  y = chain_d(y, 10)
  jax.block_until_ready(y)
  t10 = time.perf_counter() - t0
  _st(f"chain donated: k=100 {t100:.4f}s k=10 {t10:.4f}s "
      f"-> {2*B*90/(t100-t10)/1e9:.1f} GB/s marginal")

  # 4. compiled HLO copy count
  try:
    txt = jax.jit(lambda x, k: lax.fori_loop(
        0, k, lambda i, c: c * 0.999, x)).lower(x, 10).compile().as_text()
    ncopy = txt.count("copy(")
    nfus = txt.count("fusion(")
    _st(f"compiled HLO: {ncopy} copy ops, {nfus} fusions, "
        f"{len(txt)} chars")
    for line in txt.splitlines():
      if "copy(" in line or "while" in line[:40]:
        _st("  HLO: " + line.strip()[:160])
  except Exception as e:
    _st(f"HLO dump failed: {e!r:.200}")

  # 5. serving-style python chain with donation
  step = jax.jit(lambda c: c * 0.999, donate_argnums=0)
  y = jnp.copy(x)
  y = step(y)
  jax.block_until_ready(y)
  t0 = time.perf_counter()
  for _ in range(50):
    y = step(y)
  jax.block_until_ready(y)
  dt = (time.perf_counter() - t0) / 50
  _st(f"python-chained donated step: {dt*1e3:.3f} ms/iter = "
      f"{2*B/dt/1e9:.1f} GB/s")

  _st("probe done")


if __name__ == "__main__":
  main()
