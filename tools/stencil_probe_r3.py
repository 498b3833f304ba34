"""Round-3 on-chip stencil bottleneck probe — ONE process/session.

The Pallas DMA stencil (backend/kernels/stencil_pallas.py) measured
278 GB/s vs the 819 GB/s HBM roofline.  Hypothesis: the nine shifted
reads `scratch[slot, di:di+bm, dj:dj+bc]` cost unaligned 128-lane
rotates on the VPU for dj != 0, making the kernel shuffle-bound, not
DMA-bound.  Variants separate the costs:

  xla_conv      lax.conv_general_dilated (the expr-layer default)
  xla_shift     nine statically shifted adds in plain XLA
  pallas_full   current kernel, general 9-coeff stencil
  pallas_col    coeffs only in the middle column (no lane shifts)
  pallas_center coeffs only at the center (pure DMA pipeline bound)

All 8192^2 f32, barrier-tied slope timing (bench.py methodology).

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/stencil_probe_r3.py > /tmp/stencil_probe.log 2>&1
"""
import importlib.util
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench._enable_compile_cache()

from spartan_tpu.backend.kernels import stencil_pallas  # noqa: E402

N = 8192
LAPLACE = (0.0, 1.0, 0.0, 1.0, -4.0, 1.0, 0.0, 1.0, 0.0)
GENERAL = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
COL = (0.0, 0.2, 0.0, 0.0, 0.5, 0.0, 0.0, 0.8, 0.0)
CENTER = (0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
T0 = time.time()


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def slope_gbps(fn, x):
  """Marginal per-application seconds of fn inside a fori_loop."""

  @jax.jit
  def loop(x, k):
    def body(i, c):
      x2, c2 = lax.optimization_barrier((x, c))
      out = fn(x2)
      return jnp.sum(out, dtype=jnp.float32) * 1e-30 + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

  s, _, _ = bench._slope_time(lambda k: (lambda: loop(x, k)),
                              k_lo=4, k_hi=20, reps=6)
  return 2 * N * N * 4 / s / 1e9  # read + write


def xla_conv(coeffs):
  k = jnp.asarray(np.array(coeffs, np.float32).reshape(3, 3, 1, 1))

  def fn(x):
    return lax.conv_general_dilated(
        x[None, :, :, None], k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
  return fn


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


def main():
  x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (N, N),
                                        jnp.float32))()
  jax.block_until_ready(x)
  _st(f"data on device; platform={jax.devices()[0].device_kind}")

  # correctness cross-check once (small, cheap)
  xs = x[:512, :512]
  want = np.asarray(xla_shift(GENERAL)(xs))
  got = np.asarray(stencil_pallas.stencil3x3(xs, GENERAL))
  _st(f"pallas vs shifted-add relerr "
      f"{np.abs(got-want).max()/np.abs(want).max():.2e}")

  for name, fn in [
      ("xla_conv/general", xla_conv(GENERAL)),
      ("xla_shift/general", xla_shift(GENERAL)),
      ("xla_conv/laplace", xla_conv(LAPLACE)),
      ("xla_shift/laplace", xla_shift(LAPLACE)),
      ("pallas_full/general",
       lambda x: stencil_pallas.stencil3x3(x, GENERAL)),
      ("pallas_full/laplace",
       lambda x: stencil_pallas.stencil3x3(x, LAPLACE)),
      ("pallas_col", lambda x: stencil_pallas.stencil3x3(x, COL)),
      ("pallas_center", lambda x: stencil_pallas.stencil3x3(x, CENTER)),
  ]:
    try:
      g = slope_gbps(fn, x)
      _st(f"{name}: {g:.1f} GB/s ({g/819:.3f} of roofline)")
    except Exception as e:
      _st(f"{name}: FAILED {e!r:.200}")

  _st("probe done")


if __name__ == "__main__":
  main()
