"""Measure the pre-padded-storage stencil kernel on the live chip
(VERDICT r3 next #3: target >=450 GB/s effective on the 8192^2 heat step
vs the 592-660 GB/s r+w streaming roofline).

Honest harness (CLAUDE.md stencil campaign): UNROLLED k-application
programs — slope between steps=K_LO and steps=K_HI jitted programs gives
the marginal per-application cost with no fori-carry-into-pallas stall
and no reduce-consumer fusion trap.  Effective GB/s counts the USEFUL
traffic only (read n*m + write n*m f32); the kernel's real traffic is
~1.1x reads (halo/alignment amplification), so 100% here is unreachable
by design — the roofline comparison is the honest one.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/stencil_padded_probe.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from spartan_tpu.backend.kernels import stencil_pallas as stp

N = 8192
K_LO, K_HI = 4, 12
COEFFS = (0.0, 0.1, 0.0, 0.1, 0.6, 0.1, 0.0, 0.1, 0.0)


def sync(x):
  jax.block_until_ready(x)
  return x


def time_steps(xp, buf, steps, reps=5):
  out = stp.stencil3x3_padded(xp, buf, COEFFS, steps=steps)
  sync(out)
  ts = []
  for _ in range(reps):
    t0 = time.perf_counter()
    sync(stp.stencil3x3_padded(xp, buf, COEFFS, steps=steps))
    ts.append(time.perf_counter() - t0)
  return min(ts)


def main():
  print("device:", jax.devices()[0].device_kind, flush=True)
  x = jax.jit(lambda: jax.random.uniform(
      jax.random.key(0), (N, N), jnp.float32))()
  xp = sync(stp.to_padded(x))
  buf = jnp.zeros_like(xp)
  print("padded state ready", xp.shape, flush=True)

  t_lo = time_steps(xp, buf, K_LO)
  print(f"steps={K_LO}: {t_lo*1e3:.2f} ms", flush=True)
  t_hi = time_steps(xp, buf, K_HI)
  print(f"steps={K_HI}: {t_hi*1e3:.2f} ms", flush=True)
  per_app = (t_hi - t_lo) / (K_HI - K_LO)
  useful = 2 * N * N * 4
  gbps = useful / per_app / 1e9
  print(f"padded-storage stencil: {per_app*1e3:.3f} ms/app = "
        f"{gbps:.1f} GB/s effective (useful r+w) at {N}^2 f32", flush=True)

  # comparison: the one-shot kernel (pays the jnp.pad pass per call);
  # k is a python-int static per program — two programs like above
  def time_oneshot(k, reps=5):
    f = jax.jit(lambda x: _apply(x, k))
    sync(f(x))
    ts = []
    for _ in range(reps):
      t0 = time.perf_counter()
      sync(f(x))
      ts.append(time.perf_counter() - t0)
    return min(ts)

  def _apply(x, k):
    for _ in range(k):
      x = stp.stencil3x3(x, COEFFS)
    return x

  t1 = time_oneshot(K_LO)
  t2 = time_oneshot(K_HI)
  per1 = (t2 - t1) / (K_HI - K_LO)
  print(f"one-shot kernel (pad-pass): {per1*1e3:.3f} ms/app = "
        f"{useful/per1/1e9:.1f} GB/s effective", flush=True)


if __name__ == "__main__":
  main()
