"""Measure the pre-padded-storage stencil kernel on the live chip
(VERDICT r3 next #3: target >=450 GB/s effective on the 8192^2 heat step
vs the 592-660 GB/s r+w streaming roofline).

Honest harness (CLAUDE.md stencil campaign): UNROLLED k-application
programs — slope between steps=K_LO and steps=K_HI jitted programs gives
the marginal per-application cost with no fori-carry-into-pallas stall
and no reduce-consumer fusion trap.  Each program ends in a scalar
``jnp.sum`` consumer FETCHED to the host: ``jax.block_until_ready`` is
unreliable on the axon runtime (measured r4s2: a steps=1 program
"completed" in 0.17 ms; the fetch then took the real time), so the only
trustworthy sync is consuming the value.  The sum's extra read pass and
the ~30 ms tunnel dispatch constant are identical for both K values and
cancel in the slope.  Effective GB/s counts the USEFUL traffic only
(read n*m + write n*m f32); the kernel's real traffic is ~1.1x reads
(halo/alignment amplification), so 100% here is unreachable by design —
the roofline comparison is the honest one.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/stencil_padded_probe.py
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

from spartan_tpu.backend.kernels import stencil_pallas as stp

N = 8192
K_LO, K_HI = 4, 44
COEFFS = (0.0, 0.1, 0.0, 0.1, 0.6, 0.1, 0.0, 0.1, 0.0)


def fetch_time(prog, args, reps=5):
  """min wall time of dispatch + scalar fetch (the only reliable sync)."""
  float(prog(*args))  # warm: compile + first run
  ts = []
  for _ in range(reps):
    t0 = time.perf_counter()
    float(prog(*args))
    ts.append(time.perf_counter() - t0)
  return min(ts)


def main():
  print("device:", jax.devices()[0].device_kind, flush=True)
  x = jax.jit(lambda: jax.random.uniform(
      jax.random.key(0), (N, N), jnp.float32))()
  xp = stp.to_padded(x)
  buf = jnp.zeros_like(xp)
  print("padded state ready", xp.shape, flush=True)

  def padded_prog(k):
    @jax.jit
    def prog(xp, buf):
      for _ in range(k):
        xp, buf = stp.stencil3x3_padded(xp, buf, COEFFS, steps=1)
      return jnp.sum(stp.from_padded(xp))
    return prog

  t_lo = fetch_time(padded_prog(K_LO), (xp, buf))
  print(f"steps={K_LO}: {t_lo*1e3:.2f} ms", flush=True)
  t_hi = fetch_time(padded_prog(K_HI), (xp, buf))
  print(f"steps={K_HI}: {t_hi*1e3:.2f} ms", flush=True)
  per_app = (t_hi - t_lo) / (K_HI - K_LO)
  useful = 2 * N * N * 4
  gbps = useful / per_app / 1e9
  print(f"padded-storage stencil: {per_app*1e3:.3f} ms/app = "
        f"{gbps:.1f} GB/s effective (useful r+w) at {N}^2 f32", flush=True)

  # comparison: the one-shot kernel (pays the jnp.pad pass per call);
  # k is a python-int static per program — two programs like above
  def oneshot_prog(k):
    @jax.jit
    def prog(x):
      for _ in range(k):
        x = stp.stencil3x3(x, COEFFS)
      return jnp.sum(x)
    return prog

  t1 = fetch_time(oneshot_prog(K_LO), (x,))
  t2 = fetch_time(oneshot_prog(K_HI), (x,))
  per1 = (t2 - t1) / (K_HI - K_LO)
  print(f"one-shot kernel (pad-pass): {per1*1e3:.3f} ms/app = "
        f"{useful/per1/1e9:.1f} GB/s effective", flush=True)


if __name__ == "__main__":
  main()
