"""Stencil kernel v2 probe: full-width contiguous row-slab DMA.

stencil_probe_r3.py showed the current kernel is DMA-pipeline-bound
(center-tap-only = 252 GB/s): its (bm+8, bc+128) slabs read 264 strided
rows of 4.6 KB each — poor HBM DMA grain.  This variant uses a 1-D grid
over FULL-WIDTH row slabs so every DMA (slab in, block out) is one
contiguous HBM region, bm=64 keeping 3 slots + out pipeline under the
~16 MB VMEM budget.

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/stencil_probe2_r3.py > /tmp/stencil_probe2.log 2>&1
"""
import functools
import importlib.util
import time

import numpy as np

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
GENERAL = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
CENTER = (0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
T0 = time.time()


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def _kernel(coeffs, bm, m, nslots, x_ref, o_ref, scratch, sems):
  i = pl.program_id(0)
  n_steps = pl.num_programs(0)
  slot = lax.rem(i, nslots)

  def slab_dma(slot_idx, bi):
    return pltpu.make_async_copy(
        x_ref.at[pl.ds(bi * bm, bm + 8), :],
        scratch.at[slot_idx], sems.at[slot_idx])

  @pl.when(i == 0)
  def _():
    for k in range(nslots - 1):
      slab_dma(k, k).start()

  @pl.when(i + nslots - 1 < n_steps)
  def _():
    slab_dma(lax.rem(i + nslots - 1, nslots), i + nslots - 1).start()

  slab_dma(slot, i).wait()
  acc = jnp.zeros((bm, m), jnp.float32)
  for di in range(3):
    for dj in range(3):
      c = coeffs[di * 3 + dj]
      if c == 0.0:
        continue
      acc = acc + c * scratch[slot, di:di + bm, dj:dj + m]
  o_ref[:] = acc


def stencil_v2(x, coeffs, bm=64, nslots=3, interpret=False):
  n, m = x.shape
  xp = jnp.pad(x, ((1, 7), (1, 127)))
  return pl.pallas_call(
      functools.partial(_kernel, coeffs, bm, m, nslots),
      grid=(n // bm,),
      in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
      out_specs=pl.BlockSpec((bm, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((nslots, bm + 8, m + 128), x.dtype),
          pltpu.SemaphoreType.DMA((nslots,)),
      ],
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

  # correctness vs shifted-add; per-variant (a device abort poisons the
  # process, so order safest-first and take whatever lands)
  xs = jax.random.normal(jax.random.key(1), (512, 512), jnp.float32)
  xsp = jnp.pad(xs, 1)
  want = sum(GENERAL[di * 3 + dj]
             * lax.slice(xsp, (di, dj), (di + 512, dj + 512))
             for di in range(3) for dj in range(3))

  for name, bm, s, coeffs in [
      ("v2 bm=64 s=2 general", 64, 2, GENERAL),
      ("v2 bm=128 s=2 general", 128, 2, GENERAL),
      ("v2 bm=64 s=2 center", 64, 2, CENTER),
      ("v2 bm=64 s=3 general", 64, 3, GENERAL),
      ("v2 bm=32 s=4 general", 32, 4, GENERAL),
  ]:
    try:
      if coeffs is GENERAL:
        got = stencil_v2(xs, coeffs, bm, s)
        err = float(jnp.abs(got - want).max() / jnp.abs(want).max())
        _st(f"{name} relerr {err:.2e}")
        assert err < 1e-5
      g = slope_gbps(lambda x: stencil_v2(x, coeffs, bm, s), x)
      _st(f"{name}: {g:.1f} GB/s ({g/819:.3f} of roofline)")
    except Exception as e:
      _st(f"{name}: FAILED {e!r:.300}")

  _st("probe done")


if __name__ == "__main__":
  main()
