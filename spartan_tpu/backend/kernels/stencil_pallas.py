"""Pallas 3×3 stencil kernel with manual halo DMA.

The expr-layer stencil (`spartan_tpu/expr/stencil.py`) uses XLA's conv,
which is the right default.  This kernel exists as the explicit-DMA
counterpart (pallas_guide: Async DMA / run_scoped): the padded input stays
in HBM (``memory_space=ANY``), each grid step DMAs its row-slab *plus one
halo row on each side* into VMEM scratch with a dynamic offset, and the
3×3 stencil is computed as nine statically-shifted fused multiply-adds on
the VPU.  Coefficients are static Python floats (fixed-coefficient
stencils — Laplacians, blurs — are the common case).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coeffs, bm, bc, x_ref, o_ref):
  i, j = pl.program_id(0), pl.program_id(1)

  def body(scratch, sem):
    # slab = the output block plus its halo, rounded up to Mosaic's (8,128)
    # DMA tile alignment (the input is padded so slabs stay in bounds)
    dma = pltpu.make_async_copy(
        x_ref.at[pl.ds(i * bm, bm + 8), pl.ds(j * bc, bc + 128)],
        scratch, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((bm, bc), scratch.dtype)
    for di in range(3):
      for dj in range(3):
        c = coeffs[di * 3 + dj]
        if c == 0.0:
          continue
        acc = acc + c * scratch[di:di + bm, dj:dj + bc]
    o_ref[:] = acc

  pl.run_scoped(
      body,
      scratch=pltpu.VMEM((bm + 8, bc + 128), x_ref.dtype),
      sem=pltpu.SemaphoreType.DMA(()),
  )


def _pick_bm(n: int) -> int:
  bm = min(n, 256)
  bm -= bm % 8
  while bm > 8 and n % bm != 0:
    bm -= 8
  return bm if bm >= 8 and n % bm == 0 else 0


@functools.partial(jax.jit, static_argnames=("coeffs", "interpret"))
def stencil3x3(x: jax.Array, coeffs: Sequence[float],
               interpret: bool = False) -> jax.Array:
  """'SAME' 3×3 correlation of a 2-D array with static coefficients
  (row-major 9-tuple), zero boundary."""
  coeffs = tuple(float(c) for c in coeffs)
  assert len(coeffs) == 9
  n, m = x.shape
  bm = _pick_bm(n)
  bc = min(m, 1024)
  bc -= bc % 128
  while bc > 128 and m % bc != 0:
    bc -= 128
  if m % 128 or m % max(bc, 1):
    bc = 0
  # Mosaic DMA slices must align to the (8, 128) tile: rows get 1 halo on
  # top + 7 spare below; cols get 1 halo left + 127 spare right
  xp = jnp.pad(x, ((1, 7), (1, 127)))
  if not bm or not bc:
    # ragged fallback: shifted adds in plain XLA
    acc = jnp.zeros_like(x)
    for di in range(3):
      for dj in range(3):
        acc = acc + coeffs[di * 3 + dj] * xp[di:di + n, dj:dj + m]
    return acc  # extra bottom pad rows never read (di+n <= n+2 < n+8)
  return pl.pallas_call(
      functools.partial(_kernel, coeffs, bm, bc),
      grid=(n // bm, m // bc),
      in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
      out_specs=pl.BlockSpec((bm, bc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
      interpret=interpret,
  )(xp)
