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


def _kernel(coeffs, bm, m, x_ref, o_ref):
  i = pl.program_id(0)

  def body(scratch, sem):
    # slab rows [i*bm, i*bm + bm + 2) of the padded input: the block plus
    # one halo row above and below (always in-bounds — input is pre-padded)
    dma = pltpu.make_async_copy(
        x_ref.at[pl.ds(i * bm, bm + 2), :], scratch, sem)
    dma.start()
    dma.wait()
    acc = jnp.zeros((bm, m), scratch.dtype)
    for di in range(3):
      for dj in range(3):
        c = coeffs[di * 3 + dj]
        if c == 0.0:
          continue
        acc = acc + c * scratch[di:di + bm, dj:dj + m]
    o_ref[:] = acc

  pl.run_scoped(
      body,
      scratch=pltpu.VMEM((bm + 2, m + 2), x_ref.dtype),
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
  xp = jnp.pad(x, 1)
  if not bm:
    # ragged fallback: shifted adds in plain XLA
    acc = jnp.zeros_like(x)
    for di in range(3):
      for dj in range(3):
        acc = acc + coeffs[di * 3 + dj] * xp[di:di + n, dj:dj + m]
    return acc
  return pl.pallas_call(
      functools.partial(_kernel, coeffs, bm, m),
      grid=(n // bm,),
      in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
      out_specs=pl.BlockSpec((bm, m), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
      interpret=interpret,
  )(xp)
