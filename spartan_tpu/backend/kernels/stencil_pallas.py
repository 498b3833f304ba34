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


def _kernel(coeffs, bm, bc, x_ref, o_ref, scratch, sems):
  """Double-buffered pipeline (pallas_guide: Double Buffering): scratch and
  semaphores persist across the sequential grid, so each step overlaps the
  NEXT slab's DMA with the current block's compute."""
  i, j = pl.program_id(0), pl.program_id(1)
  nj = pl.num_programs(1)
  step = i * nj + j
  n_steps = pl.num_programs(0) * nj
  slot = step % 2
  nxt = (step + 1) % 2

  def slab_dma(slot_idx, bi, bj):
    # slab = the output block plus its halo, rounded up to Mosaic's (8,128)
    # DMA tile alignment (the input is padded so slabs stay in bounds)
    return pltpu.make_async_copy(
        x_ref.at[pl.ds(bi * bm, bm + 8), pl.ds(bj * bc, bc + 128)],
        scratch.at[slot_idx], sems.at[slot_idx])

  @pl.when(step == 0)
  def _():
    slab_dma(slot, i, j).start()

  @pl.when(step + 1 < n_steps)
  def _():
    ni = jnp.where(j + 1 < nj, i, i + 1)
    njj = jnp.where(j + 1 < nj, j + 1, 0)
    slab_dma(nxt, ni, njj).start()

  slab_dma(slot, i, j).wait()
  acc = jnp.zeros((bm, bc), x_ref.dtype)
  for di in range(3):
    for dj in range(3):
      c = coeffs[di * 3 + dj]
      if c == 0.0:
        continue
      acc = acc + c * scratch[slot, di:di + bm, dj:dj + bc]
  o_ref[:] = acc


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
      scratch_shapes=[
          pltpu.VMEM((2, bm + 8, bc + 128), x.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(xp)
