"""Single-pass fused elementwise+reduce Pallas kernel.

The config-1 roofline op: ``sum(f(b))`` for an elementwise ``f`` — read
each element of ``b`` exactly once from HBM, apply the fused elementwise
chain on the VPU, and accumulate the scalar on-chip.  The TPU grid runs
row-blocks sequentially per core, so accumulating into a (1,1) SMEM output
across grid steps is the canonical revisiting pattern (pallas_guide:
Reductions / Grid).

``fused_sum(b, f)``: f is any jnp-traceable elementwise function.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_block(n_rows: int, n_cols: int, itemsize: int) -> int:
  """Choose a row-block height: big enough to stream, small enough that the
  double-buffered block pair fits comfortably in ~16 MB VMEM."""
  budget = 4 * 1024 * 1024  # bytes per block (×2 buffers ≈ half of VMEM)
  rows = max(8, min(n_rows, budget // max(1, n_cols * itemsize)))
  # align to the f32 sublane (8)
  rows -= rows % 8
  while rows > 8 and n_rows % rows != 0:
    rows -= 8
  return max(rows, 8) if n_rows % 8 == 0 else n_rows


def _kernel(f, acc_dtype, x_ref, out_ref):
  # accumulate a (8, 128) VMEM partial-sum tile across sequential grid
  # steps (VPU-lane-shaped — an SMEM scalar accumulator serializes the
  # reduction tree and halves throughput)
  i = pl.program_id(0)

  @pl.when(i == 0)
  def _():
    out_ref[:] = jnp.zeros_like(out_ref)

  block = f(x_ref[:]).astype(acc_dtype)
  bm, m = block.shape
  folded = block.reshape(bm, m // 128, 128).sum(axis=1)   # (bm, 128)
  out_ref[:] += folded.reshape(bm // 8, 8, 128).sum(axis=0)


def fused_sum(x: jax.Array, f: Callable = lambda v: v,
              acc_dtype=jnp.float32, interpret: bool = False) -> jax.Array:
  """``sum(f(x))`` in one HBM pass; returns a scalar of ``acc_dtype``."""
  if x.ndim != 2:
    x = x.reshape(-1, x.shape[-1]) if x.ndim > 2 else x.reshape(1, -1)
  n, m = x.shape
  if m % 128 == 0 and n % 8 == 0:
    bm = _pick_block(n, m, x.dtype.itemsize)
    grid = (pl.cdiv(n, bm),)
    out = pl.pallas_call(
        functools.partial(_kernel, f, acc_dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, m), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), acc_dtype),
        interpret=interpret,
    )(x)
    return jnp.sum(out)
  # ragged fallback: single-block scalar reduction
  out = pl.pallas_call(
      lambda x_ref, o_ref: o_ref.__setitem__(
          (0, 0), jnp.sum(f(x_ref[:]).astype(acc_dtype))),
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
      out_shape=jax.ShapeDtypeStruct((1, 1), acc_dtype),
      interpret=interpret,
  )(x)
  return out[0, 0]


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def ones_plus_scale_sum(b: jax.Array, scale: float = 2.0,
                        interpret: bool = False):
  """The exact config-1 chain ``sum(1 + b*scale)`` as one kernel pass.
  ``scale`` is static — Pallas kernels can't capture traced constants."""
  return fused_sum(b, lambda v: 1.0 + v * float(scale),
                   acc_dtype=jnp.float32, interpret=interpret)
