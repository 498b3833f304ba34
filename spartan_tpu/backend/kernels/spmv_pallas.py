"""Pallas ELL SpMV kernel.

``y[i] = Σ_j vals[i, j] * x[cols[i, j]]`` with the dense vector ``x``
resident in VMEM (PageRank-scale vectors fit easily) and the ELL blocks
streamed row-block by row-block.

HARDWARE STATUS (v5e, jax 0.9): Mosaic rejects the 1-D-operand gather
("Only 2D gather is supported") — ``spmv()`` in ``backend/sparse.py``
catches the failure and uses the XLA gather path, which is what the
PageRank config runs end-to-end (validated on chip).  Next attempt:
express the gather with a 2-D operand (``jnp.take((m,1), cols, axis=0)``)
or a one-hot MXU formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(cols_ref, vals_ref, x_ref, out_ref):
  cols = cols_ref[:]                      # (bm, k) int32
  vals = vals_ref[:]                      # (bm, k)
  x = x_ref[:]                            # (n_cols, 1) in VMEM
  gathered = jnp.take(x[:, 0], cols, axis=0)
  out_ref[:] = jnp.sum(vals * gathered, axis=1, keepdims=True)


def _block_rows(n: int) -> int:
  bm = min(n, 512)
  bm -= bm % 8
  while bm > 8 and n % bm != 0:
    bm -= 8
  return max(bm, 8) if n % 8 == 0 else n


@functools.partial(jax.jit, static_argnames=("interpret",))
def spmv(cols: jax.Array, vals: jax.Array, x: jax.Array,
         interpret: bool = False) -> jax.Array:
  """ELL SpMV; cols/vals (n, k), x (m,) → y (n,)."""
  n, k = cols.shape
  m = x.shape[0]
  bm = _block_rows(n)
  x2 = x.reshape(m, 1).astype(vals.dtype)
  out = pl.pallas_call(
      _kernel,
      grid=(pl.cdiv(n, bm),),
      in_specs=[
          pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((bm, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((m, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bm, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, 1), vals.dtype),
      interpret=interpret,
  )(cols, vals, x2)
  return out[:, 0]
