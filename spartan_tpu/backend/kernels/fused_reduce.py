"""Single-pass fused elementwise+reduce Pallas kernel.

The config-1 roofline op: ``sum(f(b))`` for an elementwise ``f`` — read
each element of ``b`` exactly once from HBM, apply the fused chain on the
VPU, and accumulate on-chip.  Measured at ~776 GB/s (95 % of the v5e HBM
roofline) vs ~390 GB/s for XLA's fused reduce of the same chain.

Design (validated on hardware; see bench.py):
  * 2-D grid over (row-blocks × column-blocks); TPU grids run sequentially
    per core, so all programs accumulate into ONE revisited (8, 128) VMEM
    tile — the canonical revisiting pattern;
  * folds use static strided slices (``blk[:, t*128:(t+1)*128]``), NOT
    3-D reshapes across the sublane dim — Mosaic rejects those;
  * the accumulator tile is VPU-register-shaped (8 sublanes × 128 lanes);
    an SMEM scalar accumulator serializes the reduction and halves
    throughput;
  * optional scalar operands arrive as (1, 1) SMEM inputs (Pallas kernels
    cannot capture traced constants).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick(n: int, pref: int, align: int) -> int:
  """Largest divisor of n that is ≤ pref and a multiple of align."""
  b = min(n, pref)
  b -= b % align
  while b > align and n % b != 0:
    b -= align
  return b if b >= align and n % b == 0 else 0


def _kernel(f, acc_dtype, n_scalars, *refs):
  x_ref = refs[0]
  scalar_refs = refs[1:1 + n_scalars]
  o_ref = refs[1 + n_scalars]
  i, j = pl.program_id(0), pl.program_id(1)

  @pl.when((i == 0) & (j == 0))
  def _():
    o_ref[:] = jnp.zeros_like(o_ref)

  scalars = [s[0, 0] for s in scalar_refs]
  blk = f(x_ref[:], *scalars).astype(acc_dtype)
  bm, bc = blk.shape
  # fold columns down to the 128-lane width
  acc = blk[:, 0:128]
  for t in range(1, bc // 128):
    acc = acc + blk[:, t * 128:(t + 1) * 128]
  # fold rows down to the 8-sublane height
  s = acc[0:8]
  for r in range(1, bm // 8):
    s = s + acc[r * 8:(r + 1) * 8]
  o_ref[:] += s


def fused_sum(x: jax.Array, f: Callable = lambda v: v,
              scalars: Sequence = (), acc_dtype=jnp.float32,
              interpret: bool = False) -> jax.Array:
  """``sum(f(x, *scalars))`` in one HBM pass → scalar of ``acc_dtype``.

  ``f`` is an elementwise jnp-traceable function of the block plus the
  scalar operands (each a traced 0-d value routed through SMEM).
  Falls back to a plain jnp reduction when the shape can't tile cleanly.
  """
  if x.ndim == 1:
    x = x.reshape(1, -1)
  if x.ndim != 2:
    x = x.reshape(-1, x.shape[-1])
  n, m = x.shape
  bm = _pick(n, 256, 8)
  bc = _pick(m, 512, 128)
  if not bm or not bc:
    return jnp.sum(f(x, *[jnp.asarray(s) for s in scalars]),
                   dtype=acc_dtype)
  scalar_args = [jnp.asarray(s).reshape(1, 1) for s in scalars]
  in_specs = [pl.BlockSpec((bm, bc), lambda i, j: (i, j),
                           memory_space=pltpu.VMEM)]
  in_specs += [pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                            memory_space=pltpu.SMEM)] * len(scalar_args)
  out = pl.pallas_call(
      functools.partial(_kernel, f, acc_dtype, len(scalar_args)),
      grid=(n // bm, m // bc),
      in_specs=in_specs,
      out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((8, 128), acc_dtype),
      interpret=interpret,
  )(x, *scalar_args)
  return jnp.sum(out)


@functools.partial(jax.jit, static_argnames=("scale", "interpret"))
def ones_plus_scale_sum(b: jax.Array, scale: float = 2.0,
                        interpret: bool = False):
  """The exact config-1 chain ``sum(1 + b*scale)`` as one kernel pass."""
  return fused_sum(b, lambda v: 1.0 + v * float(scale),
                   acc_dtype=jnp.float32, interpret=interpret)
