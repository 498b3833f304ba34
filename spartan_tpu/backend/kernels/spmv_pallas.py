"""Pallas ELL SpMV kernel — gather as an on-the-fly one-hot MXU dot.

``y[i] = Σ_j vals[i, j] * x[cols[i, j]]`` for unstructured sparsity.

TPU has no fast unstructured gather: the XLA ``jnp.take`` path runs at
~0.1 Gnnz/s on v5e, and Mosaic rejects every in-kernel gather
formulation (1-D operand, (m,1) take, take_along_axis-style — see
CLAUDE.md round-1 notes).  This kernel never gathers: for each strip of
128 ELL entries it *builds the one-hot matrix in registers* and reads
``x`` through the MXU,

    x2dT[v, u] = x[u·128 + v]                       (128, nq) in VMEM
    G[v, e]    = Σ_u x2dT[v, u] · (q[e] == u)       one MXU dot
    y[e]       = Σ_v G[v, e] · (r[e] == v)          VPU select+reduce

with ``q = col // 128``, ``r = col % 128``.  Compute is 2·n FLOP per
nonzero (the linear-algebra cost of a one-hot gather), so the kernel
wins only while the MXU can amortize that: measured on v5e at 64 nnz/row
(vs the 0.09 Gnnz/s XLA gather):

    n=4096   1.28 Gnnz/s f32-exactish   3.42 Gnnz/s bf16   (14× / 38×)
    n=16384  1.01 Gnnz/s                1.46 Gnnz/s        (11× / 16×)
    n=65536  0.08 Gnnz/s                0.15 Gnnz/s        (crossover)

The MXU multiplies in bf16: the default path hi/lo-splits ``x`` into two
bf16 dots (relerr ~3e-6); ``use_bf16=True`` is single-pass (~2e-3).
``Precision.HIGHEST`` measured 2.6× slower than hi/lo for 1 extra digit.
``tpu.dynamic_gather`` (take_along_axis lowering) would replace the VPU
select stage but crashes this target's Mosaic compiler (HTTP-500 in the
remote compile helper even for a minimal (128,128) axis-0 gather) — re-
test on newer toolchains.  Callers fall back to XLA above n = 32768.

Reference parity: spartan/sparse C++ SpMV kernels (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIPS = 8          # ELL-entry strips of 128 per kernel block
_LANES = 128


def _onehot_kernel(cols_ref, vals_ref, xt_ref, out_ref, *, use_bf16):
  nq = xt_ref.shape[1]
  xt = xt_ref[...]
  # the MXU multiplies in bfloat16; a hi/lo split of x recovers ~16
  # mantissa bits (relerr ~3e-6 measured) at 2 passes — Precision.HIGHEST
  # (bf16x6) is 2.6× slower, single-pass bf16 (relerr ~2e-3) is the
  # use_bf16 fast mode
  xt_hi = xt.astype(jnp.bfloat16)
  if not use_bf16:
    xt_lo = (xt - xt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
  for s in range(_STRIPS):
    c = cols_ref[s:s + 1, :]                       # (1, 128) int32
    q = c // _LANES
    r = c - q * _LANES
    # oh[u, e] = (q[e] == u): broadcast (1,128) against a (nq,128) iota —
    # no transpose/reshape across the sublane dim (Mosaic-safe)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (nq, _LANES), 0)
          == q).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    g = jax.lax.dot_general(xt_hi, oh, dims,
                            preferred_element_type=jnp.float32)
    if not use_bf16:
      g = g + jax.lax.dot_general(xt_lo, oh, dims,
                                  preferred_element_type=jnp.float32)
    # g[v, e] = x[q[e]*128 + v]; select v == r[e] and reduce
    ohr = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0) == r
    y = jnp.sum(jnp.where(ohr, g, 0), axis=0, keepdims=True)  # (1, 128)
    out_ref[s:s + 1, :] = vals_ref[s:s + 1, :].astype(jnp.float32) * y


@functools.partial(jax.jit, static_argnames=("interpret", "use_bf16"))
def spmv(cols: jax.Array, vals: jax.Array, x: jax.Array,
         interpret: bool = False, use_bf16: bool = False) -> jax.Array:
  """ELL SpMV; cols/vals (n, k), x (m,) → y (n,).

  ``use_bf16`` reads ``x`` through the MXU in bfloat16 (~2× the dot
  throughput, ~1e-3 relative error on the gathered values).
  """
  n, k = cols.shape
  m = x.shape[0]
  if x.dtype == jnp.float64:
    raise NotImplementedError("one-hot SpMV kernel is f32/bf16 only")
  acc = jnp.float32

  # pad x up to a whole (nq, 128) grid and lay it out transposed so the
  # kernel's one-hot dot needs no in-kernel transpose
  nq = -(-m // _LANES)
  xp = jnp.pad(x, (0, nq * _LANES - m)).reshape(nq, _LANES)
  xt = xp.T.astype(jnp.float32)                            # (128, nq)

  # pad the ELL block to the kernel grid (pad cols point at x[0], vals 0)
  kp = -(-k // _LANES) * _LANES
  np_ = -(-n // _STRIPS) * _STRIPS
  if kp != k or np_ != n:
    cols = jnp.pad(cols, ((0, np_ - n), (0, kp - k)))
    vals = jnp.pad(vals, ((0, np_ - n), (0, kp - k)))

  out = pl.pallas_call(
      functools.partial(_onehot_kernel, use_bf16=use_bf16),
      grid=(np_ // _STRIPS, kp // _LANES),
      in_specs=[
          pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((_LANES, nq), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((np_, kp), acc),
      interpret=interpret,
  )(cols, vals, xt)
  return jnp.sum(out[:n], axis=1).astype(vals.dtype)
