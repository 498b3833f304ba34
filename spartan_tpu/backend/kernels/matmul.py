"""Blocked Pallas matmul (MXU).

XLA's own matmul is already near-peak on TPU (measured: XLA 188 TFLOP/s
vs this kernel 150 TFLOP/s at 4096² bf16 on v5e), so the framework
defaults to ``jnp.matmul`` for ``DotExpr`` (SURVEY.md §3.3); this kernel
exists for
(a) kernel-path parity with the reference's native sparse/dense kernels,
(b) a tuning playground for fused epilogues (bias/relu folded into the
K-loop tail), exercised by the bench harness.

Grid (M/bm, N/bn, K/bk) with a VMEM f32 accumulator across the K steps —
the canonical Pallas matmul schedule (pallas_guide: GridSpec + Reductions).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, y_ref, out_ref, acc_ref, *, epilogue, n_k):
  k = pl.program_id(2)

  @pl.when(k == 0)
  def _():
    acc_ref[:] = jnp.zeros_like(acc_ref)

  acc_ref[:] += jnp.dot(x_ref[:], y_ref[:],
                        preferred_element_type=jnp.float32)

  @pl.when(k == n_k - 1)
  def _():
    acc = acc_ref[:]
    if epilogue is not None:
      acc = epilogue(acc)
    out_ref[:] = acc.astype(out_ref.dtype)


def _fit_block(dim: int, pref: int, align: int) -> int:
  b = min(dim, pref)
  b -= b % align
  while b > align and dim % b != 0:
    b -= align
  return max(b, align) if dim % align == 0 else dim


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "bk", "epilogue",
                                    "interpret"))
def matmul(x: jax.Array, y: jax.Array, bm: int = 512, bn: int = 512,
           bk: int = 512, epilogue: Optional[Callable] = None,
           interpret: bool = False) -> jax.Array:
  """x (M,K) @ y (K,N) with f32 accumulation and an optional fused
  epilogue applied to the final f32 block."""
  m, k = x.shape
  k2, n = y.shape
  assert k == k2
  bm = _fit_block(m, bm, 8)
  bn = _fit_block(n, bn, 128)
  bk = _fit_block(k, bk, 128)
  n_k = pl.cdiv(k, bk)
  return pl.pallas_call(
      functools.partial(_kernel, epilogue=epilogue, n_k=n_k),
      grid=(pl.cdiv(m, bm), pl.cdiv(n, bn), n_k),
      in_specs=[
          pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
      scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
      interpret=interpret,
  )(x, y)
