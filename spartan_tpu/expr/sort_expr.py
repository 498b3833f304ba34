"""Distributed sort / percentile / median.

TPU-native rebuild of the reference's sort module (reference:
``spartan/expr/sort.py`` — sample-based distributed sort via shuffle;
SURVEY.md §2.1).  The sample+shuffle partition becomes one traced
``jnp.sort``: XLA lowers the sort across shards (bitonic-style on device),
the all-to-all re-tiling the reference emulated over RPC rides ICI.
"""

from __future__ import annotations

from typing import Any, List, Optional

import jax.numpy as jnp
from spartan_tpu.expr.base import EmitCtx, Expr, lazify


class SortExpr(Expr):
  _members = ("inputs",)
  _params = ("axis", "kind")

  def __init__(self, src, axis: Optional[int] = -1, kind: str = "sort"):
    super().__init__(inputs=[lazify(src)], axis=axis, kind=kind)

  def _emit(self, ctx: EmitCtx, deps: List[Any]):
    x = deps[0]
    axis = self.axis
    if axis is None:
      x = jnp.ravel(x)
      axis = 0
    if self.kind == "sort":
      return jnp.sort(x, axis=axis)
    if self.kind == "argsort":
      return jnp.argsort(x, axis=axis)
    raise ValueError(self.kind)


class PercentileExpr(Expr):
  _members = ("inputs",)
  _params = ("q", "axis")

  def __init__(self, src, q, axis: Optional[int] = None):
    super().__init__(inputs=[lazify(src)], q=q, axis=axis)

  def _emit(self, ctx: EmitCtx, deps: List[Any]):
    return jnp.percentile(deps[0].astype(jnp.float64 if
                                         deps[0].dtype.kind in "iu" else
                                         deps[0].dtype),
                          self.q, axis=self.axis)
