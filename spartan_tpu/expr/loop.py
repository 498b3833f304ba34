"""On-device iteration over lazy expressions.

No reference analogue — the reference re-dispatched per-tile kernels every
iteration (its examples loop on the driver, as ours may).  On TPU the
whole loop belongs in ONE compiled program: :func:`fori_loop` takes a
*lazy body* (an Expr-builder over a symbolic carry), compiles body-as-jax
once, and runs ``lax.fori_loop`` on device — no per-step dispatch, no
per-step host sync.  This is the generic form of the examples'
hand-written ``fit_fused`` loops.

    w = sp.fori_loop(100, lambda w: w - 0.05 * sp.dot(X.T, sp.dot(X, w) - y),
                     sp.zeros((d,)))

The carry may be a single expr/array or a tuple of them.
"""

from __future__ import annotations

from typing import Any, Callable, List, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.core.array import SpartanArray
from spartan_tpu.expr.base import EmitCtx, Expr, Val, lazify


class SymbolicVal(Val):
  """A leaf standing for the loop carry: has shape/dtype but no value
  until the loop binds it.  Evaluating a DAG containing one outside
  :func:`fori_loop` is an error."""

  def __init__(self, aval: jax.ShapeDtypeStruct):
    Expr.__init__(self, )  # bypass Val.__init__ (no value)
    self.value = None
    self._sym_aval = aval

  _members = ()
  _params = ()

  def aval(self):
    return self._sym_aval

  def leaf_value(self):
    raise RuntimeError(
        "SymbolicVal has no value — it is the loop carry placeholder and "
        "only exists inside sp.fori_loop bodies")

  def signature(self, memo):
    hit = memo.get(self.expr_id)
    if hit is not None:
      return hit
    ordinal = memo.get("__leaf_counter__", 0)
    memo["__leaf_counter__"] = ordinal + 1
    sig = ("SymVal", ordinal, tuple(self._sym_aval.shape),
           str(self._sym_aval.dtype))
    memo[self.expr_id] = sig
    return sig


def fori_loop(n: int, body: Callable, init) -> Any:
  """Run ``carry = body(carry)`` ``n`` times in ONE compiled program.

  ``body`` receives lazy expr(s) (the symbolic carry) and returns lazy
  expr(s) of the same structure/shapes.  ``init`` (and the result) may be
  a single array/expr or a tuple.  Everything ``body`` closes over
  (other SpartanArrays/exprs) is evaluated once and baked in as loop
  constants.
  """
  from spartan_tpu.expr import optimize as opt_mod

  is_tuple = isinstance(init, (tuple, list))
  inits = list(init) if is_tuple else [init]
  init_arrs = [lazify(v).evaluate() for v in inits]
  init_vals = [a.data for a in init_arrs]

  syms = [SymbolicVal(jax.ShapeDtypeStruct(a.shape, a.dtype))
          for a in init_arrs]
  out = body(*(syms if is_tuple else [syms[0]]))
  outs = list(out) if isinstance(out, (tuple, list)) else [out]
  if len(outs) != len(syms):
    raise ValueError(f"body returned {len(outs)} values for "
                     f"{len(syms)} carries")
  out_exprs = [lazify(o) for o in outs]
  for o, a in zip(out_exprs, init_arrs):
    if tuple(o.shape) != tuple(a.shape):
      raise ValueError(f"carry shape changed in body: {a.shape} -> "
                       f"{o.shape} (loop carries must be shape-stable)")

  roots = [opt_mod.optimize(e) for e in out_exprs]

  # collect non-symbolic leaves across all carry outputs (loop constants)
  const_leaves: List[Val] = []
  seen = set()
  sym_ids = {s.expr_id for s in syms}

  def collect(e: Expr):
    if e.expr_id in seen:
      return
    seen.add(e.expr_id)
    if isinstance(e, Val):
      if e.expr_id not in sym_ids:
        const_leaves.append(e)
      return
    for c in e.children():
      collect(c)

  for r in roots:
    collect(r)
  const_vals = [l.leaf_value() for l in const_leaves]
  const_pos = {l.expr_id: i for i, l in enumerate(const_leaves)}
  sym_pos = {s.expr_id: i for i, s in enumerate(syms)}
  ctx = EmitCtx(abstract=False)

  def step(carries, consts):
    env = {}

    def emit(e: Expr):
      if e.expr_id in env:
        return env[e.expr_id]
      if e.expr_id in sym_pos:
        v = carries[sym_pos[e.expr_id]]
      elif isinstance(e, Val):
        v = consts[const_pos[e.expr_id]]
      else:
        v = e._emit(ctx, [emit(c) for c in e.children()])
      env[e.expr_id] = v
      return v

    return tuple(emit(r) for r in roots)

  @jax.jit
  def run(init_vals, const_vals, k):
    def body_fn(_, carries):
      return step(carries, const_vals)
    return jax.lax.fori_loop(0, k, body_fn, tuple(init_vals))

  final = run(tuple(init_vals), tuple(const_vals), jnp.asarray(n))
  results = [SpartanArray(v, a.tiling if tuple(v.shape) == tuple(a.shape)
                          else None)
             for v, a in zip(final, init_arrs)]
  return tuple(results) if is_tuple else results[0]
