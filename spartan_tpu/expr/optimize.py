"""DAG optimizer.

TPU-native rebuild of the reference's optimizer (reference:
``spartan/expr/optimize.py`` — flag-gated rewrite passes: ``MapMapFusion``,
``ReduceMapFusion``, ``CollapsedCachedExprs``, ``ParakeetGeneration``, and
the smart/auto-tiling cost-model search — the ATC'15 paper's core
contribution; SURVEY.md §2.1, §3.2).

Division of labor in the rebuild: XLA already fuses everything inside a
jitted region, so the passes here optimize what XLA *cannot* see:

* ``CollapsedCachedExprs`` — cut the DAG at already-materialized results
  (the region boundary = the reference's eval-cache hits);
* ``MapMapFusion`` / ``ReduceMapFusion`` — collapse map chains into one
  LocalExpr kernel: fewer nodes → smaller traces, a stable structural
  signature for the jit cache, and the fused kernel is what the Pallas
  backend lowers directly;
* ``AutoTiling`` ("smart tiling") — choose PartitionSpecs for region
  *outputs* to minimize resharding collectives between regions; intra-
  region propagation is XLA's job, the boundary layout decision is ours.
  The pass propagates specs bottom-up with a bytes-moved cost model:
  elementwise ops inherit the dominant input's tiling (the reference's
  "largest input chooses"), reductions drop the reduced axes, contractions
  get mesh-2-D outputs.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
from jax.sharding import PartitionSpec

from spartan_tpu.config import FLAGS
from spartan_tpu.core.mesh import get_mesh
from spartan_tpu.core.tiling import Tiling, auto_tiling, choose_spec
from spartan_tpu.expr import local as local_mod
from spartan_tpu.expr.base import (Expr, ListExpr, NotShapeable, Val,
                                  ensure_recursion_budget)
from spartan_tpu.expr.dot import DotExpr, OuterExpr, TensorDotExpr
from spartan_tpu.expr.map import MapExpr, MapWithLocationExpr
from spartan_tpu.expr.ndarray import CreationExpr
from spartan_tpu.expr.reduce import ReduceExpr
from spartan_tpu.expr.reshape import RavelExpr, ReshapeExpr, TransposeExpr
from spartan_tpu.expr.slice import SliceExpr


# ---------------------------------------------------------------------------
# Generic bottom-up rewriter
# ---------------------------------------------------------------------------

def _rebuild(expr: Expr, child_map: Dict[int, Expr]) -> Expr:
  """Copy ``expr`` with rewritten children (no-op when nothing changed)."""
  changed = False
  updates = {}
  for name in expr._members:
    v = getattr(expr, name)
    if isinstance(v, Expr):
      nv = child_map.get(v.expr_id, v)
      changed |= nv is not v
      updates[name] = nv
    elif isinstance(v, (list, tuple)):
      nv = [child_map.get(c.expr_id, c) if isinstance(c, Expr) else c
            for c in v]
      changed |= any(a is not b for a, b in zip(v, nv))
      updates[name] = type(v)(nv) if isinstance(v, tuple) else nv
  if not changed:
    return expr
  return expr.replace(**updates)


def rewrite_bottom_up(root: Expr, fn: Callable[[Expr], Expr]) -> Expr:
  """Apply ``fn`` to every node after its children have been rewritten."""
  memo: Dict[int, Expr] = {}

  def go(e: Expr) -> Expr:
    hit = memo.get(e.expr_id)
    if hit is not None:
      return hit
    for c in e.children():
      go(c)
    rebuilt = _rebuild(e, {c.expr_id: memo[c.expr_id] for c in e.children()})
    out = fn(rebuilt)
    memo[e.expr_id] = out
    return out

  return go(root)


def count_refs(root: Expr) -> Dict[int, int]:
  refs: Dict[int, int] = {}
  seen = set()

  def go(e: Expr):
    if e.expr_id in seen:
      return
    seen.add(e.expr_id)
    for c in e.children():
      refs[c.expr_id] = refs.get(c.expr_id, 0) + 1
      go(c)

  go(root)
  return refs


# ---------------------------------------------------------------------------
# Passes
# ---------------------------------------------------------------------------

class CollapsedCachedExprs:
  """Replace already-evaluated sub-DAGs with leaf values — region cuts."""

  def run(self, root: Expr) -> Expr:
    if root._cache is not None:
      return Val(root._cache)

    def fn(e: Expr) -> Expr:
      if e._cache is not None and not isinstance(e, Val):
        return Val(e._cache)
      return e

    # collapse must happen *before* children are recursed into, so walk
    # top-down via the bottom-up rewriter on a pre-collapsed view:
    memo: Dict[int, Expr] = {}

    def go(e: Expr) -> Expr:
      hit = memo.get(e.expr_id)
      if hit is not None:
        return hit
      if e._cache is not None and not isinstance(e, Val):
        out = Val(e._cache)
      else:
        for c in e.children():
          go(c)
        out = _rebuild(e, {c.expr_id: memo[c.expr_id]
                           for c in e.children()})
      memo[e.expr_id] = out
      return out

    return go(root)


class MapMapFusion:
  """Fuse chains of MapExprs into one LocalExpr kernel."""

  def run(self, root: Expr) -> Expr:
    refs = count_refs(root)

    cap = FLAGS.max_fused_kernel_ops

    def fusable(c: Expr, parent: "MapExpr") -> bool:
      return (isinstance(c, MapExpr) and refs.get(c.expr_id, 1) == 1
              and c.op.approx_size + parent.op.approx_size <= cap)

    def fuse(e: Expr) -> Expr:
      if not isinstance(e, MapExpr):
        return e
      if not any(fusable(c, e) for c in e.inputs):
        return e
      new_inputs: List[Expr] = []
      slot_of: Dict[int, int] = {}

      def slot(child: Expr) -> int:
        s = slot_of.get(child.expr_id)
        if s is None:
          s = len(new_inputs)
          slot_of[child.expr_id] = s
          new_inputs.append(child)
        return s

      mapping: Dict[int, local_mod.LocalExpr] = {}
      for i, child in enumerate(e.inputs):
        if fusable(child, e):
          inner_map = {j: local_mod.LocalInput(slot(gc))
                       for j, gc in enumerate(child.inputs)}
          mapping[i] = local_mod.substitute_inputs(child.op, inner_map)
        else:
          mapping[i] = local_mod.LocalInput(slot(child))
      fused = local_mod.substitute_inputs(e.op, mapping)
      return MapExpr(inputs=new_inputs, op=fused)

    out = root
    # iterate to fixpoint over chains (a+b+c+d)
    for _ in range(16):
      new = rewrite_bottom_up(out, fuse)
      if new is out:
        break
      out = new
      refs = count_refs(out)
    return out


class ReduceMapFusion:
  """Splice a feeding MapExpr's kernel into the reduction."""

  def run(self, root: Expr) -> Expr:
    refs = count_refs(root)

    def fuse(e: Expr) -> Expr:
      if (isinstance(e, ReduceExpr) and e.local_op is None
          and len(e.inputs) == 1 and isinstance(e.inputs[0], MapExpr)
          and refs.get(e.inputs[0].expr_id, 1) == 1):
        m = e.inputs[0]
        return e.replace(inputs=list(m.inputs), local_op=m.op)
      return e

    return rewrite_bottom_up(root, fuse)


class ConstFoldCreations:
  """Replace broadcast-neutral fill-creations feeding fused kernels with
  scalar leaves: ``ones(shape) + b`` → ``1.0 + b`` when ``b`` already
  carries the shape.  Shrinks traces and unlocks the Pallas
  fused-reduce path (scalars ride SMEM; a full ones-array can't)."""

  def run(self, root: Expr) -> Expr:
    import numpy as np_mod

    def fold(e: Expr) -> Expr:
      if not isinstance(e, (MapExpr, ReduceExpr)):
        return e
      if isinstance(e, ReduceExpr) and e.local_op is None:
        return e
      try:
        shapes = [c.shape for c in e.inputs]
      except NotShapeable:
        return e
      new_inputs = list(e.inputs)
      changed = False
      for i, c in enumerate(e.inputs):
        if (isinstance(c, CreationExpr) and c.op == "full"
            and c.tile_hint is None and len(c.out_shape) > 0):
          others = shapes[:i] + shapes[i + 1:]
          try:
            if (others and np_mod.broadcast_shapes(*others) ==
                np_mod.broadcast_shapes(*shapes)):
              # 0-d ndarray (not a python scalar): the fold must keep
              # the creation's STRONG dtype or promotion changes
              new_inputs[i] = Val(np_mod.asarray(c.params["fill"],
                                                 dtype=c.out_dtype))
              changed = True
          except ValueError:
            continue
      if changed:
        return e.replace(inputs=new_inputs)
      return e

    return rewrite_bottom_up(root, fold)


class ParakeetGeneration:
  """Reference-parity no-op: fused kernels always compile through XLA
  (the role Parakeet played for the reference's per-tile Python kernels)."""

  def run(self, root: Expr) -> Expr:
    return root


class AutoTiling:
  """Smart tiling: pick region-output PartitionSpecs minimizing resharding.

  Bottom-up spec propagation with a bytes-moved cost model; the chosen spec
  lands in ``expr.tiling_hint`` and becomes the jit ``out_shardings``.
  """

  def run(self, root: Expr) -> Expr:
    mesh = get_mesh()
    specs: Dict[int, Optional[PartitionSpec]] = {}

    def spec_of(e: Expr) -> Optional[PartitionSpec]:
      hit = specs.get(e.expr_id, "miss")
      if hit != "miss":
        return hit
      s = self._infer(e, mesh, spec_of)
      specs[e.expr_id] = s
      return s

    def annotate(e: Expr):
      s = spec_of(e)
      if s is not None:
        e.tiling_hint = Tiling(mesh, s)

    root.visit(annotate)
    return root

  @staticmethod
  def _fits(spec: Optional[PartitionSpec], shape, mesh) -> bool:
    """A spec fits when every sharded dim is evenly divisible (and the
    array is non-empty — XLA replicates empties unconditionally)."""
    if spec is None:
      return False
    if any(s == 0 for s in shape):
      return tuple(spec) == ()
    entries = tuple(spec)
    if len(entries) > len(shape):
      return False
    for dim, entry in zip(shape, entries):
      if entry is None:
        continue
      axes = entry if isinstance(entry, (tuple, list)) else (entry,)
      n = 1
      for a in axes:
        n *= mesh.shape[a]
      if n == 0 or dim % n != 0:
        return False
    return True

  def _fit_or_choose(self, spec, shape, mesh) -> PartitionSpec:
    if self._fits(spec, shape, mesh):
      return spec
    return choose_spec(shape, mesh)

  def _infer(self, e: Expr, mesh, spec_of) -> Optional[PartitionSpec]:
    from spartan_tpu.expr.base import DictExpr
    if isinstance(e, (ListExpr, DictExpr)):
      return None  # containers carry no spec; their elements are annotated
    try:
      shape = e.shape
    except NotShapeable:
      return None
    if isinstance(e, Val):
      v = e.value
      from spartan_tpu.core.array import SpartanArray
      if isinstance(v, SpartanArray):
        return v.tiling.spec
      return PartitionSpec()
    if isinstance(e, CreationExpr):
      return auto_tiling(shape, e.tile_hint, mesh).spec
    if isinstance(e, (MapExpr, MapWithLocationExpr)):
      # largest input chooses the output tiling (reference map rule)
      best, best_size = None, -1
      for c in e.inputs:
        try:
          if c.size > best_size and len(c.shape) == len(shape):
            cand = spec_of(c)
            if cand is not None:
              best, best_size = cand, c.size
        except NotShapeable:
          continue
      if best is not None and self._fits(best, shape, mesh):
        return best
      return choose_spec(shape, mesh)
    if isinstance(e, ReduceExpr):
      if e.axis is None:
        return PartitionSpec()
      # after ReduceMapFusion the inputs are the fused map's inputs; the
      # dominant (max rank, then max size) input stands in for the
      # pre-reduction value when deriving the output spec
      rep = None
      for c in e.inputs:
        try:
          if rep is None or (c.ndim, c.size) > (rep.ndim, rep.size):
            rep = c
        except NotShapeable:
          continue
      if rep is None or rep.ndim == 0:
        return choose_spec(shape, mesh)
      child_spec = spec_of(rep)
      cshape = rep.shape
      axes = e.axis if isinstance(e.axis, tuple) else (e.axis,)
      if child_spec is None or len(cshape) != len(shape) + (
          0 if e.keepdims else len(axes)):
        return choose_spec(shape, mesh)
      entries = list(tuple(child_spec)) + [None] * (
          len(cshape) - len(tuple(child_spec)))
      reduced = {a % len(cshape) for a in axes}
      if e.keepdims:
        for a in reduced:
          entries[a] = None
      else:
        entries = [s for i, s in enumerate(entries) if i not in reduced]
      while entries and entries[-1] is None:
        entries.pop()
      return self._fit_or_choose(PartitionSpec(*entries), shape, mesh)
    if isinstance(e, (DotExpr, TensorDotExpr)):
      return choose_spec(shape, mesh)
    if isinstance(e, OuterExpr):
      return choose_spec(shape, mesh)
    if isinstance(e, TransposeExpr):
      child_spec = spec_of(e.inputs[0])
      if child_spec is None:
        return choose_spec(shape, mesh)
      try:
        cnd = len(e.inputs[0].shape)
      except NotShapeable:
        return choose_spec(shape, mesh)
      axes = e.axes if e.axes is not None else tuple(reversed(range(cnd)))
      entries = list(tuple(child_spec)) + [None] * (cnd - len(tuple(child_spec)))
      out = [entries[a] for a in axes]
      while out and out[-1] is None:
        out.pop()
      return self._fit_or_choose(PartitionSpec(*out), shape, mesh)
    if isinstance(e, (ReshapeExpr, RavelExpr)):
      return choose_spec(shape, mesh)
    if isinstance(e, SliceExpr):
      # slices usually shrink: keep it simple, re-derive
      return choose_spec(shape, mesh)
    # default: shard the big dims
    if int(np.prod(shape) if shape else 1) <= 1 << 12:
      return PartitionSpec()
    return choose_spec(shape, mesh)


class SmartTiling(AutoTiling):
  """Cost-model tiling search as the *production* pass (the reference's
  headline "smart tiling" contribution — SURVEY.md §2.1 optimizer row —
  previously opt-in API only).

  On a multi-device mesh, run the :mod:`smart_tiling` dynamic program
  over the (collapsed, fused) region, reshard the DAG's SpartanArray
  leaves to the argmin layouts, and take the planned root spec as the
  region's ``out_sharding``.  The inheritance heuristic (:class:`AutoTiling`)
  still fills interior hints and is the fallback for: 1-device meshes,
  DAGs above ``--smart_tiling_max_nodes`` (planning is O(nodes·cands²) —
  bounded so host-side step overhead stays flat), container roots'
  interior nodes, and planner failures.

  Plans are memoized by (structural signature, mesh): the evaluator's
  fast lane already skips the optimizer for repeated structures, and this
  cache covers the remaining repeat paths (interior-cached DAGs, chunked
  eval).  Note resharding a leaf changes the DAG's signature (leaf specs
  are part of it), so the first two evaluations of a structure may each
  plan once — the second plan sees the already-applied layouts, charges
  them zero placement cost, and fixpoints.
  """

  from collections import OrderedDict as _OD
  _plan_cache: "Dict[Tuple, Any]" = _OD()

  def run(self, root: Expr) -> Expr:
    from spartan_tpu.core.array import SpartanArray
    from spartan_tpu.expr import smart_tiling as st_mod
    from spartan_tpu.expr.base import DictExpr

    mesh = get_mesh()
    if mesh.devices.size <= 1:
      return super().run(root)
    size = [0]
    root.visit(lambda _: size.__setitem__(0, size[0] + 1))
    if size[0] > FLAGS.smart_tiling_max_nodes:
      return super().run(root)

    elements = (list(root.vals) if isinstance(root, (ListExpr, DictExpr))
                else [root])
    # ordered leaf list: the apply side of a cached plan must bind specs
    # to the same leaves the planning side saw (pre-order, dedup by id —
    # the evaluator's _collect_leaves order)
    leaves: List[Val] = []
    seen = set()

    def _collect(e: Expr):
      if e.expr_id not in seen and isinstance(e, Val):
        leaves.append(e)
      seen.add(e.expr_id)

    root.visit(_collect)

    mesh_key = (tuple(mesh.axis_names), tuple(mesh.devices.shape),
                tuple(int(d.id) for d in mesh.devices.flat))
    try:
      sig = (root.signature({}), mesh_key)
    except Exception:
      return super().run(root)

    hit = SmartTiling._plan_cache.get(sig)
    if hit is None:
      leaf_specs: Dict[int, PartitionSpec] = {}
      root_specs: List[Optional[PartitionSpec]] = []
      try:
        for el in elements:
          p = st_mod.plan(el, mesh)
          root_specs.append(p.root_spec)
          for eid, spec in p.leaf_specs.items():
            # shared leaves across elements: first element's demand wins
            leaf_specs.setdefault(eid, spec)
      except Exception:
        return super().run(root)
      ordered = [leaf_specs.get(l.expr_id) for l in leaves]
      hit = (ordered, root_specs)
      SmartTiling._plan_cache[sig] = hit
      while len(SmartTiling._plan_cache) > 512:
        SmartTiling._plan_cache.pop(next(iter(SmartTiling._plan_cache)))
    ordered_specs, root_specs = hit

    from spartan_tpu.core.tiling import Tiling as _Tiling
    for leaf, spec in zip(leaves, ordered_specs):
      if spec is None:
        continue
      v = leaf.value
      if (isinstance(v, SpartanArray)
          and st_mod._norm(spec, v.ndim) != st_mod._norm(v.tiling.spec,
                                                         v.ndim)):
        v.reshard_(_Tiling(mesh, spec))  # in place: placement persists
        # across step boundaries for every holder of the array

    out = super().run(root)  # heuristic interior + provisional root hints
    for el, rspec in zip(elements, root_specs):
      try:
        if rspec is not None and self._fits(rspec, el.shape, mesh):
          el.tiling_hint = _Tiling(mesh, rspec)
      except NotShapeable:
        pass
    return out


def _tiling_pass() -> AutoTiling:
  return SmartTiling() if FLAGS.opt_smart_tiling else AutoTiling()


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def optimize(expr: Expr) -> Expr:
  """Run the flag-gated pass pipeline (reference ``optimize``)."""
  ensure_recursion_budget(expr)
  if not FLAGS.optimization:
    # CollapseCached is cache SEMANTICS, not an optimization: interior
    # nodes holding results (checkpoint restores, chunked-eval cuts,
    # eager boundaries) must still collapse to leaves or the runner
    # would recompute them (and checkpoints would silently re-execute)
    if FLAGS.opt_collapse_cached:
      expr = CollapsedCachedExprs().run(expr)
    if FLAGS.opt_auto_tiling:
      expr = _tiling_pass().run(expr)
    return expr
  if FLAGS.opt_collapse_cached:
    expr = CollapsedCachedExprs().run(expr)
  if FLAGS.opt_fusion:
    expr = MapMapFusion().run(expr)
  if FLAGS.opt_reduce_fusion:
    expr = ReduceMapFusion().run(expr)
  if FLAGS.opt_const_fold:
    expr = ConstFoldCreations().run(expr)
  if FLAGS.opt_parakeet_gen:
    expr = ParakeetGeneration().run(expr)
  if FLAGS.opt_auto_tiling:
    expr = _tiling_pass().run(expr)
  return expr
