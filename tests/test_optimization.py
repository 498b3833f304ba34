"""Optimizer pass tests (reference: test_optimization.py — run the same
expr with each pass on/off and compare; SURVEY.md §4).  Also checks that
fusion really rewrites the DAG and that the compiled-region cache hits on
structurally-identical iterations."""

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.backend import evaluator
from spartan_tpu.config import FLAGS
from spartan_tpu.expr.map import MapExpr
from spartan_tpu.expr.optimize import (AutoTiling, MapMapFusion,
                                       ReduceMapFusion, optimize)
from spartan_tpu.expr.reduce import ReduceExpr
from spartan_tpu.util import Assert


@pytest.fixture
def toggle():
  saved = FLAGS.snapshot()
  yield FLAGS
  for k, v in saved.items():
    FLAGS.lookup(k).set(v)


def _expr(a, b):
  return (a + b) * 2.0 - b / 4.0


def test_results_invariant_under_passes(rng, toggle):
  # bit-exactness across pass permutations holds per-LAYOUT: pin the
  # heuristic tiler so every permutation computes over identical layouts
  # (the cost-model pass may lay out differently depending on which fusion
  # passes ran, which permutes float summation order at ~1e-15 — layout
  # choice is allowed to do that; fusion passes are not)
  toggle.opt_smart_tiling = False
  a_np = rng.standard_normal((16, 16))
  b_np = rng.standard_normal((16, 16))
  want = ((_expr(a_np, b_np)).sum(axis=0))
  results = {}
  for opt_on in (True, False):
    for fuse in (True, False):
      toggle.optimization = opt_on
      toggle.opt_fusion = fuse
      a, b = sp.from_numpy(a_np), sp.from_numpy(b_np)
      got = _expr(a, b).sum(axis=0).glom()
      np.testing.assert_allclose(got, want, rtol=1e-13)
      results[(opt_on, fuse)] = got
  base = results[(True, True)]
  for v in results.values():
    np.testing.assert_array_equal(v, base)


def test_mapmap_fusion_rewrites(rng):
  a = sp.from_numpy(rng.standard_normal((8, 8)))
  b = sp.from_numpy(rng.standard_normal((8, 8)))
  chain = ((a + b) * 2.0) - (a / 3.0)
  fused = MapMapFusion().run(chain)
  # the whole chain collapses into ONE MapExpr over the leaves
  # (a, b, and the two scalar constants — with `a` deduplicated, not 5)
  assert isinstance(fused, MapExpr)
  assert len(fused.inputs) == 4
  assert all(not isinstance(c, MapExpr) for c in fused.inputs)
  # and its kernel pretty-prints as a nested call tree
  assert "add" in fused.pretty_op()


def test_reduce_map_fusion_rewrites(rng):
  a = sp.from_numpy(rng.standard_normal((8, 8)))
  expr = (a * 2.0).sum()
  fused = ReduceMapFusion().run(MapMapFusion().run(expr))
  assert isinstance(fused, ReduceExpr)
  assert fused.local_op is not None  # the map kernel was spliced in


def test_jit_cache_hits_across_iterations(rng):
  """Structurally identical steps (fresh lambdas each iteration) must reuse
  the compiled region — the reference's eval-cache at compile granularity."""
  evaluator.clear_cache()
  start = dict(evaluator.stats)
  w = sp.from_numpy(rng.standard_normal((8,)))
  x_np = rng.standard_normal((32, 8))
  y_np = rng.standard_normal((32,))
  for _ in range(4):
    x, y = sp.from_numpy(x_np), sp.from_numpy(y_np)
    grad = sp.dot(x.T, sp.dot(x, w) - y)
    w = sp.from_numpy(grad.glom() * 0.01)  # materialize to cut regions
  compiles = evaluator.stats["compiles"] - start["compiles"]
  hits = (evaluator.stats["cache_hits"] - start["cache_hits"]
          + evaluator.stats["fast_hits"] - start["fast_hits"])
  assert compiles == 1 and hits == 3


def test_collapse_cached(rng):
  a = sp.from_numpy(rng.standard_normal((8, 8)))
  mid = (a * 2.0)
  mid.evaluate()  # materialize
  top = mid + 1.0
  opt = optimize(top)
  # the cached mid subtree must have been collapsed to a leaf
  from spartan_tpu.expr.base import Val
  assert any(isinstance(c, Val) for c in opt.inputs)


def test_auto_tiling_assigns_hints(rng):
  a = sp.from_numpy(rng.standard_normal((16, 16)))
  expr = (a + 1.0).sum(axis=0)
  opt = optimize(expr)
  assert opt.tiling_hint is not None
  # reduced-away dim drops its mesh axes; output is 1-D sharded or replicated
  assert len(tuple(opt.tiling_hint.spec)) <= 1


def test_largest_input_chooses_tiling(rng):
  """Reference map rule: output tiling follows the dominant input."""
  big = sp.from_numpy(rng.standard_normal((16, 16)))
  small = sp.from_numpy(rng.standard_normal((16,)))
  expr = big + small
  opt = optimize(expr)
  big_spec = tuple(big.value.tiling.spec) if hasattr(big, "value") else None
  assert tuple(opt.tiling_hint.spec) == big_spec


def test_smart_tiling_known_dags(rng):
  """The inheritance-heuristic tiler picks the expected shardings for
  canonical DAGs (reference tiling tests; SURVEY.md §4).  Scoped to the
  heuristic branch — the production cost-model pass has its own canonical
  expectations below."""
  from spartan_tpu.config import FLAGS
  from spartan_tpu.core.mesh import get_mesh
  mesh = get_mesh()
  FLAGS.opt_smart_tiling = False
  try:
    a = sp.from_numpy(rng.standard_normal((16, 16)))
    b = sp.from_numpy(rng.standard_normal((16, 16)))
    # dot output: 2-D mesh-sharded (one axis per dim)
    d = optimize(sp.dot(a, b))
    entries = tuple(d.tiling_hint.spec)
    axes_used = {e for e in entries if e is not None}
    assert len(axes_used) == 2
    # full reduction: replicated scalar
    r = optimize(sp.sum(a))
    assert tuple(r.tiling_hint.spec) == ()
    # axis-reduction keeps the surviving dim's axes
    r1 = optimize(sp.sum(a, axis=1))
    surviving = tuple(r1.tiling_hint.spec)
    assert len(surviving) <= 1
    # transpose swaps the spec entries
    t = optimize(a.T)
    ta = tuple(optimize(sp.lazify(a.value) + 0.0).tiling_hint.spec)
    assert tuple(t.tiling_hint.spec) == tuple(reversed(ta))
  finally:
    FLAGS.opt_smart_tiling = True


def test_cost_model_tiling_canonical(rng):
  """The production cost-model pass (default path, plain optimize())
  picks canonical layouts: a big dot partitions its output over the full
  mesh and row-shards the left operand IN PLACE; a gradient-shaped
  X^T(Xw) keeps X sharded and the weight replicated."""
  from spartan_tpu.core.mesh import get_mesh
  from spartan_tpu.expr.smart_tiling import _spec_util
  mesh = get_mesh()
  n_dev = int(mesh.devices.size)

  A = sp.from_numpy(rng.standard_normal((256, 256)))
  B = sp.from_numpy(rng.standard_normal((256, 256)))
  d = optimize(sp.dot(A, B))
  assert _spec_util(d.tiling_hint.spec, 2, mesh) == n_dev
  # the pass re-placed the row operand in place (placement persists)
  assert _spec_util(A.value.tiling.spec, 2, mesh) > 1

  X = sp.from_numpy(rng.standard_normal((64 * n_dev, 32)))
  w = sp.from_numpy(rng.standard_normal(32))
  g = optimize(sp.dot(X.T, sp.dot(X, w)))
  # gradient output: small vector — replicated (every device needs w)
  assert _spec_util(g.tiling_hint.spec, 1, mesh) == 1
  # X stays row-sharded: the data-parallel layout
  assert _spec_util(X.value.tiling.spec, 2, mesh) > 1


def test_optimization_pass_counts(rng):
  """Fusion shrinks the DAG (node-count assertion, not just semantics)."""
  a = sp.from_numpy(rng.standard_normal((8, 8)))
  chain = a
  for i in range(6):
    chain = chain * 2.0 + 1.0
  def count(e):
    n = [0]
    e.visit(lambda _: n.__setitem__(0, n[0] + 1))
    return n[0]
  before = count(chain)
  fused = MapMapFusion().run(chain)
  after = count(fused)
  assert after < before
  # the 12 interior map nodes collapsed into ONE; only leaves remain below
  assert isinstance(fused, MapExpr)
  assert all(not isinstance(c, MapExpr) for c in fused.inputs)
