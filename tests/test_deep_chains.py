"""Very deep op chains (reference workloads build thousands-long lazy
chains, e.g. iterative solvers without explicit force()): the DAG
walkers must not hit Python recursion limits — including CPython 3.12's
*C*-frame limit, which ``sys.setrecursionlimit`` cannot raise — and
evaluation must stay near-linear via chunked segmentation
(``chunk_eval_threshold`` / ``chunk_eval_size``)."""

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.backend import evaluator


def test_deep_add_chain_evaluates(rng, cluster):
  """1500 chained adds: far past the default recursion limit AND the
  chunking threshold; value must be exact and compile count tiny
  (structurally identical segments share one compiled runner)."""
  x = sp.from_numpy(np.full((8, 8), 1.0))
  e = x
  n = 1500
  for _ in range(n):
    e = e + 1.0
  c0 = evaluator.stats["compiles"]
  v = sp.sum(e).glom()
  assert float(v) == 8 * 8 * (n + 1.0)
  # one compile for the repeated segment + one for the tail/reduce region
  assert evaluator.stats["compiles"] - c0 <= 4


def test_deep_mixed_chain(rng, cluster):
  """Mixed-op deep chain keeps numeric parity with NumPy."""
  a = rng.standard_normal((16,))
  x = sp.from_numpy(a)
  e = x
  ref = a
  for i in range(900):
    if i % 3 == 0:
      e = e * 1.001
      ref = ref * 1.001
    elif i % 3 == 1:
      e = e + 0.5
      ref = ref + 0.5
    else:
      e = e - 0.25
      ref = ref - 0.25
  np.testing.assert_allclose(e.glom(), ref, rtol=1e-10)


def test_deep_local_kernel_traversals(cluster):
  """LocalExpr trees thousands deep (what fusion builds): signature,
  pretty, max_input and evaluate must all be iterative."""
  from spartan_tpu.expr import local as L
  node = L.LocalInput(0)
  for _ in range(5000):
    node = L.FnCallExpr(lambda v: v + 1.0, [node], pretty_name="inc")
  assert node.max_input() == 0
  assert isinstance(node.signature(), tuple)
  assert node.pretty().startswith("inc(")
  assert float(node.evaluate([0.0])) == 5000.0


def test_deep_chain_chunking_preserves_grad_error_clarity(rng, cluster):
  """After chunked evaluation materializes interiors, as_function on the
  same DAG must either work or raise the documented collapse error —
  never silently detach gradients."""
  from spartan_tpu import autodiff
  x = sp.from_numpy(rng.standard_normal((8,)))
  e = x
  for _ in range(1000):
    e = e + 0.001
  loss = sp.sum(e * e)
  _ = loss.glom()  # triggers chunked eval, caches interiors
  try:
    fn, args = autodiff.as_function(loss, [x])
  except ValueError as err:
    assert "materialized and collapsed" in str(err)


def test_grad_through_deep_unevaluated_chain(rng, cluster):
  """autodiff must size the recursion budget itself (optimize() runs
  outside evaluate()): 1000-op chain, analytic gradient parity."""
  import jax
  from spartan_tpu import autodiff
  x = sp.from_numpy(rng.standard_normal((8,)))
  e = x
  for _ in range(1000):
    e = e + 0.001
  loss = sp.sum(e * e)
  fn, args = autodiff.as_function(loss, [x])
  g = np.asarray(jax.grad(fn)(*args))
  np.testing.assert_allclose(g, 2 * (x.glom() + 1.0), rtol=1e-10)


def test_deep_chain_to_dot(cluster):
  """The DAG visualizer must handle deep chains (iterative walk)."""
  from spartan_tpu.expr import visualize
  e = sp.from_numpy(np.ones(4))
  for _ in range(1500):
    e = e + 1.0
  out = visualize.to_dot(e)
  assert out.startswith("digraph") and out.count("->") >= 1500


def test_deep_chain_smart_tile_plan(cluster):
  """Standalone smart_tile/plan must size its own recursion budget."""
  from spartan_tpu.expr import smart_tiling as st
  e = sp.from_numpy(np.ones((8, 8)))
  for _ in range(1500):
    e = e + 1.0
  p = st.plan(sp.sum(e))
  assert np.isfinite(p.cost)


def test_deep_chain_under_remat(rng, cluster):
  """remat over a deep sub-DAG: construction (leaf collection), value,
  and gradient all work."""
  import jax
  from spartan_tpu import autodiff
  x = sp.from_numpy(np.ones(4))
  e = x
  for _ in range(1200):
    e = e * 1.001
  loss = sp.sum(sp.remat(e) ** 2)
  fn, args = autodiff.as_function(loss, [x])
  g = np.asarray(jax.grad(fn)(*args))
  want = 2 * (1.001 ** 2400)
  np.testing.assert_allclose(g, want, rtol=1e-9)
