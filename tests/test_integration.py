"""Scenario tests: the subsystems working together (checkpoint/resume
mid-training, smart tiling + examples, profiling around a real loop) —
the reference's failure-recovery story (SURVEY.md §5: lineage/checkpoint
restart) exercised end-to-end."""

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu import profiling
from spartan_tpu.expr import checkpoint, load, save


def _train(X, y, w0, steps, alpha=0.05):
  w = sp.from_numpy(np.asarray(w0))
  n = X.shape[0]
  for _ in range(steps):
    grad = sp.dot(sp.lazify(X).T, sp.dot(X, w) - y) * (2.0 / n)
    w = sp.Val((w - alpha * grad).evaluate())
  return np.asarray(w.evaluate().glom())


def test_checkpoint_resume_training(rng, tmp_path):
  """Train 20 steps straight vs 10 steps + checkpoint + 'restart' + 10
  more from the restored state: identical weights."""
  X_np = rng.standard_normal((256, 8))
  w_true = rng.standard_normal(8)
  y_np = X_np @ w_true
  X, y = sp.from_numpy(X_np), sp.from_numpy(y_np)

  w_straight = _train(X, y, np.zeros(8), 20)

  w_half = _train(X, y, np.zeros(8), 10)
  ck = str(tmp_path / "w_ck")
  save(sp.from_numpy(w_half), ck)
  # --- simulated process restart: nothing survives but the disk ---
  restored = load(ck)
  w_resumed = _train(sp.from_numpy(X_np), sp.from_numpy(y_np),
                     restored.glom(), 10)
  np.testing.assert_allclose(w_resumed, w_straight, atol=1e-12)


def test_checkpoint_expr_cuts_lineage(rng, tmp_path):
  """A CheckpointExpr inside a longer lineage: second evaluation restores
  from disk (no recompute of the expensive subtree)."""
  from spartan_tpu.backend import evaluator
  a_np = rng.standard_normal((32, 32))
  path = str(tmp_path / "lineage")
  expensive = sp.dot(sp.from_numpy(a_np), sp.from_numpy(a_np.T))
  ck = checkpoint(expensive, path)
  out1 = (ck + 1.0).sum().glom()
  # fresh graph, same checkpoint path — the dot is NOT re-evaluated
  evaluator.clear_cache()
  before = evaluator.stats["compiles"]
  ck2 = checkpoint(sp.dot(sp.from_numpy(np.zeros((32, 32))),
                          sp.from_numpy(np.zeros((32, 32)))), path)
  out2 = (ck2 + 1.0).sum().glom()
  np.testing.assert_allclose(out2, out1, rtol=1e-12)


def test_smart_tile_then_train(rng):
  """smart_tile on the training DAG, then run: results unchanged."""
  X_np = rng.standard_normal((64, 8))
  y_np = rng.standard_normal(64)
  X, y = sp.from_numpy(X_np), sp.from_numpy(y_np)
  w = sp.from_numpy(np.zeros(8))
  step = sp.dot(X.T, sp.dot(X, w) - y) * (2.0 / 64)
  plain = step.glom()
  X2, y2 = sp.from_numpy(X_np), sp.from_numpy(y_np)
  w2 = sp.from_numpy(np.zeros(8))
  step2 = sp.dot(X2.T, sp.dot(X2, w2) - y2) * (2.0 / 64)
  sp.smart_tile(step2)
  np.testing.assert_allclose(step2.glom(), plain, atol=1e-12)


def test_profiled_training_loop(rng, tmp_path):
  """StepTimer + trace around a real loop produce usable artifacts."""
  import glob
  X_np = rng.standard_normal((128, 4))
  y_np = rng.standard_normal(128)
  timer = profiling.StepTimer()
  with profiling.trace(str(tmp_path)):
    X, y = sp.from_numpy(X_np), sp.from_numpy(y_np)
    w = sp.from_numpy(np.zeros(4))
    for _ in range(5):
      with timer.step("gd", bytes_moved=X_np.nbytes):
        grad = sp.dot(X.T, sp.dot(X, w) - y) * (2.0 / 128)
        w = sp.Val((w - 0.05 * grad).evaluate())
  s = timer.summary()
  assert s["count"] == 5 and s["total_s"] > 0
  assert glob.glob(str(tmp_path) + "/**/*", recursive=True)


def test_mixed_sparse_dense_pipeline(rng, cluster):
  """Sparse SpMV feeding dense lazy ops feeding a reduction — one flow."""
  import scipy.sparse as ss
  from spartan_tpu.backend import sparse as sps
  A = ss.random(32, 32, density=0.2,
                random_state=np.random.RandomState(7), format="csr")
  S = sps.from_scipy(A).shard(cluster)
  x = rng.standard_normal(32)
  out = sp.sqrt(abs(sps.spmv_expr(S, sp.from_numpy(x))) + 1.0).sum()
  want = np.sqrt(np.abs(A @ x) + 1.0).sum()
  np.testing.assert_allclose(float(out.glom()), want, rtol=1e-12)


def test_mixed_mesh_leaves_auto_migrate(rng, cluster):
  """Leaves placed on a different mesh are re-placed onto the active mesh
  (the reference master's tile re-placement)."""
  import jax
  from spartan_tpu.core import mesh as mesh_mod
  m4 = mesh_mod.make_mesh((4,), ("x",), devices=jax.devices()[:4])
  a = sp.from_numpy(np.ones((8, 8)))
  with sp.with_mesh(m4):
    b = sp.from_numpy(np.full((8, 8), 2.0))
  got = float((a + b).sum().glom())
  assert got == 3.0 * 64


def test_mesh_switch_does_not_hit_stale_cache(rng, cluster):
  """Same DAG structure under a different active mesh must recompile for
  the new mesh, not reuse a region pinned to the old devices."""
  import jax
  from spartan_tpu.core import mesh as mesh_mod
  a_np = rng.standard_normal((16, 8))
  r8 = (sp.from_numpy(a_np) * 2.0).evaluate()
  assert len({s.device for s in r8.data.addressable_shards}) > 1
  m4 = mesh_mod.make_mesh((4,), ("x",), devices=jax.devices()[4:8])
  with sp.with_mesh(m4):
    r4 = (sp.from_numpy(a_np) * 2.0).evaluate()
    devs = {s.device for s in r4.data.addressable_shards}
    assert devs <= set(jax.devices()[4:8]), devs
  np.testing.assert_array_equal(r4.glom(), r8.glom())


def test_loop_body_with_sparse_spmv(rng, cluster):
  """spmv_expr inside a fori_loop body (sparse leaves become loop
  constants)."""
  import scipy.sparse as ss
  from spartan_tpu.backend import sparse as sps
  A = ss.random(24, 24, density=0.3,
                random_state=np.random.RandomState(3), format="csr")
  M = A / np.maximum(A.sum(0).A.ravel() if hasattr(A.sum(0), 'A')
                     else np.asarray(A.sum(0)).ravel(), 1)
  M = ss.csr_matrix(M)
  S = sps.from_scipy(M)
  r = sp.fori_loop(10, lambda r: sps.spmv_expr(S, r) * 0.9 + 0.1 / 24,
                   sp.ones((24,)) / 24)
  rn = np.ones(24) / 24
  Mn = M.toarray()
  for _ in range(10):
    rn = 0.9 * (Mn @ rn) + 0.1 / 24
  np.testing.assert_allclose(np.asarray(r.glom()), rn, atol=1e-12)


def test_checkpoint_then_loop(rng, tmp_path):
  """A checkpointed intermediate feeding a fori_loop body."""
  a_np = rng.standard_normal((8, 8))
  ck = sp.expr.checkpoint(sp.from_numpy(a_np) @ sp.from_numpy(a_np.T),
                          str(tmp_path / "g"))
  gram = ck.evaluate()   # materialize (and persist)
  out = sp.fori_loop(3, lambda v: sp.dot(sp.Val(gram), v) * 0.1,
                     sp.ones((8,)))
  G = a_np @ a_np.T
  want = np.ones(8)
  for _ in range(3):
    want = 0.1 * (G @ want)
  np.testing.assert_allclose(np.asarray(out.glom()), want, rtol=1e-10)


def test_smart_tile_then_loop(rng, cluster):
  """smart_tile-placed leaves feed a fori_loop."""
  X_np = rng.standard_normal((32, 8))
  X = sp.from_numpy(X_np)
  probe = sp.dot(X.T, sp.dot(X, sp.from_numpy(np.zeros(8))))
  sp.smart_tile(probe)   # re-places X's underlying leaf copy
  w = sp.fori_loop(5, lambda w: w - 0.01 * sp.dot(X.T, sp.dot(X, w)),
                   sp.ones((8,)))
  wn = np.ones(8)
  for _ in range(5):
    wn = wn - 0.01 * (X_np.T @ (X_np @ wn))
  np.testing.assert_allclose(np.asarray(w.glom()), wn, atol=1e-12)


def test_grad_of_loop_free_loss_with_remat(rng):
  """autodiff through remat inside sgd_train."""
  from spartan_tpu import autodiff
  x_np = rng.standard_normal((32, 4))
  y_np = rng.standard_normal(32)
  w = sp.from_numpy(np.zeros(4))
  X, y = sp.from_numpy(x_np), sp.from_numpy(y_np)
  pred = sp.remat(sp.dot(X, w))
  loss = sp.sum((pred - y) ** 2) / 32.0
  (w2,) = autodiff.sgd_train(loss, [w], lr=0.1, steps=50)
  wn = np.zeros(4)
  for _ in range(50):
    wn = wn - 0.1 * (2 / 32) * (x_np.T @ (x_np @ wn - y_np))
  np.testing.assert_allclose(np.asarray(w2.glom()), wn, atol=1e-10)


def test_checkpoint_restores_with_optimizer_disabled(rng, tmp_path):
  """--optimization=0 must not silently re-execute checkpoints:
  CollapseCached is cache semantics, not an optimization."""
  from spartan_tpu.config import FLAGS
  from spartan_tpu.backend import evaluator
  path = str(tmp_path / "noopt")
  a_np = rng.standard_normal((16, 16))
  out1 = (checkpoint(sp.dot(sp.from_numpy(a_np), sp.from_numpy(a_np.T)),
                     path) + 1.0).sum().glom()
  evaluator.clear_cache()
  FLAGS.optimization = False
  try:
    ck2 = checkpoint(sp.dot(sp.from_numpy(np.zeros((16, 16))),
                            sp.from_numpy(np.zeros((16, 16)))), path)
    out2 = (ck2 + 1.0).sum().glom()
  finally:
    FLAGS.lookup("optimization").reset()
  np.testing.assert_allclose(out2, out1, rtol=1e-12)
