"""Save/load + checkpoint/resume (reference: expr/fio.py, expr/checkpoint.py;
SURVEY.md §5)."""

import os

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.expr import checkpoint, load, save
from spartan_tpu.util import Assert


def test_save_load_roundtrip(rng, tmp_path):
  a = rng.standard_normal((16, 24))
  arr = sp.from_numpy(a).evaluate()
  path = str(tmp_path / "arr")
  save(arr, path)
  assert os.path.exists(os.path.join(path, "manifest.json"))
  back = load(path)
  np.testing.assert_array_equal(back.glom(), a)
  # restored into the same sharding
  assert tuple(back.tiling.spec) == tuple(arr.tiling.spec)


def test_save_expr(rng, tmp_path):
  a = rng.standard_normal((8, 8))
  path = str(tmp_path / "expr")
  save(sp.from_numpy(a) * 2.0, path)
  np.testing.assert_allclose(load(path).glom(), a * 2.0, atol=1e-12)


def test_checkpoint_computes_then_restores(rng, tmp_path):
  a = rng.standard_normal((8, 8))
  path = str(tmp_path / "ckpt")
  expr = checkpoint(sp.from_numpy(a) + 1.0, path)
  r1 = expr.glom()
  np.testing.assert_allclose(r1, a + 1.0, atol=1e-12)
  # a fresh expr (fresh lineage) restores from disk instead of recomputing
  expr2 = checkpoint(sp.from_numpy(np.zeros_like(a)) + 123.0, path)
  r2 = expr2.glom()
  np.testing.assert_array_equal(r2, r1)


def test_checkpoint_in_larger_dag(rng, tmp_path):
  a = rng.standard_normal((8, 8))
  path = str(tmp_path / "ckpt2")
  ck = checkpoint(sp.from_numpy(a) * 3.0, path)
  out = (ck + 1.0).sum()
  np.testing.assert_allclose(out.glom(), (a * 3.0 + 1.0).sum(), rtol=1e-12)


def test_from_file(rng, tmp_path):
  a = rng.standard_normal((6, 6))
  p = str(tmp_path / "x.npy")
  np.save(p, a)
  Assert.all_eq(sp.expr.from_file(p), a)


@pytest.mark.parametrize("nproc,port", [(2, 17771), (4, 17781)])
def test_multiprocess_checkpoint_roundtrip(nproc, port):
  """Real jax.distributed CPU processes (2 and 4 — VERDICT r3 next #6)
  write their addressable shards, SPMD-reload, and run the evaluator /
  cross-process sample sort / sharded dot stages (SURVEY §5 multi-host
  checkpoint + §2.4 comm backend). Runs tools/multiproc_ckpt_test.py as
  subprocesses."""
  import subprocess, sys, os
  env = dict(os.environ)
  env.pop("XLA_FLAGS", None)
  env["JAX_PLATFORMS"] = ""
  env["PYTHONPATH"] = os.pathsep.join(
      p for p in (env.get("PYTHONPATH", ""), os.getcwd()) if p)
  out = subprocess.run(
      [sys.executable, "tools/multiproc_ckpt_test.py",
       "--np", str(nproc), "--port", str(port)],
      capture_output=True, text=True, timeout=280, env=env,
      cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
  assert "RESULT: PASS" in out.stdout, out.stdout[-2000:] + out.stderr[-500:]


def test_crash_mid_save_leaves_no_manifest(rng, tmp_path, monkeypatch):
  """Regression (ADVICE r1 low): the manifest must be written LAST, so a
  crash mid-save never leaves a manifest pointing at missing shards
  (which made checkpoint restore raise FileNotFoundError forever)."""
  a = rng.standard_normal((16, 8))
  arr = sp.from_numpy(a).evaluate()
  path = str(tmp_path / "crash")

  calls = {"n": 0}
  real_save = np.save

  def failing_save(f, *args, **kw):
    calls["n"] += 1
    if calls["n"] >= 2:
      raise OSError("disk full (simulated)")
    return real_save(f, *args, **kw)

  monkeypatch.setattr(np, "save", failing_save)
  with pytest.raises(OSError):
    save(arr, path)
  monkeypatch.undo()
  assert not os.path.exists(os.path.join(path, "manifest.json"))
  # and a checkpoint over the same path recomputes instead of failing
  ck = checkpoint(sp.from_numpy(a) * 2.0, path)
  np.testing.assert_allclose(ck.glom(), a * 2.0, atol=1e-12)
