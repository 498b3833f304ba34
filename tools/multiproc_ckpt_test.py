"""Two-process jax.distributed checkpoint round-trip (TODO #4 validation).

Each process owns 2 virtual CPU devices (global mesh = 4). Process 0 and
process 1 each write their ADDRESSABLE shards of one sharded array via
``sp.save``; after a barrier, process 0 reloads with ``sp.load`` and
checks the full array. Run::

    python tools/multiproc_ckpt_test.py            # parent: spawns both
    python tools/multiproc_ckpt_test.py <pid> <dir>  # child (internal)
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

PORT = 17771


def child(pid: int, workdir: str) -> None:
  os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
  import jax
  jax.config.update("jax_platforms", "cpu")
  jax.distributed.initialize(coordinator_address=f"localhost:{PORT}",
                             num_processes=2, process_id=pid)
  jax.config.update("jax_enable_x64", True)
  assert jax.process_count() == 2, jax.process_count()
  assert len(jax.devices()) == 4, len(jax.devices())

  import spartan_tpu as sp
  sp.initialize(["--log_level=30"])
  from jax.sharding import NamedSharding, PartitionSpec as P
  from spartan_tpu.core.array import SpartanArray
  from spartan_tpu.core.tiling import Tiling

  mesh = sp.get_mesh()
  full = np.arange(16.0 * 4).reshape(16, 4)  # global value, same everywhere
  tiling = Tiling(mesh, P(tuple(mesh.axis_names)))
  arr = jax.make_array_from_callback(
      full.shape, NamedSharding(mesh, tiling.spec),
      lambda idx: full[idx])
  sarr = SpartanArray(arr, tiling)

  path = os.path.join(workdir, "ckpt")
  sp.save(sarr, path)

  # barrier: both processes finished writing
  import jax.experimental.multihost_utils as mhu
  mhu.sync_global_devices("ckpt_written")

  # SPMD: every process runs the same load (device_put over the global
  # mesh is a collective); each verifies its ADDRESSABLE shards
  back = sp.load(path)
  data = back.data if hasattr(back, "data") else back
  for sh in data.addressable_shards:
    np.testing.assert_array_equal(np.asarray(sh.data), full[sh.index])
  mhu.sync_global_devices("done")
  print("MULTIPROC_CKPT_OK", flush=True)

  # --- evaluator smoke over the 2-process global mesh (VERDICT r1 #6):
  # one linreg gradient step and one k-means step run SPMD through the
  # full expr/optimizer/evaluator path; every process checks its
  # ADDRESSABLE shards against the NumPy oracle ------------------------
  rng = np.random.default_rng(0)
  n, d, k = 32, 8, 4
  Xn = rng.standard_normal((n, d))
  yn = rng.standard_normal(n)
  wn = np.zeros(d)

  from spartan_tpu.examples import kmeans, linear_reg

  X, y, w = sp.from_numpy(Xn), sp.from_numpy(yn), sp.from_numpy(wn)
  w1 = linear_reg.gradient_step(X, y, w, 0.01).evaluate()
  oracle_w1 = wn - 0.01 * (2.0 / n) * (Xn.T @ (Xn @ wn - yn))
  for sh in w1.data.addressable_shards:
    np.testing.assert_allclose(np.asarray(sh.data), oracle_w1[sh.index],
                               atol=1e-12)

  ctr = rng.standard_normal((k, d))
  labels_np = np.argmin(((Xn[:, None, :] - ctr[None]) ** 2).sum(-1), axis=1)
  sums = np.zeros((k, d))
  np.add.at(sums, labels_np, Xn)
  counts = np.bincount(labels_np, minlength=k)
  oracle_c = sums / np.maximum(counts, 1)[:, None]

  pts = sp.from_numpy(Xn)
  labels = kmeans.assign_labels(pts, sp.from_numpy(ctr))
  c1 = kmeans.update_centers(pts, labels, k).evaluate()
  for sh in c1.data.addressable_shards:
    np.testing.assert_allclose(np.asarray(sh.data), oracle_c[sh.index],
                               atol=1e-12)

  mhu.sync_global_devices("evaluator_done")
  print("MULTIPROC_EVAL_OK", flush=True)

  # --- distributed sample sort + exact rank selection across the two
  # REAL processes: the splitter search runs psum rounds over the global
  # mesh and the bucket exchange is a cross-process all_to_all ----------
  from spartan_tpu.config import FLAGS
  vn = rng.standard_normal(64)
  old_method, old_thr = FLAGS.sort_method, FLAGS.sort_sample_threshold
  FLAGS.sort_method, FLAGS.sort_sample_threshold = "sample", 0
  try:
    got_sorted = sp.sort(sp.from_numpy(vn)).evaluate()
    want_sorted = np.sort(vn)
    for sh in got_sorted.data.addressable_shards:
      np.testing.assert_allclose(np.asarray(sh.data),
                                 want_sorted[sh.index], atol=0)
    med = float(np.asarray(sp.median(sp.from_numpy(vn)).glom()))
    np.testing.assert_allclose(med, np.median(vn), atol=1e-12)
  finally:
    FLAGS.sort_method, FLAGS.sort_sample_threshold = old_method, old_thr

  mhu.sync_global_devices("sort_done")
  print("MULTIPROC_SORT_OK", flush=True)


def parent() -> int:
  workdir = tempfile.mkdtemp(prefix="spt_mp_")
  procs = [subprocess.Popen(
      [sys.executable, __file__, str(pid), workdir],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
      for pid in (0, 1)]
  outs = [p.communicate(timeout=300)[0] for p in procs]
  ok = (all(p.returncode == 0 for p in procs)
        and all("MULTIPROC_CKPT_OK" in o for o in outs)
        and all("MULTIPROC_EVAL_OK" in o for o in outs)
        and all("MULTIPROC_SORT_OK" in o for o in outs))
  for i, o in enumerate(outs):
    print(f"--- process {i} ---\n{o[-2000:]}")
  print("RESULT:", "PASS" if ok else "FAIL")
  return 0 if ok else 1


if __name__ == "__main__":
  if len(sys.argv) == 3:
    child(int(sys.argv[1]), sys.argv[2])
  else:
    raise SystemExit(parent())
