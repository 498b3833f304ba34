"""N-process jax.distributed checkpoint round-trip (TODO #4 validation;
VERDICT r3 next #6 scales it to 4 processes + a sharded dot).

Each process owns 2 virtual CPU devices (global mesh = 2N). Every process
writes its ADDRESSABLE shards of one sharded array via ``sp.save``; after
a barrier, all SPMD-reload and verify. Run::

    python tools/multiproc_ckpt_test.py [--np N]       # parent (default 2)
    python tools/multiproc_ckpt_test.py <pid> <dir> <np> <port>  # child
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

PORT = 17771


def child(pid: int, workdir: str, nproc: int = 2, port: int = PORT) -> None:
  os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
  import jax
  jax.config.update("jax_platforms", "cpu")
  jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                             num_processes=nproc, process_id=pid)
  jax.config.update("jax_enable_x64", True)
  assert jax.process_count() == nproc, jax.process_count()
  assert len(jax.devices()) == 2 * nproc, len(jax.devices())

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

  # --- sharded dot across the real processes (VERDICT r3 next #6): the
  # contraction's collectives (psum/reduce-scatter per the planner) run
  # over the cross-process global mesh; oracle-checked per shard --------
  An = rng.standard_normal((32, 16))
  Bn = rng.standard_normal((16, 8))
  got = sp.dot(sp.from_numpy(An), sp.from_numpy(Bn)).evaluate()
  want = An @ Bn
  for sh in got.data.addressable_shards:
    np.testing.assert_allclose(np.asarray(sh.data), want[sh.index],
                               atol=1e-10)
  mhu.sync_global_devices("dot_done")
  print("MULTIPROC_DOT_OK", flush=True)


def parent(nproc: int = 2, port: int = PORT) -> int:
  workdir = tempfile.mkdtemp(prefix="spt_mp_")
  procs = [subprocess.Popen(
      [sys.executable, __file__, str(pid), workdir, str(nproc), str(port)],
      stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
      for pid in range(nproc)]
  outs = [p.communicate(timeout=300)[0] for p in procs]
  marks = ("MULTIPROC_CKPT_OK", "MULTIPROC_EVAL_OK", "MULTIPROC_SORT_OK",
           "MULTIPROC_DOT_OK")
  ok = (all(p.returncode == 0 for p in procs)
        and all(m in o for m in marks for o in outs))
  for i, o in enumerate(outs):
    print(f"--- process {i} ---\n{o[-2000:]}")
  print("RESULT:", "PASS" if ok else "FAIL")
  return 0 if ok else 1


if __name__ == "__main__":
  if len(sys.argv) >= 3 and sys.argv[1].isdigit():
    child(int(sys.argv[1]), sys.argv[2],
          int(sys.argv[3]) if len(sys.argv) > 3 else 2,
          int(sys.argv[4]) if len(sys.argv) > 4 else PORT)
  else:
    np_arg = 2
    port = PORT
    if "--np" in sys.argv:
      np_arg = int(sys.argv[sys.argv.index("--np") + 1])
    if "--port" in sys.argv:
      port = int(sys.argv[sys.argv.index("--port") + 1])
    raise SystemExit(parent(np_arg, port))
