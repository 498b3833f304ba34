"""On-chip shootout of unstructured-SpMV formulations (VERDICT r1 #7).

The scalar ELL gather is the TPU unstructured-sparsity bottleneck
(~0.1 Gnnz/s).  Candidates that avoid per-element gathers:

  ell        — baseline: jnp.take(x, cols) elementwise gather
  onehot     — gather as an MXU matmul: eq(iota, cols) @ x, bf16 one-hot
               (compute 2n FLOP per nonzero; fused by XLA, never
               materialized)
  onehot32   — same in f32 (exact)
  bsr8       — fine-grained 8x8 block-ELL (64x storage expansion on
               uniform-random, but block gathers instead of scalar)
  rowgather  — two-level: q=col//128 row-gather of x2d=(n/128,128)
               (512-byte contiguous gathers) + rem one-hot reduce

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/spmv_probe.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main(n=16384, nnz_per_row=64):
  import jax
  import jax.numpy as jnp
  from jax import lax

  from spartan_tpu.backend import sparse as sps

  rng = np.random.default_rng(0)
  S = sps.sprandn(n, n, density=nnz_per_row / n, seed=3)
  cols = jnp.asarray(np.asarray(S.cols))
  vals = jnp.asarray(np.asarray(S.vals), jnp.float32)
  nnz = S.nnz
  x = jnp.asarray(rng.standard_normal(n), jnp.float32)
  x2d = x.reshape(-1, 128)
  oracle = np.asarray(S.to_scipy() @ np.asarray(x, np.float64))
  print(f"n={n} nnz={nnz} padded={cols.shape[0] * cols.shape[1]}",
        flush=True)

  def ell(cols, vals, x, x2d):
    return jnp.sum(vals * jnp.take(x, cols, axis=0), axis=1)

  CH = 256  # row chunk: bounds one-hot working set if XLA materializes

  def _onehot_chunked(cols, vals, x, dt):
    def chunk(args):
      c, v = args
      oh = (c[:, :, None] == jnp.arange(n)[None, None, :]).astype(dt)
      g = jnp.einsum("rmn,n->rm", oh, x.astype(dt),
                     preferred_element_type=jnp.float32)
      return jnp.sum(v * g, axis=1)
    rows = cols.shape[0]
    cc = cols.reshape(rows // CH, CH, -1)
    vv = vals.reshape(rows // CH, CH, -1)
    return jax.lax.map(chunk, (cc, vv)).reshape(rows)

  def onehot(cols, vals, x, x2d):
    return _onehot_chunked(cols, vals, x, jnp.bfloat16)

  def onehot32(cols, vals, x, x2d):
    return _onehot_chunked(cols, vals, x, jnp.float32)

  def rowgather(cols, vals, x, x2d):
    q, r = cols // 128, cols % 128
    rows128 = jnp.take(x2d, q, axis=0)            # (rows, mx, 128)
    ohr = (r[:, :, None] == jnp.arange(128)[None, None, :]).astype(
        jnp.float32)
    return jnp.sum(vals * jnp.sum(rows128 * ohr, axis=2), axis=1)

  cands = {"ell": ell, "onehot": onehot, "onehot32": onehot32,
           "rowgather": rowgather}

  def bench(name, fn, tol):
    @jax.jit
    def loop(cols, vals, x, x2d, k):
      def body(i, c):
        (c2, x2, xx2), _ = lax.optimization_barrier(((c, x, x2d), i))
        return c + jnp.sum(fn(cols, vals, x2, xx2)) * 1e-30
      return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    try:
      y = np.asarray(jax.device_get(fn(cols, vals, x, x2d)))
      err = np.max(np.abs(y - oracle)) / max(np.max(np.abs(oracle)), 1e-9)
      lo = loop(cols, vals, x, x2d, 4)
      hi = loop(cols, vals, x, x2d, 20)
      jax.block_until_ready((lo, hi))
      t_lo, t_hi = [], []
      for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(loop(cols, vals, x, x2d, 4))
        t_lo.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        jax.block_until_ready(loop(cols, vals, x, x2d, 20))
        t_hi.append(time.perf_counter() - t0)
      s = (min(t_hi) - min(t_lo)) / 16
      print(f"{name:10s} {s * 1e3:9.3f} ms  {nnz / s / 1e9:8.2f} Gnnz/s  "
            f"relerr {err:.2e}", flush=True)
    except Exception as e:
      print(f"{name:10s} FAILED: {str(e)[:160]}", flush=True)

  for name, fn in cands.items():
    bench(name, fn, 1e-5)

  # bs=8 block-ELL on the same matrix
  try:
    B = S.to_bsr(bs=8, pad=True)
    print(f"bsr8 blocks={B.block_cols.shape} expansion="
          f"{B.block_cols.shape[0] * B.block_cols.shape[1] * 64 / nnz:.0f}x",
          flush=True)

    @jax.jit
    def loop_b(bc, bv, x, k):
      def body(i, c):
        (c2, x2), _ = lax.optimization_barrier(((c, x), i))
        xb = x2.reshape(-1, 8)
        g = jnp.take(xb, bc, axis=0)
        y = jnp.einsum("rmij,rmj->ri", bv, g,
                       preferred_element_type=jnp.float32)
        return c + jnp.sum(y) * 1e-30
      return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    bc, bv = B.block_cols, B.block_vals
    jax.block_until_ready(loop_b(bc, bv, x, 4))
    t_lo, t_hi = [], []
    for _ in range(5):
      t0 = time.perf_counter()
      jax.block_until_ready(loop_b(bc, bv, x, 4))
      t_lo.append(time.perf_counter() - t0)
      t0 = time.perf_counter()
      jax.block_until_ready(loop_b(bc, bv, x, 20))
      t_hi.append(time.perf_counter() - t0)
    s = (min(t_hi) - min(t_lo)) / 16
    print(f"{'bsr8':10s} {s * 1e3:9.3f} ms  {nnz / s / 1e9:8.2f} Gnnz/s",
          flush=True)
  except Exception as e:
    print(f"bsr8 FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
  n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
  k = int(sys.argv[2]) if len(sys.argv) > 2 else 64
  main(n, k)
