"""Round-3 on-chip Mosaic gather probes, batched into ONE process (the
compile service charges a per-session setup of minutes — pay it once).

1. (128,128) axis-0 take_along_axis in a Pallas kernel — the parked
   HTTP-500 from r2 (CLAUDE.md parked thread #1).  If it compiles now,
   the one-hot small-n SpMV kernel can get the exact-gather treatment.
2. (128,1024)-operand axis-1 take_along_axis — the wide-window gather
   the SpMM kernel gates behind ``_WIDE_GATHER`` (spmm_pallas.py).
3. If (2) compiles: windowed SpMM throughput wide vs chunked at a
   medium config.

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/gather_probe_r3.py > /tmp/gather_probe.log 2>&1
"""
import time

import numpy as np
import scipy.sparse as ss

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import spartan_tpu as sp
from spartan_tpu.backend import sparse as sps
from spartan_tpu.backend.kernels import spmm_pallas as smp

sp.initialize(["--log_level=40"])
print("device:", jax.devices()[0].device_kind, flush=True)
T0 = time.time()


def stamp(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def try_kernel(name, kernel, args, out_shape, want):
  t0 = time.time()
  try:
    got = np.asarray(pl.pallas_call(kernel, out_shape=out_shape)(*args))
    err = np.abs(got - want).max()
    stamp(f"{name}: COMPILES ({time.time()-t0:.1f}s) maxerr={err:.2e}")
    return True
  except Exception as e:
    stamp(f"{name}: REJECTED ({time.time()-t0:.1f}s): {str(e)[:200]}")
    return False


rng = np.random.default_rng(0)

# --- probe 1: (128,128) axis-0 gather --------------------------------------
x = rng.standard_normal((128, 128)).astype(np.float32)
idx0 = rng.integers(0, 128, (128, 128)).astype(np.int32)


def k_axis0(x_ref, i_ref, o_ref):
  o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)


ok_axis0 = try_kernel(
    "(128,128) axis-0 take_along_axis", k_axis0,
    (jnp.asarray(x), jnp.asarray(idx0)),
    jax.ShapeDtypeStruct((128, 128), jnp.float32),
    np.take_along_axis(x, idx0, axis=0))

# --- probe 2: (128,1024) axis-1 wide gather --------------------------------
w = rng.standard_normal((128, 1024)).astype(np.float32)
idx1 = rng.integers(0, 1024, (128, 128)).astype(np.int32)


def k_wide(w_ref, i_ref, o_ref):
  o_ref[...] = jnp.take_along_axis(w_ref[...], i_ref[...], axis=1)


ok_wide = try_kernel(
    "(128,1024)->axis-1 (128,128) wide gather", k_wide,
    (jnp.asarray(w), jnp.asarray(idx1)),
    jax.ShapeDtypeStruct((128, 128), jnp.float32),
    np.take_along_axis(w, idx1, axis=1))

# --- probe 3: SpMM wide vs chunked -----------------------------------------
if ok_wide:
  def slope_ms(fn, B, k_lo=4, k_hi=20, reps=4):
    from jax import lax

    @jax.jit
    def loop(B, k):
      def body(i, c):
        B2, c2 = lax.optimization_barrier((B, c))
        return jnp.sum(fn(B2)) * 1e-30 + 0.0 * c2
      return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    def sync(v):
      return float(np.asarray(jax.device_get(v)).ravel()[0])

    sync(loop(B, k_lo)); sync(loop(B, k_hi))
    t_lo, t_hi = [], []
    for _ in range(reps):
      t0 = time.perf_counter(); sync(loop(B, k_lo))
      t_lo.append(time.perf_counter() - t0)
      t0 = time.perf_counter(); sync(loop(B, k_hi))
      t_hi.append(time.perf_counter() - t0)
    return max((min(t_hi) - min(t_lo)) / (k_hi - k_lo), 1e-9) * 1e3

  n, m, k, d = 16384, 16384, 64, 0.005
  A = ss.random(n, m, density=d, random_state=np.random.RandomState(7),
                format="csr", dtype=np.float32)
  S = sps.from_scipy(A, dtype=np.float32)
  B = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
  packed = S.to_windowed_spmm()
  want = A @ np.asarray(B)
  for wide in (False, True):
    smp._WIDE_GATHER = wide
    f = smp.make_spmm_windowed(packed)
    t0 = time.time()
    try:
      got = np.asarray(f(B))
      rel = np.abs(got - want).max() / np.abs(want).max()
      ms = slope_ms(f, B)
      stamp(f"spmm wide={wide}: compile {time.time()-t0:.1f}s "
            f"relerr={rel:.2e}  {ms:.3f} ms  "
            f"({S.nnz/ms/1e6:.2f} Gnnz/s)")
    except Exception as e:
      stamp(f"spmm wide={wide}: FAILED: {str(e)[:200]}")

stamp("probe done")
