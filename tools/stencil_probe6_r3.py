"""Stencil probe v6: unrolled-application marginal timing.

fori_loop-chained pallas_call is pathological (55 ms/iter vs 0.8 for
the same op in XLA — per-iteration carry copies + pipeline re-init), so
chain INSIDE one jit by unrolling: programs apply the op k times
(python loop under trace), slope between k=4 and k=12 programs = the
true marginal cost of one application (read B + write B + compute),
with no loop machinery and the final consumer amortized out.

    PYTHONPATH=/root/.axon_site:/root/repo timeout 590 \
      python -u tools/stencil_probe6_r3.py > /tmp/stencil_probe6.log 2>&1
"""
import functools
import importlib.util
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)
bench._enable_compile_cache()

import sys  # noqa: E402
sys.path.insert(0, "/root/repo")
from spartan_tpu.backend.kernels import stencil_pallas  # noqa: E402

N = 8192
S = 0.9 / 4.5
GENERAL = tuple(S * v for v in
                (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9))
T0 = time.time()
K_LO, K_HI = 4, 12


def _st(msg):
  print(f"[+{time.time()-T0:7.1f}s] {msg}", flush=True)


def _kernel(coeffs, bm, m, x_ref, o_ref):
  acc = jnp.zeros((bm, m), jnp.float32)
  for dj in range(3):
    s = None
    for di in range(3):
      c = coeffs[di * 3 + dj]
      if c == 0.0:
        continue
      t = c * x_ref[di:di + bm, :]
      s = t if s is None else s + t
    if s is not None:
      acc = acc + s[:, dj:dj + m]
  o_ref[:] = acc


def stencil_v3(x, coeffs, bm=64):
  n, m = x.shape
  mp = m + 128
  xp = jnp.pad(x, ((1, 7), (1, 127)))
  return pl.pallas_call(
      functools.partial(_kernel, coeffs, bm, m),
      grid=(n // bm,),
      in_specs=[pl.BlockSpec((pl.Element(bm + 8), pl.Element(mp)),
                             lambda i: (i * bm, 0))],
      out_specs=pl.BlockSpec((bm, m), lambda i: (i, 0)),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
  )(xp)


def xla_shift(coeffs):
  def fn(x):
    n, m = x.shape
    xp = jnp.pad(x, 1)
    acc = jnp.zeros_like(x)
    for di in range(3):
      for dj in range(3):
        c = coeffs[di * 3 + dj]
        if c:
          acc = acc + c * lax.slice(xp, (di, dj), (di + n, dj + m))
    return acc
  return fn


def _copy_kernel(x_ref, o_ref):
  o_ref[:] = x_ref[:] * 0.999


def pallas_copy(x):
  return pl.pallas_call(
      _copy_kernel,
      grid=(N // 256, N // 1024),
      in_specs=[pl.BlockSpec((256, 1024), lambda i, j: (i, j))],
      out_specs=pl.BlockSpec((256, 1024), lambda i, j: (i, j)),
      out_shape=jax.ShapeDtypeStruct((N, N), x.dtype),
  )(x)


def marginal_gbps(fn, x, reps=6):
  progs = {}
  for k in (K_LO, K_HI):
    @functools.partial(jax.jit, static_argnames="kk")
    def prog(x, kk):
      y = x
      for _ in range(kk):
        y = fn(y)
      return jnp.sum(y, dtype=jnp.float32)
    progs[k] = functools.partial(prog, kk=k)
    jax.block_until_ready(progs[k](x))
  t = {K_LO: [], K_HI: []}
  for _ in range(reps):
    for k in (K_LO, K_HI):
      t0 = time.perf_counter()
      jax.block_until_ready(progs[k](x))
      t[k].append(time.perf_counter() - t0)
  s = (min(t[K_HI]) - min(t[K_LO])) / (K_HI - K_LO)
  return 2 * N * N * 4 / s / 1e9


def main():
  x = jax.jit(lambda: jax.random.normal(jax.random.key(0), (N, N),
                                        jnp.float32))()
  jax.block_until_ready(x)
  _st(f"platform={jax.devices()[0].device_kind}")

  @jax.jit
  def rsum(x, k):
    def body(i, c):
      x2, c2 = lax.optimization_barrier((x, c))
      return jnp.sum(x2, dtype=jnp.float32) + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
  s, _, _ = bench._slope_time(lambda k: (lambda: rsum(x, k)),
                              k_lo=8, k_hi=40, reps=6)
  _st(f"read-only reference: {N*N*4/s/1e9:.1f} GB/s")

  for name, fn in [
      ("pallas copy", pallas_copy),
      ("xla y=0.999x", lambda x: x * 0.999),
      ("xla_shift", xla_shift(GENERAL)),
      ("pallas v1 dma", lambda x: stencil_pallas.stencil3x3(x, GENERAL)),
      ("pallas v3 elem bm=64", lambda x: stencil_v3(x, GENERAL, 64)),
  ]:
    try:
      g = marginal_gbps(fn, x)
      _st(f"{name}: {g:.1f} GB/s ({g/819:.3f} of 819)")
    except Exception as e:
      _st(f"{name}: FAILED {e!r:.300}")
  _st("probe done")


if __name__ == "__main__":
  main()
