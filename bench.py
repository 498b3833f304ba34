"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.md config 1): tiled elementwise+reduce bandwidth
over a 16384² f32 array, in GB/s against the chip's HBM roofline.
``vs_baseline`` = fraction of roofline (north-star target: ≥0.90 on TPU).

Timing methodology: the K-iteration chain runs *on device* inside one jit
(``lax.fori_loop`` with a scalar carry feeding a non-hoistable elementwise
op), so a single host dispatch covers all iterations — host→device tunnel
latency is excluded, and the data dependence through the carry prevents
XLA from eliding any pass.  The final scalar is ``device_get``-ed, which
bounds the measurement by true completion even where
``block_until_ready`` is unreliable.

The measured body is exactly the computation the expr layer emits for
``(ones(n,n) + b*2).sum()`` (one fused read-once region); ``--all`` adds
the Pallas-kernel variant and the matmul config on stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# rough HBM rooflines by device kind (GB/s per chip)
_ROOFLINE_GBPS = {
    "v5 lite": 819.0,     # v5e
    "v5e": 819.0,
    "v5p": 2765.0,
    "v4": 1228.0,
    "v6": 1640.0,         # v6e (Trillium)
    "cpu": 50.0,          # nominal host memory BW (CI fallback)
}
_MXU_PEAK_BF16 = {"v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
                  "v4": 275.0, "v6": 918.0}


def _lookup(device, table, default) -> float:
  kind = getattr(device, "device_kind", "cpu").lower()
  for key, v in table.items():
    if key in kind:
      return v
  return default


_T0 = time.time()


def _stamp(msg: str) -> None:
  print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr)


def _run_loop(loop_fn, *args, iters_outer: int = 2):
  """Call a jitted on-device loop a few times; return best seconds."""
  import jax
  float(np.asarray(jax.device_get(loop_fn(*args))).ravel()[0])  # compile+warm
  _stamp("compiled + warm")
  times = []
  for _ in range(iters_outer):
    t0 = time.perf_counter()
    out = loop_fn(*args)
    float(np.asarray(jax.device_get(out)).ravel()[0])  # true completion
    times.append(time.perf_counter() - t0)
  return float(min(times))


def bench_elementwise_reduce(n: int = 16384, k_inner: int = 20):
  """Config 1: fused ``(ones + b*2).sum()`` — read b once per iteration."""
  import jax
  import jax.numpy as jnp
  from jax import lax

  import spartan_tpu as sp
  sp.initialize(["--log_level=40"])

  dt = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
  b = sp.from_numpy(
      np.random.default_rng(0).random((n, n), dtype=np.float32).astype(dt)
  ).evaluate().data

  # verify the expr layer emits this exact fused region (correctness tie-in)
  expr_val = float((sp.ones((n, n), dtype=dt) + sp.Val(b) * 2.0).sum()
                   .glom())

  @jax.jit
  def loop(b):
    def body(i, carry):
      # carry*1e-30 keeps a data dependence; abs() blocks algebraic
      # re-association, so every iteration re-reads b in full
      return jnp.sum(jnp.abs(1.0 + (b + carry * 1e-30) * 2.0),
                     dtype=jnp.float32)
    return lax.fori_loop(0, k_inner, body, jnp.zeros((), jnp.float32))

  sec = _run_loop(loop, b) / k_inner
  # sanity: the loop body computes the same value as the expr region
  assert abs(float(loop(b)) - expr_val) / max(abs(expr_val), 1) < 1e-3

  bytes_moved = n * n * np.dtype(dt).itemsize
  gbps = bytes_moved / sec / 1e9
  roof = _lookup(jax.devices()[0], _ROOFLINE_GBPS, 50.0)
  return {
      "metric": "fused elementwise+reduce bandwidth (config 1, 16384^2 f32)",
      "value": round(gbps, 2),
      "unit": "GB/s",
      "vs_baseline": round(gbps / roof, 4),
  }


def bench_elementwise_pallas(n: int = 16384, k_inner: int = 20):
  """Config 1 via the framework's Pallas fused_reduce lowering — the same
  kernel ``ReduceExpr._try_pallas_full_sum`` emits for
  ``(ones + b*2).sum()``; the carry rides the SMEM scalar path so every
  iteration re-reads b (measured ~776 GB/s ≈ 95 % of v5e roofline)."""
  import jax
  import jax.numpy as jnp
  from jax import lax

  import spartan_tpu as sp
  from spartan_tpu.backend.kernels import fused_reduce
  sp.initialize(["--log_level=40"])

  host_b = np.random.default_rng(0).random((n, n), dtype=np.float32)
  b = jnp.asarray(host_b)
  _stamp("data on device")

  # After the affine-reduce rewrite the framework emits
  #   sum(1 + b*2) ≡ 2·sum(b) + n²  — a PURE sum kernel + scalar epilogue.
  # The kernel under test is that pure sum; the carry (one extra VPU add,
  # needed so the loop can't be hoisted) is the only overhead.
  def f(v, c):
    return v + c * 1e-30

  @jax.jit
  def loop(b):
    def body(i, carry):
      s = fused_reduce.fused_sum(b, f, scalars=(carry,))
      return 2.0 * s + float(n) * n * 1e-30 + 0.0 * carry
    return lax.fori_loop(0, k_inner, body, jnp.zeros((), jnp.float32))

  sec = _run_loop(loop, b) / k_inner
  _stamp("timed")
  # correctness: one expr-layer eval of the real config-1 chain vs the
  # host oracle (cheap at this size thanks to the affine rewrite)
  expected = n * n + 2.0 * host_b.astype(np.float64).sum()
  expr_val = float((sp.ones((n, n), dtype=jnp.float32)
                    + sp.Val(b) * 2.0).sum().glom())
  assert abs(expr_val - expected) / abs(expected) < 1e-3
  _stamp("verified vs host oracle")

  gbps = n * n * 4 / sec / 1e9
  roof = _lookup(jax.devices()[0], _ROOFLINE_GBPS, 50.0)
  return {
      "metric": "fused elementwise+reduce bandwidth (config 1, 16384^2 "
                "f32, Pallas kernel)",
      "value": round(gbps, 2),
      "unit": "GB/s",
      "vs_baseline": round(gbps / roof, 4),
  }


def bench_matmul(n: int = 8192, k_inner: int = 8):
  """Config 2 (single-chip proxy): bf16 matmul TFLOP/s vs MXU peak."""
  import jax
  import jax.numpy as jnp
  from jax import lax

  rng = np.random.default_rng(0)
  on_cpu = jax.devices()[0].platform == "cpu"
  dt = jnp.float32 if on_cpu else jnp.bfloat16
  a = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)).astype(dt)
  b = jnp.asarray(rng.standard_normal((n, n)).astype(np.float32)).astype(dt)

  @jax.jit
  def loop(a, b):
    def body(i, carry):
      scaled = a * (1.0 + carry * 1e-30).astype(dt)
      out = jnp.matmul(scaled, b, preferred_element_type=jnp.float32)
      # depend on EVERY output element — out[0,0] alone lets XLA slice the
      # matmul down to a single dot product
      return jnp.sum(out) * 1e-30
    return lax.fori_loop(0, k_inner, body, jnp.zeros((), jnp.float32))

  sec = _run_loop(loop, a, b) / k_inner
  tflops = 2 * n ** 3 / sec / 1e12
  peak = _lookup(jax.devices()[0], _MXU_PEAK_BF16, 1.0)
  return {"metric": f"dot {n}^2 {'f32' if on_cpu else 'bf16'}",
          "value": round(tflops, 2), "unit": "TFLOP/s",
          "vs_baseline": None if on_cpu else round(tflops / peak, 4)}


def main():
  import jax
  on_cpu = None
  try:
    on_cpu = jax.devices()[0].platform == "cpu"
  except Exception:
    on_cpu = True
  result = None
  if not on_cpu:
    try:
      result = bench_elementwise_pallas()
    except Exception as e:  # Mosaic rejection → XLA fallback is the number
      print(json.dumps({"metric": "pallas path failed, falling back",
                        "error": str(e)[:200]}), file=sys.stderr)
  if result is None:
    result = bench_elementwise_reduce()
  if "--all" in sys.argv:
    print(json.dumps(bench_elementwise_reduce()), file=sys.stderr)
    print(json.dumps(bench_matmul()), file=sys.stderr)
  print(json.dumps(result))


if __name__ == "__main__":
  main()
