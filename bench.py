"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric (BASELINE.md config 1): tiled elementwise+reduce bandwidth
over a 16384² f32 array, in GB/s against the chip's HBM roofline
(north-star target ≥0.90).  The framework's optimizer strength-reduces the
config-1 chain ``(ones + b*2).sum()`` to ``2·sum(b) + n²`` (affine-reduce
rewrite), so the measured computation is exactly what
``spartan_tpu``'s evaluator emits.

Timing methodology — **slope timing**: the body runs K times inside one
jitted ``fori_loop``; wall time is taken at two K values and the
per-iteration cost is the marginal slope.  This cancels the fixed
per-dispatch constant (tens of ms through a tunneled TPU) without putting
a data dependence inside the hot loop (which would add VPU work and
under-measure bandwidth).  A hoist guard rejects the slope if XLA moved
the loop-invariant body out of the loop (slope ≈ 0 → fall back to a
carry-dependent formulation).

Resilience architecture (round 3) — the tunnel's remote compile service
swings ~0.4 s ↔ ~10 min per program and the per-process service session
setup alone can cost minutes, so a monolithic run can burn the whole
driver budget before producing a single number (that is exactly what
BENCH_r02 recorded).  This file is now two programs in one:

* **orchestrator** (``python bench.py``): never touches jax.  Spawns ONE
  worker subprocess that runs all stages sequentially (paying the service
  session setup once), reads a JSON line per completed stage, and
  accumulates metrics incrementally.  A stalled worker (no line within
  the stage deadline) is killed and the remaining stages get ONE retry in
  a fresh process — observed to re-roll the compile-service weather.
  SIGTERM/SIGINT/self-SIGALRM all emit the partial result; an empty BENCH
  record is worse than a partial one.
* **worker** (``python bench.py --worker``): runs the requested stages,
  each under its own SIGALRM deadline so one stalled remote compile skips
  to the next stage instead of sinking the process; two consecutive
  stalls end the worker (the session is bad — let the parent re-roll).

The first stage is config 1 at 4096² — a fast provisional bandwidth
number — then the full 16384² run overwrites it.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np

_ROOFLINE_GBPS = {
    "v5 lite": 819.0, "v5e": 819.0, "v5p": 2765.0, "v4": 1228.0,
    "v6": 1640.0, "cpu": 50.0,
}
_MXU_PEAK_BF16 = {"v5 lite": 197.0, "v5e": 197.0, "v5p": 459.0,
                  "v4": 275.0, "v6": 918.0}

_T0 = time.time()


def _stamp(msg: str) -> None:
  print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr)


# Phase attribution (VERDICT r3 weak #1): a stalled capture used to show
# "stage start at +0.0s, death at +440s" with nothing between — chip-claim
# stalls, service-session stalls, and compile stalls were
# indistinguishable.  The worker emits one JSON event per phase boundary;
# the orchestrator folds them into ``bench_diag.phases`` so even a killed
# worker leaves an attributable trail.
_PHASE_MODE = [False]   # worker-only: emit JSON phase events on stdout
_CUR_STAGE = [""]


def _phase(name: str) -> None:
  _stamp(f"phase: {name}")
  if _PHASE_MODE[0]:
    tag = f"{_CUR_STAGE[0]}:{name}" if _CUR_STAGE[0] else name
    print(json.dumps({"event": "phase", "phase": tag,
                      "t": round(time.time() - _T0, 1)}), flush=True)


def _lookup(device, table, default) -> float:
  kind = getattr(device, "device_kind", "cpu").lower()
  for key, v in table.items():
    if key in kind:
      return v
  return default


def _sync(x) -> float:
  import jax
  return float(np.asarray(jax.device_get(x)).ravel()[0])


_INITIALIZED = False


def _ensure_init() -> None:
  global _INITIALIZED
  if not _INITIALIZED:
    import spartan_tpu as sp
    _phase("imports-done")
    sp.initialize(["--log_level=40"])  # first backend use = chip claim
    _INITIALIZED = True
    _phase("backend-init-done(chip-claimed)")


def _slope_time(make_loop, k_lo: int = 8, k_hi: int = 40,
                reps: int = 3, floor: float = 0.0):
  """Marginal per-iteration seconds of ``make_loop(k)``.  ``k`` is a
  traced fori_loop bound, so ONE compile serves both K values.

  Robust over N reps: timing noise through the tunnel is additive and
  positive, so ``min`` over reps of each endpoint converges to the true
  floor and the slope ``(min t_hi − min t_lo)/Δk`` is the defensible
  estimate.  (Taking the best of per-rep PAIR slopes instead is biased
  upward — one fast-noise t_hi sample yields an impossible >roofline
  figure; measured 148 % of roofline that way.)  ``floor`` is the
  physically-impossible threshold callers use for the hoist guard."""
  del floor  # callers apply their own plausibility checks on the result
  lo, hi = make_loop(k_lo), make_loop(k_hi)
  _sync(lo())
  _sync(hi())  # same compiled program, different k operand
  _phase("loop-compiled+warm")
  t_lo, t_hi = [], []
  for _ in range(reps):
    t0 = time.perf_counter()
    _sync(lo())
    t_lo.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    _sync(hi())
    t_hi.append(time.perf_counter() - t0)
  slope = (min(t_hi) - min(t_lo)) / (k_hi - k_lo)
  _phase("measured")
  return slope, min(t_lo), min(t_hi)


def bench_elementwise_reduce(n: int = 16384):
  """Config 1: the framework-emitted pure sum (post affine rewrite)."""
  import jax
  import jax.numpy as jnp
  from jax import lax

  _ensure_init()

  # generate the operand ON device — pushing 1 GB through the tunnel
  # costs ~90 s at current bandwidth and bandwidth-of-sum doesn't care
  # about the values
  b = jax.jit(lambda: jax.random.uniform(
      jax.random.key(0), (n, n), jnp.float32))()
  jax.block_until_ready(b)
  _phase(f"data-on-device({n}^2,first-service-request-done)")

  @jax.jit
  def loop(b, k):
    def body(i, c):
      # optimization_barrier ties the input to the loop carry with ZERO
      # per-element work: hoist-proof without polluting the measured chain
      b2, c2 = lax.optimization_barrier((b, c))
      return 2.0 * jnp.sum(b2, dtype=jnp.float32) + float(n) * n + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

  bytes_moved = n * n * 4
  floor = bytes_moved / 2000e9  # a slope below this implies >2 TB/s
  slope, t_lo, t_hi = _slope_time(lambda k: (lambda: loop(b, k)),
                                  k_lo=8, k_hi=104, reps=12)
  # hoist guard: if XLA hoisted the invariant body, the slope collapses
  hoisted = slope < floor
  if hoisted:
    _stamp("HOIST DETECTED — falling back to carry-dependent body")

    @jax.jit
    def loop2(b, k):
      def body(i, c):
        return jnp.sum(b + c * 1e-30, dtype=jnp.float32)
      return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

    slope, t_lo, t_hi = _slope_time(lambda k: (lambda: loop2(b, k)))
  _stamp(f"slope={slope*1e3:.3f} ms/iter (t_lo={t_lo*1e3:.1f} t_hi={t_hi*1e3:.1f})")

  gbps = bytes_moved / slope / 1e9
  roof = _lookup(jax.devices()[0], _ROOFLINE_GBPS, 50.0)
  return {
      "metric": f"fused elementwise+reduce bandwidth (config 1, {n}^2 f32)",
      "value": round(gbps, 2),
      "unit": "GB/s",
      "vs_baseline": round(gbps / roof, 4),
  }


def bench_verify() -> dict:
  """Framework correctness: the real expr-layer config-1 chain vs the
  host oracle.  Small n — the semantics check doesn't need the bench
  size, and a full-size pass costs a second region compile (~100 s
  through the tunnel's remote compile service) that once timed the whole
  bench out.  Runs as its own stage so a compile stall here cannot block
  the perf numbers."""
  import jax.numpy as jnp

  import spartan_tpu as sp
  _ensure_init()

  nv = 2048
  host_v = np.random.default_rng(1).random((nv, nv), dtype=np.float32)
  expected = nv * nv + 2.0 * host_v.astype(np.float64).sum()
  expr_val = float((sp.ones((nv, nv), dtype=jnp.float32)
                    + sp.Val(jnp.asarray(host_v)) * 2.0).sum().glom())
  assert abs(expr_val - expected) / abs(expected) < 1e-3
  _stamp("verified vs host oracle")
  return {"framework_verified": True}


def bench_nonaffine_pallas(n: int = 16384):
  """Non-affine chain ``sum(abs(1+2b))`` via the Pallas fused_reduce
  kernel (the path used when the chain can't be strength-reduced)."""
  import jax
  import jax.numpy as jnp
  from jax import lax
  from spartan_tpu.backend.kernels import fused_reduce

  b = jnp.asarray(np.random.default_rng(0).random((n, n), dtype=np.float32))

  @jax.jit
  def loop(b, k):
    def body(i, c):
      b2, c2 = lax.optimization_barrier((b, c))
      return fused_reduce.fused_sum(
          b2, lambda v: jnp.abs(1.0 + v * 2.0)) + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

  slope, _, _ = _slope_time(lambda k: (lambda: loop(b, k)))
  gbps = n * n * 4 / slope / 1e9
  roof = _lookup(jax.devices()[0], _ROOFLINE_GBPS, 50.0)
  return {"nonaffine_pallas_gbps": round(gbps, 2),
          "nonaffine_vs_roofline": round(gbps / roof, 4)}


def bench_matmul(n: int = 8192):
  """Config 2 (single-chip proxy): bf16 matmul TFLOP/s vs MXU peak."""
  import jax
  import jax.numpy as jnp
  from jax import lax

  on_cpu = jax.devices()[0].platform == "cpu"
  dt = jnp.float32 if on_cpu else jnp.bfloat16
  a, b = jax.jit(lambda: tuple(
      jax.random.normal(jax.random.key(i), (n, n), jnp.float32).astype(dt)
      for i in (0, 1)))()
  jax.block_until_ready(b)

  @jax.jit
  def loop(a, b, k):
    def body(i, c):
      a2, c2 = lax.optimization_barrier((a, c))
      out = jnp.matmul(a2, b, preferred_element_type=jnp.float32)
      return jnp.sum(out) * 1e-30 + 0.0 * c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))

  # delta = 24 iters x ~5.7 ms = ~140 ms signal: session-to-session spread
  # at delta=8 (46 ms) was 180-190 TFLOP/s — pure tunnel timing noise
  slope, _, _ = _slope_time(lambda k: (lambda: loop(a, b, k)),
                            k_lo=4, k_hi=28, reps=6)
  tflops = 2 * n ** 3 / slope / 1e12
  peak = _lookup(jax.devices()[0], _MXU_PEAK_BF16, 1.0)
  return {"dot_tflops": round(tflops, 2),
          "dot_vs_mxu_peak": None if on_cpu else round(tflops / peak, 4)}


def _fori_slope_ms(run_fn, sync_result, k_lo: int, k_hi: int,
                   reps: int = 3) -> float:
  """Per-iteration ms of a framework ``make_fori`` handle (one compile,
  two iteration counts — same methodology as :func:`_slope_time`)."""
  sync_result(run_fn(k_lo))
  sync_result(run_fn(k_hi))
  _phase("loop-compiled+warm")
  t_lo, t_hi = [], []
  for _ in range(reps):
    t0 = time.perf_counter()
    sync_result(run_fn(k_lo))
    t_lo.append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    sync_result(run_fn(k_hi))
    t_hi.append(time.perf_counter() - t0)
  _phase("measured")
  return max((min(t_hi) - min(t_lo)) / (k_hi - k_lo), 0.0) * 1e3


def bench_linreg_step(n: int = 1 << 20, d: int = 64) -> dict:
  """Config 3: framework gradient-descent step (sp.make_fori over the
  example's gradient_step expr) — ms/step."""
  import spartan_tpu as sp
  from spartan_tpu.examples import linear_reg
  _ensure_init()

  # data generated on device via the framework (a 256 MB host push costs
  # ~25 s of tunnel bandwidth and the step time doesn't care)
  X = sp.lazify(sp.randn(n, d).astype(np.float32).evaluate())
  y = sp.lazify(sp.randn(n).astype(np.float32).evaluate())
  run = sp.make_fori(lambda w: linear_reg.gradient_step(X, y, w, 1e-4),
                     sp.from_numpy(np.zeros(d, np.float32)))
  # delta = 92 iters x ~0.5 ms = ~46 ms signal (was 20 x 0.5 = 10 ms,
  # below the tunnel noise floor — spread 0.48-0.84 ms across sessions)
  ms = _fori_slope_ms(run, lambda r: _sync(r.data), 4, 96, reps=6)
  return {"linreg_step_ms": round(ms, 4)}


def bench_kmeans_step(n: int = 1 << 19, d: int = 64, k: int = 64) -> dict:
  """Config 4: framework k-means step (distance map + argmin + one-hot
  MXU segment-sum centroid update) — ms/step."""
  import spartan_tpu as sp
  from spartan_tpu.examples import kmeans
  _ensure_init()

  rng = np.random.default_rng(0)
  pts = sp.lazify(sp.randn(n, d).astype(np.float32).evaluate())

  def body(c):
    return kmeans.update_centers(pts, kmeans.assign_labels(pts, c), k)

  run = sp.make_fori(body, sp.from_numpy(
      rng.standard_normal((k, d)).astype(np.float32)))
  # wide k-range: the ~0.07-0.14 ms step needs a big iteration delta to
  # rise above tunnel timing noise (2..8 measured 0.0 once; 8..64 = ~4 ms
  # signal still swung 0.05-0.18 ms across sessions)
  ms = _fori_slope_ms(run, lambda r: _sync(r.data), 8, 512, reps=6)
  return {"kmeans_step_ms": round(ms, 4)}


def bench_pagerank_step(n_blocks: int = 64, blocks_per_row: int = 8,
                        bs: int = 128) -> dict:
  """Config 5: framework sparse PageRank step (spmv_expr + damping in
  sp.make_fori).  Block-structured adjacency → auto-routed to the MXU
  block-ELL path; returns {step ms, effective Gnnz/s}."""
  import scipy.sparse as ss

  import spartan_tpu as sp
  from spartan_tpu.backend import sparse as sps
  _ensure_init()

  rng = np.random.default_rng(0)
  n = n_blocks * bs
  rows_b = np.repeat(np.arange(n_blocks), blocks_per_row)
  cols_b = rng.integers(0, n_blocks, n_blocks * blocks_per_row)
  data = rng.random((n_blocks * blocks_per_row, bs, bs)).astype(np.float32)
  A = ss.bsr_matrix((data, cols_b, np.arange(n_blocks + 1) * blocks_per_row),
                    shape=(n, n)).tocsr()
  A = A @ ss.diags(1.0 / np.maximum(np.asarray(A.sum(axis=0)).ravel(), 1e-9))
  S = sps.from_scipy(A.tocsr(), dtype=np.float32)
  nnz = S.nnz

  r0 = sp.ones((n,), dtype=np.float32) / n
  run = sp.make_fori(
      lambda r: sps.spmv_expr(S, r) * 0.85 + 0.15 / n, r0)
  # the ~0.015-0.1 ms step needs a wide iteration delta to rise above
  # tunnel timing noise (4..24 once measured 0.0; 8..200 = ~3-10 ms
  # signal still swung 0.015-0.05 ms across sessions)
  ms = _fori_slope_ms(run, lambda r: _sync(r.data), 8, 2048, reps=6)
  return {"pagerank_step_ms": round(ms, 4),
          "pagerank_gnnz_per_s": round(nnz / (ms * 1e-3) / 1e9, 2)
          if ms > 0 else None}


def bench_spmm_dense(n: int = 16384, k: int = 64,
                     density: float = 5e-3) -> dict:
  """--all extra: the r3 densified sparse route — unstructured sparse ×
  dense via one MXU matmul (HBM-bound read of the f32 densified A)."""
  import scipy.sparse as ssp

  import jax
  import jax.numpy as jnp
  from spartan_tpu.backend import sparse as sps
  _ensure_init()

  A = ssp.random(n, n, density=density,
                 random_state=np.random.RandomState(7), format="csr",
                 dtype=np.float32)
  S = sps.from_scipy(A, dtype=np.float32)
  B = jax.jit(lambda: jax.random.normal(
      jax.random.key(1), (n, k), jnp.float32))()
  Ad = S.to_densified()
  Ad.block_until_ready()
  _stamp("densified A on device")

  from jax import lax

  # Ad MUST be a jit argument, not a closure capture: a closed-over array
  # becomes an HLO constant and the 1 GB request body 413s the tunnel's
  # remote compile service (same failure mode as make_spmv_windowed's
  # closure constants — CLAUDE.md)
  @jax.jit
  def loop(Ad, B, kk):
    def body(i, c):
      B2, c2 = lax.optimization_barrier((B, c))
      out = jnp.matmul(Ad, B2, preferred_element_type=jnp.float32)
      return jnp.sum(out) * 1e-30 + 0.0 * c2
    return lax.fori_loop(0, kk, body, jnp.zeros((), jnp.float32))

  slope, _, _ = _slope_time(lambda kk: (lambda: loop(Ad, B, kk)),
                            k_lo=4, k_hi=20, reps=4)
  return {"spmm_dense_gnnz_per_s": round(S.nnz / slope / 1e9, 3)}


def bench_stencil_padded(n: int = 8192) -> dict:
  """--all extra: the r4 pre-padded-storage stencil (heat/Jacobi step as
  ONE streaming pass — no per-step pad pass).  Effective GB/s counts
  useful traffic (read n² + write n² f32); roofline for r+w streaming is
  ~592-660 GB/s on v5e (BASELINE.md stencil campaign)."""
  import jax
  import jax.numpy as jnp
  from spartan_tpu.backend.kernels import stencil_pallas as stp
  _ensure_init()

  coeffs = (0.0, 0.1, 0.0, 0.1, 0.6, 0.1, 0.0, 0.1, 0.0)
  x = jax.jit(lambda: jax.random.uniform(
      jax.random.key(0), (n, n), jnp.float32))()
  xp = stp.to_padded(x)
  buf = jnp.zeros_like(xp)
  jax.block_until_ready((xp, buf))
  _phase("padded state on device")
  interpret = jax.devices()[0].platform == "cpu"

  def run_k(k):
    out = stp.stencil3x3_padded(xp, buf, coeffs, steps=k,
                                interpret=interpret)
    jax.block_until_ready(out)

  # NOT _slope_time: its _sync device_gets the result (fine for the
  # scalar fori outputs; here the result is a full padded array — a
  # ~270 MB tunnel fetch per reap).  Same two-K/min-over-reps method,
  # block_until_ready only; slope floored at 0 like _fori_slope_ms.
  k_lo, k_hi = 4, 12
  run_k(k_lo)
  run_k(k_hi)
  _phase("loop-compiled+warm")
  t_lo, t_hi = [], []
  for _ in range(4):
    t0 = time.perf_counter(); run_k(k_lo)
    t_lo.append(time.perf_counter() - t0)
    t0 = time.perf_counter(); run_k(k_hi)
    t_hi.append(time.perf_counter() - t0)
  per_app = max((min(t_hi) - min(t_lo)) / (k_hi - k_lo), 1e-9)
  gbps = 2 * n * n * 4 / per_app / 1e9
  _phase("measured")
  return {"stencil_padded_gbps": round(gbps, 1),
          "stencil_padded_ms_per_app": round(per_app * 1e3, 3)}


def _enable_compile_cache():
  """Persistent XLA compile cache in-repo: compiles through the tunnel's
  remote compile service can cost minutes cold; priming the cache once
  makes every later bench run (incl. the driver's) hit warm compiles."""
  import jax
  cache_dir = os.environ.get("SPARTAN_JAX_CACHE",
                             "/root/repo/.jax_cache")
  try:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # persist EVERYTHING: the tunnel's remote compile service swings from
    # ~0.4 s (warm) to ~10 min (cold) for the same program — a fast first
    # compile must still seed the cache or a later cold-service run pays
    # the full price
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
  except Exception as e:  # cache is best-effort — never fail the bench
    _stamp(f"compile cache unavailable: {e!r:.120}")


# ---------------------------------------------------------------------------
# Stage registry.  Order matters: the orchestrator runs them in sequence and
# assembles the final record in this order, so ``c1_full`` overwrites
# ``c1_small``'s provisional primary metric whenever both complete —
# regardless of which worker attempt produced which.
# ---------------------------------------------------------------------------

STAGES = {
    "c1_small": lambda: bench_elementwise_reduce(4096),
    "c1_full": lambda: bench_elementwise_reduce(16384),
    "dot": bench_matmul,
    "linreg": bench_linreg_step,
    "kmeans": bench_kmeans_step,
    "pagerank": bench_pagerank_step,
    "verify": bench_verify,
    "nonaffine": bench_nonaffine_pallas,   # --all only
    "spmm_dense": bench_spmm_dense,        # --all only
    "stencil": bench_stencil_padded,       # --all only
}
# c1_full FIRST: the per-session first-program service cost (minutes on
# bad days, cache hit or not — measured 456 s for a cached executable)
# dominates whichever stage runs first, so the stage that absorbs it
# should be the headline 16384² metric, not the 4096² provisional.  The
# provisional still runs second (seconds when the session is warm) and
# the registry-order assembly keeps c1_full's values on top.
DEFAULT_PLAN = ["c1_full", "c1_small", "dot", "linreg", "kmeans",
                "pagerank", "verify"]


class _StageTimeout(Exception):
  pass


def worker_main(stage_names, timeouts) -> int:
  """Run stages sequentially; one JSON line per stage on stdout.

  Each stage runs under its own SIGALRM deadline — the alarm interrupts a
  blocked remote-compile call (validated in round 2's partial-emit path)
  so one stalled stage costs its own deadline, not the process.  Two
  consecutive stalls mean the service session itself is bad: exit so the
  orchestrator can retry in a fresh process (fresh session re-rolls the
  weather)."""

  def _on_alarm(signum, frame):
    raise _StageTimeout()

  if os.environ.get("SPARTAN_BENCH_CPU"):
    # testing escape: the axon plugin force-selects the TPU platform even
    # without PYTHONPATH, so orchestrator-mechanics tests need an
    # in-process override (env var alone is ignored — see CLAUDE.md)
    import jax
    jax.config.update("jax_platforms", "cpu")
  signal.signal(signal.SIGALRM, _on_alarm)
  _PHASE_MODE[0] = True
  _phase("worker-start")
  _enable_compile_cache()
  consecutive_stalls = 0
  for idx, (name, tmo) in enumerate(zip(stage_names, timeouts)):
    t0 = time.time()
    _stamp(f"stage '{name}' start (deadline {tmo}s)")
    _CUR_STAGE[0] = name
    signal.alarm(max(int(tmo), 10))
    try:
      metrics = STAGES[name]()
      signal.alarm(0)
      consecutive_stalls = 0
      print(json.dumps({"stage": name, "ok": True, "metrics": metrics,
                        "t": round(time.time() - t0, 1)}), flush=True)
      _stamp(f"stage '{name}' done in {time.time() - t0:.1f}s")
    except _StageTimeout:
      signal.alarm(0)
      consecutive_stalls += 1
      print(json.dumps({"stage": name, "ok": False, "timeout": True,
                        "error": f"stage deadline {tmo}s exceeded"}),
            flush=True)
      _stamp(f"stage '{name}' STALLED ({tmo}s)")
      if idx == 0 or consecutive_stalls >= 2:
        # a stalled FIRST stage poisons the session: the abandoned compile
        # keeps running server-side and later requests queue behind it —
        # exit so the orchestrator can use a fresh session (observed in
        # the r3 bad-weather run: the primed c1_full deserialize stalled
        # >90 s queued behind c1_small's abandoned compile)
        print(json.dumps({"event": "worker-exit",
                          "reason": "first-stage stall poisons the session"
                          if idx == 0 else
                          "two consecutive stage stalls"}), flush=True)
        return 3
    except Exception as e:
      signal.alarm(0)
      msg = repr(e)
      if ("UNAVAILABLE" in msg or "Unable to initialize backend" in msg
          or "DEADLINE_EXCEEDED" in msg):
        # chip-claim / service weather, not a code bug: report it like a
        # stall (retryable) and exit — this process's backend is dead,
        # a fresh process re-rolls the claim (r4: a failed ~25-min claim
        # used to hard-fail every remaining stage in seconds)
        print(json.dumps({"stage": name, "ok": False, "timeout": True,
                          "error": ("backend unavailable: " + msg)[:300]}),
              flush=True)
        print(json.dumps({"event": "worker-exit",
                          "reason": "backend unavailable"}), flush=True)
        _stamp(f"stage '{name}' BACKEND UNAVAILABLE — exiting worker")
        return 3
      consecutive_stalls = 0
      print(json.dumps({"stage": name, "ok": False,
                        "error": msg[:300]}), flush=True)
      _stamp(f"stage '{name}' FAILED: {e!r:.200}")
  return 0


# ---------------------------------------------------------------------------
# Orchestrator
# ---------------------------------------------------------------------------


def _spawn_worker(stages, timeouts):
  cmd = [sys.executable, os.path.abspath(__file__), "--worker",
         "--stages", ",".join(stages),
         "--timeouts", ",".join(str(int(t)) for t in timeouts)]
  return subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=sys.stderr,
                          text=True, bufsize=1)


def _reader_thread(proc, q):
  import threading

  def _read():
    try:
      for line in proc.stdout:
        q.put(line)
    finally:
      q.put(None)  # EOF sentinel

  t = threading.Thread(target=_read, daemon=True)
  t.start()
  return t


def _kill(proc):
  if proc.poll() is None:
    try:
      proc.kill()  # SIGKILL: a worker stuck in an uninterruptible remote
      proc.wait(timeout=10)  # call won't honor SIGTERM promptly anyway
    except Exception:
      pass


def _stage_timeouts(plan, time_left, first_stage_budget):
  """First stage absorbs the per-process service session setup + chip
  claim (minutes); later stages in a healthy session take seconds (warm
  cache) so 90 s is generous headroom for a mid-weather compile."""
  tmos = []
  for i, _ in enumerate(plan):
    tmos.append(first_stage_budget if i == 0 else 90)
  return tmos


def main():
  # 450 default with the backstop alarm at 480: the r2 driver captured an
  # emission at +480.1 s (BENCH_r02.json), so 480 is a known-safe latest
  # emission point; normal partial emission happens by ~budget+10.
  budget = float(os.environ.get("SPARTAN_BENCH_BUDGET", 450.0))
  deadline = _T0 + budget
  completed = {}      # stage -> metrics dict
  hard_failed = {}    # stage -> error string (exceptions: don't retry)
  stalled = []        # stages that hit a deadline (retry once)
  phases = []         # worker phase events: [phase, worker_t, arrival_t]
  emitted = []
  proc_box = [None]

  def _time_left():
    return deadline - time.time()

  def _assemble():
    result = {}
    order = [s for s in STAGES if s in completed]
    # fixed registry order: c1_full overwrites c1_small's provisional
    # primary metric whenever both landed
    for s in order:
      result.update(completed[s])
    if "value" not in result:
      result["metric"] = "fused elementwise+reduce bandwidth (config 1)"
      result["value"] = None
      result["unit"] = "GB/s"
      result["vs_baseline"] = None
      result["error"] = (
          f"no bandwidth measurement by +{time.time() - _T0:.0f}s: tunnel "
          "compile-service / chip-claim stall across "
          f"{len(stalled)} stalled stage attempts; warm-cache runs "
          "complete in <60s/stage (see BASELINE.md)")
    diag = {"completed": list(completed), "stalled": stalled,
            "failed": hard_failed, "elapsed_s": round(time.time() - _T0, 1),
            # phase trail (VERDICT r3 weak #1): [name, worker+t, orch+t] —
            # a stalled run shows exactly which boundary was never crossed
            # (no worker-start → spawn problem; no backend-init → chip
            # claim; no data-on-device → first service request/compile;
            # no loop-compiled → stage compile; no measured → measurement)
            # head (session setup) + TAIL: the boundary a late stall
            # never crossed lives at the end (code-review r4 — [:80]
            # dropped exactly the diagnostic events under retries)
            "phases": (phases if len(phases) <= 80
                       else phases[:8] + phases[-72:])}
    result["bench_diag"] = diag
    return result

  def _emit_once():
    if not emitted:
      emitted.append(True)
      print(json.dumps(_assemble()), flush=True)

  def _on_term(signum, frame):
    _stamp(f"signal {signum} — emitting partial result")
    _kill(proc_box[0]) if proc_box[0] is not None else None
    _emit_once()
    raise SystemExit(0 if any("value" in m for m in completed.values())
                     else 1)

  signal.signal(signal.SIGTERM, _on_term)
  signal.signal(signal.SIGINT, _on_term)
  # self-imposed deadline: a driver that SIGKILLs on timeout would record
  # an EMPTY line unless we emit first.
  signal.signal(signal.SIGALRM, _on_term)
  signal.alarm(max(int(budget) + 30, 120))

  import queue as queue_mod

  plan_env = os.environ.get("SPARTAN_BENCH_STAGES")
  plan = plan_env.split(",") if plan_env else list(DEFAULT_PLAN)
  if "--all" in sys.argv:
    for extra in ("nonaffine", "spmm_dense", "stencil"):
      if extra not in plan:
        plan.append(extra)

  max_attempts = 2
  for attempt in range(1, max_attempts + 1):
    remaining = [s for s in plan
                 if s not in completed and s not in hard_failed
                 and (attempt == 1 or stalled.count(s) < 2)]
    if not remaining or _time_left() < 45:
      break
    # The first stage of each worker absorbs the chip claim plus the one
    # big compile/deserialize through the remote service — observed to
    # cost up to ~7 min on bad days while every LATER program in the warm
    # session takes seconds.  Killing a slow-but-alive first compile and
    # retrying pays the same cost again in the fresh session, so give the
    # first stage nearly the whole budget rather than a fixed cap.  The
    # reserve is deliberately razor-thin (25 s): warm stages take seconds
    # each, and every abandoned first compile both loses the run AND
    # leaves a server-side zombie that clogs the NEXT session's queue
    # (observed: 325 s, then 374 s, growing with each abandoned attempt).
    first_budget = int(max(_time_left() - 25, 60))
    tmos = _stage_timeouts(remaining, _time_left(), first_budget)
    _stamp(f"attempt {attempt}: worker over {remaining} "
           f"(first-stage deadline {first_budget}s, {_time_left():.0f}s left)")
    proc = _spawn_worker(remaining, tmos)
    proc_box[0] = proc
    q = queue_mod.Queue()
    _reader_thread(proc, q)
    stage_idx = 0
    stage_started = time.time()
    worker_alive = True
    while worker_alive and stage_idx < len(remaining):
      cur_deadline = stage_started + tmos[stage_idx] + 45  # grace over the
      wait = min(cur_deadline, deadline - 10) - time.time()  # worker's own alarm
      if wait <= 0:
        _stamp(f"orchestrator deadline on stage '{remaining[stage_idx]}' "
               "— killing worker")
        stalled.append(remaining[stage_idx])
        _kill(proc)
        break
      try:
        line = q.get(timeout=wait)
      except queue_mod.Empty:
        continue  # loop re-evaluates deadlines
      if line is None:
        worker_alive = False
        break
      line = line.strip()
      if not line:
        continue
      try:
        rec = json.loads(line)
      except ValueError:
        _stamp(f"unparseable worker line: {line[:120]}")
        continue
      if rec.get("event") == "phase":
        phases.append([rec.get("phase"), rec.get("t"),
                       round(time.time() - _T0, 1)])
        continue
      if "stage" not in rec:
        continue  # worker-exit event etc.
      name = rec["stage"]
      if rec.get("ok"):
        completed[name] = rec.get("metrics", {})
        _stamp(f"stage '{name}' captured ({rec.get('t')}s)")
      elif rec.get("timeout"):
        stalled.append(name)
      else:
        hard_failed[name] = rec.get("error", "unknown")
      if name == remaining[stage_idx]:
        stage_idx += 1
        stage_started = time.time()
    _kill(proc)
    proc_box[0] = None

  signal.alarm(0)
  _emit_once()
  sys.exit(0 if any("value" in m for m in completed.values()) else 1)


def _parse_worker_argv():
  stages = timeouts = None
  argv = sys.argv
  for i, a in enumerate(argv):
    if a == "--stages":
      stages = argv[i + 1].split(",")
    elif a == "--timeouts":
      timeouts = [int(x) for x in argv[i + 1].split(",")]
  return stages, timeouts


if __name__ == "__main__":
  if "--worker" in sys.argv:
    w_stages, w_timeouts = _parse_worker_argv()
    sys.exit(worker_main(w_stages, w_timeouts))
  main()
