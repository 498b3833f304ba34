"""Benchmarks in the test tree, activated by a flag (reference: the
``benchmark_*`` functions co-located with tests, run via a runner option —
SURVEY.md §4).  Skipped unless ``SPARTAN_BENCH=1``; prints one line per
micro-benchmark.  ``SPARTAN_BENCH=1 python -m pytest tests/test_benchmarks.py -s``
"""

import os
import time

import numpy as np
import pytest

import spartan_tpu as sp

pytestmark = pytest.mark.skipif(os.environ.get("SPARTAN_BENCH") != "1",
                                reason="set SPARTAN_BENCH=1 to run")


def _time(fn, reps=5):
  fn()
  ts = []
  for _ in range(reps):
    t0 = time.perf_counter()
    fn()
    ts.append(time.perf_counter() - t0)
  return min(ts)


def benchmark(name, fn, bytes_moved=None):
  t = _time(fn)
  extra = f"  {bytes_moved / t / 1e9:6.1f} GB/s" if bytes_moved else ""
  print(f"\n[bench] {name}: {t * 1e3:8.2f} ms{extra}")


def test_benchmark_elementwise_reduce(rng):
  n = 2048
  b = sp.from_numpy(rng.random((n, n))).value
  benchmark("elementwise+reduce 2048^2",
            lambda: (sp.ones((n, n)) + sp.Val(b) * 2.0).sum().glom(),
            bytes_moved=n * n * 8)


def test_benchmark_dot(rng):
  n = 1024
  a = sp.from_numpy(rng.standard_normal((n, n))).value
  c = sp.from_numpy(rng.standard_normal((n, n))).value
  benchmark("dot 1024^2",
            lambda: sp.dot(sp.Val(a), sp.Val(c)).evaluate())


def test_benchmark_evaluator_overhead(rng):
  X = sp.from_numpy(rng.standard_normal((256, 16)))
  y = sp.from_numpy(rng.standard_normal(256))
  w = sp.from_numpy(np.zeros(16))

  def step():
    nonlocal w
    w = sp.Val((w - 0.01 * sp.dot(sp.lazify(X).T,
                                  sp.dot(X, w) - y)).evaluate())

  benchmark("linreg step (host path)", step)


def test_benchmark_fori_loop(rng):
  X = sp.from_numpy(rng.standard_normal((4096, 32)))
  y = sp.from_numpy(rng.standard_normal(4096))
  benchmark(
      "fori_loop linreg 100 iters",
      lambda: sp.fori_loop(
          100,
          lambda w: w - 0.01 * sp.dot(X.T, sp.dot(X, w) - y) * (2 / 4096),
          sp.zeros((32,))).glom())
