"""Heavy differential fuzz sweep (run manually / by the driver).

Extends tests/test_fuzz.py's generator with deeper DAGs, mixed dtypes
(f32/i32/f64 enter the same program), random reductions at the root, and
re-evaluation of a structurally identical rebuild (exercising the
fast-lane and fn_key caches).  Usage::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/fuzz_heavy.py [n_seeds] [depth]
"""

import sys

import numpy as np


def main(n_seeds: int = 300, depth: int = 5) -> int:
  import jax
  jax.config.update("jax_platforms", "cpu")
  jax.config.update("jax_enable_x64", True)
  import spartan_tpu as sp
  sp.initialize(["--log_level=30"])
  sys.path.insert(0, "tests")
  from test_fuzz import _gen_program, _REDUCE

  bad = 0
  for seed in range(n_seeds):
    rng = np.random.default_rng(seed)
    shape = (int(rng.integers(2, 9)), int(rng.integers(2, 9)))
    se, ne = _gen_program(rng, depth, shape)
    # random dtype cast mixed in
    if rng.integers(0, 3) == 0:
      se, ne = se.astype(np.float32), ne.astype(np.float32)
      se, ne = se * 2, ne * np.float64(2)  # weak vs strong probe varies
      ne = ne.astype(np.float64) if ne.dtype == np.float64 else ne
    # random reduce at the root
    _, sred, nred = _REDUCE[rng.integers(0, len(_REDUCE))]
    try:
      got = np.asarray(sred(se).glom(), dtype=np.float64)
      want = np.asarray(nred(np.asarray(ne, dtype=got.dtype)),
                        dtype=np.float64)
    except Exception as exc:  # generation may produce invalid axes
      print(f"seed {seed}: EXC {type(exc).__name__}: {exc}")
      bad += 1
      continue
    if not np.allclose(got, want, rtol=1e-6, atol=1e-6):
      print(f"seed {seed}: MISMATCH maxdiff="
            f"{np.abs(got - want).max():.3e} shape={shape}")
      bad += 1
  print(f"fuzz_heavy: {n_seeds - bad}/{n_seeds} ok")
  return 1 if bad else 0


if __name__ == "__main__":
  n = int(sys.argv[1]) if len(sys.argv) > 1 else 300
  d = int(sys.argv[2]) if len(sys.argv) > 2 else 5
  raise SystemExit(main(n, d))
