"""Flag-permutation matrix: core tests must pass under every optimizer /
backend toggle (semantics are flag-independent; flags trade speed only).

Found real bugs before (checkpoint restores silently skipped under
``--optimization=0``).  Usage::

    python tools/flag_matrix.py
"""

import os
import subprocess
import sys

MATRIX = [
    {"SPARTAN_OPTIMIZATION": "0"},
    {"SPARTAN_OPT_FUSION": "0"},
    {"SPARTAN_OPT_REDUCE_FUSION": "0"},
    {"SPARTAN_OPT_AFFINE_REDUCE": "0"},
    {"SPARTAN_OPT_CONST_FOLD": "0"},
    {"SPARTAN_OPT_AUTO_TILING": "0"},
    {"SPARTAN_OPT_SMART_TILING": "0"},
    {"SPARTAN_SMART_TILING_MAX_NODES": "4"},   # forces the heuristic fallback
    {"SPARTAN_USE_PALLAS": "0"},
    {"SPARTAN_PALLAS_INTERPRET": "1"},
    {"SPARTAN_CHUNK_EVAL_THRESHOLD": "50"},
    {"SPARTAN_MAX_FUSED_KERNEL_OPS": "4"},
    {"SPARTAN_OPT_FUSION": "0", "SPARTAN_OPT_REDUCE_FUSION": "0"},
    {"SPARTAN_OPTIMIZATION": "0", "SPARTAN_CHUNK_EVAL_THRESHOLD": "50"},
]

TESTS = ["tests/test_arithmetic.py", "tests/test_reduce.py",
         "tests/test_integration.py", "tests/test_deep_chains.py",
         "tests/test_promotion.py"]


def main() -> int:
  root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  failures = 0
  for combo in MATRIX:
    env = dict(os.environ, **combo)
    r = subprocess.run([sys.executable, "-m", "pytest", "-q", *TESTS],
                       cwd=root, env=env, capture_output=True, text=True,
                       timeout=600)
    tag = " ".join(f"{k}={v}" for k, v in combo.items())
    last = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "?"
    print(f"[{tag}] {last}")
    if r.returncode != 0:
      failures += 1
  print("RESULT:", "PASS" if not failures else f"FAIL ({failures} combos)")
  return 1 if failures else 0


if __name__ == "__main__":
  raise SystemExit(main())
