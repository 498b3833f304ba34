"""Build the native extension in-place with the running interpreter's
toolchain (no pip): ``python -m spartan_tpu._ext.build``.

The package degrades gracefully when the .so is absent — pure-Python
fallbacks cover every entry point (SURVEY.md §2.2 build rule).
"""

from __future__ import annotations

import os
import subprocess
import sys
import sysconfig


def build(verbose: bool = True, asan: bool = False) -> str:
  here = os.path.dirname(os.path.abspath(__file__))
  src = os.path.join(here, "extent_ext.c")
  suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
  name = "_extent_c_asan" if asan else "_extent_c"
  out = os.path.join(here, name + suffix)
  include = sysconfig.get_paths()["include"]
  cmd = [os.environ.get("CC", "gcc"), "-O3", "-shared", "-fPIC",
         "-o", out, src, f"-I{include}"]
  if asan:
    cmd += ["-fsanitize=address", "-fno-omit-frame-pointer", "-g"]
  if verbose:
    print(" ".join(cmd))
  subprocess.run(cmd, check=True)
  return out


def asan_check() -> None:
  """Build with AddressSanitizer and stress the extension under it (the
  CI race/memory-safety config promised for native code — SURVEY.md §5).
  Re-execs the interpreter with libasan preloaded."""
  if os.environ.get("_SPARTAN_ASAN_CHILD") != "1":
    build(asan=True)
    libasan = subprocess.run(
        [os.environ.get("CC", "gcc"), "-print-file-name=libasan.so"],
        capture_output=True, text=True, check=True).stdout.strip()
    env = dict(os.environ,
               LD_PRELOAD=libasan,
               ASAN_OPTIONS="detect_leaks=0",  # CPython arenas leak by design
               _SPARTAN_ASAN_CHILD="1")
    r = subprocess.run([sys.executable, "-m", "spartan_tpu._ext.build",
                        "--asan-child"], env=env)
    sys.exit(r.returncode)
  # --- child: import the ASAN .so directly and stress it ---
  import importlib.util
  here = os.path.dirname(os.path.abspath(__file__))
  suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
  # module init symbol is PyInit__extent_c — the spec name must match it
  spec = importlib.util.spec_from_file_location(
      "_extent_c", os.path.join(here, "_extent_c_asan" + suffix))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  import random
  rnd = random.Random(0)
  for _ in range(2000):
    nd = rnd.randint(1, 4)
    a = tuple(rnd.randint(0, 50) for _ in range(nd))
    b = tuple(x + rnd.randint(1, 50) for x in a)
    c = tuple(rnd.randint(0, 50) for _ in range(nd))
    d = tuple(x + rnd.randint(1, 50) for x in c)
    mod.intersect((a, b), (c, d))
  tiles = [((i, 0), (i + 5, 10)) for i in range(0, 500, 5)]
  for _ in range(200):
    mod.find_overlapping(tiles, ((rnd.randint(0, 400), 0),
                                 (rnd.randint(401, 500), 10)))
  for _ in range(200):
    n = rnd.randint(1, 30)
    rows = sorted(rnd.randint(0, n - 1) for _ in range(rnd.randint(0, 40)))
    # build two valid CSRs over (n, 20)
    def mk():
      indptr = [0]
      indices, data = [], []
      for r in range(n):
        cols = sorted(set(rnd.randint(0, 19)
                          for _ in range(rnd.randint(0, 6))))
        indices.extend(cols)
        data.extend(float(c) for c in cols)
        indptr.append(len(indices))
      return indptr, indices, data
    ia, ja, va = mk()
    ib, jb, vb = mk()
    mod.csr_merge(ia, ja, va, ib, jb, vb, 20)
  print("ASAN stress: OK (no reports)")


if __name__ == "__main__":
  if "--asan" in sys.argv or "--asan-child" in sys.argv:
    asan_check()
    sys.exit(0)
  path = build()
  print("built", path)
  # smoke (the package was imported pre-build with the .so absent: reload)
  import importlib
  importlib.invalidate_caches()
  import spartan_tpu._ext as ext_pkg
  importlib.reload(ext_pkg)
  assert ext_pkg._extent_c.intersect(((0, 0), (4, 4)), ((2, 2), (6, 6))) == \
      ((2, 2), (4, 4))
  print("smoke ok")
