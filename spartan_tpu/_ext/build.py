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


def build(verbose: bool = True) -> str:
  here = os.path.dirname(os.path.abspath(__file__))
  src = os.path.join(here, "extent_ext.c")
  suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
  out = os.path.join(here, "_extent_c" + suffix)
  include = sysconfig.get_paths()["include"]
  cmd = [
      os.environ.get("CC", "gcc"), "-O3", "-shared", "-fPIC",
      "-o", out, src, f"-I{include}",
  ]
  if verbose:
    print(" ".join(cmd))
  subprocess.run(cmd, check=True)
  return out


if __name__ == "__main__":
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
