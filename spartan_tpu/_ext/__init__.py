"""Native extension package: extent geometry + CSR merge fast paths.

Builds with ``python -m spartan_tpu._ext.build``; every consumer has a
pure-Python fallback when the .so is absent.
"""

import importlib

try:
  # import_module (not ``from . import``): after a failed first attempt the
  # package attribute is None, and ``from X import Y`` would bind that stale
  # attribute on reload instead of retrying the submodule import.
  _extent_c = importlib.import_module("spartan_tpu._ext._extent_c")
  HAVE_NATIVE = True
except ImportError:
  _extent_c = None  # type: ignore
  HAVE_NATIVE = False
