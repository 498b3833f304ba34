"""Native extension package: extent geometry + CSR merge fast paths.

Builds with ``python -m spartan_tpu._ext.build``; every consumer has a
pure-Python fallback when the .so is absent.
"""

try:
  from spartan_tpu._ext import _extent_c  # type: ignore  # noqa: F401
  HAVE_NATIVE = True
except ImportError:
  _extent_c = None  # type: ignore
  HAVE_NATIVE = False
