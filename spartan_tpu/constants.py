"""``sp.constants`` — the scipy.constants surface.

Data constants (CODATA values, unit prefixes, ``physical_constants``)
re-export directly — they are metadata, not computation.  The three
array-valued converters (``convert_temperature``, ``lambda2nu``,
``nu2lambda``) are lazy device maps so they fuse into surrounding
expression DAGs.  ``value``/``unit``/``precision``/``find`` are pure
dictionary lookups (no array compute, nothing leaves the host because
nothing was on the device).

Reference parity: the spartan reference has no constants module;
SURVEY.md §2.5 'broader demo set' motivates the beyond-parity scipy
surfaces.
"""

from __future__ import annotations

import types as _types

import jax.numpy as jnp
import scipy.constants as _sc

import spartan_tpu as sp
from spartan_tpu.special import _f

# re-export every data constant / dict / lookup helper verbatim
for _n in dir(_sc):
  if _n.startswith("_"):
    continue
  _obj = getattr(_sc, _n)
  if isinstance(_obj, _types.ModuleType):
    continue
  if _n in ("convert_temperature", "lambda2nu", "nu2lambda", "test"):
    continue
  globals()[_n] = _obj
del _n, _obj

c = _sc.c  # make the speed of light explicit for the kernels below


def convert_temperature(val, old_scale, new_scale):
  """Temperature scale conversion (lazy device map).

  scipy.constants.convert_temperature semantics: Celsius/Kelvin/
  Fahrenheit/Rankine in either direction."""
  names = {"celsius": "c", "c": "c", "kelvin": "k", "k": "k",
           "fahrenheit": "f", "f": "f", "rankine": "r", "r": "r"}
  try:
    o = names[old_scale.lower()]
    n = names[new_scale.lower()]
  except (KeyError, AttributeError):
    raise NotImplementedError(
        f"scale must be Celsius/Kelvin/Fahrenheit/Rankine, got "
        f"{old_scale!r}/{new_scale!r}") from None

  def kern(v):
    v = _f(v)
    if o == "c":
      k = v + _sc.zero_Celsius
    elif o == "k":
      k = v
    elif o == "f":
      k = (v - 32.0) * 5.0 / 9.0 + _sc.zero_Celsius
    else:
      k = v * 5.0 / 9.0
    if n == "c":
      return k - _sc.zero_Celsius
    if n == "k":
      return k
    if n == "f":
      return (k - _sc.zero_Celsius) * 9.0 / 5.0 + 32.0
    return k * 9.0 / 5.0

  return sp.map([sp.lazify(val)], kern)


def lambda2nu(lambda_):
  """Wavelength -> optical frequency (lazy device map)."""
  return sp.map([sp.lazify(lambda_)], lambda v: _sc.c / _f(v))


def nu2lambda(nu):
  """Optical frequency -> wavelength (lazy device map)."""
  return sp.map([sp.lazify(nu)], lambda v: _sc.c / _f(v))


_HOST_NAMES = []  # nothing eager-array: lookups are metadata

__all__ = sorted(n for n in dir()
                 if not n.startswith("_") and n not in
                 ("annotations", "jnp", "sp"))
