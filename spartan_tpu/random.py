"""``sp.random`` — numpy.random-style facade over the creation exprs.

The reference exposed ``spartan.rand/randn`` only; this namespace adds
the names a ``np.random`` user reaches for.  All entries produce LAZY
creation exprs (per-call deterministic seeds from the global stream —
``seed`` resets it) that fold into fused regions and shard like any
other creation; sampling helpers ride the distributed random-key
argsort (`spartan_tpu.expr.builtins.permutation`).
"""

from __future__ import annotations

import numpy as np

from spartan_tpu.expr import builtins as _b
from spartan_tpu.expr.ndarray import set_random_seed as seed  # noqa: F401

__all__ = ["seed", "random", "rand", "randn", "standard_normal", "normal",
           "uniform", "randint", "integers", "choice", "permutation",
           "bernoulli"]

rand = _b.rand
randn = _b.randn
randint = _b.randint
choice = _b.choice
permutation = _b.permutation


def random(size=()):
  """Uniform [0, 1) of the given shape (``np.random.random``)."""
  return _b.rand(*_tup(size))


def standard_normal(size=()):
  return _b.randn(*_tup(size))


def normal(loc=0.0, scale=1.0, size=()):
  return _b.randn(*_tup(size)) * scale + loc


def uniform(low=0.0, high=1.0, size=()):
  return _b.rand(*_tup(size)) * (high - low) + low


def integers(low, high=None, size=()):
  """``np.random.Generator.integers`` (half-open, like randint)."""
  return _b.randint(low, high, size=_tup(size))


def bernoulli(p=0.5, size=()):
  return _b.rand(*_tup(size)) < p


def _tup(size):
  if isinstance(size, (int, np.integer)):
    return (int(size),)
  return tuple(int(s) for s in size)
