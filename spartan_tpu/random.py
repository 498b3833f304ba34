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


# -- distributions (np.random parity, third sweep) --------------------------
# Each is a lazy CreationExpr (per-call seed from the global stream) that
# folds into fused regions and shards like any other creation.

def _dist(op, size, dtype, **params):
  from spartan_tpu.expr.ndarray import CreationExpr, _next_seed
  return CreationExpr(op, _tup(size), dtype,
                      {**params, "seed": _next_seed()}, None)


def exponential(scale=1.0, size=()):
  return _dist("exponential", size, np.float64, scale=float(scale))


def poisson(lam=1.0, size=()):
  return _dist("poisson", size, np.int64, lam=float(lam))


def binomial(n, p, size=()):
  return _dist("binomial", size, np.int64, n=float(n), p=float(p))


def beta(a, b, size=()):
  return _dist("beta", size, np.float64, a=float(a), b=float(b))


def gamma(shape, scale=1.0, size=()):
  return _dist("gamma", size, np.float64, shape_param=float(shape),
               scale=float(scale))


def shuffle(v):
  """Shuffled COPY along axis 0 — lazy arrays are immutable, so this is
  ``permutation(v)`` rather than numpy's in-place mutation (documented
  deviation; the reference had no in-place shuffle either)."""
  return _b.permutation(v)


__all__ += ["exponential", "poisson", "binomial", "beta", "gamma", "shuffle"]


class Generator:
  """``np.random.Generator``-style object API (the modern numpy idiom:
  ``rng = sp.random.default_rng(seed)``).  Each Generator owns an
  independent deterministic key stream — two generators with the same
  seed produce identical lazy creation exprs; the module-level fns keep
  the legacy global stream."""

  def __init__(self, seed: int = 0):
    self._base = int(seed) * 1_000_003 + 0x9E3779B9
    self._n = 0

  def _next_seed(self) -> int:
    self._n += 1
    return (self._base + self._n * 2_654_435_761) % (1 << 63)

  def _creation(self, op, size, dtype, **params):
    from spartan_tpu.expr.ndarray import CreationExpr
    return CreationExpr(op, _tup(size), dtype,
                        {**params, "seed": self._next_seed()}, None)

  def random(self, size=()):
    return self._creation("rand", size, np.float64)

  def uniform(self, low=0.0, high=1.0, size=()):
    return self.random(size) * (high - low) + low

  def standard_normal(self, size=()):
    return self._creation("randn", size, np.float64)

  def normal(self, loc=0.0, scale=1.0, size=()):
    return self.standard_normal(size) * scale + loc

  def integers(self, low, high=None, size=()):
    if high is None:
      low, high = 0, low
    return self._creation("randint", size, np.int64,
                          low=int(low), high=int(high))

  def exponential(self, scale=1.0, size=()):
    return self._creation("exponential", size, np.float64,
                          scale=float(scale))

  def poisson(self, lam=1.0, size=()):
    return self._creation("poisson", size, np.int64, lam=float(lam))

  def binomial(self, n, p, size=()):
    return self._creation("binomial", size, np.int64, n=float(n),
                          p=float(p))

  def beta(self, a, b, size=()):
    return self._creation("beta", size, np.float64, a=float(a), b=float(b))

  def gamma(self, shape, scale=1.0, size=()):
    return self._creation("gamma", size, np.float64,
                          shape_param=float(shape), scale=float(scale))

  def permutation(self, v):
    # ride the distributed random-key argsort; key from THIS stream
    from spartan_tpu.expr import builtins as _bb
    if isinstance(v, (int, np.integer)):
      v = _bb.arange(int(v))
    v = _bb.lazify(v)
    keys = self._creation("rand", (int(v.shape[0]),), np.float64)
    return _bb.take(v, _bb.argsort(keys), axis=0)

  def shuffle(self, v):
    return self.permutation(v)

  def choice(self, a, size, replace: bool = True):
    from spartan_tpu.expr import builtins as _bb
    if isinstance(a, (int, np.integer)):
      a = _bb.arange(int(a))
    a = _bb.lazify(a)
    if a.ndim != 1:
      raise ValueError("a must be 1-dimensional")
    n, k = int(a.shape[0]), int(size)
    if replace:
      return _bb.take(a, self.integers(0, n, (k,)))
    if k > n:
      raise ValueError("cannot take a larger sample than population when "
                       "replace=False")
    return _bb.take(a, self.permutation(n)[:k])


def default_rng(seed: int = 0) -> Generator:
  """np.random.default_rng parity: an independent seeded Generator."""
  return Generator(seed)


__all__ += ["Generator", "default_rng"]
