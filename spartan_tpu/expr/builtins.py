"""The NumPy-compatible builtin surface (~150 functions).

TPU-native rebuild of the reference's builtins (reference:
``spartan/expr/builtins.py`` + per-op files — the NumPy-style API built
from the five primitives map/reduce/scan/dot/shuffle, re-exported from
``spartan/__init__.py``; SURVEY.md §2.1).  Everything here is a thin lazy
constructor: creation ops become :class:`CreationExpr` (folded into fused
regions — ``ones(...) + x`` never materializes the ones), elementwise math
becomes map kernels over jnp ufuncs, reductions carry the reference's
float64-accumulation semantics, and shape ops stay lazy until forced.
"""

from __future__ import annotations

import builtins as _py
import collections
import functools
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.core.array import SpartanArray
from spartan_tpu.core.array import from_numpy as _from_numpy_arr
# ``import a.b as m`` resolves via sys.modules, immune to the package
# __init__ re-binding these names to the same-named functions.
import spartan_tpu.expr.dot as dot_mod
import spartan_tpu.expr.reduce as reduce_mod
import spartan_tpu.expr.scan as scan_mod
from spartan_tpu.expr.base import Expr, ListExpr, NotShapeable, Val, lazify
from spartan_tpu.expr.map import map, map1, map2, map_with_location
from spartan_tpu.expr.ndarray import CreationExpr, _next_seed, ndarray, set_random_seed
from spartan_tpu.expr.reshape import (ConcatenateExpr, RavelExpr, ReshapeExpr,
                                      StackExpr, TileExpr, TransposeExpr)
from spartan_tpu.expr.shuffle import shuffle
from spartan_tpu.expr.slice import make_slice
from spartan_tpu.expr.sort_expr import PercentileExpr, SortExpr
from spartan_tpu.expr.stencil import avgpool, maxpool, stencil
from spartan_tpu.expr.write import assign, write

_DEFAULT_FLOAT = np.float64  # canonicalized to f32 when x64 is off (TPU)


# -- creation ---------------------------------------------------------------

def zeros(shape, dtype=_DEFAULT_FLOAT, tile_hint=None) -> Expr:
  return CreationExpr("full", _tuplify(shape), dtype, {"fill": 0}, tile_hint)


def ones(shape, dtype=_DEFAULT_FLOAT, tile_hint=None) -> Expr:
  return CreationExpr("full", _tuplify(shape), dtype, {"fill": 1}, tile_hint)


def full(shape, fill_value, dtype=None, tile_hint=None) -> Expr:
  if dtype is None:
    dtype = np.asarray(fill_value).dtype
  return CreationExpr("full", _tuplify(shape), dtype, {"fill": fill_value},
                      tile_hint)


empty = zeros  # XLA arrays are always defined; empty == zeros


def zeros_like(v) -> Expr:
  v = lazify(v)
  return zeros(v.shape, v.dtype)


def ones_like(v) -> Expr:
  v = lazify(v)
  return ones(v.shape, v.dtype)


def full_like(v, fill_value) -> Expr:
  v = lazify(v)
  return full(v.shape, fill_value, v.dtype)


def arange(start, stop=None, step=1, dtype=None, tile_hint=None) -> Expr:
  if stop is None:
    start, stop = 0, start
  n = _py.max(0, int(np.ceil((stop - start) / step)))
  if dtype is None:
    dtype = np.arange(start, stop, step).dtype if n else np.int64
  return CreationExpr("arange", (n,), dtype,
                      {"start": start, "stop": stop, "step": step}, tile_hint)


def linspace(start, stop, num=50, dtype=_DEFAULT_FLOAT) -> Expr:
  return CreationExpr("linspace", (num,), dtype,
                      {"start": start, "stop": stop, "num": num}, None)


def eye(n, m=None, k=0, dtype=_DEFAULT_FLOAT, tile_hint=None) -> Expr:
  m = n if m is None else m
  return CreationExpr("eye", (n, m), dtype, {"k": k}, tile_hint)


def identity(n, dtype=_DEFAULT_FLOAT) -> Expr:
  return eye(n, dtype=dtype)


def rand(*shape, tile_hint=None) -> Expr:
  return CreationExpr("rand", shape, _DEFAULT_FLOAT, {"seed": _next_seed()},
                      tile_hint)


def randn(*shape, tile_hint=None) -> Expr:
  return CreationExpr("randn", shape, _DEFAULT_FLOAT, {"seed": _next_seed()},
                      tile_hint)


def randint(low, high=None, size=(), dtype=np.int64, tile_hint=None) -> Expr:
  if high is None:
    low, high = 0, low
  return CreationExpr("randint", _tuplify(size), dtype,
                      {"low": low, "high": high, "seed": _next_seed()},
                      tile_hint)


def _tuplify(shape) -> tuple:
  if isinstance(shape, (int, np.integer)):
    return (int(shape),)
  return tuple(int(s) for s in shape)


def from_numpy(arr, tile_hint=None) -> Expr:
  """Wrap host data as a distributed leaf."""
  return Val(_from_numpy_arr(np.asarray(arr), tile_hint))


as_array = from_numpy


# -- elementwise math -------------------------------------------------------

def _unary(jfn, name):
  def op(v):
    return map1(lazify(v), jfn)
  op.__name__ = name
  op.__doc__ = f"Lazy elementwise {name} (maps to jnp.{name})."
  return op


sqrt = _unary(jnp.sqrt, "sqrt")
exp = _unary(jnp.exp, "exp")
exp2 = _unary(jnp.exp2, "exp2")
expm1 = _unary(jnp.expm1, "expm1")
log = _unary(jnp.log, "log")
log2 = _unary(jnp.log2, "log2")
log10 = _unary(jnp.log10, "log10")
log1p = _unary(jnp.log1p, "log1p")
abs = _unary(jnp.abs, "abs")
absolute = abs
sign = _unary(jnp.sign, "sign")
negative = _unary(jnp.negative, "negative")
reciprocal = _unary(jnp.reciprocal, "reciprocal")
square = _unary(jnp.square, "square")
sin = _unary(jnp.sin, "sin")
cos = _unary(jnp.cos, "cos")
tan = _unary(jnp.tan, "tan")
arcsin = _unary(jnp.arcsin, "arcsin")
arccos = _unary(jnp.arccos, "arccos")
arctan = _unary(jnp.arctan, "arctan")
sinh = _unary(jnp.sinh, "sinh")
cosh = _unary(jnp.cosh, "cosh")
tanh = _unary(jnp.tanh, "tanh")
ceil = _unary(jnp.ceil, "ceil")
floor = _unary(jnp.floor, "floor")
rint = _unary(jnp.rint, "rint")
trunc = _unary(jnp.trunc, "trunc")
isnan = _unary(jnp.isnan, "isnan")
isinf = _unary(jnp.isinf, "isinf")
isfinite = _unary(jnp.isfinite, "isfinite")
logical_not = _unary(jnp.logical_not, "logical_not")
conj = _unary(jnp.conj, "conj")


def _binary(jfn, name):
  def op(a, b):
    return map2(a, b, jfn)
  op.__name__ = name
  return op


add = _binary(jnp.add, "add")
subtract = _binary(jnp.subtract, "subtract")
multiply = _binary(jnp.multiply, "multiply")
divide = _binary(jnp.true_divide, "divide")
true_divide = divide
floor_divide = _binary(jnp.floor_divide, "floor_divide")
mod = _binary(jnp.mod, "mod")
power = _binary(jnp.power, "power")
maximum = _binary(jnp.maximum, "maximum")
minimum = _binary(jnp.minimum, "minimum")
arctan2 = _binary(jnp.arctan2, "arctan2")
hypot = _binary(jnp.hypot, "hypot")
equal = _binary(jnp.equal, "equal")
not_equal = _binary(jnp.not_equal, "not_equal")
less = _binary(jnp.less, "less")
less_equal = _binary(jnp.less_equal, "less_equal")
greater = _binary(jnp.greater, "greater")
greater_equal = _binary(jnp.greater_equal, "greater_equal")
logical_and = _binary(jnp.logical_and, "logical_and")
logical_or = _binary(jnp.logical_or, "logical_or")
logical_xor = _binary(jnp.logical_xor, "logical_xor")
bitwise_and = _binary(jnp.bitwise_and, "bitwise_and")
bitwise_or = _binary(jnp.bitwise_or, "bitwise_or")
bitwise_xor = _binary(jnp.bitwise_xor, "bitwise_xor")
left_shift = _binary(jnp.left_shift, "left_shift")
right_shift = _binary(jnp.right_shift, "right_shift")
invert = _unary(jnp.bitwise_not, "invert")
bitwise_not = invert


def round(v, decimals=0) -> Expr:
  return map([lazify(v)], jnp.round, fn_kw={"decimals": decimals})


def clip(v, a_min=None, a_max=None) -> Expr:
  return map([lazify(v)], jnp.clip, fn_kw={"min": a_min, "max": a_max})


def where(cond, a=None, b=None) -> Expr:
  if a is None and b is None:
    # numpy 1-arg form: tuple of per-dim nonzero index arrays
    # (data-dependent shape → host boundary, like nonzero)
    from spartan_tpu.expr.fio import HostExpr
    v = lazify(cond)
    return tuple(HostExpr([v], functools.partial(
        lambda i_, x: np.nonzero(x)[i_], i))
        for i in _py.range(_py.max(v.ndim, 1)))
  if a is None or b is None:
    raise ValueError("either both or neither of x and y should be given")
  return map([lazify(cond), lazify(a), lazify(b)], jnp.where)


def _astype_fn(x, dtype):
  return x.astype(dtype)


def astype(v, dtype) -> Expr:
  dt = jax.dtypes.canonicalize_dtype(np.dtype(dtype))
  return map([lazify(v)], _astype_fn, fn_kw={"dtype": dt})


# -- reductions -------------------------------------------------------------

def sum(v, axis=None, keepdims=False, dtype=None) -> Expr:
  return reduce_mod.reduce(v, "sum", axis=axis, keepdims=keepdims,
                           out_dtype=dtype)


def prod(v, axis=None, keepdims=False, dtype=None) -> Expr:
  return reduce_mod.reduce(v, "prod", axis=axis, keepdims=keepdims,
                           out_dtype=dtype)


def mean(v, axis=None, keepdims=False, dtype=None) -> Expr:
  return reduce_mod.reduce(v, "mean", axis=axis, keepdims=keepdims,
                           out_dtype=dtype)


def std(v, axis=None, ddof=0) -> Expr:
  return reduce_mod.reduce(v, "std", axis=axis, ddof=ddof)


def var(v, axis=None, ddof=0) -> Expr:
  return reduce_mod.reduce(v, "var", axis=axis, ddof=ddof)


def max(v, axis=None, keepdims=False) -> Expr:
  return reduce_mod.reduce(v, "max", axis=axis, keepdims=keepdims)


def min(v, axis=None, keepdims=False) -> Expr:
  return reduce_mod.reduce(v, "min", axis=axis, keepdims=keepdims)


def argmax(v, axis=None, keepdims=False) -> Expr:
  return reduce_mod.reduce(v, "argmax", axis=axis, keepdims=keepdims)


def argmin(v, axis=None, keepdims=False) -> Expr:
  return reduce_mod.reduce(v, "argmin", axis=axis, keepdims=keepdims)


def all(v, axis=None) -> Expr:
  return reduce_mod.reduce(v, "all", axis=axis)


def any(v, axis=None) -> Expr:
  return reduce_mod.reduce(v, "any", axis=axis)


def count_nonzero(v, axis=None) -> Expr:
  return reduce_mod.reduce(v, "count_nonzero", axis=axis)


def nansum(v, axis=None) -> Expr:
  return reduce_mod.reduce(v, "nansum", axis=axis)


def nanmean(v, axis=None) -> Expr:
  v = lazify(v)
  cnt = sum(astype(logical_not(isnan(v)), np.float64), axis=axis)
  return nansum(v, axis=axis) / cnt


def nanvar(v, axis=None, ddof: int = 0) -> Expr:
  v = lazify(v)
  mu = nanmean(v, axis=axis)
  if axis is not None:
    mu = expand_dims(mu, axis)
  cnt = sum(astype(logical_not(isnan(v)), np.float64), axis=axis)
  return nansum((v - mu) ** 2, axis=axis) / (cnt - ddof)


def nanstd(v, axis=None, ddof: int = 0) -> Expr:
  return sqrt(nanvar(v, axis=axis, ddof=ddof))


def nanmedian(v, axis=None) -> Expr:
  return map([lazify(v)], jnp.nanmedian, fn_kw={"axis": axis})


def nanpercentile(v, q, axis=None) -> Expr:
  q = tuple(float(x) for x in q) if np.ndim(q) >= 1 else float(q)
  return map([lazify(v)], functools.partial(jnp.nanpercentile, q=jnp.asarray(q)),
             fn_kw={"axis": axis})


def nanquantile(v, q, axis=None) -> Expr:
  q = tuple(float(x) for x in q) if np.ndim(q) >= 1 else float(q)
  return map([lazify(v)], functools.partial(jnp.nanquantile, q=jnp.asarray(q)),
             fn_kw={"axis": axis})


def nanmax(v, axis=None) -> Expr:
  return reduce_mod.reduce(v, "nanmax", axis=axis)


def nanmin(v, axis=None) -> Expr:
  return reduce_mod.reduce(v, "nanmin", axis=axis)


def norm(v, ord=2, axis=None) -> Expr:
  """Vector 2-norm / matrix Frobenius norm (numpy.linalg.norm defaults)."""
  v = lazify(v)
  if ord in (2, "fro", None):
    return sqrt(sum(abs(v) ** 2, axis=axis))
  if ord == 1:
    return sum(abs(v), axis=axis)
  if ord == np.inf:
    return max(abs(v), axis=axis)
  return sum(abs(v) ** ord, axis=axis) ** (1.0 / ord)


def ptp(v, axis=None) -> Expr:
  return max(v, axis=axis) - min(v, axis=axis)


# -- scans ------------------------------------------------------------------

def cumsum(v, axis=None) -> Expr:
  return scan_mod.scan(v, "sum", axis=axis)


def cumprod(v, axis=None) -> Expr:
  return scan_mod.scan(v, "prod", axis=axis)


def cummax(v, axis=None) -> Expr:
  return scan_mod.scan(v, "max", axis=axis)


def cummin(v, axis=None) -> Expr:
  return scan_mod.scan(v, "min", axis=axis)


scan = scan_mod.scan


# -- linear algebra ---------------------------------------------------------

dot = dot_mod.dot
outer = dot_mod.outer
tensordot = dot_mod.tensordot


def matmul(a, b) -> Expr:
  return dot_mod.dot(a, b)


def einsum(subscripts: str, *operands) -> Expr:
  """Einstein summation over lazy operands (MXU contraction path)."""
  ops = [lazify(o) for o in operands]

  def _ein(*arrs):
    return jnp.einsum(subscripts, *arrs,
                      preferred_element_type=jnp.promote_types(
                          arrs[0].dtype, jnp.float32)
                      if arrs[0].dtype != jnp.float64 else None)

  return map(ops, _ein)


def vdot(a, b) -> Expr:
  return sum(multiply(ravel(a), ravel(b)))


def diag(v, k=0) -> Expr:
  return map([lazify(v)], jnp.diag, fn_kw={"k": k})


def diagonal(v, offset=0) -> Expr:
  return map([lazify(v)], jnp.diagonal, fn_kw={"offset": offset})


def trace(v, offset=0) -> Expr:
  return sum(diagonal(v, offset))


def tril(v, k=0) -> Expr:
  return map([lazify(v)], jnp.tril, fn_kw={"k": k})


def triu(v, k=0) -> Expr:
  return map([lazify(v)], jnp.triu, fn_kw={"k": k})


# -- shape manipulation -----------------------------------------------------

def reshape(v, shape) -> Expr:
  return ReshapeExpr(lazify(v), _tuplify(shape))


def ravel(v) -> Expr:
  return RavelExpr(lazify(v))


flatten = ravel


def transpose(v, axes=None) -> Expr:
  return TransposeExpr(lazify(v), axes)


def swapaxes(v, a, b) -> Expr:
  v = lazify(v)
  axes = list(range(v.ndim))
  axes[a], axes[b] = axes[b], axes[a]
  return TransposeExpr(v, axes)


def concatenate(arrays, axis=0) -> Expr:
  return ConcatenateExpr([lazify(a) for a in arrays], axis)


def stack(arrays, axis=0) -> Expr:
  return StackExpr([lazify(a) for a in arrays], axis)


def vstack(arrays) -> Expr:
  arrays = [lazify(a) for a in arrays]
  if arrays[0].ndim == 1:
    return StackExpr(arrays, 0)
  return ConcatenateExpr(arrays, 0)


def hstack(arrays) -> Expr:
  arrays = [lazify(a) for a in arrays]
  if arrays[0].ndim == 1:
    return ConcatenateExpr(arrays, 0)
  return ConcatenateExpr(arrays, 1)


def tile(v, reps) -> Expr:
  return TileExpr(lazify(v), reps)


def expand_dims(v, axis) -> Expr:
  return map([lazify(v)], jnp.expand_dims, fn_kw={"axis": axis})


def fmod(a, b) -> Expr:
  return map([lazify(a), lazify(b)], jnp.fmod)


def _unary_builtin(jfn):
  def op(v):
    return map([lazify(v)], jfn)
  op.__name__ = jfn.__name__
  return op


nanargmax = _unary_builtin(jnp.nanargmax)
nanargmin = _unary_builtin(jnp.nanargmin)
rad2deg = _unary_builtin(jnp.rad2deg)
deg2rad = _unary_builtin(jnp.deg2rad)
degrees = _unary_builtin(jnp.degrees)
radians = _unary_builtin(jnp.radians)
cbrt = _unary_builtin(jnp.cbrt)
fabs = _unary_builtin(jnp.fabs)
positive = _unary_builtin(jnp.positive)
erf = _unary_builtin(jax.scipy.special.erf)
erfc = _unary_builtin(jax.scipy.special.erfc)
atleast_1d = _unary_builtin(jnp.atleast_1d)
atleast_2d = _unary_builtin(jnp.atleast_2d)
real = _unary_builtin(jnp.real)
imag = _unary_builtin(jnp.imag)


def remainder(a, b) -> Expr:
  return map([lazify(a), lazify(b)], jnp.remainder)


def einsum(subscripts: str, *operands, optimize="greedy") -> Expr:
  """Lazy einsum — contractions lower onto the MXU; XLA chooses the
  collective schedule from the operand shardings.  Two-operand pure
  contractions route to :class:`TensorDotExpr` so the smart-tiling cost
  model sees them as dots (contraction-aware leaf placement) instead of
  an opaque map; N-operand einsums decompose into pairwise contractions
  along numpy's ``einsum_path`` (each pair re-routing through this
  function); batch/trace/diagonal forms take the generic map.

  ``optimize`` follows numpy: ``"greedy"`` (default) / ``"optimal"``
  pick the pairwise contraction order; ``False`` disables the
  decomposition (one fused jnp.einsum — the operands replicate on a
  mesh, so only use it to pin an exact evaluation order)."""
  routed = _route_einsum_contraction(subscripts, operands)
  if routed is None and optimize is not False:
    routed = _route_einsum_multi(subscripts, operands, optimize=optimize)
  if routed is not None:
    return routed
  return map([lazify(o) for o in operands],
             functools.partial(_einsum_call, subscripts))


def _route_einsum_contraction(subscripts: str, operands):
  s = subscripts.replace(" ", "")
  if "..." in s or s.count(",") != 1 or len(operands) != 2:
    return None
  if "->" in s:
    ins, out = s.split("->")
  else:
    ins = s
    counts: dict = {}
    for c in ins.replace(",", ""):
      counts[c] = counts.get(c, 0) + 1
    out = "".join(sorted(c for c in counts if counts[c] == 1))
  t1, t2 = ins.split(",")
  if len(set(t1)) != len(t1) or len(set(t2)) != len(t2):
    return None                      # diagonal within an operand
  shared = [c for c in t1 if c in t2]
  free1 = [c for c in t1 if c not in t2]
  free2 = [c for c in t2 if c not in t1]
  if (sorted(out) != sorted(free1 + free2)
      or _py.any(c in out for c in shared)):
    return None                      # batch dims or summed-out free axes
  a, b = lazify(operands[0]), lazify(operands[1])
  if len(t1) != len(a.shape) or len(t2) != len(b.shape):
    return None
  td = dot_mod.tensordot(a, b, axes=([t1.index(c) for c in shared],
                                     [t2.index(c) for c in shared]))
  natural = free1 + free2
  if out != "".join(natural):
    td = transpose(td, tuple(natural.index(c) for c in out))
  return td


def _route_einsum_multi(subscripts: str, operands, optimize="greedy"):
  """Decompose an N-operand (N≥3) einsum into pairwise steps along
  numpy's shape-only ``einsum_path`` plan.  Each step re-enters
  :func:`einsum`, so pure pairwise contractions become
  :class:`TensorDotExpr` nodes the smart-tiling cost model can place —
  instead of one opaque N-ary map that replicates every operand.
  Returns None (generic-map fallback) for ellipses, per-operand
  diagonals, or malformed subscripts."""
  s = subscripts.replace(" ", "")
  if "..." in s or len(operands) < 3:
    return None
  if "->" in s:
    ins_str, out = s.split("->")
  else:
    ins_str = s
    counts: dict = {}
    for c in ins_str.replace(",", ""):
      counts[c] = counts.get(c, 0) + 1
    out = "".join(sorted(c for c in counts if counts[c] == 1))
  terms = ins_str.split(",")
  if len(terms) != len(operands):
    return None                      # let jnp.einsum raise the arity error
  if _py.any(len(set(t)) != len(t) for t in terms):
    return None                      # per-operand diagonal: generic map
  ops = [lazify(o) for o in operands]
  if _py.any(len(t) != o.ndim for t, o in zip(terms, ops)):
    return None
  # Contraction order depends only on shapes: plan over zero-stride
  # stand-ins (a 0-d base broadcasts to ANY shape, scalars included —
  # no allocation).
  try:
    dummies = [np.broadcast_to(np.zeros(()), o.shape) for o in ops]
    path, _ = np.einsum_path(ins_str + "->" + out, *dummies,
                             optimize=optimize)
  except ValueError:
    return None
  work = list(zip(terms, ops))
  for step in path[1:]:              # path[0] is the 'einsum_path' marker
    popped = [work[i] for i in step]
    for i in sorted(step, reverse=True):
      work.pop(i)
    sub_terms = [t for t, _ in popped]
    keep = set("".join(t for t, _ in work)) | set(out)
    sub_out = "".join(c for c in dict.fromkeys("".join(sub_terms))
                      if c in keep)
    sub_sub = ",".join(sub_terms) + "->" + sub_out
    if len(popped) == 2:
      inter = einsum(sub_sub, *[o for _, o in popped])
    else:
      # k≠2 step (numpy emits one all-operands step for outer products /
      # pure-elementwise forms): recursing would re-enter this function
      # with the identical problem — lower the step as one generic map.
      inter = map([o for _, o in popped],
                  functools.partial(_einsum_call, sub_sub))
    work.append((sub_out, inter))
  (final_t, final_o), = work
  if final_t != out:
    final_o = transpose(final_o, tuple(final_t.index(c) for c in out))
  return final_o


def _einsum_call(subscripts, *xs):
  from spartan_tpu.expr.dot import _resolve_precision
  return jnp.einsum(subscripts, *xs, precision=_resolve_precision(None))


def cross(a, b, axis=-1) -> Expr:
  return map([lazify(a), lazify(b)], jnp.cross, fn_kw={"axis": axis})


def kron(a, b) -> Expr:
  return map([lazify(a), lazify(b)], jnp.kron)


def choose(idx, choices) -> Expr:
  return map([lazify(idx)] + [lazify(c) for c in choices],
             lambda i, *cs: jnp.choose(i, list(cs), mode="clip"))


def around(v, decimals=0) -> Expr:
  return map([lazify(v)], jnp.around, fn_kw={"decimals": decimals})


def moveaxis(v, source, destination) -> Expr:
  return map([lazify(v)], jnp.moveaxis,
             fn_kw={"source": source, "destination": destination})


def dstack(arrays) -> Expr:
  return map([lazify(a) for a in arrays], lambda *xs: jnp.dstack(xs))


def column_stack(arrays) -> Expr:
  return map([lazify(a) for a in arrays], lambda *xs: jnp.column_stack(xs))


def diff(v, n=1, axis=-1) -> Expr:
  return map([lazify(v)], jnp.diff, fn_kw={"n": n, "axis": axis})


def gradient(v, *varargs, axis=None):
  out = map([lazify(v)],
            lambda x: jnp.gradient(x, *varargs, axis=axis))
  return out


def cov(m, rowvar=True, ddof=None) -> Expr:
  kw = {"rowvar": rowvar}
  if ddof is not None:
    kw["ddof"] = ddof
  return map([lazify(m)], jnp.cov, fn_kw=kw)


def corrcoef(m, rowvar=True) -> Expr:
  return map([lazify(m)], jnp.corrcoef, fn_kw={"rowvar": rowvar})


def average(v, axis=None, weights=None) -> Expr:
  if weights is None:
    return mean(v, axis=axis)
  return map([lazify(v), lazify(weights)],
             lambda x, w: jnp.average(x, axis=axis, weights=w))


def inner(a, b) -> Expr:
  return map([lazify(a), lazify(b)], jnp.inner)


def logspace(start, stop, num=50, base=10.0, dtype=None) -> Expr:
  return map([lazify(np.asarray(0.0))],
             lambda _: jnp.logspace(start, stop, num, base=base,
                                    dtype=dtype))


def repeat(v, repeats, axis=None) -> Expr:
  """NumPy repeat with a static (python int) ``repeats`` — data-dependent
  repeat counts would make the output shape dynamic (NotShapeable)."""
  return map([lazify(v)], jnp.repeat,
             fn_kw={"repeats": int(repeats), "axis": axis})


def flip(v, axis=None) -> Expr:
  return map([lazify(v)], jnp.flip, fn_kw={"axis": axis})


def roll(v, shift, axis=None) -> Expr:
  return map([lazify(v)], jnp.roll, fn_kw={"shift": shift, "axis": axis})


def isclose(a, b, rtol=1e-05, atol=1e-08) -> Expr:
  return map([lazify(a), lazify(b)], jnp.isclose,
             fn_kw={"rtol": rtol, "atol": atol})


def meshgrid(*coords, indexing="xy"):
  """Eager (host) meshgrid over small coordinate vectors — returns a list
  of lazy leaves (reference usage: building index grids for examples)."""
  from spartan_tpu.expr.base import Val
  arrs = [np.asarray(c.glom() if isinstance(c, Expr) else c)
          for c in coords]
  return [from_numpy(g) for g in np.meshgrid(*arrs, indexing=indexing)]


def split(v, indices_or_sections, axis=0):
  """Lazy split: a list of slice exprs (shapes static when the split is)."""
  v = lazify(v)
  n = v.shape[axis]
  if isinstance(indices_or_sections, int):
    k = indices_or_sections
    if n % k:
      raise ValueError(f"array split does not result in an equal division "
                       f"({n} into {k})")
    bounds = [(i * (n // k), (i + 1) * (n // k)) for i in range(k)]
  else:
    pts = [0] + [int(i) for i in indices_or_sections] + [n]
    bounds = list(zip(pts[:-1], pts[1:]))
  out = []
  for lo, hi in bounds:
    idx = [slice(None)] * v.ndim
    idx[axis] = slice(lo, hi)
    out.append(v[tuple(idx)])
  return out


def squeeze(v, axis=None) -> Expr:
  return map([lazify(v)], jnp.squeeze, fn_kw={"axis": axis})


def take(v, indices, axis=None) -> Expr:
  return map([lazify(v), lazify(indices)], jnp.take, fn_kw={"axis": axis})


def broadcast_to(v, shape) -> Expr:
  """Explicit broadcast (the reference's ``Broadcast`` wrapper, as an op)."""
  return map([lazify(v)], jnp.broadcast_to, fn_kw={"shape": _tuplify(shape)})


# -- sorting & searching ----------------------------------------------------

def sort(v, axis=-1) -> Expr:
  return SortExpr(lazify(v), axis, "sort")


def argsort(v, axis=-1) -> Expr:
  return SortExpr(lazify(v), axis, "argsort")


def percentile(v, q, axis=None) -> Expr:
  qa = np.asarray(q)
  if np.any(qa < 0) or np.any(qa > 100):
    raise ValueError("Percentiles must be in the range [0, 100]")
  return PercentileExpr(lazify(v), q, axis)


def median(v, axis=None) -> Expr:
  return PercentileExpr(lazify(v), 50.0, axis)


def quantile(v, q, axis=None) -> Expr:
  """NumPy quantile (q in [0, 1]) — percentile scaled."""
  q = np.asarray(q)
  if np.any(q < 0) or np.any(q > 1):
    raise ValueError("Quantiles must be in the range [0, 1]")
  return PercentileExpr(lazify(v), q * 100.0, axis)


def partition(v, kth, axis=-1) -> Expr:
  """NumPy partition semantics via a full sort: element ``kth`` lands at
  its sorted position with smaller values before and larger after — a
  total sort satisfies the partial-order contract exactly, and XLA has
  no cheaper partial sort on TPU (reference: spartan/expr/sort.py).
  Routes through SortExpr, so large sharded 1-D inputs inherit the
  distributed sample-sort path."""
  del kth
  return SortExpr(lazify(v), axis, "sort")


def argpartition(v, kth, axis=-1) -> Expr:
  del kth
  return SortExpr(lazify(v), axis, "argsort")


def bincount(v, minlength=None, weights=None) -> Expr:
  """Traced when ``minlength`` bounds the output; eager otherwise
  (data-dependent length, the reference's NotShapeable boundary)."""
  v = lazify(v)
  if minlength is not None:
    w = lazify(weights) if weights is not None else None
    ins = [v] + ([w] if w is not None else [])

    def _bc(x, *rest):
      weights_ = rest[0] if rest else None
      return jnp.bincount(x, weights=weights_, length=minlength)

    return map(ins, _bc)
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([v] + ([lazify(weights)] if weights is not None else []),
                  np.bincount)


def histogram(v, bins: int = 10, range=None, weights=None,
              density: bool = False) -> Expr:
  """Fixed-bin histogram (static shape → traceable).  Returns counts;
  edges are ``linspace(range[0], range[1], bins+1)`` like numpy.  With
  ``range=None`` the data min/max become TRACED endpoints (numpy-style
  auto range; the edge VALUES are data-dependent but the shape is
  static, so the histogram stays compilable — correct under
  ``sp.compile`` with fresh batches and inside loop bodies).
  ``weights``/``density`` follow numpy."""
  v = lazify(v)
  ins = [v] + ([lazify(weights)] if weights is not None else [])

  def _hist(x, *rest):
    xf = x.ravel()
    if range is None:
      lo, hi = jnp.min(xf), jnp.max(xf)
      lo, hi = (jnp.where(lo == hi, lo - 0.5, lo),
                jnp.where(lo == hi, hi + 0.5, hi))
    else:
      lo, hi = range
    edges = jnp.linspace(lo, hi, bins + 1)
    idx = jnp.clip(jnp.searchsorted(edges, xf, side="right") - 1,
                   0, bins - 1)
    valid = (xf >= lo) & (xf <= hi)
    slot = jnp.where(valid, idx, bins)
    if rest:
      w = rest[0].ravel()
      counts = jnp.bincount(slot, weights=w, length=bins + 1)[:bins]
    else:
      counts = jnp.bincount(slot, length=bins + 1)[:bins]
    if density:
      width = (edges[1:] - edges[:-1])
      total = jnp.sum(counts)
      counts = counts / (width * total)
    return counts

  return map(ins, _hist)


def take_along_axis(v, indices, axis) -> Expr:
  return map([lazify(v), lazify(indices)], jnp.take_along_axis,
             fn_kw={"axis": axis})


def digitize(x, bins, right=False) -> Expr:
  """Bin indices (numpy.digitize semantics via searchsorted)."""
  side = "left" if right else "right"
  return map([lazify(bins), lazify(x)], jnp.searchsorted,
             fn_kw={"side": side})


def searchsorted(v, queries, side="left") -> Expr:
  return map([lazify(v), lazify(queries)], jnp.searchsorted,
             fn_kw={"side": side})


def unique(v) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(v)], np.unique)


def nonzero(v) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(v)], lambda x: np.stack(np.nonzero(x)))


# -- numpy-parity additions (r3 surface audit) ------------------------------

def asarray(v, dtype=None) -> Expr:
  """``numpy.asarray``: wrap host data (lazy leaf) / pass exprs through."""
  out = lazify(v)
  return astype(out, dtype) if dtype is not None else out


array = asarray


def copy(v) -> Expr:
  """Functional copy — lazy arrays are immutable, so this is the identity
  map (kept for numpy-API parity; reference arrays copied tile stores)."""
  return map([lazify(v)], jnp.copy)


def append(a, b, axis=None) -> Expr:
  a, b = lazify(a), lazify(b)
  if axis is None:
    return concatenate([ravel(a), ravel(b)], axis=0)
  return concatenate([a, b], axis=axis)


def fmax(a, b) -> Expr:
  return map([lazify(a), lazify(b)], jnp.fmax)


def fmin(a, b) -> Expr:
  return map([lazify(a), lazify(b)], jnp.fmin)


def logaddexp(a, b) -> Expr:
  return map([lazify(a), lazify(b)], jnp.logaddexp)


def nan_to_num(v, nan=0.0, posinf=None, neginf=None) -> Expr:
  return map([lazify(v)], jnp.nan_to_num,
             fn_kw={"nan": nan, "posinf": posinf, "neginf": neginf})


def interp(x, xp, fp, left=None, right=None) -> Expr:
  return map([lazify(x), lazify(xp), lazify(fp)], jnp.interp,
             fn_kw={"left": left, "right": right})


def rot90(v, k=1, axes=(0, 1)) -> Expr:
  return map([lazify(v)], jnp.rot90, fn_kw={"k": k, "axes": tuple(axes)})


def flatnonzero(v) -> Expr:
  """Data-dependent output length → eager host boundary, like nonzero."""
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(v)], np.flatnonzero)


def unravel_index(indices, shape):
  """Tuple of coordinate exprs (numpy contract), traced as one stack."""
  shape = _tuplify(shape)
  st = map([lazify(indices)],
           lambda i: jnp.stack(jnp.unravel_index(i, shape)))
  return tuple(st[d] for d in range(len(shape)))


def fill_diagonal(v, val) -> Expr:
  """Functional ``numpy.fill_diagonal``: returns a NEW expr (lazy arrays
  are immutable; the reference's in-place writes map to write-exprs)."""
  return map([lazify(v), lazify(val)],
             lambda x, w: jnp.fill_diagonal(x, w, inplace=False))


amax = max
amin = min


def permutation(v) -> Expr:
  """Random permutation (``np.random.permutation``): an int gives a
  permuted ``arange``; an array permutes along axis 0.  TPU-native
  formulation: argsort of uniform random keys — large sharded inputs
  ride the distributed sample sort (no Fisher–Yates serial chain)."""
  if isinstance(v, (int, np.integer)):
    return argsort(rand(int(v)))
  v = lazify(v)
  return take(v, argsort(rand(v.shape[0])), axis=0)


def choice(v, size, replace: bool = True) -> Expr:
  """Random sample from a 1-D population (``np.random.choice``).  With
  replacement: uniform traced index gather.  Without: the first ``size``
  entries of a random-key argsort (exact, distributed-sort-backed)."""
  if isinstance(v, (int, np.integer)):
    v = arange(int(v))
  v = lazify(v)
  if len(v.shape) != 1:
    raise ValueError("a must be 1-dimensional")  # np.random.choice contract
  n = v.shape[0]
  size = int(size)
  if replace:
    return take(v, randint(0, n, size=(size,)))
  if size > n:
    raise ValueError("cannot take a larger sample than population when "
                     "replace=False")
  return take(v, permutation(n)[:size])


# -- numpy-parity additions, second sweep (r3 surface audit) ----------------

def _binary_builtin(jfn):
  def op(a, b):
    return map([lazify(a), lazify(b)], jfn)
  op.__name__ = jfn.__name__
  return op


sinc = _unary_builtin(jnp.sinc)
signbit = _unary_builtin(jnp.signbit)
angle = _unary_builtin(jnp.angle)
iscomplex = _unary_builtin(jnp.iscomplex)
isreal = _unary_builtin(jnp.isreal)
heaviside = _binary_builtin(jnp.heaviside)
copysign = _binary_builtin(jnp.copysign)
nextafter = _binary_builtin(jnp.nextafter)
float_power = _binary_builtin(jnp.float_power)
gcd = _binary_builtin(jnp.gcd)
lcm = _binary_builtin(jnp.lcm)
ldexp = _binary_builtin(jnp.ldexp)
polyval = _binary_builtin(jnp.polyval)


def modf(v):
  """``(fractional, integral)`` exprs (numpy tuple contract)."""
  v = lazify(v)
  return (map([v], lambda x: jnp.modf(x)[0]),
          map([v], lambda x: jnp.modf(x)[1]))


def frexp(v):
  v = lazify(v)
  return (map([v], lambda x: jnp.frexp(x)[0]),
          map([v], lambda x: jnp.frexp(x)[1]))


def divmod(a, b):  # noqa: A001 — numpy shadows the py builtin the same way
  a, b = lazify(a), lazify(b)
  return (floor_divide(a, b), mod(a, b))


def _static_idx(p):
  if isinstance(p, (int, np.integer)):
    return int(p)
  return tuple(_static_idx(q) for q in p)


def pad(v, pad_width, mode: str = "constant", **kw):
  fkw = {"pad_width": _static_idx(pad_width), "mode": mode}
  fkw.update({k: (tuple(w) if isinstance(w, (list, tuple)) else w)
              for k, w in kw.items()})
  return map([lazify(v)], jnp.pad, fn_kw=fkw)


def convolve(a, b, mode: str = "full") -> Expr:
  return map([lazify(a), lazify(b)], jnp.convolve, fn_kw={"mode": mode})


def correlate(a, b, mode: str = "valid") -> Expr:
  return map([lazify(a), lazify(b)], jnp.correlate, fn_kw={"mode": mode})


def vander(x, N=None, increasing: bool = False) -> Expr:
  return map([lazify(x)], jnp.vander,
             fn_kw={"N": N, "increasing": increasing})


def ediff1d(v) -> Expr:
  return map([lazify(v)], lambda x: jnp.diff(jnp.ravel(x)))


def trapz(y, x=None, dx: float = 1.0, axis: int = -1) -> Expr:
  """numpy.trapz (jnp.trapezoid — the post-numpy-2 name)."""
  if x is not None:
    ax = int(axis)
    return map([lazify(y), lazify(x)],
               lambda yy, xx: jnp.trapezoid(yy, xx, axis=ax))
  return map([lazify(y)], jnp.trapezoid, fn_kw={"dx": dx, "axis": axis})


def insert(v, obj, values, axis=None) -> Expr:
  obj = _static_idx(obj)

  def _ins(a, w):
    o = np.asarray(obj) if isinstance(obj, tuple) else obj
    return jnp.insert(a, o, w, axis=axis)

  return map([lazify(v), lazify(values)], _ins)


def delete(v, obj, axis=None) -> Expr:
  obj = _static_idx(obj)

  def _del(a):
    o = np.asarray(obj) if isinstance(obj, tuple) else obj
    return jnp.delete(a, o, axis=axis)

  return map([lazify(v)], _del)


def apply_along_axis(func1d, axis, arr) -> Expr:
  ax = int(axis)

  def _apply(a):
    return jnp.apply_along_axis(func1d, ax, a)

  return map([lazify(arr)], _apply)


def msort(v) -> Expr:
  return sort(v, axis=0)


def isin(element, test_elements) -> Expr:
  """Static output shape (bool of ``element``'s shape) → stays traced."""
  return map([lazify(element), lazify(test_elements)], jnp.isin)


def in1d(a, b) -> Expr:
  return map([lazify(a), lazify(b)],
             lambda x, y: jnp.isin(jnp.ravel(x), y))


def select(condlist, choicelist, default=0.0) -> Expr:
  n = len(condlist)
  ins = [lazify(c) for c in condlist] + [lazify(c) for c in choicelist]

  def _sel(*xs):
    return jnp.select(list(xs[:n]), list(xs[n:]), default)

  return map(ins, _sel)


def argwhere(v) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(v)], np.argwhere)


def extract(cond, v) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(cond), lazify(v)], np.extract)


def compress(cond, v, axis=None) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(cond), lazify(v)],
                  lambda c, a: np.compress(c, a, axis=axis))


def setdiff1d(a, b) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(a), lazify(b)], np.setdiff1d)


def union1d(a, b) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(a), lazify(b)], np.union1d)


def intersect1d(a, b) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(a), lazify(b)], np.intersect1d)


def indices(dimensions, dtype=np.int64) -> Expr:
  return from_numpy(np.indices(_tuplify(dimensions), dtype=dtype))


def fromfunction(fn, shape, **kw) -> Expr:
  return from_numpy(np.fromfunction(fn, _tuplify(shape), **kw))


def triu_indices(n, k=0, m=None):
  return tuple(from_numpy(i) for i in np.triu_indices(n, k, m))


def tril_indices(n, k=0, m=None):
  return tuple(from_numpy(i) for i in np.tril_indices(n, k, m))


def diag_indices(n, ndim=2):
  return tuple(from_numpy(i) for i in np.diag_indices(n, ndim))


def nanprod(v, axis=None) -> Expr:
  v = lazify(v)
  if np.dtype(v.dtype).kind not in "fc":
    return prod(v, axis=axis)
  return prod(map([v], lambda x: jnp.where(jnp.isnan(x),
                                           jnp.ones((), x.dtype), x)),
              axis=axis)


def nancumsum(v, axis=None) -> Expr:
  v = lazify(v)
  if np.dtype(v.dtype).kind not in "fc":
    return cumsum(v, axis=axis)
  return cumsum(map([v], lambda x: jnp.where(jnp.isnan(x),
                                             jnp.zeros((), x.dtype), x)),
                axis=axis)


def nancumprod(v, axis=None) -> Expr:
  v = lazify(v)
  if np.dtype(v.dtype).kind not in "fc":
    return cumprod(v, axis=axis)
  return cumprod(map([v], lambda x: jnp.where(jnp.isnan(x),
                                              jnp.ones((), x.dtype), x)),
                 axis=axis)


# -- numpy-parity additions, third sweep (tools/numpy_parity.py audit) ------
# Closes the residual of the full np.* namespace enumeration: array-API
# spellings (numpy 2.0), inverse hyperbolics, split/flip/window/poly
# families, multi-output histogram/unique forms.  Everything stays a lazy
# map/creation expr unless the output shape is data-dependent (host
# boundary, like unique) or the value is driver-side metadata.

arccosh = _unary(jnp.arccosh, "arccosh")
arcsinh = _unary(jnp.arcsinh, "arcsinh")
arctanh = _unary(jnp.arctanh, "arctanh")
# numpy 2.0 array-API spellings
acos, acosh, asin = arccos, arccosh, arcsin
asinh, atan, atanh = arcsinh, arctan, arctanh
atan2 = arctan2
concat = concatenate
conjugate = conj
pow = power  # noqa: A001 — numpy shadows the builtin the same way
bitwise_invert = invert
bitwise_left_shift = left_shift
bitwise_right_shift = right_shift

isneginf = _unary(jnp.isneginf, "isneginf")
isposinf = _unary(jnp.isposinf, "isposinf")
spacing = _unary(jnp.spacing, "spacing")
i0 = _unary(jnp.i0, "i0")
bitwise_count = _unary(jnp.bitwise_count, "bitwise_count")
fix = _unary(jnp.trunc, "fix")  # np.fix == truncate toward zero
logaddexp2 = _binary(jnp.logaddexp2, "logaddexp2")
sort_complex = _unary_builtin(jnp.sort_complex)
atleast_3d = _unary_builtin(jnp.atleast_3d)


def vecdot(a, b, axis=-1) -> Expr:
  return map([lazify(a), lazify(b)], jnp.vecdot, fn_kw={"axis": axis})


def matrix_transpose(v) -> Expr:
  return swapaxes(lazify(v), -2, -1)


permute_dims = transpose


def fliplr(v) -> Expr:
  v = lazify(v)
  if v.ndim < 2:
    raise ValueError("Input must be >= 2-d.")
  return flip(v, axis=1)


def flipud(v) -> Expr:
  return flip(lazify(v), axis=0)


def empty_like(v) -> Expr:
  return zeros_like(v)  # XLA arrays are always defined; empty == zeros


def diagflat(v, k=0) -> Expr:
  return map([lazify(v)], jnp.diagflat, fn_kw={"k": k})


def resize(v, new_shape) -> Expr:
  return map([lazify(v)], jnp.resize,
             fn_kw={"new_shape": _tuplify(new_shape)})


def rollaxis(v, axis, start=0) -> Expr:
  """numpy.rollaxis (legacy; moveaxis is the modern spelling)."""
  v = lazify(v)
  n = v.ndim
  if axis < 0:
    axis += n
  if start < 0:
    start += n
  if axis < start:
    start -= 1
  axes = list(range(n))
  axes.remove(axis)
  axes.insert(start, axis)
  return transpose(v, axes)


def unwrap(p, discont=None, axis=-1, period=2 * np.pi) -> Expr:
  return map([lazify(p)], jnp.unwrap,
             fn_kw={"discont": discont, "axis": axis, "period": period})


def lexsort(keys, axis=-1) -> Expr:
  ins = [lazify(k) for k in keys]
  return map(ins, lambda *ks: jnp.lexsort(ks, axis=axis))


def ravel_multi_index(multi_index, dims, mode="clip") -> Expr:
  """numpy.ravel_multi_index; ``mode='raise'`` is not traceable (no
  data-dependent errors under jit) and is treated as ``'clip'``."""
  m = mode if mode in ("clip", "wrap") else "clip"
  ins = [lazify(i) for i in multi_index]
  return map(ins, lambda *idx: jnp.ravel_multi_index(
      idx, dims=_tuplify(dims), mode=m))


def ix_(*seqs):
  """Open-mesh index exprs (numpy.ix_)."""
  n = len(seqs)
  out = []
  for i, s in enumerate(seqs):
    v = lazify(s)
    if v.ndim != 1:
      raise ValueError("Cross index must be 1 dimensional")
    shape = [1] * n
    shape[i] = int(v.shape[0])
    out.append(reshape(v, tuple(shape)))
  return tuple(out)


def broadcast_shapes(*shapes):
  return np.broadcast_shapes(*shapes)


def broadcast_arrays(*arrays):
  arrs = [lazify(a) for a in arrays]
  out = np.broadcast_shapes(*[a.shape for a in arrs])
  return [broadcast_to(a, out) for a in arrs]


def block(arrays) -> Expr:
  """numpy.block over a (statically) nested list of exprs/arrays."""
  leaves = []

  def _template(x):
    if isinstance(x, list):
      return [_template(e) for e in x]
    leaves.append(lazify(x))
    return len(leaves) - 1

  tmpl = _template(arrays)

  def _build(*vals):
    def rebuild(t):
      if isinstance(t, list):
        return [rebuild(e) for e in t]
      return vals[t]
    return jnp.block(rebuild(tmpl))

  return map(leaves, _build)


def apply_over_axes(func, v, axes) -> Expr:
  res = lazify(v)
  nd = res.ndim
  for ax in ([axes] if isinstance(axes, (int, np.integer)) else axes):
    r = func(res, int(ax))
    if r.ndim != nd:
      r = expand_dims(r, int(ax))
    res = r
  return res


# -- histogram family (multi-output; shapes static given bins) --------------

def histogram_bin_edges(v, bins: int = 10, range=None) -> Expr:
  v = lazify(v)
  if range is None:
    def _edges(x):
      xf = x.ravel()
      lo, hi = jnp.min(xf), jnp.max(xf)
      lo, hi = (jnp.where(lo == hi, lo - 0.5, lo),
                jnp.where(lo == hi, hi + 0.5, hi))
      return jnp.linspace(lo, hi, bins + 1)
    return map([v], _edges)
  lo_s, hi_s = range
  return map([v], lambda x: jnp.linspace(lo_s, hi_s, bins + 1))


def histogram2d(x, y, bins=10, range=None):
  """(counts, xedges, yedges) exprs — one fused region computes all three
  (XLA CSE dedups the shared work)."""
  ins = [lazify(x), lazify(y)]
  kw = {"bins": bins, "range": range}
  return (map(ins, lambda a, b: jnp.histogram2d(a, b, **kw)[0]),
          map(ins, lambda a, b: jnp.histogram2d(a, b, **kw)[1]),
          map(ins, lambda a, b: jnp.histogram2d(a, b, **kw)[2]))


def histogramdd(sample, bins=10, range=None):
  """(counts, [edge exprs per dim]) — numpy.histogramdd contract."""
  v = lazify(sample)
  ndim = int(v.shape[1])
  kw = {"bins": bins, "range": range}
  counts = map([v], lambda s: jnp.histogramdd(s, **kw)[0])
  edges = [map([v], functools.partial(
      lambda i_, s: jnp.histogramdd(s, **kw)[1][i_], i))
      for i in _py.range(ndim)]
  return counts, edges


# -- unique result forms (numpy 2.0; host boundary like unique) -------------

_UniqueAll = collections.namedtuple(
    "UniqueAllResult", ["values", "indices", "inverse_indices", "counts"])
_UniqueCounts = collections.namedtuple(
    "UniqueCountsResult", ["values", "counts"])
_UniqueInverse = collections.namedtuple(
    "UniqueInverseResult", ["values", "inverse_indices"])


def _unique_part(i, extras):
  def fn(x):
    return np.unique(x, **extras)[i] if extras else np.unique(x)
  return fn


def unique_values(v) -> Expr:
  return unique(v)


def unique_counts(v):
  from spartan_tpu.expr.fio import HostExpr
  v = lazify(v)
  kw = {"return_counts": True}
  return _UniqueCounts(HostExpr([v], _unique_part(0, kw)),
                       HostExpr([v], _unique_part(1, kw)))


def unique_inverse(v):
  from spartan_tpu.expr.fio import HostExpr
  v = lazify(v)
  kw = {"return_inverse": True}
  return _UniqueInverse(HostExpr([v], _unique_part(0, kw)),
                        HostExpr([v], _unique_part(1, kw)))


def unique_all(v):
  from spartan_tpu.expr.fio import HostExpr
  v = lazify(v)
  kw = {"return_index": True, "return_inverse": True, "return_counts": True}
  return _UniqueAll(*(HostExpr([v], _unique_part(i, kw))
                      for i in _py.range(4)))


# -- polynomial family ------------------------------------------------------

polyadd = _binary_builtin(jnp.polyadd)
polysub = _binary_builtin(jnp.polysub)
polymul = _binary_builtin(jnp.polymul)
poly = _unary_builtin(jnp.poly)


def polyder(p, m=1) -> Expr:
  return map([lazify(p)], jnp.polyder, fn_kw={"m": int(m)})


def polyint(p, m=1, k=None) -> Expr:
  return map([lazify(p)], jnp.polyint, fn_kw={"m": int(m), "k": k})


def polydiv(u, v):
  """(quotient, remainder) exprs (numpy.polydiv).  jnp keeps the
  remainder at full dividend length (no data-dependent trim under
  trace); slice to numpy's deg(remainder) < deg(divisor) contract —
  that bound is static."""
  lu, lv = lazify(u), lazify(v)
  nr = _py.max(1, int(lv.shape[-1]) - 1)
  ins = [lu, lv]
  return (map(ins, lambda a, b: jnp.polydiv(a, b)[0]),
          map(ins, lambda a, b: jnp.polydiv(a, b)[1][-nr:]))


def polyfit(x, y, deg: int) -> Expr:
  return map([lazify(x), lazify(y)],
             lambda xx, yy: jnp.polyfit(xx, yy, int(deg)))


def roots(p) -> Expr:
  """Polynomial roots — host boundary (companion-matrix eig has no stable
  TPU lowering; same route as sp.linalg.eig).  Complex result: on the
  axon tunnel backend complex LEAVES cannot be device_put (documented
  runtime limitation) — fetch with .glom() there."""
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(p)], np.roots)


# -- bit packing ------------------------------------------------------------

def packbits(v, axis=None, bitorder: str = "big") -> Expr:
  return map([lazify(v)], jnp.packbits,
             fn_kw={"axis": axis, "bitorder": bitorder})


def unpackbits(v, axis=None, count=None, bitorder: str = "big") -> Expr:
  return map([lazify(v)], jnp.unpackbits,
             fn_kw={"axis": axis, "count": count, "bitorder": bitorder})


# -- creation: geomspace / tri / window functions ---------------------------

def geomspace(start, stop, num=50, dtype=None) -> Expr:
  return map([lazify(np.asarray(0.0))],
             lambda _: jnp.geomspace(start, stop, num, dtype=dtype))


def tri(N, M=None, k=0, dtype=_DEFAULT_FLOAT) -> Expr:
  return map([lazify(np.asarray(0.0))],
             lambda _: jnp.tri(int(N), M if M is None else int(M), int(k),
                               dtype=dtype))


def _window(jfn, name):
  def op(M):
    return map([lazify(np.asarray(0.0))], lambda _: jfn(int(M)))
  op.__name__ = name
  op.__doc__ = f"Lazy {name} window of length M (numpy.{name})."
  return op


bartlett = _window(jnp.bartlett, "bartlett")
blackman = _window(jnp.blackman, "blackman")
hamming = _window(jnp.hamming, "hamming")
hanning = _window(jnp.hanning, "hanning")


def kaiser(M, beta) -> Expr:
  return map([lazify(np.asarray(0.0))],
             lambda _: jnp.kaiser(int(M), beta))


# -- index helpers from existing arrays -------------------------------------

def mask_indices(n, mask_func, k=0):
  return tuple(from_numpy(i) for i in np.mask_indices(int(n), mask_func, k))


def diag_indices_from(v):
  v = lazify(v)
  if v.ndim < 2 or len(set(v.shape)) != 1:
    raise ValueError("input array must be square (all dimensions equal)")
  return diag_indices(int(v.shape[0]), v.ndim)


def tril_indices_from(v, k=0):
  v = lazify(v)
  if v.ndim != 2:
    raise ValueError("input array must be 2-d")
  return tril_indices(int(v.shape[0]), k, int(v.shape[1]))


def triu_indices_from(v, k=0):
  v = lazify(v)
  if v.ndim != 2:
    raise ValueError("input array must be 2-d")
  return triu_indices(int(v.shape[0]), k, int(v.shape[1]))


# -- split family -----------------------------------------------------------

def array_split(v, indices_or_sections, axis=0):
  """Like split but tolerates uneven section division (numpy contract:
  the first ``n % k`` sections get one extra element)."""
  v = lazify(v)
  n = int(v.shape[axis])
  if isinstance(indices_or_sections, (int, np.integer)):
    k = int(indices_or_sections)
    base, extra = n // k, n % k
    sizes = [base + 1] * extra + [base] * (k - extra)
    pts = np.cumsum([0] + sizes)
    idxs = list(pts[1:-1])
  else:
    idxs = [int(i) for i in indices_or_sections]
  return split(v, idxs, axis=axis)


def hsplit(v, indices_or_sections):
  v = lazify(v)
  return split(v, indices_or_sections, axis=1 if v.ndim > 1 else 0)


def vsplit(v, indices_or_sections):
  v = lazify(v)
  if v.ndim < 2:
    raise ValueError("vsplit only works on arrays of 2 or more dimensions")
  return split(v, indices_or_sections, axis=0)


def dsplit(v, indices_or_sections):
  v = lazify(v)
  if v.ndim < 3:
    raise ValueError("dsplit only works on arrays of 3 or more dimensions")
  return split(v, indices_or_sections, axis=2)


# -- driver-side helpers / eager boundaries ---------------------------------

def einsum_path(subscripts, *operands, optimize="greedy"):
  """Contraction-order metadata (driver-side; delegates to numpy over
  zero-filled shape stand-ins — the path depends only on shapes)."""
  dummies = [np.broadcast_to(np.zeros(()), lazify(o).shape)
             for o in operands]
  return np.einsum_path(subscripts, *dummies, optimize=optimize)


def fromiter(iterable, dtype, count=-1) -> Expr:
  return from_numpy(np.fromiter(iterable, dtype, count=count))


def from_dlpack(x) -> Expr:
  return lazify(jnp.from_dlpack(x))


def asarray_chkfinite(v, dtype=None) -> Expr:
  a = np.asarray(lazify(v).glom())
  if not np.isfinite(a).all():
    raise ValueError("array must not contain infs or NaNs")
  return from_numpy(a if dtype is None else a.astype(dtype))


def array_equiv(a, b) -> bool:
  return bool(np.array_equiv(lazify(a).glom(), lazify(b).glom()))


def real_if_close(v, tol: float = 100.0) -> Expr:
  """Eager (the RESULT DTYPE is data-dependent: complex in, maybe-real
  out — not traceable)."""
  return from_numpy(np.real_if_close(np.asarray(lazify(v).glom()), tol=tol))


def trim_zeros(v, trim: str = "fb") -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(v)], lambda x: np.trim_zeros(x, trim))


def setxor1d(a, b) -> Expr:
  from spartan_tpu.expr.fio import HostExpr
  return HostExpr([lazify(a), lazify(b)], np.setxor1d)


def iscomplexobj(v) -> bool:
  """Driver-side dtype predicate (numpy contract: about the TYPE)."""
  return np.dtype(lazify(v).dtype).kind == "c"


def isrealobj(v) -> bool:
  return np.dtype(lazify(v).dtype).kind != "c"


trapezoid = trapz  # the post-numpy-2 name


# -- misc -------------------------------------------------------------------

def allclose(a, b, rtol=1e-05, atol=1e-08) -> bool:
  return bool(np.allclose(lazify(a).glom(), lazify(b).glom(),
                          rtol=rtol, atol=atol))


def array_equal(a, b) -> bool:
  return bool(np.array_equal(lazify(a).glom(), lazify(b).glom()))


__all__ = [
    "fmod", "inner", "logspace", "repeat", "flip", "roll", "isclose",
    "meshgrid", "split", "nanargmax", "nanargmin", "rad2deg", "deg2rad",
    "degrees", "radians", "cbrt", "fabs", "positive", "erf", "erfc",
    "atleast_1d",
    "atleast_2d", "real", "imag", "remainder", "cross", "kron", "choose",
    "around", "moveaxis", "dstack", "column_stack", "diff", "gradient",
    "cov", "corrcoef", "average", "einsum",
    # creation
    "zeros", "ones", "full", "empty", "zeros_like", "ones_like", "full_like",
    "arange", "linspace", "eye", "identity", "rand", "randn", "randint",
    "from_numpy", "as_array", "ndarray", "set_random_seed",
    # elementwise
    "sqrt", "exp", "exp2", "expm1", "log", "log2", "log10", "log1p", "abs",
    "absolute", "sign", "negative", "reciprocal", "square", "sin", "cos",
    "tan", "arcsin", "arccos", "arctan", "sinh", "cosh", "tanh", "ceil",
    "floor", "rint", "trunc", "isnan", "isinf", "isfinite", "logical_not",
    "conj", "add", "subtract", "multiply", "divide", "true_divide",
    "floor_divide", "mod", "power", "maximum", "minimum", "arctan2", "hypot",
    "equal", "not_equal", "less", "less_equal", "greater", "greater_equal",
    "logical_and", "logical_or", "logical_xor", "bitwise_and", "bitwise_or",
    "bitwise_xor", "bitwise_not", "invert", "left_shift", "right_shift",
    "round", "clip", "where",
    "astype",
    # reductions
    "sum", "prod", "mean", "std", "var", "max", "min", "argmax", "argmin",
    "all", "any", "count_nonzero", "nansum", "nanmean", "nanmax", "nanmin",
    "nanvar", "nanstd", "nanmedian", "nanpercentile", "nanquantile",
    "norm", "ptp",
    # scans
    "cumsum", "cumprod", "cummax", "cummin", "scan",
    # linalg
    "dot", "outer", "tensordot", "matmul", "vdot", "einsum", "diag", "diagonal",
    "trace", "tril", "triu",
    # shape
    "reshape", "ravel", "flatten", "transpose", "swapaxes", "concatenate",
    "stack", "vstack", "hstack", "tile", "expand_dims", "squeeze", "take",
    "broadcast_to",
    # sort/search
    "sort", "argsort", "percentile", "median", "quantile", "partition",
    "argpartition", "bincount", "unique",
    "histogram", "take_along_axis", "searchsorted", "digitize",
    "nonzero",
    # stencil
    "stencil", "maxpool", "avgpool",
    # write
    "write", "assign",
    # misc
    "allclose", "array_equal",
    # numpy-parity additions (r3 surface audit)
    "asarray", "array", "copy", "append", "fmax", "fmin", "logaddexp",
    "nan_to_num", "interp", "rot90", "flatnonzero", "unravel_index",
    "fill_diagonal", "amax", "amin", "permutation", "choice",
    # second sweep
    "sinc", "signbit", "angle", "iscomplex", "isreal", "heaviside",
    "copysign", "nextafter", "float_power", "gcd", "lcm", "ldexp",
    "polyval", "modf", "frexp", "divmod", "pad", "convolve", "correlate",
    "vander", "ediff1d", "trapz", "insert", "delete", "apply_along_axis",
    "msort", "isin", "in1d", "select", "argwhere", "extract", "compress",
    "setdiff1d", "union1d", "intersect1d", "indices", "fromfunction",
    "triu_indices", "tril_indices", "diag_indices", "nanprod",
    "nancumsum", "nancumprod",
    # third sweep (tools/numpy_parity.py full-namespace audit)
    "arccosh", "arcsinh", "arctanh", "acos", "acosh", "asin", "asinh",
    "atan", "atanh", "atan2", "concat", "conjugate", "pow",
    "bitwise_invert", "bitwise_left_shift", "bitwise_right_shift",
    "isneginf", "isposinf", "spacing", "i0", "bitwise_count", "fix",
    "logaddexp2", "sort_complex", "atleast_3d", "vecdot",
    "matrix_transpose", "permute_dims", "fliplr", "flipud", "empty_like",
    "diagflat", "resize", "rollaxis", "unwrap", "lexsort",
    "ravel_multi_index", "ix_", "broadcast_shapes", "broadcast_arrays",
    "block", "apply_over_axes", "histogram_bin_edges", "histogram2d",
    "histogramdd", "unique_values", "unique_counts", "unique_inverse",
    "unique_all", "polyadd", "polysub", "polymul", "poly", "polyder",
    "polyint", "polydiv", "polyfit", "roots", "packbits", "unpackbits",
    "geomspace", "tri", "bartlett", "blackman", "hamming", "hanning",
    "kaiser", "mask_indices", "diag_indices_from", "tril_indices_from",
    "triu_indices_from", "array_split", "hsplit", "vsplit", "dsplit",
    "einsum_path", "fromiter", "from_dlpack", "asarray_chkfinite",
    "array_equiv", "real_if_close", "trim_zeros", "setxor1d",
    "iscomplexobj", "isrealobj", "trapezoid",
]
