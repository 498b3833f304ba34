"""Local-op IR: the fused per-region computation.

TPU-native rebuild of the reference's local-op IR (reference:
``spartan/expr/local.py`` — ``LocalExpr``/``LocalInput``/``FnCallExpr``
describing the fused per-tile kernel that map-fusion builds, with a
pretty-printer and a compile-to-python/Parakeet backend; SURVEY.md §2.1).

Here the IR compiles to a *jax-traceable callable*: the fusion passes in
``optimize.py`` compose chains of map kernels into one LocalExpr tree, and
the evaluator traces it straight into the enclosing jitted region — XLA
plays the role the reference delegated to Parakeet.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from spartan_tpu.expr.base import fn_key


class LocalExpr:
  """Base class for local-computation nodes."""

  def evaluate(self, inputs: Sequence[Any]) -> Any:
    raise NotImplementedError

  def signature(self) -> Tuple:
    raise NotImplementedError

  def pretty(self, indent: int = 0) -> str:
    raise NotImplementedError

  def max_input(self) -> int:
    """Highest input slot referenced (−1 if none)."""
    raise NotImplementedError

  def __repr__(self):
    return self.pretty()


class LocalInput(LocalExpr):
  """Reads fused-region input slot ``idx``."""

  __slots__ = ("idx",)

  def __init__(self, idx: int):
    self.idx = idx

  def evaluate(self, inputs):
    return inputs[self.idx]

  def signature(self):
    return ("in", self.idx)

  def pretty(self, indent=0):
    return " " * indent + f"%{self.idx}"

  def max_input(self):
    return self.idx


class LocalConst(LocalExpr):
  """A small captured constant (scalars baked into the kernel)."""

  __slots__ = ("value",)

  def __init__(self, value):
    self.value = value

  def evaluate(self, inputs):
    return self.value

  def signature(self):
    return ("const", repr(self.value))

  def pretty(self, indent=0):
    return " " * indent + f"const({self.value!r})"

  def max_input(self):
    return -1


class FnCallExpr(LocalExpr):
  """Apply ``fn(*deps, **kw)``."""

  __slots__ = ("fn", "deps", "kw", "pretty_name")

  def __init__(self, fn: Callable, deps: Sequence[LocalExpr],
               kw: Optional[Dict[str, Any]] = None,
               pretty_name: Optional[str] = None):
    self.fn = fn
    self.deps = list(deps)
    self.kw = dict(kw or {})
    self.pretty_name = pretty_name or getattr(fn, "__name__", "fn")

  def evaluate(self, inputs):
    args = [d.evaluate(inputs) for d in self.deps]
    return self.fn(*args, **self.kw)

  def signature(self):
    return ("call", fn_key(self.fn),
            tuple(d.signature() for d in self.deps),
            tuple(sorted((k, repr(v)) for k, v in self.kw.items())))

  def pretty(self, indent=0):
    pad = " " * indent
    args = ", ".join(d.pretty() for d in self.deps)
    kw = (", " + ", ".join(f"{k}={v!r}" for k, v in self.kw.items())
          if self.kw else "")
    return f"{pad}{self.pretty_name}({args}{kw})"

  def max_input(self):
    return max([d.max_input() for d in self.deps], default=-1)


def substitute_inputs(node: LocalExpr,
                      mapping: Dict[int, LocalExpr]) -> LocalExpr:
  """Replace ``LocalInput(i)`` with ``mapping[i]`` (for splicing a producer
  kernel into a consumer during map-map fusion)."""
  if isinstance(node, LocalInput):
    return mapping.get(node.idx, node)
  if isinstance(node, FnCallExpr):
    return FnCallExpr(node.fn,
                      [substitute_inputs(d, mapping) for d in node.deps],
                      node.kw, node.pretty_name)
  return node


def shift_inputs(node: LocalExpr, offset_map: Dict[int, int]) -> LocalExpr:
  """Renumber input slots."""
  if isinstance(node, LocalInput):
    return LocalInput(offset_map[node.idx])
  if isinstance(node, FnCallExpr):
    return FnCallExpr(node.fn,
                      [shift_inputs(d, offset_map) for d in node.deps],
                      node.kw, node.pretty_name)
  return node


def compile_local(node: LocalExpr) -> Callable:
  """Compile a LocalExpr tree to a callable over region inputs."""
  def run(*inputs):
    return node.evaluate(inputs)
  return run
