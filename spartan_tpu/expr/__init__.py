"""Lazy expression layer: tracer nodes, optimizer, builtins.

Note: function names that collide with submodule names (``map``, ``reduce``,
``dot``, ``scan``, ``shuffle``, ``write``, ``ndarray``, ``optimize``) are NOT
re-exported here — ``spartan_tpu.expr.map`` stays the module.  The functions
live at the top-level ``spartan_tpu`` namespace (reference layout: builtins
re-exported from ``spartan/__init__.py``).
"""

from spartan_tpu.expr.base import (DictExpr, Expr, ListExpr, NotShapeable,
                                   TupleExpr, Val, evaluate, force, glom,
                                   lazify)
from spartan_tpu.expr.map import MapExpr, MapWithLocationExpr, map_with_location
from spartan_tpu.expr.reduce import ReduceExpr, dtype_for_reduction
from spartan_tpu.expr.dot import DotExpr, OuterExpr, TensorDotExpr
from spartan_tpu.expr.scan import ScanExpr
from spartan_tpu.expr.shuffle import ShuffleExpr
from spartan_tpu.expr.ndarray import CreationExpr
from spartan_tpu.expr.slice import (BooleanMaskExpr, FancyIndexExpr,
                                    SliceExpr, make_slice)
from spartan_tpu.expr.write import WriteArrayExpr, assign
from spartan_tpu.expr.fio import (CheckpointExpr, HostExpr, checkpoint,
                                  from_file, load, save)
