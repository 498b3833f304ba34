"""Core substrate: extent algebra, mesh management, tiling, SpartanArray."""

from spartan_tpu.core import extent
from spartan_tpu.core.extent import TileExtent
from spartan_tpu.core.mesh import get_mesh, make_mesh, set_default_mesh, with_mesh
from spartan_tpu.core.tiling import Tiling, auto_tiling, choose_spec, replicated_tiling
from spartan_tpu.core.array import SpartanArray, from_numpy, from_jax, create

__all__ = [
    "extent", "TileExtent", "get_mesh", "make_mesh", "set_default_mesh",
    "with_mesh", "Tiling", "auto_tiling", "choose_spec", "replicated_tiling",
    "SpartanArray", "from_numpy", "from_jax", "create",
]
