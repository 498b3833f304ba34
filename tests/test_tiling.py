"""Tiling / sharding mapping tests (extent grid ↔ PartitionSpec)."""

import numpy as np
from jax.sharding import PartitionSpec as P

from spartan_tpu.core import mesh as mesh_mod
from spartan_tpu.core.tiling import Tiling, auto_tiling, choose_spec


def test_choose_spec_2d(cluster):
  spec = choose_spec((64, 64), cluster)
  # both dims divisible: 2-D tile grid
  assert set(e for e in tuple(spec)) == {"x", "y"}


def test_choose_spec_1d_gang(cluster):
  spec = choose_spec((64,), cluster, split_dims=[0])
  tiling = Tiling(cluster, spec)
  assert tiling.num_tiles((64,)) == 8  # all 8 devices on one axis


def test_choose_spec_indivisible(cluster):
  # 10 not divisible by 4 → that dim must not get the 'y' axis
  spec = choose_spec((8, 10), cluster)
  t = Tiling(cluster, spec)
  g = t.grid_shape((8, 10))
  assert 10 % g[1] == 0 and 8 % g[0] == 0


def test_grid_and_extents(cluster):
  t = Tiling(cluster, P("x", "y"))
  exts = t.extents((8, 8))
  assert len(exts) == 8
  assert t.grid_shape((8, 8)) == (2, 4)
  assert t.tile_shape((8, 8)) == (4, 2)
  total = sum(e.size for e in exts)
  assert total == 64
  assert exts[0].ul == (0, 0)


def test_replicated(cluster):
  t = Tiling(cluster, P())
  assert t.num_tiles((4, 4)) == 1
  assert t.extents((4, 4))[0].shape == (4, 4)


def test_tile_hint(cluster):
  # reference-style hint: tile shape (4, 64) on (64, 64) → split dim 0 only
  t = auto_tiling((64, 64), tile_hint=(4, 64), mesh=cluster)
  g = t.grid_shape((64, 64))
  assert g[1] == 1 and g[0] > 1
