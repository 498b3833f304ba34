"""NumPy broadcasting across tiled arrays (reference: test_broadcast.py —
the ``Broadcast`` wrapper in distarray.py; SURVEY.md §4).  In the rebuild
broadcasting is jnp broadcasting inside the fused region; XLA's sharding
propagation does the cross-tile replication the reference's per-tile
fetches did."""

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.util import Assert


def test_row_vector(rng):
  a = rng.standard_normal((12, 16))
  v = rng.standard_normal((16,))
  Assert.all_eq(sp.from_numpy(a) + sp.from_numpy(v), a + v)


def test_col_vector(rng):
  a = rng.standard_normal((12, 16))
  v = rng.standard_normal((12, 1))
  Assert.all_eq(sp.from_numpy(a) * sp.from_numpy(v), a * v)


def test_outer_broadcast(rng):
  r = rng.standard_normal((8, 1))
  c = rng.standard_normal((1, 10))
  Assert.all_eq(sp.from_numpy(r) + sp.from_numpy(c), r + c)


def test_scalar_array(rng):
  a = rng.standard_normal((8, 8))
  Assert.all_eq(sp.from_numpy(a) + sp.from_numpy(np.float64(3.0)), a + 3.0)


def test_rank_promotion(rng):
  a = rng.standard_normal((4, 5, 6))
  b = rng.standard_normal((5, 6))
  Assert.all_eq(sp.from_numpy(a) - sp.from_numpy(b), a - b)


def test_broadcast_into_reduce(rng):
  a = rng.standard_normal((12, 16))
  v = rng.standard_normal((16,))
  got = ((sp.from_numpy(a) - sp.from_numpy(v)) ** 2).sum(axis=1)
  Assert.all_close(got, ((a - v) ** 2).sum(axis=1), rtol=1e-12)
