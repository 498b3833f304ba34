"""Explicit collective primitives (shard_map + ppermute/all_to_all) vs
numpy oracles — the CP-ring and Ulysses parity items (SURVEY.md §2.3)."""

import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

import spartan_tpu as sp
from spartan_tpu.parallel import (all_to_all_retile, halo_exchange,
                                  map_tiles, psum_across, reshard,
                                  ring_shift, stencil1d_halo)


def test_reshard_roundtrip(rng, cluster):
  a = rng.standard_normal((16, 8))
  arr = sp.from_numpy(a).evaluate()
  moved = reshard(arr, P(None, ("x", "y")))
  np.testing.assert_array_equal(moved.glom(), a)
  assert tuple(moved.tiling.spec) == (None, ("x", "y"))
  back = reshard(moved, P(("x", "y"), None))
  np.testing.assert_array_equal(back.glom(), a)


def test_ring_shift_matches_roll(rng, cluster):
  a = rng.standard_normal((32, 4))
  for shift in (1, 2, -1, -3, 0):
    got = np.asarray(ring_shift(sp.from_numpy(a).evaluate(), shift))
    np.testing.assert_array_equal(got, np.roll(a, shift, axis=0))


def test_ring_shift_bounds(rng, cluster):
  a = rng.standard_normal((16, 2))  # 2 rows/shard on 8 shards
  with pytest.raises(ValueError):
    ring_shift(sp.from_numpy(a).evaluate(), 5)


def test_halo_exchange(rng, cluster):
  a = rng.standard_normal((16, 3))  # 2 rows per shard over 8 shards
  out = np.asarray(halo_exchange(sp.from_numpy(a).evaluate(), 1))
  n, h, per = 8, 1, 2
  assert out.shape == (16 + 2 * h * n, 3)
  blocks = out.reshape(n, per + 2 * h, 3)
  for i in range(n):
    want_top = a[i * per - h:i * per] if i > 0 else np.zeros((h, 3))
    want_bot = a[(i + 1) * per:(i + 1) * per + h] if i < n - 1 else np.zeros((h, 3))
    np.testing.assert_array_equal(blocks[i, :h], want_top)
    np.testing.assert_array_equal(blocks[i, h:h + per], a[i * per:(i + 1) * per])
    np.testing.assert_array_equal(blocks[i, h + per:], want_bot)


def test_stencil1d_halo_matches_numpy(rng, cluster):
  a = rng.standard_normal((64, 5))
  k = np.array([0.25, 0.5, 0.25])
  got = np.asarray(stencil1d_halo(sp.from_numpy(a).evaluate(), k))
  padded = np.vstack([np.zeros((1, 5)), a, np.zeros((1, 5))])
  want = sum(padded[i:i + 64] * k[i] for i in range(3))
  np.testing.assert_allclose(got, want, atol=1e-12)


def test_all_to_all_retile(rng, cluster):
  a = rng.standard_normal((16, 24))
  got = all_to_all_retile(sp.from_numpy(a).evaluate())
  np.testing.assert_array_equal(np.asarray(got), a)
  # sharded by columns now
  assert got.sharding.spec[1] is not None or got.sharding.spec[0] is None


def test_psum_across(rng, cluster):
  a = rng.standard_normal((16, 4))
  got = np.asarray(psum_across(sp.from_numpy(a).evaluate()))
  # per-shard partials (2 rows each) summed across 8 shards
  want = a.reshape(8, 2, 4).sum(axis=0)
  np.testing.assert_allclose(got, want, atol=1e-12)


def test_map_tiles(rng, cluster):
  """Per-tile kernel dispatch with extent info (the blob_ctx.map analogue)."""
  import jax.numpy as jnp
  a = rng.standard_normal((16, 8))
  arr = sp.from_numpy(a).evaluate()

  def kernel(block, ul):
    # add the tile's global row offset to every element
    return block + ul[0].astype(block.dtype)

  out = map_tiles(arr, kernel)
  grid = arr.tiling.grid_shape(arr.shape)
  tile = arr.tiling.tile_shape(arr.shape)
  want = a.copy()
  for e in arr.tile_extents():
    want[e.to_slice()] += e.ul[0]
  np.testing.assert_allclose(np.asarray(out.glom()), want, atol=1e-12)


def test_map_tiles_shape_guard(rng, cluster):
  arr = sp.from_numpy(rng.standard_normal((16, 8))).evaluate()
  with pytest.raises(Exception):
    map_tiles(arr, lambda b, ul: b[:1])


def test_stencil1d_even_kernel_rejected(cluster):
  with pytest.raises(ValueError, match="odd-length"):
    stencil1d_halo(sp.from_numpy(np.ones((16, 2))).evaluate(),
                   np.ones(4))


def test_stencil1d_wider_kernel(rng, cluster):
  a = rng.standard_normal((64, 3))
  k = rng.standard_normal(5)
  got = np.asarray(stencil1d_halo(sp.from_numpy(a).evaluate(), k))
  padded = np.vstack([np.zeros((2, 3)), a, np.zeros((2, 3))])
  want = sum(padded[i:i + 64] * k[i] for i in range(5))
  np.testing.assert_allclose(got, want, atol=1e-12)
