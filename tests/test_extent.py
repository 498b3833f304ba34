"""Pure-geometry tests (reference: test_extent.py — the only truly
single-process unit tests, SURVEY.md §4)."""

import pytest

from spartan_tpu.core import extent
from spartan_tpu.core.extent import TileExtent


def test_basic_properties():
  e = TileExtent((2, 3), (5, 10), (8, 12))
  assert e.shape == (3, 7)
  assert e.size == 21
  assert e.ndim == 2
  assert e.to_slice() == (slice(2, 5), slice(3, 10))


def test_from_shape():
  e = extent.from_shape((4, 6))
  assert e.ul == (0, 0) and e.lr == (4, 6)
  assert e.array_shape == (4, 6)


def test_intersection():
  a = TileExtent((0, 0), (5, 5), (10, 10))
  b = TileExtent((3, 3), (8, 8), (10, 10))
  i = extent.intersection(a, b)
  assert i.ul == (3, 3) and i.lr == (5, 5)
  c = TileExtent((6, 6), (8, 8), (10, 10))
  assert extent.intersection(a, c) is None
  assert extent.intersection(None, a) is None


def test_contains():
  a = TileExtent((0, 0), (5, 5), (10, 10))
  b = TileExtent((1, 1), (4, 4), (10, 10))
  assert a.contains(b) and not b.contains(a)
  assert a.contains_point((4, 4)) and not a.contains_point((5, 0))


def test_offset_from_and_slice():
  base = TileExtent((2, 2), (8, 8), (10, 10))
  sub = TileExtent((3, 4), (5, 6), (10, 10))
  rel = extent.offset_from(base, sub)
  assert rel.ul == (1, 2) and rel.lr == (3, 4)
  assert extent.offset_slice(base, sub) == (slice(1, 3), slice(2, 4))
  with pytest.raises(ValueError):
    extent.offset_from(sub, base)


def test_compute_slice():
  base = TileExtent((2, 2), (8, 8), (10, 10))
  sub = extent.compute_slice(base, (slice(1, 3), slice(0, 2)))
  assert sub.ul == (3, 2) and sub.lr == (5, 4)


def test_from_slice():
  e = extent.from_slice((slice(1, 4), 2), (10, 10))
  assert e.ul == (1, 2) and e.lr == (4, 3)
  e = extent.from_slice(slice(None), (7,))
  assert e.ul == (0,) and e.lr == (7,)
  e = extent.from_slice((Ellipsis, slice(0, 2)), (3, 4, 5))
  assert e.ul == (0, 0, 0) and e.lr == (3, 4, 2)
  e = extent.from_slice((-1,), (10,))
  assert e.ul == (9,) and e.lr == (10,)


def test_find_overlapping():
  tiles = [TileExtent((r, c), (r + 5, c + 5), (10, 10))
           for r in (0, 5) for c in (0, 5)]
  region = TileExtent((3, 3), (7, 7), (10, 10))
  hits = dict(extent.find_overlapping(tiles, region))
  assert len(hits) == 4
  ov = hits[tiles[0]]
  assert ov.ul == (3, 3) and ov.lr == (5, 5)


def test_shift_clip():
  e = TileExtent((0, 0), (4, 4), (10, 10))
  s = extent.shift(e, (8, 0))
  assert s.ul == (8, 0) and s.lr == (10, 4)
  assert extent.shift(e, (-4, 0)) is None  # clipped to empty
  gone = extent.shift(TileExtent((0, 0), (2, 2), (10, 10)), (-5, -5))
  assert gone is None
  unclipped = extent.shift(e, (-4, 0), clip=False)
  assert unclipped.ul == (-4, 0)


def test_ravel_unravel():
  e = TileExtent((1, 2), (3, 4), (5, 6))
  assert e.ravelled_pos() == 1 * 6 + 2
  assert extent.unravelled_pos(8, (5, 6)) == (1, 2)
  assert extent.ravelled_pos((1, 2), (5, 6)) == 8
  assert e.to_global(0) == 8


def test_drop_axis_transpose():
  e = TileExtent((1, 2), (3, 4), (5, 6))
  assert e.drop_axis(0).ul == (2,) and e.drop_axis(1).ul == (1,)
  assert e.drop_axis(None).ndim == 0
  t = e.transpose()
  assert t.ul == (2, 1) and t.array_shape == (6, 5)
