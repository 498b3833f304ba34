"""Native C extension: extent fast path + CSR merge (SURVEY.md §2.2).
Skipped when the .so has not been built (python -m spartan_tpu._ext.build)."""

import numpy as np
import pytest
import scipy.sparse as ss

from spartan_tpu._ext import HAVE_NATIVE

pytestmark = pytest.mark.skipif(not HAVE_NATIVE,
                                reason="native extension not built")


def test_intersect_matches_python():
  from spartan_tpu._ext import _extent_c
  from spartan_tpu.core import extent
  cases = [
      (((0, 0), (5, 5)), ((3, 3), (8, 8))),
      (((0, 0), (5, 5)), ((6, 6), (8, 8))),
      (((1,), (9,)), ((4,), (20,))),
  ]
  for a, b in cases:
    got = _extent_c.intersect(a, b)
    want = extent.intersection(
        extent.TileExtent(a[0], a[1]), extent.TileExtent(b[0], b[1]))
    if want is None:
      assert got is None
    else:
      assert got == (want.ul, want.lr)


def test_find_overlapping_matches_python(rng):
  from spartan_tpu._ext import _extent_c
  from spartan_tpu.core import extent
  tiles = [extent.TileExtent((r, c), (r + 5, c + 5), (20, 20))
           for r in range(0, 20, 5) for c in range(0, 20, 5)]
  region = extent.TileExtent((3, 7), (14, 18), (20, 20))
  # the module-level helper routes through the C path when available
  got = sorted((e.ul, ov.ul, ov.lr)
               for e, ov in extent.find_overlapping(tiles, region))
  want = []
  for e in tiles:
    ov = extent.intersection(e, region)
    if ov is not None:
      want.append((e.ul, ov.ul, ov.lr))
  assert got == sorted(want)


def test_csr_merge_matches_scipy():
  from spartan_tpu.backend.sparse import merge_csr
  rs = np.random.RandomState(0)
  a = ss.random(40, 30, density=0.1, random_state=rs, format="csr")
  b = ss.random(40, 30, density=0.1, random_state=rs, format="csr")
  got = merge_csr(a, b)
  want = (a + b).tocsr()
  np.testing.assert_allclose(got.toarray(), want.toarray(), atol=1e-12)


def test_csr_merge_shape_mismatch():
  from spartan_tpu.backend.sparse import merge_csr
  with pytest.raises(ValueError):
    merge_csr(ss.eye(3).tocsr(), ss.eye(4).tocsr())
