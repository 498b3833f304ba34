"""Reshape / transpose / ravel / concat (reference: test_reshape.py,
test_transpose.py; SURVEY.md §4)."""

import numpy as np
import pytest

import spartan_tpu as sp
from spartan_tpu.util import Assert


def test_reshape(rng):
  a = rng.standard_normal((12, 16))
  sa = sp.from_numpy(a)
  Assert.all_eq(sa.reshape(16, 12), a.reshape(16, 12))
  Assert.all_eq(sa.reshape(4, 48), a.reshape(4, 48))
  Assert.all_eq(sa.reshape((2, 2, 48)), a.reshape(2, 2, 48))


def test_ravel(rng):
  a = rng.standard_normal((8, 9))
  Assert.all_eq(sp.from_numpy(a).ravel(), a.ravel())


def test_transpose(rng):
  a = rng.standard_normal((12, 16))
  sa = sp.from_numpy(a)
  Assert.all_eq(sa.T, a.T)
  b = rng.standard_normal((3, 4, 5))
  sb = sp.from_numpy(b)
  Assert.all_eq(sb.transpose(2, 0, 1), b.transpose(2, 0, 1))
  Assert.all_eq(sp.swapaxes(sb, 0, 2), np.swapaxes(b, 0, 2))


def test_transpose_then_dot(rng):
  a = rng.standard_normal((16, 8))
  sa = sp.from_numpy(a)
  Assert.all_close(sp.dot(sa.T, sa), a.T @ a, rtol=1e-12)


def test_concatenate_stack(rng):
  a = rng.standard_normal((4, 6))
  b = rng.standard_normal((4, 6))
  sa, sb = sp.from_numpy(a), sp.from_numpy(b)
  Assert.all_eq(sp.concatenate([sa, sb], axis=0), np.concatenate([a, b], 0))
  Assert.all_eq(sp.concatenate([sa, sb], axis=1), np.concatenate([a, b], 1))
  Assert.all_eq(sp.stack([sa, sb]), np.stack([a, b]))
  Assert.all_eq(sp.vstack([sa, sb]), np.vstack([a, b]))
  Assert.all_eq(sp.hstack([sa, sb]), np.hstack([a, b]))


def test_expand_squeeze_tile(rng):
  a = rng.standard_normal((6, 1, 8))
  sa = sp.from_numpy(a)
  Assert.all_eq(sp.squeeze(sa, axis=1), a.squeeze(1))
  Assert.all_eq(sp.expand_dims(sa, 0), a[None])
  v = rng.standard_normal((5,))
  Assert.all_eq(sp.tile(sp.from_numpy(v), 3), np.tile(v, 3))
