"""Differential coverage for the third numpy-parity sweep
(tools/numpy_parity.py full-namespace audit — SURVEY.md §2.1 builtins
row).  Oracle: numpy on the same inputs, per the reference test strategy
(SURVEY.md §4)."""

import numpy as np
import pytest

import spartan_tpu as sp


def _f(x):
  return sp.from_numpy(x)


def test_inverse_hyperbolics_and_array_api_spellings(rng, cluster):
  a = rng.uniform(-0.9, 0.9, (5, 7))
  h = rng.uniform(1.1, 3.0, (5, 7))
  np.testing.assert_allclose(sp.arcsinh(_f(a)).glom(), np.arcsinh(a),
                             rtol=1e-12)
  np.testing.assert_allclose(sp.arccosh(_f(h)).glom(), np.arccosh(h),
                             rtol=1e-12)
  np.testing.assert_allclose(sp.arctanh(_f(a)).glom(), np.arctanh(a),
                             rtol=1e-12)
  # numpy 2.0 spellings are the same callables
  assert sp.acos is sp.arccos and sp.atan2 is sp.arctan2
  assert sp.concat is sp.concatenate and sp.pow is sp.power
  assert sp.bitwise_invert is sp.invert
  assert sp.permute_dims is sp.transpose
  assert sp.trapezoid is sp.trapz
  np.testing.assert_allclose(sp.atanh(_f(a)).glom(), np.arctanh(a),
                             rtol=1e-12)


def test_small_elementwise_additions(rng, cluster):
  a = rng.standard_normal((4, 6)) * 3
  b = rng.standard_normal((4, 6))
  iv = rng.integers(0, 255, (4, 6)).astype(np.uint8)
  cases = [
      (sp.isneginf(_f(np.array([np.inf, -np.inf, 1.0]))),
       np.isneginf(np.array([np.inf, -np.inf, 1.0]))),
      (sp.isposinf(_f(np.array([np.inf, -np.inf, 1.0]))),
       np.isposinf(np.array([np.inf, -np.inf, 1.0]))),
      (sp.fix(_f(a)), np.fix(a)),
      (sp.spacing(_f(np.abs(a))), np.spacing(np.abs(a))),
      (sp.i0(_f(a)), np.i0(a)),
      (sp.logaddexp2(_f(a), _f(b)), np.logaddexp2(a, b)),
      (sp.bitwise_count(_f(iv)), np.bitwise_count(iv)),
  ]
  for got, want in cases:
    np.testing.assert_allclose(np.asarray(got.glom()), want, rtol=1e-7)


def test_vecdot_matrix_transpose(rng, cluster):
  a = rng.standard_normal((3, 5, 4))
  b = rng.standard_normal((3, 5, 4))
  np.testing.assert_allclose(sp.vecdot(_f(a), _f(b)).glom(),
                             np.vecdot(a, b), rtol=1e-12)
  np.testing.assert_array_equal(sp.matrix_transpose(_f(a)).glom(),
                                np.matrix_transpose(a))


def test_flip_resize_roll_family(rng, cluster):
  a = rng.standard_normal((4, 6))
  t = rng.standard_normal((2, 3, 4, 5))
  np.testing.assert_array_equal(sp.fliplr(_f(a)).glom(), np.fliplr(a))
  np.testing.assert_array_equal(sp.flipud(_f(a)).glom(), np.flipud(a))
  assert sp.empty_like(_f(a)).glom().shape == a.shape
  np.testing.assert_array_equal(sp.diagflat(_f(a[0]), k=1).glom(),
                                np.diagflat(a[0], k=1))
  np.testing.assert_array_equal(sp.resize(_f(a), (3, 10)).glom(),
                                np.resize(a, (3, 10)))
  for ax, st in [(2, 0), (0, 3), (1, 2)]:
    np.testing.assert_array_equal(sp.rollaxis(_f(t), ax, st).glom(),
                                  np.rollaxis(t, ax, st))
  p = np.cumsum(rng.uniform(0, 2.5, 32))
  np.testing.assert_allclose(sp.unwrap(_f(p)).glom(), np.unwrap(p),
                             rtol=1e-12)
  with pytest.raises(ValueError):
    sp.fliplr(_f(a[0]))


def test_index_helpers(rng, cluster):
  k1 = rng.integers(0, 5, 12)
  k2 = rng.integers(0, 5, 12)
  np.testing.assert_array_equal(sp.lexsort((_f(k1), _f(k2))).glom(),
                                np.lexsort((k1, k2)))
  mi = (np.array([1, 2, 0]), np.array([3, 0, 1]))
  np.testing.assert_array_equal(
      sp.ravel_multi_index((_f(mi[0]), _f(mi[1])), (4, 5)).glom(),
      np.ravel_multi_index(mi, (4, 5)))
  ga, gb = sp.ix_(_f(np.array([0, 2])), _f(np.array([1, 3, 4])))
  na, nb = np.ix_(np.array([0, 2]), np.array([1, 3, 4]))
  np.testing.assert_array_equal(ga.glom(), na)
  np.testing.assert_array_equal(gb.glom(), nb)
  assert sp.broadcast_shapes((3, 1), (1, 4)) == (3, 4)
  outs = sp.broadcast_arrays(_f(np.ones((3, 1))), _f(np.ones((1, 4))))
  assert [o.glom().shape for o in outs] == [(3, 4), (3, 4)]
  for mk, nk in zip(sp.mask_indices(4, np.triu, 1),
                    np.mask_indices(4, np.triu, 1)):
    np.testing.assert_array_equal(mk.glom(), nk)
  m = rng.standard_normal((5, 5))
  for got, want in zip(sp.diag_indices_from(_f(m)),
                       np.diag_indices_from(m)):
    np.testing.assert_array_equal(got.glom(), want)
  for got, want in zip(sp.tril_indices_from(_f(m), -1),
                       np.tril_indices_from(m, -1)):
    np.testing.assert_array_equal(got.glom(), want)
  for got, want in zip(sp.triu_indices_from(_f(m), 1),
                       np.triu_indices_from(m, 1)):
    np.testing.assert_array_equal(got.glom(), want)


def test_block_and_apply_over_axes(rng, cluster):
  A = rng.standard_normal((2, 3))
  B = rng.standard_normal((2, 2))
  C = rng.standard_normal((1, 3))
  D = rng.standard_normal((1, 2))
  got = sp.block([[_f(A), _f(B)], [_f(C), _f(D)]]).glom()
  np.testing.assert_array_equal(got, np.block([[A, B], [C, D]]))
  t = rng.standard_normal((2, 3, 4))
  np.testing.assert_allclose(
      sp.apply_over_axes(sp.sum, _f(t), [0, 2]).glom(),
      np.apply_over_axes(np.sum, t, [0, 2]), rtol=1e-12)


def test_histogram_family(rng, cluster):
  x = rng.standard_normal(500)
  y = rng.standard_normal(500)
  np.testing.assert_allclose(
      sp.histogram_bin_edges(_f(x), bins=8, range=(-3, 3)).glom(),
      np.histogram_bin_edges(x, bins=8, range=(-3, 3)), rtol=1e-12)
  # auto range matches numpy's [min, max]
  np.testing.assert_allclose(sp.histogram_bin_edges(_f(x), bins=8).glom(),
                             np.histogram_bin_edges(x, bins=8), rtol=1e-10)
  r2 = [[-3, 3], [-3, 3]]
  h, ex, ey = sp.histogram2d(_f(x), _f(y), bins=6, range=r2)
  nh, nex, ney = np.histogram2d(x, y, bins=6, range=r2)
  np.testing.assert_array_equal(h.glom(), nh)
  np.testing.assert_allclose(ex.glom(), nex, rtol=1e-12)
  np.testing.assert_allclose(ey.glom(), ney, rtol=1e-12)
  s = rng.standard_normal((200, 3))
  rd = [[-3, 3]] * 3
  hd, edges = sp.histogramdd(_f(s), bins=4, range=rd)
  nhd, nedges = np.histogramdd(s, bins=4, range=rd)
  np.testing.assert_array_equal(hd.glom(), nhd)
  for e, ne in zip(edges, nedges):
    np.testing.assert_allclose(e.glom(), ne, rtol=1e-12)


def test_unique_result_forms(rng, cluster):
  x = rng.integers(0, 6, 40)
  r = sp.unique_all(_f(x))
  n = np.unique_all(x)
  np.testing.assert_array_equal(r.values.glom(), n.values)
  np.testing.assert_array_equal(r.indices.glom(), n.indices)
  np.testing.assert_array_equal(r.inverse_indices.glom(),
                                n.inverse_indices)
  np.testing.assert_array_equal(r.counts.glom(), n.counts)
  rc = sp.unique_counts(_f(x))
  nc = np.unique_counts(x)
  np.testing.assert_array_equal(rc.values.glom(), nc.values)
  np.testing.assert_array_equal(rc.counts.glom(), nc.counts)
  ri = sp.unique_inverse(_f(x))
  ni = np.unique_inverse(x)
  np.testing.assert_array_equal(ri.values.glom(), ni.values)
  np.testing.assert_array_equal(ri.inverse_indices.glom(),
                                ni.inverse_indices)
  np.testing.assert_array_equal(sp.unique_values(_f(x)).glom(),
                                np.unique_values(x))


def test_polynomial_family(rng, cluster):
  u = rng.standard_normal(5)
  v = rng.standard_normal(3)
  np.testing.assert_allclose(sp.polyadd(_f(u), _f(v)).glom(),
                             np.polyadd(u, v), rtol=1e-12)
  np.testing.assert_allclose(sp.polysub(_f(u), _f(v)).glom(),
                             np.polysub(u, v), rtol=1e-12)
  np.testing.assert_allclose(sp.polymul(_f(u), _f(v)).glom(),
                             np.polymul(u, v), rtol=1e-12)
  q, r = sp.polydiv(_f(u), _f(v))
  nq, nr = np.polydiv(u, v)
  np.testing.assert_allclose(q.glom(), nq, rtol=1e-10)
  np.testing.assert_allclose(r.glom(), nr, rtol=1e-9, atol=1e-12)
  np.testing.assert_allclose(sp.polyder(_f(u), 2).glom(),
                             np.polyder(u, 2), rtol=1e-12)
  np.testing.assert_allclose(sp.polyint(_f(u)).glom(), np.polyint(u),
                             rtol=1e-12)
  x = np.linspace(-1, 1, 30)
  yv = 2 * x ** 2 - x + 0.5 + 0.01 * rng.standard_normal(30)
  np.testing.assert_allclose(sp.polyfit(_f(x), _f(yv), 2).glom(),
                             np.polyfit(x, yv, 2), rtol=1e-4, atol=1e-6)
  rts = np.array([1.0, 2.0, -3.0])
  np.testing.assert_allclose(sp.poly(_f(rts)).glom(), np.poly(rts),
                             rtol=1e-10)
  coeffs = np.poly(rts)
  got_roots = np.sort_complex(np.asarray(sp.roots(_f(coeffs)).glom()))
  np.testing.assert_allclose(got_roots, np.sort_complex(np.roots(coeffs)),
                             rtol=1e-8)


def test_bitpacking(rng, cluster):
  bits = rng.integers(0, 2, (3, 16)).astype(np.uint8)
  np.testing.assert_array_equal(sp.packbits(_f(bits), axis=1).glom(),
                                np.packbits(bits, axis=1))
  packed = np.packbits(bits, axis=1)
  np.testing.assert_array_equal(
      sp.unpackbits(_f(packed), axis=1, count=16).glom(),
      np.unpackbits(packed, axis=1, count=16))


def test_creation_additions(cluster):
  np.testing.assert_allclose(sp.geomspace(1.0, 1000.0, 7).glom(),
                             np.geomspace(1.0, 1000.0, 7), rtol=1e-12)
  np.testing.assert_array_equal(sp.tri(4, 6, k=1).glom(), np.tri(4, 6, k=1))
  for name in ("bartlett", "blackman", "hamming", "hanning"):
    np.testing.assert_allclose(getattr(sp, name)(11).glom(),
                               getattr(np, name)(11), rtol=1e-7, atol=1e-9)
  np.testing.assert_allclose(sp.kaiser(11, 3.5).glom(), np.kaiser(11, 3.5),
                             rtol=1e-6, atol=1e-8)


def test_split_family(rng, cluster):
  a = rng.standard_normal((10, 6, 4))
  for got, want in zip(sp.array_split(_f(a), 3), np.array_split(a, 3)):
    np.testing.assert_array_equal(got.glom(), want)
  for got, want in zip(sp.hsplit(_f(a), 2), np.hsplit(a, 2)):
    np.testing.assert_array_equal(got.glom(), want)
  for got, want in zip(sp.vsplit(_f(a), 5), np.vsplit(a, 5)):
    np.testing.assert_array_equal(got.glom(), want)
  for got, want in zip(sp.dsplit(_f(a), 2), np.dsplit(a, 2)):
    np.testing.assert_array_equal(got.glom(), want)
  with pytest.raises(ValueError):
    sp.vsplit(_f(a[0, 0]), 2)


def test_driver_side_helpers(rng, cluster):
  a = rng.standard_normal((4, 5))
  b = rng.standard_normal((5, 6))
  path, _ = sp.einsum_path("ij,jk->ik", _f(a), _f(b))
  npath, _ = np.einsum_path("ij,jk->ik", a, b, optimize="greedy")
  assert path == npath
  np.testing.assert_array_equal(
      sp.fromiter(range(7), np.int64).glom(), np.fromiter(range(7), np.int64))
  np.testing.assert_array_equal(sp.from_dlpack(a).glom(), a)
  np.testing.assert_array_equal(sp.asarray_chkfinite(_f(a)).glom(), a)
  with pytest.raises(ValueError):
    sp.asarray_chkfinite(_f(np.array([1.0, np.nan])))
  assert sp.array_equiv(_f(a), _f(a))
  assert not sp.array_equiv(_f(a), _f(a + 1))
  c = a.astype(complex) + 1e-20j
  np.testing.assert_array_equal(sp.real_if_close(_f(c)).glom(),
                                np.real_if_close(c))
  z = np.array([0, 0, 1, 2, 0, 3, 0])
  np.testing.assert_array_equal(sp.trim_zeros(_f(z)).glom(),
                                np.trim_zeros(z))
  np.testing.assert_array_equal(
      sp.setxor1d(_f(np.array([1, 2, 3])), _f(np.array([2, 3, 4]))).glom(),
      np.setxor1d(np.array([1, 2, 3]), np.array([2, 3, 4])))
  assert sp.iscomplexobj(_f(c)) and not sp.iscomplexobj(_f(a))
  assert sp.isrealobj(_f(a)) and not sp.isrealobj(_f(c))


def test_linalg_array_api_additions(rng, cluster):
  a = rng.standard_normal((4, 5))
  b = rng.standard_normal((5, 6))
  v3 = rng.standard_normal((7, 3))
  w3 = rng.standard_normal((7, 3))
  np.testing.assert_allclose(sp.linalg.matmul(_f(a), _f(b)).glom(),
                             a @ b, rtol=1e-12)
  np.testing.assert_allclose(
      sp.linalg.tensordot(_f(a), _f(b), axes=1).glom(),
      np.tensordot(a, b, axes=1), rtol=1e-12)
  np.testing.assert_allclose(sp.linalg.outer(_f(a[0]), _f(b[0])).glom(),
                             np.outer(a[0], b[0]), rtol=1e-12)
  np.testing.assert_allclose(sp.linalg.cross(_f(v3), _f(w3)).glom(),
                             np.cross(v3, w3), rtol=1e-12)
  sq = rng.standard_normal((5, 5))
  np.testing.assert_allclose(sp.linalg.diagonal(_f(sq)).glom(),
                             np.diagonal(sq), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(sp.linalg.trace(_f(sq)).glom()),
                             np.trace(sq), rtol=1e-12)
  np.testing.assert_allclose(sp.linalg.vecdot(_f(v3), _f(w3)).glom(),
                             np.linalg.vecdot(v3, w3), rtol=1e-12)
  np.testing.assert_allclose(
      np.asarray(sp.linalg.matrix_norm(_f(sq)).glom()),
      np.linalg.matrix_norm(sq), rtol=1e-12)
  np.testing.assert_allclose(
      np.asarray(sp.linalg.vector_norm(_f(a)).glom()),
      np.linalg.vector_norm(a), rtol=1e-12)


def test_fft_additions(rng, cluster):
  a = rng.standard_normal((8, 16))
  np.testing.assert_allclose(sp.fft.rfftn(_f(a)).glom(), np.fft.rfftn(a),
                             rtol=1e-9, atol=1e-10)
  spec = np.fft.rfftn(a)
  np.testing.assert_allclose(sp.fft.irfftn(_f(spec)).glom(),
                             np.fft.irfftn(spec), rtol=1e-9, atol=1e-10)
  c = rng.standard_normal(9) + 1j * rng.standard_normal(9)
  np.testing.assert_allclose(sp.fft.hfft(_f(c)).glom(), np.fft.hfft(c),
                             rtol=1e-9, atol=1e-10)
  r = rng.standard_normal(16)
  np.testing.assert_allclose(sp.fft.ihfft(_f(r)).glom(), np.fft.ihfft(r),
                             rtol=1e-9, atol=1e-10)


def test_random_distributions(cluster):
  sp.random.seed(7)
  n = 4000
  e = np.asarray(sp.random.exponential(2.0, (n,)).glom())
  assert abs(e.mean() - 2.0) < 0.15 and (e >= 0).all()
  p = np.asarray(sp.random.poisson(3.0, (n,)).glom())
  assert abs(p.mean() - 3.0) < 0.2 and np.issubdtype(p.dtype, np.integer)
  b = np.asarray(sp.random.binomial(10, 0.3, (n,)).glom())
  assert abs(b.mean() - 3.0) < 0.2 and b.max() <= 10 and b.min() >= 0
  be = np.asarray(sp.random.beta(2.0, 5.0, (n,)).glom())
  assert abs(be.mean() - 2.0 / 7.0) < 0.05 and (0 <= be).all()
  g = np.asarray(sp.random.gamma(2.0, 2.0, (n,)).glom())
  assert abs(g.mean() - 4.0) < 0.3 and (g >= 0).all()
  s = np.asarray(sp.random.shuffle(np.arange(50)).glom())
  assert sorted(s.tolist()) == list(range(50))
  assert not np.array_equal(s, np.arange(50))


def test_einsum_multi_operand_decomposition(rng, cluster):
  """N-operand einsums decompose into pairwise TensorDotExpr
  contractions along np.einsum_path (not one opaque N-ary map)."""
  from spartan_tpu.expr.dot import TensorDotExpr
  from spartan_tpu.expr.reshape import TransposeExpr
  a = rng.standard_normal((4, 5))
  b = rng.standard_normal((5, 6))
  c = rng.standard_normal((6, 3))
  d = rng.standard_normal((3, 7))
  e = sp.einsum("ij,jk,kl->il", _f(a), _f(b), _f(c))
  assert isinstance(e, (TensorDotExpr, TransposeExpr))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,jk,kl->il", a, b, c), rtol=1e-10)
  e = sp.einsum("ij,jk,kl,lm->mi", _f(a), _f(b), _f(c), _f(d))
  assert isinstance(e, (TensorDotExpr, TransposeExpr))
  np.testing.assert_allclose(
      np.asarray(e.glom()), np.einsum("ij,jk,kl,lm->mi", a, b, c, d),
      rtol=1e-10)
  # implicit output
  e = sp.einsum("ij,jk,kl", _f(a), _f(b), _f(c))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,jk,kl", a, b, c), rtol=1e-10)
  # batch pair + vector: pairwise steps, batch pair on the generic map
  bt = rng.standard_normal((2, 4, 5))
  bu = rng.standard_normal((2, 5, 3))
  w = rng.standard_normal(3)
  e = sp.einsum("bij,bjk,k->bi", _f(bt), _f(bu), _f(w))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("bij,bjk,k->bi", bt, bu, w),
                             rtol=1e-10)
  # hyperedge index (i in three operands) and per-operand diagonal
  v = rng.standard_normal(4)
  x3 = rng.standard_normal((4, 2))
  e = sp.einsum("ij,i,ik->jk", _f(a), _f(v), _f(x3))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,i,ik->jk", a, v, x3), rtol=1e-10)
  sq = rng.standard_normal((5, 5))
  x2 = rng.standard_normal((5, 5))
  e = sp.einsum("ii,ij,jk->k", _f(sq), _f(x2), _f(b))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ii,ij,jk->k", sq, x2, b), rtol=1e-10)
  # numpy's optimize kwarg: order choices give the same value; False
  # pins the single fused jnp.einsum
  from spartan_tpu.expr.map import MapExpr
  for opt, kind in (("optimal", (TensorDotExpr, TransposeExpr)),
                    (False, MapExpr)):
    e = sp.einsum("ij,jk,kl->il", _f(a), _f(b), _f(c), optimize=opt)
    assert isinstance(e, kind)
    np.testing.assert_allclose(np.asarray(e.glom()),
                               np.einsum("ij,jk,kl->il", a, b, c),
                               rtol=1e-10)


def test_default_rng_generator(cluster):
  """np.random.default_rng parity: independent deterministic streams."""
  r1 = sp.random.default_rng(42)
  r2 = sp.random.default_rng(42)
  a = np.asarray(r1.standard_normal((64,)).glom())
  np.testing.assert_array_equal(a, np.asarray(
      r2.standard_normal((64,)).glom()))
  assert not np.array_equal(a, np.asarray(r1.standard_normal((64,)).glom()))
  p = np.asarray(r1.permutation(100).glom())
  assert sorted(p.tolist()) == list(range(100))
  ch = np.asarray(r1.choice(50, 10, replace=False).glom())
  assert len(set(ch.tolist())) == 10
  i = np.asarray(r1.integers(5, 15, (1000,)).glom())
  assert i.min() >= 5 and i.max() < 15
  u = np.asarray(r1.uniform(2.0, 3.0, (500,)).glom())
  assert 2.0 <= u.min() and u.max() < 3.0
  with pytest.raises(ValueError):
    r1.choice(5, 10, replace=False)


def test_review_regressions(rng, cluster):
  """Regression pack for the r3-session-4 code-review findings."""
  a = rng.standard_normal(3)
  b = rng.standard_normal(4)
  c = rng.standard_normal(5)
  # 1: no-contraction N-operand einsums (outer product / elementwise)
  # must not recurse forever
  e = sp.einsum("i,j,k->ijk", _f(a), _f(b), _f(c))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("i,j,k->ijk", a, b, c), rtol=1e-10)
  m = rng.standard_normal((3, 4))
  e = sp.einsum("ij,ij,ij->ij", _f(m), _f(m), _f(m))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,ij,ij->ij", m, m, m), rtol=1e-10)
  # 3: scalar (0-d) operand in an N-operand einsum
  A = rng.standard_normal((4, 5))
  B = rng.standard_normal((5, 6))
  e = sp.einsum("ij,jk,->ik", _f(A), _f(B), _f(np.float64(2.0)))
  np.testing.assert_allclose(np.asarray(e.glom()),
                             np.einsum("ij,jk,->ik", A, B, 2.0), rtol=1e-10)
  # 4: constant-input auto-range edges match numpy (and histogram's bins)
  const = np.full(10, 2.0)
  np.testing.assert_allclose(
      sp.histogram_bin_edges(_f(const), bins=4).glom(),
      np.histogram_bin_edges(const, bins=4), rtol=1e-12)
  # 6: vector_norm keepdims keeps the original rank
  t = np.ones((3, 4))
  assert sp.linalg.vector_norm(_f(t), keepdims=True).glom().shape == (1, 1)
  # 9: *_indices_from reject non-2-D inputs
  with pytest.raises(ValueError):
    sp.tril_indices_from(_f(np.arange(5.0)))
  with pytest.raises(ValueError):
    sp.triu_indices_from(_f(np.zeros((2, 3, 4))))


def test_sparse_review_regressions(rng, cluster):
  """Findings 2/5/8: Generator.permutation rows, pad-invariant under
  non-finite multipliers, mean axis validation."""
  import scipy.sparse as ss
  from spartan_tpu.backend import sparse as sps
  # 2: Generator.permutation permutes ROWS of 2-D input
  g = sp.random.default_rng(0)
  m2 = np.arange(12.0).reshape(6, 2)
  p = np.asarray(g.permutation(sp.from_numpy(m2)).glom())
  assert p.shape == (6, 2)
  np.testing.assert_allclose(np.sort(p[:, 0]), m2[:, 0])
  np.testing.assert_array_equal(p[:, 1] - p[:, 0], np.ones(6))
  # 5: multiply by non-finite dense values must not pollute pads
  M = ss.csr_matrix(np.array([[1.0, 2.0], [0.0, 3.0]]))
  S = sps.from_scipy(M)
  D = np.array([[1.0, 1.0], [np.nan, 1.0]])
  np.testing.assert_array_equal(S.multiply(D).todense(),
                                M.multiply(D).toarray())
  got_inf = (S * np.inf).todense()
  assert not np.isnan(got_inf[1, 0])   # the pad cell stays clean
  got_div = (S / 0.0).todense()
  assert not np.isnan(got_div[1, 0])
  # 8: mean validates axis with ValueError like sum
  with pytest.raises(ValueError):
    S.mean(axis=2)


def test_parity_audit_is_clean(cluster):
  """The full-namespace audit must stay at zero in-scope missing names —
  new numpy releases or refactors that drop exports fail here, not in
  production."""
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "numpy_parity", "tools/numpy_parity.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  np_names = mod.collect_numpy()
  have = mod.collect_spartan()
  in_scope = [n for n in np_names if n not in mod.EXCLUDED]
  missing = [n for n in in_scope if n not in have]
  assert missing == [], f"top-level np parity regressed: {missing}"
  for modname, (c, t, miss) in mod.submodule_parity().items():
    assert miss == [], f"np.{modname} parity regressed: {miss}"
  _, _, mmiss = mod.method_parity()
  assert mmiss == [], f"np.ndarray method parity regressed: {mmiss}"


def test_expr_method_delegations(rng, cluster):
  """ndarray-method parity: methods delegate to the module fns and match
  numpy's method results."""
  a = rng.standard_normal((6, 8))
  x = _f(a)
  np.testing.assert_allclose(np.asarray(x.var().glom()), a.var(),
                             rtol=1e-12)
  np.testing.assert_allclose(np.asarray(x.cumsum(axis=1).glom()),
                             a.cumsum(axis=1), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(x.clip(-1, 1).glom()),
                             a.clip(-1, 1))
  np.testing.assert_allclose(np.asarray(x.round(2).glom()), a.round(2))
  np.testing.assert_allclose(np.asarray(x.flatten().glom()), a.flatten())
  np.testing.assert_allclose(np.asarray(x.swapaxes(0, 1).glom()),
                             a.swapaxes(0, 1))
  np.testing.assert_allclose(np.asarray(x.repeat(2, axis=0).glom()),
                             a.repeat(2, axis=0))
  np.testing.assert_allclose(
      np.asarray(x.take(np.array([1, 3]), axis=1).glom()),
      a.take([1, 3], axis=1))
  np.testing.assert_allclose(np.asarray(x.diagonal().glom()), a.diagonal())
  np.testing.assert_allclose(np.asarray(x.sort(axis=0).glom()),
                             np.sort(a, axis=0))
  np.testing.assert_allclose(np.asarray(x.argsort(axis=1).glom()),
                             a.argsort(axis=1))
  np.testing.assert_allclose(np.asarray(_f(a[:, :6]).trace().glom()),
                             a[:, :6].trace(), rtol=1e-12)
  assert _f(np.float64(3.5)).item() == 3.5
  assert x.tolist() == a.tolist()
  np.testing.assert_allclose(np.asarray(x.resize((4, 12)).glom()),
                             np.resize(a, (4, 12)))
  np.testing.assert_allclose(
      np.asarray(x.partition(3, axis=1).glom())[:, 3],
      np.partition(a, 3, axis=1)[:, 3])
  np.testing.assert_allclose(np.asarray(x.cumprod(axis=0).glom()),
                             a.cumprod(axis=0), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(x.squeeze().glom()), a.squeeze())
  bins = np.sort(rng.standard_normal(5))
  np.testing.assert_array_equal(
      np.asarray(_f(bins).searchsorted(_f(a[0])).glom()),
      bins.searchsorted(a[0]))


def test_histogram_weights_density(rng, cluster):
  x = rng.standard_normal(1000)
  w = rng.uniform(0, 1, 1000)
  for kw in [dict(), dict(range=(-2, 2)), dict(weights=w),
             dict(density=True),
             dict(weights=w, density=True, range=(-2, 2))]:
    skw = dict(kw)
    if "weights" in skw:
      skw["weights"] = _f(w)
    got = np.asarray(sp.histogram(_f(x), bins=7, **skw).glom())
    want = np.histogram(x, bins=7, **kw)[0]
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_where_one_arg_and_arg_keepdims(rng, cluster):
  a = rng.standard_normal((4, 6))
  ri, ci = sp.where(_f(a) > 0.5)
  nri, nci = np.where(a > 0.5)
  np.testing.assert_array_equal(np.asarray(ri.glom()), nri)
  np.testing.assert_array_equal(np.asarray(ci.glom()), nci)
  (oi,) = sp.where(_f(a[0]) > 0)
  np.testing.assert_array_equal(np.asarray(oi.glom()), np.where(a[0] > 0)[0])
  with pytest.raises(ValueError):
    sp.where(_f(a) > 0, 1.0)
  np.testing.assert_array_equal(
      np.asarray(sp.argmax(_f(a), axis=1, keepdims=True).glom()),
      np.argmax(a, axis=1, keepdims=True))
  np.testing.assert_array_equal(
      np.asarray(sp.argmin(_f(a), axis=0, keepdims=True).glom()),
      np.argmin(a, axis=0, keepdims=True))
