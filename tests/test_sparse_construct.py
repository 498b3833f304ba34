"""Differential tests: sp.sparse construction surface vs scipy.sparse.

Reference: the reference's sparse tiles are scipy matrices
(SURVEY.md §2.1/§2.2); scipy.sparse is the construction oracle."""

import numpy as np
import pytest
import scipy.sparse as ss

import spartan_tpu as sp


def _dense(S):
  return np.asarray(S.todense())


def _rand_sparse(rng, n, m, density=0.2, dtype=np.float64):
  M = ss.random(n, m, density=density, random_state=np.random.RandomState(
      rng.integers(1 << 30)), dtype=dtype)
  M.data[M.data == 0] = 0.5
  return M.tocsr()


@pytest.fixture
def rng():
  return np.random.default_rng(7)


def test_eye_variants():
  for m, n, k in [(5, None, 0), (5, 7, 2), (7, 5, -2), (3, 3, -1)]:
    got = sp.sparse.eye(m, n, k=k)
    want = ss.eye(m, n, k=k).toarray()
    np.testing.assert_array_equal(_dense(got), want)
    assert got.nnz == ss.eye(m, n, k=k).nnz
  # out-of-range offset: numpy semantics (all-zero), where scipy raises
  np.testing.assert_array_equal(_dense(sp.sparse.eye(4, 4, k=5)),
                                np.eye(4, k=5))


def test_identity():
  got = sp.sparse.identity(6, dtype=np.float32)
  np.testing.assert_array_equal(_dense(got), np.eye(6, dtype=np.float32))
  assert got.dtype == np.float32


def test_diags_multi_offset():
  d0 = np.array([1.0, 2, 3, 4])
  d1 = np.array([5.0, 6, 7])
  dm2 = np.array([8.0, 9])
  got = sp.sparse.diags([d0, d1, dm2], [0, 1, -2])
  want = ss.diags([d0, d1, dm2], [0, 1, -2]).toarray()
  np.testing.assert_array_equal(_dense(got), want)


def test_diags_scalar_offset_and_rect():
  got = sp.sparse.diags(np.array([1.0, 2, 3, 4]), 1, shape=(4, 5))
  want = ss.diags(np.array([1.0, 2, 3, 4]), 1, shape=(4, 5)).toarray()
  np.testing.assert_array_equal(_dense(got), want)
  with pytest.raises(ValueError):  # exact-length contract (scipy parity)
    sp.sparse.diags(np.array([1.0, 2, 3]), 1, shape=(4, 5))


def test_diags_scalar_broadcast():
  got = sp.sparse.diags([2.0, -1.0], [0, 1], shape=(5, 5))
  want = ss.diags([2.0, -1.0], [0, 1], shape=(5, 5)).toarray()
  np.testing.assert_array_equal(_dense(got), want)


def test_diags_duplicate_offsets_raise():
  with pytest.raises(ValueError):
    sp.sparse.diags([[1.0], [2.0]], [0, 0], shape=(2, 2))


def test_spdiags_matlab_convention():
  data = np.array([[1.0, 2, 3, 4], [5.0, 6, 7, 8], [9.0, 10, 11, 12]])
  offs = [-1, 0, 2]
  got = sp.sparse.spdiags(data, offs, 4, 4)
  want = ss.spdiags(data, offs, 4, 4).toarray()
  np.testing.assert_array_equal(_dense(got), want)
  got_r = sp.sparse.spdiags(data, offs, 3, 4)
  want_r = ss.spdiags(data, offs, 3, 4).toarray()
  np.testing.assert_array_equal(_dense(got_r), want_r)


@pytest.mark.smoke
def test_kron(rng):
  A = _rand_sparse(rng, 5, 4, 0.4)
  B = _rand_sparse(rng, 3, 6, 0.3)
  got = sp.sparse.kron(sp.sparse.from_scipy(A), sp.sparse.from_scipy(B))
  want = ss.kron(A, B).toarray()
  np.testing.assert_allclose(_dense(got), want, rtol=1e-12)
  assert got.nnz == ss.kron(A, B).nnz
  # mixed sparse×dense operands
  Bd = B.toarray()
  got2 = sp.sparse.kron(sp.sparse.from_scipy(A), Bd)
  np.testing.assert_allclose(_dense(got2), want, rtol=1e-12)


def test_kron_spmv_consistency(rng):
  """The kron result must feed the compute path (pad invariant held)."""
  A = _rand_sparse(rng, 4, 4, 0.5)
  B = _rand_sparse(rng, 5, 5, 0.4)
  K = sp.sparse.kron(sp.sparse.from_scipy(A), sp.sparse.from_scipy(B))
  x = rng.standard_normal(20)
  got = np.asarray(sp.sparse.spmv(K, x))
  want = ss.kron(A, B) @ x
  np.testing.assert_allclose(got, want, rtol=1e-10)


def test_kronsum(rng):
  A = _rand_sparse(rng, 4, 4, 0.5)
  B = _rand_sparse(rng, 3, 3, 0.5)
  got = sp.sparse.kronsum(sp.sparse.from_scipy(A), sp.sparse.from_scipy(B))
  want = ss.kronsum(A, B).toarray()
  np.testing.assert_allclose(_dense(got), want, rtol=1e-12)


@pytest.mark.smoke
def test_hstack_vstack(rng):
  A = _rand_sparse(rng, 4, 3, 0.5)
  B = _rand_sparse(rng, 4, 5, 0.3)
  C = _rand_sparse(rng, 2, 8, 0.4)
  h = sp.sparse.hstack([sp.sparse.from_scipy(A), sp.sparse.from_scipy(B)])
  np.testing.assert_allclose(_dense(h), ss.hstack([A, B]).toarray())
  v = sp.sparse.vstack([h, sp.sparse.from_scipy(C)])
  np.testing.assert_allclose(
      _dense(v), ss.vstack([ss.hstack([A, B]), C]).toarray())


def test_hstack_shape_mismatch_raises(rng):
  A = _rand_sparse(rng, 4, 3)
  B = _rand_sparse(rng, 5, 3)
  with pytest.raises(ValueError):
    sp.sparse.hstack([sp.sparse.from_scipy(A), sp.sparse.from_scipy(B)])


def test_block_diag(rng):
  mats = [_rand_sparse(rng, 3, 4, 0.5), _rand_sparse(rng, 2, 2, 0.8),
          _rand_sparse(rng, 4, 1, 0.9)]
  got = sp.sparse.block_diag([sp.sparse.from_scipy(m) for m in mats])
  want = ss.block_diag(mats).toarray()
  np.testing.assert_allclose(_dense(got), want)


def test_bmat_with_none(rng):
  A = _rand_sparse(rng, 3, 4, 0.5)
  B = _rand_sparse(rng, 3, 2, 0.5)
  C = _rand_sparse(rng, 2, 4, 0.5)
  got = sp.sparse.bmat([[sp.sparse.from_scipy(A), sp.sparse.from_scipy(B)],
                        [sp.sparse.from_scipy(C), None]])
  want = ss.bmat([[A, B], [C, None]]).toarray()
  np.testing.assert_allclose(_dense(got), want)


def test_bmat_ambiguous_raises():
  with pytest.raises(ValueError):
    sp.sparse.bmat([[None], [None]])


@pytest.mark.smoke
def test_tril_triu(rng):
  A = _rand_sparse(rng, 6, 6, 0.5)
  SA = sp.sparse.from_scipy(A)
  for k in [-2, 0, 1, 3]:
    np.testing.assert_allclose(_dense(sp.sparse.tril(SA, k)),
                               ss.tril(A, k).toarray())
    np.testing.assert_allclose(_dense(sp.sparse.triu(SA, k)),
                               ss.triu(A, k).toarray())
    assert sp.sparse.tril(SA, k).nnz == ss.tril(A, k).nnz


def test_random_exact_nnz():
  S = sp.sparse.random(40, 30, density=0.1, random_state=3)
  assert S.shape == (40, 30)
  assert S.nnz == round(0.1 * 40 * 30)
  d = _dense(S)
  assert np.count_nonzero(d) == S.nnz
  assert ((d >= 0) & (d < 1)).all()
  S2 = sp.sparse.rand(10, 10, density=0.0)
  assert S2.nnz == 0


def test_random_data_rvs():
  rng = np.random.default_rng(0)
  S = sp.sparse.random(20, 20, density=0.2, random_state=1,
                       data_rvs=lambda n: rng.standard_normal(n))
  assert S.nnz == round(0.2 * 400)


@pytest.mark.smoke
def test_add_sub_sparse(rng):
  A = _rand_sparse(rng, 5, 6, 0.4)
  B = _rand_sparse(rng, 5, 6, 0.4)
  SA, SB = sp.sparse.from_scipy(A), sp.sparse.from_scipy(B)
  got = SA + SB
  np.testing.assert_allclose(_dense(got), (A + B).toarray())
  np.testing.assert_allclose(_dense(SA - SB), (A - B).toarray())
  # duplicate-holding sums must feed SpMV correctly
  x = rng.standard_normal(6)
  np.testing.assert_allclose(np.asarray(sp.sparse.spmv(got, x)),
                             (A + B) @ x, rtol=1e-10)
  # canonicalize merges duplicates back to minimal width
  canon = got.canonicalize()
  np.testing.assert_allclose(_dense(canon), (A + B).toarray())
  assert canon.max_nnz_per_row <= got.max_nnz_per_row


def test_add_dense_and_scalar(rng):
  A = _rand_sparse(rng, 4, 5, 0.4)
  SA = sp.sparse.from_scipy(A)
  D = rng.standard_normal((4, 5))
  np.testing.assert_allclose(np.asarray(SA + D), A.toarray() + D)
  np.testing.assert_allclose(np.asarray(D + SA), A.toarray() + D)
  np.testing.assert_allclose(np.asarray(D - SA), D - A.toarray())
  np.testing.assert_allclose(_dense(SA + 0), A.toarray())
  for bad in (lambda: SA + 1.5, lambda: 2.0 - SA):  # scipy densify contract
    with pytest.raises(NotImplementedError):
      bad()


def test_issparse(rng):
  assert sp.sparse.issparse(sp.sparse.from_scipy(_rand_sparse(rng, 3, 3)))
  assert not sp.sparse.issparse(np.eye(3))
  assert sp.sparse.isspmatrix is sp.sparse.issparse


# ---------------------------------------------------------------------------
# r5 parity sweep: format constructors, predicates, find, npz IO
# ---------------------------------------------------------------------------

@pytest.mark.smoke
def test_format_constructors_all_input_forms(rng, tmp_path):
  D = np.array([[1.0, 0, 2], [0, 0, 3], [4, 5, 0]])
  S = ss.csr_matrix(D)
  coo = S.tocoo()
  for name in ["csr_matrix", "csc_matrix", "coo_matrix", "dia_matrix",
               "csr_array", "coo_array"]:
    ctor = getattr(sp.sparse, name)
    # dense, scipy-sparse, and (M, N) empty forms
    np.testing.assert_array_equal(_dense(ctor(D)), D)
    np.testing.assert_array_equal(_dense(ctor(S)), D)
    assert ctor((3, 4)).nnz == 0 and ctor((3, 4)).shape == (3, 4)
  # COO triplet form
  got = sp.sparse.coo_matrix((coo.data, (coo.row, coo.col)), shape=(3, 3))
  np.testing.assert_array_equal(_dense(got), D)
  assert got.format == "coo"
  # CSR compressed form
  got = sp.sparse.csr_matrix((S.data, S.indices, S.indptr), shape=(3, 3))
  np.testing.assert_array_equal(_dense(got), D)
  # dtype= casts; SparseArray passthrough retags without sharing
  f32 = sp.sparse.csr_matrix(D, dtype=np.float32)
  assert f32.dtype == np.float32
  re = sp.sparse.coo_matrix(f32)
  assert re.format == "coo" and f32.format == "csr"


def test_isspmatrix_predicates():
  A = sp.sparse.csc_matrix(np.eye(3))
  assert sp.sparse.isspmatrix_csc(A) and not sp.sparse.isspmatrix_csr(A)
  assert not sp.sparse.isspmatrix_dok(A) and not sp.sparse.isspmatrix_lil(A)
  assert sp.sparse.issparse(A)
  B = sp.sparse.from_dense(np.eye(3))
  assert sp.sparse.isspmatrix_csr(B)  # ingest canonicalizes via CSR


def test_find_matches_scipy(rng):
  M = _rand_sparse(rng, 9, 7)
  r, c, v = sp.sparse.find(sp.sparse.csr_matrix(M))
  rr, cc, vv = ss.find(M)
  np.testing.assert_array_equal(r, rr)
  np.testing.assert_array_equal(c, cc)
  np.testing.assert_allclose(v, vv)


def test_npz_roundtrip(tmp_path, rng):
  M = _rand_sparse(rng, 8, 8)
  A = sp.sparse.coo_matrix(M)
  p = str(tmp_path / "m.npz")
  sp.sparse.save_npz(p, A)
  back = sp.sparse.load_npz(p)
  np.testing.assert_allclose(_dense(back), M.toarray())
  assert back.format == "coo"
  # scipy can read what we wrote
  np.testing.assert_allclose(ss.load_npz(p).toarray(), M.toarray())


def test_array_api_builders():
  np.testing.assert_array_equal(
      _dense(sp.sparse.eye_array(4, k=1)), ss.eye_array(4, k=1).toarray())
  np.testing.assert_array_equal(
      _dense(sp.sparse.diags_array([1., 2, 3], offsets=1, shape=(4, 4))),
      ss.diags_array([1., 2, 3], offsets=1, shape=(4, 4)).toarray())
  blocks = [[np.eye(2), None], [None, 2 * np.eye(2)]]
  np.testing.assert_array_equal(
      _dense(sp.sparse.block_array(blocks)),
      ss.block_array([[ss.csr_matrix(np.eye(2)), None],
                      [None, ss.csr_matrix(2 * np.eye(2))]]).toarray())
  R = sp.sparse.random_array((20, 10), density=0.3,
                             rng=np.random.default_rng(3))
  assert R.shape == (20, 10) and R.nnz == round(0.3 * 200)


def test_sparse_warnings_exist():
  assert issubclass(sp.sparse.SparseEfficiencyWarning,
                    sp.sparse.SparseWarning)
