"""Differential tests for sp.spatial vs scipy.spatial (f64 CPU mesh)."""

import numpy as np
import pytest
import scipy.spatial as ss
import scipy.spatial.distance as ssd
from scipy.spatial.transform import Rotation as SR
from scipy.spatial.transform import Slerp as SSlerp

import spartan_tpu as sp

spt = sp.spatial
rng = np.random.default_rng(7)
A = rng.standard_normal((14, 5))
B = rng.standard_normal((11, 5))
BA = rng.integers(0, 2, (10, 8)).astype(bool)
BB = rng.integers(0, 2, (7, 8)).astype(bool)


def g(e):
  from spartan_tpu.expr.base import Expr
  return np.asarray(sp.lazify(e).glom()) if isinstance(e, Expr) \
      else np.asarray(e)


def close(ours, want, rtol=1e-10, atol=1e-12):
  np.testing.assert_allclose(g(ours), want, rtol=rtol, atol=atol)


# ---------------------------------------------------------------- distance

REAL_METRICS = ["euclidean", "sqeuclidean", "cosine", "correlation",
                "cityblock", "chebyshev", "canberra", "braycurtis"]
BOOL_METRICS = ["hamming", "jaccard", "dice", "yule", "russellrao",
                "rogerstanimoto", "sokalsneath"]


@pytest.mark.smoke
@pytest.mark.parametrize("metric", REAL_METRICS)
def test_cdist_real(metric):
  close(spt.distance.cdist(A, B, metric), ssd.cdist(A, B, metric),
        rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("metric", BOOL_METRICS)
def test_cdist_bool(metric):
  close(spt.distance.cdist(BA, BB, metric), ssd.cdist(BA, BB, metric),
        rtol=1e-10, atol=1e-12)


def test_cdist_minkowski_seuclidean_mahalanobis():
  close(spt.distance.cdist(A, B, "minkowski", p=3.0),
        ssd.cdist(A, B, "minkowski", p=3.0), rtol=1e-9)
  V = rng.uniform(0.5, 2.0, 5)
  close(spt.distance.cdist(A, B, "seuclidean", V=V),
        ssd.cdist(A, B, "seuclidean", V=V), rtol=1e-9)
  C = np.cov(rng.standard_normal((40, 5)).T)
  VI = np.linalg.inv(C)
  close(spt.distance.cdist(A, B, "mahalanobis", VI=VI),
        ssd.cdist(A, B, "mahalanobis", VI=VI), rtol=1e-8, atol=1e-9)


def test_cdist_jensenshannon():
  P = np.abs(A) + 0.1
  Q = np.abs(B) + 0.1
  close(spt.distance.cdist(P, Q, "jensenshannon"),
        ssd.cdist(P, Q, "jensenshannon"), rtol=1e-9)


@pytest.mark.smoke
@pytest.mark.parametrize("metric", ["euclidean", "cityblock", "cosine"])
def test_pdist_and_squareform(metric):
  ours = spt.distance.pdist(A, metric)
  want = ssd.pdist(A, metric)
  close(ours, want, rtol=1e-9)
  close(spt.distance.squareform(g(ours)), ssd.squareform(want),
        rtol=1e-9)
  # square -> condensed
  close(spt.distance.squareform(ssd.squareform(want)), want,
        rtol=1e-9)


def test_vector_pair_helpers():
  u, v = A[0], A[1]
  close(spt.distance.euclidean(u, v), ssd.euclidean(u, v))
  close(spt.distance.cosine(u, v), ssd.cosine(u, v))
  close(spt.distance.cityblock(u, v), ssd.cityblock(u, v))
  close(spt.distance.chebyshev(u, v), ssd.chebyshev(u, v))
  close(spt.distance.minkowski(u, v, p=3), ssd.minkowski(u, v, p=3))
  w = rng.uniform(0.1, 1.0, 5)
  close(spt.distance.minkowski(u, v, p=2, w=w),
        ssd.minkowski(u, v, p=2, w=w))
  V = rng.uniform(0.5, 2.0, 5)
  close(spt.distance.seuclidean(u, v, V), ssd.seuclidean(u, v, V))
  C = np.cov(rng.standard_normal((40, 5)).T)
  VI = np.linalg.inv(C)
  close(spt.distance.mahalanobis(u, v, VI), ssd.mahalanobis(u, v, VI))
  bu, bv = BA[0], BA[1]
  close(spt.distance.jaccard(bu, bv), ssd.jaccard(bu, bv))
  close(spt.distance.dice(bu, bv), ssd.dice(bu, bv))


def test_jensenshannon_vector():
  p = np.abs(A[0]) + 0.1
  q = np.abs(A[1]) + 0.1
  close(spt.distance.jensenshannon(p, q), ssd.jensenshannon(p, q),
        rtol=1e-9)
  close(spt.distance.jensenshannon(p, q, base=2.0),
        ssd.jensenshannon(p, q, base=2.0), rtol=1e-9)


def test_directed_hausdorff():
  d, _, _ = spt.distance.directed_hausdorff(A, B)
  want = ssd.directed_hausdorff(A, B)[0]
  close(d, want, rtol=1e-10)


def test_distance_validity_helpers():
  D = ssd.squareform(ssd.pdist(A))
  assert spt.distance.is_valid_dm(D)
  assert spt.distance.is_valid_y(ssd.pdist(A))
  assert spt.distance.num_obs_dm(D) == 14
  assert spt.distance.num_obs_y(ssd.pdist(A)) == 14


# ---------------------------------------------------------------- KDTree

@pytest.mark.smoke
def test_kdtree_query():
  T, Tr = spt.KDTree(A), ss.KDTree(A)
  d, i = T.query(B, k=3)
  dr, ir = Tr.query(B, k=3)
  close(d, dr, rtol=1e-10)
  assert (g(i) == ir).all()
  # k=1 squeeze + single point
  d1, i1 = T.query(B[0], k=1)
  dr1, ir1 = Tr.query(B[0], k=1)
  close(d1, dr1, rtol=1e-10)
  assert int(g(i1)) == ir1
  # k as a list picks columns
  d2, i2 = T.query(B, k=[2, 3])
  dr2, ir2 = Tr.query(B, k=[2, 3])
  close(d2, dr2, rtol=1e-10)
  assert (g(i2) == ir2).all()


def test_kdtree_query_upper_bound_and_p():
  T, Tr = spt.KDTree(A), ss.KDTree(A)
  d, i = T.query(B, k=4, distance_upper_bound=1.8)
  dr, ir = Tr.query(B, k=4, distance_upper_bound=1.8)
  close(d, dr, rtol=1e-10)
  assert (g(i) == ir).all()
  d, i = T.query(B, k=2, p=1.0)
  dr, ir = Tr.query(B, k=2, p=1.0)
  close(d, dr, rtol=1e-10)
  d, i = T.query(B, k=2, p=np.inf)
  dr, ir = Tr.query(B, k=2, p=np.inf)
  close(d, dr, rtol=1e-10)


def test_kdtree_query_ball_point():
  T, Tr = spt.KDTree(A), ss.KDTree(A)
  ours = T.query_ball_point(B, r=2.5)
  want = Tr.query_ball_point(B, r=2.5)
  assert all(sorted(o) == sorted(w) for o, w in zip(ours, want))
  assert T.query_ball_point(B[0], r=2.5) == \
      sorted(Tr.query_ball_point(B[0], r=2.5))
  lens = T.query_ball_point(B, r=2.5, return_length=True)
  assert (g(lens) == [len(w) for w in want]).all()


def test_kdtree_query_pairs_and_ball_tree():
  T, Tr = spt.KDTree(A), ss.KDTree(A)
  assert T.query_pairs(2.0) == Tr.query_pairs(2.0)
  arr = T.query_pairs(2.0, output_type="ndarray")
  ref = Tr.query_pairs(2.0, output_type="ndarray")
  # scipy's ndarray output is tree-traversal ordered, not sorted
  assert {tuple(r) for r in arr} == {tuple(r) for r in ref}
  O, Or = spt.KDTree(B), ss.KDTree(B)
  ours = T.query_ball_tree(O, r=2.2)
  want = Tr.query_ball_tree(Or, r=2.2)
  assert all(sorted(o) == sorted(w) for o, w in zip(ours, want))


@pytest.mark.smoke
def test_kdtree_count_neighbors():
  T, Tr = spt.KDTree(A), ss.KDTree(A)
  O, Or = spt.KDTree(B), ss.KDTree(B)
  rs = [1.0, 2.0, 3.0, 5.0]
  assert (g(T.count_neighbors(O, rs)) ==
          Tr.count_neighbors(Or, rs)).all()
  assert int(g(T.count_neighbors(O, 2.0))) == \
      Tr.count_neighbors(Or, 2.0)
  # weighted + non-cumulative
  wa = rng.uniform(0.5, 1.5, 14)
  wb = rng.uniform(0.5, 1.5, 11)
  ours = g(T.count_neighbors(O, rs, weights=(wa, wb)))
  want = Tr.count_neighbors(Or, rs, weights=(wa, wb))
  np.testing.assert_allclose(ours, want, rtol=1e-10)
  ours = g(T.count_neighbors(O, rs, cumulative=False))
  want = Tr.count_neighbors(Or, rs, cumulative=False)
  np.testing.assert_allclose(ours, want)


def test_kdtree_sparse_distance_matrix():
  T, Tr = spt.KDTree(A), ss.KDTree(A)
  O, Or = spt.KDTree(B), ss.KDTree(B)
  ours = T.sparse_distance_matrix(O, 2.0)
  want = Tr.sparse_distance_matrix(Or, 2.0).toarray()
  np.testing.assert_allclose(ours.todense(), want, rtol=1e-10)
  np.testing.assert_allclose(ours.toarray(), want, rtol=1e-10)
  d = T.sparse_distance_matrix(O, 2.0, output_type="dict")
  dref = dict(Tr.sparse_distance_matrix(Or, 2.0, output_type="dict"))
  assert set(d) == set(dref)
  arr = T.sparse_distance_matrix(O, 2.0, output_type="ndarray")
  assert len(arr) == len(dref)


def test_kdtree_boxsize_periodic():
  pts = rng.uniform(0, 1, (20, 3))
  q = rng.uniform(0, 1, (6, 3))
  T = spt.KDTree(pts, boxsize=1.0)
  Tr = ss.KDTree(pts, boxsize=1.0)
  d, i = T.query(q, k=2)
  dr, ir = Tr.query(q, k=2)
  close(d, dr, rtol=1e-10)
  assert (g(i) == ir).all()


def test_ckdtree_alias():
  T = spt.cKDTree(A)
  d, i = T.query(B[:3], k=1)
  dr, ir = ss.cKDTree(A).query(B[:3], k=1)
  close(d, dr, rtol=1e-10)


# ------------------------------------------------------------- functions

@pytest.mark.smoke
def test_distance_matrix_and_minkowski():
  close(spt.distance_matrix(A, B), ss.distance_matrix(A, B),
        rtol=1e-10)
  close(spt.distance_matrix(A, B, p=1),
        ss.distance_matrix(A, B, p=1), rtol=1e-10)
  X, Y = A[:11], B
  close(spt.minkowski_distance(X, Y, p=3),
        ss.minkowski_distance(X, Y, p=3), rtol=1e-10)
  close(spt.minkowski_distance_p(X, Y, p=3),
        ss.minkowski_distance_p(X, Y, p=3), rtol=1e-10)


def test_procrustes():
  C = rng.standard_normal((14, 5))
  m1, m2, disp = spt.procrustes(A, C)
  r1, r2, rd = ss.procrustes(A, C)
  close(m1, r1, rtol=1e-9, atol=1e-12)
  close(m2, r2, rtol=1e-9, atol=1e-10)
  close(disp, rd, rtol=1e-9)


def test_geometric_slerp():
  s = np.array([1.0, 0.0, 0.0])
  e = np.array([0.0, 1.0, 1.0]) / np.sqrt(2)
  t = np.linspace(0, 1, 7)
  close(spt.geometric_slerp(s, e, t), ss.geometric_slerp(s, e, t),
        rtol=1e-10)
  with pytest.raises(ValueError):
    spt.geometric_slerp(s, -s, t)


def test_qhull_host_boundary_accepts_exprs():
  pts = rng.standard_normal((30, 2))
  hull = spt.ConvexHull(sp.lazify(pts))
  ref = ss.ConvexHull(pts)
  assert sorted(hull.vertices.tolist()) == sorted(ref.vertices.tolist())
  tri = spt.Delaunay(pts)
  assert tri.simplices.shape == ss.Delaunay(pts).simplices.shape
  v = spt.Voronoi(pts)
  assert v.vertices.shape[1] == 2


# -------------------------------------------------------------- transform

RT = sp.spatial.transform.Rotation


def _rand_rots(n=8, seed=3):
  q = np.random.default_rng(seed).standard_normal((n, 4))
  return q / np.linalg.norm(q, axis=1, keepdims=True)


@pytest.mark.smoke
def test_rotation_quat_matrix_roundtrip():
  q = _rand_rots()
  ours = RT.from_quat(q)
  ref = SR.from_quat(q)
  close(ours.as_matrix(), ref.as_matrix(), rtol=1e-10, atol=1e-12)
  back = RT.from_matrix(ref.as_matrix())
  close(back.as_matrix(), ref.as_matrix(), rtol=1e-9, atol=1e-10)
  # single rotation squeezes
  one = RT.from_quat(q[0])
  assert g(one.as_matrix()).shape == (3, 3)
  # scalar_first both ways
  sf = RT.from_quat(np.roll(q, 1, axis=1), scalar_first=True)
  close(sf.as_matrix(), ref.as_matrix(), rtol=1e-10)
  close(ours.as_quat(canonical=True), ref.as_quat(canonical=True),
        rtol=1e-10, atol=1e-12)


def test_rotation_rotvec_mrp():
  q = _rand_rots(6, seed=5)
  ours, ref = RT.from_quat(q), SR.from_quat(q)
  close(ours.as_rotvec(), ref.as_rotvec(), rtol=1e-9, atol=1e-10)
  close(ours.as_rotvec(degrees=True), ref.as_rotvec(degrees=True),
        rtol=1e-9, atol=1e-9)
  v = ref.as_rotvec()
  close(RT.from_rotvec(v).as_matrix(), SR.from_rotvec(v).as_matrix(),
        rtol=1e-9, atol=1e-10)
  close(ours.as_mrp(), ref.as_mrp(), rtol=1e-9, atol=1e-10)
  close(RT.from_mrp(ref.as_mrp()).as_matrix(), ref.as_matrix(),
        rtol=1e-9, atol=1e-10)
  # tiny-angle Taylor branch
  tiny = np.array([[1e-9, -2e-9, 1e-10], [0.0, 0.0, 0.0]])
  close(RT.from_rotvec(tiny).as_rotvec(), tiny, atol=1e-15)


_TB = ["xyz", "xzy", "yxz", "yzx", "zxy", "zyx"]
_PROPER = ["xyx", "xzx", "yxy", "yzy", "zxz", "zyz"]


@pytest.mark.parametrize("seq", _TB + _PROPER +
                         [s.upper() for s in _TB + _PROPER])
def test_rotation_euler_all_conventions(seq):
  q = _rand_rots(10, seed=11)
  ours, ref = RT.from_quat(q), SR.from_quat(q)
  close(ours.as_euler(seq), ref.as_euler(seq), rtol=1e-8, atol=1e-9)
  ang = ref.as_euler(seq)
  close(RT.from_euler(seq, ang).as_matrix(),
        SR.from_euler(seq, ang).as_matrix(), rtol=1e-9, atol=1e-10)


def test_rotation_euler_degrees_and_short_seq():
  ang = rng.uniform(-80, 80, (5, 2))
  close(RT.from_euler("xy", ang, degrees=True).as_matrix(),
        SR.from_euler("xy", ang, degrees=True).as_matrix(),
        rtol=1e-10, atol=1e-12)
  one = rng.uniform(-3, 3, (5, 1))
  close(RT.from_euler("z", one).as_matrix(),
        SR.from_euler("z", one).as_matrix(), rtol=1e-10, atol=1e-12)
  # scalar angle on a 1-axis seq is a single rotation
  close(RT.from_euler("y", 0.4).as_matrix(),
        SR.from_euler("y", 0.4).as_matrix(), rtol=1e-12, atol=1e-14)
  with pytest.raises(ValueError):
    RT.from_euler("z", np.zeros(5))
  q = _rand_rots(4, seed=2)
  close(RT.from_quat(q).as_euler("ZYX", degrees=True),
        SR.from_quat(q).as_euler("ZYX", degrees=True),
        rtol=1e-8, atol=1e-8)


def test_rotation_euler_gimbal_lock_consistent():
  # exact lock: the extracted angles must still reproduce the rotation
  ang = np.array([[0.3, np.pi / 2, 0.7], [-0.4, -np.pi / 2, 0.2]])
  r = SR.from_euler("xyz", ang)
  got = g(RT.from_quat(r.as_quat()).as_euler("xyz"))
  back = SR.from_euler("xyz", got)
  np.testing.assert_allclose(back.as_matrix(), r.as_matrix(),
                             rtol=1e-7, atol=1e-8)


@pytest.mark.smoke
def test_rotation_apply_compose_inv():
  q = _rand_rots(6, seed=9)
  v = rng.standard_normal((6, 3))
  ours, ref = RT.from_quat(q), SR.from_quat(q)
  close(ours.apply(v), ref.apply(v), rtol=1e-9, atol=1e-10)
  close(ours.apply(v, inverse=True), ref.apply(v, inverse=True),
        rtol=1e-9, atol=1e-10)
  q2 = _rand_rots(6, seed=10)
  o2, r2 = RT.from_quat(q2), SR.from_quat(q2)
  close((ours * o2).as_matrix(), (ref * r2).as_matrix(),
        rtol=1e-9, atol=1e-10)
  close(ours.inv().as_matrix(), ref.inv().as_matrix(),
        rtol=1e-10, atol=1e-12)
  close(ours.magnitude(), ref.magnitude(), rtol=1e-9, atol=1e-10)
  close((ours ** 0.5).as_matrix(), (ref ** 0.5).as_matrix(),
        rtol=1e-9, atol=1e-10)
  # single rotation applied to single vector
  one = RT.from_quat(q[0])
  assert g(one.apply(v[0])).shape == (3,)


def test_rotation_mean_align_identity_getitem():
  q = _rand_rots(5, seed=13)
  ours, ref = RT.from_quat(q), SR.from_quat(q)
  close(ours.mean().as_matrix(), ref.mean().as_matrix(),
        rtol=1e-8, atol=1e-9)
  w = rng.uniform(0.5, 2.0, 5)
  close(ours.mean(weights=w).as_matrix(),
        ref.mean(weights=w).as_matrix(), rtol=1e-8, atol=1e-9)
  # align_vectors
  a = rng.standard_normal((12, 3))
  R0 = SR.random(rng=np.random.default_rng(3))
  b = R0.inv().apply(a) + 0.01 * rng.standard_normal((12, 3))
  est, rssd = RT.align_vectors(a, b)
  rref, rssd_ref = SR.align_vectors(a, b)
  close(est.as_matrix(), rref.as_matrix(), rtol=1e-7, atol=1e-8)
  close(rssd, rssd_ref, rtol=1e-7)
  # identity / len / getitem / concatenate
  assert g(RT.identity().as_matrix()).shape == (3, 3)
  assert len(RT.identity(4)) == 4
  close(ours[2].as_matrix(), ref[2].as_matrix(), rtol=1e-10)
  close(ours[1:4].as_matrix(), ref[1:4].as_matrix(), rtol=1e-10)
  cat = RT.concatenate([ours, ours[1:4]])
  assert len(cat) == 8
  flag = g(ours.approx_equal(ours))
  assert flag.all()


def test_rotation_random_and_host_methods():
  r = RT.random(5, rng=42)
  M = g(r.as_matrix())
  np.testing.assert_allclose(
      M @ M.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (5, 3, 3)),
      atol=1e-12)
  grp = RT.create_group("D2")
  assert len(grp) == 4
  red = r.reduce(left=grp)
  assert len(red) == 5


@pytest.mark.smoke
def test_slerp():
  times = np.array([0.0, 1.0, 2.0, 4.0])
  q = _rand_rots(4, seed=21)
  ours = sp.spatial.transform.Slerp(times, RT.from_quat(q))
  ref = SSlerp(times, SR.from_quat(q))
  t = np.array([0.0, 0.3, 1.0, 1.7, 2.5, 3.9, 4.0])
  close(ours(t).as_matrix(), ref(t).as_matrix(),
        rtol=1e-9, atol=1e-10)


def test_rotation_spline_host_reexport():
  assert sp.spatial.transform.RotationSpline is not None
  assert sp.spatial.transform.RigidTransform is not None
