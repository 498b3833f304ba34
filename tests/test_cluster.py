"""Differential tests for sp.cluster vs scipy.cluster (f64 CPU mesh)."""

import numpy as np
import pytest
import scipy.cluster.hierarchy as sch
import scipy.cluster.vq as svq

import spartan_tpu as sp

cl = sp.cluster
rng = np.random.default_rng(17)
# three well-separated blobs
X = np.concatenate([
    rng.standard_normal((40, 3)) * 0.3 + [4, 0, 0],
    rng.standard_normal((40, 3)) * 0.3 + [0, 4, 0],
    rng.standard_normal((40, 3)) * 0.3 + [0, 0, 4],
])


def g(e):
  from spartan_tpu.expr.base import Expr
  return np.asarray(sp.lazify(e).glom()) if isinstance(e, Expr) \
      else np.asarray(e)


@pytest.mark.smoke
def test_whiten_and_vq():
  np.testing.assert_allclose(g(cl.vq.whiten(X)), svq.whiten(X),
                             rtol=1e-10)
  book = X[[0, 40, 80]]
  code, dist = cl.vq.vq(X, book)
  cref, dref = svq.vq(X, book)
  assert (g(code) == cref).all()
  np.testing.assert_allclose(g(dist), dref, rtol=1e-10)
  code2, dist2 = cl.vq.py_vq(X, book)
  assert (g(code2) == cref).all()


@pytest.mark.smoke
def test_kmeans_refinement_matches_scipy_from_same_guess():
  # same explicit initial codebook -> identical Lloyd fixed point
  guess = X[[1, 41, 81]].astype(float)
  book, dist = cl.vq.kmeans(X, guess, thresh=1e-9)
  bref, dref = svq.kmeans(X, guess, thresh=1e-9)
  # sort rows for comparison (update order may differ)
  ours = g(book)
  np.testing.assert_allclose(ours[np.lexsort(ours.T)],
                             bref[np.lexsort(bref.T)], rtol=1e-8)
  np.testing.assert_allclose(float(g(dist)), dref, rtol=1e-8)


def test_kmeans_restarts_recover_blobs():
  book, dist = cl.vq.kmeans(X, 3, iter=8, seed=0)
  centers = g(book)
  want = np.array([[4, 0, 0], [0, 4, 0], [0, 0, 4]], float)
  # each true center matched within 0.3
  d = np.abs(centers[:, None, :] - want[None]).sum(-1).min(0)
  assert (d < 0.9).all(), centers
  assert float(g(dist)) < 0.6


def test_kmeans2_matches_scipy_matrix_init():
  guess = X[[2, 42, 82]].astype(float)
  cent, lab = cl.vq.kmeans2(X, guess, iter=12, minit="matrix")
  cref, lref = svq.kmeans2(X, guess, iter=12, minit="matrix")
  np.testing.assert_allclose(g(cent), cref, rtol=1e-8)
  assert (g(lab) == lref).all()


@pytest.mark.parametrize("minit", ["points", "++", "random"])
def test_kmeans2_seeding_modes(minit):
  cent, lab = cl.vq.kmeans2(X, 3, iter=15, minit=minit, seed=3)
  centers, labels = g(cent), g(lab)
  assert centers.shape == (3, 3) and labels.shape == (120,)
  # labels consistent with nearest center
  d = ((X[:, None, :] - centers[None]) ** 2).sum(-1)
  assert (labels == d.argmin(1)).all()


def test_kmeans2_1d_and_errors():
  x1 = np.concatenate([rng.normal(0, 0.2, 50), rng.normal(5, 0.2, 50)])
  cent, lab = cl.vq.kmeans2(x1, 2, iter=10, minit="points", seed=1)
  c = np.sort(g(cent).ravel())
  assert abs(c[0]) < 0.5 and abs(c[1] - 5) < 0.5
  with pytest.raises(ValueError):
    cl.vq.kmeans(X, 0)
  with pytest.raises(ValueError):
    cl.vq.kmeans2(X, 3, minit="bogus")


@pytest.mark.smoke
def test_hierarchy_host_boundary_pipeline():
  # device pdist -> host linkage, identical to the scipy chain
  Y = sp.spatial.distance.pdist(X[:30])
  Z = cl.hierarchy.linkage(Y, method="average")
  Zref = sch.linkage(np.asarray(Y.glom()), method="average")
  np.testing.assert_allclose(Z, Zref, rtol=1e-10)
  labels = cl.hierarchy.fcluster(Z, t=3, criterion="maxclust")
  lref = sch.fcluster(Zref, t=3, criterion="maxclust")
  assert (labels == lref).all()
  assert cl.hierarchy.is_valid_linkage(Z)
  c, _ = cl.hierarchy.cophenet(Z, np.asarray(Y.glom()))
  assert 0.5 < c <= 1.0


def test_hierarchy_tree_utilities():
  Y = sp.spatial.distance.pdist(X[:20])
  Z = cl.hierarchy.linkage(Y, method="single")
  root = cl.hierarchy.to_tree(Z)
  assert root.count == 20
  cuts = cl.hierarchy.cut_tree(Z, n_clusters=4)
  assert cuts.shape == (20, 1)
  assert len(set(cuts.ravel().tolist())) == 4
