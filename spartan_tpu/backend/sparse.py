"""Sparse tiles, TPU-first.

The reference stores scipy.sparse tiles with C++ kernels for sparse×dense
products and sparse scatter-merge (reference: ``spartan/sparse/``,
``spartan/array/tile.py`` sparse branch; SURVEY.md §2.1/§2.2), feeding the
PageRank workload (config 5).

TPU-native redesign: scipy's index-chasing CSR loops are hostile to the
MXU/VPU, so two dense-layout formats replace CSR on device:

* **padded ELL** (:class:`SparseArray`) — ``cols``/``vals`` as dense
  ``(rows, max_nnz)`` arrays (pad entries point at column 0 with value 0).
  SpMV is a dense gather + multiply + row-sum: static shapes, fully
  vectorized, row-shardable over the mesh with a replicated ``x``
  (owner-computes, comm-free).  Random gathers are VPU-elementwise on TPU
  (~0.1 Gnnz/s) — the unstructured-sparsity limit.
* **block-ELL / BSR** (:class:`BlockSparseArray`) — for block-structured
  matrices: batched ``bs×bs`` block matvecs on the MXU (157 Gnnz/s
  measured on v5e, ~1000× the scalar path).

Host-side construction goes through scipy CSR; the C extension
(``spartan_tpu/_ext``) accelerates the CSR merge used when building tiles
from many partial updates.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spartan_tpu.core.mesh import get_mesh
from spartan_tpu.expr.base import Expr, Val, lazify


class SparseArray:
  """A 2-D sparse matrix in padded-ELL device layout."""

  __slots__ = ("cols", "vals", "shape", "nnz", "fmt", "_bsr_cache",
               "_windowed_cache", "_winsh_cache", "_t_cache",
               "_owner_cache", "_winmm_cache", "_winmmsh_cache",
               "_dense_cache")

  # numpy must defer binary ops to our reflected operators (otherwise
  # ``dense + sparse`` broadcasts elementwise, calling scalar+SparseArray
  # per element); scipy.sparse sets the same.
  __array_ufunc__ = None

  def __init__(self, cols: jax.Array, vals: jax.Array,
               shape: Tuple[int, int], nnz: int):
    self.cols = cols    # (rows, max_nnz) int32
    self.vals = vals    # (rows, max_nnz) dtype
    self.shape = tuple(shape)
    self.nnz = int(nnz)
    # Declared-intent format tag (scipy `.format` parity).  The DEVICE
    # layout is always padded ELL; the tag records which scipy format
    # the user asked for (csr_matrix/coo_matrix/... constructors,
    # format= kwargs) so `isspmatrix_csr`-style predicates and round
    # trips behave like scipy's.  Ingest canonicalizes via CSR → "csr".
    self.fmt = "csr"
    self._bsr_cache = None  # (bs, BlockSparseArray|None) from auto_route
    self._windowed_cache = None  # WindowedELL from to_windowed()
    self._winsh_cache = None  # (n_shards, ShardedWindowedELL)
    self._t_cache = None  # memoized transpose (VERDICT r2 weak #4)
    self._owner_cache = None  # (mesh key, row-sharded padded form)
    self._winmm_cache = None  # WindowedSpMM pack (or False: fill too low)
    self._winmmsh_cache = None  # (n_shards, ShardedWindowedSpMM | False)
    self._dense_cache = None  # memoized f32 densified form (dense route)

  @property
  def dtype(self):
    return self.vals.dtype

  @property
  def format(self) -> str:
    """scipy ``.format`` attribute — the declared-intent tag (the device
    layout itself is always padded ELL)."""
    return self.fmt

  @property
  def max_nnz_per_row(self) -> int:
    return int(self.cols.shape[1])

  @property
  def density(self) -> float:
    return self.nnz / (self.shape[0] * self.shape[1])

  def todense(self) -> np.ndarray:
    out = np.zeros(self.shape, dtype=self.vals.dtype)
    cols = np.asarray(self.cols)
    vals = np.asarray(self.vals)
    for i in range(self.shape[0]):
      np.add.at(out[i], cols[i], vals[i])
    return out

  def to_scipy(self):
    """Export to scipy CSR (explicitly-stored zeros are dropped — the ELL
    padding is indistinguishable from them)."""
    import scipy.sparse as ss
    from spartan_tpu.core.array import host_fetch
    n, k = self.cols.shape
    rows = np.repeat(np.arange(n), k)
    cols = host_fetch(self.cols).ravel()
    vals = np.asarray(self.vals).ravel()
    keep = vals != 0
    return ss.coo_matrix((vals[keep], (rows[keep], cols[keep])),
                         shape=self.shape).tocsr()

  def to_bsr(self, bs: int = 128, pad: bool = True) -> "BlockSparseArray":
    """Repack into block-ELL (``BlockSparseArray``) — the MXU SpMV path
    (~1000x over unstructured gathers when nonzeros cluster into
    ``bs x bs`` blocks).  ``pad=True`` zero-pads dims up to a multiple of
    ``bs``.  For uniformly random sparsity this trades memory for speed
    (each occupied block stores bs*bs values); profitable when the
    average occupied block holds more than a few nonzeros."""
    import scipy.sparse as ss
    mat = self.to_scipy().tocsr()
    n, m = mat.shape
    if (n % bs or m % bs):
      if not pad:
        raise ValueError(f"shape {mat.shape} not divisible by {bs}; "
                         "pass pad=True")
      np_, mp = -(-n // bs) * bs, -(-m // bs) * bs
      mat = ss.csr_matrix((mat.data, mat.indices, mat.indptr),
                          shape=(n, m))
      mat.resize((np_, mp))
    return from_scipy_bsr(mat, bs=bs, dtype=self.vals.dtype)

  def block_stats(self, bs: int = 128) -> Tuple[int, float]:
    """(occupied ``bs×bs`` blocks, storage expansion factor) — the
    expansion is ``blocks·bs² / nnz``: how many stored elements the
    block-ELL repack needs per actual nonzero.  Host-side, one pass."""
    from spartan_tpu.core.array import host_fetch
    cols = host_fetch(self.cols)
    vals = np.asarray(self.vals)
    rows = np.broadcast_to(np.arange(cols.shape[0])[:, None], cols.shape)
    keep = vals != 0
    nbc = -(-self.shape[1] // bs)
    block_ids = (rows[keep] // bs) * nbc + cols[keep] // bs
    n_blocks = int(np.unique(block_ids).size)
    expansion = n_blocks * bs * bs / max(self.nnz, 1)
    return n_blocks, expansion

  def auto_route(self, bs: int = 128) -> Optional["BlockSparseArray"]:
    """Detect block structure and return the MXU-path repack, or None.

    The block-ELL SpMV runs ~1000× faster per nonzero than unstructured
    gathers on TPU, so a repack paying up to
    ``FLAGS.sparse_bsr_max_expansion`` stored elements per nonzero still
    wins by orders of magnitude.  Result is cached (one detection pass
    per matrix).  Gated by ``FLAGS.sparse_auto_bsr``.
    """
    from spartan_tpu.config import FLAGS
    if not FLAGS.sparse_auto_bsr or self.nnz == 0:
      return None
    if self._bsr_cache is not None and self._bsr_cache[0] == bs:
      return self._bsr_cache[1]
    _, expansion = self.block_stats(bs)
    routed = None
    if expansion <= FLAGS.sparse_bsr_max_expansion:
      routed = self.to_bsr(bs=bs, pad=True)
    else:
      from spartan_tpu.util import log_info
      log_info(
          "spmv: %s has no exploitable %dx%d block structure "
          "(expansion %.1fx > %.1fx limit) — staying on the gather path; "
          "pre-pack with to_bsr()/a smaller block size if the layout is "
          "under your control", self, bs, bs, expansion,
          FLAGS.sparse_bsr_max_expansion)
    self._bsr_cache = (bs, routed)
    return routed

  def to_windowed(self):
    """Pack for the scalar-prefetch windowed SpMV kernel (one host pass,
    cached) — the unstructured path for matrices past the one-hot
    kernel's n=32K crossover (kernels/spmv_pallas.py)."""
    if self._windowed_cache is None:
      from spartan_tpu.backend.kernels import spmv_pallas
      self._windowed_cache = spmv_pallas.pack_windowed(self.to_scipy())
    return self._windowed_cache

  def to_windowed_sharded(self, n_shards: int):
    """Row-sharded windowed pack (one host pass, cached per shard count):
    shard d owns 1024-row output blocks [d·rb_per, (d+1)·rb_per) and the
    per-device kernel runs inside ``shard_map`` with x replicated — the
    multi-chip form of the windowed SpMV (owner-computes, comm-free)."""
    if self._winsh_cache is None or self._winsh_cache[0] != n_shards:
      from spartan_tpu.backend.kernels import spmv_pallas
      self._winsh_cache = (n_shards, spmv_pallas.pack_windowed_sharded(
          self.to_scipy(), n_shards))
    return self._winsh_cache[1]

  def shard(self, mesh=None) -> "SparseArray":
    """Row-shard the ELL tiles over the mesh (owner-computes SpMV: each
    device holds its output rows' cols/vals; ``x`` stays replicated, so
    the product is comm-free — the reference's sparse tile placement)."""
    import jax as _jax
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = mesh or get_mesh()
    axes = tuple(mesh.axis_names)
    n = self.shape[0]
    total = 1
    for a in axes:
      total *= mesh.shape[a]
    if n % total != 0:
      return self  # uneven rows: stay replicated
    spec = PartitionSpec(axes if len(axes) > 1 else axes[0], None)
    sh = NamedSharding(mesh, spec)
    return SparseArray(_jax.device_put(self.cols, sh),
                       _jax.device_put(self.vals, sh), self.shape, self.nnz)

  def to_windowed_spmm_sharded(self, n_shards: int,
                               min_fill: float = 0.2):
    """Sharded windowed-SpMM pack (leading dim = shard), memoized per
    shard count; None below the fill gate (see :meth:`to_windowed_spmm`).
    """
    cache = getattr(self, "_winmmsh_cache", None)
    if cache is None or cache[0] != n_shards:
      from spartan_tpu.backend.kernels import spmm_pallas
      packed = spmm_pallas.pack_windowed_spmm_sharded(self.to_scipy(),
                                                      n_shards)
      self._winmmsh_cache = (
          n_shards, packed if packed.fill >= min_fill else False)
    return self._winmmsh_cache[1] or None

  def to_windowed_spmm(self, min_fill: float = 0.2):
    """Windowed-SpMM pack (kernels/spmm_pallas.py), memoized; returns
    None when the measured pack fill is below ``min_fill`` (ultra-sparse
    matrices waste the MXU/DMA on padding — the XLA path wins there)."""
    if self._winmm_cache is None:
      from spartan_tpu.backend.kernels import spmm_pallas
      packed = spmm_pallas.pack_windowed_spmm(self.to_scipy())
      self._winmm_cache = packed if packed.fill >= min_fill else False
    return self._winmm_cache or None

  def to_densified(self) -> jax.Array:
    """Memoized f32 dense form of this matrix, built ON DEVICE (one XLA
    scatter-add over the ELL tiles — no host round trip).  Backs the
    densified SpMM route: at density ≳2e-3 the MXU dense matmul beats
    every per-nonzero gather formulation on TPU (the matmul runs at
    ~190 TFLOP/s while gathers are VPU-elementwise), so ``spmm`` trades
    4·n·m bytes of HBM for it when the budget flags allow.  ELL pad
    entries (col 0, val 0) scatter-add harmlessly."""
    if self._dense_cache is None:
      n, m = self.shape
      rows = jnp.broadcast_to(
          jnp.arange(n, dtype=jnp.int32)[:, None], self.cols.shape)
      self._dense_cache = (
          jnp.zeros((n, m), jnp.float32)
          .at[rows, self.cols].add(self.vals.astype(jnp.float32)))
    return self._dense_cache

  def transpose(self) -> "SparseArray":
    """Transpose via the sparse host round-trip — O(nnz), never densifies
    (the sparse dot/ALS paths transpose netflix-scale matrices).  Memoized
    on the instance: ``dot(dense, S)`` builds ``S.T`` at every expression
    construction, and the uncached host round-trip (plus the axon int32
    fetch workaround) was a per-step cost in eager loops (VERDICT r2
    weak #4).  ``S.T.T is S`` by construction."""
    if self._t_cache is None:
      t = from_scipy(self.to_scipy().T.tocsr(), dtype=self.dtype)
      t._t_cache = self
      self._t_cache = t
    return self._t_cache

  @property
  def T(self) -> "SparseArray":
    return self.transpose()

  def dot(self, b) -> "Expr":
    """Lazy ``A @ b`` (vector → SpMV, matrix → SpMM expr)."""
    return sparse_dot(self, b)

  def __matmul__(self, b):
    return sparse_dot(self, b)

  def __rmatmul__(self, a):
    from spartan_tpu.expr.dot import dot as _dot
    return _dot(a, self)

  # -- scipy.sparse-style surface (the reference's sparse tiles WERE
  # scipy matrices, so its users reach for these idioms).  Everything
  # below runs on device over the ELL tiles; pad entries are (col 0,
  # val 0), so any 0→0-preserving map over ``vals`` is safe. ----------------

  def _like(self, vals, nnz=None) -> "SparseArray":
    return SparseArray(self.cols, vals, self.shape,
                       self.nnz if nnz is None else nnz)

  def sum(self, axis=None):
    """Dense-semantics sum (scipy contract): (n,)/(m,) jax array or a
    scalar; axis=0 is one XLA scatter-add over the ELL tiles."""
    if axis in (1, -1):
      return jnp.sum(self.vals, axis=1)
    if axis == 0:
      return (jnp.zeros((self.shape[1],), self.vals.dtype)
              .at[self.cols.ravel()].add(self.vals.ravel()))
    if axis is None:
      return jnp.sum(self.vals)
    raise ValueError(f"axis {axis!r} out of range for 2-D sparse")

  def mean(self, axis=None):
    """scipy semantics: divide by the FULL dense extent, not nnz."""
    s = self.sum(axis)  # validates axis (ValueError, like sum)
    n, m = self.shape
    denom = {None: n * m, 0: n, 1: m, -1: m}[axis]
    return s / jnp.asarray(denom, jnp.result_type(s.dtype, jnp.float32))

  def getnnz(self, axis=None):
    """Stored-nonzero counts (explicit zeros were dropped at ingest)."""
    if axis is None:
      return self.nnz
    present = (self.vals != 0)
    if axis in (1, -1):
      return jnp.sum(present, axis=1)
    if axis == 0:
      return (jnp.zeros((self.shape[1],), jnp.int32)
              .at[self.cols.ravel()].add(present.ravel().astype(jnp.int32)))
    raise ValueError(f"axis {axis!r} out of range for 2-D sparse")

  count_nonzero = getnnz

  def diagonal(self, k: int = 0):
    """k-th diagonal as a dense jax array (scipy .diagonal contract)."""
    n, m = self.shape
    length = min(n + min(k, 0), m - max(k, 0))
    if length <= 0:
      return jnp.zeros((0,), self.vals.dtype)
    rows = jnp.arange(length) - min(k, 0)
    want_col = rows + k
    hit = (self.cols[rows] == want_col[:, None]) & (self.vals[rows] != 0)
    return jnp.sum(jnp.where(hit, self.vals[rows], 0), axis=1)

  def _masked(self, product):
    """Re-zero pad entries: a pad (val 0) times a gathered NaN/Inf would
    otherwise break the 0-pad invariant (0·inf = nan pollutes col 0)."""
    return self._like(jnp.where(self.vals != 0, product, 0))

  def multiply(self, other):
    """Elementwise product.  Scalar/dense: on-device over the ELL tiles
    (dense gathered at the stored coordinates); sparse×sparse: host
    intersection via scipy (O(nnz))."""
    if isinstance(other, SparseArray):
      return from_scipy(self.to_scipy().multiply(other.to_scipy()).tocsr())
    if np.ndim(other) == 0:
      return self._masked(self.vals * other)
    o = jnp.asarray(other)
    if o.shape == self.shape:
      rows = jnp.broadcast_to(
          jnp.arange(self.shape[0], dtype=jnp.int32)[:, None],
          self.cols.shape)
      return self._masked(self.vals * o[rows, self.cols])
    if o.shape == (1, self.shape[1]) or o.shape == (self.shape[1],):
      return self._masked(self.vals * o.reshape(-1)[self.cols])
    if o.shape == (self.shape[0], 1):
      return self._masked(self.vals * o)
    raise ValueError(f"inconsistent shapes {self.shape} vs {o.shape}")

  def astype(self, dtype) -> "SparseArray":
    return self._like(self.vals.astype(dtype))

  def copy(self) -> "SparseArray":
    return self._like(self.vals)  # buffers are immutable; fresh caches

  def power(self, p) -> "SparseArray":
    """Elementwise power over stored entries (scipy .power; p>0 keeps
    the 0→0 pad invariant)."""
    if p <= 0:
      raise ValueError("power(p) needs p > 0 to stay sparse")
    return self._like(jnp.where(self.vals != 0, self.vals, 0) ** p)

  def sqrt(self) -> "SparseArray":
    return self._like(jnp.sqrt(self.vals))

  def __abs__(self) -> "SparseArray":
    return self._like(jnp.abs(self.vals))

  def __neg__(self) -> "SparseArray":
    return self._like(-self.vals)

  def __mul__(self, s):
    return self.multiply(s)

  __rmul__ = __mul__

  def __truediv__(self, s):
    if np.ndim(s) != 0:
      raise TypeError("sparse division only supports scalars")
    return self._masked(self.vals / s)

  def __add__(self, other):
    """Sparse+sparse: device-side ELL concatenation (duplicate stored
    coordinates are legal and SUM under every compute path — SpMV
    gather, ``todense``, ``diagonal``; ``canonicalize()`` merges them
    when a minimal-width form is wanted).  Sparse+dense: dense result
    via one scatter-add (scipy densifying contract)."""
    if isinstance(other, SparseArray):
      if other.shape != self.shape:
        raise ValueError(f"shape mismatch {self.shape} vs {other.shape}")
      dt = jnp.result_type(self.vals.dtype, other.vals.dtype)
      cols = jnp.concatenate([self.cols, other.cols], axis=1)
      vals = jnp.concatenate([self.vals.astype(dt),
                              other.vals.astype(dt)], axis=1)
      return SparseArray(cols, vals, self.shape, self.nnz + other.nnz)
    if np.ndim(other) == 0:
      if other == 0:
        return self.copy()
      raise NotImplementedError(
          "adding a nonzero scalar to a sparse matrix would densify it "
          "(scipy contract); use A.todense() + s explicitly")
    o = jnp.asarray(other)
    if o.shape != self.shape:
      raise ValueError(f"shape mismatch {self.shape} vs {o.shape}")
    rows = jnp.broadcast_to(
        jnp.arange(self.shape[0], dtype=jnp.int32)[:, None],
        self.cols.shape)
    return o.astype(jnp.result_type(o.dtype, self.vals.dtype)).at[
        rows.ravel(), self.cols.ravel()].add(self.vals.ravel())

  __radd__ = __add__

  def __sub__(self, other):
    if isinstance(other, SparseArray):
      return self + (-other)
    if np.ndim(other) == 0:
      return self + (-other if other else 0)
    return self + (-jnp.asarray(other))

  def __rsub__(self, other):
    return (-self) + other

  def canonicalize(self) -> "SparseArray":
    """Merge duplicate coordinates and re-pack at minimal ELL width
    (host round trip — one-shot, like all ingest)."""
    return from_scipy(self.to_scipy(), dtype=self.dtype)

  def tocsr(self):
    return self.to_scipy()

  def tocoo(self):
    return self.to_scipy().tocoo()

  def __repr__(self):
    return (f"SparseArray(shape={self.shape}, nnz={self.nnz}, "
            f"max_nnz/row={self.max_nnz_per_row}, dtype={self.dtype})")


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------

def from_scipy(mat, dtype=None) -> SparseArray:
  """Build from any scipy.sparse matrix (CSR canonicalized)."""
  import scipy.sparse as ss
  csr = ss.csr_matrix(mat)
  csr.sum_duplicates()
  n, m = csr.shape
  counts = np.diff(csr.indptr)
  max_nnz = max(int(counts.max()) if n else 0, 1)
  cols = np.zeros((n, max_nnz), dtype=np.int32)
  vals = np.zeros((n, max_nnz), dtype=dtype or csr.dtype)
  if csr.nnz:
    # vectorized ELL fill (a python per-row loop is seconds at 1M rows);
    # int32 temporaries: ingest of a FRESH matrix is first-touch
    # page-fault bound on microVM hosts, so temp bytes ≈ wall time
    idt = np.int32 if csr.nnz < 2**31 and n < 2**31 else np.int64
    row_idx = np.repeat(np.arange(n, dtype=idt), counts)
    pos_in_row = (np.arange(csr.nnz, dtype=idt)
                  - np.repeat(csr.indptr[:-1].astype(idt), counts))
    cols[row_idx, pos_in_row] = csr.indices
    vals[row_idx, pos_in_row] = csr.data
  return SparseArray(jnp.asarray(cols), jnp.asarray(vals), (n, m),
                     int(csr.nnz))


def from_coo(rows, cols, vals, shape) -> SparseArray:
  import scipy.sparse as ss
  return from_scipy(ss.coo_matrix((vals, (rows, cols)), shape=shape))


def from_dense(arr, threshold: float = 0.0) -> SparseArray:
  import scipy.sparse as ss
  a = np.asarray(arr)
  a = np.where(np.abs(a) > threshold, a, 0)
  return from_scipy(ss.csr_matrix(a))


def sprandn(n: int, m: int, density: float = 0.01,
            seed: int = 0) -> SparseArray:
  """Random sparse normal matrix (reference ``sparse.rand`` analogue)."""
  import scipy.sparse as ss
  rng = np.random.default_rng(seed)
  nnz = int(n * m * density)
  rows = rng.integers(0, n, nnz)
  cols = rng.integers(0, m, nnz)
  vals = rng.standard_normal(nnz)
  return from_coo(rows, cols, vals, (n, m))


def merge_csr(a, b):
  """Additive merge of two scipy CSR matrices (the reference's sparse
  scatter-merge combiner) — native two-way row merge when the C extension
  is built, scipy fallback otherwise."""
  import scipy.sparse as ss
  a = ss.csr_matrix(a)
  b = ss.csr_matrix(b)
  if a.shape != b.shape:
    raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
  try:
    from spartan_tpu._ext import _extent_c
  except ImportError:
    _extent_c = None
  if _extent_c is None:
    return (a + b).tocsr()
  a.sort_indices()
  b.sort_indices()
  indptr, indices, data = _extent_c.csr_merge(
      a.indptr.tolist(), a.indices.tolist(), a.data.tolist(),
      b.indptr.tolist(), b.indices.tolist(), b.data.tolist(), a.shape[1])
  return ss.csr_matrix(
      (np.asarray(data), np.asarray(indices, dtype=np.int64),
       np.asarray(indptr, dtype=np.int64)), shape=a.shape)


sparse_rand = sprandn  # reference-name alias


def sparse_diagonal(v, shape: Optional[Tuple[int, int]] = None) -> SparseArray:
  """Diagonal sparse matrix from a vector (reference ``sparse_diagonal``)."""
  v = np.asarray(v)
  n = v.shape[0]
  shape = shape or (n, n)
  idx = np.arange(n)
  return from_coo(idx, idx, v, shape)


def save_sparse(A, path: str) -> None:
  """Persist a SparseArray / BlockSparseArray — sparse-tile checkpointing
  (reference: per-tile sparse pickles in ``expr/fio.py``).

  For a SparseArray, host-side packs built so far (block-ELL repack,
  windowed chunks) are saved too, so a reload skips the 10–50 s pack
  passes on large matrices."""
  import os
  os.makedirs(path, exist_ok=True)
  if isinstance(A, BlockSparseArray):
    np.savez(os.path.join(path, "bsr.npz"),
             block_cols=np.asarray(A.block_cols),
             block_vals=np.asarray(A.block_vals),
             shape=np.asarray(A.shape), bs=np.asarray(A.bs),
             nnz_blocks=np.asarray(A.nnz_blocks))
    return
  np.savez(os.path.join(path, "sparse.npz"),
           cols=np.asarray(A.cols), vals=np.asarray(A.vals),
           shape=np.asarray(A.shape), nnz=np.asarray(A.nnz))
  if A._bsr_cache is not None and A._bsr_cache[1] is not None:
    save_sparse(A._bsr_cache[1], os.path.join(path, "bsr_cache"))
  w = A._windowed_cache
  if w is not None:
    extra = {} if w.inv is None else {"inv": w.inv}
    np.savez(os.path.join(path, "windowed.npz"),
             rb=np.asarray(w.rb), win=np.asarray(w.win),
             init=np.asarray(w.init), cols_lo=np.asarray(w.cols_lo),
             rows_lo=np.asarray(w.rows_lo), vals=np.asarray(w.vals),
             shape=np.asarray(w.shape), nnz=np.asarray(w.nnz), **extra)
  if A._winsh_cache is not None:
    n_sh, ws = A._winsh_cache
    np.savez(os.path.join(path, "winsh.npz"),
             rb=np.asarray(ws.rb), win=np.asarray(ws.win),
             init=np.asarray(ws.init), cols_lo=np.asarray(ws.cols_lo),
             rows_lo=np.asarray(ws.rows_lo), vals=np.asarray(ws.vals),
             shape=np.asarray(ws.shape), n_shards=np.asarray(n_sh),
             rb_per=np.asarray(ws.rb_per), nnz=np.asarray(ws.nnz))


def load_sparse(path: str):
  """Load what :func:`save_sparse` wrote (SparseArray with any cached
  packs restored, or a bare BlockSparseArray)."""
  import os
  bsr_path = os.path.join(path, "bsr.npz")
  if os.path.exists(bsr_path) and not os.path.exists(
      os.path.join(path, "sparse.npz")):
    z = np.load(bsr_path)
    return BlockSparseArray(jnp.asarray(z["block_cols"]),
                            jnp.asarray(z["block_vals"]),
                            tuple(int(s) for s in z["shape"]),
                            int(z["bs"]), int(z["nnz_blocks"]))
  z = np.load(os.path.join(path, "sparse.npz"))
  A = SparseArray(jnp.asarray(z["cols"]), jnp.asarray(z["vals"]),
                  tuple(int(s) for s in z["shape"]), int(z["nnz"]))
  bc = os.path.join(path, "bsr_cache")
  if os.path.exists(os.path.join(bc, "bsr.npz")):
    routed = load_sparse(bc)
    A._bsr_cache = (routed.bs, routed)
  wp = os.path.join(path, "windowed.npz")
  if os.path.exists(wp):
    zw = np.load(wp)
    from spartan_tpu.backend.kernels.spmv_pallas import WindowedELL
    A._windowed_cache = WindowedELL(
        zw["rb"], zw["win"], zw["init"], zw["cols_lo"], zw["rows_lo"],
        zw["vals"], tuple(int(s) for s in zw["shape"]), int(zw["nnz"]),
        inv=zw["inv"] if "inv" in zw.files else None)
  sp_path = os.path.join(path, "winsh.npz")
  if os.path.exists(sp_path):
    zs = np.load(sp_path)
    from spartan_tpu.backend.kernels.spmv_pallas import ShardedWindowedELL
    A._winsh_cache = (int(zs["n_shards"]), ShardedWindowedELL(
        zs["rb"], zs["win"], zs["init"], zs["cols_lo"], zs["rows_lo"],
        zs["vals"], tuple(int(s) for s in zs["shape"]),
        int(zs["n_shards"]), int(zs["rb_per"]), int(zs["nnz"])))
  return A


# ---------------------------------------------------------------------------
# SpMV
# ---------------------------------------------------------------------------

def _mesh_key(mesh) -> tuple:
  return (tuple(mesh.axis_names), tuple(mesh.devices.shape),
          tuple(int(d.id) for d in mesh.devices.flat))


def _row_sharded(arrs, mesh):
  """device_put each (rows, ...) array row-sharded over ALL mesh axes."""
  from jax.sharding import NamedSharding, PartitionSpec

  axes = tuple(mesh.axis_names)
  entry = axes if len(axes) > 1 else axes[0]
  out = []
  for a in arrs:
    spec = PartitionSpec(entry, *([None] * (a.ndim - 1)))
    out.append(jax.device_put(a, NamedSharding(mesh, spec)))
  return out


def _dense_route_precision(precision):
  """Matmul precision for the densified MXU route.  The route replaces
  f32-faithful sparse formulations (~1e-6 relerr); letting the matmul take
  TPU-default bf16 passes would mean the auto-router silently changes
  answers by ~3 orders of magnitude (measured 2.4e-3 relerr SpMM —
  BASELINE.md r3 sweep).  Unspecified precision therefore floors to
  HIGHEST: measured free for SpMV (1.88 vs 1.79 Gnnz/s) and ~1.8× for
  SpMM while still 3–5× the windowed kernel this route supersedes.  An
  explicit per-call ``precision='default'`` keeps the raw bf16 path."""
  from spartan_tpu.expr.dot import _resolve_precision
  p = _resolve_precision(precision)
  if p is None and precision is None:
    return jax.lax.Precision.HIGHEST
  return p


def _dense_routable(A, spmv: bool = False) -> bool:
  """Should ``spmm``/``SpMMExpr`` (or ``spmv`` with the higher density
  bar) densify ``A`` and ride the dense MXU matmul?  True when density
  and the f32 memory budget make the dense path the throughput winner
  (TPU only; ``--sparse_force_dense`` for CPU-mesh test coverage).  f64
  stays on the XLA-faithful sparse path."""
  from spartan_tpu.config import FLAGS
  if (not FLAGS.sparse_dense_route or not isinstance(A, SparseArray)
      or jnp.dtype(A.dtype) == jnp.float64):
    return False
  if FLAGS.sparse_force_dense:
    return True
  n, m = A.shape
  min_d = (FLAGS.sparse_dense_min_density_spmv if spmv
           else FLAGS.sparse_dense_min_density)
  return (jax.devices()[0].platform != "cpu"
          and A.nnz >= min_d * n * m
          and 4 * n * m <= FLAGS.sparse_dense_max_bytes)


def _owner_shard_ell(A: "SparseArray", mesh) -> "SparseArray":
  """Owner-computes placement for the padded-ELL leaves (VERDICT r2
  missing #2): pad the row dim to divide the mesh, then row-shard
  cols/vals so XLA partitions the gather/einsum instead of replicating it
  on every device (the reference's sparse tile placement — SURVEY §2.1
  dot row).  Cached per mesh on the instance; emits trim the padded rows
  via ``n_rows``."""
  key = _mesh_key(mesh)
  if A._owner_cache is not None and A._owner_cache[0] == key:
    return A._owner_cache[1]
  n_dev = int(mesh.devices.size)
  pad = (-A.shape[0]) % n_dev
  cols, vals = A.cols, A.vals
  if pad:
    cols = jnp.pad(cols, ((0, pad), (0, 0)))   # col 0 × val 0: no-op rows
    vals = jnp.pad(vals, ((0, pad), (0, 0)))
  cols, vals = _row_sharded([cols, vals], mesh)
  out = SparseArray(cols, vals, (A.shape[0] + pad, A.shape[1]), A.nnz)
  A._owner_cache = (key, out)
  return out


def _owner_shard_bsr(A: "BlockSparseArray", mesh) -> "BlockSparseArray":
  """Block-row owner-computes placement for block-ELL leaves (pads the
  block-row dim to divide the mesh; see :func:`_owner_shard_ell`)."""
  key = _mesh_key(mesh)
  if A._owner_cache is not None and A._owner_cache[0] == key:
    return A._owner_cache[1]
  n_dev = int(mesh.devices.size)
  nbr = A.block_cols.shape[0]
  pad = (-nbr) % n_dev
  bc, bv = A.block_cols, A.block_vals
  if pad:
    bc = jnp.pad(bc, ((0, pad), (0, 0)))       # block 0 × zero vals
    bv = jnp.pad(bv, ((0, pad), (0, 0), (0, 0), (0, 0)))
  bc, bv = _row_sharded([bc, bv], mesh)
  out = BlockSparseArray(bc, bv, ((nbr + pad) * A.bs, A.shape[1]),
                         A.bs, A.nnz_blocks)
  A._owner_cache = (key, out)
  return out


def _spmv_ell(cols, vals, x):
  """Dense-gather ELL SpMV: y[i] = Σ_j vals[i,j] * x[cols[i,j]]."""
  gathered = jnp.take(x, cols, axis=0)      # (rows, max_nnz)
  return jnp.sum(vals * gathered, axis=1)


@jax.jit
def _spmv_jit(cols, vals, x):
  return _spmv_ell(cols, vals, x)


def spmv(A, x, use_pallas: Optional[bool] = None) -> jax.Array:
  """y = A @ x for a SparseArray / BlockSparseArray and dense vector."""
  if isinstance(A, BlockSparseArray):
    return bsr_spmv(A, x)
  want = (jnp.promote_types(A.dtype, np.asarray(x).dtype)
          if not isinstance(x, jax.Array) else x.dtype)
  xj = jnp.asarray(x, dtype=jax.dtypes.canonicalize_dtype(want))
  if xj.shape[0] != A.shape[1]:
    # jnp.take clamps out-of-bounds gathers silently — fail loudly instead
    raise ValueError(f"spmv dim mismatch: A is {A.shape}, x has "
                     f"{xj.shape[0]} rows")
  if jax.devices()[0].platform != "cpu" and use_pallas is not False:
    # unstructured gathers are the TPU sparse bottleneck (~0.1 Gnnz/s);
    # auto-detect block structure and take the MXU path when it exists.
    # An explicit use_pallas=False opt-out skips this too — the caller
    # asked for the XLA-faithful gather formulation (code-review r4)
    routed = A.auto_route()
    if routed is not None:
      xp = xj if xj.shape[0] == routed.shape[1] else jnp.pad(
          xj, (0, routed.shape[1] - xj.shape[0]))
      return bsr_spmv(routed, xp)[: A.shape[0]].astype(xj.dtype)
  from spartan_tpu.config import FLAGS
  on_cpu = jax.devices()[0].platform == "cpu"
  if (xj.dtype != jnp.float64
      and use_pallas is not False  # explicit opt-out keeps the XLA gather
      and not (FLAGS.sparse_force_onehot or FLAGS.sparse_force_windowed)
      and _dense_routable(A, spmv=True)):
    # densified MXU route (r3): past ~8e-3 density the dense matvec's
    # HBM-roofline read beats the windowed/one-hot Pallas kernels
    return jnp.matmul(A.to_densified(), xj.astype(jnp.float32),
                      precision=_dense_route_precision(None),
                      preferred_element_type=jnp.float32).astype(xj.dtype)
  if use_pallas is None:
    use_pallas = (FLAGS.use_pallas and not on_cpu) or (
        FLAGS.sparse_force_onehot or FLAGS.sparse_force_windowed)
  small = ((xj.shape[0] <= 32768 or FLAGS.sparse_force_onehot)
           and not FLAGS.sparse_force_windowed)
  a_f64 = jnp.dtype(A.dtype) == jnp.float64
  if use_pallas and small and xj.dtype != jnp.float64 and not a_f64:
    # one-hot MXU kernel: gather cost is 2n FLOP/nonzero, so it beats the
    # ~0.1 Gnnz/s XLA gather path only while n is small enough for the
    # MXU to amortize it (measured crossover ~32K on v5e; BASELINE.md)
    try:
      from spartan_tpu.backend.kernels import spmv_pallas
      mesh = get_mesh()
      if int(mesh.devices.size) > 1:
        # rows owner-computed per device (pallas is SPMD-opaque)
        return spmv_pallas.sharded_onehot_spmv(
            A.cols, A.vals.astype(jnp.float32), xj.astype(jnp.float32),
            mesh=mesh, interpret=on_cpu).astype(xj.dtype)
      return spmv_pallas.spmv(A.cols, A.vals, xj,
                              interpret=on_cpu).astype(xj.dtype)
    except Exception as e:
      _log_pallas_fallback("one-hot", e)  # fall back to the XLA gather
  if use_pallas and not small and xj.dtype != jnp.float64 and not a_f64:
    # past the one-hot crossover: the scalar-prefetch windowed kernel —
    # window-grouped chunks gather from 1024-element x windows, O(window)
    # instead of O(n) FLOP per nonzero (kernels/spmv_pallas.py)
    try:
      from spartan_tpu.backend.kernels import spmv_pallas
      mesh = get_mesh()
      if int(mesh.devices.size) > 1:
        packed = A.to_windowed_sharded(int(mesh.devices.size))
        rb, win, init, cols_lo, rows_lo, vals = packed.device_arrays()
        return spmv_pallas.sharded_windowed_spmv_traced(
            rb, win, init, cols_lo, rows_lo, vals, xj,
            shape=packed.shape, mesh=mesh,
            interpret=on_cpu).astype(xj.dtype)
      packed = A.to_windowed()
      rb, win, init, cols_lo, rows_lo, vals = packed.device_arrays()
      return spmv_pallas.windowed_spmv_traced(
          rb, win, init, cols_lo, rows_lo, vals, xj,
          shape=packed.shape, interpret=on_cpu).astype(xj.dtype)
    except Exception as e:
      _log_pallas_fallback("windowed", e)  # fall back to the XLA gather
  return _spmv_jit(A.cols, A.vals, xj)


_pallas_fallback_logged = set()


def _log_pallas_fallback(route: str, exc: Exception) -> None:
  """A failing Pallas sparse route silently degrading to the ~10x slower
  XLA gather is a diagnosable perf regression — log it once per route
  (ADVICE r2); the fallback itself stays."""
  if route not in _pallas_fallback_logged:
    _pallas_fallback_logged.add(route)
    from spartan_tpu.util import log_info
    log_info("sparse: %s Pallas route failed (%r); falling back to the "
             "XLA gather path", route, exc)


def spmm(A, B) -> jax.Array:
  """Sparse × dense matrix product via batched ELL gathers (auto-routed
  to the MXU block path when the sparsity has block structure)."""
  if isinstance(A, BlockSparseArray):
    return bsr_spmm(A, B)
  Bj = jnp.asarray(B)
  if Bj.shape[0] != A.shape[1]:
    raise ValueError(f"spmm dim mismatch: A is {A.shape}, B has "
                     f"{Bj.shape[0]} rows")
  if jax.devices()[0].platform != "cpu":
    routed = A.auto_route()
    if routed is not None:
      Bp = Bj if Bj.shape[0] == routed.shape[1] else jnp.pad(
          Bj, ((0, routed.shape[1] - Bj.shape[0]), (0, 0)))
      return bsr_spmm(routed, Bp)[: A.shape[0]].astype(Bj.dtype)
  from spartan_tpu.config import FLAGS
  on_cpu = jax.devices()[0].platform == "cpu"
  if Bj.dtype != jnp.float64 and _dense_routable(A):
    # densified MXU route (r3): see SpMMExpr — dense matmul beats every
    # per-nonzero gather once density/memory allow
    dt = jnp.promote_types(A.dtype, Bj.dtype)
    return jnp.matmul(A.to_densified(), Bj.astype(jnp.float32),
                      precision=_dense_route_precision(None),
                      preferred_element_type=jnp.float32).astype(dt)
  use_win = ((FLAGS.use_pallas and not on_cpu) or FLAGS.sparse_force_winmm)
  if (use_win and Bj.shape[1] <= 512 and Bj.dtype != jnp.float64
      and jnp.dtype(A.dtype) != jnp.float64
      and (int(get_mesh().devices.size) == 1
           or FLAGS.sparse_force_winmm)):
    try:
      from spartan_tpu.backend.kernels import spmm_pallas
      packed = A.to_windowed_spmm()
      if packed is not None:
        return spmm_pallas.windowed_spmm_traced(
            *packed.device_arrays(), Bj, shape=packed.shape,
            interpret=on_cpu).astype(Bj.dtype)
    except Exception as e:
      _log_pallas_fallback("windowed-spmm", e)
  gathered = jnp.take(Bj, A.cols, axis=0)    # (rows, max_nnz, k)
  return jnp.einsum("rm,rmk->rk", A.vals.astype(Bj.dtype), gathered)


# ---------------------------------------------------------------------------
# Block-sparse (block-ELL / BSR): MXU-speed structured sparsity
# ---------------------------------------------------------------------------

class BlockSparseArray:
  """Block-ELL: a (nbr × nbc) grid of ``bs×bs`` blocks, each block-row
  storing up to ``max_blocks`` nonzero blocks.

  Unstructured gathers are VPU-elementwise on TPU (~0.1 Gnnz/s); when the
  sparsity is block-structured, SpMV becomes a batched 128×128 matvec on
  the MXU — orders of magnitude faster.  This is the TPU answer to the
  reference's C++ sparse kernels for matrices you control the layout of.
  """

  __slots__ = ("block_cols", "block_vals", "shape", "bs", "nnz_blocks",
               "_owner_cache")

  def __init__(self, block_cols: jax.Array, block_vals: jax.Array,
               shape: Tuple[int, int], bs: int, nnz_blocks: int):
    self.block_cols = block_cols   # (nbr, max_blocks) int32
    self.block_vals = block_vals   # (nbr, max_blocks, bs, bs)
    self.shape = tuple(shape)
    self.bs = int(bs)
    self.nnz_blocks = int(nnz_blocks)
    self._owner_cache = None  # (mesh key, row-sharded padded form)

  @property
  def dtype(self):
    return self.block_vals.dtype

  def todense(self) -> np.ndarray:
    n, m = self.shape
    bs = self.bs
    out = np.zeros(self.shape, dtype=self.block_vals.dtype)
    bc = np.asarray(self.block_cols)
    bv = np.asarray(self.block_vals)
    for r in range(bc.shape[0]):
      for j in range(bc.shape[1]):
        c = int(bc[r, j])
        blk = bv[r, j]
        # padding blocks are all-zero; adding them is a no-op
        out[r * bs:(r + 1) * bs, c * bs:(c + 1) * bs] += blk
    return out

  def __repr__(self):
    return (f"BlockSparseArray(shape={self.shape}, bs={self.bs}, "
            f"nnz_blocks={self.nnz_blocks}, "
            f"max_blocks/row={self.block_cols.shape[1]})")


def from_scipy_bsr(mat, bs: int = 128, dtype=None) -> BlockSparseArray:
  """Build block-ELL from any scipy matrix (dims must divide by ``bs``)."""
  import scipy.sparse as ss
  bsr = ss.bsr_matrix(ss.csr_matrix(mat), blocksize=(bs, bs))
  n, m = bsr.shape
  if n % bs or m % bs:
    raise ValueError(f"shape {bsr.shape} not divisible by block size {bs}")
  nbr = n // bs
  counts = np.diff(bsr.indptr)
  max_blocks = max(int(counts.max()) if nbr else 0, 1)
  bc = np.zeros((nbr, max_blocks), dtype=np.int32)
  bv = np.zeros((nbr, max_blocks, bs, bs), dtype=dtype or bsr.dtype)
  nb = int(bsr.indptr[-1])
  if nb:
    row_idx = np.repeat(np.arange(nbr), counts)
    pos = np.arange(nb) - np.repeat(bsr.indptr[:-1], counts)
    bc[row_idx, pos] = bsr.indices
    bv[row_idx, pos] = bsr.data
  return BlockSparseArray(jnp.asarray(bc), jnp.asarray(bv), (n, m), bs,
                          int(bsr.indptr[-1]))


@jax.jit
def _bsr_spmv(block_cols, block_vals, x):
  nbr, mb, bs, _ = block_vals.shape
  xb = x.reshape(-1, bs)                      # (nbc, bs)
  gathered = jnp.take(xb, block_cols, axis=0)  # (nbr, mb, bs)
  # batched block matvec on the MXU
  y = jnp.einsum("rmij,rmj->ri", block_vals, gathered,
                 preferred_element_type=block_vals.dtype
                 if block_vals.dtype == jnp.float64 else jnp.float32)
  return y.reshape(-1).astype(block_vals.dtype)


def bsr_spmv(A: BlockSparseArray, x) -> jax.Array:
  """y = A @ x over block-ELL tiles (MXU batched matvec)."""
  xj = jnp.asarray(x)
  if xj.shape[0] != A.shape[1]:
    raise ValueError(f"bsr_spmv dim mismatch: A is {A.shape}, x has "
                     f"{xj.shape[0]} rows")
  return _bsr_spmv(A.block_cols, A.block_vals,
                   xj.astype(A.block_vals.dtype))


def bsr_spmm(A: BlockSparseArray, B) -> jax.Array:
  """Y = A @ B: batched 128×128 block matmuls on the MXU."""
  Bj = jnp.asarray(B)
  if Bj.shape[0] != A.shape[1]:
    raise ValueError(f"bsr_spmm dim mismatch: A is {A.shape}, B has "
                     f"{Bj.shape[0]} rows")
  bs = A.bs
  k = Bj.shape[1]
  Bb = Bj.reshape(-1, bs, k)                       # (nbc, bs, k)
  gathered = jnp.take(Bb, A.block_cols, axis=0)    # (nbr, mb, bs, k)
  y = jnp.einsum("rmij,rmjk->rik", A.block_vals.astype(Bj.dtype), gathered,
                 preferred_element_type=jnp.float32
                 if Bj.dtype != jnp.float64 else None)
  return y.reshape(A.shape[0], k).astype(Bj.dtype)


# ---------------------------------------------------------------------------
# Lazy-expr integration: SpMV as a DAG node
# ---------------------------------------------------------------------------

class SpMVExpr(Expr):
  """Lazy SpMV over a sparse leaf — composes with the rest of the DAG
  (e.g. the PageRank damping map fuses in after it).

  Construction picks the layout: a SparseArray with detectable block
  structure is repacked once into block-ELL (``auto_route``) so the node
  emits the MXU batched-matvec formulation; otherwise the padded-ELL
  gather.  The choice is captured in ``fmt`` (a cache-key param)."""

  _members = ("inputs",)
  _params = ("n_rows", "fmt", "bs", "pad_m", "n_shards", "precision",
             "src_dtype")

  def __init__(self, A, x, precision=None):
    self._A = A
    src_dtype = str(jnp.dtype(A.dtype))
    # 'high'/'highest' ask for XLA-faithful numerics: skip the bf16-pass
    # Pallas routes and run the exact gather/einsum formulations.  The
    # global --dot_precision flag participates via _resolve_precision
    # (ADVICE r2: a per-call None must inherit the flag's contract)
    from spartan_tpu.expr.dot import _resolve_precision
    exact = _resolve_precision(precision) is not None
    on_tpu = jax.devices()[0].platform != "cpu"
    if isinstance(A, SparseArray) and on_tpu:
      routed = A.auto_route()
      if routed is not None:
        A = routed
    if isinstance(A, BlockSparseArray):
      mesh = get_mesh()
      if int(mesh.devices.size) > 1:
        A = _owner_shard_bsr(A, mesh)   # owner-computes by default
      super().__init__(
          inputs=[Val(A.block_cols), Val(A.block_vals), lazify(x)],
          n_rows=self._A.shape[0], fmt="bsr", bs=A.bs, pad_m=A.shape[1],
          n_shards=0, precision=precision, src_dtype=src_dtype)
      return
    from spartan_tpu.config import FLAGS
    xl = lazify(x)
    try:
      xb_f64 = jnp.dtype(xl.dtype) == jnp.float64
    except Exception:
      xb_f64 = True  # unknown dtype: stay on the XLA-faithful path
    if (not xb_f64
        and not (FLAGS.sparse_force_onehot or FLAGS.sparse_force_windowed)
        and _dense_routable(A, spmv=True)):
      # densified MXU route (r3): see SpMMExpr — at density ≳8e-3 the
      # dense matvec's HBM-roofline read beats the Pallas kernels
      Ad = A.to_densified()
      mesh = get_mesh()
      n_dev = int(mesh.devices.size)
      if n_dev > 1:
        pad = (-Ad.shape[0]) % n_dev
        if pad:
          Ad = jnp.pad(Ad, ((0, pad), (0, 0)))
        (Ad,) = _row_sharded([Ad], mesh)
      super().__init__(
          inputs=[Val(Ad), xl], n_rows=A.shape[0], fmt="dense", bs=0,
          pad_m=A.shape[1], n_shards=0, precision=precision,
          src_dtype=src_dtype)
      return
    if (not exact
        and (FLAGS.sparse_force_windowed or (on_tpu and A.shape[1] > 32768))
        and jnp.dtype(A.dtype) != jnp.float64):
      # past the one-hot crossover: scalar-prefetch windowed kernel; the
      # packed chunk arrays ride as ordinary leaf inputs.  On a
      # multi-device mesh the 1024-row output blocks are owner-computed:
      # the pack is row-sharded per device and the kernel runs inside
      # shard_map (fmt="winsh") instead of replicating the whole matrix
      n_dev = int(get_mesh().devices.size)
      if n_dev > 1:
        packed = A.to_windowed_sharded(n_dev)
        super().__init__(
            inputs=[Val(a) for a in packed.device_arrays()] + [xl],
            n_rows=A.shape[0], fmt="winsh", bs=0, pad_m=A.shape[1],
            n_shards=n_dev, precision=precision, src_dtype=src_dtype)
        return
      packed = A.to_windowed()
      super().__init__(
          inputs=[Val(a) for a in packed.device_arrays()] + [xl],
          n_rows=A.shape[0], fmt="win", bs=0, pad_m=A.shape[1],
          n_shards=0, precision=precision, src_dtype=src_dtype)
      return
    mesh = get_mesh()
    if int(mesh.devices.size) > 1:
      A = _owner_shard_ell(A, mesh)     # owner-computes by default
    super().__init__(inputs=[Val(A.cols), Val(A.vals), xl],
                     n_rows=self._A.shape[0], fmt="ell", bs=0,
                     pad_m=A.shape[1], n_shards=0, precision=precision,
                     src_dtype=src_dtype)

  def _windowed_coo_emit(self, rb, win, cols_lo, rows_lo, vals, x,
                         n_pad: int):
    """Differentiable (pure-XLA) lowering of the windowed pack: the chunk
    arrays decode to global COO coordinates, y = scatter-add of
    vals·x[col] — gather/scatter both have autodiff rules, so sp.grad
    flows through sparse nodes even though evaluation uses Pallas."""
    win_elems = 8 * 128
    dt = jnp.promote_types(vals.dtype, x.dtype)
    strips = cols_lo.shape[0] // rb.shape[0]
    rb_strip = jnp.repeat(rb, strips)                     # (S*8,)
    rows_g = rb_strip[:, None] * win_elems + rows_lo
    cols_g = win[:, None] * win_elems + cols_lo
    mq = -(-self.pad_m // win_elems) * win_elems
    xp = jnp.pad(x.astype(dt), (0, mq - x.shape[0]))
    contrib = vals.astype(dt) * xp[cols_g]
    y = jnp.zeros((n_pad,), dt).at[rows_g].add(contrib)
    return y[: self.n_rows]

  def _emit(self, ctx, deps):
    if self.fmt == "dense":
      Ad, x = deps
      dt = jnp.promote_types(jnp.dtype(self.src_dtype), x.dtype)
      y = jnp.matmul(Ad, x.astype(jnp.float32),
                     precision=_dense_route_precision(self.precision),
                     preferred_element_type=jnp.float32)
      return y[: self.n_rows].astype(dt)
    if self.fmt == "winsh":
      rb, win, init, cols_lo, rows_lo, vals, x = deps
      from spartan_tpu.backend.kernels import spmv_pallas
      dt = jnp.promote_types(vals.dtype, x.dtype)
      mesh = get_mesh()
      interp = jax.default_backend() == "cpu"
      if ctx.differentiable:
        rb_g, win_g, _, cols_g, rows_g, vals_g, n_pad = (
            spmv_pallas.unshard_windowed(rb, win, init, cols_lo, rows_lo,
                                         vals, self.n_rows, self.n_shards))
        return self._windowed_coo_emit(rb_g, win_g, cols_g, rows_g,
                                       vals_g, x, int(n_pad)).astype(dt)
      if int(mesh.devices.size) == self.n_shards:
        return spmv_pallas.sharded_windowed_spmv_traced(
            rb, win, init, cols_lo, rows_lo, vals, x.astype(jnp.float32),
            shape=(self.n_rows, self.pad_m), mesh=mesh,
            interpret=interp).astype(dt)
      # mesh changed size since construction: flatten the per-shard stacks
      # back to the global windowed form (traced, owner order preserved)
      if not ctx.abstract and int(mesh.devices.size) > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        rep = NamedSharding(mesh, PartitionSpec())
        rb, win, init, cols_lo, rows_lo, vals, x = (
            jax.lax.with_sharding_constraint(a, rep)
            for a in (rb, win, init, cols_lo, rows_lo, vals, x))
      rb_g, win_g, init_g, cols_g, rows_g, vals_g, n_pad = (
          spmv_pallas.unshard_windowed(rb, win, init, cols_lo, rows_lo,
                                       vals, self.n_rows, self.n_shards))
      return spmv_pallas.windowed_spmv_traced(
          rb_g, win_g, init_g, cols_g, rows_g, vals_g,
          x.astype(jnp.float32), shape=(n_pad, self.pad_m),
          interpret=interp)[: self.n_rows].astype(dt)
    if self.fmt == "win":
      rb, win, init, cols_lo, rows_lo, vals, x = deps
      from spartan_tpu.backend.kernels import spmv_pallas
      if ctx.differentiable:
        n_pad = max(-(-self.n_rows // 1024), 1) * 1024
        dt = jnp.promote_types(vals.dtype, x.dtype)
        return self._windowed_coo_emit(rb, win, cols_lo, rows_lo, vals, x,
                                       n_pad).astype(dt)
      if not ctx.abstract:
        # the pallas_call is opaque to the SPMD partitioner: on a
        # multi-device mesh the packed chunk operands (and x) must be
        # replicated, not row-sharded by AutoTiling
        from jax.sharding import NamedSharding, PartitionSpec
        mesh = get_mesh()
        if mesh.devices.size > 1:
          rep = NamedSharding(mesh, PartitionSpec())
          rb, win, init, cols_lo, rows_lo, vals, x = (
              jax.lax.with_sharding_constraint(a, rep)
              for a in (rb, win, init, cols_lo, rows_lo, vals, x))
      return spmv_pallas.windowed_spmv_traced(
          rb, win, init, cols_lo, rows_lo, vals, x.astype(jnp.float32),
          shape=(self.n_rows, self.pad_m),
          interpret=jax.default_backend() == "cpu").astype(
              jnp.promote_types(vals.dtype, x.dtype))
    cols, vals, x = deps
    dt = jnp.promote_types(vals.dtype, x.dtype)
    from spartan_tpu.expr.dot import _resolve_precision
    prec = _resolve_precision(self.precision)
    if self.fmt == "bsr":
      if x.shape[0] < self.pad_m:
        x = jnp.pad(x, (0, self.pad_m - x.shape[0]))
      xb = x.astype(dt).reshape(-1, self.bs)
      gathered = jnp.take(xb, cols, axis=0)        # (nbr, mb, bs)
      y = jnp.einsum(
          "rmij,rmj->ri", vals.astype(dt), gathered, precision=prec,
          preferred_element_type=None if dt == jnp.float64 else jnp.float32)
      return y.reshape(-1)[: self.n_rows].astype(dt)
    from spartan_tpu.config import FLAGS
    on_accel = jax.default_backend() != "cpu"
    if (dt == jnp.float32 and x.shape[0] <= 32768
        and not ctx.differentiable and prec is None
        and (FLAGS.sparse_force_onehot
             or (not ctx.abstract and FLAGS.use_pallas and on_accel))):
      # unstructured fast path: one-hot MXU gather kernel (see
      # kernels/spmv_pallas.py for the crossover analysis).  On a
      # multi-device mesh the ELL rows are owner-computed per device via
      # shard_map (the pallas_call is opaque to the SPMD partitioner)
      from spartan_tpu.backend.kernels import spmv_pallas
      mesh = get_mesh()
      if int(mesh.devices.size) > 1:
        return spmv_pallas.sharded_onehot_spmv(
            cols, vals.astype(dt), x.astype(dt), mesh=mesh,
            interpret=not on_accel).astype(dt)[: self.n_rows]
      if not on_accel:   # forced on CPU: interpret-mode single device
        return spmv_pallas.spmv(cols, vals.astype(dt), x.astype(dt),
                                interpret=True).astype(dt)[: self.n_rows]
      return spmv_pallas.spmv(cols, vals.astype(dt), x.astype(dt)
                              ).astype(dt)[: self.n_rows]
    return _spmv_ell(cols, vals.astype(dt), x)[: self.n_rows]


class SpMMExpr(Expr):
  """Lazy sparse × dense MATRIX product ``A @ B`` (B is (m, k)) — the
  reference's sparse-tile dot path (``spartan/expr/dot.py`` dispatched to
  scipy for sparse tiles; SURVEY.md §2.1 dot row).

  Like :class:`SpMVExpr`, construction picks the layout: block structure
  routes to batched MXU block matmuls (``bsr``), otherwise the padded-ELL
  gather.  Both lowerings are plain XLA (gather + einsum), so autodiff
  flows through with no special casing."""

  _members = ("inputs",)
  _params = ("n_rows", "fmt", "bs", "pad_m", "n_shards", "precision",
             "src_dtype")

  def __init__(self, A, B, precision=None):
    self._A = A
    src_dtype = str(jnp.dtype(A.dtype))
    on_tpu = jax.devices()[0].platform != "cpu"
    if isinstance(A, SparseArray) and on_tpu:
      routed = A.auto_route()
      if routed is not None:
        A = routed
    mesh = get_mesh()
    if isinstance(A, BlockSparseArray):
      if int(mesh.devices.size) > 1:
        A = _owner_shard_bsr(A, mesh)   # owner-computes by default
      super().__init__(
          inputs=[Val(A.block_cols), Val(A.block_vals), lazify(B)],
          n_rows=self._A.shape[0], fmt="bsr", bs=A.bs, pad_m=A.shape[1],
          n_shards=0, precision=precision, src_dtype=src_dtype)
      return
    from spartan_tpu.config import FLAGS
    from spartan_tpu.expr.dot import _resolve_precision
    Bl = lazify(B)
    try:
      b_f64 = jnp.dtype(Bl.dtype) == jnp.float64
    except Exception:
      b_f64 = True  # unknown dtype: stay on the XLA-faithful path
    if not b_f64 and _dense_routable(A):
      # densified MXU route (r3): at density ≳2e-3 with the f32 dense
      # form within budget, one dense matmul (~190 TFLOP/s / HBM-bound)
      # beats every per-nonzero gather formulation — measured ~7× the
      # windowed Pallas kernel at d=5e-3 (BASELINE.md).  Plain XLA dot:
      # differentiable, precision knob honored, and on a mesh the tiler
      # partitions it like any dense dot (row-sharded leaf).
      Ad = A.to_densified()
      n_dev = int(mesh.devices.size)
      if n_dev > 1:
        pad = (-Ad.shape[0]) % n_dev
        if pad:
          Ad = jnp.pad(Ad, ((0, pad), (0, 0)))
        (Ad,) = _row_sharded([Ad], mesh)
      super().__init__(
          inputs=[Val(Ad), Bl], n_rows=A.shape[0], fmt="dense", bs=0,
          pad_m=A.shape[1], n_shards=0, precision=precision,
          src_dtype=src_dtype)
      return
    try:
      k_cols = Bl.shape[1] if len(Bl.shape) == 2 else None
    except Exception:
      k_cols = None
    if (_resolve_precision(precision) is None and k_cols is not None
        and k_cols <= 512
        and (FLAGS.sparse_force_winmm
             or jax.devices()[0].platform != "cpu")
        and jnp.dtype(A.dtype) != jnp.float64):
      # unstructured fast path (VERDICT r2 missing #5): the windowed
      # Pallas SpMM kernel — fill-gated at pack time (ultra-sparse
      # matrices stay on the XLA gather).  On a >1-device mesh the
      # output row blocks are owner-computed per device (fmt='winmmsh',
      # per-device pallas_call inside shard_map, B replicated).
      n_dev = int(mesh.devices.size)
      if n_dev > 1:
        packed = A.to_windowed_spmm_sharded(n_dev)
        if packed is not None:
          super().__init__(
              inputs=[Val(a) for a in packed.device_arrays()] + [Bl],
              n_rows=A.shape[0], fmt="winmmsh", bs=0, pad_m=A.shape[1],
              n_shards=n_dev, precision=precision, src_dtype=src_dtype)
          return
      else:
        packed = A.to_windowed_spmm()
        if packed is not None:
          super().__init__(
              inputs=[Val(a) for a in packed.device_arrays()] + [Bl],
              n_rows=A.shape[0], fmt="winmm", bs=0, pad_m=A.shape[1],
              n_shards=0, precision=precision, src_dtype=src_dtype)
          return
    if int(mesh.devices.size) > 1:
      A = _owner_shard_ell(A, mesh)     # owner-computes by default
    super().__init__(inputs=[Val(A.cols), Val(A.vals), lazify(B)],
                     n_rows=self._A.shape[0], fmt="ell", bs=0,
                     pad_m=A.shape[1], n_shards=0, precision=precision,
                     src_dtype=src_dtype)

  def _winmm_coo_emit(self, rb, win, cols_lo, rows_lo, vals, B,
                      n_pad=None):
    """Differentiable (pure-XLA) lowering of the SpMM windowed pack:
    decode the chunk arrays back to global COO and scatter-add — gather
    and scatter both have autodiff rules (mirrors SpMVExpr's
    _windowed_coo_emit)."""
    from spartan_tpu.backend.kernels import spmm_pallas as smp
    dt = jnp.promote_types(vals.dtype, B.dtype)
    strips = cols_lo.shape[0] // rb.shape[0]
    rows_g = jnp.repeat(rb, strips)[:, None] * smp._RB + rows_lo
    cols_g = jnp.repeat(win, strips)[:, None] * smp._WIN + cols_lo
    mq = -(-self.pad_m // smp._WIN) * smp._WIN
    Bp = jnp.pad(B.astype(dt), ((0, mq - B.shape[0]), (0, 0)))
    k = B.shape[1]
    contrib = (vals.astype(dt).reshape(-1)[:, None]
               * Bp[cols_g.reshape(-1), :])
    if n_pad is None:
      n_pad = max(-(-self.n_rows // smp._RB), 1) * smp._RB
    Y = jnp.zeros((n_pad, k), dt).at[rows_g.reshape(-1)].add(contrib)
    return Y[: self.n_rows]

  def _emit(self, ctx, deps):
    if self.fmt == "dense":
      Ad, B = deps
      if B.ndim != 2:
        raise ValueError(f"SpMMExpr needs a 2-D right operand, got "
                         f"{B.shape}")
      dt = jnp.promote_types(jnp.dtype(self.src_dtype), B.dtype)
      y = jnp.matmul(Ad, B.astype(jnp.float32),
                     precision=_dense_route_precision(self.precision),
                     preferred_element_type=jnp.float32)
      return y[: self.n_rows].astype(dt)
    if self.fmt == "winmmsh":
      rb, win, init, cols_lo, rows_lo, vals, B = deps
      dt = jnp.promote_types(vals.dtype, B.dtype)
      from spartan_tpu.backend.kernels import spmm_pallas
      mesh = get_mesh()
      if ctx.differentiable or int(mesh.devices.size) != self.n_shards:
        # autodiff, or the mesh changed size since construction: flatten
        # back to the global windowed form (traced jnp ops)
        *flat, n_pad = spmm_pallas.unshard_windowed_spmm(
            rb, win, init, cols_lo, rows_lo, vals, self.n_rows,
            self.n_shards)
        if ctx.differentiable:
          return self._winmm_coo_emit(flat[0], flat[1], flat[3], flat[4],
                                      flat[5], B, n_pad).astype(dt)
        return spmm_pallas.windowed_spmm_traced(
            *flat, B, shape=(n_pad, self.pad_m),
            interpret=jax.default_backend() == "cpu"
        )[: self.n_rows].astype(dt)
      return spmm_pallas.sharded_windowed_spmm_traced(
          rb, win, init, cols_lo, rows_lo, vals, B,
          shape=(self.n_rows, self.pad_m), mesh=mesh,
          interpret=jax.default_backend() == "cpu").astype(dt)
    if self.fmt == "winmm":
      rb, win, init, cols_lo, rows_lo, vals, B = deps
      dt = jnp.promote_types(vals.dtype, B.dtype)
      if ctx.differentiable:
        return self._winmm_coo_emit(rb, win, cols_lo, rows_lo, vals,
                                    B).astype(dt)
      if not ctx.abstract:
        # the pallas_call is opaque to the SPMD partitioner: if this node
        # is evaluated on a >1-device mesh (forced-route tests), pin the
        # operands replicated (production multi-device SpMM routes to the
        # row-sharded ELL owner-computes path at construction instead)
        from jax.sharding import NamedSharding, PartitionSpec
        mesh = get_mesh()
        if mesh.devices.size > 1:
          rep = NamedSharding(mesh, PartitionSpec())
          rb, win, init, cols_lo, rows_lo, vals, B = (
              jax.lax.with_sharding_constraint(a, rep)
              for a in (rb, win, init, cols_lo, rows_lo, vals, B))
      from spartan_tpu.backend.kernels import spmm_pallas
      return spmm_pallas.windowed_spmm_traced(
          rb, win, init, cols_lo, rows_lo, vals, B,
          shape=(self.n_rows, self.pad_m),
          interpret=jax.default_backend() == "cpu").astype(dt)
    cols, vals, B = deps
    if B.ndim != 2:
      raise ValueError(f"SpMMExpr needs a 2-D right operand, got {B.shape}")
    dt = jnp.promote_types(vals.dtype, B.dtype)
    from spartan_tpu.expr.dot import _resolve_precision
    prec = _resolve_precision(self.precision)
    if self.fmt == "bsr":
      if B.shape[0] < self.pad_m:
        B = jnp.pad(B, ((0, self.pad_m - B.shape[0]), (0, 0)))
      bs = self.bs
      Bb = B.astype(dt).reshape(-1, bs, B.shape[1])     # (nbc, bs, k)
      gathered = jnp.take(Bb, cols, axis=0)             # (nbr, mb, bs, k)
      y = jnp.einsum(
          "rmij,rmjk->rik", vals.astype(dt), gathered, precision=prec,
          preferred_element_type=None if dt == jnp.float64 else jnp.float32)
      return y.reshape(-1, B.shape[1])[: self.n_rows].astype(dt)
    gathered = jnp.take(B.astype(dt), cols, axis=0)     # (rows, max_nnz, k)
    return jnp.einsum("rm,rmk->rk", vals.astype(dt), gathered,
                      precision=prec).astype(dt)[: self.n_rows]


def spmv_expr(A, x) -> SpMVExpr:
  return SpMVExpr(A, x)


def spmm_expr(A, B) -> SpMMExpr:
  return SpMMExpr(A, B)


def sparse_dot(A, b, precision=None) -> Expr:
  """Lazy ``A @ b`` for a sparse left operand: vector → :class:`SpMVExpr`,
  matrix → :class:`SpMMExpr` (what ``sp.dot`` dispatches to).
  ``precision`` in ('high', 'highest') routes to the XLA-faithful
  formulations (no bf16-pass Pallas kernels)."""
  if isinstance(b, (SparseArray, BlockSparseArray)):
    raise TypeError(
        "sparse @ sparse products are unsupported — densify one operand "
        "(e.g. sp.from_numpy(S2.todense())) or restructure the "
        "computation; the reference's sparse dot was sparse x dense too")
  nd = getattr(b, "ndim", None)
  if nd is None:
    nd = np.ndim(getattr(b, "data", b)) if not isinstance(b, Expr) else None
  if nd is None:  # lazy expr: ask its aval
    nd = len(b.aval().shape)
  if nd == 1:
    return SpMVExpr(A, b, precision=precision)
  if nd == 2:
    return SpMMExpr(A, b, precision=precision)
  raise ValueError(f"sparse dot supports 1-D/2-D right operands, got {nd}-D")


# scipy idiom: toarray is the ndarray-returning sibling of todense
SparseArray.toarray = SparseArray.todense
BlockSparseArray.toarray = BlockSparseArray.todense
