"""``sp.linalg`` — NumPy-style linear algebra over the distributed
primitives.

The reference shipped its linear algebra as example programs
(``spartan/examples/{cholesky,qr,cg,lanczos,pca}`` — SURVEY.md §2.5
broader demo set); this module promotes them to a library surface so a
``np.linalg`` user finds the expected entry points.  Every O(n²)+ step
runs as sharded expression-layer ops on the mesh; only O(b³) diagonal
blocks / O(k³) Krylov eigenproblems run driver-side (the reference's
single-tile kernel granularity).

Conventions: inputs may be numpy arrays, exprs, or SpartanArrays;
returns are SpartanArrays (factor/solve surfaces) or numpy (tiny
Krylov/σ outputs), matching the examples they wrap.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import spartan_tpu as sp


__all__ = ["cholesky", "qr", "solve", "solve_triangular", "lstsq",
           "eigvalsh_lanczos", "svd_lowrank", "cg",
           # full np.linalg surface (r3): XLA-native dense factorizations
           "inv", "pinv", "det", "slogdet", "eigh", "eigvalsh", "eig",
           "eigvals", "svd", "svdvals", "matrix_power", "matrix_rank",
           "cond", "norm", "multi_dot", "tensorsolve", "tensorinv",
           "matrix_transpose"]


def cholesky(A, block: int = 128):
  """Lower-triangular ``L`` with ``L @ L.T == A`` for SPD ``A``
  (blocked right-looking; panel solve + rank-b update sharded on the
  mesh)."""
  from spartan_tpu.examples import cholesky as _chol
  return _chol.factor(A, block=block)


def qr(X, method: str = "auto") -> Tuple[object, object]:
  """Reduced QR.  Tall-skinny matrices (n ≥ 4d) take CholeskyQR2 (two
  sharded Gram+correction rounds — the distributed-scale path); square /
  near-square or ill-conditioned-unfriendly shapes take XLA's on-device
  Householder QR (``method='householder'``/'tsqr' to force).  Returns
  ``(Q, R)`` with ``Q @ R == X``, Q's columns orthonormal."""
  Xl = sp.lazify(X)
  n, d = Xl.shape
  if method == "auto":
    method = "tsqr" if n >= 4 * d else "householder"
  if method == "householder":
    q, r = _lin_multi(Xl, "qr", 2)
    return q, r
  if method != "tsqr":
    raise ValueError(f"unknown qr method {method!r}")
  from spartan_tpu.examples import qr as _qr
  q, r = _qr.tsqr(Xl)
  return q, sp.from_numpy(np.ascontiguousarray(r)).evaluate()


def solve_triangular(A, b, lower: bool = True, block: int = 256):
  """Solve ``A x = b`` for triangular ``A`` by blocked substitution.

  The O(n²) off-diagonal updates are sharded ``sp.dot`` products; each
  (block, block) diagonal system is solved driver-side (reference
  single-tile granularity).  ``b`` may be (n,) or (n, m)."""
  import scipy.linalg as sla
  A, b = sp.lazify(A), sp.lazify(b)
  n = A.shape[0]
  vec = len(b.shape) == 1
  bounds = [(j, min(j + block, n)) for j in range(0, n, block)]
  if not lower:
    bounds = bounds[::-1]
  x = sp.Val(sp.zeros(tuple(b.shape), dtype=np.float64).evaluate())
  for i0, i1 in bounds:
    rhs = b[i0:i1]
    if lower and i0 > 0:
      rhs = rhs - sp.dot(A[i0:i1, 0:i0], x[0:i0], precision="highest")
    elif not lower and i1 < n:
      rhs = rhs - sp.dot(A[i0:i1, i1:n], x[i1:n], precision="highest")
    diag = np.asarray(A[i0:i1, i0:i1].glom())
    xi = sla.solve_triangular(diag, np.asarray(rhs.glom()), lower=lower)
    idx = (slice(i0, i1),) if vec else (slice(i0, i1), slice(None))
    x = sp.Val(sp.assign(x, idx, sp.Val(xi)).evaluate())
  return x.evaluate()


def cg(A, b, tol: float = 1e-10, max_iters: int = 1000):
  """Conjugate-gradient SPD solve, entirely on device (one compiled
  ``sp.while_loop`` iterating to tolerance)."""
  from spartan_tpu.examples import cg as _cg
  return _cg.solve_fused(A, b, tol=tol, max_iters=max_iters)


def solve(A, b, method: str = "auto", block: int = 128,
          tol: float = 1e-10):
  """Solve ``A x = b``.

  ``method``: 'lu' (XLA on-device partial-pivot LU — correct for ANY
  square ``A``, the np.linalg.solve contract; this is 'auto'),
  'cholesky' (SPD only: blocked distributed factor + two triangular
  solves — the scale path), or 'cg' (SPD, iterative, whole solve in one
  compiled device loop)."""
  if method == "auto":
    method = "lu"
  if method == "lu":
    return sp.map([sp.lazify(A), sp.lazify(b)], _jl_solve2)
  if method == "cg":
    return cg(A, b, tol=tol)
  if method != "cholesky":
    raise ValueError(f"unknown method {method!r}")
  L = cholesky(A, block=block)
  y = solve_triangular(L, b, lower=True, block=block)
  return solve_triangular(sp.transpose(L), y, lower=False, block=block)


def _jl_solve2(a, b):
  import jax.numpy as jnp
  return jnp.linalg.solve(a, b)


def lstsq(X, y, reg: float = 0.0, method: str = "auto"):
  """Least-squares ``argmin_w |X w - y|² + reg |w|²`` via the normal
  equations: the (d, d) Gram matrix is a sharded ``X.T @ X``; the small
  SPD system then solves with :func:`solve`.  Returns the solution only
  (np.linalg.lstsq's (x, residuals, rank, s) extras are cheap to derive:
  residuals = |Xw-y|², rank/s via :func:`svdvals`)."""
  X, y = sp.lazify(X), sp.lazify(y)
  d = X.shape[1]
  g = sp.dot(sp.transpose(X), X, precision="highest")
  if reg:
    g = g + reg * sp.eye(d, dtype=np.float64)
  c = sp.dot(sp.transpose(X), y, precision="highest")
  # the Gram matrix is SPD — keep the blocked distributed factorization
  # as the default route (np.linalg.solve-style LU stays available)
  method = "cholesky" if method == "auto" else method
  return solve(sp.Val(g.evaluate()), sp.Val(c.evaluate()), method=method)


def eigvalsh_lanczos(A, k: int = 6, m: int | None = None, seed: int = 0):
  """Top-k eigenvalues of symmetric ``A`` from an m-step Lanczos
  subspace (sharded matvecs; the m×m tridiagonal eigenproblem is
  driver-side).  Returns a (k,) numpy array, ascending (np.linalg.eigh
  order)."""
  from spartan_tpu.examples import lanczos as _lan
  A = sp.lazify(A)
  m = m if m is not None else max(2 * k + 8, 24)
  m = min(m, int(A.shape[0]))
  alphas, betas, _ = _lan.tridiagonalize(A, k=m, seed=seed)
  t = np.diag(alphas)
  if len(betas):
    nn = len(alphas)
    t += np.diag(betas[:nn - 1], 1) + np.diag(betas[:nn - 1], -1)
  vals = np.linalg.eigvalsh(t)
  return vals[-k:]


def svd_lowrank(X, k: int = 6, iterations: int = 20, seed: int = 0):
  """Randomized rank-k SVD (the reference's SSVD): subspace iteration
  with sharded matmuls; returns ``(U (n,k), S (k,), Vt (k,d))`` numpy."""
  from spartan_tpu.examples import pca as _pca
  return _pca.ssvd(X, k=k, iterations=iterations, seed=seed)


# -- full np.linalg surface (r3) --------------------------------------------
#
# Dense factorizations as LAZY exprs over XLA's native TPU lowerings
# (eigh/svd/LU all compile to on-device kernels).  These are the
# np.linalg convenience entry points at single-factorization scale; the
# sharded/blocked variants above (blocked cholesky, TSQR, Lanczos, SSVD,
# CG) are the distributed-scale paths.  Multi-output factorizations
# return tuples of exprs — evaluated together (one region) XLA CSEs the
# shared factorization; evaluated separately each output re-factorizes.

# Distributed-scale alternatives named by the replication guard below.
_DISTRIBUTED_ALT = {
    "inv": "sp.linalg.cg / sp.linalg.solve (blocked Cholesky for SPD)",
    "pinv": "sp.linalg.svd_lowrank (randomized SSVD) + lstsq",
    "svd": "sp.linalg.svd_lowrank (randomized SSVD)",
    "svdvals": "sp.linalg.svd_lowrank",
    "eigh": "sp.linalg.eigvalsh_lanczos (top-k Krylov)",
    "eigvalsh": "sp.linalg.eigvalsh_lanczos",
    "qr": "sp.linalg.qr(method='tsqr') (CholeskyQR2)",
    "cholesky": "sp.linalg.cholesky (blocked right-looking)",
    "solve": "sp.linalg.cg / sp.linalg.solve_triangular after blocked "
             "cholesky",
}


def _replication_guard(A, name):
  """Dense factorizations lower as ONE whole-operand map: on a >1-device
  mesh XLA silently all-gathers a sharded operand per device (VERDICT r3
  missing #5).  Warn past --linalg_replicate_warn_bytes; hard-error past
  --linalg_replicate_max_bytes.  Concrete fully-replicated operands are
  exempt — no gather happens for them."""
  from spartan_tpu.config import FLAGS
  from spartan_tpu.core.mesh import get_mesh
  from spartan_tpu.util import log_warn
  try:
    mesh = get_mesh()
    if int(mesh.devices.size) <= 1:
      return
    av = A.aval() if hasattr(A, "aval") else A
    nbytes = int(np.prod(av.shape)) * np.dtype(av.dtype).itemsize
    warn_at = int(FLAGS.linalg_replicate_warn_bytes)
    err_at = int(FLAGS.linalg_replicate_max_bytes)
    if nbytes < warn_at and (err_at <= 0 or nbytes < err_at):
      return
    # a concrete operand that is ALREADY fully replicated incurs no
    # gather — only sharded (or not-yet-placed lazy) operands do
    data = getattr(A, "data", None)
    if data is None:
      val = getattr(A, "value", None)
      data = getattr(val, "data", val) if val is not None else None
    sh = getattr(data, "sharding", None)
    if sh is not None:
      spec = getattr(sh, "spec", None)
      # jax 0.9 reports is_fully_replicated=False for NamedSharding with
      # an empty PartitionSpec on Auto-type meshes — check the spec too
      if getattr(sh, "is_fully_replicated", False) or (
          spec is not None and all(s is None for s in spec)):
        return
  except Exception:
    return  # the guard must never break a valid program
  alt = _DISTRIBUTED_ALT.get(name, "a blocked/Krylov formulation")
  msg = (f"sp.linalg.{name}: {nbytes / 1e6:.0f} MB operand will be "
         f"replicated on every one of the {int(mesh.devices.size)} devices "
         f"(single-factorization lowering; XLA inserts an all-gather). "
         f"At scale use {alt}, or raise --linalg_replicate_warn_bytes.")
  if err_at > 0 and nbytes >= err_at:
    raise ValueError(msg + " (--linalg_replicate_max_bytes exceeded)")
  # warn once per (op, shape, dtype): an iterative workload constructing
  # the same factorization every step must not spam the log (code-review
  # r4 — same convention as _eig_host_notice)
  key = (name, tuple(av.shape), str(av.dtype))
  if key not in _replication_warned:
    _replication_warned.add(key)
    log_warn("%s", msg)


_replication_warned: set = set()


def _jl_call(name, kw, a):
  import jax.numpy as jnp
  return getattr(jnp.linalg, name)(a, **dict(kw))


def _jl_pick(name, kw, i, a):
  import jax.numpy as jnp
  return getattr(jnp.linalg, name)(a, **dict(kw))[i]


def _lin_map(A, name, **kw):
  import functools
  A = sp.lazify(A)
  _replication_guard(A, name)
  return sp.map([A],
                functools.partial(_jl_call, name, tuple(sorted(kw.items()))))


def _lin_multi(A, name, n_out, **kw):
  import functools
  A = sp.lazify(A)
  _replication_guard(A, name)
  kwt = tuple(sorted(kw.items()))
  return tuple(sp.map([A], functools.partial(_jl_pick, name, kwt, i))
               for i in range(n_out))


def inv(A):
  """Matrix inverse (XLA LU; prefer :func:`solve` for a single system)."""
  return _lin_map(A, "inv")


def pinv(A, rtol=None):
  return _lin_map(A, "pinv", **({} if rtol is None else {"rtol": rtol}))


def det(A):
  return _lin_map(A, "det")


def slogdet(A):
  """``(sign, logabsdet)`` exprs (np.linalg.slogdet contract)."""
  return _lin_multi(A, "slogdet", 2)


def eigvalsh(A):
  """Full ascending spectrum of a symmetric matrix (XLA on-device eigh;
  for top-k at scale use :func:`eigvalsh_lanczos`)."""
  return _lin_map(A, "eigvalsh")


def eigh(A):
  """``(w, v)`` exprs — eigenvalues ascending, orthonormal columns."""
  return _lin_multi(A, "eigh", 2)


def _eig_stacked(a):
  w, v = np.linalg.eig(a)
  return np.concatenate([w[None, :], v], axis=0)


def eig(A):
  """General (non-symmetric) eigendecomposition ``(w, v)``.

  XLA:TPU has no nonsymmetric-eig kernel, so this is an eager host
  boundary (``np.linalg.eig``) — the same NotShapeable-style convention
  the framework uses for data-dependent shapes.  Complex outputs.  One
  host factorization: w and v are slices of a single stacked result."""
  from spartan_tpu.expr.fio import HostExpr
  _eig_host_notice("eig")
  st = HostExpr([sp.lazify(A)], _eig_stacked)
  return st[0], st[1:]


def _eig_host_notice(name):
  """eig/eigvals are the ONE np.linalg pair that silently changes
  execution model (eager host boundary — VERDICT r3 weak #5): say so
  once per process so the contract is visible without spamming loops."""
  if _eig_host_notice._done:
    return
  _eig_host_notice._done = True
  from spartan_tpu.util import log_info
  log_info(
      "sp.linalg.%s: general (non-symmetric) eigendecomposition has no "
      "XLA:TPU kernel — this evaluates EAGERLY on the host "
      "(np.linalg.%s), breaking the lazy chain at this node. For "
      "symmetric/Hermitian operands use sp.linalg.eigh (on-device).",
      name, name)


_eig_host_notice._done = False


def eigvals(A):
  from spartan_tpu.expr.fio import HostExpr
  _eig_host_notice("eigvals")
  return HostExpr([sp.lazify(A)], np.linalg.eigvals)


def svd(X, full_matrices: bool = False, compute_uv: bool = True):
  """Full SVD ``(U, S, Vt)`` exprs (XLA on-device kernel); with
  ``compute_uv=False`` returns the singular-value expr alone.  For
  rank-k at scale use :func:`svd_lowrank`."""
  if not compute_uv:
    return _lin_map(X, "svd", full_matrices=full_matrices,
                    compute_uv=False)
  return _lin_multi(X, "svd", 3, full_matrices=full_matrices)


def svdvals(X):
  return svd(X, compute_uv=False)


def matrix_power(A, n: int):
  return _lin_map(A, "matrix_power", n=int(n))


def matrix_rank(A, rtol=None):
  return _lin_map(A, "matrix_rank",
                  **({} if rtol is None else {"rtol": rtol}))


def cond(A, p=None):
  return _lin_map(A, "cond", **({} if p is None else {"p": p}))


def multi_dot(arrays):
  """Chained matmul with optimal parenthesization (np.linalg.multi_dot);
  one fused region over all operands."""
  import jax.numpy as jnp
  return sp.map([sp.lazify(a) for a in arrays],
                lambda *xs: jnp.linalg.multi_dot(list(xs)))


def tensorsolve(A, b, axes=None):
  return sp.map([sp.lazify(A), sp.lazify(b)],
                _jl_tensorsolve if axes is None else
                __import__("functools").partial(_jl_tensorsolve_ax,
                                                tuple(axes)))


def _jl_tensorsolve(a, b):
  import jax.numpy as jnp
  return jnp.linalg.tensorsolve(a, b)


def _jl_tensorsolve_ax(axes, a, b):
  import jax.numpy as jnp
  return jnp.linalg.tensorsolve(a, b, axes=axes)


def tensorinv(A, ind: int = 2):
  return _lin_map(A, "tensorinv", ind=int(ind))


def matrix_transpose(A):
  return sp.swapaxes(sp.lazify(A), -1, -2)


def norm(x, ord=None, axis=None, keepdims: bool = False):
  """np.linalg.norm with the full ``ord`` surface (2-norms of matrices
  via on-device SVD; Frobenius/vector norms stay elementwise+reduce)."""
  kw = {"keepdims": keepdims}
  if ord is not None:
    kw["ord"] = ord
  if axis is not None:
    kw["axis"] = axis
  return _lin_map(x, "norm", **kw)


# -- numpy 2.0 array-API additions (third parity sweep) ---------------------
# np.linalg grew aliases of the top-level products plus matrix_norm /
# vector_norm / vecdot; delegate to the existing distributed ops.

def matmul(a, b):
  return sp.matmul(a, b)


def tensordot(a, b, axes=2):
  return sp.tensordot(a, b, axes=axes)


def outer(a, b):
  return sp.outer(a, b)


def cross(a, b, axis=-1):
  return sp.cross(a, b, axis=axis)


def diagonal(A, offset=0):
  return sp.diagonal(sp.lazify(A), offset=offset)


def trace(A, offset=0):
  return sp.trace(sp.lazify(A), offset=offset)


def vecdot(a, b, axis=-1):
  return sp.vecdot(a, b, axis=axis)


def matrix_norm(A, ord="fro", keepdims: bool = False):
  return norm(sp.lazify(A), ord=ord, axis=(-2, -1), keepdims=keepdims)


def vector_norm(x, ord=2, axis=None, keepdims: bool = False):
  v = sp.lazify(x)
  if axis is None and v.ndim > 1:
    nd = v.ndim
    out = norm(sp.ravel(v), ord=ord)
    # numpy keepdims contract: all-singleton shape at the ORIGINAL rank
    return sp.reshape(out, (1,) * nd) if keepdims else out
  return norm(v, ord=ord, axis=axis, keepdims=keepdims)


__all__ += ["matmul", "tensordot", "outer", "cross", "diagonal", "trace",
            "vecdot", "matrix_norm", "vector_norm"]
