"""Iterative solvers and spectral methods (the ``scipy.sparse.linalg``
surface), TPU-fused.

Reference: the reference ships driver-looped CG/Lanczos example programs
(``spartan/examples/`` — SURVEY.md §2.5 broader demo set) and no solver
API; ``scipy.sparse.linalg`` is what users of a NumPy-like framework
reach for, so that is the surface implemented here.  TPU-first shape:
every solver runs its ENTIRE iteration as ONE compiled on-device loop
(``sp.while_loop`` / ``sp.fori_loop``) — matvecs are sharded MXU
contractions (dense exprs), auto-routed ``SpMVExpr`` kernels
(``SparseArray``), or arbitrary expr-level callables
(:class:`LinearOperator`); the scalar recurrences live in the loop
carry, so there are ZERO per-iteration host syncs (scipy syncs on every
norm check).

Krylov bases are maintained as ``(m+1, n)`` ROW blocks updated by
rank-1 one-hot outer products — no dynamic indexing, static shapes,
``n`` on the TPU lane dimension (shardable).  Basis selection /
projection are small dense contractions; ``precision='highest'`` keeps
them f32-exact on TPU (bf16 MXU passes would destroy orthogonality).

Provided (scipy-compatible signatures, simplified return tails):
``LinearOperator``, ``aslinearoperator``, ``cg``, ``bicgstab``,
``gmres``, ``minres``, ``lsqr`` (CGLS form), ``eigsh`` (thick-restart Lanczos), ``eigs``
(Krylov-Schur), ``svds``, ``expm_multiply`` (Krylov exponential
action), ``norm``, ``spsolve`` (dense-factorization fallback,
size-gated).  Not provided: direct factorizations (``splu``/``spilu``
— no sparse LU on TPU; use ``cg``/``gmres`` or the size-gated
``spsolve``), dense ``expm`` (use ``expm_multiply``).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

import spartan_tpu as sp
from spartan_tpu.config import FLAGS, BoolFlag, IntFlag
from spartan_tpu.expr.base import Expr

FLAGS.add(IntFlag(
    "spsolve_dense_max", 8192,
    "spsolve densifies and LU-factorizes up to this many rows; larger "
    "systems raise (use cg/gmres/lsqr)"))

__all__ = [
    "LinearOperator", "aslinearoperator", "cg", "bicgstab", "gmres",
    "minres", "lsqr", "eigsh", "eigs", "svds", "norm", "spsolve",
    "expm_multiply",
]

_TINY = 1e-30


def _default_float():
  import jax
  return np.dtype(np.float64 if jax.config.jax_enable_x64 else np.float32)


def _hi_dot(a, b):
  return sp.dot(a, b, precision="highest")


class LinearOperator:
  """Matrix-free operator: ``matvec`` (and optional ``rmatvec``) are
  expr-level callables ``(n,) expr -> (m,) expr`` whose bodies may use
  any lazy ops (they are traced into the solver's fused loop)."""

  def __init__(self, shape, matvec: Callable, rmatvec: Callable = None,
               dtype=None):
    self.shape = tuple(int(s) for s in shape)
    if len(self.shape) != 2:
      raise ValueError("LinearOperator shape must be (m, n)")
    self._matvec = matvec
    self._rmatvec = rmatvec
    self.dtype = np.dtype(dtype) if dtype is not None else None

  def matvec(self, x):
    return self._matvec(x)

  def rmatvec(self, x):
    if self._rmatvec is None:
      raise ValueError("this LinearOperator has no rmatvec (pass one to "
                       "use lsqr/svds/transpose)")
    return self._rmatvec(x)

  @property
  def T(self):
    if self._rmatvec is None:
      raise ValueError("cannot transpose a LinearOperator without "
                       "rmatvec (pass one at construction)")
    return LinearOperator((self.shape[1], self.shape[0]),
                          self._rmatvec, self._matvec, dtype=self.dtype)

  def __matmul__(self, x):
    return self.matvec(x)


def aslinearoperator(A) -> LinearOperator:
  """Wrap a dense expr/ndarray, a sparse array, or a LinearOperator."""
  from spartan_tpu.backend import sparse as sps
  if isinstance(A, LinearOperator):
    return A
  if isinstance(A, (sps.SparseArray, sps.BlockSparseArray)):
    # no explicit precision: an explicit knob forces the sparse emitters
    # onto the XLA-faithful gather formulation (sparse.py prec gate) and
    # loses the Pallas kernels (~200x on a 2^20-row system, measured
    # r4s2); the kernels are already hi/lo-split f32-exact-ish.
    # A.T is built LAZILY on first rmatvec use — the transpose repack is
    # a host round trip cg/gmres/eigsh never need
    def _rmv(x, _memo=[]):
      if not _memo:
        _memo.append(A.T)
      return sp.dot(_memo[0], x)
    return LinearOperator(
        A.shape, lambda x: sp.dot(A, x),
        _rmv if hasattr(A, "T") else None, dtype=A.dtype)
  Ae = sp.lazify(A)
  if Ae.ndim != 2:
    raise ValueError(f"expected a 2-D operator, got ndim={Ae.ndim}")
  Av = sp.Val(Ae.evaluate())  # share ONE evaluated leaf across the loop
  return LinearOperator(Av.shape, lambda x: _hi_dot(Av, x),
                        lambda x: _hi_dot(x, Av), dtype=Av.dtype)


def _psolve(M) -> Callable:
  if M is None:
    return lambda x: x
  return aslinearoperator(M).matvec


def _setup(A, b, x0):
  op = aslinearoperator(A)
  b = sp.lazify(b)
  if b.ndim != 1 or b.shape[0] != op.shape[0]:
    raise ValueError(f"b shape {b.shape} incompatible with operator "
                     f"{op.shape}")
  n = op.shape[1]
  dt = np.dtype(b.evaluate().dtype)
  if dt.kind != "f":
    dt = _default_float()
    b = b.astype(dt)
  x0e = sp.zeros((n,), dtype=dt) if x0 is None else sp.lazify(x0).astype(dt)
  return op, b, x0e, dt


def _tol_of(b, rtol, atol) -> float:
  bnorm = float(sp.sqrt(_hi_dot(b, b)).glom())
  return max(float(rtol) * bnorm, float(atol)), bnorm


def _i32(v):
  return v.astype(np.int32) if isinstance(v, Expr) else np.int32(v)


def cg(A, b, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
       maxiter: int = None, M=None):
  """Conjugate gradient for SPD ``A``.  Returns ``(x, info)`` — info 0
  on convergence (``|r| <= max(rtol*|b|, atol)``), else the iteration
  count at exit (scipy convention).  The whole solve is one compiled
  ``while_loop``; with ``M`` (a preconditioner approximating ``A⁻¹``)
  this is standard preconditioned CG.

  ``b`` may also be a (n, k) BLOCK of right-hand sides (beyond scipy,
  which loops): every column runs its own CG recurrence in the same
  fused loop — matvecs become MXU matmuls, inner products become
  columnwise reductions, and the loop runs until EVERY column meets
  its own ``max(rtol·|b_col|, atol)`` (converged columns coast with
  zero-effect updates).  Returns ``(X (n, k), info)``."""
  if getattr(sp.lazify(b), "ndim", 1) == 2:
    return _cg_block(A, b, x0, rtol=rtol, atol=atol, maxiter=maxiter,
                     M=M)
  op, b, x0e, dt = _setup(A, b, x0)
  psolve = _psolve(M)
  tol, bnorm = _tol_of(b, rtol, atol)
  if bnorm == 0.0:
    return sp.zeros((op.shape[1],), dtype=dt).evaluate(), 0
  maxiter = int(maxiter) if maxiter else 10 * op.shape[1]

  r0 = b - op.matvec(x0e)
  z0 = psolve(r0)
  rz0 = _hi_dot(r0, z0)

  def cond(x, r, p, rz, k):
    return (sp.sqrt(_hi_dot(r, r)) > tol) & (k < maxiter)

  def body(x, r, p, rz, k):
    Ap = op.matvec(p)
    denom = _hi_dot(p, Ap)
    alpha = rz / sp.where(sp.abs(denom) > _TINY, denom, 1.0)
    x2 = x + alpha * p
    r2 = r - alpha * Ap
    z2 = psolve(r2)
    rz2 = _hi_dot(r2, z2)
    beta = rz2 / sp.where(sp.abs(rz) > _TINY, rz, 1.0)
    return x2, r2, z2 + beta * p, rz2, _i32(k + 1)

  x, r, _, _, k = sp.while_loop(cond, body, (x0e, r0, z0, rz0, _i32(0)),
                                max_iters=maxiter)
  rnorm = float(np.sqrt(float(sp.dot(r, r, precision="highest").glom())))
  return x, (0 if rnorm <= tol * (1 + 1e-6) else int(np.asarray(k.glom())))


def _cg_block(A, B, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
              maxiter: int = None, M=None):
  """Multi-RHS CG: independent per-column recurrences, one fused loop."""
  op = aslinearoperator(A)
  Be = sp.lazify(B)
  if Be.ndim != 2 or Be.shape[0] != op.shape[0]:
    raise ValueError(f"B shape {Be.shape} incompatible with operator "
                     f"{op.shape}")
  n, k = op.shape[1], Be.shape[1]
  dt = np.dtype(Be.evaluate().dtype)
  if dt.kind != "f":
    dt = _default_float()
    Be = Be.astype(dt)
  psolve = _psolve(M)
  X0 = sp.zeros((n, k), dtype=dt) if x0 is None else sp.lazify(x0).astype(
      dt)
  bnorm2 = np.asarray(sp.sum(Be * Be, axis=0).glom(), np.float64)
  tol2 = np.maximum(float(rtol) ** 2 * bnorm2, float(atol) ** 2)
  tol2 = np.maximum(tol2, 1e-300).astype(dt)  # zero columns: converged
  maxiter = int(maxiter) if maxiter else 10 * n

  def _colsum(u, v):
    return sp.sum(u * v, axis=0)          # (k,) columnwise inner products

  R0 = Be - op.matvec(X0)
  Z0 = psolve(R0)
  rz0 = _colsum(R0, Z0)

  def cond(X, R, P, rz, kk):
    return sp.any(_colsum(R, R) > tol2) & (kk < maxiter)

  def body(X, R, P, rz, kk):
    AP = op.matvec(P)
    denom = _colsum(P, AP)
    alpha = rz / sp.where(sp.abs(denom) > _TINY, denom, 1.0)
    X2 = X + alpha * P
    R2 = R - alpha * AP
    Z2 = psolve(R2)
    rz2 = _colsum(R2, Z2)
    beta = rz2 / sp.where(sp.abs(rz) > _TINY, rz, 1.0)
    return X2, R2, Z2 + beta * P, rz2, _i32(kk + 1)

  X, R, _, _, kk = sp.while_loop(cond, body, (X0, R0, Z0, rz0, _i32(0)),
                                 max_iters=maxiter)
  r2 = np.asarray(sp.lazify(sp.sum(sp.lazify(R) * sp.lazify(R),
                                   axis=0)).glom(), np.float64)
  ok = bool((r2 <= tol2.astype(np.float64) * (1 + 1e-6)).all())
  return X, (0 if ok else int(np.asarray(kk.glom())))


def bicgstab(A, b, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
             maxiter: int = None, M=None):
  """BiCGSTAB for general (nonsymmetric) ``A``; one fused
  ``while_loop`` (preconditioned, van der Vorst form).  Returns
  ``(x, info)`` like :func:`cg`."""
  op, b, x0e, dt = _setup(A, b, x0)
  psolve = _psolve(M)
  tol, bnorm = _tol_of(b, rtol, atol)
  if bnorm == 0.0:
    return sp.zeros((op.shape[1],), dtype=dt).evaluate(), 0
  maxiter = int(maxiter) if maxiter else 10 * op.shape[1]

  r0 = sp.Val((b - op.matvec(x0e)).evaluate())  # shadow residual, fixed

  def cond(x, r, p, v, rho, alpha, omega, k):
    return (sp.sqrt(_hi_dot(r, r)) > tol) & (k < maxiter)

  def _safe(d):
    return sp.where(sp.abs(d) > _TINY, d, 1.0)

  def body(x, r, p, v, rho, alpha, omega, k):
    rho2 = _hi_dot(r0, r)
    beta = (rho2 / _safe(rho)) * (alpha / _safe(omega))
    p2 = r + beta * (p - omega * v)
    ph = psolve(p2)
    v2 = op.matvec(ph)
    alpha2 = rho2 / _safe(_hi_dot(r0, v2))
    s = r - alpha2 * v2
    sh = psolve(s)
    t = op.matvec(sh)
    omega2 = _hi_dot(t, s) / _safe(_hi_dot(t, t))
    x2 = x + alpha2 * ph + omega2 * sh
    r2 = s - omega2 * t
    return x2, r2, p2, v2, rho2, alpha2, omega2, _i32(k + 1)

  zero = sp.zeros((op.shape[1],), dtype=dt)
  one = sp.lazify(np.asarray(1.0, dtype=dt))
  x, r, *_, k = sp.while_loop(
      cond, body, (x0e, r0, zero, zero, one, one, one, _i32(0)),
      max_iters=maxiter)
  rnorm = float(np.sqrt(float(sp.dot(r, r, precision="highest").glom())))
  return x, (0 if rnorm <= tol * (1 + 1e-6) else int(np.asarray(k.glom())))


def minres(A, b, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
           maxiter: int = None):
  """MINRES for symmetric (possibly INDEFINITE) ``A`` — where cg's SPD
  assumption fails and gmres needs O(restart·n) basis memory, minres
  minimizes ``|r|`` over the Krylov space with a 3-term Lanczos
  recurrence + on-the-fly Givens QR: five n-vectors of state, one
  matvec per iteration, all in one compiled ``while_loop``
  (Paige–Saunders formulation).  Returns ``(x, info)`` like
  :func:`cg`."""
  op, b, x0e, dt = _setup(A, b, x0)
  tol, bnorm = _tol_of(b, rtol, atol)
  if bnorm == 0.0:
    return sp.zeros((op.shape[1],), dtype=dt).evaluate(), 0
  maxiter = int(maxiter) if maxiter else 10 * op.shape[1]

  r0 = sp.Val((b - op.matvec(x0e)).evaluate())
  beta1 = sp.sqrt(_hi_dot(r0, r0))
  zero_v = sp.zeros((op.shape[1],), dtype=dt)
  zero_s = sp.lazify(np.asarray(0.0, dtype=dt))

  def _safe(d):
    return sp.where(sp.abs(d) > _TINY, d, 1.0)

  def cond(x, r1, r2, w, w2, oldb, beta, dbar, epsln, phibar, cs, sn, k):
    # phibar tracks |r| exactly in exact arithmetic
    return (phibar > tol) & (k < maxiter)

  def body(x, r1, r2, w, w2, oldb, beta, dbar, epsln, phibar, cs, sn, k):
    v = r2 / _safe(beta)
    y = op.matvec(v)
    y = y - sp.where(k > 0, beta / _safe(oldb), 0.0) * r1
    alfa = _hi_dot(v, y)
    y = y - (alfa / _safe(beta)) * r2
    r1n, r2n = r2, y
    oldb2 = beta
    beta2 = sp.sqrt(_hi_dot(y, y))
    oldeps = epsln
    delta = cs * dbar + sn * alfa
    gbar = sn * dbar - cs * alfa
    epsln2 = sn * beta2
    dbar2 = -cs * beta2
    gamma = sp.maximum(sp.sqrt(gbar * gbar + beta2 * beta2), _TINY)
    cs2 = gbar / gamma
    sn2 = beta2 / gamma
    phi = cs2 * phibar
    phibar2 = sn2 * phibar
    w1n, w2n = w2, w
    wn = (v - oldeps * w1n - delta * w2n) / gamma
    x2 = x + phi * wn
    return (x2, r1n, r2n, wn, w2n, oldb2, beta2, dbar2, epsln2,
            phibar2, cs2, sn2, _i32(k + 1))

  init = (x0e, r0, r0, zero_v, zero_v, zero_s, beta1, zero_s, zero_s,
          beta1, sp.lazify(np.asarray(-1.0, dtype=dt)), zero_s, _i32(0))
  out = sp.while_loop(cond, body, init, max_iters=maxiter)
  x, k = out[0], out[-1]
  r = b - op.matvec(sp.Val(sp.lazify(x).evaluate()))
  rnorm = float(np.sqrt(float(sp.dot(r, r, precision="highest").glom())))
  return x, (0 if rnorm <= tol * (1 + 1e-6) else int(np.asarray(k.glom())))


def _lstsq_kernel(h, g):
  import jax.numpy as jnp
  return jnp.linalg.lstsq(h, g)[0]


def _onehot(j, m, dt):
  return (sp.arange(m) == j).astype(dt)


def gmres(A, b, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
          restart: int = 20, maxiter: int = None, M=None):
  """Restarted GMRES(m) for general ``A`` — ENTIRELY in one compiled
  ``while_loop``, restarts included.

  Per iteration: one-hot basis-row selection, one matvec, full
  (classical, twice) Gram–Schmidt against the ``(m+1, n)`` basis block,
  rank-1 one-hot updates of ``V``/``H``, and the small ``(m+1, m)``
  least-squares solve (a fused ``jnp.linalg.lstsq`` map — microseconds
  at m≲64).  The residual norm is the Krylov-space estimate
  ``|β e₁ − H y|`` (exact in exact arithmetic), so restarts need NO
  extra matvec: the restart residual is ``qᵀV`` with
  ``q = β e₁ − H y``.  Left-preconditioned when ``M`` is given (tol
  applies to the preconditioned residual, as in scipy).  Returns
  ``(x, info)`` like :func:`cg`; the final residual check is a true
  ``b − A x`` recomputation.  ``maxiter`` counts RESTART CYCLES, as in
  scipy (the while_loop budget is ``maxiter·restart`` inner steps)."""
  op, b, x0e, dt = _setup(A, b, x0)
  psolve = _psolve(M)
  mv = lambda v: psolve(op.matvec(v))  # noqa: E731
  be = sp.Val(psolve(b).evaluate())
  tol, bnorm = _tol_of(be, rtol, atol)
  if bnorm == 0.0:
    return sp.zeros((op.shape[1],), dtype=dt).evaluate(), 0
  n = op.shape[1]
  m = max(1, min(int(restart), n))
  max_inner = (int(maxiter) * m) if maxiter else 10 * n

  r0 = sp.Val((be - mv(x0e)).evaluate())
  beta0_0 = sp.sqrt(_hi_dot(r0, r0))
  V0 = sp.outer(_onehot(0, m + 1, dt),
                r0 / sp.maximum(beta0_0, _TINY)).astype(dt)
  H0 = sp.zeros((m + 1, m), dtype=dt)
  e1 = _onehot(0, m + 1, dt)

  def _step(x, V, H, vj, beta0, j, k, rnorm):
    w = mv(vj)
    h = _hi_dot(V, w)           # rows past j are zero -> entries 0
    w = w - _hi_dot(h, V)
    h2 = _hi_dot(V, w)          # second Gram-Schmidt pass
    w = w - _hi_dot(h2, V)
    h = h + h2
    beta = sp.sqrt(_hi_dot(w, w))
    vnext = w / sp.maximum(beta, _TINY)
    V2 = V + sp.outer(_onehot(j + 1, m + 1, dt), vnext)
    hcol = h + beta * _onehot(j + 1, m + 1, dt)
    H2 = H + sp.outer(hcol, _onehot(j, m, dt))
    # the small LS solve + Krylov residual estimate, every step
    y = sp.map([H2, beta0 * e1], _lstsq_kernel)         # (m,)
    q = beta0 * e1 - _hi_dot(H2, y)
    rn = sp.sqrt(_hi_dot(q, q))
    x_new = x + _hi_dot(y, V2[:m])
    return V2, H2, x_new, q, rn, vnext, _i32(j + 1)

  def cond(x, xc, V, H, vj, beta0, j, k, rnorm):
    return (rnorm > tol) & (k < max_inner)

  def body(x, xc, V, H, vj, beta0, j, k, rnorm):
    V2, H2, x_new, q, rn, vnext, j2 = _step(x, V, H, vj, beta0, j, k,
                                            rnorm)
    end = j2 == m
    # at a cycle boundary: restart from the Krylov-form residual q.V
    r_new = _hi_dot(q, V2)
    rn_new = sp.maximum(rn, _TINY)
    V_rst = sp.outer(e1, r_new / rn_new).astype(dt)
    x3 = sp.where(end, x_new, x)        # x only advances at cycle end /
    xc2 = x_new                         # xc tracks the running correction
    V3 = sp.where(end, V_rst, V2)
    H3 = sp.where(end, H0, H2)
    vj3 = sp.where(end, r_new / rn_new, vnext)
    beta0_3 = sp.where(end, rn, beta0)
    j3 = _i32(sp.where(end, 0, j2))
    return x3, xc2, V3, H3, vj3, beta0_3, j3, _i32(k + 1), rn

  vj0 = sp.Val((r0 / sp.maximum(beta0_0, _TINY)).astype(dt).evaluate())
  x, xc, V, H, vj, beta0, j, k, rnorm = sp.while_loop(
      cond, body,
      (x0e, x0e, V0, H0, vj0, beta0_0, _i32(0), _i32(0), beta0_0),
      max_iters=max_inner)
  # mid-cycle exit: xc holds the freshest correction
  x_fin = xc if int(np.asarray(j.glom())) > 0 else x
  r = be - mv(sp.Val(x_fin))
  rnorm_t = float(np.sqrt(float(sp.dot(r, r, precision="highest").glom())))
  cycles = -(-int(np.asarray(k.glom())) // m)
  return x_fin, (0 if rnorm_t <= tol * (1 + 1e-6) else cycles)


def lsqr(A, b, damp: float = 0.0, *, atol: float = 1e-8,
         iter_lim: int = None):
  """Regularized least squares ``min |Ax − b|² + damp²|x|²`` via CGLS
  (the normal-equation CG, algebraically equivalent to LSQR), one fused
  ``while_loop``.  Stops when ``|Aᵀr − damp²x| <= atol · |Aᵀb|``.
  Returns ``(x, istop, itn, r1norm)`` — the head of scipy's 10-tuple
  (istop 1 = converged, 7 = iteration limit)."""
  op = aslinearoperator(A)
  if op._rmatvec is None:
    raise ValueError("lsqr needs rmatvec (dense/sparse operators provide "
                     "it automatically)")
  b = sp.lazify(b)
  dt = np.dtype(b.evaluate().dtype)
  if dt.kind != "f":
    dt = _default_float()
    b = b.astype(dt)
  n = op.shape[1]
  iter_lim = int(iter_lim) if iter_lim else 2 * n
  damp2 = float(damp) ** 2

  s0 = op.rmatvec(b)
  g0 = _hi_dot(s0, s0)
  gtol = float(atol) ** 2 * float(g0.glom())

  def cond(x, r, s, p, g, k):
    return (g > gtol) & (k < iter_lim)

  def body(x, r, s, p, g, k):
    q = op.matvec(p)
    den = _hi_dot(q, q) + damp2 * _hi_dot(p, p)
    alpha = g / sp.where(sp.abs(den) > _TINY, den, 1.0)
    x2 = x + alpha * p
    r2 = r - alpha * q
    s2 = op.rmatvec(r2) - damp2 * x2
    g2 = _hi_dot(s2, s2)
    beta = g2 / sp.where(sp.abs(g) > _TINY, g, 1.0)
    return x2, r2, s2, s2 + beta * p, g2, _i32(k + 1)

  x, r, s, p, g, k = sp.while_loop(
      cond, body,
      (sp.zeros((n,), dtype=dt), b, s0, s0, g0, _i32(0)),
      max_iters=iter_lim)
  itn = int(np.asarray(k.glom()))
  gf = float(g.glom())
  r1norm = float(np.sqrt(float(sp.dot(r, r, precision="highest").glom())))
  return x, (1 if gf <= gtol * (1 + 1e-6) else 7), itn, r1norm


def _arnoldi_body(matvec, m: int, dt):
  """One Arnoldi step over the (m+1, n) basis block at carried position
  j: one-hot row selection, one matvec, doubled classical Gram-Schmidt
  against the WHOLE block (unfilled rows are zero, so they project to
  nothing), rank-1 one-hot updates of V and the projected matrix H."""
  def body(V, H, vj, j):
    w = matvec(vj)
    h = _hi_dot(V, w)
    w = w - _hi_dot(h, V)
    h2 = _hi_dot(V, w)
    w = w - _hi_dot(h2, V)
    h = h + h2
    beta = sp.sqrt(_hi_dot(w, w))
    vnext = sp.where(beta > 1e-12, w / sp.maximum(beta, _TINY), 0.0)
    V2 = V + sp.outer(_onehot(j + 1, m + 1, dt), vnext)
    H2 = H + sp.outer(h + beta * _onehot(j + 1, m + 1, dt),
                      _onehot(j, m, dt))
    return V2, H2, vnext, _i32(j + 1)
  return body


def _arnoldi_cycle(matvec, V0, H0, j0: int, m: int, dt):
  """Fused fori from position j0 to m.  The current basis vector rides
  the carry (selected from V0 ONCE here, not per step — saves a full
  (m+1, n) block read every iteration).  Returns (V, H)."""
  vj0 = _hi_dot(_onehot(j0, m + 1, dt), sp.lazify(V0))
  V, H, _, _ = sp.fori_loop(m - j0, _arnoldi_body(matvec, m, dt),
                            (V0, H0, vj0, _i32(j0)))
  return V, H


def _arnoldi_cycle_eager(matvec, V0, H0, j0: int, m: int, dt):
  """Driver-paced Arnoldi cycle — same math as :func:`_arnoldi_cycle`
  via the same ``_arnoldi_body``, one Python step per position.  Used
  when the matvec is itself a fused solver call (inexact shift-invert:
  minres/gmres inner solves), which cannot be traced INTO a fori body
  — each inner solve is one compiled dispatch through the loop-runner
  cache instead."""
  V = sp.lazify(V0)
  H = sp.lazify(H0)
  vj = sp.Val(_hi_dot(_onehot(j0, m + 1, dt), V).evaluate())
  body = _arnoldi_body(matvec, m, dt)
  j = int(j0)
  for _ in range(m - j0):
    V, H, vj, j = body(V, H, vj, j)
    V = sp.Val(sp.lazify(V).evaluate())
    H = sp.Val(sp.lazify(H).evaluate())
    vj = sp.Val(sp.lazify(vj).evaluate())
    j = int(j)
  return V, H


FLAGS.add(BoolFlag(
    "eigsh_fused_restart", True,
    "run eigsh's ENTIRE thick-restart loop (Arnoldi cycles, in-loop "
    "jnp.linalg.eigh Ritz solves, basis compression) as ONE compiled "
    "dispatch; off = driver-paced restarts with numpy Ritz solves "
    "between per-cycle dispatches (kept as the fallback if the "
    "in-loop eigh misbehaves on a backend)"))


def _eigsh_fused_solve(matvec, v0n, m: int, k: int, l: int, which: str,
                       dt, maxiter: int, tol_eff: float):
  """The WHOLE thick-restart Lanczos solve as one compiled program
  (VERDICT r4 weak #6: the driver-side numpy Ritz solve between restart
  cycles cost a ~30 ms tunnel round trip per cycle).

  Structure: the Arnoldi STEP is the framework-traced ``_arnoldi_body``
  (so expr-level matvecs — dense, SpMV kernels, lu_solve shift-invert —
  lower exactly as in :func:`_arnoldi_cycle`); around it,
  ``lax.fori_loop`` runs one cycle and ``lax.while_loop`` runs the
  restart recurrence, with the small (m×m) Ritz eigenproblem solved by
  ``jnp.linalg.eigh`` IN-LOOP and the TRLan compression applied as one
  (m+1, m+1)·(m+1, n) contraction ONCE PER CYCLE (a flattened
  every-step form would pay that contraction per Arnoldi step — ~5× the
  Gram–Schmidt flops for sparse operators).  Runners are cached by the
  loop-runner invariant (structural signature + flag fingerprints +
  mesh + the static m/k/l/which/maxiter/tol closures).

  Returns ``(V SpartanArray (m+1, n), H numpy (m+1, m), cycles, res_rel)``
  — the final selection/assembly stays host-side (one small fetch), so
  breakdown handling is byte-identical to the driver path."""
  import jax
  import jax.numpy as jnp
  from jax import lax
  from spartan_tpu.core.array import SpartanArray
  from spartan_tpu.expr.loop import (SymbolicVal, _cache_runner,
                                     _collect_carry_consts,
                                     _compile_carry_body,
                                     _has_cached_interior, _runner_cache,
                                     _runner_key)
  which = which.upper()
  V0 = sp.outer(_onehot(0, m + 1, dt), v0n)
  init_arrs = [sp.lazify(V0).evaluate(),
               sp.lazify(sp.zeros((m + 1, m), dtype=dt)).evaluate(),
               sp.lazify(v0n).evaluate(),
               sp.lazify(np.int32(0)).evaluate()]
  syms = [SymbolicVal(jax.ShapeDtypeStruct(a.shape, a.dtype))
          for a in init_arrs]
  body_exprs = [sp.lazify(o) for o in _arnoldi_body(matvec, m, dt)(*syms)]
  key = None if _has_cached_interior(body_exprs) else _runner_key(
      "eigsh_tr", body_exprs, init_arrs,
      extra=(m, k, l, which, int(maxiter), float(tol_eff)))
  run = _runner_cache.get(key) if key is not None else None
  if run is None:
    step, const_leaves = _compile_carry_body(body_exprs, syms)
    hi = jax.lax.Precision.HIGHEST

    def _ritz(Hh):
      # the host path's breakdown guard, selection, residual and TRLan
      # compression (eigsh lines below), in-program on the small matrix
      Hm = (Hh[:m, :m] + Hh[:m, :m].T) * np.asarray(0.5, dt)
      scale0 = jnp.maximum(jnp.abs(Hh).max(), 1.0)
      alive = jnp.cumsum(jnp.abs(Hh).max(axis=0) < 1e-12 * scale0) == 0
      alive = jnp.where(alive.sum() >= k, alive, True)          # (m,)
      w, Y = jnp.linalg.eigh(
          jnp.where(alive[:, None] & alive[None, :], Hm, 0))
      # spurious pairs (dead-block zeros) live on dead coordinates
      genuine = ((Y * Y) * alive[:, None].astype(Y.dtype)).sum(0) > 0.5
      genuine = jnp.where(genuine.sum() >= k, genuine, True)
      keyv = {"LM": jnp.abs(w), "SM": -jnp.abs(w),
              "LA": w, "SA": -w}[which]
      order = jnp.argsort(jnp.where(genuine, -keyv, jnp.inf))
      beta_last = jnp.where(alive.all(), Hh[m, m - 1], 0.0)
      res = jnp.abs(beta_last * Y[m - 1, order[:k]]).max()
      wsc = jnp.maximum(jnp.abs(jnp.where(genuine, w, 0)).max(), 1e-30)
      keep = order[:l]
      P = jnp.zeros((m + 1, m + 1), dt).at[:l, :m].set(
          Y[:, keep].T.astype(dt)).at[l, m].set(1)
      Hn = jnp.zeros((m + 1, m), dt).at[
          jnp.arange(l), jnp.arange(l)].set(w[keep].astype(dt)).at[
          l, :l].set((beta_last * Y[m - 1, keep]).astype(dt))
      return (res / wsc).astype(dt), Hn, P

    @jax.jit
    def run(init_vals, const_vals):
      def cyc(carry, j_lo):
        return lax.fori_loop(j_lo, m, lambda i, c: step(c, const_vals),
                             carry)

      first = cyc(init_vals, 0)
      res0, Hn0, P0 = _ritz(first[1])

      def cond_fn(st):
        return (st[1] > tol_eff) & (st[0] < maxiter)

      def body_fn(st):
        cycles, _, V, H, Hn, P = st
        Vn = jnp.dot(P, V, precision=hi)
        c2 = cyc((Vn, Hn, Vn[l], jnp.int32(l)), l)
        res2, Hn2, P2 = _ritz(c2[1])
        return (cycles + 1, res2, c2[0], c2[1], Hn2, P2)

      fin = lax.while_loop(
          cond_fn, body_fn,
          (jnp.int32(1), res0, first[0], first[1], Hn0, P0))
      return fin[2], fin[3], fin[0], fin[1]

    _cache_runner(key, run)
  else:
    _, const_leaves = _collect_carry_consts(body_exprs, syms)
  const_vals = tuple(c.leaf_value() for c in const_leaves)
  Vf, Hf, cycles, res = run(tuple(a.data for a in init_arrs), const_vals)
  import jax as _jax
  return (SpartanArray(Vf), np.asarray(_jax.device_get(Hf)),
          int(cycles), float(res))


_DENSE_SI_MAX = 4096  # densified-LU shift-invert size bound (n² memory)


def _shift_invert_op(A, sigma: float, OPinv, mode: str, sym: bool, dt,
                     n: int):
  """(A − σI)⁻¹ as a matvec — ARPACK mode-3 operator.

  Returns ``(matvec, fused)``:

  * ``OPinv`` given → the user's operator, traced into the fused cycle.
  * dense path (materializable A, or ``mode='dense'``): one on-device
    ``lu_factor`` of the shifted matrix, matvec = lazy ``lu_solve`` —
    stays inside the fused Arnoldi ``fori_loop`` (the exact-solve
    regime, like scipy's splu default).
  * iterative path (LinearOperator / big sparse, or
    ``mode='iterative'``): each matvec is one fused :func:`minres`
    (symmetric) / :func:`gmres` (general) solve on the shifted
    operator — inexact shift-invert; the Arnoldi cycle runs
    driver-paced (``fused=False``)."""
  if OPinv is not None:
    return aslinearoperator(OPinv).matvec, True
  if mode in ("auto", "normal"):
    mode = "auto"
  if mode not in ("auto", "dense", "iterative"):
    raise ValueError(f"mode must be auto/dense/iterative, got {mode!r}")
  from spartan_tpu.backend import sparse as sps
  is_sparse = isinstance(A, (sps.SparseArray, sps.BlockSparseArray))
  is_lo = isinstance(A, LinearOperator)
  dense_ok = (not is_lo) and (not is_sparse or n <= _DENSE_SI_MAX)
  if mode == "dense" and not dense_ok:
    raise ValueError("mode='dense' needs a materializable operator "
                     f"(got {type(A).__name__}, n={n})")
  if mode == "dense" or (mode == "auto" and dense_ok):
    from spartan_tpu import scipy_linalg as sla
    Ad = np.asarray(A.todense()) if is_sparse else np.asarray(
        sp.lazify(A).glom())
    As = Ad.astype(dt) - np.asarray(sigma, dtype=dt) * np.eye(n, dtype=dt)
    lu_, piv = sla.lu_factor(sp.lazify(As))
    lu_v = sp.Val(sp.lazify(lu_).evaluate())
    piv_v = sp.Val(sp.lazify(piv).evaluate())
    return (lambda x: sla.lu_solve((lu_v, piv_v), x)), True
  op = aslinearoperator(A)
  sig = np.asarray(sigma, dtype=dt)
  shifted = LinearOperator(
      op.shape, lambda x: op.matvec(x) - sig * sp.lazify(x), dtype=dt)
  inner_rtol = 1e-11 if np.dtype(dt) == np.float64 else 1e-6
  solver = minres if sym else gmres

  def mv(x):
    y, info = solver(shifted, x, rtol=inner_rtol)
    if info != 0:
      from spartan_tpu.util import log_warn
      log_warn("shift-invert inner solve did not fully converge "
               "(info=%s) — eigenpair accuracy is bounded by the inner "
               "residual; raise its budget or use mode='dense'", info)
    return y

  return mv, False


def _ritz_host(Hh: np.ndarray, m: int, k: int, which: str):
  """Host-side Ritz solve on a fetched (m+1, m) projected matrix: the
  exact-breakdown guard (a zero column means an invariant subspace),
  symmetrized dense eigenproblem, which-selection, and the Ritz residual
  bound.  Shared by the fused one-dispatch path (final selection) and
  the driver-paced restart loop (per cycle)."""
  dead = np.nonzero(np.abs(Hh).max(axis=0)
                    < 1e-12 * max(np.abs(Hh).max(), 1.0))[0]
  m_eff = int(dead[0]) if dead.size else m
  if m_eff < k:
    m_eff = m
  Hm = (Hh[:m_eff, :m_eff] + Hh[:m_eff, :m_eff].T) / 2
  beta_last = float(Hh[m_eff, m_eff - 1]) if m_eff == m else 0.0
  w_all, Y = np.linalg.eigh(Hm)
  idx = _pick(w_all, min(k, m_eff), which)
  scale = max(float(np.abs(w_all).max()), 1e-30)
  res = np.abs(beta_last * Y[m_eff - 1, idx])
  return w_all, Y, idx, m_eff, beta_last, res, scale


def _pick(vals: np.ndarray, k: int, which: str) -> np.ndarray:
  order = {
      "LM": np.argsort(np.abs(vals))[-k:],
      "SM": np.argsort(np.abs(vals))[:k],
      "LA": np.argsort(vals.real)[-k:],
      "SA": np.argsort(vals.real)[:k],
  }.get(which.upper())
  if order is None:
    raise ValueError(f"which={which!r} not in LM/SM/LA/SA")
  return order[np.argsort(vals[order].real)]  # ascending, scipy order


def eigsh(A, k: int = 6, *, which: str = "LM", ncv: int = None, v0=None,
          maxiter: int = None, tol: float = 0.0, sigma=None, OPinv=None,
          mode: str = "auto"):
  """k eigenpairs of symmetric ``A`` by THICK-RESTART Lanczos: fused
  ``ncv``-step Arnoldi cycles (doubled full reorthogonalization — every
  step is MXU work over the ``(ncv+1, n)`` basis block) with TRLan
  restarts — keep the ``k``+buffer best Ritz vectors plus the residual
  direction, re-enter the SAME fused cycle at position l (the kept
  Ritz/residual coupling lands in H via the full projections, so no
  special-cased arrowhead algebra).  The WHOLE restarted solve runs as
  ONE compiled dispatch by default: the ``ncv×ncv`` Ritz eigenproblems
  are in-loop ``jnp.linalg.eigh`` and the restart compression a single
  in-loop contraction (:func:`_eigsh_fused_solve`); set
  ``--eigsh_fused_restart=0`` for driver-paced cycles with numpy Ritz
  solves (the inexact shift-invert route always drives that way, as
  the reference's Lanczos example did).  Converges at scipy-default
  ``ncv`` where a single
  unrestarted cycle plateaus (measured r4: n=1024 GOE edge, ncv=40 —
  single cycle err 0.87, restarted 1e-13).  Returns ``(w (k,) numpy
  ascending, v (n, k) SpartanArray)``.  ``maxiter`` counts restart
  cycles (default 20); ``tol`` is the Ritz-residual bound relative to
  the spectral scale (0 → near machine precision for the dtype).

  SHIFT-INVERT (``sigma=σ``, ARPACK mode 3): the Lanczos recursion runs
  on ``(A − σI)⁻¹`` (see :func:`_shift_invert_op` for the dense-LU /
  inner-iterative routing) and eigenvalues map back ``λ = σ + 1/ν`` —
  with the default ``which='LM'`` this returns the k eigenvalues
  NEAREST σ (scipy semantics: ``which`` selects in the transformed
  spectrum).  Interior/smallest eigenvalues converge in a handful of
  cycles where the plain operator stalls.  ``OPinv`` (an operator
  applying ``(A − σI)⁻¹``) overrides the routing."""
  op = aslinearoperator(A)
  n = op.shape[1]
  if op.shape[0] != n:
    raise ValueError("eigsh needs a square operator")
  k = int(k)
  m = min(n, int(ncv) if ncv else max(2 * k + 1, 20))
  if not 0 < k < m:
    raise ValueError(f"need 0 < k={k} < ncv={m}")
  dt = np.dtype(op.dtype) if (op.dtype is not None
                              and np.dtype(op.dtype).kind == "f") \
      else _default_float()
  maxiter = int(maxiter) if maxiter else 20
  tol_eff = float(tol) if tol else (1e-13 if dt == np.float64 else 1e-5)
  if v0 is None:
    v0 = sp.lazify(np.random.default_rng(0).standard_normal(n)).astype(dt)
  else:
    v0 = sp.lazify(v0).astype(dt)
  if sigma is not None:
    matvec, fused = _shift_invert_op(A, float(sigma), OPinv, mode,
                                     sym=True, dt=dt, n=n)
  else:
    matvec, fused = op.matvec, True
  nrm = sp.sqrt(_hi_dot(v0, v0))
  l = min(max(k + min(k, 8), m // 2), m - 2)  # kept Ritz count per
  # restart — a buffer of next-closest pairs (~ncv/2, TRLan/ARPACK
  # practice) both speeds convergence and avoids locking onto the wrong
  # member of a near-tied cluster
  if fused and FLAGS.eigsh_fused_restart:
    # ONE compiled dispatch for the whole restarted solve (in-loop
    # Ritz eigh); a single-cycle budget when no restart is possible
    # (full Krylov space / no room for kept pairs)
    maxiter_eff = 1 if (m >= n or l < 1) else maxiter
    v0n = sp.Val(((v0 / sp.maximum(nrm, _TINY)).astype(dt)).evaluate())
    V, Hh, cycles, _ = _eigsh_fused_solve(
        matvec, v0n, m, k, l, which, dt, maxiter_eff, tol_eff)
    V = sp.Val(V)
    w_all, Y, idx, m_eff, beta_last, res, scale = _ritz_host(
        Hh, m, k, which)
    if res.max() > tol_eff * scale and m < n and m_eff == m:
      from spartan_tpu.util import log_warn
      log_warn("eigsh: Ritz residual %.2e > tol %.2e after %d restart "
               "cycles (ncv=%d) — returned pairs are NOT fully "
               "converged; raise ncv or maxiter", float(res.max()),
               tol_eff * scale, cycles, m)
  else:
    cycle_fn = _arnoldi_cycle if fused else _arnoldi_cycle_eager
    V = sp.outer(_onehot(0, m + 1, dt), v0 / sp.maximum(nrm, _TINY))
    H = sp.zeros((m + 1, m), dtype=dt)
    j0 = 0
    for cycle in range(maxiter):
      V, H = cycle_fn(matvec, V, H, j0, m, dt)
      Hh = np.asarray(sp.lazify(H).glom())
      w_all, Y, idx, m_eff, beta_last, res, scale = _ritz_host(
          Hh, m, k, which)
      converged = res.max() <= tol_eff * scale
      if (converged or m >= n or m_eff < m or l < 1
          or cycle == maxiter - 1):
        if not converged and m < n and m_eff == m:
          from spartan_tpu.util import log_warn
          log_warn("eigsh: Ritz residual %.2e > tol %.2e after %d restart "
                   "cycles (ncv=%d) — returned pairs are NOT fully "
                   "converged; raise ncv or maxiter", float(res.max()),
                   tol_eff * scale, cycle + 1, m)
        break
      keep = _pick(w_all, l, which)
      Yk = np.ascontiguousarray(Y[:, keep].T.astype(dt))        # (l, m)
      Wnew = _hi_dot(sp.lazify(Yk), sp.lazify(V)[:m])           # (l, n)
      vres = sp.lazify(V)[m:m + 1]                              # (1, n)
      Vn = sp.concatenate(
          [Wnew, vres, sp.zeros((m - l, n), dtype=dt)], axis=0)
      Hn = np.zeros((m + 1, m), dtype=dt)
      Hn[np.arange(l), np.arange(l)] = w_all[keep].astype(dt)
      Hn[l, :l] = (beta_last * Y[m - 1, keep]).astype(dt)
      V = sp.Val(Vn.evaluate())
      H = sp.lazify(Hn)
      j0 = l
  w = w_all[idx]
  if sigma is not None:
    # map back from the shift-inverted spectrum and re-sort ascending
    lam = float(sigma) + 1.0 / w
    order = np.argsort(lam)
    w = lam[order]
    idx = idx[order]
  # Ritz vectors: Yᵀ (k, m_eff) · V rows (m_eff, n) -> (k, n) -> (n, k)
  coef = np.ascontiguousarray(Y[:, idx].T.astype(dt))
  pad = np.zeros((coef.shape[0], m + 1 - m_eff), dtype=dt)
  v = sp.transpose(_hi_dot(sp.lazify(np.hstack([coef, pad])), V)).evaluate()
  return w, v


def eigs(A, k: int = 6, *, which: str = "LM", ncv: int = None, v0=None,
         maxiter: int = None, tol: float = 0.0, sigma=None, OPinv=None,
         mode: str = "auto"):
  """k eigenpairs of a general (nonsymmetric) operator by KRYLOV-SCHUR
  restarted Arnoldi: fused ``ncv``-step cycles; on restart the leading
  (which-ordered) real Schur vectors of the small Hessenberg matrix are
  kept — the basis compression is a REAL device contraction (the Schur
  form, unlike the eigenbasis, is real for real operators), then the
  SAME fused cycle re-enters at position l.  The small dense
  eigen/Schur problems are driver-side.  Returns ``(w, v)`` as COMPLEX
  numpy arrays ((k,), (n, k)) — final Ritz vectors are assembled from
  two real device contractions, so the device path stays real (the
  axon runtime has no complex buffers).  ``maxiter`` counts restart
  cycles (default 20); ``tol`` bounds the Ritz residual relative to the
  spectral scale.

  SHIFT-INVERT (``sigma=σ``, real σ): Arnoldi runs on ``(A − σI)⁻¹``
  (dense on-device LU, or fused :func:`gmres` inner solves for
  matrix-free operators — :func:`_shift_invert_op`); eigenvalues map
  back ``λ = σ + 1/ν``, so the default ``which='LM'`` returns the k
  eigenvalues nearest σ (scipy semantics)."""
  op = aslinearoperator(A)
  n = op.shape[1]
  if op.shape[0] != n:
    raise ValueError("eigs needs a square operator")
  if sigma is not None and np.iscomplexobj(sigma):
    raise ValueError("complex sigma is not supported (the device path "
                     "is real — axon has no complex buffers)")
  k = int(k)
  m = min(n, int(ncv) if ncv else max(2 * k + 1, 20))
  if not 0 < k < m:
    raise ValueError(f"need 0 < k={k} < ncv={m}")
  dt = _default_float()
  maxiter = int(maxiter) if maxiter else 20
  tol_eff = float(tol) if tol else (1e-12 if dt == np.float64 else 1e-5)
  rng = np.random.default_rng(0)
  v0e = sp.lazify(rng.standard_normal(n) if v0 is None else v0).astype(dt)
  if sigma is not None:
    matvec, fused = _shift_invert_op(A, float(sigma), OPinv, mode,
                                     sym=False, dt=dt, n=n)
  else:
    matvec, fused = op.matvec, True
  cycle_fn = _arnoldi_cycle if fused else _arnoldi_cycle_eager
  nrm = sp.sqrt(_hi_dot(v0e, v0e))
  V = sp.outer(_onehot(0, m + 1, dt), v0e / sp.maximum(nrm, _TINY))
  H = sp.zeros((m + 1, m), dtype=dt)
  j0 = 0
  l = min(max(k + min(k, 8), m // 2), m - 2)  # ~ncv/2 kept: near-tied
  # |w| clusters (the generic case for LM on real random spectra) need
  # the buffer or the restart locks onto interior members

  def _crit(wr, wi):
    if which.upper() in ("LM", "SM"):
      return np.hypot(wr, wi)
    return np.asarray(wr)

  bigger_is_better = which.upper() in ("LM", "LA")
  for cycle in range(maxiter):
    V, H = cycle_fn(matvec, V, H, j0, m, dt)
    Hh = np.asarray(sp.lazify(H).glom())
    Hm = Hh[:m, :m]
    beta_last = float(Hh[m, m - 1])
    w_all, S = np.linalg.eig(Hm)
    idx = _pick(w_all, k, which)
    scale = max(float(np.abs(w_all).max()), 1e-30)
    res = np.abs(beta_last * S[m - 1, idx])
    converged = res.max() <= tol_eff * scale
    if converged or m >= n or l < 1 or cycle == maxiter - 1:
      if not converged and m < n:
        from spartan_tpu.util import log_warn
        log_warn("eigs: Ritz residual %.2e (rel. to spectral scale) "
                 "after %d Krylov-Schur cycles (ncv=%d) — returned "
                 "pairs are NOT fully converged; raise ncv or maxiter",
                 float(res.max() / scale), cycle + 1, m)
      break
    # Krylov-Schur restart: order the real Schur form so the l
    # which-best eigenvalues lead (a cutoff predicate keeps 2x2
    # conjugate blocks together — pair members share |w| and Re w)
    from scipy.linalg import schur, LinAlgError
    crit_all = _crit(w_all.real, w_all.imag)
    order = np.sort(crit_all)[::-1] if bigger_is_better else np.sort(
        crit_all)
    cutoff = order[min(l, m) - 1]
    # reordering perturbs 2x2-block eigenvalues by ~eps(dt); a too-tight
    # cutoff makes LAPACK's post-reorder re-check fail ("Leading
    # eigenvalues do not satisfy sort condition", seen on f32) — retry
    # with widening fuzz
    base_fuzz = 1e-12 if dt == np.float64 else 1e-6
    T = Z = None
    for fuzz in (base_fuzz, base_fuzz * 1e2, base_fuzz * 1e4):
      # widen AWAY from the kept set regardless of cutoff sign (the
      # multiplicative form inverted for negative cutoffs — code-review
      # r4s2: which='LA' on a stable operator tightened every retry)
      slack = fuzz * (abs(cutoff) + 1.0)
      if bigger_is_better:
        pred = lambda wr, wi, s=slack: _crit(wr, wi) >= cutoff - s
      else:
        pred = lambda wr, wi, s=slack: _crit(wr, wi) <= cutoff + s
      try:
        T, Z, sdim = schur(Hm, output="real", sort=pred)
        break
      except LinAlgError:
        continue
    if T is None:
      from spartan_tpu.util import log_warn
      log_warn("eigs: Schur reordering unstable at this cutoff — "
               "returning the current cycle's Ritz pairs")
      break
    l_eff = int(sdim)
    if not 0 < l_eff <= m - 2:
      from spartan_tpu.util import log_warn
      log_warn("eigs: Krylov-Schur restart degenerate (kept %d of %d) "
               "— returning the current cycle's Ritz pairs", l_eff, m)
      break
    Qk = np.ascontiguousarray(Z[:, :l_eff].T.astype(dt))      # (l, m)
    Wnew = _hi_dot(sp.lazify(Qk), sp.lazify(V)[:m])           # (l, n)
    vres = sp.lazify(V)[m:m + 1]
    Vn = sp.concatenate(
        [Wnew, vres, sp.zeros((m - l_eff, n), dtype=dt)], axis=0)
    Hn = np.zeros((m + 1, m), dtype=dt)
    Hn[:l_eff, :l_eff] = T[:l_eff, :l_eff].astype(dt)
    Hn[l_eff, :l_eff] = (beta_last * Z[m - 1, :l_eff]).astype(dt)
    V = sp.Val(Vn.evaluate())
    H = sp.lazify(Hn)
    j0 = l_eff
  w = w_all[idx]
  if sigma is not None:
    w = sigma + 1.0 / w  # columns of S[:, idx] are unchanged eigenvectors
  cr = np.ascontiguousarray(S[:, idx].T.real.astype(dt))
  ci = np.ascontiguousarray(S[:, idx].T.imag.astype(dt))
  Vr = np.asarray(_hi_dot(sp.lazify(cr),
                          sp.lazify(V)[:m]).glom())  # (k, n)
  Vi = np.asarray(_hi_dot(sp.lazify(ci), sp.lazify(V)[:m]).glom())
  return w, (Vr + 1j * Vi).T


def svds(A, k: int = 6, *, ncv: int = None, which: str = "LM"):
  """Top-k (``which='LM'``) or bottom-k (``'SM'``) singular triplets via
  fused Lanczos on the Gram operator of the smaller side (``AᵀA`` or
  ``AAᵀ``).  Returns ``(u (p, k), s (k,) ascending, vt (k, q))`` —
  scipy's shapes and (ascending) order.

  ``'SM'`` runs SHIFT-INVERT Lanczos on the Gram operator at a small
  NEGATIVE shift ``σ = −δ`` (δ ∝ an estimated spectral scale): the
  eigenvalues nearest −δ are exactly the smallest ones, and ``G + δI``
  stays positive-definite, so the dense LU / inner minres never hits a
  singular shifted operator even for rank-deficient ``A``.  Zero
  singular values return an arbitrary orthonormal ``u`` basis (scipy
  likewise)."""
  from spartan_tpu.backend import sparse as sps
  op = aslinearoperator(A)
  p, q = op.shape
  if op._rmatvec is None:
    raise ValueError("svds needs rmatvec")
  small_right = q <= p
  if small_right:
    gram = LinearOperator((q, q), lambda x: op.rmatvec(op.matvec(x)),
                          dtype=op.dtype)
  else:
    gram = LinearOperator((p, p), lambda x: op.matvec(op.rmatvec(x)),
                          dtype=op.dtype)
  which = which.upper()
  if which == "LM":
    w, y = eigsh(gram, k, which="LM", ncv=ncv)
  elif which == "SM":
    if isinstance(A, LinearOperator):
      G_si, mode = gram, "iterative"
      # spectral-scale estimate: two host-driven power steps on G
      v = np.random.default_rng(0).standard_normal(gram.shape[1])
      v /= np.linalg.norm(v)
      for _ in range(2):
        gv = np.asarray(sp.lazify(gram.matvec(sp.lazify(v))).glom())
        scale = float(np.linalg.norm(gv))
        v = gv / max(scale, _TINY)
    else:
      Ad = np.asarray(A.todense()) if isinstance(
          A, (sps.SparseArray, sps.BlockSparseArray)) else np.asarray(
              sp.lazify(A).glom())
      G_si = Ad.T @ Ad if small_right else Ad @ Ad.T
      scale = float(np.abs(G_si).sum(axis=1).max())  # ≥ λmax bound
      mode = "auto"
    delta = max(1e-6 * scale, 1e-30)
    w, y = eigsh(G_si, k, which="LM", ncv=ncv, sigma=-delta, mode=mode)
  else:
    raise ValueError(f"which={which!r} not in LM/SM")
  s = np.sqrt(np.clip(w, 0.0, None))
  ye = sp.lazify(y)
  cols_small = [ye[:, i] for i in range(k)]
  # map the small-side basis through A (or Aᵀ) and normalize
  other = []
  for i in range(k):
    z = op.matvec(cols_small[i]) if small_right else op.rmatvec(
        cols_small[i])
    other.append(z / max(float(s[i]), _TINY))
  oth = sp.transpose(sp.stack([sp.lazify(o) for o in other])).evaluate()
  if small_right:
    u, vt = oth, sp.transpose(ye).evaluate()
  else:
    u, vt = y, sp.transpose(sp.lazify(oth)).evaluate()
  return u, s, vt


def expm_multiply(A, B, t: float = 1.0, *, ncv: int = None):
  """``exp(t·A) @ B`` without forming the exponential (scipy name):
  one fused ``ncv``-step Arnoldi cycle per column, then the SMALL
  ``exp(t·Hm)`` is driver-side (`scipy.linalg.expm` on an ncv×ncv
  matrix) and the result is one device contraction ``V[:m]ᵀ (e^{tH}
  β e₁)``.  Krylov approximation error decays factorially in ``ncv``
  for ``t·‖A‖`` within the subspace's reach — raise ``ncv`` (default
  ``min(n, 30)``) for large ``t·‖A‖``."""
  from scipy.linalg import expm as _small_expm
  op = aslinearoperator(A)
  n = op.shape[1]
  if op.shape[0] != n:
    raise ValueError("expm_multiply needs a square operator")
  Be = sp.lazify(B)
  if Be.ndim not in (1, 2) or Be.shape[0] != n:
    raise ValueError(f"B shape {Be.shape} incompatible with operator "
                     f"{op.shape}")
  one_d = Be.ndim == 1
  cols = [Be] if one_d else [Be[:, i] for i in range(Be.shape[1])]
  dt = _default_float()
  m = min(n, int(ncv) if ncv else 30)
  outs = []
  for c in cols:
    ce = sp.lazify(c).astype(dt)
    beta = sp.sqrt(_hi_dot(ce, ce))
    beta_f = float(beta.glom())
    if beta_f == 0.0:
      outs.append(sp.zeros((n,), dtype=dt))
      continue
    V0 = sp.outer(_onehot(0, m + 1, dt), ce / beta)
    H0 = sp.zeros((m + 1, m), dtype=dt)
    V, H = _arnoldi_cycle(op.matvec, V0, H0, 0, m, dt)
    Hh = np.asarray(sp.lazify(H).glom())
    eH = _small_expm(float(t) * Hh[:m, :m])
    y = (beta_f * eH[:, 0]).astype(dt)
    # cheap posterior estimate: the discarded next-basis coupling
    # |beta_m . e_mT e^{tH} e_1| bounds the leading truncation term
    ynorm = max(float(np.linalg.norm(y)), 1e-300)
    rel_est = abs(float(Hh[m, m - 1]) * beta_f * eH[m - 1, 0]) / ynorm
    warn_tol = 1e-10 if dt == np.float64 else 1e-5
    if m < n and rel_est > warn_tol:
      from spartan_tpu.util import log_warn
      log_warn("expm_multiply: Krylov truncation estimate %.2e at "
               "ncv=%d — raise ncv (or split t) for t*||A|| this large",
               rel_est, m)
    outs.append(_hi_dot(sp.lazify(y), sp.lazify(V)[:m]))
  if one_d:
    return outs[0].evaluate() if isinstance(outs[0], Expr) else outs[0]
  return sp.transpose(sp.stack([sp.lazify(o) for o in outs])).evaluate()


def norm(A, ord="fro"):
  """Sparse matrix norm.  ``'fro'`` is one device-side reduction over
  the stored tiles (ELL/BSR pads are zero, so they contribute nothing);
  1/inf need per-axis |A| sums (densify or use dense ``sp.linalg.norm``
  for those)."""
  from spartan_tpu.backend import sparse as sps
  if not isinstance(A, (sps.SparseArray, sps.BlockSparseArray)):
    return sp.linalg.norm(A, ord=ord)
  if ord not in ("fro", None):
    raise ValueError("sparse norm supports ord='fro' only (pads make "
                     "signed element iteration ambiguous); densify for "
                     "ord=1/inf")
  vals = A.block_vals if isinstance(A, sps.BlockSparseArray) else A.vals
  v = sp.lazify(np.asarray(vals) if not hasattr(vals, "dtype") else vals)
  return sp.sqrt(sp.sum(v * v))


def spsolve(A, b):
  """Direct sparse solve, size-gated: densifies and LU-factorizes when
  ``n <= --spsolve_dense_max`` (sparse direct LU does not map to the
  MXU; the factorization IS dense compute at these sizes), raises with
  solver guidance above it."""
  from spartan_tpu.backend import sparse as sps
  if not isinstance(A, (sps.SparseArray, sps.BlockSparseArray)):
    return sp.linalg.solve(A, b)
  n = A.shape[0]
  if n > int(FLAGS.spsolve_dense_max):
    raise ValueError(
        f"spsolve densifies (n={n} > --spsolve_dense_max="
        f"{int(FLAGS.spsolve_dense_max)}); use sparse_linalg.cg (SPD), "
        "gmres/bicgstab (general), or raise the flag")
  return sp.linalg.solve(sp.lazify(A.todense()), b)


# ---------------------------------------------------------------------
# r5 parity sweep: the remaining scipy.sparse.linalg surface.
# Five more fused-loop Krylov solvers (bicg/cgs/tfqmr/qmr/lsmr — same
# one-compiled-while_loop shape as cg/bicgstab/minres), densified
# device matrix functions (expm/inv/matrix_power/spsolve_triangular:
# XLA has no sparse LU, and at solver scale the MXU dense kernel beats
# every gather formulation — the measured spmm dense-route rationale),
# device structure probes, LaplacianNd, and host boundaries for the
# SuperLU/ARPACK-adjacent names.
# ---------------------------------------------------------------------

class ArpackError(RuntimeError):
  """ARPACK-compatible error class (scipy.sparse.linalg parity)."""

  def __init__(self, info, infodict=None):
    self.info = info
    super().__init__(f"ARPACK error {info}")


class ArpackNoConvergence(ArpackError):
  """Raised when an eigensolver fails to converge (carries partial
  results like scipy's)."""

  def __init__(self, msg, eigenvalues, eigenvectors):
    RuntimeError.__init__(self, msg)
    self.info = -1
    self.eigenvalues = eigenvalues
    self.eigenvectors = eigenvectors


class MatrixRankWarning(UserWarning):
  """scipy.sparse.linalg.MatrixRankWarning parity."""


def use_solver(**kwargs):
  """scipy toggles its UMFPACK backend here; this framework has exactly
  one solve path (XLA), so this is a documented no-op."""
  del kwargs


_host_noticed: set = set()


def _host_notice(name, why):
  if name in _host_noticed:
    return
  _host_noticed.add(name)
  from spartan_tpu.util import log_info
  log_info("sp.sparse.linalg.%s: %s — runs EAGERLY on the host "
           "(scipy.sparse.linalg), the sp.linalg.eig convention.",
           name, why)


def _to_scipy_sparse(A):
  from spartan_tpu.backend import sparse as sps
  if isinstance(A, sps.SparseArray):
    return A.to_scipy()
  import scipy.sparse as ss
  if ss.issparse(A):
    return A
  return ss.csr_matrix(np.asarray(sp.lazify(A).glom()))


def _densified_leaf(A):
  """SparseArray/dense → a dense DEVICE leaf in the operand dtype (the
  on-device ELL scatter, no host round trip)."""
  from spartan_tpu.backend import sparse as sps
  if isinstance(A, sps.SparseArray):
    import jax.numpy as jnp
    n, m = A.shape
    rows = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], A.cols.shape)
    d = jnp.zeros((n, m), A.vals.dtype).at[rows, A.cols].add(A.vals)
    return sp.Val(d)
  return sp.lazify(A)


def bicg(A, b, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
         maxiter: int = None, M=None):
  """BiConjugate Gradient (needs ``A^T`` matvecs) — one fused
  ``while_loop``; the sparse transpose repack happens once at setup.
  Returns ``(x, info)`` like :func:`cg`."""
  op, b, x0e, dt = _setup(A, b, x0)
  psolve = _psolve(M)
  rpsolve = (lambda x: x) if M is None else aslinearoperator(M).rmatvec
  tol, bnorm = _tol_of(b, rtol, atol)
  if bnorm == 0.0:
    return sp.zeros((op.shape[1],), dtype=dt).evaluate(), 0
  maxiter = int(maxiter) if maxiter else 10 * op.shape[1]
  op.rmatvec(sp.zeros((op.shape[0],), dtype=dt))  # force A.T build NOW

  r0 = sp.Val((b - op.matvec(x0e)).evaluate())

  def _safe(d):
    return sp.where(sp.abs(d) > _TINY, d, 1.0)

  def cond(x, r, rt, p, pt, rho, k):
    return (sp.sqrt(_hi_dot(r, r)) > tol) & (k < maxiter)

  def body(x, r, rt, p, pt, rho, k):
    z = psolve(r)
    zt = rpsolve(rt)
    rho2 = _hi_dot(rt, z)
    beta = rho2 / _safe(rho)
    p2 = z + beta * p
    pt2 = zt + beta * pt
    q = op.matvec(p2)
    qt = op.rmatvec(pt2)
    alpha = rho2 / _safe(_hi_dot(pt2, q))
    return (x + alpha * p2, r - alpha * q, rt - alpha * qt,
            p2, pt2, rho2, _i32(k + 1))

  zero = sp.zeros((op.shape[1],), dtype=dt)
  one = sp.lazify(np.asarray(1.0, dtype=dt))
  x, r, *_, k = sp.while_loop(
      cond, body, (x0e, r0, r0, zero, zero, one, _i32(0)),
      max_iters=maxiter)
  rnorm = float(np.sqrt(float(_hi_dot(r, r).glom())))
  return x, (0 if rnorm <= tol * (1 + 1e-6) else int(np.asarray(k.glom())))


def cgs(A, b, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
        maxiter: int = None, M=None):
  """Conjugate Gradient Squared (transpose-free) — one fused
  ``while_loop``.  Returns ``(x, info)`` like :func:`cg`."""
  op, b, x0e, dt = _setup(A, b, x0)
  psolve = _psolve(M)
  tol, bnorm = _tol_of(b, rtol, atol)
  if bnorm == 0.0:
    return sp.zeros((op.shape[1],), dtype=dt).evaluate(), 0
  maxiter = int(maxiter) if maxiter else 10 * op.shape[1]

  r0 = sp.Val((b - op.matvec(x0e)).evaluate())

  def _safe(d):
    return sp.where(sp.abs(d) > _TINY, d, 1.0)

  def cond(x, r, u, p, q, rho, k):
    return (sp.sqrt(_hi_dot(r, r)) > tol) & (k < maxiter)

  def body(x, r, u, p, q, rho, k):
    rho2 = _hi_dot(r0, r)
    beta = rho2 / _safe(rho)
    u2 = r + beta * q
    p2 = u2 + beta * (q + beta * p)
    vhat = op.matvec(psolve(p2))
    alpha = rho2 / _safe(_hi_dot(r0, vhat))
    q2 = u2 - alpha * vhat
    uhat = psolve(u2 + q2)
    x2 = x + alpha * uhat
    r2 = r - alpha * op.matvec(uhat)
    return x2, r2, u2, p2, q2, rho2, _i32(k + 1)

  zero = sp.zeros((op.shape[1],), dtype=dt)
  one = sp.lazify(np.asarray(1.0, dtype=dt))
  x, r, *_, k = sp.while_loop(
      cond, body, (x0e, r0, zero, zero, zero, one, _i32(0)),
      max_iters=maxiter)
  rnorm = float(np.sqrt(float(_hi_dot(r, r).glom())))
  return x, (0 if rnorm <= tol * (1 + 1e-6) else int(np.asarray(k.glom())))


def tfqmr(A, b, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
          maxiter: int = None, M=None, callback=None, show=False):
  """Transpose-Free QMR — HALF-steps of Freund's algorithm as one
  fused ``while_loop`` body with parity selects (the even-step alpha
  is computed once and carried through the odd step), exactly one
  preconditioned matvec per half-step like scipy's.  Returns
  ``(x, info)``."""
  del callback, show
  op, b, x0e, dt = _setup(A, b, x0)
  psolve = _psolve(M)
  maxiter = int(maxiter) if maxiter else min(10000, 10 * op.shape[0])

  r0 = sp.Val((b - op.matvec(x0e)).evaluate())
  rho0 = float(_hi_dot(r0, r0).glom())
  r0norm = float(np.sqrt(rho0))
  if r0norm == 0.0:
    return x0e.evaluate(), 0
  tol = max(float(atol), float(rtol) * r0norm)

  def _safe(d):
    return sp.where(sp.abs(d) > _TINY, d, 1.0)

  def mav(v):
    return psolve(op.matvec(v))

  v0 = sp.Val(mav(r0).evaluate())

  def cond(x, w, u, v, uhat, d, theta, eta, rho, rhoL, alpha, tau, k):
    return (tau * sp.sqrt(sp.maximum(k.astype(dt), 1.0)) > tol) \
        & (k < maxiter)

  def body(x, w, u, v, uhat, d, theta, eta, rho, rhoL, alpha, tau, k):
    even = (k % 2) == 0
    alpha2 = sp.where(even, rho / _safe(_hi_dot(r0, v)), alpha)
    w2 = w - alpha2 * uhat
    d2 = u + ((theta * theta) / _safe(alpha2)) * eta * d
    theta2 = sp.sqrt(_hi_dot(w2, w2)) / _safe(tau)
    c2 = 1.0 / sp.sqrt(1.0 + theta2 * theta2)
    tau2 = tau * theta2 * c2
    eta2 = c2 * c2 * alpha2
    x2 = x + eta2 * psolve(d2)
    # even: advance u along v; odd: new rho/beta and search directions
    uN = u - alpha2 * v
    rho_o = _hi_dot(r0, w2)
    beta = rho_o / _safe(rhoL)
    u_o = w2 + beta * u
    u2 = sp.where(even, uN, u_o)
    uhat2 = mav(u2)
    v2 = sp.where(even, v, beta * uhat + (beta * beta) * v + uhat2)
    rho2 = sp.where(even, rho, rho_o)
    rhoL2 = sp.where(even, rho, rhoL)
    return (x2, w2, u2, v2, uhat2, d2, theta2, eta2, rho2, rhoL2,
            alpha2, tau2, _i32(k + 1))

  zero_v = sp.zeros((op.shape[1],), dtype=dt)
  zs = sp.lazify(np.asarray(0.0, dtype=dt))
  rho_e = sp.lazify(np.asarray(rho0, dtype=dt))
  tau_e = sp.lazify(np.asarray(r0norm, dtype=dt))
  out = sp.while_loop(
      cond, body,
      (x0e, r0, r0, v0, v0, zero_v, zs, zs, rho_e, rho_e, zs, tau_e,
       _i32(0)),
      max_iters=maxiter)
  x, k = out[0], out[-1]
  r = b - op.matvec(sp.Val(sp.lazify(x).evaluate()))
  rnorm = float(np.sqrt(float(_hi_dot(r, r).glom())))
  return x, (0 if rnorm <= tol * (1 + 1e-6) else int(np.asarray(k.glom())))


def qmr(A, b, x0=None, *, rtol: float = 1e-5, atol: float = 0.0,
        maxiter: int = None, M1=None, M2=None, callback=None):
  """Quasi-Minimal Residual (coupled two-term Lanczos, needs ``A^T``)
  — one fused ``while_loop`` (Freund–Nachtigal recurrences, the scipy
  formulation).  Preconditioners M1/M2 are not supported (scipy's
  split-preconditioned QMR needs four extra solves per step); pass
  them to :func:`gmres`/:func:`bicgstab` instead."""
  del callback
  if M1 is not None or M2 is not None:
    raise NotImplementedError("qmr: M1/M2 preconditioning is not "
                              "supported — use gmres/bicgstab")
  op, b, x0e, dt = _setup(A, b, x0)
  tol, bnorm = _tol_of(b, rtol, atol)
  if bnorm == 0.0:
    return sp.zeros((op.shape[1],), dtype=dt).evaluate(), 0
  maxiter = int(maxiter) if maxiter else 10 * op.shape[1]
  op.rmatvec(sp.zeros((op.shape[0],), dtype=dt))  # force A.T build NOW

  r0 = sp.Val((b - op.matvec(x0e)).evaluate())
  rho0 = sp.sqrt(_hi_dot(r0, r0))
  breakdown = float(np.finfo(dt).eps)

  def _safe(d):
    return sp.where(sp.abs(d) > _TINY, d, 1.0)

  def cond(x, r, vt, wt, rho, xi, gamma, eta, theta, eps, p, q, d, s, k):
    ok = (sp.abs(rho) > breakdown) & (sp.abs(xi) > breakdown) \
        & (sp.abs(gamma) > breakdown)
    return (sp.sqrt(_hi_dot(r, r)) > tol) & (k < maxiter) & ok

  def body(x, r, vt, wt, rho, xi, gamma, eta, theta, eps, p, q, d, s, k):
    v = vt / _safe(rho)
    w = wt / _safe(xi)
    delta = _hi_dot(w, v)          # z==w, y==v (no preconditioning)
    p2 = v - (xi * delta / _safe(eps)) * p
    q2 = w - (rho * delta / _safe(eps)) * q
    pt = op.matvec(p2)
    eps2 = _hi_dot(q2, pt)
    beta = eps2 / _safe(delta)
    vt2 = pt - beta * v
    rho2 = sp.sqrt(_hi_dot(vt2, vt2))
    wt2 = op.rmatvec(q2) - beta * w
    xi2 = sp.sqrt(_hi_dot(wt2, wt2))
    theta2 = rho2 / _safe(gamma * sp.abs(beta))
    gamma2 = 1.0 / sp.sqrt(1.0 + theta2 * theta2)
    eta2 = -eta * rho * gamma2 * gamma2 / _safe(beta * gamma * gamma)
    tg2 = (theta * gamma2) * (theta * gamma2)
    d2 = eta2 * p2 + tg2 * d
    s2 = eta2 * pt + tg2 * s
    return (x + d2, r - s2, vt2, wt2, rho2, xi2, gamma2, eta2, theta2,
            eps2, p2, q2, d2, s2, _i32(k + 1))

  zero_v = sp.zeros((op.shape[1],), dtype=dt)
  one = sp.lazify(np.asarray(1.0, dtype=dt))
  init = (x0e, r0, r0, r0, rho0, rho0, one, -one,
          sp.lazify(np.asarray(0.0, dtype=dt)), one,
          zero_v, zero_v, zero_v, zero_v, _i32(0))
  out = sp.while_loop(cond, body, init, max_iters=maxiter)
  x, k = out[0], out[-1]
  r = b - op.matvec(sp.Val(sp.lazify(x).evaluate()))
  rnorm = float(np.sqrt(float(_hi_dot(r, r).glom())))
  return x, (0 if rnorm <= tol * (1 + 1e-6) else int(np.asarray(k.glom())))


def _sym_ortho_e(a, b):
  """Stable Givens (expr scalars): c, s, r with r = hypot(a, b)."""
  r = sp.sqrt(a * a + b * b)
  rs = sp.where(sp.abs(r) > _TINY, r, 1.0)
  return a / rs, b / rs, r


def lsmr(A, b, damp: float = 0.0, atol: float = 1e-6, btol: float = 1e-6,
         conlim: float = 1e8, maxiter: int = None, show: bool = False,
         x0=None):
  """LSMR (Fong–Saunders): Golub–Kahan bidiagonalization + MINRES-style
  double rotations, min ``|A'(Ax-b)|`` — one fused ``while_loop``
  (two matvecs and ~20 scalar rotations per step; the |r|/|A'r|/|A|
  estimates ride the same carry so stopping is collective-free).
  Returns scipy's 8-tuple ``(x, istop, itn, normr, normar, normA,
  condA, normx)``."""
  del show
  op = aslinearoperator(A)
  be = sp.lazify(b)
  m, n = op.shape
  dt = np.dtype(be.evaluate().dtype)
  if dt.kind != "f":
    dt = _default_float()
    be = be.astype(dt)
  maxiter = int(maxiter) if maxiter else min(m, n)
  x0e = sp.zeros((n,), dtype=dt) if x0 is None else sp.lazify(x0).astype(dt)
  u0 = be if x0 is None else be - op.matvec(x0e)
  beta0 = float(sp.sqrt(_hi_dot(u0, u0)).glom())
  normb = float(sp.sqrt(_hi_dot(be, be)).glom())
  if normb == 0.0:
    return (sp.zeros((n,), dtype=dt).evaluate(), 0, 0, 0.0, 0.0, 0.0,
            1.0, 0.0)
  damp = float(damp)
  ctol = 1.0 / float(conlim) if conlim > 0 else 0.0

  u_init = sp.Val((u0 / max(beta0, np.finfo(dt).tiny)).evaluate())
  v0 = op.rmatvec(u_init)
  alpha0 = float(sp.sqrt(_hi_dot(v0, v0)).glom())
  v_init = sp.Val((v0 / max(alpha0, np.finfo(dt).tiny)).evaluate())

  def _safe(d):
    return sp.where(sp.abs(d) > _TINY, d, 1.0)

  # carry: x u v h hbar  alpha alphabar zeta zetabar rho rhobar cbar
  # sbar  betadd betad rhodold tautildeold thetatilde zeta_est dsq
  # normA2 maxrbar minrbar  k
  def cond(*st):
    (x, u, v, h, hbar, alpha, alphabar, zeta, zetabar, rho, rhobar,
     cbar, sbar, betadd, betad, rhodold, tautildeold, thetatilde,
     dsq, normA2, maxrbar, minrbar, normr, normar, k) = st
    normA = sp.sqrt(normA2)
    normx = sp.sqrt(_hi_dot(x, x))
    # scipy stopping: istop 1/2/3 conditions
    t1 = normr - (btol * normb + atol * normA * normx)
    t2 = normar - atol * normA * normr
    condA = maxrbar / _safe(minrbar)
    t3 = (1.0 / _safe(condA)) - ctol
    return (t1 > 0) & (t2 > 0) & (t3 > 0) & (k < maxiter)

  def body(*st):
    (x, u, v, h, hbar, alpha, alphabar, zeta, zetabar, rho, rhobar,
     cbar, sbar, betadd, betad, rhodold, tautildeold, thetatilde,
     dsq, normA2, maxrbar, minrbar, normr, normar, k) = st
    u2 = op.matvec(v) - alpha * u
    beta = sp.sqrt(_hi_dot(u2, u2))
    u2 = u2 / _safe(beta)
    v2 = op.rmatvec(u2) - beta * v
    alpha2 = sp.sqrt(_hi_dot(v2, v2))
    v2 = v2 / _safe(alpha2)
    chat, shat, alphahat = _sym_ortho_e(alphabar,
                                        sp.lazify(np.asarray(damp, dt)))
    rhoold = rho
    c, s, rho2 = _sym_ortho_e(alphahat, beta)
    thetanew = s * alpha2
    alphabar2 = c * alpha2
    rhobarold = rhobar
    zetaold = zeta
    thetabar = sbar * rho2
    cbar2, sbar2, rhobar2 = _sym_ortho_e(cbar * rho2, thetanew)
    zeta2 = cbar2 * zetabar
    zetabar2 = -sbar2 * zetabar
    hbar2 = h - (thetabar * rho2 / _safe(rhoold * rhobarold)) * hbar
    x2 = x + (zeta2 / _safe(rho2 * rhobar2)) * hbar2
    h2 = v2 - (thetanew / _safe(rho2)) * h
    # |r| estimate (Fong–Saunders §5)
    betaacute = chat * betadd
    betacheck = -shat * betadd
    betahat = c * betaacute
    betadd2 = -s * betaacute
    thetatildeold = thetatilde
    ctO, stO, rhotildeold = _sym_ortho_e(rhodold, thetabar)
    thetatilde2 = stO * rhobar2
    rhodold2 = ctO * rhobar2
    betad2 = -stO * betad + ctO * betahat
    tautildeold2 = (zetaold - thetatildeold * tautildeold) \
        / _safe(rhotildeold)
    taud = (zeta2 - thetatilde2 * tautildeold2) / _safe(rhodold2)
    dsq2 = dsq + betacheck * betacheck
    normr2 = sp.sqrt(dsq2 + (betad2 - taud) ** 2 + betadd2 * betadd2)
    normA22 = normA2 + beta * beta + alpha2 * alpha2
    maxrbar2 = sp.maximum(maxrbar, rhobarold)
    minrbar2 = sp.where(k > 0, sp.minimum(minrbar, rhobarold), minrbar)
    normar2 = sp.abs(zetabar2)
    return (x2, u2, v2, h2, hbar2, alpha2, alphabar2, zeta2, zetabar2,
            rho2, rhobar2, cbar2, sbar2, betadd2, betad2, rhodold2,
            tautildeold2, thetatilde2, dsq2, normA22, maxrbar2,
            minrbar2, normr2, normar2, _i32(k + 1))

  a0 = sp.lazify(np.asarray(alpha0, dt))
  b0 = sp.lazify(np.asarray(beta0, dt))
  zs = sp.lazify(np.asarray(0.0, dt))
  one = sp.lazify(np.asarray(1.0, dt))
  init = (x0e, u_init, v_init, v_init, sp.zeros((n,), dtype=dt),
          a0, a0, zs, a0 * b0, one, one, one, zs,
          b0, zs, one, zs, zs, zs, a0 * a0, zs,
          sp.lazify(np.asarray(np.finfo(dt).max / 4, dt)), b0,
          a0 * b0, _i32(0))
  out = sp.while_loop(cond, body, init, max_iters=maxiter)
  (x, *_rest) = out
  k = int(np.asarray(out[-1].glom()))
  normr = float(np.asarray(out[-3].glom()))
  normar = float(np.asarray(out[-2].glom()))
  normA = float(np.sqrt(float(np.asarray(out[19].glom()))))
  maxr = float(np.asarray(out[20].glom()))
  minr = float(np.asarray(out[21].glom()))
  condA = maxr / max(minr, np.finfo(dt).tiny) if k > 0 else 1.0
  normx = float(np.sqrt(float(_hi_dot(x, x).glom())))
  if normr <= btol * normb + atol * normA * normx:
    istop = 1
  elif normar <= atol * normA * max(normr, np.finfo(dt).tiny):
    istop = 2
  elif ctol and 1.0 / max(condA, 1.0) <= ctol:
    istop = 3
  else:
    istop = 7
  return x, istop, k, normr, normar, normA, condA, normx


# --- densified device matrix functions -------------------------------

def expm(A):
  """Sparse ``e^A`` — densified on device (ELL scatter, no host trip)
  then Padé scaling-and-squaring on the MXU.  XLA has no sparse LU and
  ``e^A`` is structurally dense anyway; returns a DENSE lazy expr (use
  :func:`expm_multiply` for the Krylov ``e^{tA}B`` action at scale)."""
  from spartan_tpu import scipy_linalg as _sl
  return _sl.expm(_densified_leaf(A))


def inv(A):
  """Sparse inverse — densified device ``jnp.linalg.inv`` (the inverse
  of a sparse matrix is generically dense; returns a dense lazy
  expr).  Prefer :func:`spsolve`/:func:`cg` for solves."""
  Ad = _densified_leaf(A)

  def kern(a):
    import jax.numpy as jnp
    return jnp.linalg.inv(a.astype(jnp.result_type(a.dtype,
                                                   jnp.float32)))

  return sp.map([Ad], kern)


def matrix_power(A, power: int):
  """``A**power`` — densified device binary powering on the MXU;
  returns a dense lazy expr (sparse powers fill in rapidly)."""
  power = int(power)

  def kern(a, _n=power):
    import jax.numpy as jnp
    return jnp.linalg.matrix_power(
        a.astype(jnp.result_type(a.dtype, jnp.float32)), _n)

  return sp.map([_densified_leaf(A)], kern)


def spsolve_triangular(A, b, lower: bool = True,
                       overwrite_A=False, overwrite_b=False,
                       unit_diagonal: bool = False):
  """Triangular solve — densified device ``solve_triangular``
  (XLA's blocked TRSM on the MXU; sparse level-scheduling is a
  sequential host algorithm)."""
  del overwrite_A, overwrite_b
  Ad = _densified_leaf(A)
  be = sp.lazify(b)

  def kern(a, bb, _lo=lower, _unit=unit_diagonal):
    import jax.scipy.linalg as jsl
    import jax.numpy as jnp
    dt = jnp.result_type(a.dtype, bb.dtype, jnp.float32)
    return jsl.solve_triangular(a.astype(dt), bb.astype(dt), lower=_lo,
                                unit_diagonal=_unit)

  return sp.map([Ad, be], kern)


# --- device structure probes ------------------------------------------

def _ell_offsets(A):
  """Signed col-row offsets of the stored nonzeros (device arrays)."""
  import jax.numpy as jnp
  rows = jnp.arange(A.shape[0], dtype=jnp.int32)[:, None]
  off = A.cols.astype(jnp.int32) - rows
  live = A.vals != 0
  return off, live


def is_sptriangular(A):
  """``(lower, upper)`` flags — two masked reductions over the ELL
  tiles on device (scipy walks indptr on the host)."""
  from spartan_tpu.backend import sparse as sps
  import jax.numpy as jnp
  if not isinstance(A, sps.SparseArray):
    A = sps.from_scipy(_to_scipy_sparse(A))
  off, live = _ell_offsets(A)
  above = bool(jnp.any(live & (off > 0)))
  below = bool(jnp.any(live & (off < 0)))
  return (not above, not below)


def spbandwidth(A):
  """``(below, above)`` bandwidths — masked max-reductions on device."""
  from spartan_tpu.backend import sparse as sps
  import jax.numpy as jnp
  if not isinstance(A, sps.SparseArray):
    A = sps.from_scipy(_to_scipy_sparse(A))
  off, live = _ell_offsets(A)
  lo = int(jnp.max(jnp.where(live, -off, 0)))
  hi = int(jnp.max(jnp.where(live, off, 0)))
  return lo, hi


class LaplacianNd(LinearOperator):
  """N-D grid Laplacian operator (scipy.sparse.linalg.LaplacianNd):
  the matvec is a fused shifted-add stencil ON DEVICE (pad/roll per
  axis — no matrix is ever materialized), eigenvalues come from the
  closed-form per-axis spectra.  ``boundary_conditions`` in
  {'neumann', 'dirichlet', 'periodic'}."""

  def __init__(self, grid_shape, *, boundary_conditions: str = "neumann",
               dtype=np.int8):
    self.grid_shape = tuple(int(g) for g in grid_shape)
    if boundary_conditions not in ("neumann", "dirichlet", "periodic"):
      raise ValueError(f"unknown boundary_conditions "
                       f"{boundary_conditions!r}")
    self.boundary_conditions = boundary_conditions
    n = int(np.prod(self.grid_shape))
    gs, bc = self.grid_shape, boundary_conditions

    def kern(x):
      import jax
      import jax.numpy as jnp
      dt = jnp.result_type(x.dtype, jnp.float32)
      g = x.astype(dt).reshape(gs)
      out = jnp.zeros_like(g)
      deg = jnp.zeros_like(g)
      for ax in range(len(gs)):
        if bc == "periodic":
          out = out + jnp.roll(g, 1, ax) + jnp.roll(g, -1, ax)
          deg = deg + 2.0
        else:
          zshape = list(g.shape)
          zshape[ax] = 1
          z = jnp.zeros(zshape, dt)
          up = jnp.concatenate(
              [jax.lax.slice_in_dim(g, 1, gs[ax], axis=ax), z], axis=ax)
          dn = jnp.concatenate(
              [z, jax.lax.slice_in_dim(g, 0, gs[ax] - 1, axis=ax)],
              axis=ax)
          out = out + up + dn
          if bc == "neumann":
            ones = jnp.ones_like(g)
            nb = (jnp.concatenate(
                [jax.lax.slice_in_dim(ones, 1, gs[ax], axis=ax), z],
                axis=ax)
                + jnp.concatenate(
                [z, jax.lax.slice_in_dim(ones, 0, gs[ax] - 1, axis=ax)],
                axis=ax))
            deg = deg + nb
          else:
            deg = deg + 2.0
      return (out - deg * g).reshape(n)

    self._kern = kern
    super().__init__((n, n),
                     lambda v: sp.map([sp.lazify(v)], kern),
                     lambda v: sp.map([sp.lazify(v)], kern),  # symmetric
                     dtype=dtype)

  def _axis_eigs(self, m: int) -> np.ndarray:
    k = np.arange(m)
    if self.boundary_conditions == "dirichlet":
      return -4.0 * np.sin(np.pi * (k + 1) / (2 * (m + 1))) ** 2
    if self.boundary_conditions == "neumann":
      return -4.0 * np.sin(np.pi * k / (2 * m)) ** 2
    return -4.0 * np.sin(np.pi * np.floor((k + 1) / 2) / m) ** 2

  def eigenvalues(self, m: int = None) -> np.ndarray:
    """All (or the ``m`` largest) eigenvalues, ascending — closed-form
    per-axis spectra summed over the grid (host numpy, O(N))."""
    grids = np.meshgrid(*[self._axis_eigs(g) for g in self.grid_shape],
                        indexing="ij")
    lam = np.sort(sum(grids).ravel())
    return lam if m is None else lam[-m:]

  def toarray(self) -> np.ndarray:
    """Dense form — ONE vmapped application of the stencil kernel to
    the identity (a per-column python loop would pay n dispatch round
    trips, seconds each over the axon tunnel — code review r5s5)."""
    n = self.shape[0]
    kern = self._kern

    def batched(E):
      import jax
      return jax.vmap(kern)(E)

    rows = np.asarray(sp.map([sp.Val(np.eye(n))], batched).glom())
    return rows.T  # symmetric, but keep the column convention exact

  def tosparse(self):
    from spartan_tpu.backend.sparse import from_dense
    return from_dense(self.toarray())


# --- host boundaries (SuperLU / ARPACK-adjacent) ----------------------

def splu(A, **kw):
  """Sparse LU (SuperLU) — host boundary: sequential pivoting has no
  XLA kernel.  Returns scipy's SuperLU object (its ``solve`` runs on
  host; for device solves use spsolve/cg/gmres)."""
  import scipy.sparse.linalg as ssl
  _host_notice("splu", "sequential sparse pivoting (SuperLU)")
  return ssl.splu(_to_scipy_sparse(A).tocsc(), **kw)


def spilu(A, **kw):
  """Incomplete LU — host boundary; pair the resulting ``.solve`` with
  device solvers only when the per-iteration host round trip is
  acceptable (prefer device preconditioners)."""
  import scipy.sparse.linalg as ssl
  _host_notice("spilu", "sequential incomplete factorization (SuperLU)")
  return ssl.spilu(_to_scipy_sparse(A).tocsc(), **kw)


def factorized(A):
  """Pre-factorized solve closure — host boundary (SuperLU)."""
  import scipy.sparse.linalg as ssl
  _host_notice("factorized", "sequential sparse pivoting (SuperLU)")
  return ssl.factorized(_to_scipy_sparse(A).tocsc())


# splu/spilu return scipy's SuperLU objects (host factorizations);
# exposing the class itself keeps isinstance checks working.
from scipy.sparse.linalg import SuperLU  # noqa: E402


def lobpcg(A, X, B=None, M=None, Y=None, tol=None, maxiter=20,
           largest=True, verbosityLevel=0, retLambdaHistory=False,
           retResidualNormsHistory=False, restartControl=20):
  """LOBPCG block eigensolver — host boundary for now (scipy's driver
  is adaptive host logic; for device eigenproblems use
  :func:`eigsh`, the fused thick-restart Lanczos)."""
  import scipy.sparse.linalg as ssl
  _host_notice("lobpcg", "adaptive host driver")

  def g(op):
    if op is None:
      return None
    if hasattr(op, "to_scipy"):
      return op.to_scipy()
    if isinstance(op, Expr) or isinstance(op, np.ndarray):
      return np.asarray(sp.lazify(op).glom())
    return op  # scipy operator / callable — pass through

  Xh = np.asarray(sp.lazify(X).glom())
  return ssl.lobpcg(_to_scipy_sparse(A), Xh, B=g(B), M=g(M),
                    Y=None if Y is None else np.asarray(sp.lazify(Y).glom()),
                    tol=tol, maxiter=maxiter, largest=largest,
                    verbosityLevel=verbosityLevel,
                    retLambdaHistory=retLambdaHistory,
                    retResidualNormsHistory=retResidualNormsHistory,
                    restartControl=restartControl)


def lgmres(A, b, x0=None, *, rtol=1e-5, atol=0.0, maxiter=1000, M=None,
           inner_m=30, outer_k=3, outer_v=None, store_outer_Av=True,
           prepend_outer_v=False):
  """LGMRES (augmented restarts) — host boundary (scipy's augmentation
  bookkeeping is adaptive host logic; the fused device solver family
  covers gmres-with-restarts already)."""
  import scipy.sparse.linalg as ssl
  _host_notice("lgmres", "adaptive augmented-restart host driver")
  return ssl.lgmres(_to_scipy_sparse(A),
                    np.asarray(sp.lazify(b).glom()),
                    x0=None if x0 is None else np.asarray(
                        sp.lazify(x0).glom()),
                    rtol=rtol, atol=atol, maxiter=maxiter, M=M,
                    inner_m=inner_m, outer_k=outer_k, outer_v=outer_v,
                    store_outer_Av=store_outer_Av,
                    prepend_outer_v=prepend_outer_v)


def gcrotmk(A, b, x0=None, *, rtol=1e-5, atol=0.0, maxiter=1000,
            M=None, callback=None, m=20, k=None, CU=None,
            discard_C=False, truncate="oldest"):
  """GCROT(m,k) — host boundary (recycling-subspace host driver)."""
  import scipy.sparse.linalg as ssl
  _host_notice("gcrotmk", "recycling-subspace host driver")
  return ssl.gcrotmk(_to_scipy_sparse(A),
                     np.asarray(sp.lazify(b).glom()),
                     x0=None if x0 is None else np.asarray(
                         sp.lazify(x0).glom()),
                     rtol=rtol, atol=atol, maxiter=maxiter, M=M,
                     callback=callback, m=m, k=k, CU=CU,
                     discard_C=discard_C, truncate=truncate)


def onenormest(A, t: int = 2, itmax: int = 5, compute_v=False,
               compute_w=False):
  """Higham–Tisseur 1-norm estimator — host boundary (a handful of
  sign-vector matvecs with host argmax steering)."""
  import scipy.sparse.linalg as ssl
  _host_notice("onenormest", "host argmax-steered estimator")
  return ssl.onenormest(_to_scipy_sparse(A), t=t, itmax=itmax,
                        compute_v=compute_v, compute_w=compute_w)


def funm_multiply_krylov(f, A, b, *, assume_a="gen", atol=None, rtol=None,
                         restart_every_n=20, max_restarts=20):
  """Krylov ``f(A) b`` — host boundary (scipy's adaptive restart
  driver; for ``f=exp`` use the fused :func:`expm_multiply`)."""
  import scipy.sparse.linalg as ssl
  _host_notice("funm_multiply_krylov", "adaptive host restart driver")
  return ssl.funm_multiply_krylov(
      f, _to_scipy_sparse(A), np.asarray(sp.lazify(b).glom()),
      assume_a=assume_a, atol=atol, rtol=rtol,
      restart_every_n=restart_every_n, max_restarts=max_restarts)


__all__ += [
    "bicg", "cgs", "tfqmr", "qmr", "lsmr",
    "expm", "inv", "matrix_power", "spsolve_triangular",
    "is_sptriangular", "spbandwidth", "LaplacianNd",
    "ArpackError", "ArpackNoConvergence", "MatrixRankWarning",
    "use_solver", "splu", "spilu", "factorized", "SuperLU",
    "lobpcg", "lgmres", "gcrotmk", "onenormest",
    "funm_multiply_krylov",
]
