"""``sp.differentiate`` — the scipy.differentiate surface, on device.

scipy's adaptive algorithm evaluates one finite-difference stencil per
iteration, shrinking the step until the error estimate stops
improving.  The device formulation evaluates the WHOLE step sweep in
one batched call — ``(maxiter, order)`` stencil points per element,
one fused ``f`` evaluation, Fornberg-weighted contraction, then a
min-error select across steps — so a full adaptive derivative is a
single device program with no host round trips.  ``jacobian`` batches
all m coordinate perturbations into the same single call; ``hessian``
uses the 4-point cross stencil over the same step sweep.

Note: the framework's first-choice derivative is ``sp.grad`` (exact
autodiff); this namespace exists for scipy parity and for black-box
callables that jax can trace but not differentiate.

Reference parity: the spartan reference has no differentiate module;
SURVEY.md §2.5 'broader demo set' motivates the beyond-parity scipy
surfaces.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

import spartan_tpu as sp
from spartan_tpu.expr.base import Expr
from spartan_tpu.special import _f


class _Result(dict):
  """scipy _RichResult-alike: attribute access over dict fields."""

  def __getattr__(self, k):
    try:
      return self[k]
    except KeyError:
      raise AttributeError(k) from None

  def __repr__(self):
    keys = ", ".join(f"{k}={v!r}" for k, v in self.items())
    return f"_Result({keys})"


def _fd_weights(offsets, der=1):
  """Fornberg finite-difference weights for the given integer offsets
  (host metadata: solve the tiny Vandermonde moment system)."""
  offsets = np.asarray(offsets, float)
  n = offsets.shape[0]
  A = np.vander(offsets, n, increasing=True).T  # A[p, j] = o_j**p
  b = np.zeros(n)
  b[der] = math.factorial(der)
  return np.linalg.solve(A, b)


def _stencil(order, step_direction):
  """Integer offsets for a first-derivative stencil of accuracy
  ``order`` (central when step_direction == 0, one-sided otherwise)."""
  if step_direction == 0:
    m = order // 2
    offs = [o for o in range(-m, m + 1) if o != 0]
  elif step_direction > 0:
    offs = list(range(0, order + 1))
  else:
    offs = list(range(-order, 1))
  return np.asarray(offs, float)


def _tolerances(tolerances, dtype=np.float64):
  tolerances = tolerances or {}
  rtol = tolerances.get("rtol", float(np.finfo(dtype).eps) ** 0.5)
  atol = tolerances.get("atol", 0.0)
  return rtol, atol


def derivative(f, x, *, args=(), tolerances=None, maxiter=10, order=8,
               initial_step=0.5, step_factor=2.0, step_direction=0,
               preserve_shape=False, callback=None):
  """Adaptive first derivative: the whole shrinking-step sweep is one
  batched device evaluation + a min-error select (lazy Expr fields)."""
  if callback is not None:
    raise NotImplementedError("callback is a host-stepping feature; "
                              "the device sweep is one fused program")
  offs = _stencil(order, step_direction)
  w = _fd_weights(offs, 1)
  steps = initial_step / (float(step_factor) ** np.arange(maxiter))
  rtol, atol = _tolerances(tolerances)
  X = sp.lazify(x)
  extra = [sp.lazify(a) for a in args]

  def kern(xx, *aa):
    xx = _f(xx)
    oj = jnp.asarray(offs, xx.dtype)
    hj = jnp.asarray(steps, xx.dtype)
    wj = jnp.asarray(w, xx.dtype)
    # points: (*x.shape, maxiter, n_offsets)
    pts = xx[..., None, None] + hj[:, None] * oj[None, :]
    fv = f(pts, *aa) if aa else f(pts)
    d = jnp.tensordot(fv, wj, axes=(-1, -1)) / hj  # (..., maxiter)
    err = jnp.abs(jnp.diff(d, axis=-1))
    err = jnp.concatenate(
        [jnp.full_like(err[..., :1], jnp.inf), err], axis=-1)
    best = jnp.argmin(err, axis=-1)
    df = jnp.take_along_axis(d, best[..., None], -1)[..., 0]
    ee = jnp.take_along_axis(err, best[..., None], -1)[..., 0]
    ok = ee <= atol + rtol * jnp.abs(df)
    return df, ee, ok

  ops = [X] + extra
  df = sp.map(ops, lambda *a: kern(*a)[0])
  error = sp.map(ops, lambda *a: kern(*a)[1])
  success = sp.map(ops, lambda *a: kern(*a)[2])
  status = sp.map([success],
                  lambda s: jnp.where(s, 0, -2).astype(jnp.int32))
  nfev = maxiter * len(offs)
  return _Result(success=success, status=status, df=df, error=error,
                 nit=maxiter, nfev=nfev, x=X)


def jacobian(f, x, *, tolerances=None, maxiter=10, order=8,
             initial_step=0.5, step_factor=2.0, step_direction=0):
  """Jacobian of f: R^m -> R^n: every coordinate perturbation of every
  step lands in ONE batched f call (m·maxiter·order points)."""
  offs = _stencil(order, step_direction)
  w = _fd_weights(offs, 1)
  steps = initial_step / (float(step_factor) ** np.arange(maxiter))
  rtol, atol = _tolerances(tolerances)
  X = sp.lazify(x)
  m = X.shape[0]
  S, O = len(steps), len(offs)

  def kern2(xx):
    xx = _f(xx)
    oj = jnp.asarray(offs, xx.dtype)
    hj = jnp.asarray(steps, xx.dtype)
    wj = jnp.asarray(w, xx.dtype)
    batch = xx.shape[1:]
    eye = jnp.eye(m, dtype=xx.dtype)
    delta = (hj[:, None, None, None] * oj[None, :, None, None]
             * eye[None, None, :, :])        # (S, O, i, m)
    delta = jnp.moveaxis(delta, -1, 0)       # (m, S, O, i)
    pts = (xx.reshape((m,) + (1, 1, 1) + batch)
           + delta.reshape((m, S, O, m) + (1,) * len(batch)))
    fv = jnp.asarray(f(pts))                 # (*out, S, O, i, *batch)
    nb = len(batch)
    o_ax = fv.ndim - nb - 2                  # O axis position
    d = jnp.moveaxis(fv, o_ax, -1) @ wj      # (*out, S, i, *batch)
    s_ax = fv.ndim - nb - 3
    hshape = [1] * d.ndim
    hshape[s_ax] = S
    d = d / hj.reshape(hshape)
    err = jnp.abs(jnp.diff(d, axis=s_ax))
    pad = jnp.full_like(jnp.take(err, jnp.asarray([0]), axis=s_ax),
                        jnp.inf)
    err = jnp.concatenate([pad, err], axis=s_ax)
    best = jnp.argmin(err, axis=s_ax, keepdims=True)
    df = jnp.take_along_axis(d, best, s_ax).squeeze(s_ax)
    ee = jnp.take_along_axis(err, best, s_ax).squeeze(s_ax)
    ok = ee <= atol + rtol * jnp.abs(df)
    return df, ee, ok

  df = sp.map([X], lambda xx: kern2(xx)[0])
  error = sp.map([X], lambda xx: kern2(xx)[1])
  success = sp.map([X], lambda xx: kern2(xx)[2])
  status = sp.map([success],
                  lambda s: jnp.where(s, 0, -2).astype(jnp.int32))
  return _Result(success=success, status=status, df=df, error=error,
                 nit=maxiter, nfev=maxiter * O * m)


def hessian(f, x, *, tolerances=None, maxiter=10, order=8,
            initial_step=0.5, step_factor=2.0):
  """Hessian of scalar f via the 4-point cross stencil over the same
  single-call step sweep (diagonal: central second difference)."""
  steps = initial_step / (float(step_factor) ** np.arange(maxiter))
  rtol, atol = _tolerances(tolerances)
  X = sp.lazify(x)
  m = X.shape[0]
  S = len(steps)

  def kern(xx):
    xx = _f(xx)
    hj = jnp.asarray(steps, xx.dtype)
    eye = jnp.eye(m, dtype=xx.dtype)
    batch = xx.shape[1:]
    nb = len(batch)
    # cross points: x ± h e_i ± h e_j  -> (S, 4, i, j, m)
    signs = jnp.asarray([[1, 1], [1, -1], [-1, 1], [-1, -1]], xx.dtype)
    pert = (signs[:, 0][None, :, None, None, None] * eye[:, None]
            .reshape(1, 1, m, 1, m)
            + signs[:, 1][None, :, None, None, None] * eye[None, None,
                                                           None, :, :])
    pts = (xx.reshape((m,) + (1, 1, 1) + batch)
           + jnp.moveaxis(hj.reshape(S, 1, 1, 1, 1) * pert, -1, 0)
           .reshape((m, S, 4, m * m) + (1,) * nb))
    fv = jnp.asarray(f(pts))                  # (S, 4, m*m, *batch)
    cw = jnp.asarray([1.0, -1.0, -1.0, 1.0], xx.dtype)
    ax4 = fv.ndim - nb - 2
    num = jnp.moveaxis(fv, ax4, -1) @ cw      # (S, m*m, *batch)
    s_ax = 0
    d = num / (4.0 * (hj ** 2).reshape((S,) + (1,) * (num.ndim - 1)))
    err = jnp.abs(jnp.diff(d, axis=s_ax))
    pad = jnp.full_like(d[:1], jnp.inf)
    err = jnp.concatenate([pad, err], axis=s_ax)
    best = jnp.argmin(err, axis=s_ax, keepdims=True)
    df = jnp.take_along_axis(d, best, s_ax).squeeze(s_ax)
    ee = jnp.take_along_axis(err, best, s_ax).squeeze(s_ax)
    df = df.reshape((m, m) + batch)
    ee = ee.reshape((m, m) + batch)
    # symmetrize (the stencil is symmetric up to roundoff)
    df = 0.5 * (df + jnp.swapaxes(df, 0, 1))
    ok = ee <= atol + rtol * jnp.abs(df)
    return df, ee, ok

  ddf = sp.map([X], lambda xx: kern(xx)[0])
  error = sp.map([X], lambda xx: kern(xx)[1])
  success = sp.map([X], lambda xx: kern(xx)[2])
  status = sp.map([success],
                  lambda s: jnp.where(s, 0, -2).astype(jnp.int32))
  return _Result(success=success, status=status, ddf=ddf, error=error,
                 nit=maxiter, nfev=maxiter * 4 * m * m)


_HOST_NAMES = []

__all__ = ["derivative", "jacobian", "hessian"]
