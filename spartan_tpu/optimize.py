"""``sp.optimize`` — the scipy.optimize surface over fused device loops.

The reference has no optimization module (its examples hand-roll SGD —
SURVEY.md §2.5); this is beyond-parity surface built the sparse_linalg
way: every iterative solver is ONE compiled ``jax.lax.while_loop`` (no
per-iteration host syncs), Jacobians/Hessians come from the autodiff
bridge (``jax.jacfwd`` over the lowered DAG), and the linear algebra in
each step (normal equations, Newton solves) runs on the MXU.

Objective/residual functions may be either

* **expr-native**: a callable receiving a lazy ``Expr`` parameter vector
  and returning an ``Expr`` built from ``sp.*`` ops (the framework
  idiom), or
* **jax-traceable**: a callable on raw arrays using ``jnp``/numpy-style
  ops — wrapped into the lazy layer via one ``sp.map`` node.

Both lower through :func:`spartan_tpu.autodiff.as_function`, so
sharding, the optimizer passes, and the replication guards all apply.

Host boundaries (the sp.linalg.eig convention, logged once):
``linear_sum_assignment`` and ``nnls`` (exact active-set / Hungarian
algorithms are inherently sequential).
"""

from __future__ import annotations

import inspect

import numpy as np

import spartan_tpu as sp
from spartan_tpu.autodiff import as_function
from spartan_tpu.expr.base import Expr, Val
from spartan_tpu.util import log_info


__all__ = [
    "OptimizeResult", "least_squares", "curve_fit", "root",
    "root_scalar", "bisect", "newton", "minimize_scalar", "minimize",
    "linear_sum_assignment", "nnls",
]


class OptimizeResult(dict):
  """scipy-style result: a dict with attribute access."""

  def __getattr__(self, name):
    try:
      return self[name]
    except KeyError as e:  # pragma: no cover
      raise AttributeError(name) from e

  __setattr__ = dict.__setitem__

  def __repr__(self):
    return "\n".join(f"{k}: {v}" for k, v in sorted(self.items()))


def _float_dtype():
  import jax
  import jax.numpy as jnp
  return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _lower(fun, x0, args):
  """Callable → pure jax ``f(p)`` through the lazy layer.

  Expr-native callables build a DAG on a Val leaf; jax-traceable ones
  are wrapped in one map node.  Either way as_function applies the
  optimizer passes and autodiff-safe emission."""
  import jax.numpy as jnp
  x0 = jnp.asarray(x0, _float_dtype())
  leaf = sp.lazify(np.asarray(x0))
  if not isinstance(leaf, Val):  # pragma: no cover
    raise TypeError("could not build a parameter leaf")
  try:
    out = fun(leaf, *args)
  except Exception:
    out = None
  if not isinstance(out, Expr):
    out = sp.map([leaf], lambda p: jnp.asarray(fun(p, *args)))
  fn, fargs = as_function(out, [leaf], differentiable=True)
  return (lambda p: jnp.ravel(jnp.asarray(fn(p)))), jnp.ravel(x0)


# ---------------------------------------------------------------------
# nonlinear least squares
# ---------------------------------------------------------------------

def least_squares(fun, x0, args=(), method: str = "lm",
                  xtol: float = 1e-10, gtol: float = 1e-10,
                  ftol: float = 1e-10, max_nfev: int = 200):
  """Nonlinear least squares by Levenberg–Marquardt, fused: the whole
  damped-Newton iteration (residual, ``jacfwd`` Jacobian, normal
  equations, trust-region damping update) is one compiled while_loop.

  Parameter counts are assumed MXU-friendly-small (the J^T J normal
  equations are formed explicitly — the scipy 'lm' regime); scipy's
  'trf'/'dogbox' bound handling is not implemented.

  Returns an :class:`OptimizeResult` with scipy's fields (``x``,
  ``cost``, ``fun``, ``jac``, ``grad``, ``optimality``, ``status``,
  ``success``, ``nfev``)."""
  import jax
  import jax.numpy as jnp
  if method not in ("lm", "gn"):
    raise ValueError(f"method must be 'lm' or 'gn', got {method!r}")
  resfn, x0 = _lower(fun, x0, args)
  n = x0.size

  def cost_of(r):
    return 0.5 * jnp.dot(r, r)

  @jax.jit
  def run(x0):
    r0 = resfn(x0)
    state = (x0, jnp.asarray(1e-3, x0.dtype), cost_of(r0),
             jnp.int32(0), jnp.int32(0))

    def cond(s):
      _, _, _, it, status = s
      return jnp.logical_and(status == 0, it < max_nfev)

    def body(s):
      x, lam, cost, it, status = s
      r = resfn(x)
      J = jax.jacfwd(resfn)(x)
      g = J.T @ r
      H = J.T @ J
      damp = lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-12)) \
          if method == "lm" else 0.0 * jnp.eye(n, dtype=x.dtype)
      dx = -jnp.linalg.solve(H + damp + 1e-14 * jnp.eye(n, dtype=x.dtype),
                             g)
      x2 = x + dx
      c2 = cost_of(resfn(x2))
      accept = c2 < cost
      x_new = jnp.where(accept, x2, x)
      lam_new = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                          jnp.minimum(lam * 3.0, 1e12))
      cost_new = jnp.where(accept, c2, cost)
      # scipy status codes: 1 gtol, 2 ftol, 3 xtol
      st = jnp.where(jnp.max(jnp.abs(g)) < gtol, 1, 0)
      st = jnp.where((st == 0) & accept &
                     (cost - c2 <= ftol * jnp.maximum(cost, 1e-30)), 2, st)
      st = jnp.where((st == 0) & accept &
                     (jnp.linalg.norm(dx) <
                      xtol * (xtol + jnp.linalg.norm(x))), 3, st)
      return x_new, lam_new, cost_new, it + 1, st.astype(jnp.int32)

    x, lam, cost, it, status = jax.lax.while_loop(cond, body, state)
    r = resfn(x)
    J = jax.jacfwd(resfn)(x)
    g = J.T @ r
    return x, cost_of(r), r, J, g, it, status

  x, cost, r, J, g, it, status = run(x0)
  status = int(status)
  return OptimizeResult(
      x=np.asarray(x), cost=float(cost), fun=np.asarray(r),
      jac=np.asarray(J), grad=np.asarray(g),
      optimality=float(np.max(np.abs(np.asarray(g)))),
      nfev=int(it), njev=int(it), status=status if status else 0,
      success=bool(status in (1, 2, 3)),
      message={0: "max_nfev reached", 1: "gtol satisfied",
               2: "ftol satisfied", 3: "xtol satisfied"}[status])


def curve_fit(f, xdata, ydata, p0=None, sigma=None,
              absolute_sigma: bool = False, **lsq_kw):
  """Fit ``f(x, *params)`` to data (scipy.optimize.curve_fit contract:
  returns ``(popt, pcov)``).  Rides :func:`least_squares` — one fused
  LM loop; the covariance comes from the final Jacobian's normal
  equations, scaled by the residual variance unless ``absolute_sigma``.
  """
  import jax.numpy as jnp
  xdata = np.asarray(xdata)
  ydata = np.asarray(ydata, dtype=float)
  if p0 is None:
    sig = inspect.signature(f)
    n = len(sig.parameters) - 1
    if n < 1:
      raise ValueError("cannot infer parameter count; pass p0")
    p0 = np.ones(n)
  p0 = np.atleast_1d(np.asarray(p0, dtype=float))
  n = p0.size
  w = None if sigma is None else 1.0 / np.asarray(sigma, dtype=float)

  def residual(p):
    model = f(xdata, *[p[i] for i in range(n)])
    r = model - ydata
    return r if w is None else r * w

  res = least_squares(residual, p0, **lsq_kw)
  m = res.fun.size
  JtJ = res.jac.T @ res.jac
  try:
    cov = np.linalg.inv(JtJ)
  except np.linalg.LinAlgError:
    cov = np.linalg.pinv(JtJ)
  if not absolute_sigma:
    dof = max(m - n, 1)
    cov = cov * (2.0 * res.cost / dof)
  return res.x, cov


# ---------------------------------------------------------------------
# root finding
# ---------------------------------------------------------------------

_ALPHAS = (1.0, 0.5, 0.25, 0.125)


def root(fun, x0, args=(), method: str = "newton", tol: float = 1e-10,
         maxiter: int = 100):
  """Vector root find: damped Newton with a 4-point backtracking line
  search, fused into one while_loop (``jacfwd`` Jacobian + MXU solve
  per step).  scipy's 'hybr' (MINPACK dogleg) is accepted as an alias —
  same fixed points, different globalization."""
  import jax
  import jax.numpy as jnp
  if method not in ("newton", "hybr"):
    raise ValueError(f"unknown method {method!r}")
  ffn, x0 = _lower(fun, x0, args)
  n = x0.size

  @jax.jit
  def run(x0):
    f0 = ffn(x0)

    def cond(s):
      x, fn2, it = s
      return jnp.logical_and(fn2 > tol * tol, it < maxiter)

    def body(s):
      x, fn2, it = s
      fv = ffn(x)
      J = jax.jacfwd(ffn)(x)
      dx = -jnp.linalg.solve(J + 1e-14 * jnp.eye(n, dtype=x.dtype), fv)
      cands = jnp.stack([x + a * dx for a in _ALPHAS])
      norms = jnp.stack([jnp.dot(ffn(c), ffn(c)) for c in cands])
      k = jnp.argmin(norms)
      return cands[k], norms[k], it + 1

    x, fn2, it = jax.lax.while_loop(
        cond, body, (x0, jnp.dot(f0, f0), jnp.int32(0)))
    return x, ffn(x), it

  x, fv, it = run(x0)
  fnorm = float(np.max(np.abs(np.asarray(fv))))
  return OptimizeResult(
      x=np.asarray(x), fun=np.asarray(fv), nfev=int(it) * 5,
      nit=int(it), success=bool(fnorm <= tol * max(1.0, fnorm + 1.0)
                                or float(np.dot(fv, fv)) <= tol * tol),
      message="converged" if float(np.dot(fv, fv)) <= tol * tol
      else "maxiter reached")


def bisect(f, a, b, args=(), xtol: float = 1e-12, maxiter: int = 200):
  """Scalar bisection in one fused while_loop (f must bracket a root)."""
  import jax
  import jax.numpy as jnp
  fa, fb = float(f(a, *args)), float(f(b, *args))
  if fa == 0:
    return float(a)
  if fb == 0:
    return float(b)
  if fa * fb > 0:
    raise ValueError("f(a) and f(b) must have opposite signs")
  dt = _float_dtype()

  def fj(x):
    return jnp.asarray(f(x, *args), dt)

  @jax.jit
  def run(a, b):
    def cond(s):
      a, b, it = s
      return jnp.logical_and(b - a > xtol, it < maxiter)

    def body(s):
      a, b, it = s
      m = 0.5 * (a + b)
      left = fj(a) * fj(m) <= 0
      return jnp.where(left, a, m), jnp.where(left, m, b), it + 1

    a, b, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(a, dt), jnp.asarray(b, dt),
                     jnp.int32(0)))
    return 0.5 * (a + b)

  return float(run(a, b))


def newton(func, x0, args=(), tol: float = 1.48e-8, maxiter: int = 50):
  """Scalar Newton iteration (derivative via ``jax.grad``), fused."""
  import jax
  import jax.numpy as jnp
  dt = _float_dtype()

  def fj(x):
    return jnp.asarray(func(x, *args), dt)

  g = jax.grad(lambda x: fj(x))

  @jax.jit
  def run(x0):
    def cond(s):
      x, dx, it = s
      return jnp.logical_and(jnp.abs(dx) > tol, it < maxiter)

    def body(s):
      x, _, it = s
      d = g(x)
      step = fj(x) / jnp.where(jnp.abs(d) < 1e-30,
                               jnp.sign(d) * 1e-30 + 1e-30, d)
      return x - step, step, it + 1

    x, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(x0, dt), jnp.asarray(2 * tol, dt),
                     jnp.int32(0)))
    return x

  return float(run(x0))


def root_scalar(f, args=(), method: str = None, bracket=None, x0=None,
                xtol: float = 1e-12, maxiter: int = 200):
  """scipy.optimize.root_scalar front-end: 'bisect' with a bracket,
  'newton' with a start point (auto-picked)."""
  if method is None:
    method = "bisect" if bracket is not None else "newton"
  if method in ("bisect", "brentq"):
    if bracket is None:
      raise ValueError("bracket required for bisect")
    r = bisect(f, bracket[0], bracket[1], args=args, xtol=xtol,
               maxiter=maxiter)
  elif method == "newton":
    if x0 is None:
      raise ValueError("x0 required for newton")
    r = newton(f, x0, args=args, tol=xtol, maxiter=maxiter)
  else:
    raise ValueError(f"unknown method {method!r}")
  fr = float(f(r, *args))
  return OptimizeResult(root=r, converged=bool(abs(fr) < 1e-6),
                        function_calls=maxiter, iterations=maxiter,
                        flag="converged" if abs(fr) < 1e-6 else
                        "not converged")


def minimize_scalar(f, bounds=None, bracket=None, args=(),
                    method: str = None, xtol: float = 1e-10,
                    maxiter: int = 200):
  """Golden-section scalar minimization in one fused while_loop."""
  import jax
  import jax.numpy as jnp
  if bounds is None and bracket is not None:
    bounds = (bracket[0], bracket[-1])
  if bounds is None:
    raise ValueError("bounds (or bracket) required")
  del method
  dt = _float_dtype()
  phi = (np.sqrt(5.0) - 1.0) / 2.0

  def fj(x):
    return jnp.asarray(f(x, *args), dt)

  @jax.jit
  def run(a, b):
    def cond(s):
      a, b, it = s
      return jnp.logical_and(b - a > xtol, it < maxiter)

    def body(s):
      a, b, it = s
      c = b - phi * (b - a)
      d = a + phi * (b - a)
      left = fj(c) < fj(d)
      return jnp.where(left, a, c), jnp.where(left, d, b), it + 1

    a, b, it = jax.lax.while_loop(
        cond, body, (jnp.asarray(bounds[0], dt),
                     jnp.asarray(bounds[1], dt), jnp.int32(0)))
    return 0.5 * (a + b), it

  x, it = run(*bounds)
  x = float(x)
  return OptimizeResult(x=x, fun=float(f(x, *args)), nit=int(it),
                        success=True)


def minimize(fun, x0=None, args=(), wrt=None, method: str = "bfgs",
             tol=None, options=None):
  """scipy.optimize.minimize front-end.

  Expr-native form: ``minimize(loss_expr, wrt=[leaves])`` delegates to
  :func:`spartan_tpu.minimize` (one-compile BFGS + Newton polish).
  Callable form: ``minimize(f, x0)`` lowers ``f`` through the lazy
  layer (expr-native or jax-traceable, like :func:`least_squares`) and
  runs the same fused BFGS."""
  from spartan_tpu import autodiff
  if isinstance(fun, Expr):
    if wrt is None:
      raise ValueError("expr-form minimize needs wrt=[leaves]")
    params, info = autodiff.minimize(fun, wrt, method=method, tol=tol,
                                     options=options)
    return OptimizeResult(
        x=params if len(params) > 1 else np.asarray(params[0].glom()),
        fun=info["fun"], nit=info["nit"], success=info["success"],
        status=info["status"])
  if x0 is None:
    raise ValueError("callable-form minimize needs x0")
  import jax.numpy as jnp
  x0 = np.atleast_1d(np.asarray(x0, dtype=float))
  leaf = sp.lazify(x0)
  try:
    loss = fun(leaf, *args)
  except Exception:
    loss = None
  if not isinstance(loss, Expr):
    loss = sp.map([leaf], lambda p: jnp.asarray(fun(p, *args)))
  params, info = autodiff.minimize(loss, [leaf], method=method, tol=tol,
                                   options=options)
  return OptimizeResult(
      x=np.asarray(params[0].glom()), fun=info["fun"], nit=info["nit"],
      success=info["success"], status=info["status"])


# ---------------------------------------------------------------------
# host boundaries (inherently sequential exact algorithms)
# ---------------------------------------------------------------------

_host_noticed: set = set()


def _host_notice(name):
  if name in _host_noticed:
    return
  _host_noticed.add(name)
  log_info(
      "sp.optimize.%s: inherently sequential exact algorithm — runs "
      "EAGERLY on the host (scipy.optimize), the sp.linalg.eig "
      "convention.", name)


def linear_sum_assignment(cost_matrix, maximize: bool = False):
  """Hungarian assignment — host boundary (scipy.optimize)."""
  _host_notice("linear_sum_assignment")
  import scipy.optimize as sopt
  c = np.asarray(sp.lazify(cost_matrix).glom())
  return sopt.linear_sum_assignment(c, maximize=maximize)


def nnls(A, b, maxiter=None):
  """Non-negative least squares — host boundary (active-set is
  sequential; for large problems use a projected-gradient FISTA on the
  lazy layer, see examples/lasso)."""
  _host_notice("nnls")
  import scipy.optimize as sopt
  return sopt.nnls(np.asarray(sp.lazify(A).glom()),
                   np.asarray(sp.lazify(b).glom()), maxiter=maxiter)
