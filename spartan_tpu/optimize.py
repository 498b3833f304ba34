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


def _probe_objective(fun, leaf, args):
  """Lower a user callable to an Expr on ``leaf``, distinguishing
  "not expr-native" from "expr-native but buggy".

  TypeError/AttributeError from the probe call means the callable's ops
  reject an Expr argument (``jnp.*`` interop) — fall back to one
  ``sp.map`` node.  Any OTHER exception is remembered: if the map path
  then also fails (its shape trace is forced here so bugs surface NOW,
  not later inside a solver loop), the probe error is chained as the
  likely real bug instead of being silently swallowed (ADVICE r4)."""
  import jax.numpy as jnp
  probe_err = None
  try:
    out = fun(leaf, *args)
  except (TypeError, AttributeError):
    out = None
  except Exception as e:
    probe_err = e
    out = None
  if isinstance(out, Expr):
    return out
  name = getattr(fun, "__name__", repr(fun))
  try:
    out = sp.map([leaf], lambda p: jnp.asarray(fun(p, *args)))
    out.shape  # force the eval_shape trace so genuine bugs raise here
    return out
  except Exception as e2:
    if probe_err is not None:
      raise RuntimeError(
          f"objective {name!r} failed both on the lazy Expr parameter "
          f"({probe_err!r}) and under jax tracing ({e2!r}); the first "
          "error is likely the real bug in the objective") from probe_err
    raise


def _lower(fun, x0, args):
  """Callable → pure jax ``f(p)`` through the lazy layer.

  Expr-native callables build a DAG on a Val leaf; jax-traceable ones
  are wrapped in one map node.  Either way as_function applies the
  optimizer passes and autodiff-safe emission.  The leaf is built from
  the RAVELED x0 so scalar/2-D starts see the same (n,) vector the
  solvers pass in (ADVICE r4)."""
  import jax.numpy as jnp
  x0 = jnp.ravel(jnp.atleast_1d(jnp.asarray(x0, _float_dtype())))
  leaf = sp.lazify(np.asarray(x0))
  if not isinstance(leaf, Val):  # pragma: no cover
    raise TypeError("could not build a parameter leaf")
  out = _probe_objective(fun, leaf, args)
  fn, fargs = as_function(out, [leaf], differentiable=True)
  return (lambda p: jnp.ravel(jnp.asarray(fn(p)))), x0


# ---------------------------------------------------------------------
# nonlinear least squares
# ---------------------------------------------------------------------

def _parse_bounds(bounds, n, dtype, pairs=False):
  """scipy bounds forms → (lo, hi) (n,) arrays (±inf when unbounded).

  ``pairs=True`` is the minimize convention (a (lo, hi) pair PER
  parameter, or a Bounds object); ``pairs=False`` is the least_squares
  convention (one global (lo, hi) of scalars-or-arrays).  The two are
  shape-ambiguous at n=2, so the caller must say which."""
  import jax.numpy as jnp
  if bounds is None:
    bounds = (-np.inf, np.inf)
    pairs = False
  if hasattr(bounds, "lb"):  # scipy.optimize.Bounds
    lo, hi = bounds.lb, bounds.ub
  elif pairs:
    b = np.asarray(
        [[-np.inf if l is None else l, np.inf if h is None else h]
         for (l, h) in bounds], dtype=float)
    lo, hi = b[:, 0], b[:, 1]
  else:  # (lo, hi) scalars or arrays (least_squares convention)
    lo, hi = bounds
  lo = jnp.broadcast_to(jnp.asarray(lo, dtype), (n,))
  hi = jnp.broadcast_to(jnp.asarray(hi, dtype), (n,))
  if bool(jnp.any(lo > hi)):
    raise ValueError("each lower bound must be <= its upper bound")
  return lo, hi


def least_squares(fun, x0, args=(), method: str = None,
                  bounds=(-np.inf, np.inf),
                  xtol: float = 1e-10, gtol: float = 1e-10,
                  ftol: float = 1e-10, max_nfev: int = 200):
  """Nonlinear least squares, fused: the whole damped-Newton iteration
  (residual, ``jacfwd`` Jacobian, normal equations, trust-region damping
  update) is one compiled while_loop.

  ``method`` defaults to 'lm' unbounded and 'trf' when finite ``bounds``
  are given (scipy's 'lm' rejects bounds — same contract here).  The
  bounded path is a PROJECTED LM: each trial step is clipped into the
  box and optimality is measured on the projected gradient
  ``x - clip(x - g, lo, hi)`` — the KKT measure scipy's TRF reports.
  As the damping grows the step tends to a short projected-gradient
  step, so stalls at active bounds resolve toward the constrained
  optimum.  Parameter counts are assumed MXU-friendly-small (the J^T J
  normal equations are formed explicitly).

  Returns an :class:`OptimizeResult` with scipy's fields (``x``,
  ``cost``, ``fun``, ``jac``, ``grad``, ``optimality``, ``status``,
  ``success``, ``nfev``)."""
  import jax
  import jax.numpy as jnp
  resfn, x0 = _lower(fun, x0, args)
  n = x0.size
  lo, hi = _parse_bounds(bounds, n, x0.dtype)
  bounded = bool(jnp.any(jnp.isfinite(lo)) | jnp.any(jnp.isfinite(hi)))
  if method is None:
    method = "trf" if bounded else "lm"
  if method not in ("lm", "gn", "trf"):
    raise ValueError(f"method must be 'lm', 'gn' or 'trf', got {method!r}")
  if method in ("lm", "gn") and bounded:
    raise ValueError(f"method {method!r} doesn't support bounds; "
                     "use method='trf'")

  def clip(x):
    return jnp.clip(x, lo, hi) if bounded else x

  def proj_grad(x, g):
    return x - jnp.clip(x - g, lo, hi) if bounded else g

  def cost_of(r):
    return 0.5 * jnp.dot(r, r)

  @jax.jit
  def run(x0):
    x0 = clip(x0)
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
      if bounded:
        # Bertsekas active-set freeze: coordinates AT a bound with the
        # gradient pushing outward leave the normal equations (a joint
        # Newton step would otherwise be ~0 for the free coordinates
        # once the clamped ones stop moving — measured stall)
        eps = 1e-10 + 1e-8 * jnp.abs(x)
        frozen = ((jnp.isfinite(lo) & (x <= lo + eps) & (g > 0)) |
                  (jnp.isfinite(hi) & (x >= hi - eps) & (g < 0)))
        F = (~frozen).astype(x.dtype)
        H = H * (F[:, None] * F[None, :]) + jnp.diag(1.0 - F)
        g_solve = g * F
      else:
        g_solve = g
      damp = lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-12)) \
          if method != "gn" else 0.0 * jnp.eye(n, dtype=x.dtype)
      dx = -jnp.linalg.solve(H + damp + 1e-14 * jnp.eye(n, dtype=x.dtype),
                             g_solve)
      x2 = clip(x + dx)
      step = x2 - x
      c2 = cost_of(resfn(x2))
      accept = c2 < cost
      x_new = jnp.where(accept, x2, x)
      lam_new = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                          jnp.minimum(lam * 3.0, 1e12))
      cost_new = jnp.where(accept, c2, cost)
      # scipy status codes: 1 gtol, 2 ftol, 3 xtol
      st = jnp.where(jnp.max(jnp.abs(proj_grad(x, g))) < gtol, 1, 0)
      st = jnp.where((st == 0) & accept &
                     (cost - c2 <= ftol * jnp.maximum(cost, 1e-30)), 2, st)
      st = jnp.where((st == 0) & accept &
                     (jnp.linalg.norm(step) <
                      xtol * (xtol + jnp.linalg.norm(x))), 3, st)
      return x_new, lam_new, cost_new, it + 1, st.astype(jnp.int32)

    x, lam, cost, it, status = jax.lax.while_loop(cond, body, state)
    r = resfn(x)
    J = jax.jacfwd(resfn)(x)
    g = J.T @ r
    return x, cost_of(r), r, J, g, proj_grad(x, g), it, status

  x, cost, r, J, g, pg, it, status = run(x0)
  status = int(status)
  return OptimizeResult(
      x=np.asarray(x), cost=float(cost), fun=np.asarray(r),
      jac=np.asarray(J), grad=np.asarray(g),
      optimality=float(np.max(np.abs(np.asarray(pg)))),
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


def bisect(f, a, b, args=(), xtol: float = 1e-12, maxiter: int = 200,
           full_output: bool = False):
  """Scalar bisection in one fused while_loop (f must bracket a root).

  ``full_output=True`` additionally returns ``(iterations, converged)``
  from the solver's own stopping criterion (interval width <= xtol)."""
  import jax
  import jax.numpy as jnp
  fa, fb = float(f(a, *args)), float(f(b, *args))
  if fa == 0:
    return (float(a), 0, True) if full_output else float(a)
  if fb == 0:
    return (float(b), 0, True) if full_output else float(b)
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

    a, b, it = jax.lax.while_loop(
        cond, body, (jnp.asarray(a, dt), jnp.asarray(b, dt),
                     jnp.int32(0)))
    return 0.5 * (a + b), b - a, it

  root, width, it = run(a, b)
  if full_output:
    return float(root), int(it), bool(float(width) <= xtol)
  return float(root)


def newton(func, x0, args=(), tol: float = 1.48e-8, maxiter: int = 50,
           full_output: bool = False):
  """Scalar Newton iteration (derivative via ``jax.grad``), fused.

  ``full_output=True`` additionally returns ``(iterations, converged)``
  where converged means the last step satisfied ``|dx| <= tol``."""
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
      # zero-derivative guard: the fallback divisor must NEVER itself be
      # zero (sign(d)*eps + eps collapses to 0 for tiny negative d)
      safe = jnp.where(jnp.abs(d) < 1e-30,
                       jnp.where(d < 0, -1e-30, 1e-30), d)
      step = fj(x) / safe
      return x - step, step, it + 1

    x, dx, it = jax.lax.while_loop(
        cond, body, (jnp.asarray(x0, dt), jnp.asarray(2 * tol, dt),
                     jnp.int32(0)))
    return x, dx, it

  x, dx, it = run(x0)
  if full_output:
    conv = bool(np.isfinite(float(x)) and abs(float(dx)) <= tol)
    return float(x), int(it), conv
  return float(x)


def root_scalar(f, args=(), method: str = None, bracket=None, x0=None,
                xtol: float = 1e-12, maxiter: int = 200):
  """scipy.optimize.root_scalar front-end: 'bisect' with a bracket,
  'newton' with a start point (auto-picked).  ``iterations``/
  ``converged`` report the solver's ACTUAL work and its own stopping
  criterion (interval width / step size), not a fabricated count."""
  if method is None:
    method = "bisect" if bracket is not None else "newton"
  if method in ("bisect", "brentq"):
    if bracket is None:
      raise ValueError("bracket required for bisect")
    r, it, conv = bisect(f, bracket[0], bracket[1], args=args, xtol=xtol,
                         maxiter=maxiter, full_output=True)
    calls = 2 + 2 * it  # bracket check + two evals per bisection round
  elif method == "newton":
    if x0 is None:
      raise ValueError("x0 required for newton")
    r, it, conv = newton(f, x0, args=args, tol=xtol, maxiter=maxiter,
                         full_output=True)
    calls = 2 * it  # f and f' per step
  else:
    raise ValueError(f"unknown method {method!r}")
  return OptimizeResult(root=r, converged=conv,
                        function_calls=calls, iterations=it,
                        flag="converged" if conv else "not converged")


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


def _minimize_bounded(f, x0, lo, hi, tol, maxiter):
  """Box-constrained minimization (the scipy L-BFGS-B role), fused.

  One compiled while_loop of DAMPED PROJECTED NEWTON steps: the Hessian
  is restricted to the free set (Bertsekas active-set rule — coordinates
  at a bound with the gradient pushing outward are frozen to identity
  rows), the damped solve ``(H_ff + λI) d = -g_ff`` is clipped into the
  box, and λ adapts LM-style (accept ⇒ λ/3, reject ⇒ λ·3) so large λ
  degrades gracefully to short projected-gradient steps — globally
  convergent, quadratic tail.  Stops on the projected-gradient KKT
  measure ``max|x - clip(x - g, lo, hi)| < tol``."""
  import jax
  import jax.numpy as jnp
  n = x0.size
  eye = jnp.eye(n, dtype=x0.dtype)

  @jax.jit
  def run(x0):
    x0 = jnp.clip(x0, lo, hi)
    f0 = f(x0)

    def proj_grad(x, g):
      return x - jnp.clip(x - g, lo, hi)

    def cond(s):
      x, fv, lam, it, status = s
      return jnp.logical_and(status == 0, it < maxiter)

    def body(s):
      x, fv, lam, it, status = s
      g = jax.grad(f)(x)
      H = jax.hessian(f)(x)
      eps_act = 1e-10 + 1e-8 * jnp.abs(x)
      frozen = ((jnp.isfinite(lo) & (x <= lo + eps_act) & (g > 0)) |
                (jnp.isfinite(hi) & (x >= hi - eps_act) & (g < 0)))
      F = (~frozen).astype(x.dtype)
      Hm = H * (F[:, None] * F[None, :]) + jnp.diag(1.0 - F) + lam * eye
      d = -jnp.linalg.solve(Hm, g * F)
      x2 = jnp.clip(x + d, lo, hi)
      f2 = f(x2)
      accept = jnp.isfinite(f2) & (f2 < fv)
      x_new = jnp.where(accept, x2, x)
      f_new = jnp.where(accept, f2, fv)
      lam_new = jnp.where(accept, jnp.maximum(lam / 3.0, 1e-12),
                          jnp.minimum(lam * 3.0, 1e12))
      pg = jnp.max(jnp.abs(proj_grad(x_new, jax.grad(f)(x_new))))
      st = jnp.where(pg < tol, 1, 0)
      return (x_new, f_new, lam_new, it + 1, st.astype(jnp.int32))

    state = (x0, f0, jnp.asarray(1e-4, x0.dtype), jnp.int32(0),
             jnp.int32(0))
    x, fv, lam, it, status = jax.lax.while_loop(cond, body, state)
    g = jax.grad(f)(x)
    return x, fv, proj_grad(x, g), it, status

  x, fv, pg, it, status = run(x0)
  return OptimizeResult(
      x=np.asarray(x), fun=float(fv), nit=int(it),
      status=int(status), success=bool(int(status) == 1),
      optimality=float(np.max(np.abs(np.asarray(pg)))),
      message="projected gradient below tol" if int(status) == 1
      else "maxiter reached")


def minimize(fun, x0=None, args=(), wrt=None, method: str = None,
             bounds=None, tol=None, options=None):
  """scipy.optimize.minimize front-end.

  Expr-native form: ``minimize(loss_expr, wrt=[leaves])`` delegates to
  :func:`spartan_tpu.minimize` (one-compile BFGS + Newton polish).
  Callable form: ``minimize(f, x0)`` lowers ``f`` through the lazy
  layer (expr-native or jax-traceable, like :func:`least_squares`) and
  runs the same fused BFGS — or, with ``bounds=`` (scipy's per-parameter
  ``(lo, hi)`` pairs or a ``Bounds`` object; method auto-picks
  'l-bfgs-b'), the fused projected-Newton box solver
  (:func:`_minimize_bounded`)."""
  from spartan_tpu import autodiff
  import jax.numpy as jnp
  opts = dict(options or {})
  if method is None:
    method = "l-bfgs-b" if bounds is not None else "bfgs"
  method = method.lower()
  if isinstance(fun, Expr):
    if wrt is None:
      raise ValueError("expr-form minimize needs wrt=[leaves]")
    if bounds is not None:
      raise ValueError("bounds= is supported in the callable form "
                       "minimize(f, x0, bounds=...); flatten the "
                       "parameters into one vector")
    params, info = autodiff.minimize(fun, wrt, method=method, tol=tol,
                                     options=options)
    return OptimizeResult(
        x=params if len(params) > 1 else np.asarray(params[0].glom()),
        fun=info["fun"], nit=info["nit"], success=info["success"],
        status=info["status"])
  if x0 is None:
    raise ValueError("callable-form minimize needs x0")
  if bounds is not None or method in ("l-bfgs-b", "tnc"):
    lossfn, x0v = _lower(fun, x0, args)
    f = lambda p: jnp.squeeze(lossfn(p))
    lo, hi = _parse_bounds(bounds, x0v.size, x0v.dtype, pairs=True)
    return _minimize_bounded(
        f, x0v, lo, hi, tol=tol if tol is not None else 1e-8,
        maxiter=int(opts.get("maxiter", 500)))
  x0 = np.atleast_1d(np.asarray(x0, dtype=float))
  leaf = sp.lazify(x0)
  loss = _probe_objective(fun, leaf, args)
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
