"""Differential fuzzing: random expression DAGs vs a parallel NumPy
evaluation.  Every generated program is built twice — once with
spartan_tpu ops, once with numpy — from the same seed, and must agree to
f64 tolerance.  Catches interaction bugs (fusion × slicing × broadcasting
× reductions) that targeted unit tests miss."""

import numpy as np
import pytest

import spartan_tpu as sp

# each entry: (name, spartan_fn, numpy_fn, arity, needs_positive)
_UNARY = [
    ("neg", lambda x: -x, lambda x: -x),
    ("abs", lambda x: abs(x), np.abs),
    ("sqrt_abs", lambda x: sp.sqrt(abs(x) + 0.5),
     lambda x: np.sqrt(np.abs(x) + 0.5)),
    ("exp_clip", lambda x: sp.exp(sp.clip(x, -3, 3)),
     lambda x: np.exp(np.clip(x, -3, 3))),
    ("tanh", sp.tanh, np.tanh),
    ("square", sp.square, np.square),
    ("transpose", lambda x: x.T, lambda x: x.T),
    ("nan_to_num", sp.nan_to_num, np.nan_to_num),
    ("copy", sp.copy, np.copy),
    ("arcsinh", sp.arcsinh, np.arcsinh),
    ("i0_clip", lambda x: sp.i0(sp.clip(x, -2, 2)),
     lambda x: np.i0(np.clip(x, -2, 2))),
    ("fliplr", sp.fliplr, np.fliplr),
    ("flipud", sp.flipud, np.flipud),
    ("cumsum_m", lambda x: x.cumsum(axis=1),
     lambda x: np.cumsum(x, axis=1)),
    ("unwrap", lambda x: sp.unwrap(x, axis=0),
     lambda x: np.unwrap(x, axis=0)),
]
_BINARY = [
    ("add", lambda a, b: a + b, np.add),
    ("sub", lambda a, b: a - b, np.subtract),
    ("mul", lambda a, b: a * b, np.multiply),
    ("max", sp.maximum, np.maximum),
    ("min", sp.minimum, np.minimum),
    ("fmax", sp.fmax, np.fmax),
    ("logaddexp", sp.logaddexp, np.logaddexp),
    ("logaddexp2", sp.logaddexp2, np.logaddexp2),
    ("vecdot_bcast", lambda a, b: sp.broadcast_to(
        sp.reshape(sp.vecdot(a, b), (int(a.shape[0]), 1)), a.shape),
     lambda a, b: np.broadcast_to(
        np.vecdot(a, b).reshape(-1, 1), a.shape)),
]
_REDUCE = [
    ("sum0", lambda x: sp.sum(x, axis=0), lambda x: x.sum(axis=0)),
    ("sum1", lambda x: sp.sum(x, axis=1), lambda x: x.sum(axis=1)),
    ("mean0", lambda x: sp.mean(x, axis=0), lambda x: x.mean(axis=0)),
    ("max0", lambda x: sp.max(x, axis=0), lambda x: x.max(axis=0)),
    ("min1", lambda x: sp.min(x, axis=1), lambda x: x.min(axis=1)),
]


def _gen_program(rng, depth, shape):
  """Build a random (spartan_expr, numpy_value) pair of matching 2-D
  computations over `shape` arrays."""
  kind = rng.integers(0, 10)
  if depth <= 0 or kind < 3:
    a = rng.standard_normal(shape)
    return sp.from_numpy(a), a
  if kind < 6:
    name, sfn, nfn = _UNARY[rng.integers(0, len(_UNARY))]
    se, ne = _gen_program(rng, depth - 1, shape)
    if name == "transpose":
      return sfn(se), nfn(ne)
    return sfn(se), nfn(ne)
  if kind < 9:
    _, sfn, nfn = _BINARY[rng.integers(0, len(_BINARY))]
    s1, n1 = _gen_program(rng, depth - 1, shape)
    s2, n2 = _gen_program(rng, depth - 1, shape)
    if n1.shape != n2.shape:   # transpose may have swapped one side
      s2, n2 = s2.T if hasattr(s2, "T") else s2, n2.T
    if n1.shape != n2.shape:
      return s1, n1
    return sfn(s1, s2), nfn(n1, n2)
  # scalar mix
  c = float(rng.standard_normal())
  se, ne = _gen_program(rng, depth - 1, shape)
  return se * c + 1.0, ne * c + 1.0


@pytest.mark.parametrize("seed", range(30))
def test_fuzz_programs(seed):
  rng = np.random.default_rng(seed)
  shape = (int(rng.integers(2, 12)), int(rng.integers(2, 12)))
  se, ne = _gen_program(rng, depth=int(rng.integers(1, 5)), shape=shape)
  # random finisher: slice / reduce / plain
  k = rng.integers(0, 4)
  if k == 0 and min(ne.shape) > 2:
    r0 = int(rng.integers(1, ne.shape[0]))
    se, ne = se[:r0], ne[:r0]
  elif k == 1:
    _, sfn, nfn = _REDUCE[rng.integers(0, len(_REDUCE))]
    se, ne = sfn(se), nfn(ne)
  elif k == 2:
    se, ne = sp.sum(se), ne.sum()
  got = np.asarray(se.glom() if hasattr(se, "glom") else se)
  np.testing.assert_allclose(got, ne, rtol=1e-9, atol=1e-9,
                             err_msg=f"seed={seed}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_with_passes_toggled(seed):
  """Same fuzz programs with the optimizer disabled must agree bit-for-bit
  with the optimized path (the reference's optimization invariance test,
  fuzzed)."""
  from spartan_tpu.config import FLAGS
  rng = np.random.default_rng(1000 + seed)
  shape = (8, 8)
  se, ne = _gen_program(rng, depth=3, shape=shape)
  loss = sp.sum(se)
  on = loss.glom()
  rng2 = np.random.default_rng(1000 + seed)
  se2, _ = _gen_program(rng2, depth=3, shape=shape)
  FLAGS.optimization = False
  try:
    off = sp.sum(se2).glom()
  finally:
    FLAGS.optimization = True
  np.testing.assert_allclose(on, off, rtol=1e-11)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_fast_lane_data_sweep(seed):
  """Same program structure × 4 data variations: the evaluator fast lane
  must rebind fresh leaf values correctly every time."""
  from spartan_tpu.backend import evaluator
  rng = np.random.default_rng(5000 + seed)
  shape = (int(rng.integers(3, 10)), int(rng.integers(3, 10)))
  datas = [np.random.default_rng(100 * seed + j).standard_normal(shape)
           for j in range(4)]

  for j, a_np in enumerate(datas):
    rng2 = np.random.default_rng(seed)
    se, ne = _gen_program(rng2, depth=3, shape=shape)
    if ne.shape != shape:
      return  # transpose changed the shape; skip this seed
    got = float(sp.sum(se + sp.from_numpy(a_np)).glom())
    want = (ne + a_np).sum()
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9,
                               err_msg=f"seed={seed} variation={j}")


@pytest.mark.parametrize("seed", range(10))
def test_fuzz_grad_finite_difference(seed):
  """Random differentiable DAGs: autodiff.grad vs central finite
  differences."""
  from spartan_tpu import autodiff
  rng = np.random.default_rng(9000 + seed)
  shape = (int(rng.integers(2, 6)), int(rng.integers(2, 6)))
  x_np = rng.standard_normal(shape)
  x = sp.from_numpy(x_np)

  smooth_unary = [
      (lambda v: sp.tanh(v), np.tanh),
      (lambda v: sp.exp(sp.clip(v, -2, 2)), lambda v: np.exp(np.clip(v, -2, 2))),
      (lambda v: v * v, lambda v: v * v),
      (lambda v: v * 3.0 - 1.0, lambda v: v * 3.0 - 1.0),
  ]
  k1, k2 = rng.integers(0, len(smooth_unary), 2)
  sfn1, nfn1 = smooth_unary[k1]
  sfn2, nfn2 = smooth_unary[k2]
  loss = sp.sum(sfn2(sfn1(x)))
  (g,) = autodiff.grad(loss, [x])

  def f(v):
    return nfn2(nfn1(v)).sum()

  eps = 1e-6
  num = np.zeros_like(x_np)
  it = np.nditer(x_np, flags=["multi_index"])
  for _ in it:
    idx = it.multi_index
    hi = x_np.copy(); hi[idx] += eps
    lo = x_np.copy(); lo[idx] -= eps
    num[idx] = (f(hi) - f(lo)) / (2 * eps)
  np.testing.assert_allclose(np.asarray(g.glom()), num, rtol=1e-4,
                             atol=1e-6, err_msg=f"seed={seed}")


def test_fuzz_at_updates_vs_numpy(cluster):
  """Differential fuzz of the r4 .at[] surface: random shapes, index
  forms (flat arrays, multi-axis with negatives, partial, int scalars,
  bool masks), reducers — vs the numpy oracle."""
  rng = np.random.default_rng(7)
  reducers = [("set", None), ("add", np.add), ("multiply", np.multiply),
              ("max", np.maximum), ("min", np.minimum)]
  for case in range(60):
    ndim = int(rng.integers(1, 4))
    shape = tuple(int(rng.integers(2, 6)) for _ in range(ndim))
    base = rng.standard_normal(shape)
    mname, ufunc = reducers[case % len(reducers)]
    form = case % 4
    E = sp.from_numpy(base)
    want = base.copy()
    if form == 0:        # flat integer scatter along axis 0 (with dups)
      k = int(rng.integers(1, 5))
      idx = rng.integers(-shape[0], shape[0], k)
      v = rng.standard_normal((k,) + shape[1:])
      got = getattr(E.at[idx], mname)(v)
      if mname == "set":
        want[idx] = v
      else:
        ufunc.at(want, idx, v)
    elif form == 1:      # multi-axis advanced (full or partial)
      naxes = int(rng.integers(1, ndim + 1))
      k = int(rng.integers(1, 5))
      idxs = tuple(rng.integers(-shape[d], shape[d], k)
                   for d in range(naxes))
      v = rng.standard_normal((k,) + shape[naxes:])
      got = getattr(E.at[idxs], mname)(v)
      if mname == "set":
        want[idxs] = v
      else:
        ufunc.at(want, idxs, v)
    elif form == 2:      # bool mask (any leading-dims rank), scalar v
      mrank = int(rng.integers(1, ndim + 1))
      mask = rng.standard_normal(shape[:mrank]) > 0
      v = float(rng.standard_normal())
      got = getattr(E.at[mask], mname)(v)
      if mname == "set":
        want[mask] = v
      else:
        ufunc.at(want, mask, v)
    else:                # int scalar leading index (region write)
      i0 = int(rng.integers(-shape[0], shape[0]))
      v = rng.standard_normal(shape[1:])
      got = getattr(E.at[i0], mname)(v)
      if mname == "set":
        want[i0] = v
      else:
        ufunc.at(want, i0, v)
    if mname == "set" and form in (0, 1):
      # duplicate indices: jax scatter-set takes an arbitrary dup, numpy
      # takes the last — only compare when indices are unique
      flat = (idx if form == 0 else
              np.ravel_multi_index(tuple(i % shape[d] for d, i in
                                         enumerate(idxs)),
                                   shape[:len(idxs)]))
      if len(np.unique(flat)) != len(np.ravel(flat)):
        continue
    np.testing.assert_allclose(np.asarray(got.glom()), want, atol=1e-12,
                               err_msg=f"case {case} form {form} {mname}")
