"""Pallas ELL SpMV kernel — gather as an on-the-fly one-hot MXU dot.

``y[i] = Σ_j vals[i, j] * x[cols[i, j]]`` for unstructured sparsity.

TPU has no fast unstructured gather: the XLA ``jnp.take`` path runs at
~0.1 Gnnz/s on v5e, and Mosaic rejects every in-kernel gather
formulation (1-D operand, (m,1) take, take_along_axis-style — see
CLAUDE.md round-1 notes).  This kernel never gathers: for each strip of
128 ELL entries it *builds the one-hot matrix in registers* and reads
``x`` through the MXU,

    x2dT[v, u] = x[u·128 + v]                       (128, nq) in VMEM
    G[v, e]    = Σ_u x2dT[v, u] · (q[e] == u)       one MXU dot
    y[e]       = Σ_v G[v, e] · (r[e] == v)          VPU select+reduce

with ``q = col // 128``, ``r = col % 128``.  Compute is 2·n FLOP per
nonzero (the linear-algebra cost of a one-hot gather), so the kernel
wins only while the MXU can amortize that: measured on v5e at 64 nnz/row
(vs the 0.09 Gnnz/s XLA gather):

    n=4096   1.28 Gnnz/s f32-exactish   3.42 Gnnz/s bf16   (14× / 38×)
    n=16384  1.01 Gnnz/s                1.46 Gnnz/s        (11× / 16×)
    n=65536  0.08 Gnnz/s                0.15 Gnnz/s        (crossover)

The MXU multiplies in bf16: the default path hi/lo-splits ``x`` into two
bf16 dots (relerr ~3e-6); ``use_bf16=True`` is single-pass (~2e-3).
``Precision.HIGHEST`` measured 2.6× slower than hi/lo for 1 extra digit.
``tpu.dynamic_gather`` (take_along_axis lowering) would replace the VPU
select stage but crashes this target's Mosaic compiler (HTTP-500 in the
remote compile helper even for a minimal (128,128) axis-0 gather) — re-
test on newer toolchains.  Callers fall back to XLA above n = 32768.

Reference parity: spartan/sparse C++ SpMV kernels (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_STRIPS = 8          # ELL-entry strips of 128 per kernel block
_LANES = 128


def _onehot_kernel(cols_ref, vals_ref, xt_ref, out_ref, *, use_bf16):
  nq = xt_ref.shape[1]
  xt = xt_ref[...]
  # the MXU multiplies in bfloat16; a hi/lo split of x recovers ~16
  # mantissa bits (relerr ~3e-6 measured) at 2 passes — Precision.HIGHEST
  # (bf16x6) is 2.6× slower, single-pass bf16 (relerr ~2e-3) is the
  # use_bf16 fast mode
  xt_hi = xt.astype(jnp.bfloat16)
  if not use_bf16:
    xt_lo = (xt - xt_hi.astype(jnp.float32)).astype(jnp.bfloat16)
  for s in range(_STRIPS):
    c = cols_ref[s:s + 1, :]                       # (1, 128) int32
    q = c // _LANES
    r = c - q * _LANES
    # oh[u, e] = (q[e] == u): broadcast (1,128) against a (nq,128) iota —
    # no transpose/reshape across the sublane dim (Mosaic-safe)
    oh = (jax.lax.broadcasted_iota(jnp.int32, (nq, _LANES), 0)
          == q).astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    g = jax.lax.dot_general(xt_hi, oh, dims,
                            preferred_element_type=jnp.float32)
    if not use_bf16:
      g = g + jax.lax.dot_general(xt_lo, oh, dims,
                                  preferred_element_type=jnp.float32)
    # g[v, e] = x[q[e]*128 + v]; select v == r[e] and reduce
    ohr = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0) == r
    y = jnp.sum(jnp.where(ohr, g, 0), axis=0, keepdims=True)  # (1, 128)
    out_ref[s:s + 1, :] = vals_ref[s:s + 1, :].astype(jnp.float32) * y


@functools.partial(jax.jit, static_argnames=("interpret", "use_bf16"))
def spmv(cols: jax.Array, vals: jax.Array, x: jax.Array,
         interpret: bool = False, use_bf16: bool = False) -> jax.Array:
  """ELL SpMV; cols/vals (n, k), x (m,) → y (n,).

  ``use_bf16`` reads ``x`` through the MXU in bfloat16 (~2× the dot
  throughput, ~1e-3 relative error on the gathered values).
  """
  n, k = cols.shape
  m = x.shape[0]
  if x.dtype == jnp.float64:
    raise NotImplementedError("one-hot SpMV kernel is f32/bf16 only")
  acc = jnp.float32

  # pad x up to a whole (nq, 128) grid and lay it out transposed so the
  # kernel's one-hot dot needs no in-kernel transpose
  nq = -(-m // _LANES)
  xp = jnp.pad(x, (0, nq * _LANES - m)).reshape(nq, _LANES)
  xt = xp.T.astype(jnp.float32)                            # (128, nq)

  # pad the ELL block to the kernel grid (pad cols point at x[0], vals 0)
  kp = -(-k // _LANES) * _LANES
  np_ = -(-n // _STRIPS) * _STRIPS
  if kp != k or np_ != n:
    cols = jnp.pad(cols, ((0, np_ - n), (0, kp - k)))
    vals = jnp.pad(vals, ((0, np_ - n), (0, kp - k)))

  out = pl.pallas_call(
      functools.partial(_onehot_kernel, use_bf16=use_bf16),
      grid=(np_ // _STRIPS, kp // _LANES),
      in_specs=[
          pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((_LANES, nq), lambda i, j: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((np_, kp), acc),
      interpret=interpret,
  )(cols, vals, xt)
  return jnp.sum(out[:n], axis=1).astype(vals.dtype)


def sharded_onehot_spmv(cols: jax.Array, vals: jax.Array, x: jax.Array,
                        *, mesh, interpret: bool = False,
                        use_bf16: bool = False) -> jax.Array:
  """Row-sharded one-hot SpMV: ELL rows owner-computed per device inside
  ``shard_map`` (x replicated — the kernel reads all of x per strip
  anyway), the multi-device form of :func:`spmv`.  The pallas_call is
  opaque to the SPMD partitioner, so on a >1-device mesh this is the
  only way to actually distribute the kernel."""
  from jax.sharding import PartitionSpec

  n, k = cols.shape
  m = x.shape[0]
  p = int(mesh.devices.size)
  axes = tuple(mesh.axis_names)
  ax_arg = axes if len(axes) > 1 else axes[0]

  nq = -(-m // _LANES)
  xp = jnp.pad(x.astype(jnp.float32), (0, nq * _LANES - m))
  xt = xp.reshape(nq, _LANES).T                              # (128, nq)

  kp = -(-k // _LANES) * _LANES
  np_ = -(-n // (_STRIPS * p)) * (_STRIPS * p)
  if kp != k or np_ != n:
    cols = jnp.pad(cols, ((0, np_ - n), (0, kp - k)))
    vals = jnp.pad(vals, ((0, np_ - n), (0, kp - k)))
  rows_l = np_ // p

  def body(cols_l, vals_l, xt_full):
    return pl.pallas_call(
        functools.partial(_onehot_kernel, use_bf16=use_bf16),
        grid=(rows_l // _STRIPS, kp // _LANES),
        in_specs=[
            pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_LANES, nq), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_STRIPS, _LANES), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_l, kp), jnp.float32),
        interpret=interpret,
    )(cols_l, vals_l, xt_full)

  spec_r = PartitionSpec(ax_arg)
  fn = jax.shard_map(body, mesh=mesh,
                     in_specs=(spec_r, spec_r, PartitionSpec()),
                     out_specs=spec_r, check_vma=False)
  out = fn(cols, vals.astype(jnp.float32), xt)
  return jnp.sum(out[:n], axis=1).astype(vals.dtype)


# ---------------------------------------------------------------------------
# Windowed SpMV — scalar-prefetch gather (large unstructured matrices).
#
# The one-hot kernel above reads ALL of x per 128-entry strip (2n FLOP per
# nonzero), which dies at n ≈ 32K.  Here nonzeros are packed (host-side,
# once per matrix) into chunks of 8×128 that share one 1024-element window
# of x; the window index rides a scalar-prefetched array into the BlockSpec
# index_map (the Pallas embedding-gather pattern), so each grid step DMAs
# only its window and the gather/scatter one-hots are 1024-wide — O(window)
# instead of O(n) FLOPs per nonzero.  Output tiles (1024 y values) are
# revisited by consecutive steps (chunks are sorted by row-block) and
# zeroed on first visit via a prefetched init flag.
#
# Measured on v5e (24 nnz/row random, slope-timed):
#     n=16384   1.00 Gnnz/s f32 (hi/lo, relerr ~5e-6)
#     n=65536   1.24 Gnnz/s bf16 (relerr ~3e-3)
#     n=262144  0.93 Gnnz/s f32 / 1.14 bf16   (XLA gather: ~0.1)
# ≈10× the XLA fallback at any size past the one-hot kernel's 32K
# crossover, flat in n.  Bound analysis: the 1024-window one-hot costs
# ~4 dots × 8·128·128 FLOP per 128-nnz strip ≈ 8K FLOP/nnz, and every
# dot has M=8 output rows — 1/16th of the MXU's 128-row tile — capping
# effective throughput at ~8 TFLOP/s.  Deeper windows raise MXU
# utilization but cost proportionally more FLOPs/nnz (one-hot gather is
# linear in window size), so W=1024 with per-strip windows is near the
# optimum of cost/nnz = 4·W / fill(W).  A true in-kernel dynamic gather
# (tpu.dynamic_gather) would break the bound — it crashes this Mosaic
# toolchain (see above); retest on newer ones.
#
# Reference parity: spartan/sparse C++ SpMV kernels (SURVEY.md §2.2).

_WIN = 8 * _LANES       # x window / y tile: 1024 elements = one (8,128) tile


class WindowedELL:
  """Host-packed chunks for :func:`spmv_windowed` (one-time per matrix)."""

  def __init__(self, rb, win, init, cols_lo, rows_lo, vals, shape, nnz):
    self.rb, self.win, self.init = rb, win, init
    self.cols_lo, self.rows_lo, self.vals = cols_lo, rows_lo, vals
    self.shape, self.nnz = shape, nnz

  @property
  def n_chunks(self):
    return self.rb.shape[0]

  @property
  def fill(self):
    return self.nnz / max(self.n_chunks * _WIN, 1)


def pack_windowed(sp_csr) -> WindowedELL:
  """Pack a scipy CSR/COO matrix into window-grouped strips.

  Each 128-slot strip holds nonzeros sharing one 1024-element x window;
  8 strips (any windows, same 1024-row output block) form one grid step.
  Per-strip windows keep the fill factor high even when a (row-block,
  window) pair holds far fewer than 1024 nonzeros (very sparse rows)."""
  import numpy as np

  coo = sp_csr.tocoo()
  n, m = coo.shape
  r = coo.row.astype(np.int64)
  c = coo.col.astype(np.int64)
  v = coo.data.astype(np.float32)
  rb = r // _WIN
  win = c // _WIN
  order = np.lexsort((c, win, rb))
  r, c, v, rb, win = r[order], c[order], v[order], rb[order], win[order]

  n_rb = max(-(-n // _WIN), 1)
  # per row-block: list of 128-slot strips, each (window, nnz-range)
  strips_by_rb = {b: [] for b in range(n_rb)}
  if len(r):
    key = rb * (max(win.max(), 0) + 2) + win
    bounds = np.nonzero(np.diff(key))[0] + 1
    starts = np.concatenate([[0], bounds, [len(key)]])
    for a, b in zip(starts[:-1], starts[1:]):
      for off in range(int(a), int(b), _LANES):
        strips_by_rb[int(rb[a])].append(
            (int(win[a]), off, min(off + _LANES, int(b))))

  # assemble steps: 8 strips per step, all strips of one rb packed
  # consecutively (output-block revisits must be contiguous)
  steps = []                       # (rb, [(win, a, b)] * 8)
  for b in range(n_rb):
    lst = strips_by_rb[b] or [(0, 0, 0)]
    while len(lst) % _STRIPS:
      lst.append((0, 0, 0))
    for off in range(0, len(lst), _STRIPS):
      steps.append((b, lst[off:off + _STRIPS]))

  s_n = len(steps)
  cols_lo = np.zeros((s_n * _STRIPS, _LANES), np.int32)
  rows_lo = np.zeros((s_n * _STRIPS, _LANES), np.int32)
  vals = np.zeros((s_n * _STRIPS, _LANES), np.float32)
  rbs = np.zeros(s_n, np.int32)
  wins = np.zeros((s_n, _STRIPS), np.int32)
  init = np.zeros(s_n, np.int32)
  prev = -1
  for s_i, (rbv, strips) in enumerate(steps):
    rbs[s_i] = rbv
    init[s_i] = 1 if rbv != prev else 0
    prev = rbv
    for k, (winv, a, b) in enumerate(strips):
      row = s_i * _STRIPS + k
      wins[s_i, k] = winv
      if b > a:
        cols_lo[row, :b - a] = c[a:b] % _WIN
        rows_lo[row, :b - a] = r[a:b] % _WIN
        vals[row, :b - a] = v[a:b]
  return WindowedELL(rbs, wins, init, cols_lo, rows_lo, vals,
                     (n, m), int(coo.nnz))


def _windowed_kernel(rb_ref, win_ref, init_ref, cols_ref, rows_ref,
                     vals_ref, *refs, use_bf16=False):
  xt_refs, out_ref = refs[:_STRIPS], refs[_STRIPS]
  s = pl.program_id(0)

  @pl.when(init_ref[s] == 1)
  def _():
    out_ref[...] = jnp.zeros_like(out_ref)

  dims = (((1,), (0,)), ((), ()))    # contract the 128-lane dim (deep)
  dims_e = (((1,), (1,)), ((), ()))
  acc = jnp.zeros((_STRIPS, _LANES), jnp.float32)
  for strip in range(_STRIPS):
    xw = xt_refs[strip][...]                     # (8, 128) strip's window
    xw_hi = xw.astype(jnp.bfloat16)
    if not use_bf16:
      xw_lo = (xw - xw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    cl = cols_ref[strip:strip + 1, :]            # (1,128) col_lo in [0,1024)
    q = cl // _LANES
    rr = cl - q * _LANES
    # lane-gather first — the dot contracts over 128 lanes (MXU-deep;
    # contracting over the 8 sublanes instead starves the MXU, measured
    # 0.48 Gnnz/s): s1[u, e] = Σ_l xw[u, l] · (r_e == l) = xw[u, r_e]
    ohr = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
           == rr).astype(jnp.bfloat16)           # (128,128): r_e == l
    s1 = jax.lax.dot_general(xw_hi, ohr, dims,
                             preferred_element_type=jnp.float32)
    if not use_bf16:
      s1 = s1 + jax.lax.dot_general(xw_lo, ohr, dims,
                                    preferred_element_type=jnp.float32)
    # then an 8-deep sublane select on the VPU: u == q_e
    ohq = jax.lax.broadcasted_iota(jnp.int32, (_STRIPS, _LANES), 0) == q
    gathered = jnp.sum(jnp.where(ohq, s1, 0.0), axis=0, keepdims=True)
    p = vals_ref[strip:strip + 1, :].astype(jnp.float32) * gathered
    rl = rows_ref[strip:strip + 1, :]            # (1,128) row_lo in [0,1024)
    rv = rl // _LANES
    ru = rl - rv * _LANES
    a = jnp.where(jax.lax.broadcasted_iota(
        jnp.int32, (_STRIPS, _LANES), 0) == rv, p, 0.0)   # (8,128) f32
    m = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
         == ru).astype(jnp.bfloat16)             # (128,128): ru_e == u
    # products are f32: hi/lo-split them too so the scatter dot doesn't
    # round them to bf16
    a_hi = a.astype(jnp.bfloat16)
    acc = acc + jax.lax.dot_general(a_hi, m, dims_e,
                                    preferred_element_type=jnp.float32)
    if not use_bf16:
      a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
      acc = acc + jax.lax.dot_general(a_lo, m, dims_e,
                                      preferred_element_type=jnp.float32)
  out_ref[...] += acc


def windowed_spmv_traced(rb, win, init, cols_lo, rows_lo, vals, x, *,
                         shape, use_bf16: bool = False,
                         interpret: bool = False):
  """Traced windowed SpMV: all packed arrays are ordinary (leaf) inputs —
  usable inside an outer jit/expr region without closure constants."""
  n, m = shape
  s_n = rb.shape[0]
  mq = -(-m // _WIN) * _STRIPS                   # x block-rows, padded
  n_rb = max(-(-n // _WIN), 1)

  def _win_spec(k):
    # (8,128) window of x2d (mq,128): Mosaic requires the lane dim of a
    # block be 128-divisible, so windows live on the sublane axis.  The
    # window array is FLAT (S*8,): 2-D SMEM operands are padded to 128
    # lanes per row (a (S,8) int32 costs S*512 bytes and overflows the
    # ~1 MB SMEM near 2K steps; flat packs densely).
    return pl.BlockSpec((_STRIPS, _LANES),
                        lambda s, b, w, it, k=k: (w[s * _STRIPS + k], 0))

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(s_n,),
      in_specs=[
          pl.BlockSpec((_STRIPS, _LANES), lambda s, b, w, it: (s, 0)),
          pl.BlockSpec((_STRIPS, _LANES), lambda s, b, w, it: (s, 0)),
          pl.BlockSpec((_STRIPS, _LANES), lambda s, b, w, it: (s, 0)),
      ] + [_win_spec(k) for k in range(_STRIPS)],
      out_specs=pl.BlockSpec((_STRIPS, _LANES),
                             lambda s, b, w, it: (b[s], 0)),
  )
  call = pl.pallas_call(
      functools.partial(_windowed_kernel, use_bf16=use_bf16),
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n_rb * _STRIPS, _LANES), jnp.float32),
      interpret=interpret,
  )
  xp = jnp.pad(x.astype(jnp.float32), (0, mq * _LANES - m))
  x2d = xp.reshape(mq, _LANES)
  out = call(rb, win, init, cols_lo, rows_lo, vals, *([x2d] * _STRIPS))
  return out.reshape(-1)[:n].astype(x.dtype)


def make_spmv_windowed(packed: WindowedELL, interpret: bool = False,
                       use_bf16: bool = False):
  """Jitted ``y = A @ x`` closure over a :func:`pack_windowed` matrix
  (the chunk arrays are closure constants — device-resident after the
  first call; f32/bf16 x only).  ``use_bf16`` drops the hi/lo residual
  dots (~2x fewer MXU passes, relerr ~1e-3 instead of ~5e-6)."""
  rb, win, init = (jnp.asarray(packed.rb),
                   jnp.asarray(packed.win).reshape(-1),
                   jnp.asarray(packed.init))
  cols_lo, rows_lo, vals = (jnp.asarray(packed.cols_lo),
                            jnp.asarray(packed.rows_lo),
                            jnp.asarray(packed.vals))
  shape = packed.shape

  @jax.jit
  def spmv_fn(x):
    if x.dtype == jnp.float64:
      raise NotImplementedError("windowed SpMV kernel is f32/bf16 only")
    return windowed_spmv_traced(rb, win, init, cols_lo, rows_lo, vals, x,
                                shape=shape, use_bf16=use_bf16,
                                interpret=interpret)

  return spmv_fn


# ---------------------------------------------------------------------------
# Row-sharded windowed SpMV — the multi-chip form.
#
# The matrix's 1024-row output blocks are split contiguously across the
# mesh (owner-computes, like the reference's row-tiled dot); each device
# runs the windowed kernel on its own chunk list inside ``shard_map`` with
# ``x`` replicated, so the only collective is the implicit x broadcast.
# Per-device chunk lists are padded to a common length with no-op chunks.


class ShardedWindowedELL:
  """Per-shard stacked chunk arrays (leading dim = shard)."""

  def __init__(self, rb, win, init, cols_lo, rows_lo, vals, shape,
               n_shards, rb_per, nnz):
    self.rb, self.win, self.init = rb, win, init
    self.cols_lo, self.rows_lo, self.vals = cols_lo, rows_lo, vals
    self.shape, self.n_shards, self.rb_per = shape, n_shards, rb_per
    self.nnz = nnz

  @property
  def steps_per_shard(self):
    return self.rb.shape[1]


def pack_windowed_sharded(sp_csr, n_shards: int) -> ShardedWindowedELL:
  """Row-shard :func:`pack_windowed`: shard d owns row blocks
  [d·rb_per, (d+1)·rb_per)."""
  import numpy as np

  csr = sp_csr.tocsr()
  n, m = csr.shape
  n_rb = max(-(-n // _WIN), 1)
  rb_per = -(-n_rb // n_shards)
  rows_per = rb_per * _WIN
  packs = []
  for d in range(n_shards):
    r0 = min(d * rows_per, n)
    r1 = min(r0 + rows_per, n)
    sub = csr[r0:r1].copy()
    sub.resize((rows_per, m))
    packs.append(pack_windowed(sub))
  s_max = max(p.n_chunks for p in packs)

  def pad_steps(p):
    extra = s_max - p.n_chunks
    if extra == 0:
      return p
    # no-op chunks appended at the tail: target the last local block
    # (keeps rb monotone), zero vals, init=0
    rb = np.concatenate([p.rb, np.full(extra, rb_per - 1, np.int32)])
    win = np.concatenate([p.win, np.zeros((extra, _STRIPS), np.int32)])
    init = np.concatenate([p.init, np.zeros(extra, np.int32)])
    z = lambda a: np.concatenate(  # noqa: E731
        [a, np.zeros((extra * _STRIPS, _LANES), a.dtype)])
    return WindowedELL(rb, win, init, z(p.cols_lo), z(p.rows_lo),
                       z(p.vals), p.shape, p.nnz)

  packs = [pad_steps(p) for p in packs]
  stack = lambda f: np.stack([f(p) for p in packs])  # noqa: E731
  return ShardedWindowedELL(
      stack(lambda p: p.rb), stack(lambda p: p.win.reshape(-1)),
      stack(lambda p: p.init), stack(lambda p: p.cols_lo),
      stack(lambda p: p.rows_lo), stack(lambda p: p.vals),
      (n, m), n_shards, rb_per, int(csr.nnz))


def sharded_windowed_spmv_traced(rb, win, init, cols_lo, rows_lo, vals, x,
                                 *, shape, mesh, use_bf16: bool = False,
                                 interpret: bool = False):
  """y = A @ x with the chunk arrays row-sharded over all mesh axes
  (leading dim = shard) and x replicated; per-device pallas calls inside
  shard_map.  Falls back to :func:`windowed_spmv_traced` semantics when
  the mesh is a single device."""
  from jax.sharding import PartitionSpec

  n, m = shape
  p = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
  assert rb.shape[0] == p, (rb.shape, p)
  s_max = rb.shape[1]
  rb_per = rb_per_of(n, p)
  mq = -(-m // _WIN) * _STRIPS
  axes = tuple(mesh.axis_names)
  ax_arg = axes if len(axes) > 1 else axes[0]
  xp = jnp.pad(x.astype(jnp.float32), (0, mq * _LANES - m))
  x2d = xp.reshape(mq, _LANES)

  def body(rb_l, win_l, init_l, cols_l, rows_l, vals_l, x_full):
    rb_f = rb_l.reshape(-1)
    win_f = win_l.reshape(-1)
    init_f = init_l.reshape(-1)
    cols_f = cols_l.reshape(s_max * _STRIPS, _LANES)
    rows_f = rows_l.reshape(s_max * _STRIPS, _LANES)
    vals_f = vals_l.reshape(s_max * _STRIPS, _LANES)

    def _win_spec(k):
      return pl.BlockSpec((_STRIPS, _LANES),
                          lambda s, b, w, it, k=k: (w[s * _STRIPS + k], 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_max,),
        in_specs=[
            pl.BlockSpec((_STRIPS, _LANES), lambda s, b, w, it: (s, 0)),
            pl.BlockSpec((_STRIPS, _LANES), lambda s, b, w, it: (s, 0)),
            pl.BlockSpec((_STRIPS, _LANES), lambda s, b, w, it: (s, 0)),
        ] + [_win_spec(k) for k in range(_STRIPS)],
        out_specs=pl.BlockSpec((_STRIPS, _LANES),
                               lambda s, b, w, it: (b[s], 0)),
    )
    out = pl.pallas_call(
        functools.partial(_windowed_kernel, use_bf16=use_bf16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rb_per * _STRIPS, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(rb_f, win_f, init_f, cols_f, rows_f, vals_f, *([x_full] * _STRIPS))
    return out

  spec_s = PartitionSpec(ax_arg)
  fn = jax.shard_map(
      body, mesh=mesh,
      in_specs=(spec_s, spec_s, spec_s, spec_s, spec_s, spec_s,
                PartitionSpec()),
      out_specs=spec_s,
      # pallas_call's out_shape has no vma annotation; skip the check
      check_vma=False)
  out = fn(rb, win, init, cols_lo, rows_lo, vals, x2d)
  return out.reshape(-1)[:n].astype(x.dtype)


def rb_per_of(n: int, n_shards: int) -> int:
  n_rb = max(-(-n // _WIN), 1)
  return -(-n_rb // n_shards)


def unshard_windowed(rb, win, init, cols_lo, rows_lo, vals, n: int,
                     n_shards: int):
  """Flatten sharded-stacked chunk arrays back to the global (unsharded)
  windowed form — pure traced jnp ops, so a ``winsh`` node built under one
  mesh still evaluates correctly if the mesh later changes size.

  Local row-block indices become global (shard d's block b → d·rb_per+b);
  chunk order stays grouped by shard, so every output block's revisits
  remain contiguous and the per-shard init flags stay valid (each shard's
  first chunk for a block carries init=1).  Returns the flat arrays plus
  the padded global row count to pass as ``shape[0]``."""
  p, s = rb.shape
  rb_per = rb_per_of(n, n_shards)
  rb_g = (rb + jnp.arange(p, dtype=rb.dtype)[:, None] * rb_per).reshape(-1)
  return (rb_g, win.reshape(-1), init.reshape(-1),
          cols_lo.reshape(p * s * _STRIPS, _LANES),
          rows_lo.reshape(p * s * _STRIPS, _LANES),
          vals.reshape(p * s * _STRIPS, _LANES), p * rb_per * _WIN)
