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
Past n = 32768 callers switch to the windowed kernels below, whose
gather stage now rides ``tpu.dynamic_gather`` — the r2-late toolchain
compiles (8,128) and (128,128)-axis-1 dynamic gathers ((128,128) axis-0
still HTTP-500s the remote Mosaic helper, which blocks using it for
THIS kernel's full-x gather).

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


def _onehot_pallas_call(cols, vals, xt, *, nq: int, kp: int,
                        interpret: bool, use_bf16: bool):
  """The one-hot kernel invocation shared by the single-device and
  shard_map forms: cols/vals (rows, kp) with rows % 8 == 0, xt (128, nq)
  — one source of truth for the specs/grid."""
  rows = cols.shape[0]
  return pl.pallas_call(
      functools.partial(_onehot_kernel, use_bf16=use_bf16),
      grid=(rows // _STRIPS, kp // _LANES),
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
      out_shape=jax.ShapeDtypeStruct((rows, kp), jnp.float32),
      interpret=interpret,
  )(cols, vals, xt)


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

  out = _onehot_pallas_call(cols, vals, xt, nq=nq, kp=kp,
                            interpret=interpret, use_bf16=use_bf16)
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

  def body(cols_l, vals_l, xt_full):
    return _onehot_pallas_call(cols_l, vals_l, xt_full, nq=nq, kp=kp,
                               interpret=interpret, use_bf16=use_bf16)

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
# Measured on v5e (24 nnz/row random, slope-timed), r2-late after the
# dynamic-gather retest succeeded for (8,128) shapes:
#     n=65536  dg-hybrid  1.44 Gnnz/s f32 (relerr ~3e-6) / 1.61 bf16
#              unique     1.23 Gnnz/s exact f32 (relerr ~2e-7)
#              one-hot    1.06 f32 / 1.27 bf16      (XLA gather: ~0.1)
# ≈14× the XLA fallback, flat in n.  Three gather/scatter stages exist:
#   * dg-hybrid (default): gather = 2 in-kernel dynamic gathers (exact),
#     scatter = bf16 hi/lo one-hot MXU dots.  +36 % over pure one-hot.
#   * one-hot (_USE_DYNAMIC_GATHER=False): all 4 stages as bf16 one-hot
#     dots — the fallback if a Mosaic toolchain regresses on (8,128)
#     dynamic gathers (full (128,128) axis-0 still HTTP-500s today).
#   * unique-rows pack (pack_windowed_unique, opt-in): scatter =
#     _INV_LAYERS dynamic gathers through host-built int8 inverse maps →
#     zero MXU dots, exact f32 end-to-end (relerr ~2e-7).  Rotation
#     (Latin-square) strip assignment + 2 scatter layers keep fill at
#     0.76-0.93 across scales; measured 1.47 Gnnz/s at n=64K (≈ the
#     hybrid, but exact).  Cost: the dense per-strip inverse maps expand
#     memory ~24 B/nnz at fill 0.75 — use when exactness matters.
# The scatter dots are now the dg-hybrid bound: ~4K FLOP/nnz at M=8
# output rows (1/16 MXU tile).  NOTE make_spmv_windowed closes over the
# packed arrays as constants — past ~6M nnz the remote compile request
# exceeds the helper's body limit (HTTP 413); the SpMVExpr path passes
# them as leaf inputs and does not hit this.
#
# Reference parity: spartan/sparse C++ SpMV kernels (SURVEY.md §2.2).

_WIN = 8 * _LANES       # x window / y tile: 1024 elements = one (8,128) tile

# Gather stage implementation: tpu.dynamic_gather (exact f32, fewer MXU
# dots) vs the one-hot bf16 dot formulation.  Flip to False if a Mosaic
# toolchain regresses on (8,128) dynamic gathers (HTTP-500 from the remote
# compile helper — see the r2 retest notes in _windowed_kernel).
_USE_DYNAMIC_GATHER = True

# Scatter layers in the unique-rows pack: a strip may hold each
# destination row up to L times (one inverse map per layer; the kernel
# does L inv-gathers per strip).  L=2 keeps small groups in one strip
# when a row is duplicated once — the common case at large n.
_INV_LAYERS = 2


def pack_windowed_unique(sp_csr):
  """Pack with UNIQUE destination rows per strip → the all-VPU kernel.

  Same window-grouped layout as :func:`pack_windowed`, plus two pack-time
  constraints that turn the scatter stage into one dynamic gather:

  * within a strip no two entries share a destination row (duplicates of
    a (row-block, window, row) triple go to consecutive strips), so the
    scatter is a permutation;
  * slot 127 of every strip is reserved as a zero pad, so the host-built
    inverse map ``inv[u, l] = slot writing y-position u·128+l`` can point
    unused positions at slot 127 instead of needing a mask.

  The kernel then runs zero MXU dots: gather = 2 dynamic gathers,
  scatter = 1 dynamic gather through ``inv`` — exact f32 end to end.
  Returns a :class:`WindowedELL` with ``inv`` set ((steps·64, 128) int32:
  8 strips × 8 sublane rows per step).
  """
  import numpy as np

  coo = sp_csr.tocoo()
  n, m = coo.shape
  r = coo.row.astype(np.int64)
  c = coo.col.astype(np.int64)
  v = coo.data.astype(np.float32)
  rb = r // _WIN
  win = c // _WIN
  r_loc = (r % _WIN).astype(np.int64)
  c_loc = (c % _WIN).astype(np.int64)
  n_rb = max(-(-n // _WIN), 1)

  def _cumcount(new_flags):
    starts = np.nonzero(new_flags)[0]
    return np.arange(len(new_flags)) - np.repeat(starts, np.diff(
        np.concatenate([starts, [len(new_flags)]])))

  if len(r):
    # Rotation (Latin-square) strip assignment: within a (rb, win) group
    # with unique-row ranks pos_r and duplicate indices occ j, entry
    # (r, j) goes to strip (pos_r + j) mod C with C = max(⌈N/120⌉,
    # max multiplicity).  Same row → different j → different strip, so
    # uniqueness holds while strips stay ~N/C ≈ 120 full — ~0.85 fill vs
    # ~0.5 for the naive per-occ-level strips (occ≥1 levels are tiny).
    # The rare strips the rotation overloads past the 127-slot cap spill
    # into per-occ-level overflow strips (the naive scheme, applied to
    # the spilled entries only).
    o1 = np.lexsort((c_loc, r_loc, win, rb))
    rb, win, r_loc, c_loc, v = (a[o1] for a in (rb, win, r_loc, c_loc, v))
    key_g = rb * (win.max() + 1) + win            # group key (sorted)
    new_g = np.concatenate([[True], np.diff(key_g) != 0])
    g_starts = np.nonzero(new_g)[0]
    g_len = np.diff(np.concatenate([g_starts, [len(r)]]))
    idx_in_g = _cumcount(new_g)
    new_row = new_g | np.concatenate([[True], np.diff(r_loc) != 0])
    occ = _cumcount(new_row)                      # j within (group, row)
    urow = np.cumsum(new_row) - 1
    pos_r = urow - urow[g_starts][np.repeat(np.arange(len(g_starts)),
                                            g_len)]
    maxmult = np.maximum.reduceat(occ, g_starts) + 1
    # with _INV_LAYERS scatter layers a strip holds each row up to
    # _INV_LAYERS times (duplicate j goes to layer j%L of strip
    # (pos_r + j//L) mod C), so C needs only ⌈maxmult/L⌉ rotation slots —
    # without the layers, small groups with one duplicated row would pay
    # a whole extra near-empty strip (fill 0.35 measured at n=256K)
    C = np.maximum(-(-g_len // 120), -(-maxmult // _INV_LAYERS))
    C_e = np.repeat(C, g_len)
    t = (pos_r + occ // _INV_LAYERS) % C_e        # strip within group
    layer = occ % _INV_LAYERS

    wrap = occ >= _INV_LAYERS * C_e              # multiplicity > L·C
    # slots within (group, t); spill past the 127-entry cap
    o2 = np.lexsort((idx_in_g, t, key_g))
    rb, win, r_loc, c_loc, v, t, key_g, layer, wrap = (
        a[o2] for a in (rb, win, r_loc, c_loc, v, t, key_g, layer, wrap))
    new_s = np.concatenate(
        [[True], (np.diff(key_g) != 0) | (np.diff(t) != 0)])
    slot = _cumcount(new_s)
    of = (slot >= _LANES - 1) | wrap
    n_of = int(of.sum())
    if n_of:
      # overflow entries: per-occ-level strips among themselves
      ro, wo, rlo = rb[of], win[of], r_loc[of]
      o3 = np.lexsort((rlo, wo, ro))
      kg_o = (ro * (win.max() + 1) + wo)[o3]
      rl_o = rlo[o3]
      new_row_o = np.concatenate(
          [[True], (np.diff(kg_o) != 0) | (np.diff(rl_o) != 0)])
      occ_o = _cumcount(new_row_o)
      o4 = np.lexsort((rl_o, occ_o, kg_o))
      kg2 = kg_o[o4] * (occ_o.max() + 1) + occ_o[o4]
      new_s_o = np.concatenate([[True], np.diff(kg2) != 0])
      pos_o = _cumcount(new_s_o)
      chunk_o = pos_o // (_LANES - 1)
      slot_o = pos_o % (_LANES - 1)
      # map back to the of-subset order, then tag strips:
      back = np.empty(n_of, np.int64)
      back[o4] = np.arange(n_of)
      inv_o3 = np.empty(n_of, np.int64)
      inv_o3[o3] = np.arange(n_of)
      # composite per-entry strip tag; overflow strips sort after main
      # ones within the group (bit 1), keyed by (occ level, chunk)
      tag_of = (occ_o[o4] * (chunk_o.max() + 1) + chunk_o)
      tag_full = tag_of[back][inv_o3]             # in of-subset order
      slot_full = slot_o[back][inv_o3]
      t = t.copy()
      slot = slot.copy()
      layer = layer.copy()
      big = int(t.max()) + 1
      t[of] = big + tag_full                      # distinct key space
      slot[of] = slot_full
      layer[of] = 0                               # overflow: single layer
    # final strips: unique (group, t) in order (group-major = rb-major)
    skey = key_g * (int(t.max()) + 2) + t
    o5 = np.lexsort((slot, skey))
    rb, win, r_loc, c_loc, v, skey, slot, layer = (
        a[o5] for a in (rb, win, r_loc, c_loc, v, skey, slot, layer))
    new_strip = np.concatenate([[True], np.diff(skey) != 0])
    strip_id = np.cumsum(new_strip) - 1
    n_strips = int(strip_id[-1]) + 1
    strip_rb = rb[new_strip]
    strip_win = win[new_strip].astype(np.int32)
  else:
    n_strips = 0
    slot = strip_id = layer = np.zeros(0, np.int64)
    strip_rb = np.zeros(0, np.int64)
    strip_win = np.zeros(0, np.int32)

  cols_s = np.zeros((n_strips, _LANES), np.int32)
  vals_s = np.zeros((n_strips, _LANES), np.float32)
  rows_s = np.zeros((n_strips, _LANES), np.int32)
  inv_s = np.full((n_strips, _INV_LAYERS, _WIN), _LANES - 1, np.int8)
  if n_strips:
    cols_s[strip_id, slot] = c_loc
    vals_s[strip_id, slot] = v
    rows_s[strip_id, slot] = r_loc
    inv_s[strip_id, layer, r_loc] = slot

  # assemble steps: per row-block, its strips padded to a multiple of 8
  # (no-op pad strips: window 0, all slots pad, inv all-127) — fully
  # vectorized: strips are already ordered by rb, so each strip's final
  # (step, lane-within-step) position is an offset computation
  counts = np.zeros(n_rb, np.int64)
  if n_strips:
    u, cnt = np.unique(strip_rb, return_counts=True)
    counts[u] = cnt
  padded = np.maximum(-(-counts // _STRIPS), 1) * _STRIPS
  steps_per_rb = padded // _STRIPS
  step_off = np.concatenate([[0], np.cumsum(steps_per_rb)[:-1]])
  s_n = int(steps_per_rb.sum())
  cols_lo = np.zeros((s_n * _STRIPS, _LANES), np.int32)
  rows_lo = np.zeros((s_n * _STRIPS, _LANES), np.int32)
  vals = np.zeros((s_n * _STRIPS, _LANES), np.float32)
  # int8: slots are < 128, and the dense (1024-position) maps dominate
  # the pack's memory footprint — i8 quarters it (widened in-kernel)
  inv = np.full((s_n * _STRIPS, _INV_LAYERS, _STRIPS, _LANES),
                _LANES - 1, np.int8)
  wins = np.zeros((s_n, _STRIPS), np.int32)
  rbs = np.repeat(np.arange(n_rb, dtype=np.int32),
                  steps_per_rb.astype(np.int64))
  init = np.zeros(s_n, np.int32)
  init[step_off] = 1
  if n_strips:
    rb_first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    gi = np.arange(n_strips) - rb_first[strip_rb]          # idx within rb
    step_of = step_off[strip_rb] + gi // _STRIPS
    lane_of = gi % _STRIPS
    dest = step_of * _STRIPS + lane_of
    cols_lo[dest] = cols_s
    rows_lo[dest] = rows_s
    vals[dest] = vals_s
    inv[dest] = inv_s.reshape(n_strips, _INV_LAYERS, _STRIPS, _LANES)
    wins[step_of, lane_of] = strip_win
  # kernel layout: per step a (L·64, 128) block, rows l·64 + j·8 + u
  # (layer-major, then strip, then sublane)
  inv_k = inv.reshape(s_n, _STRIPS, _INV_LAYERS, _STRIPS, _LANES)
  inv_k = np.ascontiguousarray(inv_k.transpose(0, 2, 1, 3, 4))
  return WindowedELL(
      rbs, wins, init, cols_lo, rows_lo, vals, (n, m), int(coo.nnz),
      inv=inv_k.reshape(s_n * _INV_LAYERS * _STRIPS * _STRIPS, _LANES))


class WindowedELL:
  """Host-packed chunks for :func:`spmv_windowed` (one-time per matrix)."""

  def __init__(self, rb, win, init, cols_lo, rows_lo, vals, shape, nnz,
               inv=None):
    self.rb, self.win, self.init = rb, win, init
    self.cols_lo, self.rows_lo, self.vals = cols_lo, rows_lo, vals
    self.shape, self.nnz = shape, nnz
    # inv (steps·L·64, 128) int8: per-strip inverse scatter maps (unique-
    # rows pack, pack_windowed_unique) or None (classic pack)
    self.inv = inv
    self._dev = None

  def device_arrays(self):
    """Chunk arrays as device arrays, uploaded once and memoized — eager
    per-call ``jnp.asarray`` would re-push the multi-MB pack through the
    tunnel on every SpMV.  Returns the classic 6-tuple (rb, win-flat,
    init, cols_lo, rows_lo, vals); for the unique pack use ``.inv`` with
    :func:`windowed_unique_spmv_traced` separately."""
    if self._dev is None:
      self._dev = (jnp.asarray(self.rb), jnp.asarray(self.win).reshape(-1),
                   jnp.asarray(self.init), jnp.asarray(self.cols_lo),
                   jnp.asarray(self.rows_lo), jnp.asarray(self.vals))
    return self._dev

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
  # int32 temporaries where the values fit: pack runs once per FRESH
  # matrix, so it is first-touch page-fault bound on microVM hosts and
  # temp bytes ≈ wall time (measured 50× on the ELL pack)
  idt = np.int32 if (coo.nnz < 2**31 and max(n, m) < 2**31) else np.int64
  r = coo.row.astype(idt)
  c = coo.col.astype(idt)
  v = coo.data.astype(np.float32)
  rb = r // _WIN
  win = c // _WIN
  # one composite-key argsort instead of a 3-key lexsort (3 stable sort
  # passes + 3× the temp traffic); key = (rb, win, c) packed into int64
  # when the widths fit (they do up to ~2^63 total key space)
  n_rb_k = int(rb.max()) + 1 if len(rb) else 1
  n_win_k = int(win.max()) + 1 if len(win) else 1
  if len(r) and float(n_rb_k) * n_win_k * m < 2**62:
    key = ((rb.astype(np.int64) * n_win_k + win) * m + c)
    order = np.argsort(key, kind="stable")
  else:
    order = np.lexsort((c, win, rb))
  r, c, v, rb, win = r[order], c[order], v[order], rb[order], win[order]

  n_rb = max(-(-n // _WIN), 1)
  # vectorized strip/step assembly (entries sorted by (rb, win, c)):
  # strip = 128-entry chunk within a (rb, win) run; steps = per-rb strip
  # lists padded to a multiple of 8 (output-block revisits contiguous)
  if len(r):
    key_g = rb.astype(np.int64) * (max(int(win.max()), 0) + 2) + win
    new_g = np.concatenate([[True], np.diff(key_g) != 0])
    g_starts = np.nonzero(new_g)[0].astype(idt)
    pos = np.arange(len(r), dtype=idt) - np.repeat(g_starts, np.diff(
        np.concatenate([g_starts, np.asarray([len(r)], idt)])))
    slot = pos % _LANES
    new_strip = new_g | (slot == 0)
    strip_id = np.cumsum(new_strip, dtype=idt) - 1
    n_strips = int(strip_id[-1]) + 1
    strip_rb = rb[new_strip]
    strip_win = win[new_strip].astype(np.int32)
  else:
    n_strips = 0
    slot = strip_id = np.zeros(0, np.int64)
    strip_rb = np.zeros(0, np.int64)
    strip_win = np.zeros(0, np.int32)

  counts = np.zeros(n_rb, np.int64)
  if n_strips:
    u, cnt = np.unique(strip_rb, return_counts=True)
    counts[u] = cnt
  steps_per_rb = np.maximum(-(-counts // _STRIPS), 1)
  step_off = np.concatenate([[0], np.cumsum(steps_per_rb)[:-1]])
  s_n = int(steps_per_rb.sum())
  cols_lo = np.zeros((s_n * _STRIPS, _LANES), np.int32)
  rows_lo = np.zeros((s_n * _STRIPS, _LANES), np.int32)
  vals = np.zeros((s_n * _STRIPS, _LANES), np.float32)
  wins = np.zeros((s_n, _STRIPS), np.int32)
  rbs = np.repeat(np.arange(n_rb, dtype=np.int32),
                  steps_per_rb.astype(np.int64))
  init = np.zeros(s_n, np.int32)
  init[step_off] = 1
  if n_strips:
    rb_first = np.concatenate([[0], np.cumsum(counts)[:-1]])
    gi = np.arange(n_strips) - rb_first[strip_rb]
    dest_strip = (step_off[strip_rb] + gi // _STRIPS) * _STRIPS + (
        gi % _STRIPS)
    wins[step_off[strip_rb] + gi // _STRIPS, gi % _STRIPS] = strip_win
    row_of_entry = dest_strip[strip_id]
    cols_lo[row_of_entry, slot] = (c % _WIN).astype(np.int32)
    rows_lo[row_of_entry, slot] = (r % _WIN).astype(np.int32)
    vals[row_of_entry, slot] = v
  return WindowedELL(rbs, wins, init, cols_lo, rows_lo, vals,
                     (n, m), int(coo.nnz))


def _windowed_kernel(rb_ref, win_ref, init_ref, cols_ref, rows_ref,
                     vals_ref, *refs, use_bf16=False, has_acc=False):
  if has_acc:
    xt_refs = refs[:_STRIPS]
    acc_ref, out_ref = refs[_STRIPS], refs[_STRIPS + 1]
  else:
    xt_refs, out_ref = refs[:_STRIPS], refs[_STRIPS]
  s = pl.program_id(0)

  if has_acc:
    # chunked multi-launch mode: a step that CONTINUES a row block begun
    # in an earlier launch (launch-first visit, init==0) seeds the block
    # from the accumulator operand (the previous launch's output buffer,
    # aliased) instead of relying on revisit-persistent VMEM
    prev_rb = rb_ref[jnp.maximum(s - 1, 0)]
    launch_first = jnp.logical_or(s == 0, rb_ref[s] != prev_rb)

    @pl.when(jnp.logical_and(launch_first, init_ref[s] == 0))
    def _():
      out_ref[...] = acc_ref[...]

  @pl.when(init_ref[s] == 1)
  def _():
    out_ref[...] = jnp.zeros_like(out_ref)

  dims = (((1,), (0,)), ((), ()))    # contract the 128-lane dim (deep)
  dims_e = (((1,), (1,)), ((), ()))
  acc = jnp.zeros((_STRIPS, _LANES), jnp.float32)
  for strip in range(_STRIPS):
    xw = xt_refs[strip][...]                     # (8, 128) strip's window
    cl = cols_ref[strip:strip + 1, :]            # (1,128) col_lo in [0,1024)
    q = cl // _LANES
    rr = cl - q * _LANES
    if _USE_DYNAMIC_GATHER:
      # two-step EXACT f32 gather via tpu.dynamic_gather
      # (take_along_axis):  t[u,e] = xw[u, r_e]  (lane shuffle, axis=1),
      # g[u,e] = t[q_e, e]  (sublane shuffle, axis=0) — replaces the bf16
      # one-hot MXU dots: no rounding, and half the dots per strip are
      # gone.  (8,128) dynamic gathers compile on this toolchain (r2-late
      # retest); full (128,128) axis-0 still HTTP-500s the remote Mosaic
      # helper — don't widen these shapes.
      t = jnp.take_along_axis(
          xw, jnp.broadcast_to(rr, (_STRIPS, _LANES)), axis=1)
      g = jnp.take_along_axis(
          t, jnp.broadcast_to(q, (_STRIPS, _LANES)), axis=0)
      gathered = g[0:1, :]                       # every row is the q-select
    else:
      # one-hot MXU formulation (pre-dynamic-gather toolchains).
      # lane-gather first — the dot contracts over 128 lanes (MXU-deep;
      # contracting over the 8 sublanes instead starves the MXU, measured
      # 0.48 Gnnz/s): s1[u, e] = Σ_l xw[u, l] · (r_e == l) = xw[u, r_e]
      xw_hi = xw.astype(jnp.bfloat16)
      ohr = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
             == rr).astype(jnp.bfloat16)         # (128,128): r_e == l
      s1 = jax.lax.dot_general(xw_hi, ohr, dims,
                               preferred_element_type=jnp.float32)
      if not use_bf16:
        xw_lo = (xw - xw_hi.astype(jnp.float32)).astype(jnp.bfloat16)
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


def _windowed_grid_spec(s_n: int, lead_blocks, with_acc: bool = False):
  """PrefetchScalarGridSpec shared by every windowed kernel variant —
  keep the hard-won Mosaic constraints in ONE place:

  * window blocks are (8,128) slices of x2d (mq,128) selected on the
    SUBLANE axis via the prefetched flat window array (the lane dim of a
    block must be 128-divisible, so windows cannot live on lanes);
  * the window array is FLAT (S*8,): 2-D SMEM operands pad each row to
    128 lanes (a (S,8) int32 costs S*512 B and overflows ~1 MB SMEM near
    2K steps);
  * output blocks revisit by prefetched row-block index b[s] (chunks are
    rb-contiguous; first visit zeroes via the init flag).

  ``lead_blocks``: per-operand block shapes for the non-window inputs
  (after the 3 scalar-prefetch operands rb/win/init).  ``with_acc``
  appends an accumulator operand mirroring the out spec (chunked
  multi-launch mode)."""

  def _win_spec(k):
    return pl.BlockSpec((_STRIPS, _LANES),
                        lambda s, b, w, it, k=k: (w[s * _STRIPS + k], 0))

  def _lead_spec(shape):
    return pl.BlockSpec(shape, lambda s, b, w, it: (s, 0))

  out_spec = pl.BlockSpec((_STRIPS, _LANES), lambda s, b, w, it: (b[s], 0))
  return pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(s_n,),
      in_specs=[_lead_spec(shape) for shape in lead_blocks]
      + [_win_spec(k) for k in range(_STRIPS)]
      + ([out_spec] if with_acc else []),
      out_specs=out_spec,
  )


# Scalar-prefetch SMEM budget: rb+init cost 4 B/step each and the flat
# window array 32 B/step; Mosaic's SMEM is ~1 MB, so past ~26K steps the
# prefetch operands alone blow it ("Allocation would exceed memory
# (size=1048576) ... space=smem", measured r4s2 at 132K steps / 17.8M
# nnz).  Launches are therefore chunked at this many steps; boundaries
# are FIXED-SIZE (shape-only — the emitted program must not depend on
# pack VALUES, or structurally-identical DAGs would alias in the
# evaluator cache), and an accumulator operand aliased to the output
# carries partial row blocks across launches.
_MAX_PREFETCH_STEPS = 16384


def windowed_spmv_traced(rb, win, init, cols_lo, rows_lo, vals, x, *,
                         shape, use_bf16: bool = False,
                         interpret: bool = False):
  """Traced windowed SpMV: all packed arrays are ordinary (leaf) inputs —
  usable inside an outer jit/expr region without closure constants.
  Packs beyond the scalar-prefetch SMEM budget run as chained chunked
  launches (the interpreter honors the acc aliasing too, so the chunked
  path is CPU-testable)."""
  n, m = shape
  s_n = rb.shape[0]
  mq = -(-m // _WIN) * _STRIPS                   # x block-rows, padded
  n_rb = max(-(-n // _WIN), 1)
  xp = jnp.pad(x.astype(jnp.float32), (0, mq * _LANES - m))
  x2d = xp.reshape(mq, _LANES)
  n_chunks = -(-s_n // _MAX_PREFETCH_STEPS)
  if n_chunks <= 1:
    grid_spec = _windowed_grid_spec(
        s_n, [(_STRIPS, _LANES)] * 3)
    call = pl.pallas_call(
        functools.partial(_windowed_kernel, use_bf16=use_bf16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rb * _STRIPS, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )
    out = call(rb, win, init, cols_lo, rows_lo, vals, *([x2d] * _STRIPS))
    return out.reshape(-1)[:n].astype(x.dtype)
  out = jnp.zeros((n_rb * _STRIPS, _LANES), jnp.float32)
  for ci in range(n_chunks):
    lo = ci * _MAX_PREFETCH_STEPS
    hi = min(s_n, lo + _MAX_PREFETCH_STEPS)
    grid_spec = _windowed_grid_spec(
        hi - lo, [(_STRIPS, _LANES)] * 3, with_acc=True)
    call = pl.pallas_call(
        functools.partial(_windowed_kernel, use_bf16=use_bf16,
                          has_acc=True),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_rb * _STRIPS, _LANES),
                                       jnp.float32),
        input_output_aliases={14: 0},   # acc operand donates to out
        # (alias indices COUNT the 3 scalar-prefetch args: 3 prefetch +
        # cols/rows/vals + 8 windows -> acc is input 14)
        interpret=interpret,
    )
    out = call(rb[lo:hi], win[lo * _STRIPS:hi * _STRIPS], init[lo:hi],
               cols_lo[lo * _STRIPS:hi * _STRIPS],
               rows_lo[lo * _STRIPS:hi * _STRIPS],
               vals[lo * _STRIPS:hi * _STRIPS], *([x2d] * _STRIPS), out)
  return out.reshape(-1)[:n].astype(x.dtype)


def _windowed_unique_kernel(rb_ref, win_ref, init_ref, cols_ref, vals_ref,
                            inv_ref, *refs):
  """All-VPU windowed SpMV over the unique-rows pack: zero MXU dots.

  Per strip: two dynamic gathers read the window (exact f32), one dynamic
  gather through the host-built inverse map plays the scatter (each strip
  writes each output position at most once; unused positions read the
  reserved zero slot 127)."""
  xt_refs, out_ref = refs[:_STRIPS], refs[_STRIPS]
  s = pl.program_id(0)

  @pl.when(init_ref[s] == 1)
  def _():
    out_ref[...] = jnp.zeros_like(out_ref)

  acc = jnp.zeros((_STRIPS, _LANES), jnp.float32)
  for strip in range(_STRIPS):
    xw = xt_refs[strip][...]                     # (8, 128) strip's window
    cl = cols_ref[strip:strip + 1, :]            # (1,128) col_lo in [0,1024)
    q = cl // _LANES
    rr = cl - q * _LANES
    t = jnp.take_along_axis(
        xw, jnp.broadcast_to(rr, (_STRIPS, _LANES)), axis=1)
    g = jnp.take_along_axis(
        t, jnp.broadcast_to(q, (_STRIPS, _LANES)), axis=0)
    p = vals_ref[strip:strip + 1, :].astype(jnp.float32) * g[0:1, :]
    pb = jnp.broadcast_to(p, (_STRIPS, _LANES))
    for lay in range(_INV_LAYERS):
      base = lay * _STRIPS * _STRIPS + strip * _STRIPS
      inv_s = inv_ref[base:base + _STRIPS, :].astype(jnp.int32)  # (8,128) i8→i32
      acc = acc + jnp.take_along_axis(pb, inv_s, axis=1)
  out_ref[...] += acc


def windowed_unique_spmv_traced(rb, win, init, cols_lo, vals, inv, x, *,
                                shape, interpret: bool = False):
  """Traced all-VPU windowed SpMV (unique-rows pack; exact f32)."""
  n, m = shape
  s_n = rb.shape[0]
  if s_n > _MAX_PREFETCH_STEPS and not interpret:
    raise ValueError(
        f"unique-rows pack has {s_n} grid steps > the scalar-prefetch "
        f"SMEM budget ({_MAX_PREFETCH_STEPS}); use the default hybrid "
        "windowed kernel (chunked launches) for matrices this large")
  mq = -(-m // _WIN) * _STRIPS
  n_rb = max(-(-n // _WIN), 1)

  grid_spec = _windowed_grid_spec(
      s_n, [(_STRIPS, _LANES), (_STRIPS, _LANES),
            (_INV_LAYERS * _STRIPS * _STRIPS, _LANES)])
  call = pl.pallas_call(
      _windowed_unique_kernel,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((n_rb * _STRIPS, _LANES), jnp.float32),
      interpret=interpret,
  )
  xp = jnp.pad(x.astype(jnp.float32), (0, mq * _LANES - m))
  x2d = xp.reshape(mq, _LANES)
  out = call(rb, win, init, cols_lo, vals, inv, *([x2d] * _STRIPS))
  return out.reshape(-1)[:n].astype(x.dtype)


def make_spmv_windowed(packed: WindowedELL, interpret: bool = False,
                       use_bf16: bool = False):
  """Jitted ``y = A @ x`` closure over a packed matrix (the chunk arrays
  are closure constants — device-resident after the first call; f32/bf16
  x only).  A :func:`pack_windowed_unique` pack (``packed.inv`` set)
  routes to the all-VPU exact kernel (``use_bf16`` is moot there); the
  classic pack uses the one-hot/dynamic-gather hybrid where ``use_bf16``
  drops the hi/lo residual scatter dots (relerr ~1e-3 instead of
  ~3e-6)."""
  rb, win, init = (jnp.asarray(packed.rb),
                   jnp.asarray(packed.win).reshape(-1),
                   jnp.asarray(packed.init))
  cols_lo, vals = jnp.asarray(packed.cols_lo), jnp.asarray(packed.vals)
  shape = packed.shape
  if packed.inv is not None:
    inv = jnp.asarray(packed.inv)

    @jax.jit
    def spmv_unique_fn(x):
      if x.dtype == jnp.float64:
        raise NotImplementedError("windowed SpMV kernel is f32/bf16 only")
      return windowed_unique_spmv_traced(rb, win, init, cols_lo, vals,
                                         inv, x, shape=shape,
                                         interpret=interpret)

    return spmv_unique_fn
  rows_lo = jnp.asarray(packed.rows_lo)

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
    self._dev = None

  @property
  def steps_per_shard(self):
    return self.rb.shape[1]

  def device_arrays(self):
    """Stacked chunk arrays on device, uploaded once and memoized (see
    :meth:`WindowedELL.device_arrays`)."""
    if self._dev is None:
      self._dev = (jnp.asarray(self.rb), jnp.asarray(self.win),
                   jnp.asarray(self.init), jnp.asarray(self.cols_lo),
                   jnp.asarray(self.rows_lo), jnp.asarray(self.vals))
    return self._dev


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

  # Preallocate the stacked output ONCE and write each shard's pack into
  # its slice.  The old pad-with-concatenate-then-np.stack shape copied
  # every array twice through fresh allocations (~3 GB of first-touch
  # pages at 8M nnz × 8 shards) — page-fault bound on microVM hosts,
  # measured 276 s → ~3 s.  Pad semantics unchanged: no-op tail chunks
  # target the last local block (rb monotone), zero vals, init=0.
  rb_o = np.full((n_shards, s_max), rb_per - 1, np.int32)
  win_o = np.zeros((n_shards, s_max * _STRIPS), np.int32)
  init_o = np.zeros((n_shards, s_max), np.int32)
  cols_o = np.zeros((n_shards, s_max * _STRIPS, _LANES), np.int32)
  rows_o = np.zeros((n_shards, s_max * _STRIPS, _LANES), np.int32)
  vals_o = np.zeros((n_shards, s_max * _STRIPS, _LANES), np.float32)
  for d, p in enumerate(packs):
    k = p.n_chunks
    rb_o[d, :k] = p.rb
    win_o[d, :k * _STRIPS] = p.win.reshape(-1)
    init_o[d, :k] = p.init
    cols_o[d, :k * _STRIPS] = p.cols_lo
    rows_o[d, :k * _STRIPS] = p.rows_lo
    vals_o[d, :k * _STRIPS] = p.vals
  return ShardedWindowedELL(
      rb_o, win_o, init_o, cols_o, rows_o, vals_o,
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

    n_chunks = -(-s_max // _MAX_PREFETCH_STEPS)
    if n_chunks <= 1:
      grid_spec = _windowed_grid_spec(
          s_max, [(_STRIPS, _LANES)] * 3)
      return pl.pallas_call(
          functools.partial(_windowed_kernel, use_bf16=use_bf16),
          grid_spec=grid_spec,
          out_shape=jax.ShapeDtypeStruct((rb_per * _STRIPS, _LANES),
                                         jnp.float32),
          interpret=interpret,
      )(rb_f, win_f, init_f, cols_f, rows_f, vals_f,
        *([x_full] * _STRIPS))
    # per-shard pack past the scalar-prefetch SMEM budget: same chained
    # chunked launches as the unsharded path
    out = jnp.zeros((rb_per * _STRIPS, _LANES), jnp.float32)
    for ci in range(n_chunks):
      lo = ci * _MAX_PREFETCH_STEPS
      hi = min(s_max, lo + _MAX_PREFETCH_STEPS)
      grid_spec = _windowed_grid_spec(
          hi - lo, [(_STRIPS, _LANES)] * 3, with_acc=True)
      out = pl.pallas_call(
          functools.partial(_windowed_kernel, use_bf16=use_bf16,
                            has_acc=True),
          grid_spec=grid_spec,
          out_shape=jax.ShapeDtypeStruct((rb_per * _STRIPS, _LANES),
                                         jnp.float32),
          input_output_aliases={14: 0},
          interpret=interpret,
      )(rb_f[lo:hi], win_f[lo * _STRIPS:hi * _STRIPS], init_f[lo:hi],
        cols_f[lo * _STRIPS:hi * _STRIPS],
        rows_f[lo * _STRIPS:hi * _STRIPS],
        vals_f[lo * _STRIPS:hi * _STRIPS], *([x_full] * _STRIPS), out)
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
