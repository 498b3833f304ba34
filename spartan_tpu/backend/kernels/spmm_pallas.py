"""Pallas windowed SpMM kernel — sparse × dense matrix product on TPU.

``Y[i, :] = Σ_j vals[i, j] · B[cols[i, j], :]`` for unstructured
sparsity, the last sparse surface still on the slow path after round 2
(VERDICT r2 missing #5): the XLA padded-ELL lowering materializes a
``(rows, max_nnz, k)`` gather — bandwidth-catastrophic as ``k`` grows —
and runs at ~0.1 Gnnz/s on v5e.

Design (sibling of the windowed SpMV kernel in ``spmv_pallas.py`` —
same scalar-prefetch architecture, different geometry):

* Everything lives TRANSPOSED: ``Bt = Bᵀ`` is ``(k≤128 sublanes, m
  lanes)``, the output ``Yt`` is ``(k, n)``.  This turns the per-nonzero
  "fetch a row of B" into a LANE gather, the one direction Mosaic's
  ``tpu.dynamic_gather`` compiles at (128, 128) on this toolchain
  ((128,128) axis-0 — the untransposed form — still HTTP-500s the remote
  Mosaic helper).
* Nonzeros are packed into 128-entry strips sharing one (128-row output
  block, 1024-column B window) pair; 8 strips form one grid step, so one
  ``(k, 1024)`` window DMA (512 KB @ k=128 f32) amortizes over up to
  1024 nonzeros (~0.5 KB/nnz → ~2 Gnnz/s DMA bound).  Steps are
  row-block-contiguous (output revisits stay cheap; first visit zeroes
  via the prefetched init flag) and window-sorted within a block
  (consecutive steps with an unchanged window index skip the re-copy in
  the Pallas pipeline).
* Per strip: gather ``G[su, e] = Bt_win[su, cols_lo[e]]`` as 8 chunked
  ``take_along_axis`` axis-1 gathers + a VPU select over the chunk index
  (exact, no rounding), scale by ``vals``, then scatter-to-rows with the
  SpMV kernel's proven hi/lo-bf16 one-hot MXU dot contracting the
  128-LANE entry dim:  ``acc(k,row) += P(k,e) · [rows_lo[e] == row]``.
  2·k·128 FLOP per nonzero → ~3 Gnnz/s MXU bound at k = 128.

Fill factor is the routing criterion: a (128, 1024) block holds ~131·d·
1024 nonzeros at density ``d``, so the pack is tight for d ≳ 3e-3 (ALS /
recommender matrices) and collapses for ultra-sparse graphs — ``spmm``
auto-routes by measured fill (``pack.fill``), keeping the XLA path
otherwise.  k ≤ 128 runs one launch; larger k is tiled into 128-column
strips over the SAME pack (one launch per strip, window DMAs re-amortize
per strip; route gate k ≤ 512 — past that the strip count erodes the
win and the densified/XLA paths take over).

Reference parity: spartan/sparse C++ SpMM kernels (SURVEY.md §2.2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_STRIPS = 8          # strips per grid step (share one window DMA)
_RB = 128            # output rows per block
_WIN = 8 * _LANES    # B-row window: 1024

# One take_along_axis over the full (128, 1024) window instead of 8
# chunked (128,128) gathers + VPU selects.  PROBED r3, DEAD END on this
# toolchain (tools/gather_probe_r3.py): (128,1024)-operand with
# (128,128) indices hits a lowering AssertionError, and the full-shape
# (128,1024)/(128,1024) form is rejected by Mosaic itself — "Not
# implemented: Multiple source vregs along gather dimension".
# ``tpu.dynamic_gather`` is single-vreg (128 lanes) along the gathered
# dim, so the chunked gather+select IS the mechanism, not a workaround.
_WIDE_GATHER = False


class WindowedSpMM:
  """Host-packed chunks for :func:`windowed_spmm_traced` (one-time per
  matrix)."""

  def __init__(self, rb, win, init, cols_lo, rows_lo, vals, shape, nnz,
               fill_override=None):
    self.rb, self.win, self.init = rb, win, init
    self.cols_lo, self.rows_lo, self.vals = cols_lo, rows_lo, vals
    self.shape, self.nnz = shape, nnz
    self._fill_override = fill_override
    self._dev = None

  def device_arrays(self):
    if self._dev is None:
      self._dev = (jnp.asarray(self.rb), jnp.asarray(self.win),
                   jnp.asarray(self.init), jnp.asarray(self.cols_lo),
                   jnp.asarray(self.rows_lo), jnp.asarray(self.vals))
    return self._dev

  @property
  def n_steps(self):
    return self.rb.shape[0]

  @property
  def fill(self):
    if self._fill_override is not None:
      return self._fill_override
    return self.nnz / max(self.n_steps * _STRIPS * _LANES, 1)


def pack_windowed_spmm(sp_csr) -> WindowedSpMM:
  """Pack a scipy CSR/COO matrix into SpMM window steps.

  Entries sorted by (row-block of 128 rows, window of 1024 cols, col);
  each (rb, win) run is cut into 128-entry strips; strips are grouped 8
  per step — all strips of a step share the SAME window (one window DMA
  per step), so a run's strip count is padded to a multiple of 8."""
  coo = sp_csr.tocoo()
  n, m = coo.shape
  # int32 temps + one composite-key argsort: fresh-matrix packing is
  # first-touch page-fault bound on microVM hosts (see pack_windowed)
  idt = np.int32 if (coo.nnz < 2**31 and max(n, m) < 2**31) else np.int64
  r = coo.row.astype(idt)
  c = coo.col.astype(idt)
  v = coo.data.astype(np.float32)
  rb = r // _RB
  win = c // _WIN
  n_win_k = (int(win.max()) + 1) if len(win) else 1
  n_rb_k = (int(rb.max()) + 1) if len(rb) else 1
  if len(r) and float(n_rb_k) * n_win_k * m < 2**62:
    order = np.argsort((rb.astype(np.int64) * n_win_k + win) * m + c,
                       kind="stable")
  else:
    order = np.lexsort((c, win, rb))
  r, c, v, rb, win = r[order], c[order], v[order], rb[order], win[order]

  n_rb = max(-(-n // _RB), 1)
  if len(r):
    key_g = rb.astype(np.int64) * (max(int(win.max()), 0) + 2) + win
    new_g = np.concatenate([[True], np.diff(key_g) != 0])
    g_starts = np.nonzero(new_g)[0].astype(idt)
    g_sizes = np.diff(np.concatenate([g_starts,
                                      np.asarray([len(r)], idt)]))
    pos = np.arange(len(r), dtype=idt) - np.repeat(g_starts, g_sizes)
    # strips per (rb, win) run, padded to a multiple of _STRIPS so every
    # step holds strips of ONE run (one shared window per step)
    strips_per_run = -(-g_sizes // _LANES)
    steps_per_run = -(-strips_per_run // _STRIPS)
    run_rb = rb[new_g]
    run_win = win[new_g].astype(np.int32)
  else:
    g_starts = np.zeros(0, np.int64)
    pos = np.zeros(0, np.int64)
    steps_per_run = np.zeros(0, np.int64)
    run_rb = np.zeros(0, np.int64)
    run_win = np.zeros(0, np.int32)

  s_n = max(int(steps_per_run.sum()), 1)
  fill_est = coo.nnz / (s_n * _STRIPS * _LANES)
  if coo.nnz and fill_est < 0.02:
    # ultra-sparse: nearly every (rb, win) run holds a handful of
    # entries, so the padded strip layout would allocate ~nnz/fill
    # stored slots (measured: minutes of first-touch page faults before
    # the fill gate could even reject the pack).  Return a metadata-only
    # pack; every caller gates on .fill and falls back to XLA.
    z2 = np.zeros((_STRIPS, _LANES), np.int32)
    return WindowedSpMM(np.zeros(1, np.int32), np.zeros(1, np.int32),
                        np.ones(1, np.int32), z2, z2,
                        np.zeros((_STRIPS, _LANES), np.float32),
                        (n, m), int(coo.nnz), fill_override=fill_est)
  step_off_run = np.concatenate([[0], np.cumsum(steps_per_run)[:-1]])
  cols_lo = np.zeros((s_n * _STRIPS, _LANES), np.int32)
  rows_lo = np.zeros((s_n * _STRIPS, _LANES), np.int32)
  vals = np.zeros((s_n * _STRIPS, _LANES), np.float32)
  wins = np.zeros(s_n, np.int32)
  rbs = np.zeros(s_n, np.int32)
  init = np.zeros(s_n, np.int32)
  if len(r):
    run_of_entry = np.cumsum(np.concatenate([[True], np.diff(
        rb * (max(int(win.max()), 0) + 2) + win) != 0])) - 1
    # destination strip row for each entry: the run's first step × 8
    # strips, plus the entry's strip index within the run
    dest = (step_off_run[run_of_entry] * _STRIPS + pos // _LANES)
    cols_lo[dest, pos % _LANES] = (c % _WIN).astype(np.int32)
    rows_lo[dest, pos % _LANES] = (r % _RB).astype(np.int32)
    vals[dest, pos % _LANES] = v
    # per-step metadata: expand run metadata over its steps
    step_run = np.repeat(np.arange(len(run_rb)), steps_per_run)
    wins[: len(step_run)] = run_win[step_run]
    rbs[: len(step_run)] = run_rb[step_run]
    # init: first step of each row block zeroes the output block
    first = np.concatenate([[True], np.diff(rbs) != 0])
    init[np.nonzero(first)[0]] = 1
    init[0] = 1
  else:
    init[0] = 1
  return WindowedSpMM(rbs, wins, init, cols_lo, rows_lo, vals,
                      (n, m), int(coo.nnz))


def _spmm_kernel(rb_ref, win_ref, init_ref, cols_ref, rows_ref, vals_ref,
                 bt_ref, out_ref, *, use_bf16=False):
  s = pl.program_id(0)

  @pl.when(init_ref[s] == 1)
  def _():
    out_ref[...] = jnp.zeros_like(out_ref)

  dims_e = (((1,), (1,)), ((), ()))   # contract the 128-lane entry dim
  acc = jnp.zeros((_LANES, _RB), jnp.float32)     # (k, rows)
  bt = bt_ref[...]                                # (128, 1024) window
  for strip in range(_STRIPS):
    cl = cols_ref[strip:strip + 1, :]             # (1,128) in [0, 1024)
    if _WIDE_GATHER:
      g = jnp.take_along_axis(
          bt, jnp.broadcast_to(cl, (_LANES, _LANES)), axis=1)
    else:
      q = cl // _LANES
      rr = cl - q * _LANES
      rr_b = jnp.broadcast_to(rr, (_LANES, _LANES))
      # lane gather per 128-col chunk of the window + VPU chunk select —
      # (128,128) axis-1 dynamic gathers compile on this toolchain
      g = jnp.zeros((_LANES, _LANES), jnp.float32)
      for j in range(_WIN // _LANES):
        tj = jnp.take_along_axis(bt[:, j * _LANES:(j + 1) * _LANES],
                                 rr_b, axis=1)
        g = jnp.where(q == j, tj, g)
    p = g * vals_ref[strip:strip + 1, :].astype(jnp.float32)
    rl = rows_ref[strip:strip + 1, :]             # (1,128) in [0, 128)
    m = (jax.lax.broadcasted_iota(jnp.int32, (_RB, _LANES), 0)
         == rl).astype(jnp.bfloat16)              # m[row, e] = rl_e == row
    p_hi = p.astype(jnp.bfloat16)
    acc = acc + jax.lax.dot_general(p_hi, m, dims_e,
                                    preferred_element_type=jnp.float32)
    if not use_bf16:
      p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
      acc = acc + jax.lax.dot_general(p_lo, m, dims_e,
                                      preferred_element_type=jnp.float32)
  out_ref[...] += acc


def windowed_spmm_traced(rb, win, init, cols_lo, rows_lo, vals, B, *,
                         shape, use_bf16: bool = False,
                         interpret: bool = False):
  """Traced windowed SpMM: Y = A @ B with A as packed chunk arrays
  (ordinary leaf inputs — composes into outer jit/expr regions).

  ``B`` is (m, k) with k ≤ 128; returns (n, k) in ``B.dtype``'s
  promotion with f32."""
  n, m = shape
  k = B.shape[1]
  if k > _LANES:
    # k tiling at the wrapper level: one kernel launch per 128-column
    # tile of B, same pack reused (the kernel is k-shape-polymorphic
    # only through recompiles, so the per-tile program is compiled once
    # and reused across tiles of the same width)
    outs = [windowed_spmm_traced(rb, win, init, cols_lo, rows_lo, vals,
                                 B[:, off:off + _LANES], shape=shape,
                                 use_bf16=use_bf16, interpret=interpret)
            for off in range(0, k, _LANES)]
    return jnp.concatenate(outs, axis=1)
  s_n = rb.shape[0]
  n_rb = max(-(-n // _RB), 1)
  mq = -(-m // _WIN) * _WIN

  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=3,
      grid=(s_n,),
      in_specs=[pl.BlockSpec((_STRIPS, _LANES),
                             lambda s, b, w, it: (s, 0))] * 3
      + [pl.BlockSpec((_LANES, _WIN), lambda s, b, w, it: (0, w[s]))],
      out_specs=pl.BlockSpec((_LANES, _RB), lambda s, b, w, it: (0, b[s])),
  )
  call = pl.pallas_call(
      functools.partial(_spmm_kernel, use_bf16=use_bf16),
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((_LANES, n_rb * _RB), jnp.float32),
      interpret=interpret,
  )
  dt = jnp.promote_types(vals.dtype, B.dtype)
  bt = jnp.pad(B.astype(jnp.float32).T, ((0, _LANES - k), (0, mq - m)))
  out = call(rb, win, init, cols_lo, rows_lo, vals, bt)
  return out[:k, :n].T.astype(dt)


def make_spmm_windowed(packed: WindowedSpMM, use_bf16: bool = False,
                       interpret: bool = False):
  """Closure form over a packed matrix: ``f(B) -> A @ B``."""
  dev = packed.device_arrays()

  def spmm_fn(B):
    return windowed_spmm_traced(*dev, B, shape=packed.shape,
                                use_bf16=use_bf16, interpret=interpret)

  return spmm_fn


# ---------------------------------------------------------------------------
# Multi-device (owner-computes) form — mirrors spmv_pallas's sharded
# windowed machinery: per-shard stacked chunk arrays, per-device
# pallas_call inside shard_map, B replicated.
# ---------------------------------------------------------------------------


def rbmm_per_of(n: int, n_shards: int) -> int:
  n_rb = max(-(-n // _RB), 1)
  return -(-n_rb // n_shards)


class ShardedWindowedSpMM:
  """Per-shard stacked chunk arrays (leading dim = shard)."""

  def __init__(self, rb, win, init, cols_lo, rows_lo, vals, shape,
               n_shards, rb_per, nnz, fill_override=None):
    self.rb, self.win, self.init = rb, win, init
    self.cols_lo, self.rows_lo, self.vals = cols_lo, rows_lo, vals
    self.shape, self.n_shards, self.rb_per = shape, n_shards, rb_per
    self.nnz = nnz
    self._fill_override = fill_override
    self._dev = None

  @property
  def steps_per_shard(self):
    return self.rb.shape[1]

  @property
  def fill(self):
    if self._fill_override is not None:
      return self._fill_override
    return self.nnz / max(self.rb.shape[0] * self.steps_per_shard
                          * _STRIPS * _LANES, 1)

  def device_arrays(self):
    if self._dev is None:
      self._dev = (jnp.asarray(self.rb), jnp.asarray(self.win),
                   jnp.asarray(self.init), jnp.asarray(self.cols_lo),
                   jnp.asarray(self.rows_lo), jnp.asarray(self.vals))
    return self._dev


def pack_windowed_spmm_sharded(sp_csr, n_shards: int) -> ShardedWindowedSpMM:
  """Row-shard :func:`pack_windowed_spmm`: shard d owns output row blocks
  [d·rb_per, (d+1)·rb_per); shorter shards pad with no-op steps."""
  csr = sp_csr.tocsr()
  n, m = csr.shape
  rb_per = rbmm_per_of(n, n_shards)
  rows_per = rb_per * _RB
  packs = []
  for d in range(n_shards):
    r0 = min(d * rows_per, n)
    r1 = min(r0 + rows_per, n)
    sub = csr[r0:r1].copy()
    sub.resize((rows_per, m))
    packs.append(pack_windowed_spmm(sub))
  s_max = max(p.n_steps for p in packs)

  sentinels = [p._fill_override for p in packs
               if p._fill_override is not None]
  if sentinels:
    # some shard was ultra-sparse (metadata-only pack) — the whole
    # sharded pack is ineligible; report an honest (gate-failing) fill
    z3 = np.zeros((n_shards, _STRIPS, _LANES), np.int32)
    return ShardedWindowedSpMM(
        np.zeros((n_shards, 1), np.int32), np.zeros((n_shards, 1),
                                                    np.int32),
        np.ones((n_shards, 1), np.int32), z3, z3,
        np.zeros((n_shards, _STRIPS, _LANES), np.float32),
        (n, m), n_shards, rb_per, int(csr.nnz),
        fill_override=min(sentinels))

  # write each shard's pack into a preallocated stack (the pad-concat +
  # np.stack shape double-copied every array — first-touch page-fault
  # bound; see pack_windowed_sharded)
  rb_o = np.full((n_shards, s_max), rb_per - 1, np.int32)
  win_o = np.zeros((n_shards, s_max), np.int32)
  init_o = np.zeros((n_shards, s_max), np.int32)
  cols_o = np.zeros((n_shards, s_max * _STRIPS, _LANES), np.int32)
  rows_o = np.zeros((n_shards, s_max * _STRIPS, _LANES), np.int32)
  vals_o = np.zeros((n_shards, s_max * _STRIPS, _LANES), np.float32)
  for d, p in enumerate(packs):
    k = p.n_steps
    rb_o[d, :k] = p.rb
    win_o[d, :k] = p.win
    init_o[d, :k] = p.init
    cols_o[d, :k * _STRIPS] = p.cols_lo
    rows_o[d, :k * _STRIPS] = p.rows_lo
    vals_o[d, :k * _STRIPS] = p.vals
  return ShardedWindowedSpMM(
      rb_o, win_o, init_o, cols_o, rows_o, vals_o,
      (n, m), n_shards, rb_per, int(csr.nnz))


def sharded_windowed_spmm_traced(rb, win, init, cols_lo, rows_lo, vals, B,
                                 *, shape, mesh, use_bf16: bool = False,
                                 interpret: bool = False):
  """Y = A @ B with the chunk arrays row-sharded over all mesh axes
  (leading dim = shard) and B replicated; per-device pallas calls inside
  shard_map (the pallas_call is opaque to the SPMD partitioner)."""
  from jax.sharding import PartitionSpec

  n, m = shape
  k = B.shape[1]
  if k > _LANES:
    outs = [sharded_windowed_spmm_traced(
        rb, win, init, cols_lo, rows_lo, vals, B[:, off:off + _LANES],
        shape=shape, mesh=mesh, use_bf16=use_bf16, interpret=interpret)
        for off in range(0, k, _LANES)]
    return jnp.concatenate(outs, axis=1)
  p = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
  assert rb.shape[0] == p, (rb.shape, p)
  s_max = rb.shape[1]
  rb_per = rbmm_per_of(n, p)
  mq = -(-m // _WIN) * _WIN
  axes = tuple(mesh.axis_names)
  ax_arg = axes if len(axes) > 1 else axes[0]
  bt = jnp.pad(B.astype(jnp.float32).T, ((0, _LANES - k), (0, mq - m)))

  def body(rb_l, win_l, init_l, cols_l, rows_l, vals_l, bt_full):
    rb_f = rb_l.reshape(-1)
    win_f = win_l.reshape(-1)
    init_f = init_l.reshape(-1)
    cols_f = cols_l.reshape(s_max * _STRIPS, _LANES)
    rows_f = rows_l.reshape(s_max * _STRIPS, _LANES)
    vals_f = vals_l.reshape(s_max * _STRIPS, _LANES)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_max,),
        in_specs=[pl.BlockSpec((_STRIPS, _LANES),
                               lambda s, b, w, it: (s, 0))] * 3
        + [pl.BlockSpec((_LANES, _WIN), lambda s, b, w, it: (0, w[s]))],
        out_specs=pl.BlockSpec((_LANES, _RB),
                               lambda s, b, w, it: (0, b[s])),
    )
    return pl.pallas_call(
        functools.partial(_spmm_kernel, use_bf16=use_bf16),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_LANES, rb_per * _RB), jnp.float32),
        interpret=interpret,
    )(rb_f, win_f, init_f, cols_f, rows_f, vals_f, bt_full)

  spec_s = PartitionSpec(ax_arg)
  fn = jax.shard_map(
      body, mesh=mesh,
      in_specs=(spec_s,) * 6 + (PartitionSpec(),),
      out_specs=PartitionSpec(None, ax_arg),
      check_vma=False)  # pallas out_shape carries no vma annotation
  dt = jnp.promote_types(vals.dtype, B.dtype)
  out = fn(rb, win, init, cols_lo, rows_lo, vals, bt)
  return out[:k, :n].T.astype(dt)


def unshard_windowed_spmm(rb, win, init, cols_lo, rows_lo, vals,
                          n: int, n_shards: int):
  """Flatten sharded-stacked SpMM chunk arrays back to the global form —
  pure traced jnp ops, so a 'winmmsh' node built under one mesh still
  evaluates if the mesh later changes size.  Shard-major step order keeps
  row blocks monotone, so the per-shard init flags stay valid globally."""
  p, s_max = rb.shape
  rb_per = rbmm_per_of(n, n_shards)
  offs = (jnp.arange(p, dtype=rb.dtype) * rb_per)[:, None]
  rb_g = (rb + offs).reshape(-1)
  win_g = win.reshape(-1)
  init_g = init.reshape(-1)
  flat = lambda a: a.reshape(p * s_max * _STRIPS, _LANES)  # noqa: E731
  # the flattened pack addresses p·rb_per blocks — callers must size the
  # output to n_pad rows (> n when the shard split over-padded) and trim
  n_pad = p * rb_per * _RB
  return (rb_g, win_g, init_g, flat(cols_lo), flat(rows_lo), flat(vals),
          n_pad)
