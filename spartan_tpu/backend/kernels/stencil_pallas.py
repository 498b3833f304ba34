"""Pallas 3×3 stencil kernel with manual halo DMA.

The expr-layer stencil (`spartan_tpu/expr/stencil.py`) uses XLA's conv,
which is the right default.  This kernel exists as the explicit-DMA
counterpart (pallas_guide: Async DMA / run_scoped): the padded input stays
in HBM (``memory_space=ANY``), each grid step DMAs its row-slab *plus one
halo row on each side* into VMEM scratch with a dynamic offset, and the
3×3 stencil is computed as nine statically-shifted fused multiply-adds on
the VPU.  Coefficients are static Python floats (fixed-coefficient
stencils — Laplacians, blurs — are the common case).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coeffs, bm, bc, x_ref, o_ref, scratch, sems):
  """Double-buffered pipeline (pallas_guide: Double Buffering): scratch and
  semaphores persist across the sequential grid, so each step overlaps the
  NEXT slab's DMA with the current block's compute."""
  i, j = pl.program_id(0), pl.program_id(1)
  nj = pl.num_programs(1)
  step = i * nj + j
  n_steps = pl.num_programs(0) * nj
  slot = step % 2
  nxt = (step + 1) % 2

  def slab_dma(slot_idx, bi, bj):
    # slab = the output block plus its halo, rounded up to Mosaic's (8,128)
    # DMA tile alignment (the input is padded so slabs stay in bounds)
    return pltpu.make_async_copy(
        x_ref.at[pl.ds(bi * bm, bm + 8), pl.ds(bj * bc, bc + 128)],
        scratch.at[slot_idx], sems.at[slot_idx])

  @pl.when(step == 0)
  def _():
    slab_dma(slot, i, j).start()

  @pl.when(step + 1 < n_steps)
  def _():
    ni = jnp.where(j + 1 < nj, i, i + 1)
    njj = jnp.where(j + 1 < nj, j + 1, 0)
    slab_dma(nxt, ni, njj).start()

  slab_dma(slot, i, j).wait()
  acc = jnp.zeros((bm, bc), x_ref.dtype)
  for di in range(3):
    for dj in range(3):
      c = coeffs[di * 3 + dj]
      if c == 0.0:
        continue
      acc = acc + c * scratch[slot, di:di + bm, dj:dj + bc]
  o_ref[:] = acc


def _pick_bm(n: int) -> int:
  bm = min(n, 256)
  bm -= bm % 8
  while bm > 8 and n % bm != 0:
    bm -= 8
  return bm if bm >= 8 and n % bm == 0 else 0


@functools.partial(jax.jit, static_argnames=("coeffs", "interpret"))
def stencil3x3(x: jax.Array, coeffs: Sequence[float],
               interpret: bool = False) -> jax.Array:
  """'SAME' 3×3 correlation of a 2-D array with static coefficients
  (row-major 9-tuple), zero boundary."""
  coeffs = tuple(float(c) for c in coeffs)
  assert len(coeffs) == 9
  n, m = x.shape
  bm = _pick_bm(n)
  bc = min(m, 1024)
  bc -= bc % 128
  while bc > 128 and m % bc != 0:
    bc -= 128
  if m % 128 or m % max(bc, 1):
    bc = 0
  # Mosaic DMA slices must align to the (8, 128) tile: rows get 1 halo on
  # top + 7 spare below; cols get 1 halo left + 127 spare right
  xp = jnp.pad(x, ((1, 7), (1, 127)))
  if not bm or not bc:
    # ragged fallback: shifted adds in plain XLA
    acc = jnp.zeros_like(x)
    for di in range(3):
      for dj in range(3):
        acc = acc + coeffs[di * 3 + dj] * xp[di:di + n, dj:dj + m]
    return acc  # extra bottom pad rows never read (di+n <= n+2 < n+8)
  return pl.pallas_call(
      functools.partial(_kernel, coeffs, bm, bc),
      grid=(n // bm, m // bc),
      in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
      out_specs=pl.BlockSpec((bm, bc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n, m), x.dtype),
      scratch_shapes=[
          pltpu.VMEM((2, bm + 8, bc + 128), x.dtype),
          pltpu.SemaphoreType.DMA((2,)),
      ],
      interpret=interpret,
  )(xp)


# ---------------------------------------------------------------------------
# Pre-padded STORAGE stencil (VERDICT r3 next #3).
#
# The one-shot kernel above pays a full extra HBM pass for its per-call
# ``jnp.pad`` (measured: pad-pass caps it at ~293-303 GB/s vs the 592-660
# GB/s r+w streaming roofline — BASELINE.md stencil campaign).  Iterative
# stencil workloads (heat / Jacobi / poisson) apply the SAME stencil many
# times, so the fix is to keep the state IN padded space between steps:
#
#   layout: (8 + n + 8, 128 + m + 128), interior at [8:8+n, 128:128+m],
#   pad ring all zeros (zero/Dirichlet boundary).  8/128 top/left pads
#   make every DMA offset land on Mosaic's (8,128) tile grid.
#
# Each application is then ONE streaming pass: row-slab in-DMA (slab+halo
# rows, full padded width), nine shifted FMAs on the VPU, interior-only
# out-DMA.  The output buffer is ALIASED to a caller-provided scratch
# buffer whose pad ring is already zero (``input_output_aliases``), so
# the pads are never rewritten and the boundary stays exact.  Read
# amplification is (bm+16)/bm rows x (m+256)/m cols ~ 1.1x; no pad pass.
#
# The iteration loop stays whole-program (unrolled k inside one jit,
# ping-ponging the two buffers) — a big-array fori_loop carry feeding a
# pallas_call input hard-stalls this toolchain (CLAUDE.md parked item).
# ---------------------------------------------------------------------------

PAD_R, PAD_C = 8, 128


def _kernel_padded(coeffs, bm, n, m, has_add, has_halo, *refs):
  refs = list(refs)
  x_ref = refs.pop(0)
  g_ref = refs.pop(0) if has_add else None
  if has_halo:
    top_ref = refs.pop(0)   # (8, C) VMEM; row 7 = the row ABOVE interior
    bot_ref = refs.pop(0)   # (8, C) VMEM; row 0 = the row BELOW interior
  ob_ref, o_ref = refs.pop(0), refs.pop(0)
  in_scr = refs.pop(0)
  g_scr = refs.pop(0) if has_add else None
  out_scr, in_sems = refs.pop(0), refs.pop(0)
  g_sems = refs.pop(0) if has_add else None
  out_sems = refs.pop(0)
  del ob_ref  # the aliased scratch buffer is written via o_ref only
  i = pl.program_id(0)
  nsteps = pl.num_programs(0)
  slot = i % 2
  nxt = (i + 1) % 2

  def in_dma(s, bi):
    # slab = output rows [8+bi*bm, 8+bi*bm+bm) plus 1 halo row each side,
    # aligned down/up to the 8-row tile: rows [bi*bm, bi*bm+bm+16), full
    # padded width (the 128-col pads carry the lane halo for free)
    return pltpu.make_async_copy(
        x_ref.at[pl.ds(bi * bm, bm + 2 * PAD_R)], in_scr.at[s],
        in_sems.at[s])

  def g_dma(s, bi):
    # the additive field needs no halo: interior rows only, aligned
    return pltpu.make_async_copy(
        g_ref.at[pl.ds(PAD_R + bi * bm, bm), pl.ds(PAD_C, m)],
        g_scr.at[s], g_sems.at[s])

  def out_dma(s, bi):
    return pltpu.make_async_copy(
        out_scr.at[s],
        o_ref.at[pl.ds(PAD_R + bi * bm, bm), pl.ds(PAD_C, m)],
        out_sems.at[s])

  @pl.when(i == 0)
  def _():
    in_dma(slot, i).start()
    if has_add:
      g_dma(slot, i).start()

  @pl.when(i + 1 < nsteps)
  def _():
    in_dma(nxt, i + 1).start()
    if has_add:
      g_dma(nxt, i + 1).start()

  in_dma(slot, i).wait()
  if has_add:
    g_dma(slot, i).wait()

  # this slot's out-DMA from two steps ago must land before we overwrite
  @pl.when(i >= 2)
  def _():
    out_dma(slot, i - 2).wait()

  # output element (r,c) of this slab is global (8+i*bm+r, 128+c); slab
  # starts at global row i*bm, so its stencil taps are slab rows 7+di+r,
  # cols 127+dj+c (static strided slices — Mosaic-safe)
  acc = (g_scr[slot] if has_add
         else jnp.zeros((bm, m), x_ref.dtype))
  for di in range(3):
    for dj in range(3):
      c = coeffs[di * 3 + dj]
      if c == 0.0:
        continue
      acc = acc + c * in_scr[slot, PAD_R - 1 + di:PAD_R - 1 + di + bm,
                             PAD_C - 1 + dj:PAD_C - 1 + dj + m]
  if has_halo:
    # sharded form: the rows above/below THIS shard's interior live on
    # neighbor devices, exchanged via ppermute into (8, C) operands (the
    # local pad ring is zero, so the main loop contributed nothing
    # there).  Only interior row 0 (first grid block) and row bm-1
    # (last block) see them; traced-scalar masks keep it branch-free.
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (bm, m), 0)
    top_c = jnp.zeros((1, m), x_ref.dtype)
    bot_c = jnp.zeros((1, m), x_ref.dtype)
    for dj in range(3):
      if coeffs[dj] != 0.0:
        top_c = top_c + coeffs[dj] * top_ref[7:8,
                                             PAD_C - 1 + dj:
                                             PAD_C - 1 + dj + m]
      if coeffs[6 + dj] != 0.0:
        bot_c = bot_c + coeffs[6 + dj] * bot_ref[0:1,
                                                 PAD_C - 1 + dj:
                                                 PAD_C - 1 + dj + m]
    is_first = (i == 0).astype(x_ref.dtype)
    is_last = (i == nsteps - 1).astype(x_ref.dtype)
    acc = acc + jnp.where(rows_iota == 0, top_c * is_first, 0.0)
    acc = acc + jnp.where(rows_iota == bm - 1, bot_c * is_last, 0.0)
  out_scr[slot] = acc
  out_dma(slot, i).start()

  @pl.when(i == nsteps - 1)
  def _():
    out_dma(slot, i).wait()

  @pl.when((i == nsteps - 1) & (nsteps > 1))
  def _():
    out_dma(nxt, i - 1).wait()


def padded_shape(n: int, m: int):
  return (n + 2 * PAD_R, m + 2 * PAD_C)


def to_padded(x: jax.Array) -> jax.Array:
  """Lift (n, m) into the padded-storage layout (one-time cost)."""
  return jnp.pad(x, ((PAD_R, PAD_R), (PAD_C, PAD_C)))


def from_padded(xp: jax.Array) -> jax.Array:
  return xp[PAD_R:xp.shape[0] - PAD_R, PAD_C:xp.shape[1] - PAD_C]


def _pick_bm_padded(n: int, m: int, itemsize: int, has_add: bool = False,
                    budget: int = 11 << 20) -> int:
  """Largest 8-aligned divisor of n whose double-buffered slabs + out
  blocks (+ the additive-field scratch when ``has_add``) fit the VMEM
  budget; 0 when even bm=8 cannot fit (callers take the XLA fallback —
  code-review r4: returning 8 over budget compiled guaranteed-OOM
  kernels for very wide arrays)."""
  mp = m + 2 * PAD_C

  def cost(bm):
    blocks = (2 if has_add else 1) * bm * m  # out_scr (+ g_scr)
    return 2 * ((bm + 2 * PAD_R) * mp + blocks) * itemsize

  bm = min(n, 512)
  bm -= bm % 8
  while bm > 8 and (n % bm or cost(bm) > budget):
    bm -= 8
  if bm < 8 or n % bm or cost(bm) > budget:
    return 0
  return bm


def _halo_pair(xp, mesh_axes):
  """Exchange interior edge rows with mesh neighbors: returns (top, bot)
  (8, C) blocks — top row 7 = the row above my interior (zeros at the
  global boundary, jax ppermute semantics), bot row 0 = the row below."""
  from jax import lax
  R = xp.shape[0]
  nb = R - 2 * PAD_R
  p = lax.axis_size(mesh_axes)
  last8 = lax.slice_in_dim(xp, PAD_R + nb - 8, PAD_R + nb, axis=0)
  first8 = lax.slice_in_dim(xp, PAD_R, PAD_R + 8, axis=0)
  top = lax.ppermute(last8, mesh_axes, [(d, d + 1) for d in range(p - 1)])
  bot = lax.ppermute(first8, mesh_axes, [(d + 1, d) for d in range(p - 1)])
  return top, bot


@functools.partial(jax.jit,
                   static_argnames=("coeffs", "steps", "interpret"))
def stencil3x3_padded(xp: jax.Array, buf: jax.Array,
                      coeffs: Sequence[float], steps: int = 1,
                      interpret: bool = False, add: jax.Array = None,
                      top: jax.Array = None, bot: jax.Array = None):
  """``steps`` applications of a 'SAME' zero-boundary 3x3 stencil over
  padded-storage state.  ``xp`` holds the current state, ``buf`` is a
  second buffer with a ZERO pad ring (interior contents irrelevant);
  both in :func:`padded_shape` layout.  Returns ``(new_state, new_buf)``
  — ping-ponged, both still in padded layout.  Caller keeps iterating by
  passing them straight back in.

  ``add`` (optional, same padded layout) is a constant field added to
  every application — ``u' = stencil(u) + add`` — which makes weighted
  Jacobi / Richardson solvers (``u' = S·u - h²f/4``) a single streaming
  pass per iteration (the field costs one extra halo-free slab read).

  ``top``/``bot`` (optional, (8, C); row 7 / row 0 = the rows
  above/below this interior) carry cross-shard halo rows for the
  sharded form — they are valid for ONE application, so ``steps`` must
  be 1 when given (use :func:`stencil3x3_padded_sharded`)."""
  coeffs = tuple(float(c) for c in coeffs)
  assert len(coeffs) == 9
  has_halo = top is not None
  assert not has_halo or (steps == 1 and bot is not None)
  R, C = xp.shape
  n, m = R - 2 * PAD_R, C - 2 * PAD_C
  has_add = add is not None
  bm = _pick_bm_padded(n, m, xp.dtype.itemsize, has_add=has_add)
  if not bm or m % 128:
    # ragged fallback: shifted adds in plain XLA over the padded layout
    for _ in range(steps):
      acc = jnp.zeros((n, m), xp.dtype)
      for di in range(3):
        for dj in range(3):
          if coeffs[di * 3 + dj] == 0.0:
            continue
          acc = acc + coeffs[di * 3 + dj] * jax.lax.dynamic_slice(
              xp, (PAD_R - 1 + di, PAD_C - 1 + dj), (n, m))
      if has_add:
        acc = acc + jax.lax.dynamic_slice(add, (PAD_R, PAD_C), (n, m))
      if has_halo:
        iota = jax.lax.broadcasted_iota(jnp.int32, (n, m), 0)
        tc = sum(coeffs[dj] * top[7:8, PAD_C - 1 + dj:PAD_C - 1 + dj + m]
                 for dj in range(3))
        bc = sum(coeffs[6 + dj]
                 * bot[0:1, PAD_C - 1 + dj:PAD_C - 1 + dj + m]
                 for dj in range(3))
        acc = acc + jnp.where(iota == 0, tc, 0.0)
        acc = acc + jnp.where(iota == n - 1, bc, 0.0)
      new = jax.lax.dynamic_update_slice(buf, acc, (PAD_R, PAD_C))
      xp, buf = new, xp
    return xp, buf
  scratch = [pltpu.VMEM((2, bm + 2 * PAD_R, C), xp.dtype)]
  if has_add:
    scratch.append(pltpu.VMEM((2, bm, m), xp.dtype))
  scratch.append(pltpu.VMEM((2, bm, m), xp.dtype))
  scratch.append(pltpu.SemaphoreType.DMA((2,)))
  if has_add:
    scratch.append(pltpu.SemaphoreType.DMA((2,)))
  scratch.append(pltpu.SemaphoreType.DMA((2,)))
  in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
  operands = [xp]
  if has_add:
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    operands.append(add)
  if has_halo:
    in_specs += [pl.BlockSpec((8, C), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)] * 2
    operands += [top, bot]
  in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # aliased buf
  n_in = len(in_specs)
  call = pl.pallas_call(
      functools.partial(_kernel_padded, coeffs, bm, n, m, has_add,
                        has_halo),
      grid=(n // bm,),
      in_specs=in_specs,
      out_specs=pl.BlockSpec(memory_space=pl.ANY),
      out_shape=jax.ShapeDtypeStruct((R, C), xp.dtype),
      scratch_shapes=scratch,
      input_output_aliases={n_in - 1: 0},
      interpret=interpret,
  )
  for _ in range(steps):
    new = call(*operands, buf)
    xp, buf = new, xp
    operands[0] = xp
  return xp, buf


def stencil3x3_padded_sharded(x: jax.Array, coeffs: Sequence[float],
                              steps: int = 1, mesh=None,
                              interpret: bool = False,
                              add: jax.Array = None) -> jax.Array:
  """Multi-device iterative stencil: row-band sharding with per-device
  PRE-PADDED local state and ppermute halo exchange (SURVEY §2.3 CP row
  at padded-kernel speed — the XLA shifted-add SPMD path re-pads every
  step).

  ``x`` is the (n, m) GLOBAL field (host or device).  Each device keeps
  its (nb+16, m+256) padded band; per application it ppermutes its edge
  interior rows to neighbors ((8, C) blocks, zeros at the global
  boundary — jax ppermute semantics give the Dirichlet ring for free)
  and runs the local padded kernel with the halos as VMEM operands, so
  there is never a re-pad or gather of the global array.  Requires
  n % (8·p) == 0 and m % 128 == 0; returns the (n, m) result."""
  from jax.sharding import NamedSharding, PartitionSpec

  from spartan_tpu.core.mesh import get_mesh

  mesh = mesh or get_mesh()
  axes = tuple(mesh.axis_names)
  p = int(np.prod([mesh.shape[a] for a in axes]))
  coeffs = tuple(float(c) for c in coeffs)
  xg = jnp.asarray(x)
  n, m = xg.shape
  if p == 1:
    xp = to_padded(xg)
    out, _ = stencil3x3_padded(xp, jnp.zeros_like(xp), coeffs,
                               steps=steps, interpret=interpret,
                               add=None if add is None else to_padded(add))
    return from_padded(out)
  if n % (8 * p) or m % 128:
    raise ValueError(f"sharded padded stencil needs n % {8 * p} == 0 and "
                     f"m % 128 == 0; got {(n, m)}")
  nb = n // p
  ax_arg = axes if len(axes) > 1 else axes[0]

  def body(xl, gl):
    # xl: (nb, m) local band → local padded state once, then iterate
    xp = to_padded(xl[0])
    buf = jnp.zeros_like(xp)
    gp = to_padded(gl[0]) if add is not None else None
    for _ in range(steps):
      top, bot = _halo_pair(xp, ax_arg)
      xp, buf = stencil3x3_padded(xp, buf, coeffs, steps=1,
                                  interpret=interpret, add=gp,
                                  top=top, bot=bot)
    return from_padded(xp)[None]

  spec = PartitionSpec(ax_arg)
  xg = jax.device_put(xg.reshape(p, nb, m),
                      NamedSharding(mesh, spec))
  gl_in = (jnp.zeros((p, 1, 1), xg.dtype) if add is None
           else jax.device_put(jnp.asarray(add).reshape(p, nb, m),
                               NamedSharding(mesh, spec)))
  fn = jax.jit(jax.shard_map(body, mesh=mesh,
                             in_specs=(spec, spec),
                             out_specs=spec, check_vma=False))
  out = fn(xg, gl_in)
  return out.reshape(n, m)
