"""``sp.fft`` — numpy.fft-style spectral surface over lazy exprs.

The reference had no FFT (spartan's builtins stop at dense linear
algebra; SURVEY.md §2.1 builtins row) — this is a widening for the
NumPy-user surface.  Every transform is a lazy map over XLA's native FFT
lowering (TPU executes FFTs on-device); complex avals flow through the
DAG like any other dtype (map/reduce/slicing are dtype-agnostic).
``fftfreq``/``rfftfreq`` are tiny host-built leaves.

Multi-axis complex transforms (``fft2``/``ifft2``/``fftn``/``ifftn``)
DISTRIBUTE on >1-device meshes by pencil decomposition
(``--fft_pencil``, default on): local FFT over the trailing transform
axes while the leading one is sharded, ONE tiled ``all_to_all``
transpose over ICI, local FFT over the leading axis — O(n/p) memory and
compute per device.  Needs both pencil axes divisible by the mesh size;
other transforms (and the r-variants, whose last-axis length changes)
constrain their transform axes local instead, which replicates the
transform's compute but keeps batch dims sharded.

Backend note: the axon dev-tunnel runtime has no complex *buffer*
support (complex leaves/outputs/fetches abort UNIMPLEMENTED) — complex
values work there only as compile-internal values, so end chains in
``sp.real``/``sp.abs``/a real-valued reduction when running through the
tunnel.  Real TPU and CPU runtimes support complex arrays end-to-end.
"""

from __future__ import annotations

import functools

import numpy as np

import spartan_tpu as sp

__all__ = ["fft", "ifft", "rfft", "irfft", "fft2", "ifft2", "fftn",
           "ifftn", "rfft2", "irfft2", "rfftn", "irfftn", "hfft", "ihfft",
           "fftshift", "ifftshift", "fftfreq", "rfftfreq"]


def _transform_axes(name, kw, ndim):
  """Which dims the transform runs over (normalized, non-negative)."""
  if name in ("fftshift", "ifftshift"):
    return ()  # a roll, not an FFT — no locality requirement
  if name in ("fft", "ifft", "rfft", "irfft", "hfft", "ihfft"):
    axes = (kw.get("axis", -1),)
  else:  # fft2/ifft2/rfft2/irfft2/fftn/ifftn/rfftn/irfftn
    axes = kw.get("axes")
    if axes is None:
      axes = (tuple(range(ndim))
              if name in ("fftn", "ifftn", "rfftn", "irfftn") else (-2, -1))
  return tuple(a % ndim for a in axes)


# Complex multi-axis transforms that decompose into per-axis 1-D FFTs
# with no shape change — eligible for the pencil (transpose) algorithm.
_PENCIL_BASE = {"fft2": "fft", "ifft2": "ifft", "fftn": "fft",
                "ifftn": "ifft"}


def _pencil_fft(name, a, axes, mesh):
  """Distributed multi-axis FFT by pencil decomposition: FFT the trailing
  transform axes locally while the leading one is sharded, transpose the
  sharded axis with ONE ``all_to_all`` (O(n/p) bytes per device, rides
  ICI), FFT the leading axis locally.  O(n/p) memory and compute per
  device vs the replicated fallback's O(n) — the scaling-book
  transpose-FFT recipe.  Explicit shard_map rather than sharding
  constraints: the GSPMD constraint-flip formulation miscompiles on
  XLA:CPU for ndim>=3 (hlo-verifier INTERNAL after spmd-partitioning,
  jax 0.9) and leaves the collective choice to the partitioner."""
  import jax
  import jax.numpy as jnp
  from jax.sharding import PartitionSpec as P
  base = _PENCIL_BASE[name]
  names = tuple(mesh.axis_names)
  a1, ak = axes[0], axes[-1]
  in_spec = P(*[names if d == a1 else None for d in range(a.ndim)])
  out_spec = P(*[names if d == ak else None for d in range(a.ndim)])

  def body(xl):
    for ax in axes[1:]:
      xl = getattr(jnp.fft, base)(xl, axis=ax)
    xl = jax.lax.all_to_all(xl, names, split_axis=ak, concat_axis=a1,
                            tiled=True)
    return getattr(jnp.fft, base)(xl, axis=a1)

  return jax.shard_map(body, mesh=mesh, in_specs=(in_spec,),
                       out_specs=out_spec, check_vma=False)(a)


def _fft_call(name, kw, a):
  import jax
  import jax.numpy as jnp
  from jax.sharding import NamedSharding, PartitionSpec as P

  from spartan_tpu.config import FLAGS
  kw = dict(kw)
  axes = _transform_axes(name, kw, a.ndim)
  if axes:
    from spartan_tpu.core.mesh import get_mesh
    mesh = get_mesh()
    if mesh is not None and mesh.devices.size > 1:
      p = int(mesh.devices.size)
      if (FLAGS.fft_pencil and name in _PENCIL_BASE
          and len(set(axes)) == len(axes) >= 2
          and a.shape[axes[0]] % p == 0 and a.shape[axes[-1]] % p == 0):
        return _pencil_fft(name, a, axes, mesh)
      # Fallback: the transform axes whole on each device; constraining
      # them to None (others unconstrained) keeps batch dims sharded and
      # ALSO sidesteps an XLA:CPU fft-thunk layout RET_CHECK that aborts
      # chained fft programs whose transform axis is sharded (reproduced
      # on jax 0.9: jit(real∘ifft2∘fft2) over a last-axis-sharded input).
      spec = P(*[None if d in axes else P.UNCONSTRAINED
                 for d in range(a.ndim)])
      a = jax.lax.with_sharding_constraint(a, NamedSharding(mesh, spec))
  return getattr(jnp.fft, name)(a, **kw)


def _fft_map(v, name, **kw):
  kw = {k: w for k, w in kw.items() if w is not None}
  return sp.map([sp.lazify(v)],
                functools.partial(_fft_call, name, tuple(sorted(kw.items()))))


def fft(v, n=None, axis=-1):
  return _fft_map(v, "fft", n=n, axis=axis)


def ifft(v, n=None, axis=-1):
  return _fft_map(v, "ifft", n=n, axis=axis)


def rfft(v, n=None, axis=-1):
  return _fft_map(v, "rfft", n=n, axis=axis)


def irfft(v, n=None, axis=-1):
  return _fft_map(v, "irfft", n=n, axis=axis)


def fft2(v, axes=(-2, -1)):
  return _fft_map(v, "fft2", axes=tuple(axes))


def ifft2(v, axes=(-2, -1)):
  return _fft_map(v, "ifft2", axes=tuple(axes))


def fftn(v, axes=None):
  return _fft_map(v, "fftn", axes=None if axes is None else tuple(axes))


def ifftn(v, axes=None):
  return _fft_map(v, "ifftn", axes=None if axes is None else tuple(axes))


def rfft2(v, axes=(-2, -1)):
  return _fft_map(v, "rfft2", axes=tuple(axes))


def irfft2(v, axes=(-2, -1)):
  return _fft_map(v, "irfft2", axes=tuple(axes))


def rfftn(v, axes=None):
  return _fft_map(v, "rfftn", axes=None if axes is None else tuple(axes))


def irfftn(v, axes=None):
  return _fft_map(v, "irfftn", axes=None if axes is None else tuple(axes))


def hfft(v, n=None, axis=-1):
  return _fft_map(v, "hfft", n=n, axis=axis)


def ihfft(v, n=None, axis=-1):
  return _fft_map(v, "ihfft", n=n, axis=axis)


def fftshift(v, axes=None):
  return _fft_map(v, "fftshift", axes=None if axes is None else tuple(axes))


def ifftshift(v, axes=None):
  return _fft_map(v, "ifftshift",
                  axes=None if axes is None else tuple(axes))


def fftfreq(n, d=1.0):
  return sp.from_numpy(np.fft.fftfreq(int(n), d))


def rfftfreq(n, d=1.0):
  return sp.from_numpy(np.fft.rfftfreq(int(n), d))
