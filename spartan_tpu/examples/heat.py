"""2-D heat-equation (Jacobi diffusion) via the stencil surface.

Reference parity: the reference's stencil module existed exactly for
this class of workload — per-tile kernels with cross-tile halo fetches
(``spartan/expr/stencil.py``, SURVEY.md §2.1/§2.3 CP row).  TPU shape:
the 5-point Laplacian is a single-channel `sp.stencil`, which the r3
emission lowers to shifted-add slices (the XLA conv lowering is 100×
off roofline for O=I=1 — see `expr/stencil.py`); the whole time loop
runs on device in ONE compiled program via `sp.make_fori`, and on a
mesh the sharded-H slices get their halo exchanges from the SPMD
partitioner automatically.
"""

from __future__ import annotations

import numpy as np

import spartan_tpu as sp


def step(u, alpha: float = 0.1):
  """One explicit Euler step of u_t = alpha * laplace(u), zero-boundary."""
  lap = np.array([[0.0, 1.0, 0.0],
                  [1.0, -4.0, 1.0],
                  [0.0, 1.0, 0.0]])
  u4 = sp.lazify(u).reshape((1, 1) + tuple(sp.lazify(u).shape))
  out = u4 + alpha * sp.stencil(u4, sp.Val(lap.reshape(1, 1, 3, 3)))
  return out.reshape(tuple(sp.lazify(u).shape))


def simulate(u0, iters: int = 100, alpha: float = 0.1):
  """Run `iters` diffusion steps in one compiled on-device loop."""
  run = sp.make_fori(lambda u: step(u, alpha), sp.lazify(u0))
  return run(iters)


def simulate_padded(u0, iters: int = 100, alpha: float = 0.1,
                    unroll: int = 8, interpret: bool = False):
  """Diffusion steps over PRE-PADDED storage (VERDICT r3 next #3).

  The whole explicit-Euler step ``u + alpha*lap(u)`` is ONE 3x3 stencil
  with coefficients ``[[0,a,0],[a,1-4a,a],[0,a,0]]``, so each step is a
  single streaming pass of the padded-state Pallas kernel
  (``backend/kernels/stencil_pallas.stencil3x3_padded``) — no per-step
  ``jnp.pad`` pass, pad ring maintained at zero by buffer aliasing.
  ``unroll`` steps run inside one jitted program (a big-array fori carry
  feeding a pallas_call stalls the toolchain — CLAUDE.md), with a host
  loop over chunks.  Returns the final field as a numpy array."""
  import jax.numpy as jnp

  from spartan_tpu.backend.kernels import stencil_pallas as _stp

  a = float(alpha)
  coeffs = (0.0, a, 0.0, a, 1.0 - 4.0 * a, a, 0.0, a, 0.0)
  xp = _stp.to_padded(jnp.asarray(np.asarray(u0), dtype=jnp.float32))
  buf = jnp.zeros_like(xp)
  done = 0
  while done < iters:
    k = min(unroll, iters - done)
    xp, buf = _stp.stencil3x3_padded(xp, buf, coeffs, steps=k,
                                     interpret=interpret)
    done += k
  return np.asarray(_stp.from_padded(xp))


def simulate_numpy(u0, iters: int = 100, alpha: float = 0.1):
  u = np.asarray(u0, dtype=np.float64).copy()
  for _ in range(iters):
    up = np.pad(u, 1)
    lap = (up[:-2, 1:-1] + up[2:, 1:-1] + up[1:-1, :-2] + up[1:-1, 2:]
           - 4.0 * u)
    u = u + alpha * lap
  return u


def run(n: int = 256, iters: int = 200, seed: int = 0):
  rng = np.random.default_rng(seed)
  u0 = np.zeros((n, n))
  # a few hot spots diffusing outwards
  for _ in range(8):
    i, j = rng.integers(8, n - 8, 2)
    u0[i, j] = 100.0
  got = np.asarray(simulate(u0, iters).glom())
  want = simulate_numpy(u0, iters)
  err = float(np.abs(got - want).max())
  return err, float(got.sum())
