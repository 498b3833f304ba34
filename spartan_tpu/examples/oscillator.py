"""Driven oscillator: simulate with the fused RK45 loop, denoise with
the zero-phase filter scans, recover the resonance with the device
spectral estimator — the r5 integrate/signal surfaces composed into one
workload (beyond the reference's example set, SURVEY.md §2.5).

Pipeline (everything after the host filter DESIGN runs on device):
1. ``sp.integrate.solve_ivp`` — a damped driven oscillator integrated
   by the one-while_loop adaptive RK45 (t_eval filled in-loop).
2. additive noise, then ``sp.signal.filtfilt`` (two lax.scan passes).
3. ``sp.signal.welch`` — device FFT PSD; the argmax bin recovers the
   natural frequency.
"""

from __future__ import annotations

import numpy as np

import spartan_tpu as sp


def simulate(omega: float = 2.0, zeta: float = 0.05, tf: float = 40.0,
             n_samples: int = 2048, rtol: float = 1e-8):
  """Integrate ``x'' + 2ζω x' + ω² x = 0`` from x(0)=1 — returns
  (t, x) with x sampled on a uniform grid by the in-loop Hermite
  fill."""
  import jax.numpy as jnp
  t_eval = np.linspace(0.0, tf, n_samples)

  def f(t, y):
    return jnp.stack([y[1], -2 * zeta * omega * y[1]
                      - omega * omega * y[0]])

  res = sp.integrate.solve_ivp(f, (0.0, tf), [1.0, 0.0], t_eval=t_eval,
                               rtol=rtol, atol=rtol * 1e-2)
  if not res.success:
    raise RuntimeError("integration failed")
  return t_eval, res.y[0]


def recover_frequency(t, x, noise: float = 0.3, seed: int = 0):
  """Noise + zero-phase low-pass + Welch PSD peak → f_natural (Hz)."""
  rng = np.random.default_rng(seed)
  fs = 1.0 / (t[1] - t[0])
  noisy = x + noise * rng.standard_normal(x.shape)
  b, a = sp.signal.butter(4, 0.2)                 # host design
  clean = sp.signal.filtfilt(b, a, noisy)         # device scans
  f, P = sp.signal.welch(clean, fs=fs, nperseg=512)
  k = int(np.argmax(np.asarray(sp.lazify(P).glom())))
  return float(f[k])


def run(omega: float = 2.0, zeta: float = 0.05):
  """Full pipeline; returns (recovered_hz, expected_hz)."""
  t, x = simulate(omega=omega, zeta=zeta)
  got = recover_frequency(t, x)
  want = omega * np.sqrt(1 - zeta ** 2) / (2 * np.pi)
  return got, want
