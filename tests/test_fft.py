"""sp.fft — numpy.fft-style spectral surface (no reference equivalent;
widening for the NumPy-user surface, SURVEY.md §2.1 builtins row)."""

import numpy as np

import spartan_tpu as sp


def test_fft_roundtrip_and_parity(rng, cluster):
  z = rng.standard_normal((16, 32)) + 1j * rng.standard_normal((16, 32))
  Z = sp.from_numpy(z)
  np.testing.assert_allclose(np.asarray(sp.fft.fft(Z).glom()),
                             np.fft.fft(z), rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(np.asarray(sp.fft.ifft(sp.fft.fft(Z)).glom()),
                             z, rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(np.asarray(sp.fft.fft2(Z).glom()),
                             np.fft.fft2(z), rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(np.asarray(sp.fft.fftn(Z).glom()),
                             np.fft.fftn(z), rtol=1e-9, atol=1e-9)


def test_rfft_and_shift(rng, cluster):
  r = rng.standard_normal((8, 64))
  R = sp.from_numpy(r)
  np.testing.assert_allclose(np.asarray(sp.fft.rfft(R).glom()),
                             np.fft.rfft(r), rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(
      np.asarray(sp.fft.irfft(sp.fft.rfft(R), n=64).glom()), r,
      rtol=1e-9, atol=1e-9)
  np.testing.assert_allclose(np.asarray(sp.fft.rfft2(R).glom()),
                             np.fft.rfft2(r), rtol=1e-9, atol=1e-9)
  z = np.fft.fft(r[0])
  np.testing.assert_allclose(
      np.asarray(sp.fft.fftshift(sp.from_numpy(z)).glom()),
      np.fft.fftshift(z), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(sp.fft.fftfreq(64, d=0.5).glom()),
                             np.fft.fftfreq(64, d=0.5), rtol=1e-12)
  np.testing.assert_allclose(np.asarray(sp.fft.rfftfreq(64).glom()),
                             np.fft.rfftfreq(64), rtol=1e-12)


def test_fft_composes_with_dag(rng, cluster):
  """Spectral filtering pipeline: fft -> mask -> ifft -> real, all lazy."""
  r = rng.standard_normal(128)
  spec = sp.fft.fft(sp.from_numpy(r))
  k = np.abs(np.fft.fftfreq(128))
  keep = sp.from_numpy((k < 0.1).astype(np.complex128))
  filtered = np.asarray(sp.real(sp.fft.ifft(spec * keep)).glom())
  want = np.real(np.fft.ifft(np.fft.fft(r) * (k < 0.1)))
  np.testing.assert_allclose(filtered, want, rtol=1e-9, atol=1e-12)


def test_fft_sharded_transform_axis(rng, cluster):
  """Chained fft programs over arrays sharded on the TRANSFORM axis must
  not hit the XLA:CPU fft-thunk layout abort — the emission constrains
  transform axes local (batch dims stay sharded)."""
  u = rng.standard_normal((256, 256))
  U = sp.from_numpy(u, tile_hint=(256, 32))     # column-sharded
  got = np.asarray(
      sp.real(sp.fft.ifft2(sp.fft.fft2(U) * 0.5)).glom())
  np.testing.assert_allclose(
      got, np.real(np.fft.ifft2(np.fft.fft2(u) * 0.5)), atol=1e-10)
  # batched 1-D fft keeps the row sharding on the batch dim
  got1 = np.asarray(sp.abs(sp.fft.fft(U)).glom())
  np.testing.assert_allclose(got1, np.abs(np.fft.fft(u)), atol=1e-9)
