"""Differential tests for sp.signal vs scipy.signal (f64 CPU mesh)."""

import numpy as np
import pytest
import scipy.signal as ss

import spartan_tpu as sp

S = sp.signal
rng = np.random.default_rng(21)
x = rng.normal(size=128)
x2 = rng.normal(size=(3, 100))


def g(e):
  from spartan_tpu.expr.base import Expr
  return np.asarray(sp.lazify(e).glom()) if isinstance(e, Expr) \
      else np.asarray(e)


@pytest.mark.smoke
def test_convolutions_match_scipy():
  h = rng.normal(size=9)
  for mode in ("full", "same", "valid"):
    np.testing.assert_allclose(g(S.convolve(x, h, mode=mode)),
                               ss.convolve(x, h, mode=mode), atol=1e-12)
    np.testing.assert_allclose(g(S.correlate(x, h, mode=mode)),
                               ss.correlate(x, h, mode=mode), atol=1e-12)
    np.testing.assert_allclose(g(S.fftconvolve(x, h, mode=mode)),
                               ss.fftconvolve(x, h, mode=mode),
                               atol=1e-10)
  A = rng.normal(size=(12, 14))
  K = rng.normal(size=(3, 4))
  np.testing.assert_allclose(g(S.convolve2d(A, K, mode="same")),
                             ss.convolve2d(A, K, mode="same"), atol=1e-12)
  np.testing.assert_allclose(g(S.correlate2d(A, K, mode="valid")),
                             ss.correlate2d(A, K, mode="valid"),
                             atol=1e-12)
  np.testing.assert_allclose(g(S.oaconvolve(x, h)), ss.oaconvolve(x, h),
                             atol=1e-10)
  np.testing.assert_array_equal(S.correlation_lags(10, 5, "full"),
                                ss.correlation_lags(10, 5, "full"))


@pytest.mark.smoke
def test_lfilter_matches_scipy():
  b, a = ss.butter(4, 0.2)
  np.testing.assert_allclose(g(S.lfilter(b, a, x)),
                             ss.lfilter(b, a, x), atol=1e-10)
  # FIR (a = [1])
  h = ss.firwin(11, 0.3)
  np.testing.assert_allclose(g(S.lfilter(h, [1.0], x)),
                             ss.lfilter(h, [1.0], x), atol=1e-12)
  # batched along axis 1 of (3, 100)
  np.testing.assert_allclose(g(S.lfilter(b, a, x2, axis=-1)),
                             ss.lfilter(b, a, x2, axis=-1), atol=1e-10)
  np.testing.assert_allclose(g(S.lfilter(b, a, x2.T, axis=0)),
                             ss.lfilter(b, a, x2.T, axis=0), atol=1e-10)
  # zi / zf round trip
  zi = ss.lfilter_zi(b, a) * x[0]
  y_ours, zf_ours = S.lfilter(b, a, x, zi=zi)
  y_want, zf_want = ss.lfilter(b, a, x, zi=zi)
  np.testing.assert_allclose(g(y_ours), y_want, atol=1e-10)
  np.testing.assert_allclose(g(zf_ours), zf_want, atol=1e-10)


def test_filtfilt_and_sos():
  b, a = ss.butter(3, 0.25)
  np.testing.assert_allclose(g(S.filtfilt(b, a, x)),
                             ss.filtfilt(b, a, x), atol=1e-9)
  np.testing.assert_allclose(g(S.filtfilt(b, a, x2, axis=1)),
                             ss.filtfilt(b, a, x2, axis=1), atol=1e-9)
  sos = ss.butter(4, 0.2, output="sos")
  np.testing.assert_allclose(g(S.sosfilt(sos, x)),
                             ss.sosfilt(sos, x), atol=1e-10)
  np.testing.assert_allclose(g(S.sosfiltfilt(sos, x)),
                             ss.sosfiltfilt(sos, x), atol=1e-7)
  d = g(S.decimate(x, 4))
  w = ss.decimate(x, 4)
  np.testing.assert_allclose(d, w, atol=1e-8)


@pytest.mark.smoke
def test_spectral_family():
  f, P = S.welch(x, fs=10.0, nperseg=64)
  fw, Pw = ss.welch(x, fs=10.0, nperseg=64)
  np.testing.assert_allclose(f, fw)
  np.testing.assert_allclose(g(P), Pw, atol=1e-12)
  f, P = S.periodogram(x, fs=10.0)
  fw, Pw = ss.periodogram(x, fs=10.0)
  np.testing.assert_allclose(f, fw)
  np.testing.assert_allclose(g(P), Pw, atol=1e-12)
  y = rng.normal(size=128)
  f, Pxy = S.csd(x, y, nperseg=64)
  fw, Pxyw = ss.csd(x, y, nperseg=64)
  # complex spectra: compare magnitude/phase via real+imag
  np.testing.assert_allclose(g(sp.real(Pxy)), Pxyw.real, atol=1e-12)
  np.testing.assert_allclose(g(sp.imag(Pxy)), Pxyw.imag, atol=1e-12)
  f, C = S.coherence(x, y, nperseg=64)
  fw, Cw = ss.coherence(x, y, nperseg=64)
  np.testing.assert_allclose(g(C), Cw, atol=1e-10)
  f, t, Sxx = S.spectrogram(x, fs=8.0, nperseg=32, noverlap=8)
  fw, tw, Sw = ss.spectrogram(x, fs=8.0, nperseg=32, noverlap=8)
  np.testing.assert_allclose(f, fw)
  np.testing.assert_allclose(t, tw)
  np.testing.assert_allclose(g(Sxx), Sw, atol=1e-12)


def test_stft_istft_roundtrip():
  f, t, Z = S.stft(x, nperseg=32)
  fw, tw, Zw = ss.stft(x, nperseg=32)
  np.testing.assert_allclose(f, fw)
  np.testing.assert_allclose(t, tw)
  np.testing.assert_allclose(g(Z), Zw, atol=1e-12)
  tr, xr = S.istft(Z, nperseg=32)
  _, xrw = ss.istft(Zw, nperseg=32)
  np.testing.assert_allclose(g(xr), xrw, atol=1e-10)
  np.testing.assert_allclose(g(xr)[:128], x, atol=1e-10)


def test_hilbert_and_envelope():
  xa = np.cos(2 * np.pi * 5 * np.linspace(0, 1, 200))
  env = g(sp.absolute(S.hilbert(xa)))
  np.testing.assert_allclose(env, np.abs(ss.hilbert(xa)), atol=1e-10)
  A = rng.normal(size=(8, 8))
  np.testing.assert_allclose(g(sp.absolute(S.hilbert2(A))),
                             np.abs(ss.hilbert2(A)), atol=1e-10)


@pytest.mark.smoke
def test_resample_family():
  for num in (64, 200, 127):
    np.testing.assert_allclose(g(S.resample(x, num)),
                               ss.resample(x, num), atol=1e-10)
  # odd-length input
  xo = x[:127]
  np.testing.assert_allclose(g(S.resample(xo, 63)),
                             ss.resample(xo, 63), atol=1e-10)
  h = ss.firwin(21, 0.4)
  np.testing.assert_allclose(g(S.upfirdn(h, x, 3, 2)),
                             ss.upfirdn(h, x, 3, 2), atol=1e-12)
  np.testing.assert_allclose(g(S.resample_poly(x, 3, 2)),
                             ss.resample_poly(x, 3, 2), atol=1e-10)
  np.testing.assert_allclose(g(S.resample_poly(x, 2, 5)),
                             ss.resample_poly(x, 2, 5), atol=1e-10)


def test_smoothing_and_rank_filters():
  np.testing.assert_allclose(
      g(S.savgol_filter(x, 11, 3)), ss.savgol_filter(x, 11, 3),
      atol=1e-10)
  np.testing.assert_allclose(
      g(S.savgol_filter(x, 11, 3, deriv=1, delta=0.5)),
      ss.savgol_filter(x, 11, 3, deriv=1, delta=0.5), atol=1e-9)
  A = rng.normal(size=(10, 12))
  np.testing.assert_allclose(g(S.wiener(A, 3)), ss.wiener(A, 3),
                             atol=1e-10)
  np.testing.assert_allclose(g(S.medfilt(x, 5)), ss.medfilt(x, 5),
                             atol=1e-12)
  np.testing.assert_allclose(g(S.medfilt2d(A, 3)),
                             ss.medfilt2d(A, 3), atol=1e-12)
  dom = np.ones((3, 3), bool)
  np.testing.assert_allclose(g(S.order_filter(A, dom, 2)),
                             ss.order_filter(A, dom, 2), atol=1e-12)


def test_waveforms_match_scipy():
  t = np.linspace(0, 2, 101)
  np.testing.assert_allclose(g(S.square(t * 7, 0.3)),
                             ss.square(t * 7, 0.3), atol=1e-12)
  np.testing.assert_allclose(g(S.sawtooth(t * 7, 0.7)),
                             ss.sawtooth(t * 7, 0.7), atol=1e-12)
  for method in ("linear", "quadratic", "logarithmic", "hyperbolic"):
    np.testing.assert_allclose(
        g(S.chirp(t, 1.0, 2.0, 10.0, method=method)),
        ss.chirp(t, 1.0, 2.0, 10.0, method=method), atol=1e-9)
  tt = np.linspace(-1, 1, 51)
  np.testing.assert_allclose(g(S.gausspulse(tt, fc=5)),
                             ss.gausspulse(tt, fc=5), atol=1e-12)
  i, q, e = S.gausspulse(tt, fc=5, retquad=True, retenv=True)
  iw, qw, ew = ss.gausspulse(tt, fc=5, retquad=True, retenv=True)
  np.testing.assert_allclose(g(q), qw, atol=1e-12)
  np.testing.assert_allclose(g(e), ew, atol=1e-12)
  np.testing.assert_allclose(g(S.sweep_poly(t, [0.05, -0.75, 2.0, 5.0])),
                             ss.sweep_poly(t, [0.05, -0.75, 2.0, 5.0]),
                             atol=1e-9)
  np.testing.assert_array_equal(g(S.unit_impulse(7, "mid")),
                                ss.unit_impulse(7, "mid"))


def test_lombscargle_czt_zoomfft():
  tobs = np.sort(rng.uniform(0, 10, 60))
  yobs = np.sin(2 * np.pi * 0.7 * tobs) + 0.1 * rng.normal(size=60)
  freqs = np.linspace(0.1, 2.0, 40) * 2 * np.pi
  np.testing.assert_allclose(g(S.lombscargle(tobs, yobs, freqs)),
                             ss.lombscargle(tobs, yobs, freqs),
                             rtol=1e-7, atol=1e-10)
  # czt with default w reproduces the DFT
  Z = g(S.czt(x, m=128))
  np.testing.assert_allclose(Z, np.fft.fft(x), atol=1e-8)
  zf = g(S.zoom_fft(x, [0.1, 0.4], m=32, fs=1.0))
  zfw = ss.zoom_fft(x, [0.1, 0.4], m=32, fs=1.0)
  np.testing.assert_allclose(zf, zfw, atol=1e-8)
  vs, va = S.vectorstrength(np.array([0.1, 0.2, 0.3]), 1.0)
  vsw, vaw = ss.vectorstrength(np.array([0.1, 0.2, 0.3]), 1.0)
  assert abs(float(g(vs)) - vsw) < 1e-12
  assert abs(float(g(va)) - vaw) < 1e-12
  np.testing.assert_allclose(g(S.gauss_spline(x, 3)),
                             ss.gauss_spline(x, 3), atol=1e-12)
  np.testing.assert_allclose(g(S.detrend(x)), ss.detrend(x), atol=1e-12)


def test_host_reexports_work():
  b, a = S.butter(4, 0.2)
  bw, aw = ss.butter(4, 0.2)
  np.testing.assert_allclose(b, bw)
  assert S.butter is ss.butter  # re-export, not a copy
  peaks, props = S.find_peaks(np.sin(np.linspace(0, 20, 200)))
  assert len(peaks) == 3
  assert S.StateSpace is ss.StateSpace
  w = S.get_window("hann", 16)
  np.testing.assert_allclose(w, ss.get_window("hann", 16))


def test_signal_parity_audit_clean():
  import importlib.util
  spec = importlib.util.spec_from_file_location(
      "scipy_parity", "tools/scipy_parity.py")
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  rows = {r["ns"]: r for r in mod.audit()}
  assert rows["signal"]["missing"] == []
  assert rows["signal"]["stale"] == []


def test_oscillator_example():
  from spartan_tpu.examples import oscillator
  got, want = oscillator.run()
  # Welch bin resolution at nperseg=512, fs~51: ~0.1 Hz bins
  assert abs(got - want) < 0.06, (got, want)


def test_code_review_r5s5_signal_regressions():
  """Fixes from the review pass: N-D zi layout, two-sided csd grids,
  oversized nperseg, even savgol windows, scalar unit_impulse idx,
  czt c128 precision, odd-nperseg stft grid, SOS-form sosfiltfilt,
  array windows for resample_poly."""
  b, a = ss.butter(3, 0.2)
  X = rng.normal(size=(3, 50))
  zi = np.repeat(ss.lfilter_zi(b, a)[None, :], 3, axis=0) \
      * X[:, :1]
  y_o, zf_o = S.lfilter(b, a, X, axis=-1, zi=zi)
  y_w, zf_w = ss.lfilter(b, a, X, axis=-1, zi=zi)
  np.testing.assert_allclose(g(y_o), y_w, atol=1e-10)
  np.testing.assert_allclose(g(zf_o), zf_w, atol=1e-10)
  # two-sided csd: matching f / Pxy lengths
  y2 = rng.normal(size=128)
  f2, P2 = S.csd(x, y2, nperseg=64, return_onesided=False)
  fw2, Pw2 = ss.csd(x, y2, nperseg=64, return_onesided=False)
  assert f2.shape == fw2.shape
  np.testing.assert_allclose(g(sp.real(P2)), Pw2.real, atol=1e-12)
  with pytest.raises(NotImplementedError):
    S.csd(x, y2, average="median")
  # oversized nperseg clamps like scipy (which warns)
  import warnings
  with warnings.catch_warnings():
    warnings.simplefilter("ignore")
    fo, Po = S.welch(x, nperseg=512)
    fwo, Pwo = ss.welch(x, nperseg=512)
  assert fo.shape == fwo.shape
  np.testing.assert_allclose(g(Po), Pwo, atol=1e-12)
  # even savgol window, deriv included
  np.testing.assert_allclose(g(S.savgol_filter(x, 10, 3)),
                             ss.savgol_filter(x, 10, 3), atol=1e-10)
  np.testing.assert_allclose(g(S.savgol_filter(x, 10, 3, deriv=1)),
                             ss.savgol_filter(x, 10, 3, deriv=1),
                             atol=1e-9)
  # unit_impulse scalar idx on 2-D
  np.testing.assert_array_equal(g(S.unit_impulse((3, 3), 1)),
                                ss.unit_impulse((3, 3), 1))
  # czt keeps c128 (x64 mesh)
  from spartan_tpu.expr.base import Expr
  z = S.czt(x + 0j if False else x, m=64)
  assert g(z).dtype == np.complex128
  # stft odd nperseg: integer t grid
  f3, t3, _ = S.stft(x, nperseg=33)
  fw3, tw3, _ = ss.stft(x, nperseg=33)
  np.testing.assert_allclose(t3, tw3)
  f4, t4, Z4 = S.stft(x, nperseg=32, boundary=None)
  fw4, tw4, Zw4 = ss.stft(x, nperseg=32, boundary=None)
  np.testing.assert_allclose(t4, tw4)
  np.testing.assert_allclose(g(Z4), Zw4, atol=1e-12)
  # high-order SOS zero-phase stays accurate (section form)
  sos16 = ss.butter(16, 0.1, output="sos")
  np.testing.assert_allclose(g(S.sosfiltfilt(sos16, x)),
                             ss.sosfiltfilt(sos16, x), atol=1e-9)
  # array window = user FIR for resample_poly
  h = ss.firwin(21, 1 / 3, window=("kaiser", 5.0))
  np.testing.assert_allclose(g(S.resample_poly(x, 3, 2, window=h)),
                             ss.resample_poly(x, 3, 2, window=h),
                             atol=1e-10)
  # named window for FFT resample (frequency-domain multiplier)
  np.testing.assert_allclose(g(S.resample(x, 64, window="hann")),
                             ss.resample(x, 64, window="hann"),
                             atol=1e-10)
