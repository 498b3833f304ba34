"""``sp.signal`` — the scipy.signal surface, TPU-first.

The reference has no signal module (beyond-parity surface, the
sp.optimize/sp.integrate pattern).  Classification:

* **Device compute-on-data core** (lazy map nodes / fused loops):
  convolutions (XLA ``conv_general_dilated`` / FFT — MXU/fused),
  ``lfilter`` as ONE ``lax.scan`` over the transposed direct-form II
  state (the per-sample IIR recurrence never leaves the device),
  ``filtfilt``/``sosfilt``/``sosfiltfilt`` riding the same scans,
  spectral estimation (welch/periodogram/csd/coherence/spectrogram/
  stft/istft over the device FFT), ``hilbert`` (complex-INTERNAL fft;
  note the axon tunnel cannot FETCH complex buffers — end chains in
  abs/real there, fft.py docstring), FFT ``resample``, polyphase
  ``resample_poly``/``upfirdn`` (upsample-conv-slice), ``decimate``,
  ``savgol_filter``, ``wiener``, ``medfilt``/``order_filter`` (static
  sliding-window rank selects), waveform generators, ``lombscargle``,
  ``czt``/``zoom_fft`` (Bluestein over the device FFT),
  ``detrend``/``vectorstrength``/``gauss_spline``.
* **Host design-time utilities, re-exported from scipy**: filter
  DESIGN (butter/cheby/ellip/bessel/fir*/iir*/remez/kaiser*/...),
  representation conversions (tf2*/zpk2*/sos2*/ss2*), frequency-
  response evaluators, the LTI class family and simulators, peak
  finding (variable-length outputs — the NotShapeable rule), spline
  filters.  These compute COEFFICIENTS from scalars, not data-plane
  array work; re-export keeps isinstance/warning interop exact (the
  sparse_linalg.SuperLU convention).
"""

from __future__ import annotations

import numpy as np

import spartan_tpu as sp

# ---------------------------------------------------------------------
# host design-time re-exports (coefficients in, coefficients out — no
# data-plane arrays; scipy's host numpy IS the right tool)
# ---------------------------------------------------------------------

_REEXPORT = [
    # filter design
    "butter", "buttord", "buttap", "cheby1", "cheb1ord", "cheb1ap",
    "cheby2", "cheb2ord", "cheb2ap", "ellip", "ellipord", "ellipap",
    "bessel", "besselap", "iirfilter", "iirdesign", "iirnotch",
    "iirpeak", "iircomb", "firwin", "firwin2", "firwin_2d", "firls",
    "remez", "minimum_phase", "gammatone", "kaiser_atten", "kaiser_beta",
    "kaiserord", "findfreqs", "band_stop_obj",
    # analog→digital + prototype transforms
    "bilinear", "bilinear_zpk", "lp2bp", "lp2bp_zpk", "lp2bs",
    "lp2bs_zpk", "lp2hp", "lp2hp_zpk", "lp2lp", "lp2lp_zpk",
    "normalize", "abcd_normalize", "cont2discrete",
    # representation conversions
    "tf2zpk", "tf2sos", "tf2ss", "zpk2tf", "zpk2sos", "zpk2ss",
    "sos2tf", "sos2zpk", "ss2tf", "ss2zpk", "unique_roots", "invres",
    "invresz", "residue", "residuez",
    # frequency-response evaluators (coefficient-plane)
    "freqz", "freqs", "freqz_zpk", "freqs_zpk", "sosfreqz", "freqz_sos",
    "group_delay", "bode", "dbode", "freqresp", "dfreqresp",
    # LTI classes + simulators (host driver objects)
    "lti", "dlti", "StateSpace", "TransferFunction", "ZerosPolesGain",
    "lsim", "dlsim", "impulse", "dimpulse", "step", "dstep",
    "place_poles",
    # peaks & extrema (variable-length outputs — NotShapeable rule)
    "find_peaks", "find_peaks_cwt", "peak_prominences", "peak_widths",
    "argrelextrema", "argrelmax", "argrelmin",
    # splines / special filters (sequential host recursions)
    "cspline1d", "cspline1d_eval", "cspline2d", "qspline1d",
    "qspline1d_eval", "qspline2d", "spline_filter", "symiirorder1",
    "symiirorder2", "sepfir2d",
    # STFT framework objects + checks
    "ShortTimeFFT", "check_COLA", "check_NOLA",
    "closest_STFT_dual_window", "CZT", "ZoomFFT", "czt_points",
    # misc host utilities
    "BadCoefficients", "get_window", "max_len_seq", "deconvolve",
    "envelope", "lfilter_zi", "lfiltic", "sosfilt_zi",
    "choose_conv_method",
]

import scipy.signal as _ss  # noqa: E402

for _n in _REEXPORT:
  globals()[_n] = getattr(_ss, _n)

__all__ = list(_REEXPORT) + [
    "convolve", "correlate", "fftconvolve", "oaconvolve", "convolve2d",
    "correlate2d", "correlation_lags", "detrend", "lfilter", "filtfilt",
    "sosfilt", "sosfiltfilt", "hilbert", "hilbert2", "periodogram",
    "welch", "csd", "coherence", "spectrogram", "stft", "istft",
    "resample", "resample_poly", "upfirdn", "decimate", "savgol_filter",
    "savgol_coeffs", "wiener", "medfilt", "medfilt2d", "order_filter",
    "square", "sawtooth", "chirp", "gausspulse", "sweep_poly",
    "unit_impulse", "lombscargle", "czt", "zoom_fft", "vectorstrength",
    "gauss_spline",
]


def _jss_map(name, kw, *arrays):
  """One lazy map node over jax.scipy.signal.<name> (the scipy_linalg
  _jsl_call pattern)."""
  def kern(*xs):
    import jax.scipy.signal as jss
    return getattr(jss, name)(*xs, **dict(kw))
  return sp.map([sp.lazify(a) for a in arrays], kern)


def convolve(in1, in2, mode: str = "full", method: str = "auto"):
  """N-D convolution — XLA ``conv_general_dilated`` (MXU for 2-D) or
  the device FFT (``method='fft'``), one lazy node."""
  if method == "fft":
    return fftconvolve(in1, in2, mode=mode)
  return _jss_map("convolve", (("mode", mode),), in1, in2)


def correlate(in1, in2, mode: str = "full", method: str = "auto"):
  return _jss_map("correlate", (("mode", mode),), in1, in2)


def fftconvolve(in1, in2, mode: str = "full", axes=None):
  kw = (("mode", mode),) + ((("axes", tuple(np.atleast_1d(axes))),)
                            if axes is not None else ())
  return _jss_map("fftconvolve", kw, in1, in2)


def oaconvolve(in1, in2, mode: str = "full", axes=None):
  """Overlap-add convolution — routed to the device fftconvolve (XLA
  fuses the one-shot transform; the overlap-add blocking is a host
  streaming optimization this execution model doesn't need)."""
  return fftconvolve(in1, in2, mode=mode, axes=axes)


def convolve2d(in1, in2, mode: str = "full", boundary: str = "fill",
               fillvalue: float = 0):
  return _jss_map("convolve2d",
                  (("mode", mode), ("boundary", boundary),
                   ("fillvalue", fillvalue)), in1, in2)


def correlate2d(in1, in2, mode: str = "full", boundary: str = "fill",
                fillvalue: float = 0):
  return _jss_map("correlate2d",
                  (("mode", mode), ("boundary", boundary),
                   ("fillvalue", fillvalue)), in1, in2)


def correlation_lags(in1_len: int, in2_len: int, mode: str = "full"):
  return _ss.correlation_lags(in1_len, in2_len, mode=mode)


def detrend(data, axis: int = -1, type: str = "linear", bp=0,
            overwrite_data=False):
  del overwrite_data
  if np.ndim(bp) or bp != 0:
    raise NotImplementedError("detrend with breakpoints routes host — "
                              "use scipy.signal.detrend")
  return _jss_map("detrend", (("axis", axis), ("type", type)), data)


# ---------------------------------------------------------------------
# IIR filtering — one lax.scan over the transposed direct-form II state
# ---------------------------------------------------------------------

def lfilter(b, a, x, axis: int = -1, zi=None):
  """IIR/FIR filter along ``axis`` — the whole per-sample recurrence is
  ONE ``lax.scan`` carrying the transposed direct-form II state
  (k = max(len(a), len(b)) - 1 registers), batched over every other
  axis.  Returns ``y`` (and the final state when ``zi`` is given),
  matching scipy bit-for-bit on the same recurrence."""
  b = np.atleast_1d(np.asarray(sp.lazify(b).glom(), dtype=np.float64))
  a = np.atleast_1d(np.asarray(sp.lazify(a).glom(), dtype=np.float64))
  if a[0] == 0:
    raise ValueError("a[0] must be nonzero")
  k = max(a.size, b.size) - 1
  bn = np.zeros(k + 1)
  bn[:b.size] = b / a[0]
  an = np.zeros(k + 1)
  an[:a.size] = a / a[0]
  X = sp.lazify(x)
  nd = len(X.shape)
  ax = axis % nd
  n = X.shape[ax]
  batch_shape = tuple(s for i, s in enumerate(X.shape) if i != ax)
  Bc = int(np.prod(batch_shape)) if batch_shape else 1

  def kern(*ops):
    import jax
    import jax.numpy as jnp
    xx = ops[0]
    z0 = ops[1] if len(ops) > 1 else None
    dt = jnp.result_type(xx.dtype, jnp.float32)
    bj = jnp.asarray(bn, dt)
    aj = jnp.asarray(an, dt)
    xf = jnp.moveaxis(xx.astype(dt), ax, 0).reshape(n, Bc)
    if z0 is None:
      z_init = jnp.zeros((k, Bc), dt)
    elif z0.ndim == xx.ndim:
      # zi has x's layout with length k on the filter axis — move it
      # to the front BEFORE flattening (a bare reshape scrambles
      # which state belongs to which batch row — code review r5s5)
      z_init = jnp.moveaxis(z0.astype(dt), ax, 0).reshape(k, Bc)
    else:
      z_init = jnp.broadcast_to(z0.astype(dt).reshape(k, -1), (k, Bc))

    def stepf(z, xt):
      if k == 0:
        return z, bj[0] * xt
      y = bj[0] * xt + z[0]
      znew = jnp.concatenate([z[1:], jnp.zeros((1, Bc), dt)], axis=0)
      znew = znew + bj[1:, None] * xt[None, :] \
          - aj[1:, None] * y[None, :]
      return znew, y

    zf, yf = jax.lax.scan(stepf, z_init, xf)
    if z0 is None:
      return jnp.moveaxis(yf.reshape((n,) + batch_shape), 0, ax)
    return jnp.concatenate([yf, zf], axis=0)   # (n + k, B) flat pack

  if zi is None:
    return sp.map([X], kern)
  Z = sp.lazify(zi)
  if Z.shape[ax if len(Z.shape) == nd else 0] != k and Z.shape != (k,):
    raise ValueError(f"zi must carry {k} states along the filter axis")
  st = sp.map([X, Z], kern)                    # (n + k, B)
  y = sp.moveaxis(sp.reshape(st[:n], (n,) + batch_shape), 0, ax)
  zf = sp.reshape(st[n:], (k,) + batch_shape)
  if len(Z.shape) == 1:
    zf = sp.reshape(st[n:, :1], (k,))
  elif ax != 0:
    zf = sp.moveaxis(zf, 0, ax)
  return y, zf


def filtfilt(b, a, x, axis: int = -1, padtype: str = "odd",
             padlen=None, method: str = "pad", irlen=None):
  """Zero-phase forward-backward filtering — scipy's odd-extension
  padding + two device lfilter scans (initial states from
  ``lfilter_zi`` scaled by the edge samples, the scipy recipe)."""
  del method, irlen
  b = np.atleast_1d(np.asarray(sp.lazify(b).glom(), dtype=float))
  a = np.atleast_1d(np.asarray(sp.lazify(a).glom(), dtype=float))
  X = sp.lazify(x)
  nd = len(X.shape)
  ax = axis % nd
  n = X.shape[ax]
  ntaps = max(len(a), len(b))
  if padlen is None:
    padlen = 3 * ntaps
  padlen = int(padlen)
  if padlen >= n:
    raise ValueError("The length of the input vector x must be greater "
                     "than padlen, which is %d." % padlen)
  if padtype not in ("odd", "even", "constant", None):
    raise ValueError(f"unknown padtype {padtype!r}")

  zi = _ss.lfilter_zi(b, a)  # (k,) host — tiny companion solve

  def kern(xx):
    import jax
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    xm = jnp.moveaxis(xx.astype(dt), ax, 0)
    bs = xm.shape[1:]
    xf = xm.reshape(xm.shape[0], -1)
    if padlen and padtype is not None:
      first, last = xf[0], xf[-1]
      pre = xf[1:padlen + 1][::-1]
      post = xf[-padlen - 1:-1][::-1]
      if padtype == "odd":
        pre = 2 * first[None] - pre
        post = 2 * last[None] - post
      elif padtype == "constant":
        pre = jnp.broadcast_to(first[None], pre.shape)
        post = jnp.broadcast_to(last[None], post.shape)
      ext = jnp.concatenate([pre, xf, post], axis=0)
    else:
      ext = xf
    zj = jnp.asarray(zi, dt)
    bj = jnp.asarray(b, dt)
    aj = jnp.asarray(a, dt)
    k = max(len(a), len(b)) - 1
    bn = jnp.zeros(k + 1, dt).at[:len(b)].set(bj / aj[0])
    an = jnp.zeros(k + 1, dt).at[:len(a)].set(aj / aj[0])

    def run(sig, z0):
      def stepf(z, xt):
        y = bn[0] * xt + z[0]
        zn = jnp.concatenate([z[1:], jnp.zeros((1,) + z.shape[1:], dt)])
        zn = zn + bn[1:, None] * xt[None, :] - an[1:, None] * y[None, :]
        return zn, y
      _, y = jax.lax.scan(stepf, z0, sig)
      return y

    z0 = zj[:, None] * ext[0][None, :]
    y1 = run(ext, z0)
    z0b = zj[:, None] * y1[-1][None, :]
    y2 = run(y1[::-1], z0b)[::-1]
    core = y2[padlen:padlen + xm.shape[0]] if padtype is not None \
        else y2
    return jnp.moveaxis(core.reshape((xm.shape[0],) + bs), 0, ax)

  return sp.map([X], kern)


def sosfilt(sos, x, axis: int = -1, zi=None):
  """Second-order-sections filter — ONE ``lax.scan`` whose body runs
  the (unrolled, nsec is small) cascade of biquads per sample."""
  sos = np.atleast_2d(np.asarray(sp.lazify(sos).glom(), dtype=float))
  if sos.shape[1] != 6:
    raise ValueError("sos must be (n_sections, 6)")
  nsec = sos.shape[0]
  X = sp.lazify(x)
  nd = len(X.shape)
  ax = axis % nd
  if zi is not None:
    raise NotImplementedError("sosfilt zi= routes through scipy — use "
                              "sosfiltfilt for zero-phase startup")

  def kern(xx):
    import jax
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    s = jnp.asarray(sos, dt)
    xm = jnp.moveaxis(xx.astype(dt), ax, 0)
    bs = xm.shape[1:]
    xf = xm.reshape(xm.shape[0], -1)
    Bc = xf.shape[1]

    def stepf(z, xt):
      # z: (nsec, 2, B) transposed DF-II states
      y = xt
      zs = []
      for j in range(nsec):
        b0, b1, b2, a0, a1, a2 = s[j]
        yj = b0 / a0 * y + z[j, 0]
        z0n = b1 / a0 * y + z[j, 1] - a1 / a0 * yj
        z1n = b2 / a0 * y - a2 / a0 * yj
        zs.append(jnp.stack([z0n, z1n]))
        y = yj
      return jnp.stack(zs), y

    z0 = jnp.zeros((nsec, 2, Bc), dt)
    _, yf = jax.lax.scan(stepf, z0, xf)
    return jnp.moveaxis(yf.reshape((xm.shape[0],) + bs), 0, ax)

  return sp.map([X], kern)


def sosfiltfilt(sos, x, axis: int = -1, padtype: str = "odd",
                padlen=None):
  """Zero-phase SOS filtering IN SECTION FORM — forward/backward
  cascades of biquad scans with sosfilt_zi startup states (collapsing
  to a transfer function would throw away the numerical robustness SOS
  exists for — code review r5s5)."""
  sos = np.atleast_2d(np.asarray(sp.lazify(sos).glom(), dtype=float))
  if sos.shape[1] != 6:
    raise ValueError("sos must be (n_sections, 6)")
  nsec = sos.shape[0]
  X = sp.lazify(x)
  nd = len(X.shape)
  ax = axis % nd
  n = X.shape[ax]
  # scipy's default edge: 3 * effective tap count (trailing zero taps
  # shorten the transient)
  ntaps = 2 * nsec + 1
  ntaps -= min(int((sos[:, 2] == 0).sum()), int((sos[:, 5] == 0).sum()))
  if padlen is None:
    padlen = 3 * ntaps
  padlen = int(padlen)
  if padlen >= n:
    raise ValueError("The length of the input vector x must be greater "
                     "than padlen, which is %d." % padlen)
  if padtype not in ("odd", "even", "constant", None):
    raise ValueError(f"unknown padtype {padtype!r}")
  zi = _ss.sosfilt_zi(sos)  # (nsec, 2) host startup states

  def kern(xx):
    import jax
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    s = jnp.asarray(sos, dt)
    zj = jnp.asarray(zi, dt)
    xm = jnp.moveaxis(xx.astype(dt), ax, 0)
    bs = xm.shape[1:]
    xf = xm.reshape(xm.shape[0], -1)
    if padlen and padtype is not None:
      first, last = xf[0], xf[-1]
      pre = xf[1:padlen + 1][::-1]
      post = xf[-padlen - 1:-1][::-1]
      if padtype == "odd":
        pre = 2 * first[None] - pre
        post = 2 * last[None] - post
      elif padtype == "constant":
        pre = jnp.broadcast_to(first[None], pre.shape)
        post = jnp.broadcast_to(last[None], post.shape)
      ext = jnp.concatenate([pre, xf, post], axis=0)
    else:
      ext = xf

    def run(sig, z0):
      def stepf(z, xt):
        y = xt
        zs = []
        for j in range(nsec):
          b0, b1, b2, a0, a1, a2 = s[j]
          yj = b0 / a0 * y + z[j, 0]
          z0n = b1 / a0 * y + z[j, 1] - a1 / a0 * yj
          z1n = b2 / a0 * y - a2 / a0 * yj
          zs.append(jnp.stack([z0n, z1n]))
          y = yj
        return jnp.stack(zs), y
      _, out = jax.lax.scan(stepf, z0, sig)
      return out

    z0 = zj[:, :, None] * ext[0][None, None, :]
    y1 = run(ext, z0)
    z0b = zj[:, :, None] * y1[-1][None, None, :]
    y2 = run(y1[::-1], z0b)[::-1]
    core = y2[padlen:padlen + xm.shape[0]] if padtype is not None else y2
    return jnp.moveaxis(core.reshape((xm.shape[0],) + bs), 0, ax)

  return sp.map([X], kern)


# ---------------------------------------------------------------------
# spectral estimation (device FFT)
# ---------------------------------------------------------------------

def _spec2(name, kw, x, y=None):
  """welch/csd/stft return (f, [t,] Pxx) — the frequency/time grids are
  shape-only (host), the spectrum is the lazy device output."""
  args = (x,) if y is None else (x, y)
  return _jss_map(name, kw, *args)


def _seg_params(n, nperseg, nfft):
  """scipy's segment clamping: nperseg > n shrinks to n (with scipy
  emitting a warning), nfft defaults to nperseg — the host-side grid
  and the kernel must agree on the CLAMPED values."""
  nps = min(int(nperseg) if nperseg else min(256, n), n)
  nf = int(nfft) if nfft else nps
  return nps, max(nf, nps)


def welch(x, fs: float = 1.0, window="hann", nperseg=None,
          noverlap=None, nfft=None, detrend="constant",
          return_onesided: bool = True, scaling: str = "density",
          axis: int = -1, average: str = "mean"):
  if average != "mean":
    raise NotImplementedError("average='median' routes host")
  X = sp.lazify(x)
  n = X.shape[axis % len(X.shape)]
  nps, nf = _seg_params(n, nperseg, nfft)
  f = (np.fft.rfftfreq(nf, 1.0 / fs) if return_onesided
       else np.fft.fftfreq(nf, 1.0 / fs))
  kw = (("fs", fs), ("window", window), ("nperseg", nps),
        ("noverlap", noverlap), ("nfft", nf), ("detrend", detrend),
        ("return_onesided", return_onesided), ("scaling", scaling),
        ("axis", axis))

  def kern(xx):
    import jax.scipy.signal as jss
    return jss.welch(xx, **dict(kw))[1]

  return f, sp.map([X], kern)


def csd(x, y, fs: float = 1.0, window="hann", nperseg=None,
        noverlap=None, nfft=None, detrend="constant",
        return_onesided: bool = True, scaling: str = "density",
        axis: int = -1, average: str = "mean"):
  if average != "mean":
    raise NotImplementedError("average='median' routes host")
  X, Y = sp.lazify(x), sp.lazify(y)
  n = X.shape[axis % len(X.shape)]
  nps, nf = _seg_params(n, nperseg, nfft)
  f = (np.fft.rfftfreq(nf, 1.0 / fs) if return_onesided
       else np.fft.fftfreq(nf, 1.0 / fs))
  kw = (("fs", fs), ("window", window), ("nperseg", nps),
        ("noverlap", noverlap), ("nfft", nf), ("detrend", detrend),
        ("return_onesided", return_onesided), ("scaling", scaling),
        ("axis", axis))

  def kern(xx, yy):
    import jax.scipy.signal as jss
    return jss.csd(xx, yy, **dict(kw))[1]

  return f, sp.map([X, Y], kern)


def periodogram(x, fs: float = 1.0, window="boxcar", nfft=None,
                detrend="constant", return_onesided: bool = True,
                scaling: str = "density", axis: int = -1):
  """One-segment Welch (scipy's definition: nperseg = signal length)."""
  X = sp.lazify(x)
  n = X.shape[axis % len(X.shape)]
  return welch(X, fs=fs, window=window, nperseg=n, noverlap=0,
               nfft=nfft, detrend=detrend,
               return_onesided=return_onesided, scaling=scaling,
               axis=axis)


def coherence(x, y, fs: float = 1.0, window="hann", nperseg=None,
              noverlap=None, nfft=None, detrend="constant",
              axis: int = -1):
  """``|Pxy|² / (Pxx Pyy)`` — three device spectra, one fused chain."""
  f, Pxy = csd(x, y, fs=fs, window=window, nperseg=nperseg,
               noverlap=noverlap, nfft=nfft, detrend=detrend, axis=axis)
  _, Pxx = welch(x, fs=fs, window=window, nperseg=nperseg,
                 noverlap=noverlap, nfft=nfft, detrend=detrend,
                 axis=axis)
  _, Pyy = welch(y, fs=fs, window=window, nperseg=nperseg,
                 noverlap=noverlap, nfft=nfft, detrend=detrend,
                 axis=axis)
  return f, sp.absolute(Pxy) ** 2 / (Pxx * Pyy)


def stft(x, fs: float = 1.0, window="hann", nperseg: int = 256,
         noverlap=None, nfft=None, detrend=False,
         return_onesided: bool = True, boundary: str = "zeros",
         padded: bool = True, axis: int = -1):
  """Short-time FFT — device; returns ``(f, t, Zxx)`` with Zxx a lazy
  COMPLEX expr (complex-internal chains are axon-safe; fetching Zxx
  itself needs a real-runtime backend or an abs()/real() tail)."""
  X = sp.lazify(x)
  n = X.shape[axis % len(X.shape)]
  nps = min(int(nperseg), n)
  nov = int(noverlap) if noverlap is not None else nps // 2
  nf = int(nfft) if nfft else nps
  f = (np.fft.rfftfreq(nf, 1.0 / fs) if return_onesided
       else np.fft.fftfreq(nf, 1.0 / fs))
  if boundary == "zeros":
    n_ext = n + 2 * (nps // 2)
  elif boundary is None:
    n_ext = n
  else:
    raise NotImplementedError("stft boundary modes beyond "
                              "'zeros'/None route host")
  if padded:
    step = nps - nov
    nseg = int(np.ceil(max(n_ext - nps, 0) / step)) + 1
    total = (nseg - 1) * step + nps
  else:
    total = n_ext
  step = nps - nov
  nt = (total - nps) // step + 1
  # scipy: segment centers nps/2 + k·step, shifted back by the boundary
  # extension — measuring scipy 1.17: 'zeros' gives k·step exactly
  # (odd nps included), boundary=None gives nps/2 + k·step
  t = (np.arange(nt) * step
       + (0.0 if boundary == "zeros" else nps / 2)) / fs
  kw = (("fs", fs), ("window", window), ("nperseg", nps),
        ("noverlap", nov), ("nfft", nfft), ("detrend", detrend),
        ("return_onesided", return_onesided), ("boundary", boundary),
        ("padded", padded), ("axis", axis))

  def kern(xx):
    import jax.scipy.signal as jss
    return jss.stft(xx, **dict(kw))[2]

  return f, t, sp.map([X], kern)


def istft(Zxx, fs: float = 1.0, window="hann", nperseg=None,
          noverlap=None, nfft=None, input_onesided: bool = True,
          boundary: bool = True, time_axis: int = -1,
          freq_axis: int = -2):
  Z = sp.lazify(Zxx)
  kw = (("fs", fs), ("window", window), ("nperseg", nperseg),
        ("noverlap", noverlap), ("nfft", nfft),
        ("input_onesided", input_onesided), ("boundary", boundary),
        ("time_axis", time_axis), ("freq_axis", freq_axis))

  def kern(zz):
    import jax.scipy.signal as jss
    return jss.istft(zz, **dict(kw))[1]

  y = sp.map([Z], kern)
  n = y.shape[-1]
  t = np.arange(n) / fs
  return t, y


def spectrogram(x, fs: float = 1.0, window=("tukey", 0.25),
                nperseg=None, noverlap=None, nfft=None,
                detrend="constant", return_onesided: bool = True,
                scaling: str = "density", axis: int = -1,
                mode: str = "psd"):
  """Spectrogram = |STFT|² with scipy's scaling — device FFT chain."""
  if mode != "psd":
    raise NotImplementedError("spectrogram modes beyond 'psd' route "
                              "host")
  X = sp.lazify(x)
  n = X.shape[axis % len(X.shape)]
  nps, nf = _seg_params(n, nperseg, nfft)
  nov = int(noverlap) if noverlap is not None else nps // 8
  win = _ss.get_window(window, nps)
  f = (np.fft.rfftfreq(nf, 1.0 / fs) if return_onesided
       else np.fft.fftfreq(nf, 1.0 / fs))
  step = nps - nov
  nt = (n - nps) // step + 1
  t = (np.arange(nt) * step + nps / 2) / fs
  if scaling == "density":
    scale = 1.0 / (fs * (win * win).sum())
  elif scaling == "spectrum":
    scale = 1.0 / win.sum() ** 2
  else:
    raise ValueError(f"unknown scaling {scaling!r}")

  def kern(xx):
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    xm = jnp.moveaxis(xx.astype(dt), axis % xx.ndim, -1)
    # frame: (..., nt, nps)
    idx = np.arange(nps)[None, :] + step * np.arange(nt)[:, None]
    frames = xm[..., idx]
    if detrend == "constant":
      frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    elif detrend == "linear":
      k = jnp.arange(nps, dtype=dt)
      k = k - k.mean()
      slope = (frames * k).sum(-1, keepdims=True) / (k * k).sum()
      frames = frames - frames.mean(-1, keepdims=True) - slope * k
    frames = frames * jnp.asarray(win, dt)
    spec = jnp.fft.rfft(frames, n=nf, axis=-1) if return_onesided \
        else jnp.fft.fft(frames, n=nf, axis=-1)
    p = (jnp.abs(spec) ** 2) * scale
    if return_onesided:
      # double non-DC/non-Nyquist bins (one-sided density convention)
      mult = np.full(p.shape[-1], 2.0)
      mult[0] = 1.0
      if nf % 2 == 0:
        mult[-1] = 1.0
      p = p * jnp.asarray(mult, dt)
    return jnp.moveaxis(p, -2, -1)  # (..., freq, time)

  return f, t, sp.map([X], kern)


# ---------------------------------------------------------------------
# analytic signal, resampling, polyphase
# ---------------------------------------------------------------------

def hilbert(x, N=None, axis: int = -1):
  """Analytic signal via the device FFT (complex OUTPUT — axon cannot
  fetch complex buffers; end chains in sp.absolute there, e.g.
  envelope = abs(hilbert(x)))."""
  X = sp.lazify(x)
  n = int(N) if N is not None else X.shape[axis % len(X.shape)]

  def kern(xx):
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    xm = jnp.moveaxis(xx.astype(dt), axis % xx.ndim, -1)
    Xf = jnp.fft.fft(xm, n=n, axis=-1)
    h = np.zeros(n)
    if n % 2 == 0:
      h[0] = h[n // 2] = 1
      h[1:n // 2] = 2
    else:
      h[0] = 1
      h[1:(n + 1) // 2] = 2
    out = jnp.fft.ifft(Xf * jnp.asarray(h), axis=-1)
    return jnp.moveaxis(out, -1, axis % xx.ndim)

  return sp.map([X], kern)


def hilbert2(x, N=None):
  """2-D analytic signal (device FFT, complex output)."""
  X = sp.lazify(x)
  if len(X.shape) != 2:
    raise ValueError("hilbert2 expects a 2-D array")
  n1, n2 = (N, N) if np.isscalar(N) else (N or X.shape)

  def kern(xx):
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    Xf = jnp.fft.fft2(xx.astype(dt), s=(n1, n2))
    def hvec(n):
      # the single-orthant transform ZEROES the even-length Nyquist
      # bin (1 + s with s(Nyquist) = -1 — scipy 1.17 semantics),
      # unlike the 1-D hilbert which keeps it at 1
      h = np.zeros(n)
      h[0] = 1
      h[1:(n + 1) // 2] = 2
      return h
    H = np.outer(hvec(n1), hvec(n2))
    return jnp.fft.ifft2(Xf * jnp.asarray(H))

  return sp.map([X], kern)


def resample(x, num: int, t=None, axis: int = 0, window=None,
             domain: str = "time"):
  """FFT resampling (scipy's spectral truncate/zero-pad incl. the
  Nyquist split) — one device kernel."""
  if domain != "time":
    raise NotImplementedError("domain='freq' routes host")
  X = sp.lazify(x)
  n = X.shape[axis % len(X.shape)]
  num = int(num)
  # scipy's window is a FREQUENCY-domain multiplier over the full
  # fft grid: callable(fftfreq), ndarray as-is, or
  # ifftshift(get_window(...)) for names (code review r5s5)
  if window is None:
    w = None
  elif callable(window):
    w = window(np.fft.fftfreq(n))
  elif isinstance(window, np.ndarray):
    if window.shape != (n,):
      raise ValueError("window must have the same length as the input")
    w = window
  else:
    w = np.fft.ifftshift(_ss.get_window(window, n))

  def kern(xx):
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    xm = jnp.moveaxis(xx.astype(dt), axis % xx.ndim, -1)
    Xf = jnp.fft.rfft(xm, axis=-1)
    if w is not None:
      Xf = Xf * jnp.asarray(w[:Xf.shape[-1]], Xf.dtype)
    nyq_out = num // 2 + 1
    if num < n:
      # downsample: truncate; fold the mirror half of the new Nyquist
      # bin (X[-num/2] = conj(X[num/2]) for real signals → 2·Re)
      Y = Xf[..., :nyq_out]
      if num % 2 == 0:
        Y = Y.at[..., -1].set(2.0 * jnp.real(Y[..., -1])
                              .astype(Y.dtype))
      y = jnp.fft.irfft(Y, n=num, axis=-1)
    else:
      # upsample: zero-pad; an even-length input's Nyquist bin splits
      # into ±n/2 — irfft's Hermitian symmetry supplies the mirror,
      # so halving the now-interior bin is the whole split
      pad = nyq_out - Xf.shape[-1]
      Y = jnp.concatenate(
          [Xf, jnp.zeros(Xf.shape[:-1] + (max(pad, 0),), Xf.dtype)],
          axis=-1)
      if n % 2 == 0 and num > n:
        Y = Y.at[..., n // 2].set(0.5 * Y[..., n // 2])
      y = jnp.fft.irfft(Y, n=num, axis=-1)
    y = y * (num / n)
    return jnp.moveaxis(y, -1, axis % xx.ndim)

  y = sp.map([X], kern)
  if t is None:
    return y
  t = np.asarray(t)
  new_t = np.arange(0, num) * (t[1] - t[0]) * n / float(num) + t[0]
  return y, new_t


def upfirdn(h, x, up: int = 1, down: int = 1, axis: int = -1,
            mode: str = "constant", cval: float = 0):
  """Polyphase up-filter-down — zero-stuff upsample, device FIR
  convolution, downsample slice (one fused kernel)."""
  if mode != "constant" or cval != 0:
    raise NotImplementedError("upfirdn edge modes route host")
  h = np.asarray(sp.lazify(h).glom(), dtype=float)
  X = sp.lazify(x)
  up, down = int(up), int(down)
  ax = axis % len(X.shape)
  n = X.shape[ax]
  n_up = n * up
  # scipy's output length: ceil(((n-1)*up + len(h)) / down)
  n_out = -((-((n - 1) * up + len(h))) // down)

  def kern(xx):
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    xm = jnp.moveaxis(xx.astype(dt), ax, -1)
    shp = xm.shape[:-1] + (n, up)
    upx = jnp.zeros(shp, dt).at[..., 0].set(xm).reshape(
        xm.shape[:-1] + (n_up,))
    hj = jnp.asarray(h, dt)
    flat = upx.reshape(-1, n_up)
    import jax
    out = jax.vmap(lambda r: jnp.convolve(r, hj, mode="full"))(flat)
    y = out[:, ::down][:, :n_out].reshape(xm.shape[:-1] + (n_out,))
    return jnp.moveaxis(y, -1, ax)

  return sp.map([X], kern)


def resample_poly(x, up: int, down: int, axis: int = 0,
                  window=("kaiser", 5.0), padtype: str = "constant",
                  cval=None):
  """Polyphase resampling — scipy's kaiser-windowed FIR design (host,
  coefficients only) + the device upfirdn kernel + scipy's edge
  compensation slicing."""
  if padtype != "constant" or cval is not None:
    raise NotImplementedError("resample_poly padtypes route host")
  up, down = int(up), int(down)
  g = np.gcd(up, down)
  up //= g
  down //= g
  X = sp.lazify(x)
  ax = axis % len(X.shape)
  n_in = X.shape[ax]
  n_out = n_in * up
  n_out = n_out // down + bool(n_out % down)
  if up == down == 1:
    return X
  if isinstance(window, (list, np.ndarray)):
    # scipy: an array window IS the FIR filter (user-designed)
    h = np.asarray(window, dtype=float)
    if h.ndim != 1:
      raise ValueError("window must be 1-D")
    half_len = (h.size - 1) // 2
  else:
    max_rate = max(up, down)
    f_c = 1.0 / max_rate
    half_len = 10 * max_rate
    h = _ss.firwin(2 * half_len + 1, f_c, window=window)
  h = h * up
  # scipy zero-pads so the filter center lands on sample 0
  n_pre_pad = down - half_len % down
  n_post_pad = 0
  h = np.concatenate([np.zeros(n_pre_pad), h, np.zeros(n_post_pad)])
  n_pre_remove = (half_len + n_pre_pad) // down
  y = upfirdn(h, X, up, down, axis=ax)
  idx = [slice(None)] * len(X.shape)
  idx[ax] = slice(n_pre_remove, n_pre_remove + n_out)
  return y[tuple(idx)]


def decimate(x, q: int, n=None, ftype: str = "iir", axis: int = -1,
             zero_phase: bool = True):
  """Downsample after anti-alias filtering — host coefficient design
  (scipy's cheby1/FIR recipe) + the device filter scans + slice."""
  q = int(q)
  X = sp.lazify(x)
  ax = axis % len(X.shape)
  if ftype == "iir":
    if n is None:
      n = 8
    b, a = _ss.cheby1(n, 0.05, 0.8 / q)
    y = filtfilt(b, a, X, axis=ax) if zero_phase else lfilter(b, a, X,
                                                              axis=ax)
  elif ftype == "fir":
    if n is None:
      n = 30 * q
    h = _ss.firwin(n + 1, 1.0 / q, window="hamming")
    if zero_phase:
      y = filtfilt(h, [1.0], X, axis=ax)
    else:
      y = lfilter(h, [1.0], X, axis=ax)
  else:
    raise ValueError(f"unknown ftype {ftype!r}")
  idx = [slice(None)] * len(X.shape)
  idx[ax] = slice(None, None, q)
  return y[tuple(idx)]


# ---------------------------------------------------------------------
# smoothing / rank filters
# ---------------------------------------------------------------------

def savgol_coeffs(window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0, pos=None, use: str = "conv"):
  return _ss.savgol_coeffs(window_length, polyorder, deriv=deriv,
                           delta=delta, pos=pos, use=use)


def savgol_filter(x, window_length: int, polyorder: int, deriv: int = 0,
                  delta: float = 1.0, axis: int = -1,
                  mode: str = "interp", cval: float = 0.0):
  """Savitzky–Golay — host coefficient design, ONE device correlation;
  ``mode='interp'`` fits the edge polynomials as two tiny host
  lstsq problems applied as static edge matrices inside the same
  kernel."""
  w = int(window_length)
  coeffs = _ss.savgol_coeffs(w, polyorder, deriv=deriv, delta=delta)
  X = sp.lazify(x)
  ax = axis % len(X.shape)
  n = X.shape[ax]
  if mode not in ("interp", "constant", "nearest", "wrap", "mirror"):
    raise ValueError(f"unknown mode {mode!r}")
  if mode != "interp":
    raise NotImplementedError("savgol_filter non-interp modes route "
                              "host (scipy.signal)")
  if w > n:
    raise ValueError("window_length must be <= the axis length")
  half = w // 2
  # edge matrices: scipy fits a polyorder-degree polynomial to the
  # first/last w samples and evaluates (derivative at) the edge points
  # — a LINEAR map of those samples, precomputable as (half, w)
  V = np.vander(np.arange(w, dtype=float), polyorder + 1,
                increasing=True)
  pinv = np.linalg.pinv(V)                         # (deg+1, w)
  import math

  # evaluate the deriv-th derivative of the window's polynomial fit at
  # the edge sample positions — a LINEAR map of the window samples
  def edge_matrix(pos):
    rows = []
    for p in pos:
      powers = np.array([
          (math.factorial(k) / math.factorial(k - deriv)) *
          p ** (k - deriv) if k >= deriv else 0.0
          for k in range(polyorder + 1)])
      rows.append(powers @ pinv)
    return np.asarray(rows) / delta ** deriv

  Efirst = edge_matrix(np.arange(half))
  Elast = edge_matrix(np.arange(w - half, w))

  def kern(xx):
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    xm = jnp.moveaxis(xx.astype(dt), ax, -1)
    flat = xm.reshape(-1, n)
    # savgol_coeffs(use='conv') are already CONVOLUTION-ordered
    # (antisymmetric for odd derivs — a flip here negates them)
    c = jnp.asarray(coeffs, dt)
    import jax
    mid = jax.vmap(lambda r: jnp.convolve(r, c, mode="valid"))(flat)
    if w % 2 == 0:
      # even windows: scipy's interior starts one sample later (the
      # half-sample center rounds up) and both edges get w//2 samples
      mid = mid[:, 1:]
    first = flat[:, :w] @ jnp.asarray(Efirst.T, dt)
    last = flat[:, -w:] @ jnp.asarray(Elast.T, dt)
    y = jnp.concatenate([first, mid, last], axis=-1)
    return jnp.moveaxis(y.reshape(xm.shape), -1, ax)

  return sp.map([X], kern)


def wiener(im, mysize=None, noise=None):
  """Wiener filter — scipy's local mean/variance formulation as fused
  device box sums."""
  X = sp.lazify(im)
  nd = len(X.shape)
  if mysize is None:
    mysize = 3
  sizes = (mysize,) * nd if np.isscalar(mysize) else tuple(mysize)

  def kern(xx, _noise=noise):
    import jax.numpy as jnp
    import jax.scipy.signal as jss
    dt = jnp.result_type(xx.dtype, jnp.float32)
    x = xx.astype(dt)
    box = jnp.ones(sizes, dt)
    cnt = float(np.prod(sizes))
    lmean = jss.convolve(x, box, mode="same") / cnt
    lvar = jss.convolve(x * x, box, mode="same") / cnt - lmean * lmean
    nz = jnp.mean(lvar) if _noise is None else jnp.asarray(_noise, dt)
    res = lmean + jnp.where(lvar < nz, 0.0,
                            (lvar - nz) / jnp.maximum(lvar, 1e-30)) \
        * (x - lmean)
    return jnp.where(lvar < nz, lmean, res)

  return sp.map([X], kern)


def order_filter(a, domain, rank: int):
  """Sliding-window rank filter — static shift stack + per-window sort
  select (vectorized; domains are small masks)."""
  dom = np.asarray(sp.lazify(domain).glom()).astype(bool)
  X = sp.lazify(a)
  if dom.ndim != len(X.shape):
    raise ValueError("domain rank must match input rank")
  offs = np.argwhere(dom) - (np.asarray(dom.shape) - 1) // 2
  rank = int(rank)

  def kern(xx):
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, jnp.float32)
    x = xx.astype(dt)
    planes = []
    for off in offs:
      p = x
      for axi, o in enumerate(off):
        o = int(o)
        if o == 0:
          continue
        pad = [(0, 0)] * x.ndim
        if o > 0:
          pad[axi] = (0, o)
          p = jnp.pad(p, pad)[tuple(
              slice(o, None) if i == axi else slice(None)
              for i in range(x.ndim))]
        else:
          pad[axi] = (-o, 0)
          p = jnp.pad(p, pad)[tuple(
              slice(None, o) if i == axi else slice(None)
              for i in range(x.ndim))]
      planes.append(p)
    stack = jnp.stack(planes)
    return jnp.sort(stack, axis=0)[rank]

  return sp.map([X], kern)


def medfilt(volume, kernel_size=None):
  """Median filter — the order_filter midpoint rank."""
  X = sp.lazify(volume)
  nd = len(X.shape)
  ks = kernel_size or 3
  sizes = (ks,) * nd if np.isscalar(ks) else tuple(ks)
  dom = np.ones(sizes, bool)
  return order_filter(X, dom, int(np.prod(sizes)) // 2)


def medfilt2d(input, kernel_size: int = 3):
  return medfilt(input, kernel_size)


# ---------------------------------------------------------------------
# waveforms + misc device math
# ---------------------------------------------------------------------

def square(t, duty: float = 0.5):
  t = sp.lazify(t)
  frac = sp.mod(t / (2 * np.pi), 1.0)
  return sp.where(frac < duty, 1.0, -1.0)


def sawtooth(t, width: float = 1.0):
  t = sp.lazify(t)
  frac = sp.mod(t / (2 * np.pi), 1.0)
  up = 2.0 * frac / max(width, 1e-300) - 1.0
  down = 2.0 * (1.0 - frac) / max(1.0 - width, 1e-300) - 1.0 \
      if width < 1.0 else up
  return sp.where(frac < width, up, down)


def chirp(t, f0: float, t1: float, f1: float, method: str = "linear",
          phi: float = 0, vertex_zero: bool = True):
  t = sp.lazify(t)
  phi_r = phi * np.pi / 180.0
  if method in ("linear", "lin", "li"):
    beta = (f1 - f0) / t1
    phase = 2 * np.pi * (f0 * t + 0.5 * beta * t * t)
  elif method in ("quadratic", "quad", "q"):
    beta = (f1 - f0) / t1 ** 2
    if vertex_zero:
      phase = 2 * np.pi * (f0 * t + beta * t * t * t / 3.0)
    else:
      phase = 2 * np.pi * (f1 * t + beta *
                           ((t1 - t) ** 3 - t1 ** 3) / 3.0)
  elif method in ("logarithmic", "log", "lo"):
    if f0 == f1:
      phase = 2 * np.pi * f0 * t
    else:
      beta = t1 / np.log(f1 / f0)
      phase = 2 * np.pi * beta * f0 * ((f1 / f0) ** (t / t1) - 1.0)
  elif method in ("hyperbolic", "hyp"):
    if f0 == f1:
      phase = 2 * np.pi * f0 * t
    else:
      sing = -f1 * t1 / (f0 - f1)
      phase = 2 * np.pi * (-sing * f0) * sp.log(sp.absolute(1 - t / sing))
  else:
    raise ValueError(f"unknown method {method!r}")
  return sp.cos(phase + phi_r)


def gausspulse(t, fc: float = 1000, bw: float = 0.5, bwr: float = -6,
               tpr: float = -60, retquad: bool = False,
               retenv: bool = False):
  if isinstance(t, str):
    return _ss.gausspulse(t, fc=fc, bw=bw, bwr=bwr, tpr=tpr)
  t = sp.lazify(t)
  ref = pow(10.0, bwr / 20.0)
  a = -(np.pi * fc * bw) ** 2 / (4.0 * np.log(ref))
  env = sp.exp(-a * t * t)
  out = env * sp.cos(2 * np.pi * fc * t)
  rets = [out]
  if retquad:
    rets.append(env * sp.sin(2 * np.pi * fc * t))
  if retenv:
    rets.append(env)
  return rets[0] if len(rets) == 1 else tuple(rets)


def sweep_poly(t, poly, phi: float = 0):
  t = sp.lazify(t)
  p = np.poly1d(poly)
  intp = p.integ()
  phase = 2 * np.pi * sum(
      float(c) * t ** (intp.order - i)
      for i, c in enumerate(intp.coeffs))
  return sp.cos(phase + phi * np.pi / 180.0)


def unit_impulse(shape, idx=None, dtype=float):
  out = np.zeros(shape, dtype)
  if idx is None:
    idx = (0,) * out.ndim
  elif isinstance(idx, str) and idx == "mid":
    idx = tuple(s // 2 for s in out.shape)
  elif not isinstance(idx, (tuple, list)):
    # scipy: a scalar idx on an N-D shape addresses (idx,)*ndim —
    # out[(i,)] alone would set a whole hyperplane (code review r5s5)
    idx = (int(idx),) * out.ndim
  out[tuple(idx)] = 1
  return sp.from_numpy(out)


def lombscargle(x, y, freqs, precenter: bool = False,
                normalize: bool = False):
  """Lomb–Scargle periodogram — the classic O(len(x)·len(freqs)) sums
  as ONE vectorized device kernel (scipy loops in C)."""
  X, Y, F = sp.lazify(x), sp.lazify(y), sp.lazify(freqs)

  def kern(xx, yy, ff):
    import jax.numpy as jnp
    dt = jnp.result_type(xx.dtype, yy.dtype, jnp.float32)
    xv = xx.astype(dt)[None, :]
    yv = yy.astype(dt)
    if precenter:
      yv = yv - jnp.mean(yv)
    w = ff.astype(dt)[:, None]
    s2 = jnp.sum(jnp.sin(2 * w * xv), axis=1)
    c2 = jnp.sum(jnp.cos(2 * w * xv), axis=1)
    tau = 0.5 * jnp.arctan2(s2, c2) / ff.astype(dt)
    arg = w * (xv - tau[:, None])
    cs, sn = jnp.cos(arg), jnp.sin(arg)
    yc = jnp.sum(yv[None, :] * cs, axis=1)
    ys = jnp.sum(yv[None, :] * sn, axis=1)
    cc = jnp.sum(cs * cs, axis=1)
    ss = jnp.sum(sn * sn, axis=1)
    p = 0.5 * (yc * yc / cc + ys * ys / ss)
    if normalize:
      p = p * 2.0 / jnp.sum(yv * yv)
    return p

  return sp.map([X, Y, F], kern)


def czt(x, m=None, w=None, a=1 + 0j, *, axis: int = -1):
  """Chirp-Z transform — Bluestein over the device FFT (complex
  output; axon fetch caveat as for hilbert)."""
  X = sp.lazify(x)
  n = X.shape[axis % len(X.shape)]
  m = int(m) if m is not None else n
  if w is None:
    w = np.exp(-2j * np.pi / m)
  w = complex(w)
  a = complex(a)
  nfft = int(2 ** np.ceil(np.log2(m + n - 1)))
  k = np.arange(max(m, n))
  wk2 = w ** (k ** 2 / 2.0)
  awk2 = a ** -k[:n] * wk2[:n]
  fwk2 = np.fft.fft(1 / np.hstack((wk2[n - 1:0:-1], wk2[:m])), nfft)
  wk2_out = wk2[:m]

  def kern(xx):
    import jax.numpy as jnp
    # result_type keeps f64/c128 inputs at full precision (a dtype !=
    # float64 gate silently downcast complex128 — code review r5s5)
    ct = jnp.result_type(xx.dtype, jnp.complex64)
    xm = jnp.moveaxis(xx.astype(ct), axis % xx.ndim, -1)
    y = xm * jnp.asarray(awk2, ct)
    fy = jnp.fft.fft(y, n=nfft, axis=-1)
    out = jnp.fft.ifft(fy * jnp.asarray(fwk2, ct), axis=-1)
    out = out[..., n - 1:n + m - 1] * jnp.asarray(wk2_out, ct)
    return jnp.moveaxis(out, -1, axis % xx.ndim)

  return sp.map([X], kern)


def zoom_fft(x, fn, m=None, *, fs: float = 2, endpoint: bool = False,
             axis: int = -1):
  """Zoomed DFT over [f1, f2) — a czt with the matching ratio/offset."""
  X = sp.lazify(x)
  n = X.shape[axis % len(X.shape)]
  if np.isscalar(fn):
    f1, f2 = 0.0, float(fn)
  else:
    f1, f2 = float(fn[0]), float(fn[1])
  m = int(m) if m is not None else n
  k = m if not endpoint else m - 1
  w = np.exp(-2j * np.pi * (f2 - f1) / (k * fs))
  a = np.exp(2j * np.pi * f1 / fs)
  return czt(X, m=m, w=w, a=a, axis=axis)


def vectorstrength(events, period):
  """Vector strength — fused elementwise+reduce."""
  E = sp.lazify(events)
  periods = np.atleast_1d(np.asarray(period, float))
  outs_s, outs_a = [], []
  for p in periods:
    ang = E * (2 * np.pi / p)
    c = sp.mean(sp.cos(ang))
    s = sp.mean(sp.sin(ang))
    outs_s.append(sp.sqrt(c * c + s * s))
    outs_a.append(sp.arctan2(s, c))
  if np.isscalar(period):
    return outs_s[0], outs_a[0]
  return sp.stack(outs_s), sp.stack(outs_a)


def gauss_spline(x, n: int):
  """Gaussian approximation to the B-spline — elementwise device."""
  x = sp.lazify(x)
  signsq = (n + 1) / 12.0
  return sp.exp(-(x ** 2) / (2 * signsq)) / np.sqrt(2 * np.pi * signsq)
