"""sp.fft — numpy.fft-style spectral surface (no reference equivalent;
widening for the NumPy-user surface, SURVEY.md §2.1 builtins row)."""

import jax
import numpy as np
import pytest

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


def test_pencil_fft_parity_and_grad(rng, cluster):
  """r4 pencil-decomposed distributed FFT (fft2/ifft2/fftn/ifftn on
  >1-device meshes with divisible pencil axes): one local FFT per stage
  + ONE tiled all_to_all transpose — O(n/p) memory/compute per device.
  Must be bit-identical to the replicated fallback and differentiable."""
  from spartan_tpu.config import FLAGS
  assert FLAGS.fft_pencil  # default-on
  FLAGS.fft_pencil_min_elems = 0  # test shapes sit below the prod gate
  try:
    # batch dims kept < mesh size so the batch-absorption rule doesn't
    # route these to the (also-correct) localize fallback
    for shape, axes in [((64, 128), (0, 1)), ((2, 32, 128), (1, 2)),
                        ((16, 4, 128), (0, 2)),
                        ((2, 16, 32, 128), (1, 2, 3)),
                        ((16, 32, 128), (0, 1, 2))]:
      z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
      got = np.asarray(sp.fft.fftn(sp.from_numpy(z), axes=axes).glom())
      np.testing.assert_allclose(got, np.fft.fftn(z, axes=axes),
                                 rtol=1e-9, atol=1e-9)

    # round-trip through fft2 -> filter -> ifft2, and its gradient,
    # pencil vs fallback
    x = rng.standard_normal((64, 128))
    mask = (np.abs(np.fft.fftfreq(128)) < 0.2).astype(np.complex128)

    def build():
      X = sp.from_numpy(x)
      loss = sp.sum(sp.real(sp.fft.ifft2(sp.fft.fft2(X)
                                         * sp.from_numpy(mask))))
      return X, loss

    X, loss = build()
    g_pencil = np.asarray(sp.grad(loss, [X])[0].glom())
    FLAGS.fft_pencil = False
    try:
      X, loss = build()
      g_fallback = np.asarray(sp.grad(loss, [X])[0].glom())
    finally:
      FLAGS.fft_pencil = True
    np.testing.assert_allclose(g_pencil, g_fallback, rtol=1e-12,
                               atol=1e-12)

    # non-divisible pencil axes (15 % 8 != 0) take the fallback — still
    # correct
    z = (rng.standard_normal((15, 127))
         + 1j * rng.standard_normal((15, 127)))
    got = np.asarray(sp.fft.fft2(sp.from_numpy(z)).glom())
    np.testing.assert_allclose(got, np.fft.fft2(z), rtol=1e-9, atol=1e-9)
  finally:
    FLAGS.lookup("fft_pencil_min_elems").reset()


def test_pencil_fft_lowers_to_one_all_to_all(rng, cluster):
  """The pencil path's resharding transpose is an explicit all_to_all in
  the compiled HLO; with the flag off the replicated fallback emits
  none.  (SURVEY §2.4 collective mapping — retile = all-to-all.)"""
  import re

  from spartan_tpu import autodiff
  from spartan_tpu.config import FLAGS

  def hlo(shape=(64, 128), axes=None):
    z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
    Z = sp.from_numpy(z)
    expr = (sp.fft.fft2(Z) if axes is None
            else sp.fft.fftn(Z, axes=axes))
    fn, args = autodiff.as_function(expr, [Z])
    return jax.jit(fn).lower(*args).compile().as_text()

  FLAGS.fft_pencil_min_elems = 0
  try:
    assert "all-to-all" in hlo()
    FLAGS.fft_pencil = False
    try:
      assert "all-to-all" not in hlo()
    finally:
      FLAGS.fft_pencil = True
    # batch dims that absorb the mesh route to the collective-free
    # localize fallback even with the pencil on (code-review r4)
    assert "all-to-all" not in hlo((16, 32, 128), axes=(1, 2))
  finally:
    FLAGS.lookup("fft_pencil_min_elems").reset()
  # below the min-elems gate the pencil stands down entirely
  assert "all-to-all" not in hlo((16, 16))


def test_pencil_fft_real_variants(rng, cluster):
  """r4: rfft2/rfftn/irfft2/irfftn also pencil-decompose — the transpose
  target is zero-padded to a mesh-size multiple (rfft halves the last
  axis to n//2+1, which rarely divides) and sliced back; only one
  non-real transform axis must divide the mesh.  Parity + grad vs the
  replicated fallback."""
  from spartan_tpu.config import FLAGS

  FLAGS.fft_pencil_min_elems = 0
  try:
    for shape, axes in [((64, 128), (0, 1)), ((64, 100), (0, 1)),
                        ((16, 32, 100), (0, 1, 2)),
                        ((4, 32, 100), (1, 2))]:
      z = rng.standard_normal(shape)
      got = np.asarray(sp.fft.rfftn(sp.from_numpy(z), axes=axes).glom())
      np.testing.assert_allclose(got, np.fft.rfftn(z, axes=axes),
                                 rtol=1e-9, atol=1e-9)
      F = np.fft.rfftn(z, axes=axes)
      back = np.asarray(sp.fft.irfftn(sp.from_numpy(F), axes=axes).glom())
      np.testing.assert_allclose(back, z, rtol=1e-9, atol=1e-9)

    # complex pencil with a non-divisible LAST axis (pad trick) and a
    # non-divisible FIRST axis (pencil role swaps to the last axis)
    for shape in [(64, 100), (63, 128)]:
      z = rng.standard_normal(shape) + 1j * rng.standard_normal(shape)
      got = np.asarray(sp.fft.fft2(sp.from_numpy(z)).glom())
      np.testing.assert_allclose(got, np.fft.fft2(z), rtol=1e-9,
                                 atol=1e-9)

    # grad of a real spectral pipeline, pencil vs fallback
    x = rng.standard_normal((64, 100))

    def build():
      X = sp.from_numpy(x)
      return X, sp.sum(sp.abs(sp.fft.irfft2(sp.fft.rfft2(X) * 0.5)))

    X, loss = build()
    g_pencil = np.asarray(sp.grad(loss, [X])[0].glom())
    FLAGS.fft_pencil = False
    try:
      X, loss = build()
      g_fallback = np.asarray(sp.grad(loss, [X])[0].glom())
    finally:
      FLAGS.fft_pencil = True
    np.testing.assert_allclose(g_pencil, g_fallback, rtol=1e-10,
                               atol=1e-12)
  finally:
    FLAGS.lookup("fft_pencil_min_elems").reset()


def test_four_step_1d_fft(rng, cluster):
  """r4: long 1-D transforms distribute via the Bailey four-step
  factorization (n = n1*n2, FFT/twiddle/all_to_all-transpose/FFT) — a
  1-D array has no batch dims, so the localize fallback would fully
  replicate it.  Parity, round-trip, grad, and fallback routing."""
  from spartan_tpu import autodiff
  from spartan_tpu.config import FLAGS

  n = 2 * int(FLAGS.fft_pencil_min_elems)
  z = rng.standard_normal(n) + 1j * rng.standard_normal(n)
  got = np.asarray(sp.fft.fft(sp.from_numpy(z)).glom())
  np.testing.assert_allclose(got, np.fft.fft(z), rtol=1e-9, atol=1e-6)
  back = np.asarray(sp.fft.ifft(sp.fft.fft(sp.from_numpy(z))).glom())
  np.testing.assert_allclose(back, z, rtol=1e-9, atol=1e-9)

  # the four-step emits its all_to_all transpose
  Z = sp.from_numpy(z)
  fn, args = autodiff.as_function(sp.fft.fft(Z), [Z])
  assert "all-to-all" in jax.jit(fn).lower(*args).compile().as_text()

  # grad matches the replicated fallback
  x = rng.standard_normal(n)

  def build():
    X = sp.from_numpy(x)
    return X, sp.sum(sp.real(sp.fft.ifft(sp.fft.fft(X) * 2.0)))

  X, loss = build()
  gp = np.asarray(sp.grad(loss, [X])[0].glom())
  FLAGS.fft_pencil = False
  try:
    X, loss = build()
    gf = np.asarray(sp.grad(loss, [X])[0].glom())
  finally:
    FLAGS.fft_pencil = True
  np.testing.assert_allclose(gp, gf, rtol=1e-10, atol=1e-12)

  # no divisible n1*n2 split (n = 2^17 + 2 = 2 * 65537) -> fallback
  o = rng.standard_normal(n + 2) + 0j
  got = np.asarray(sp.fft.fft(sp.from_numpy(o)).glom())
  np.testing.assert_allclose(got, np.fft.fft(o), rtol=1e-9, atol=1e-6)


def test_fft_norm_and_s_kwargs(rng, cluster):
  """r4: norm= ('backward'/'ortho'/'forward') and s= (shape crop/pad)
  across the surface — the decomposed pencil/four-step paths compose to
  norm='backward' and rescale exactly; s routes to the fallback."""
  from spartan_tpu.config import FLAGS

  FLAGS.fft_pencil_min_elems = 0
  try:
    z = rng.standard_normal((64, 128)) + 1j * rng.standard_normal((64, 128))
    r = rng.standard_normal((64, 100))
    for norm in ("backward", "ortho", "forward"):
      for fn, data in [("fft2", z), ("ifft2", z), ("rfftn", r)]:
        got = np.asarray(
            getattr(sp.fft, fn)(sp.from_numpy(data), norm=norm).glom())
        want = getattr(np.fft, fn)(data, norm=norm)
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-9)
      F = np.fft.rfft2(r)
      got = np.asarray(sp.fft.irfft2(sp.from_numpy(F), norm=norm).glom())
      np.testing.assert_allclose(got, np.fft.irfft2(F, norm=norm),
                                 rtol=1e-12, atol=1e-12)
    # s= crop/pad (fallback path), 1-D n+norm, invalid norm raises
    got = np.asarray(sp.fft.fftn(sp.from_numpy(z), s=(32, 200)).glom())
    np.testing.assert_allclose(got, np.fft.fftn(z, s=(32, 200)),
                               rtol=1e-12, atol=1e-9)
    got = np.asarray(sp.fft.rfft(sp.from_numpy(r[0]), n=64,
                                 norm="ortho").glom())
    np.testing.assert_allclose(got, np.fft.rfft(r[0], n=64, norm="ortho"),
                               rtol=1e-12, atol=1e-12)
  finally:
    FLAGS.lookup("fft_pencil_min_elems").reset()

  # four-step 1-D with ortho norm at its production size
  n = 2 * int(FLAGS.fft_pencil_min_elems)
  z1 = rng.standard_normal(n) + 1j * rng.standard_normal(n)
  got = np.asarray(sp.fft.fft(sp.from_numpy(z1), norm="ortho").glom())
  np.testing.assert_allclose(got, np.fft.fft(z1, norm="ortho"),
                             rtol=1e-9, atol=1e-9)
  with np.testing.assert_raises(ValueError):
    sp.fft.fft2(sp.from_numpy(z), norm="bogus").glom()


# ---------------------------------------------------------------------
# scipy.fft extras: DCT/DST families, Hermitian n-D, fast Hankel
# ---------------------------------------------------------------------

def _g(e):
  import numpy as _np
  return _np.asarray(sp.lazify(e).glom())


@pytest.mark.smoke
@pytest.mark.parametrize("kind", ["dct", "dst"])
@pytest.mark.parametrize("type", [1, 2, 3, 4])
def test_cosine_transforms_all_types(kind, type):
  import scipy.fft as sfft
  rng = np.random.default_rng(5)
  x = rng.standard_normal((6, 32))
  for norm in (None, "ortho", "forward"):
    ours = _g(getattr(sp.fft, kind)(x, type=type, norm=norm))
    ref = getattr(sfft, kind)(x, type=type, norm=norm)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-11)
    iours = _g(getattr(sp.fft, "i" + kind)(x, type=type, norm=norm))
    iref = getattr(sfft, "i" + kind)(x, type=type, norm=norm)
    np.testing.assert_allclose(iours, iref, rtol=1e-9, atol=1e-11)


def test_cosine_orthogonalize_and_axis_n():
  import scipy.fft as sfft
  rng = np.random.default_rng(6)
  x = rng.standard_normal((5, 24))
  for o in (True, False):
    np.testing.assert_allclose(
        _g(sp.fft.dct(x, norm="ortho", orthogonalize=o)),
        sfft.dct(x, norm="ortho", orthogonalize=o), rtol=1e-10)
  # axis + n pad/truncate
  np.testing.assert_allclose(_g(sp.fft.dct(x, n=32, axis=0)),
                             sfft.dct(x, n=32, axis=0), rtol=1e-9,
                             atol=1e-11)
  np.testing.assert_allclose(_g(sp.fft.dst(x, n=10, axis=-1)),
                             sfft.dst(x, n=10, axis=-1), rtol=1e-9,
                             atol=1e-11)
  # int and complex inputs
  xi = rng.integers(-5, 5, (4, 16))
  np.testing.assert_allclose(_g(sp.fft.dct(xi)), sfft.dct(xi),
                             rtol=1e-10)
  xc = x[:, :16] + 1j * x[:, 8:24]
  np.testing.assert_allclose(_g(sp.fft.dct(xc, type=3)),
                             sfft.dct(xc, type=3), rtol=1e-9,
                             atol=1e-11)


@pytest.mark.smoke
def test_cosine_nd():
  import scipy.fft as sfft
  rng = np.random.default_rng(7)
  x = rng.standard_normal((8, 12, 10))
  np.testing.assert_allclose(_g(sp.fft.dctn(x)), sfft.dctn(x),
                             rtol=1e-9, atol=1e-10)
  np.testing.assert_allclose(
      _g(sp.fft.idctn(x, norm="ortho")), sfft.idctn(x, norm="ortho"),
      rtol=1e-9, atol=1e-11)
  np.testing.assert_allclose(
      _g(sp.fft.dstn(x, type=3, axes=(0, 2))),
      sfft.dstn(x, type=3, axes=(0, 2)), rtol=1e-9, atol=1e-10)
  np.testing.assert_allclose(
      _g(sp.fft.idstn(x, s=(8, 12), axes=(1, 2), norm="forward")),
      sfft.idstn(x, s=(8, 12), axes=(1, 2), norm="forward"),
      rtol=1e-9, atol=1e-12)
  # roundtrip
  np.testing.assert_allclose(_g(sp.fft.idctn(_g(sp.fft.dctn(x)))), x,
                             rtol=1e-9, atol=1e-11)


def test_hermitian_nd():
  import scipy.fft as sfft
  rng = np.random.default_rng(8)
  # hermitian input: spectrum of a real signal
  sig = rng.standard_normal((6, 10, 16))
  x = np.fft.rfftn(sig)
  for norm in (None, "ortho", "forward"):
    np.testing.assert_allclose(_g(sp.fft.hfftn(x, norm=norm)),
                               sfft.hfftn(x, norm=norm), rtol=1e-9,
                               atol=1e-10)
  np.testing.assert_allclose(_g(sp.fft.hfft2(x[0])),
                             sfft.hfft2(x[0]), rtol=1e-9, atol=1e-10)
  r = rng.standard_normal((6, 10, 16))
  for norm in (None, "ortho", "forward"):
    np.testing.assert_allclose(_g(sp.fft.ihfftn(r, norm=norm)),
                               sfft.ihfftn(r, norm=norm), rtol=1e-9,
                               atol=1e-11)
  np.testing.assert_allclose(_g(sp.fft.ihfft2(r[0])),
                             sfft.ihfft2(r[0]), rtol=1e-9, atol=1e-11)


def test_fht_ifht():
  import scipy.fft as sfft
  rng = np.random.default_rng(9)
  a = rng.standard_normal(64) * np.exp(-0.1 * np.arange(64))
  for mu, offset, bias in [(0.0, 0.0, 0.0), (2.0, 0.3, 0.0),
                           (0.5, 0.0, 0.1), (1.0, 0.2, -0.2)]:
    ours = _g(sp.fft.fht(a, 0.05, mu, offset=offset, bias=bias))
    ref = sfft.fht(a, 0.05, mu, offset=offset, bias=bias)
    np.testing.assert_allclose(ours, ref, rtol=1e-9, atol=1e-12)
    back = _g(sp.fft.ifht(ref, 0.05, mu, offset=offset, bias=bias))
    bref = sfft.ifht(ref, 0.05, mu, offset=offset, bias=bias)
    np.testing.assert_allclose(back, bref, rtol=1e-9, atol=1e-12)
  # batched (2-D) input
  ab = np.stack([a, a * 2.0])
  np.testing.assert_allclose(_g(sp.fft.fht(ab, 0.05, 1.0)),
                             sfft.fht(ab, 0.05, 1.0), rtol=1e-9)
  # low-ringing offset helper (host re-export)
  off = sp.fft.fhtoffset(0.05, 1.0, initial=0.1)
  assert np.isfinite(off)
  assert sp.fft.next_fast_len(1000) >= 1000
