"""fn_key identity regressions (kernels that alias in bytecode)."""

import numpy as np

import spartan_tpu as sp

def test_fn_key_distinguishes_co_names(cluster):
  """Kernels differing only in attribute/global names (identical bytecode)
  must not alias in any cache: v.astype(f32) vs v.astype(i32)."""
  import jax.numpy as jnp
  x = sp.from_numpy(np.ones(8))
  a = sp.map([x], lambda v: v.astype(jnp.float32)).glom()
  b = sp.map([x], lambda v: v.astype(jnp.int32)).glom()
  assert a.dtype == np.float32
  assert b.dtype == np.int32


def test_fn_key_distinguishes_defaults(cluster):
  x = sp.from_numpy(np.ones(8))
  a = sp.map([x], lambda v, k=2.0: v * k).glom()
  b = sp.map([x], lambda v, k=5.0: v * k).glom()
  assert a[0] == 2.0 and b[0] == 5.0
