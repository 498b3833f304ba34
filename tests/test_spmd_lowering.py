"""SPMD lowering proof: the compiled HLO for sharded DAGs contains exactly
the collectives the design promises (SURVEY.md §2.4 mapping — fetch →
all-gather, update+reducer → all-reduce/reduce-scatter) and elementwise
chains stay collective-free (owner-computes)."""

import re

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import spartan_tpu as sp
from spartan_tpu import autodiff


def _hlo_for(expr, wrt):
  fn, args = autodiff.as_function(expr, wrt)
  jitted = jax.jit(fn)
  return jitted.lower(*args).compile().as_text()


def _collectives(hlo: str):
  return set(re.findall(r"(all-reduce|all-gather|reduce-scatter|"
                        r"all-to-all|collective-permute)", hlo))


def test_sharded_gradient_contraction_emits_all_reduce(rng, cluster):
  """X row-sharded: X^T @ r contracts the sharded dim → cross-shard
  reduction collective must appear."""
  X = sp.from_numpy(rng.standard_normal((64, 8)))
  r = sp.from_numpy(rng.standard_normal(64))
  expr = sp.dot(X.T, r)
  # X default tiling shards dim 0 (64 rows over mesh axes)
  hlo = _hlo_for(expr, [X])
  assert _collectives(hlo) & {"all-reduce", "reduce-scatter"}, \
      f"expected a reduction collective, got {_collectives(hlo)}"


def test_elementwise_chain_is_collective_free(rng, cluster):
  """Identically-sharded elementwise chains are owner-computes: no
  communication in the compiled program."""
  a_np = rng.standard_normal((64, 64))
  a = sp.from_numpy(a_np)
  b = sp.from_numpy(rng.standard_normal((64, 64)))
  expr = (a + b) * 2.0 - b
  hlo = _hlo_for(expr, [a])
  assert not _collectives(hlo), _collectives(hlo)


def test_full_reduce_emits_all_reduce(rng, cluster):
  a = sp.from_numpy(rng.standard_normal((64, 64)))
  hlo = _hlo_for(sp.sum(a * a), [a])
  assert "all-reduce" in hlo


def test_explicit_ppermute_lowering(cluster):
  """ring_shift's shard_map lowers to collective-permute."""
  import jax.numpy as jnp
  from jax import lax
  from jax.sharding import Mesh

  mesh = cluster
  axes = tuple(mesh.axis_names)
  n = 8

  def body(xs):
    perm = [(i, (i + 1) % n) for i in range(n)]
    return lax.ppermute(xs, axes, perm)

  f = jax.shard_map(body, mesh=mesh, in_specs=P(axes), out_specs=P(axes))
  x = jax.device_put(jnp.arange(16.0).reshape(16, 1),
                     NamedSharding(mesh, P(axes)))
  hlo = jax.jit(f).lower(x).compile().as_text()
  assert "collective-permute" in hlo
