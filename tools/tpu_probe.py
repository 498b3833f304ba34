"""TPU micro-benchmark probes (barrier-tied loops, kernel variants).

Run on the real chip: ``python -u tools/tpu_probe.py``.  See CLAUDE.md
"Perf state" for why: validates lax.optimization_barrier as the hoist-proof
carry mechanism and the VMEM-tile scalar-operand kernel variant.
"""
import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
n = 16384
b = jnp.asarray(np.random.default_rng(0).random((n,n), dtype=np.float32))

def sync(x): return float(np.asarray(jax.device_get(x)).ravel()[0])
def slope(loop, klo=8, khi=24, reps=2):
    sync(loop(klo)); sync(loop(khi))
    tl, th = [], []
    for _ in range(reps):
        t0=time.perf_counter(); sync(loop(klo)); tl.append(time.perf_counter()-t0)
        t0=time.perf_counter(); sync(loop(khi)); th.append(time.perf_counter()-t0)
    return (min(th)-min(tl))/(khi-klo)

# 1) XLA pure sum with optimization_barrier carry tie
@jax.jit
def v_bar(b, k):
    def body(i, c):
        b2, c2 = lax.optimization_barrier((b, c))
        return jnp.sum(b2, dtype=jnp.float32) + 0.0*c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
s = slope(lambda k: v_bar(b, k)); print(f"xla barrier pure-sum: {n*n*4/s/1e9:.1f} GB/s", flush=True)

# 2) pallas carry-free kernel behind barrier
import sys; sys.path.insert(0, "/root/repo")
from spartan_tpu.backend.kernels import fused_reduce
@jax.jit
def v_pal(b, k):
    def body(i, c):
        b2, c2 = lax.optimization_barrier((b, c))
        return fused_reduce.fused_sum(b2, lambda v: jnp.abs(1.0 + v*2.0)) + 0.0*c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
s = slope(lambda k: v_pal(b, k)); print(f"pallas abs-chain barrier: {n*n*4/s/1e9:.1f} GB/s", flush=True)

# 3) matmul behind barrier
m = 8192
rng = np.random.default_rng(0)
a2 = jnp.asarray(rng.standard_normal((m,m)).astype(np.float32)).astype(jnp.bfloat16)
b2m = jnp.asarray(rng.standard_normal((m,m)).astype(np.float32)).astype(jnp.bfloat16)
@jax.jit
def v_mm(a, bb, k):
    def body(i, c):
        aa, c2 = lax.optimization_barrier((a, c))
        out = jnp.matmul(aa, bb, preferred_element_type=jnp.float32)
        return jnp.sum(out)*1e-30 + 0.0*c2
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
s = slope(lambda k: v_mm(a2, b2m, k), klo=4, khi=12)
print(f"matmul barrier: {2*m**3/s/1e12:.1f} TFLOP/s", flush=True)

# 4) pallas kernel with scalars as a VMEM (8,128) tile instead of SMEM
import functools
import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _kern_vtile(x_ref, s_ref, o_ref):
    i, j = pl.program_id(0), pl.program_id(1)
    @pl.when((i == 0) & (j == 0))
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)
    c = s_ref[0, 0]
    blk = (x_ref[:] + c * 1e-30)
    bm, bc = blk.shape
    acc = blk[:, 0:128]
    for t in range(1, bc // 128):
        acc = acc + blk[:, t*128:(t+1)*128]
    srow = acc[0:8]
    for r in range(1, bm // 8):
        srow = srow + acc[r*8:(r+1)*8]
    o_ref[:] += srow

@jax.jit
def v_vtile(b, k):
    def body(i, c):
        stile = jnp.full((8, 128), c, jnp.float32)
        out = pl.pallas_call(_kern_vtile,
            grid=(n // 256, n // 512),
            in_specs=[pl.BlockSpec((256, 512), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                      pl.BlockSpec((8, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(b, stile)
        return jnp.sum(out)
    return lax.fori_loop(0, k, body, jnp.zeros((), jnp.float32))
s = slope(lambda k: v_vtile(b, k)); print(f"pallas VMEM-tile carry: {n*n*4/s/1e9:.1f} GB/s", flush=True)
