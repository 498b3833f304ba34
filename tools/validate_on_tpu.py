"""End-to-end framework validation on the real TPU chip (f32).

Run: ``python -u tools/validate_on_tpu.py`` — exercises the expr layer,
examples, sparse loop, and the Pallas lowering on the live chip.
Round-1 results: all pass; Mosaic rejects the Pallas SpMV gather (XLA
fallback is the production path).
"""
import time, numpy as np, jax
import spartan_tpu as sp
sp.initialize(["--log_level=40"])
print("device:", jax.devices()[0].device_kind, flush=True)

# 1. linreg training through the expr layer on TPU
from spartan_tpu.examples import linear_reg
X, y, wt = linear_reg.make_data(4096, 16)
t0 = time.time()
w = linear_reg.fit_fused(X, y, iterations=30, alpha=0.05)  # one compile,
# 30 on-device steps — the host-loop fit() costs ~4.7 s/iter through
# the tunnel and validates the same code path via tests
err = float(np.abs(np.asarray(w.glom()) - wt).max())
print(f"1. linreg on TPU: err={err:.4f} ({time.time()-t0:.1f}s, 30 iters)", flush=True)

# 2. kmeans step on TPU
from spartan_tpu.examples import kmeans
pts, _ = kmeans.make_data(4096, 8, 4, seed=0)
centers, labels = kmeans.fit(pts, 4, iterations=5)
print("2. kmeans on TPU: centers", np.asarray(centers.glom()).shape, flush=True)

# 3. sparse pagerank on TPU (single-compile loop)
from spartan_tpu.backend import sparse as sps
from spartan_tpu.examples import pagerank
M = pagerank.make_link_matrix(512)
r = pagerank.fit_sparse(sps.from_dense(M), 30)
print(f"3. sparse pagerank on TPU: sum={float(np.sum(r)):.6f}", flush=True)

# 4. pallas SpMV Mosaic compile check (falls back silently in spmv(); direct call here)
from spartan_tpu.backend.kernels import spmv_pallas
import scipy.sparse as ss, jax.numpy as jnp
A = ss.random(512, 512, density=0.05, random_state=np.random.RandomState(0), format="csr")
S = sps.from_scipy(A, dtype=np.float32)
try:
    got = np.asarray(spmv_pallas.spmv(S.cols, S.vals, jnp.asarray(np.random.randn(512).astype(np.float32))))
    print("4. pallas SpMV Mosaic-compiles on TPU: finite =", np.isfinite(got).all(), flush=True)
except Exception as e:
    print("4. pallas SpMV Mosaic REJECTS:", str(e)[:150], flush=True)

# 5. expr-layer pallas lowering live on TPU (the ReduceExpr fast path)
b = np.random.rand(4096, 4096).astype(np.float32)
v = float(sp.sum(sp.abs(sp.from_numpy(b) - 0.5)).glom())  # non-affine -> pallas
want = np.abs(b.astype(np.float64) - 0.5).sum()
print(f"5. non-affine pallas lowering on TPU: rel err {abs(v-want)/want:.2e}", flush=True)

# 6. unstructured pagerank at n=65536 through the framework loop — the
# SpMVExpr windowed route (r2 kernel) live on chip
import scipy.sparse as _ss
t0 = time.time()
n6 = 65536
rng6 = np.random.default_rng(3)
nnz6 = n6 * 8
_r = rng6.integers(0, n6, nnz6); _c = rng6.integers(0, n6, nnz6)
A2 = _ss.coo_matrix((np.ones(nnz6, np.float32), (_r, _c)),
                    shape=(n6, n6)).tocsr()
A2.sum_duplicates()
deg = np.maximum(np.asarray(A2.sum(axis=0)).ravel(), 1.0)
A2 = (A2 @ _ss.diags(1.0 / deg)).tocsr().astype(np.float32)
S2 = sps.from_scipy(A2, dtype=np.float32)
r2 = pagerank.fit_sparse(S2, 20)
rr = np.full(n6, 1.0 / n6, np.float64)
for _ in range(20):
    rr = 0.85 * (A2.astype(np.float64) @ rr) + 0.15 / n6
rel = np.abs(np.asarray(r2, np.float64) - rr).max() / np.abs(rr).max()
print(f"6. windowed-SpMV pagerank n=65536 on TPU: relerr={rel:.2e} "
      f"({time.time()-t0:.1f}s, 20 iters)", flush=True)

# 7. r3 session-4 surfaces live on chip: fused convnet training (conv +
# autodiff + lax.scan through Mosaic/XLA:TPU), multi-operand einsum
# chain, distribution creations, knn predict
t0 = time.time()
from spartan_tpu.examples import convnet
rng7 = np.random.default_rng(0)
imgs = rng7.standard_normal((32, 1, 12, 12)).astype(np.float32)
labs = rng7.integers(0, 4, 32)
_, losses7 = convnet.fit_fused(imgs, labs, n_classes=4, epochs=4, lr=0.1)
ok7 = np.isfinite(losses7).all() and losses7[-1] < losses7[0]
print(f"7. fused convnet training on TPU: losses {np.round(losses7, 4)} "
      f"decreasing={bool(ok7)} ({time.time()-t0:.1f}s)", flush=True)

t0 = time.time()
ea = rng7.standard_normal((2048, 256)).astype(np.float32)
eb = rng7.standard_normal((256, 128)).astype(np.float32)
ec = rng7.standard_normal((128, 32)).astype(np.float32)
chain = np.asarray(sp.einsum("ij,jk,kl->il", sp.from_numpy(ea),
                             sp.from_numpy(eb), sp.from_numpy(ec)).glom())
want = (ea.astype(np.float64) @ eb.astype(np.float64)
        @ ec.astype(np.float64))
rel = np.abs(chain - want).max() / np.abs(want).max()
print(f"8. einsum chain on TPU: relerr={rel:.2e} ({time.time()-t0:.1f}s)",
      flush=True)

t0 = time.time()
g = sp.random.default_rng(7)
dm = float((g.gamma(2.0, 1.0, (1 << 16,))
            + g.exponential(1.0, (1 << 16,))).mean().glom())
print(f"9. distribution sampling on TPU: mean={dm:.3f} (expect ~3.0, "
      f"{time.time()-t0:.1f}s)", flush=True)

t0 = time.time()
from spartan_tpu.examples import knn
acc = knn.run(n=4096, d=8)
print(f"10. knn on TPU: accuracy={acc:.3f} ({time.time()-t0:.1f}s)",
      flush=True)

# 11. the ragged all_to_all sample-sort exchange live on TPU (VERDICT r3
# weak #3: it was lowering-asserted only; CPU meshes take the dense
# fallback).  One real chip → 1-device mesh + force=True executes the
# actual lax.ragged_all_to_all thunk end-to-end through Mosaic/XLA:TPU.
t0 = time.time()
from spartan_tpu.parallel import sample_sort as _ssrt
from spartan_tpu.core.mesh import make_mesh as _mk
x11 = np.random.default_rng(11).standard_normal(1 << 18).astype(np.float32)
got11 = np.asarray(_ssrt.sample_sort_traced(
    jnp.asarray(x11), mesh=_mk((1,), ("d",)), exchange="ragged",
    force=True))
ok11 = bool((got11 == np.sort(x11)).all())
print(f"11. ragged-exchange sample sort on TPU: exact={ok11} "
      f"({time.time()-t0:.1f}s)", flush=True)

# 12. pre-padded-storage stencil kernel through the REAL Mosaic compiler
# (r4: interpret-mode acceptance does not predict Mosaic acceptance —
# manual in/out DMA + input_output_aliases + unrolled ping-pong)
t0 = time.time()
from spartan_tpu.backend.kernels import stencil_pallas as _stp
x12 = np.random.default_rng(12).standard_normal((256, 512)).astype(np.float32)
co12 = (0.0, 0.1, 0.0, 0.1, 0.6, 0.1, 0.0, 0.1, 0.0)
xp12 = _stp.to_padded(jnp.asarray(x12))
o12, _ = _stp.stencil3x3_padded(xp12, jnp.zeros_like(xp12), co12, steps=3)
got12 = np.asarray(_stp.from_padded(o12), np.float64)
u12 = x12.astype(np.float64)
k12 = np.asarray(co12).reshape(3, 3)
for _ in range(3):
    up = np.pad(u12, 1)
    u12 = sum(k12[di, dj] * up[di:di+256, dj:dj+512]
              for di in range(3) for dj in range(3))
e12 = np.abs(got12 - u12).max()
print(f"12. padded-storage stencil on TPU: err={e12:.2e} "
      f"({time.time()-t0:.1f}s)", flush=True)

# 12b. additive-field variant (Jacobi sweep: extra halo-free slab DMA)
t0 = time.time()
from spartan_tpu.examples import poisson as _poi
f12 = np.random.default_rng(13).standard_normal((256, 512)).astype(np.float32)
gj = _poi.solve_jacobi(f12, iters=6, unroll=3)
wj = _poi.solve_jacobi_numpy(f12, iters=6)
print(f"12b. Jacobi padded sweep on TPU: err={np.abs(gj - wj).max():.2e} "
      f"({time.time()-t0:.1f}s)", flush=True)

# 13. sparse.linalg fused solvers (r4): cg on a sparse SPD system +
# fused-Lanczos eigsh, f32 on the chip (the solvers' while/fori loops,
# one-hot basis algebra, and the in-loop lstsq map all ride Mosaic/XLA
# TPU lowerings; CPU-mesh coverage is tests/test_sparse_linalg.py)
t0 = time.time()
import scipy.sparse as _ss13
_spl = sp.sparse.linalg
_n13 = 2048
_G13 = _ss13.random(_n13, _n13, density=0.003,
                    random_state=np.random.RandomState(3), format="csr",
                    dtype=np.float32)
_A13 = (_G13 + _G13.T).tocsr()
_A13 = (_A13 + _ss13.diags(
    (np.asarray(np.abs(_A13).sum(axis=1)).ravel() + 1.0).astype(np.float32)
)).tocsr().astype(np.float32)
_S13 = sps.from_scipy(_A13, dtype=np.float32)
_xt13 = np.random.default_rng(5).standard_normal(_n13).astype(np.float32)
_x13, _info13 = _spl.cg(_S13, (_A13 @ _xt13).astype(np.float32), rtol=1e-5)
_e13 = np.abs(np.asarray(_x13.glom()) - _xt13).max()
_M13 = np.random.default_rng(6).standard_normal((512, 512)).astype(np.float32)
_Asym13 = ((_M13 + _M13.T) / 2).astype(np.float32)
_w13, _ = _spl.eigsh(_Asym13, k=2, which="LA", ncv=24)
_wt13 = np.linalg.eigvalsh(_Asym13.astype(np.float64))
_ew13 = np.abs(_w13 - _wt13[-2:]).max()
print(f"13. sparse.linalg on TPU: cg info={_info13} err={_e13:.2e}, "
      f"eigsh err={_ew13:.2e} ({time.time()-t0:.1f}s)", flush=True)

# 14. csgraph fused relaxation loops + scipy.linalg on-device names
# (r4s3): bellman_ford/connected_components while_loops, FW fori_loop
# with traced-index take, and expm/lu/cho_solve/polar map lowerings —
# all on the chip, f32-tolerant oracles via scipy on the host.
t0 = time.time()
import scipy.sparse as _ss14
import scipy.sparse.csgraph as _cs14
import scipy.linalg as _sla14
_r14 = np.random.default_rng(14)
_W14 = (_r14.random((256, 256)) < 0.03) * _r14.uniform(0.1, 5.0, (256, 256))
np.fill_diagonal(_W14, 0.0)
_C14 = sp.sparse.csgraph
_d14 = _C14.dijkstra(_W14.astype(np.float32), indices=[0, 1, 2])
_dw14 = _cs14.dijkstra(_ss14.csr_matrix(_W14), indices=[0, 1, 2])
_fin14 = np.isfinite(_dw14)
_ed14 = np.abs(np.where(_fin14, _d14, 0) - np.where(_fin14, _dw14, 0)).max()
assert (np.isfinite(_d14) == _fin14).all()
_nc14, _lab14 = _C14.connected_components(
    ((_W14 + _W14.T) > 0).astype(np.float32), directed=False)
_ncw14, _ = _cs14.connected_components(_ss14.csr_matrix(_W14 + _W14.T),
                                       directed=False)
_fw14 = _C14.floyd_warshall(_W14[:128, :128].astype(np.float32))
_fww14 = _cs14.floyd_warshall(_ss14.csr_matrix(_W14[:128, :128]))
_f14 = np.isfinite(_fww14)
_efw14 = np.abs(np.where(_f14, _fw14, 0) - np.where(_f14, _fww14, 0)).max()
_A14 = _r14.normal(size=(128, 128)).astype(np.float32)
_S14 = (_A14 @ _A14.T + 128 * np.eye(128, dtype=np.float32))
_ee14 = np.abs(np.asarray(sp.scipy_linalg.expm(0.02 * _A14).glom())
               - _sla14.expm(0.02 * _A14.astype(np.float64))).max()
_c14 = sp.scipy_linalg.cho_factor(_S14, lower=True)
_b14 = _r14.normal(size=128).astype(np.float32)
_x14 = np.asarray(sp.scipy_linalg.cho_solve(_c14, _b14).glom())
_ex14 = np.abs(_S14 @ _x14 - _b14).max()
print(f"14. csgraph+scipy_linalg on TPU: sssp={_ed14:.2e} "
      f"cc={_nc14}=={_ncw14} fw={_efw14:.2e} expm={_ee14:.2e} "
      f"cho={_ex14:.2e} ({time.time()-t0:.1f}s)", flush=True)

# 15. sp.optimize fused loops on the chip (r4s3): LM least_squares,
# Newton vector root, golden-section scalar — each one compiled
# while_loop, f32 oracles via scipy on the host.
t0 = time.time()
import jax.numpy as _jnp15
import scipy.optimize as _so15
_t15 = np.linspace(0, 3, 64, dtype=np.float32)
_y15 = (2.5 * np.exp(-1.3 * _t15) + 0.4).astype(np.float32)
_r15 = sp.optimize.least_squares(
    lambda p: p[0] * _jnp15.exp(-p[1] * _t15) + p[2] - _y15,
    np.ones(3, np.float32))
_rw15 = _so15.least_squares(
    lambda p: p[0] * np.exp(-p[1] * _t15) + p[2] - _y15, np.ones(3))
_el15 = np.abs(_r15.x - _rw15.x).max()
_rr15 = sp.optimize.root(
    lambda p: _jnp15.array([p[0] ** 2 + p[1] - 3.0,
                            p[0] - p[1] ** 3 + 1.0]),
    np.array([1.0, 1.0], np.float32), tol=1e-5)
_er15 = np.abs(np.asarray(_rr15.fun)).max()
_ms15 = sp.optimize.minimize_scalar(lambda x: (x - 1.7) ** 2 + 0.3,
                                    bounds=(0.0, 5.0), xtol=1e-6)
print(f"15. sp.optimize on TPU: lsq={_el15:.2e} root|f|={_er15:.2e} "
      f"scalar={abs(_ms15.x - 1.7):.2e} ({time.time()-t0:.1f}s)",
      flush=True)

# 16. round-5 surfaces on the chip: shift-invert eigsh (dense-LU route
# through on-device lu_factor/lu_solve inside the fused Arnoldi loop,
# plus the driver-paced minres inner-solve route), svds which='SM', and
# bounded least_squares/minimize (projected LM / projected Newton box
# loops) — f32, scipy host oracles.
t0 = time.time()
import scipy.sparse.linalg as _ssl16
import scipy.optimize as _so16
_r16 = np.random.default_rng(16)
_Q16, _ = np.linalg.qr(_r16.standard_normal((384, 384)))
_lam16 = np.linspace(-4.0, 4.0, 384)
_A16 = ((_Q16 * _lam16) @ _Q16.T).astype(np.float32)
_A16 = (_A16 + _A16.T) / 2
_w16, _ = sp.sparse.linalg.eigsh(_A16, k=3, sigma=0.37)
_ww16, _ = _ssl16.eigsh(_A16.astype(np.float64), k=3, sigma=0.37)
_esi16 = np.abs(np.sort(_w16) - np.sort(_ww16)).max()
_wi16, _ = sp.sparse.linalg.eigsh(_A16[:160, :160], k=2, sigma=0.1,
                                  mode="iterative")
_wwi16, _ = _ssl16.eigsh(_A16[:160, :160].astype(np.float64), k=2,
                         sigma=0.1)
_eit16 = np.abs(np.sort(_wi16) - np.sort(_wwi16)).max()
_M16 = _r16.standard_normal((192, 96)).astype(np.float32)
_, _s16, _ = sp.sparse.linalg.svds(_M16, k=2, which="SM")
_sw16 = np.sort(np.linalg.svd(_M16.astype(np.float64),
                              compute_uv=False))[:2]
_esv16 = np.abs(np.sort(_s16) - _sw16).max()
_t16 = np.linspace(0, 3, 64, dtype=np.float32)
_y16 = (2.5 * np.exp(-1.3 * _t16) + 0.4).astype(np.float32)
_lb16 = np.array([0.0, 1.5, 0.0]); _ub16 = np.array([5.0, 5.0, 1.0])
_rb16 = sp.optimize.least_squares(
    lambda p: p[0] * _jnp15.exp(-p[1] * _t16) + p[2] - _y16,
    np.array([1.0, 2.0, 0.5], np.float32), bounds=(_lb16, _ub16))
_rbw16 = _so16.least_squares(
    lambda p: p[0] * np.exp(-p[1] * _t16) + p[2] - _y16,
    np.array([1.0, 2.0, 0.5]), bounds=(_lb16, _ub16))
_eb16 = np.abs(_rb16.x - _rbw16.x).max()
_mb16 = sp.optimize.minimize(
    lambda p: (p[0] - 3.0) ** 2 + 10.0 * (p[1] + 2.0) ** 2,
    np.zeros(2, np.float32), bounds=[(-1.0, 1.0), (-1.0, 1.0)])
_emb16 = np.abs(np.asarray(_mb16.x) - np.array([1.0, -1.0])).max()
print(f"16. shift-invert+bounded-opt on TPU: si={_esi16:.2e} "
      f"si_iter={_eit16:.2e} svds_sm={_esv16:.2e} lsq_b={_eb16:.2e} "
      f"min_b={_emb16:.2e} ({time.time()-t0:.1f}s)", flush=True)

# 17. on-device matrix functions (r5: scipy_linalg iteration-lowered
# names): sqrtm = determinant-scaled Denman-Beavers fused while_loop,
# logm = inverse scaling-and-squaring + 16-node Gauss-Legendre, signm =
# scaled Newton, cosm = complex-INTERNAL expm (real output — axon-safe),
# orth = on-device SVD with s-only fetch.  f32 vs scipy f64 oracles.
t0 = time.time()
import scipy.linalg as _sla17
_r17 = np.random.default_rng(17)
_B17 = _r17.standard_normal((96, 96)).astype(np.float32)
_S17 = (_B17 @ _B17.T + 96 * np.eye(96, dtype=np.float32))
_esq17 = np.abs(np.asarray(sp.scipy_linalg.sqrtm(_S17).glom())
                - _sla17.sqrtm(_S17.astype(np.float64))).max()
_elg17 = np.abs(np.asarray(sp.scipy_linalg.logm(_S17).glom())
                - _sla17.logm(_S17.astype(np.float64))).max()
_I17 = _S17 - 140.0 * np.eye(96, dtype=np.float32)   # indefinite
_esg17 = np.abs(np.asarray(sp.scipy_linalg.signm(_I17).glom())
                - _sla17.signm(_I17.astype(np.float64))).max()
_ecs17 = np.abs(np.asarray(sp.scipy_linalg.cosm(0.1 * _B17).glom())
                - _sla17.cosm(0.1 * _B17.astype(np.float64))).max()
_M17 = np.concatenate([_B17[:, :40],
                       _B17[:, :40] @ _r17.standard_normal(
                           (40, 24)).astype(np.float32)], axis=1)
_O17 = np.asarray(sp.scipy_linalg.orth(_M17).glom())
_eor17 = (abs(_O17.shape[1] - 40)
          + np.abs(_O17.T @ _O17 - np.eye(_O17.shape[1])).max())
print(f"17. matrix functions on TPU: sqrtm={_esq17:.2e} "
      f"logm={_elg17:.2e} signm={_esg17:.2e} cosm={_ecs17:.2e} "
      f"orth(rank+ortho)={_eor17:.2e} ({time.time()-t0:.1f}s)",
      flush=True)

# 18. r5 parity-sweep surfaces on chip: new fused Krylov solvers
# (bicg/cgs/tfqmr/qmr/lsmr), FFT circulant/Toeplitz kernels, fused
# scalar/simplex/global optimizers, densified sparse matrix functions,
# LaplacianNd stencil matvec.  f32 hardware vs f64 host oracles.
t0 = time.time()
import jax.numpy as _jnp18
import scipy.linalg as _sla18
import scipy.sparse as _ss18
_r18 = np.random.default_rng(18)
_G18 = _ss18.random(512, 512, 0.02,
                    random_state=np.random.RandomState(18)).tocsr()
_A18 = (_G18 + _G18.T + _ss18.diags(
    np.asarray(np.abs(_G18).sum(axis=1)).ravel() + 1.0)).tocsr() \
    .astype(np.float32)
_xt18 = _r18.standard_normal(512).astype(np.float32)
_b18 = _A18 @ _xt18
_S18 = sp.sparse.csr_matrix(_A18)
_errs = {}
for _name in ("bicg", "cgs", "tfqmr", "qmr"):
  _x, _info = getattr(sp.sparse.linalg, _name)(_S18, _b18, rtol=1e-6)
  _errs[_name] = np.abs(np.asarray(sp.lazify(_x).glom()) - _xt18).max()
_D18 = _r18.standard_normal((256, 48)).astype(np.float32)
_y18 = _r18.standard_normal(256).astype(np.float32)
_xl18 = sp.sparse.linalg.lsmr(_D18, _y18, atol=1e-7, btol=1e-7,
                              maxiter=300)[0]
_wl18, *_ = np.linalg.lstsq(_D18.astype(np.float64),
                            _y18.astype(np.float64), rcond=None)
_errs["lsmr"] = np.abs(np.asarray(sp.lazify(_xl18).glom()) - _wl18).max()
# FFT kernels
_c18 = np.array([5.0, 1.0, 0.5, 0.25] + [0.0] * 124, np.float32)
_bb18 = _r18.standard_normal((128, 4)).astype(np.float32)
_errs["circ"] = np.abs(
    np.asarray(sp.scipy_linalg.solve_circulant(_c18, _bb18).glom())
    - _sla18.solve_circulant(_c18.astype(np.float64),
                             _bb18.astype(np.float64))).max()
_cc = _r18.standard_normal(96).astype(np.float32)
_rr = np.concatenate([[_cc[0]], _r18.standard_normal(63).astype(
    np.float32)])
_xx = _r18.standard_normal((64, 3)).astype(np.float32)
_errs["toep"] = np.abs(
    np.asarray(sp.scipy_linalg.matmul_toeplitz((_cc, _rr), _xx).glom())
    - _sla18.matmul_toeplitz((_cc.astype(np.float64),
                              _rr.astype(np.float64)),
                             _xx.astype(np.float64))).max()
# fused optimizers
_rb = sp.optimize.brentq(lambda x: _jnp18.cos(x) - x, 0.0, 1.0)
_errs["brentq"] = abs(_rb - 0.7390851332151607)
_res = sp.optimize.differential_evolution(
    lambda p: (p[0] - 1.0) ** 2 + (p[1] + 2.0) ** 2,
    [(-4, 4), (-4, 4)], seed=0, tol=1e-7, maxiter=200)
_errs["de"] = float(np.abs(_res.x - np.array([1.0, -2.0])).max())
_xnm = sp.optimize.fmin(sp.optimize.rosen, np.array([0.6, 0.6]),
                        xtol=1e-7, ftol=1e-10, maxiter=2000)
_errs["nm"] = float(np.abs(np.asarray(_xnm) - 1.0).max())
# densified sparse expm + LaplacianNd stencil
_T18 = sp.sparse.csr_matrix(0.02 * _A18[:64, :64])
import scipy.sparse.linalg as _ssl18
_errs["spexpm"] = np.abs(
    np.asarray(sp.sparse.linalg.expm(_T18).glom())
    - _ssl18.expm((0.02 * _A18[:64, :64]).astype(np.float64)
                  .tocsc()).toarray()).max()
_L18 = sp.sparse.linalg.LaplacianNd((8, 8))
_v18 = _r18.standard_normal(64).astype(np.float32)
_errs["lapnd"] = np.abs(
    np.asarray(sp.lazify(_L18.matvec(_v18)).glom())
    - _ssl18.LaplacianNd((8, 8)).toarray() @ _v18).max()
print("18. r5 sweep on TPU: "
      + " ".join(f"{k}={v:.2e}" for k, v in _errs.items())
      + f" ({time.time()-t0:.1f}s)", flush=True)

# 19. r5 integrate + signal surfaces on chip: fused RK45 solve_ivp,
# lfilter scan, filtfilt, welch, FFT resample, savgol, DE of a damped
# oscillator fit.  f32 hardware vs f64 host oracles.
t0 = time.time()
import jax.numpy as _jnp19
import scipy.integrate as _si19
import scipy.signal as _ss19
_r19 = np.random.default_rng(19)
_te19 = np.linspace(0, 8, 17)
_g19 = sp.integrate.solve_ivp(
    lambda t, y: _jnp19.stack([y[1], -_jnp19.sin(y[0]) - 0.1 * y[1]]),
    (0, 8), [1.0, 0.0], t_eval=_te19, rtol=1e-6, atol=1e-8)
_w19 = _si19.solve_ivp(
    lambda t, y: [y[1], -np.sin(y[0]) - 0.1 * y[1]],
    (0, 8), [1.0, 0.0], t_eval=_te19, rtol=1e-10, atol=1e-12)
_eivp = np.abs(_g19.y - _w19.y).max()
_x19 = (np.sin(2 * np.pi * 0.05 * np.arange(2048))
        + 0.5 * _r19.standard_normal(2048)).astype(np.float32)
_b19, _a19 = _ss19.butter(4, 0.1)
_elf = np.abs(np.asarray(sp.signal.lfilter(_b19, _a19, _x19).glom())
              - _ss19.lfilter(_b19, _a19, _x19.astype(np.float64))).max()
_eff = np.abs(np.asarray(sp.signal.filtfilt(_b19, _a19, _x19).glom())
              - _ss19.filtfilt(_b19, _a19,
                               _x19.astype(np.float64))).max()
_f19, _P19 = sp.signal.welch(_x19, nperseg=256)
_P19 = np.asarray(_P19.glom())
_fw19, _Pw19 = _ss19.welch(_x19.astype(np.float64), nperseg=256)
_ewl = np.abs(_P19 - _Pw19).max() / np.abs(_Pw19).max()
_ers = np.abs(np.asarray(sp.signal.resample(_x19, 512).glom())
              - _ss19.resample(_x19.astype(np.float64), 512)).max()
_esg = np.abs(np.asarray(sp.signal.savgol_filter(_x19, 31, 4).glom())
              - _ss19.savgol_filter(_x19.astype(np.float64), 31,
                                    4)).max()
print(f"19. integrate+signal on TPU: ivp={_eivp:.2e} lfilter={_elf:.2e} "
      f"filtfilt={_eff:.2e} welch_rel={_ewl:.2e} resample={_ers:.2e} "
      f"savgol={_esg:.2e} ({time.time()-t0:.1f}s)", flush=True)

# 20. r5 ndimage surface on chip: separable gaussian (XLA convs with
# exact boundary pads), shifted-stack median/grey morphology, while_loop
# fill/label flood, one-hot MXU per-label measurements, order-1 warp.
# f32 hardware vs scipy.ndimage f64 host oracles.
t0 = time.time()
import scipy.ndimage as _ndi20
_r20 = np.random.default_rng(20)
_x20 = _r20.standard_normal((192, 256)).astype(np.float32)
_eg20 = np.abs(np.asarray(sp.ndimage.gaussian_filter(_x20, 2.5).glom())
               - _ndi20.gaussian_filter(_x20.astype(np.float64),
                                        2.5)).max()
_em20 = np.abs(np.asarray(sp.ndimage.median_filter(_x20, size=5).glom())
               - _ndi20.median_filter(_x20, size=5)).max()
_ed20 = np.abs(np.asarray(sp.ndimage.grey_dilation(_x20, size=(3, 5))
                          .glom())
               - _ndi20.grey_dilation(_x20, size=(3, 5))).max()
_m20 = (_ndi20.gaussian_filter(_r20.standard_normal((96, 128)), 4.0)
        > 0.1)
_fh20 = np.asarray(sp.ndimage.binary_fill_holes(_m20).glom())
_fhw20 = _ndi20.binary_fill_holes(_m20)
_efh20 = int((_fh20 != _fhw20).sum())
_lab20, _n20 = sp.ndimage.label(_m20)   # host ndarray + count
_labw20, _nw20 = _ndi20.label(_m20)
# labels are arbitrary ids — compare the partition via matched sums
_s20 = np.sort(np.asarray(sp.lazify(sp.ndimage.sum_labels(
    np.ones_like(_m20, np.float32), _lab20,
    index=np.arange(1, _n20 + 1))).glom()))
_sw20 = np.sort(_ndi20.sum_labels(np.ones_like(_m20, np.float64),
                                  _labw20, np.arange(1, _nw20 + 1)))
_esl20 = (abs(_n20 - _nw20)
          + (np.abs(_s20 - _sw20).max() if _n20 == _nw20 else np.inf))
_ez20 = np.abs(np.asarray(sp.ndimage.zoom(_x20, 0.5, order=1).glom())
               - _ndi20.zoom(_x20.astype(np.float64), 0.5,
                             order=1)).max()
print(f"20. ndimage on TPU: gauss={_eg20:.2e} median={_em20:.2e} "
      f"dilate={_ed20:.2e} fill_holes_diff={_efh20} "
      f"label+sums={_esl20:.2e} zoom={_ez20:.2e} "
      f"({time.time()-t0:.1f}s)", flush=True)

# 21. r5 interpolate surface on chip: Thomas-scan CubicSpline, de Boor
# B-spline eval, tensor-spline RegularGridInterpolator, MXU
# RBFInterpolator saddle solve, barycentric weights.  f32 hardware vs
# scipy f64 host oracles.
t0 = time.time()
import scipy.interpolate as _si21
_r21 = np.random.default_rng(21)
_x21 = np.linspace(0, 10, 257)
_y21 = (np.sin(_x21) + 0.1 * _x21).astype(np.float32)
_q21 = _r21.uniform(0, 10, 20000).astype(np.float32)
_ecs = np.abs(np.asarray(sp.interpolate.CubicSpline(_x21, _y21)(_q21)
                         .glom())
              - _si21.CubicSpline(_x21, _y21.astype(np.float64))(
                  _q21.astype(np.float64))).max()
_yp21 = _y21.copy(); _yp21[-1] = _yp21[0]
_ecp = np.abs(np.asarray(sp.interpolate.CubicSpline(
    _x21, _yp21, bc_type="periodic")(_q21).glom())
    - _si21.CubicSpline(_x21, _yp21.astype(np.float64),
                        bc_type="periodic")(_q21.astype(np.float64))
    ).max()
_tck21 = _si21.splrep(_x21[::8], _y21[::8].astype(np.float64), s=0)
_esp = np.abs(np.asarray(sp.interpolate.splev(_q21, _tck21).glom())
              - _si21.splev(_q21.astype(np.float64), _tck21)).max()
_gx21 = np.linspace(0, 1, 33); _gy21 = np.linspace(0, 1, 33)
_V21 = (np.sin(_gx21 * 5)[:, None]
        * np.cos(_gy21 * 3)[None, :]).astype(np.float32)
_qg21 = _r21.uniform(0, 1, (5000, 2)).astype(np.float32)
_erg = np.abs(np.asarray(sp.interpolate.RegularGridInterpolator(
    (_gx21, _gy21), _V21, method="cubic", bounds_error=False)(_qg21)
    .glom())
    - _si21.RegularGridInterpolator(
        (_gx21, _gy21), _V21.astype(np.float64), method="cubic",
        bounds_error=False)(_qg21.astype(np.float64))).max()
_p21 = _r21.uniform(0, 1, (128, 2)).astype(np.float32)
_v21 = (np.sin(_p21[:, 0] * 7) + _p21[:, 1]).astype(np.float32)
_erb = np.abs(np.asarray(sp.interpolate.RBFInterpolator(_p21, _v21)(
    _qg21[:500]).glom())
    - _si21.RBFInterpolator(_p21.astype(np.float64),
                            _v21.astype(np.float64))(
        _qg21[:500].astype(np.float64))).max()
_xb21 = np.linspace(-1, 1, 9).astype(np.float32)
_eba = np.abs(np.asarray(sp.interpolate.BarycentricInterpolator(
    _xb21, np.cos(_xb21 * 3))(_q21[:100] / 5 - 1).glom())
    - _si21.BarycentricInterpolator(
        _xb21.astype(np.float64),
        np.cos(_xb21.astype(np.float64) * 3))(
        _q21[:100].astype(np.float64) / 5 - 1)).max()
print(f"21. interpolate on TPU: cubic={_ecs:.2e} periodic={_ecp:.2e} "
      f"splev={_esp:.2e} rgi_cubic={_erg:.2e} rbf={_erb:.2e} "
      f"barycentric={_eba:.2e} ({time.time()-t0:.1f}s)", flush=True)
