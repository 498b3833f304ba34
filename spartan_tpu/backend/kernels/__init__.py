"""Pallas TPU kernels for the roofline-critical tile ops.

Role parity: the reference accelerated hot per-tile kernels with Parakeet
JIT / C++ extensions (SURVEY.md §2.2); here the fused regions already
compile through XLA, and these Pallas kernels cover the cases where a
hand-scheduled pipeline beats XLA's default: the single-pass fused
elementwise+reduce (config 1 roofline target) and the ELL SpMV (config 5).

All kernels run in interpret mode on CPU (tests) and compiled on TPU.
"""

from spartan_tpu.backend.kernels import (fused_reduce, matmul,
                                         spmv_pallas, stencil_pallas)
