"""Execution backend: region evaluator, collectives, Pallas kernels."""

from spartan_tpu.backend import evaluator
