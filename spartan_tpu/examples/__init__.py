"""Example workloads (reference: ``spartan/examples/`` — SURVEY.md §2.5).

Each module exposes a library-style entry returning the fitted model, built
from the lazy expr API so every iteration compiles to one fused SPMD region
(cache-hit after the first step).
"""

from spartan_tpu.examples import (als, cg, convnet, fuzzy_kmeans, kmeans,
                                  linear_reg, logistic_reg, naive_bayes,
                                  netflix_sgd, pagerank, pca, ridge_reg, svm)
