"""sklearn-flavoured estimator API.

The reference ships a partial sklearn-API clone over its examples
(SURVEY.md §2.5); same here: thin ``fit``/``predict``/``transform``
estimator classes over :mod:`spartan_tpu.examples`, accepting numpy /
SpartanArray / lazy-expr inputs.
"""

from spartan_tpu.learn.estimators import (ALS, FuzzyKMeans, GaussianMixture,
                                          KMeans, KNeighborsClassifier, Lasso,
                                          LinearRegression,
                                          LogisticRegression, NaiveBayes,
                                          PCA, Ridge, SpectralClustering, SVC,
                                          TruncatedSVD)

__all__ = ["ALS", "FuzzyKMeans", "GaussianMixture", "KMeans",
           "KNeighborsClassifier", "Lasso",
           "LinearRegression",
           "LogisticRegression", "NaiveBayes", "PCA", "Ridge",
           "SpectralClustering", "SVC", "TruncatedSVD"]
