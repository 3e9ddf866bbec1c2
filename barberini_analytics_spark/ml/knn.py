"""KNN regression + min-max scaling for visitor prediction (SURVEY §2.10
M10).

Reference: sklearn ``KNeighborsRegressor(n_neighbors=5)`` over min-max
scaled features with an inherently sequential 30-day forecast loop
(src/visitor_prediction/predict.py:59-206).  NumPy replacements with
deterministic (stable-sort) neighbor selection; the iterative forecast
stays a driver loop — each prediction feeds the next day's lag features,
which no distributed formulation can parallelize away.
"""

from __future__ import annotations

import numpy as np


class MinMaxScaler:
    def fit(self, x: np.ndarray) -> "MinMaxScaler":
        self.min_ = np.nanmin(x)
        self.max_ = np.nanmax(x)
        self.span_ = self.max_ - self.min_ or 1.0
        return self

    def transform(self, x: np.ndarray) -> np.ndarray:
        return (x - self.min_) / self.span_

    def inverse(self, x: np.ndarray) -> np.ndarray:
        return x * self.span_ + self.min_


class KNNRegressor:
    """Euclidean k-nearest-neighbor mean with stable tie-breaking."""

    def __init__(self, n_neighbors: int = 5):
        self.k = n_neighbors

    def fit(self, x: np.ndarray, y: np.ndarray) -> "KNNRegressor":
        self.x_, self.y_ = np.asarray(x, float), np.asarray(y, float)
        return self

    def predict(self, x: np.ndarray) -> np.ndarray:
        x = np.atleast_2d(np.asarray(x, float))
        d2 = ((self.x_[None, :, :] - x[:, None, :]) ** 2).sum(axis=2)
        idx = np.argsort(d2, axis=1, kind="stable")[:, :self.k]
        return self.y_[idx].mean(axis=1)
