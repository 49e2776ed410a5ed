"""Loaders for the extracted model parameters (``params/*.json``).

Executor-side code (the XGB pandas UDF) calls :func:`xgb_trees` lazily so
each executor reads the package-local JSON once per process instead of
shipping ~1 MB of trees in every task closure — the pattern that scales to
a real cluster where the package is distributed via --py-files/wheel.
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "params")

DISEASES = ("cvd", "anemia", "ckd")


@lru_cache(maxsize=1)
def sklearn_pipeline() -> dict:
    with open(os.path.join(_DIR, "sklearn_pipeline.json")) as f:
        return json.load(f)


def feature_names() -> list[str]:
    """The 19 preprocessing input features, in fitted order
    (imputer.feature_names_in_ of the reference)."""
    return list(sklearn_pipeline()["feature_names"])


def model_features() -> list[str]:
    """The 14 XGB model inputs, in order (reference feature_columns.json:
    age, sex, 11 labs, cluster)."""
    return list(sklearn_pipeline()["model_features"])


@lru_cache(maxsize=8)
def xgb_model(disease: str) -> dict:
    with open(os.path.join(_DIR, f"xgb_{disease}.json")) as f:
        return json.load(f)


@lru_cache(maxsize=8)
def xgb_trees(disease: str):
    """Model compiled to numpy arrays for vectorized traversal:
    list of (left, right, feat, cond, default_left) int/float arrays."""
    import numpy as np

    m = xgb_model(disease)
    trees = [
        (
            np.asarray(t["left"], dtype=np.int32),
            np.asarray(t["right"], dtype=np.int32),
            np.asarray(t["feat"], dtype=np.int32),
            np.asarray(t["cond"], dtype=np.float32),
            np.asarray(t["default_left"], dtype=bool),
        )
        for t in m["trees"]
    ]
    return m["base_score"], trees
