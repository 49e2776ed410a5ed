"""Extract fitted ML parameters from the reference model artifacts into
plain JSON under ``healthcare_aws_data_engineering_spark/ml/params/``.

The reference ships sklearn/XGBoost artifacts (SURVEY §2.10: imputer /
scaler / pca / kmeans joblib dumps + three XGBoost binary:logistic JSON
boosters). For parity we must NOT refit — we apply the stored parameters
as Spark column math / a vectorized UDF. This script reads the artifacts
ONCE and emits the numeric parameters as JSON; the engine depends only on
those JSON files.

joblib/sklearn are not installed here, so the .joblib files (uncompressed
pickle-protocol-4 streams with joblib's out-of-band numpy payload) are
parsed with a minimal reimplementation of joblib's NumpyArrayWrapper read
protocol: the wrapper object is pickled inline, then (after a 1-byte
padding-length + padding, when alignment is enabled) the raw C-order array
bytes follow in the stream.

Provenance (read-only): /root/reference/{imputer,scaler,pca_14components,
kmeans_k4}.joblib, xgb_{cvd,anemia,ckd}_model.json, feature_columns.json.

Usage: python tools/extract_ml_params.py
"""

from __future__ import annotations

import io
import json
import os
import pickle
import struct

import numpy as np

REF = "/root/reference"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "healthcare_aws_data_engineering_spark",
    "ml",
    "params",
)


class _ArrayWrapper:
    """Stand-in for joblib.numpy_pickle.NumpyArrayWrapper: its pickled
    attributes describe the raw ndarray bytes that FOLLOW it in the file."""

    def read(self, fh: io.BufferedReader) -> np.ndarray:
        d = self.__dict__
        dtype = d["dtype"]
        shape = tuple(d["shape"])
        order = d.get("order", "C")
        if dtype.hasobject:
            # Object arrays are pickled in-band (no padding, no raw bytes).
            return pickle.load(fh)
        if d.get("numpy_array_alignment_bytes"):
            pad = int.from_bytes(fh.read(1), "little")
            fh.read(pad)
        count = 1
        for s in shape:
            count *= s
        raw = fh.read(count * dtype.itemsize)
        arr = np.frombuffer(raw, dtype=dtype, count=count).copy()
        if order == "F":
            arr.shape = shape[::-1]
            arr = arr.T
        else:
            arr.shape = shape
        return arr


class _Stub:
    """Generic attribute bag for sklearn estimator objects."""

    def __setstate__(self, state):
        if isinstance(state, dict):
            self.__dict__.update(state)
        else:
            self.__dict__["__state__"] = state


def _make_stub(module: str, name: str):
    return type(name, (_Stub,), {"__module__": module})


class _JoblibUnpickler(pickle._Unpickler):
    """pickle._Unpickler with joblib's load_build hook: when the object
    just BUILT is an array wrapper, splice in the raw array that follows."""

    dispatch = dict(pickle._Unpickler.dispatch)

    def __init__(self, fh):
        super().__init__(fh)
        self._fh = fh

    def find_class(self, module, name):
        if name in ("NumpyArrayWrapper", "NDArrayWrapper"):
            return _ArrayWrapper
        if module.startswith("numpy"):
            return super().find_class(module, name)
        if module.startswith(("sklearn", "scipy", "threadpoolctl")):
            return _make_stub(module, name)
        return super().find_class(module, name)

    def load_build(self):
        pickle._Unpickler.load_build(self)
        obj = self.stack[-1]
        if isinstance(obj, _ArrayWrapper):
            self.stack[-1] = obj.read(self._fh)

    dispatch[pickle.BUILD[0]] = load_build


def load_joblib(path: str):
    with open(path, "rb") as fh:
        return _JoblibUnpickler(fh).load()


def _tolist(a) -> list:
    return np.asarray(a, dtype=np.float64).tolist()


def extract_sklearn() -> dict:
    imp = load_joblib(f"{REF}/imputer.joblib")
    sc = load_joblib(f"{REF}/scaler.joblib")
    pca = load_joblib(f"{REF}/pca_14components.joblib")
    km = load_joblib(f"{REF}/kmeans_k4.joblib")

    feats = [str(x) for x in imp.feature_names_in_]
    out = {
        "feature_names": feats,
        "imputer": {"strategy": imp.strategy, "statistics": _tolist(imp.statistics_)},
        "scaler": {"mean": _tolist(sc.mean_), "scale": _tolist(sc.scale_)},
        "pca": {
            "mean": _tolist(pca.mean_),
            "components": _tolist(pca.components_),  # (14, 19)
        },
        "kmeans": {"centers": _tolist(km.cluster_centers_)},  # (4, 14)
    }
    with open(f"{REF}/feature_columns.json") as f:
        out["model_features"] = json.load(f)
    return out


def extract_xgb(name: str) -> dict:
    """Compact the XGBoost JSON booster to flat per-tree arrays for a
    vectorized numpy traversal (leaf iff left_children[i] == -1; leaf value
    lives in split_conditions[i]; missing goes to default_left)."""
    with open(f"{REF}/xgb_{name}_model.json") as f:
        model = json.load(f)
    learner = model["learner"]
    gbm = learner["gradient_booster"]["model"]
    trees = []
    for t in gbm["trees"]:
        trees.append(
            {
                "left": [int(x) for x in t["left_children"]],
                "right": [int(x) for x in t["right_children"]],
                "feat": [int(x) for x in t["split_indices"]],
                "cond": [float(x) for x in t["split_conditions"]],
                "default_left": [int(x) for x in t["default_left"]],
            }
        )
    return {
        "objective": learner["objective"]["name"],
        # serialized as a bracketed vector string, e.g. "[1.0553987E-1]"
        "base_score": float(
            learner["learner_model_param"]["base_score"].strip("[]")
        ),
        "feature_names": learner.get("feature_names") or [],
        "num_trees": len(trees),
        "trees": trees,
    }


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    sk = extract_sklearn()
    with open(f"{OUT}/sklearn_pipeline.json", "w") as f:
        json.dump(sk, f)
    print(
        f"sklearn_pipeline.json: {len(sk['feature_names'])} features, "
        f"pca {len(sk['pca']['components'])}x{len(sk['pca']['components'][0])}, "
        f"kmeans {len(sk['kmeans']['centers'])} centers"
    )
    for disease in ("cvd", "anemia", "ckd"):
        xg = extract_xgb(disease)
        with open(f"{OUT}/xgb_{disease}.json", "w") as f:
            json.dump(xg, f)
        print(
            f"xgb_{disease}.json: {xg['num_trees']} trees, "
            f"base_score={xg['base_score']}, obj={xg['objective']}"
        )


if __name__ == "__main__":
    main()
