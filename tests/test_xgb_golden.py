"""Independent ground truth for the XGB scorer (SURVEY §2.10 M5).

The production scorer (``inference._score_matrix``) is a stacked-array
numpy traversal; a bug in its routing (missing→default_left, the strict
``x < cond``, leaf self-loops) or margin math (base_score logit, leaf
accumulation, sigmoid) could be self-consistent with the scalar twin it
was previously tested against. This file pins an INDEPENDENT oracle:

1. a from-scratch recursive walker over the RAW booster JSON (the
   xgboost dump format: leaf iff left == -1, leaf value stored in cond,
   missing routes default_left, ``x < cond`` goes left) — no shared code
   with the numpy implementation;
2. structurally FORCED paths: -inf routes left at every split, +inf
   right, NaN along default_left — these exercise every routing rule
   without depending on comparison outcomes;
3. GOLDEN probabilities computed once from the independent walker and
   pinned as literals — a regression in either implementation breaks the
   pin, and agreement of two independently-written traversals is the
   strongest ground truth available without the xgboost runtime
   (reference test.py:324-343 scores with real xgboost).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from healthcare_aws_data_engineering_spark.ml.inference import _score_matrix
from healthcare_aws_data_engineering_spark.ml.params import (
    DISEASES,
    model_features,
    xgb_model,
)


# ---------------------------------------------------- independent walker --
def _walk_raw(tree: dict, x: list[float]) -> float:
    """Recursive spec walker on the raw JSON dict (independent of the
    numpy stacked traversal). Split conditions and leaf weights quantize
    to float32 first: the reference artifact stores decimal-rounded
    values, and xgboost loads both into float32 tensors, so float32 is
    the faithful comparison/accumulation grid (the extracted params keep
    float64 JSON; the scorer casts on load)."""
    i = 0
    while tree["left"][i] != -1:
        v = x[tree["feat"][i]]
        cond32 = float(np.float32(tree["cond"][i]))
        if v is None or (isinstance(v, float) and math.isnan(v)):
            go_left = bool(tree["default_left"][i])
        else:
            go_left = float(np.float32(v)) < cond32
        i = tree["left"][i] if go_left else tree["right"][i]
    return float(np.float32(tree["cond"][i]))


def _prob_raw(disease: str, x: list[float]) -> float:
    m = xgb_model(disease)
    margin = math.log(m["base_score"] / (1.0 - m["base_score"]))
    for t in m["trees"]:
        margin += _walk_raw(t, x)
    return 1.0 / (1.0 + math.exp(-margin))


def _score_one(disease: str, x: list[float]) -> float:
    X = np.asarray([x], dtype=np.float32)
    return float(_score_matrix(X, disease)[0])


NF = len(model_features())

# Golden pins: probabilities from the independent raw-JSON walker
# (generation documented in the module docstring; vectors on the float32
# grid because the scoring UDF casts batches to float32).
GOLDEN_FORCED = {
    # every feature NaN → default_left at every split (+ base_score logit)
    "all_nan": {
        "cvd": 6.734933078290726e-05,
        "anemia": 6.393949893755207e-05,
        "ckd": 3.039096733728598e-05,
    },
    # -inf < cond always true → structurally forced all-left paths
    "all_neginf": {
        "cvd": 0.200788961879569,
        "anemia": 0.26838000508512566,
        "ckd": 0.9717362912084528,
    },
    # +inf < cond always false → structurally forced all-right paths
    "all_posinf": {
        "cvd": 0.07476680189732772,
        "anemia": 0.02917938512065842,
        "ckd": 0.0037815610757912063,
    },
}
FORCED_VECTORS = {
    "all_nan": [float("nan")] * NF,
    "all_neginf": [float("-inf")] * NF,
    "all_posinf": [float("inf")] * NF,
}

GOLDEN_RANDOM = {
    "rand0": {"cvd": 0.2086004485408038, "anemia": 0.3455267979556117, "ckd": 0.944876658228952},
    "rand1": {"cvd": 0.62937676047629, "anemia": 0.06434798660349865, "ckd": 0.9864805209899171},
    "rand2": {"cvd": 0.11579022342175799, "anemia": 0.3755078636091264, "ckd": 0.9225789340510051},
    "rand3": {"cvd": 0.07021994005051345, "anemia": 0.8016206405575201, "ckd": 0.04121559547017949},
    "rand4": {"cvd": 0.5050387447606508, "anemia": 0.6746783906123213, "ckd": 0.974906620017175},
    "rand5": {"cvd": 0.02441583543552996, "anemia": 0.6254385493527842, "ckd": 0.00023202224791141234},
}
RANDOM_VECTORS = {
    "rand0": [1.1210275888442993, float("nan"), float("nan"), 2.441570281982422, 0.10044905543327332, 0.3833765387535095, -0.6330506801605225, 1.086223840713501, -0.8202016353607178, -0.36960771679878235, 1.1401851177215576, 1.4653977155685425, 0.9891571998596191, -1.5456703901290894],
    "rand1": [float("nan"), 0.6230683326721191, -1.4397499561309814, -1.1213454008102417, -1.2239445447921753, -0.5993049740791321, 1.143491506576538, -2.123051881790161, 3.570650100708008, -2.9899845123291016, float("nan"), 2.5443015098571777, 0.34341710805892944, -0.7913205623626709],
    "rand2": [-2.1003763675689697, 1.5598981380462646, float("nan"), -1.5458506345748901, -1.104713797569275, 0.23369348049163818, -0.38503679633140564, 0.9016430377960205, float("nan"), -1.2487695217132568, -1.0774637460708618, 0.9982133507728577, -0.7999139428138733, -1.3647732734680176],
    "rand3": [-0.6456934213638306, 0.08347616344690323, -1.2356387376785278, 0.5388514995574951, 0.5456880927085876, -0.37880855798721313, float("nan"), float("nan"), -1.9923819303512573, 0.6255508661270142, 1.8643497228622437, -0.7470918297767639, float("nan"), -2.803598403930664],
    "rand4": [float("nan"), -0.0939275249838829, float("nan"), -0.8610416650772095, float("nan"), 0.5112974047660828, 0.5459150671958923, 0.33699923753738403, -1.6468031406402588, -2.112666130065918, 0.41751939058303833, 2.39961576461792, -3.180556535720825, float("nan")],
    "rand5": [-0.32232487201690674, 0.5792120695114136, -1.1385551691055298, 0.660323977470398, float("nan"), float("nan"), -0.4537550210952759, float("nan"), 0.21787835657596588, -1.2418618202209473, -0.18604181706905365, float("nan"), float("nan"), 2.36466908454895],
}


@pytest.mark.parametrize("case", list(GOLDEN_FORCED))
@pytest.mark.parametrize("disease", DISEASES)
def test_forced_paths_match_golden(case, disease):
    """Structurally forced routing (all-left / all-right / all-default):
    both the raw-JSON walker and the production scorer must reproduce the
    pinned probability — covers default_left handling, strict x < cond,
    base_score margin, and sigmoid in one assertion each."""
    x = FORCED_VECTORS[case]
    want = GOLDEN_FORCED[case][disease]
    assert _prob_raw(disease, x) == pytest.approx(want, abs=1e-12)
    assert _score_one(disease, x) == pytest.approx(want, abs=1e-10)


@pytest.mark.parametrize("case", list(GOLDEN_RANDOM))
@pytest.mark.parametrize("disease", DISEASES)
def test_random_vectors_match_golden(case, disease):
    """Pinned mixed NaN/value vectors on the float32 grid: independent
    walker and production scorer agree with the golden literals."""
    x = RANDOM_VECTORS[case]
    want = GOLDEN_RANDOM[case][disease]
    assert _prob_raw(disease, x) == pytest.approx(want, abs=1e-12)
    assert _score_one(disease, x) == pytest.approx(want, abs=1e-10)


def test_batch_consistency_with_walker():
    """The full batch path (one matrix, many rows) equals the per-row
    walker for every pinned vector — catches row-mixing/indexing bugs in
    the stacked traversal that single-row calls cannot."""
    names = list(RANDOM_VECTORS) + list(FORCED_VECTORS)
    X = np.asarray(
        [RANDOM_VECTORS.get(n) or FORCED_VECTORS[n] for n in names],
        dtype=np.float32,
    )
    for d in DISEASES:
        got = _score_matrix(X, d)
        for i, n in enumerate(names):
            assert got[i] == pytest.approx(
                _prob_raw(d, list(X[i].astype(float))), abs=1e-9
            ), (d, n)
