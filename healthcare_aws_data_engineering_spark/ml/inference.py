"""Fitted-parameter inference as Spark expressions (SURVEY §2.10).

Stages (reference ``test.py:324-343`` inference chain, artifacts decoded
by ``tools/extract_ml_params.py``):

- M1 median impute   → ``F.coalesce(col, lit(median_i))`` (stored medians,
  NOT a refit ``pyspark.ml.feature.Imputer``)
- M2 standardize     → ``(x - mean_i) / scale_i`` column math
- M3 PCA 19→14       → 14 dot-product expressions ``Σ c_ji (x_i - m_i)``
- M4 KMeans assign   → argmin of 4 squared distances (array + array_position)
- M5 XGB scoring ×3  → Arrow-vectorized pandas UDF; trees loaded
  per-executor from package params (no joblib/xgboost dependency: the
  boosters are traversed directly with numpy)
- M6 threshold/band  → ``F.when`` ladders (classify_risk, test.py:157-163)

Everything before M5 is pure JVM column math inside whole-stage codegen —
no Python in the hot path; M5 transfers one Arrow batch per partition.

Scale note: per-row affine math scales embarrassingly; the UDF is the only
Python stage and is O(trees × depth) per row with no shuffle.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from .params import DISEASES, feature_names, model_features, sklearn_pipeline, xgb_trees

THRESHOLD = 0.5


# ------------------------------------------------------------------ M1+M2 --
def impute_expr(name: str, median: float) -> Column:
    return F.coalesce(F.col(name).cast("double"), F.lit(float(median)))


def imputed_columns() -> dict[str, Column]:
    p = sklearn_pipeline()
    return {
        n: impute_expr(n, m)
        for n, m in zip(p["feature_names"], p["imputer"]["statistics"])
    }


def scaled_columns() -> dict[str, Column]:
    """Impute → standardize, one expression per feature (fused, no
    intermediate materialization)."""
    p = sklearn_pipeline()
    out: dict[str, Column] = {}
    for n, med, mu, s in zip(
        p["feature_names"],
        p["imputer"]["statistics"],
        p["scaler"]["mean"],
        p["scaler"]["scale"],
    ):
        out[n] = (impute_expr(n, med) - F.lit(float(mu))) / F.lit(float(s))
    return out


# -------------------------------------------------------------------- M3 --
_DEC = "decimal(28,6)"


def _dec_fold(terms: list[Column]) -> Column:
    """Order-independent exact fold of per-row double terms.

    Each TERM is bit-identical across engines (same scalar expression),
    but a chained double ADDITION is not (engines may vectorize/reassociate
    the fold), so sums are accumulated in DECIMAL: identical doubles cast
    to identical decimals, decimal addition is exact, cast back identical.
    Scalar twin of the suite's dsum aggregation pattern."""
    acc: Column | None = None
    for t in terms:
        td = t.cast(_DEC)
        acc = td if acc is None else (acc + td).cast(_DEC)
    return acc.cast("double")


def pca_columns(scaled: dict[str, Column] | None = None) -> list[Column]:
    """z_j = Σ_i components[j][i] * (scaled_i - pca_mean_i), j = 0..13,
    decimal-folded (see :func:`_dec_fold`) so the SQL oracle twin
    (:func:`pca_sql_exprs`) matches bit-for-bit.

    Pass ``scaled`` as plain attribute columns (a staged projection) when
    building a pipeline: inlining the impute+scale expression into every
    one of the 14x19 terms blows the codegen unit up ~20x (seconds of
    Janino compile time per query)."""
    p = sklearn_pipeline()
    scaled = scaled or scaled_columns()
    comps = p["pca"]["components"]
    mean = p["pca"]["mean"]
    names = p["feature_names"]
    out = []
    for j, row in enumerate(comps):
        terms = [
            F.lit(float(c)) * (scaled[n] - F.lit(float(mean[i])))
            for i, (n, c) in enumerate(zip(names, row))
        ]
        out.append(_dec_fold(terms).alias(f"z{j}"))
    return out


# -------------------------------------------------------------------- M4 --
def kmeans_cluster_expr(z_cols: list[str]) -> Column:
    """argmin_j ‖z − center_j‖²; ties break to the LOWER center index
    (array_position returns the first match)."""
    centers = sklearn_pipeline()["kmeans"]["centers"]
    dists = []
    for c in centers:
        terms = []
        for zname, cj in zip(z_cols, c):
            d = F.col(zname) - F.lit(float(cj))
            terms.append(d * d)
        dists.append(_dec_fold(terms))
    arr = F.array(*dists)
    return (F.array_position(arr, F.array_min(arr)) - 1).cast("int")


# -------------------------------------------------------------------- M5 --
def _sigmoid(x):
    import numpy as np

    return 1.0 / (1.0 + np.exp(-x))


def _score_matrix(X, disease: str):
    """Vectorized booster traversal: all rows advance down each tree in
    lock-step (leaf iff left==-1; missing → default_left; x < cond → left).
    Matches xgboost's binary:logistic margin accumulation + base_score."""
    import numpy as np

    base_score, trees = xgb_trees(disease)
    n = X.shape[0]
    margin = np.full(n, math.log(base_score / (1.0 - base_score)), dtype=np.float64)
    isnan = np.isnan(X)
    for left, right, feat, cond, dleft in trees:
        idx = np.zeros(n, dtype=np.int32)
        active = left[idx] != -1
        while active.any():
            ai = idx[active]
            f = feat[ai]
            x = X[active, f]
            miss = isnan[active, f]
            go_left = np.where(miss, dleft[ai], x < cond[ai])
            idx[active] = np.where(go_left, left[ai], right[ai])
            active = left[idx] != -1
        margin += cond[idx].astype(np.float64)
    return _sigmoid(margin)


def xgb_probability(disease: str, feature_cols: list[str]) -> Column:
    """Probability column from the named disease's booster over the given
    14 feature columns (model_features order)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: the hinted form rejects *args signatures; the legacy
    # inference path maps an unhinted *cols to a SCALAR pandas UDF.
    @pandas_udf("double")
    def score(*cols):
        import numpy as np

        X = np.column_stack([c.to_numpy(dtype=np.float32) for c in cols])
        return pd.Series(_score_matrix(X, disease))

    return score(*[F.col(c) for c in feature_cols])


def xgb_probabilities_all(feature_cols: list[str]) -> Column:
    """All three boosters in ONE pandas UDF → struct<cvd,anemia,ckd>.
    One Arrow batch transfer and one feature-matrix build instead of
    three — the production scoring path."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    fields = ", ".join(f"{d} double" for d in DISEASES)

    @pandas_udf(f"struct<{fields}>")
    def score(*cols):
        import numpy as np

        X = np.column_stack([c.to_numpy(dtype=np.float32) for c in cols])
        return pd.DataFrame({d: _score_matrix(X, d) for d in DISEASES})

    return score(*[F.col(c) for c in feature_cols])


# -------------------------------------------------------------------- M6 --
def classify_risk(prob: Column) -> Column:
    """test.py:157-163 banding: <0.25 Low, <0.5 Moderate, else High."""
    return (
        F.when(prob < 0.25, F.lit("Low"))
        .when(prob < 0.5, F.lit("Moderate"))
        .otherwise(F.lit("High"))
    )


# ------------------------------------------------------------ composition --
def preprocess(features: DataFrame, id_col: str = "patient_id") -> DataFrame:
    """features (19 raw columns, nulls allowed) → 14 PCA components +
    cluster id. All JVM column math in ONE projection stage: the repeated
    impute/scale subexpressions are deduplicated by whole-stage codegen's
    subexpression elimination, and the single fused stage measured ~20x
    faster warm than a staged scaled→z→cluster chain of projections."""
    z = features.select(F.col(id_col), *pca_columns())
    znames = [f"z{j}" for j in range(len(sklearn_pipeline()["pca"]["components"]))]
    return z.withColumn("cluster", kmeans_cluster_expr(znames))


def predict_diseases(
    features: DataFrame, id_col: str = "patient_id", threshold: float = THRESHOLD
) -> DataFrame:
    """Full M1→M6 chain as ONE linear flow (no self-join): imputed model
    inputs ride along through the z/cluster stages, then the fused
    3-booster UDF scores once."""
    mf = model_features()  # includes 'cluster'
    imput = imputed_columns()
    carried = [imput[n].alias(n) for n in mf if n != "cluster"]
    znames = [f"z{j}" for j in range(len(sklearn_pipeline()["pca"]["components"]))]
    z = features.select(F.col(id_col), *carried, *pca_columns())
    out = z.withColumn("cluster", kmeans_cluster_expr(znames)).select(
        id_col, "cluster", *[F.col(n) for n in mf if n != "cluster"]
    ).withColumn("__p", xgb_probabilities_all(mf))
    cols = [F.col(id_col), F.col("cluster")]
    for d in DISEASES:
        p = F.col("__p")[d]
        cols += [
            p.alias(f"prob_{d}"),
            (p >= threshold).cast("int").alias(f"flag_{d}"),
            classify_risk(p).alias(f"risk_{d}"),
        ]
    return out.select(*cols)


# ------------------------------------------------------------- SQL twins --
def _f(x: float) -> str:
    """Shortest round-trip float literal — parses to the identical double
    in Spark and DuckDB."""
    return repr(float(x))


def scaled_sql(name: str, med: float, mu: float, s: float) -> str:
    return (
        f"((COALESCE(CAST({name} AS DOUBLE), {_f(med)}) - {_f(mu)}) / {_f(s)})"
    )


def pca_sql_exprs() -> list[str]:
    """SQL twins of :func:`pca_columns` with identical association order."""
    p = sklearn_pipeline()
    names = p["feature_names"]
    scaled = {
        n: scaled_sql(n, med, mu, s)
        for n, med, mu, s in zip(
            names,
            p["imputer"]["statistics"],
            p["scaler"]["mean"],
            p["scaler"]["scale"],
        )
    }
    mean = p["pca"]["mean"]
    out = []
    for row in p["pca"]["components"]:
        terms = [
            f"CAST({_f(c)} * ({scaled[n]} - {_f(mean[i])}) AS DECIMAL(28,6))"
            for i, (n, c) in enumerate(zip(names, row))
        ]
        out.append(f"CAST({' + '.join(terms)} AS DOUBLE)")
    return out


def kmeans_sql_expr(z_names: list[str]) -> str:
    """SQL twin of :func:`kmeans_cluster_expr` (first-match argmin)."""
    centers = sklearn_pipeline()["kmeans"]["centers"]
    dists = []
    for c in centers:
        terms = [
            f"CAST(({z} - {_f(cj)}) * ({z} - {_f(cj)}) AS DECIMAL(28,6))"
            for z, cj in zip(z_names, c)
        ]
        dists.append(f"CAST({' + '.join(terms)} AS DOUBLE)")
    d = [f"({x})" for x in dists]
    arr = ", ".join(d)
    return (
        f"CAST(list_position([{arr}], list_min([{arr}])) - 1 AS INT)"
    )
