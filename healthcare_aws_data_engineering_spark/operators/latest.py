"""Latest-per-key operators (SURVEY §2.5 W1–W3).

Reference pattern: ``ROW_NUMBER() OVER (PARTITION BY patient_id, code_display
ORDER BY effective_datetime DESC) ... WHERE rn = 1``
(``Athena_queries_for_reports.sql:8-9,29`` and ``:86-89,110``) and the pandas
"sort desc, iloc[0]" argmax (``test.py:282-291``).

Two physical strategies, same result:

- ``strategy="agg"`` (default): ``groupBy(keys).agg(max_by(value,
  struct(order, tiebreak)))``. Hash aggregate with map-side partial
  aggregation — ONE shuffle of partially-reduced rows. At 100 TB this is the
  plan you want: no per-partition sort, no carrying every row through a
  window. The struct ordering key makes tie-breaking deterministic.
- ``strategy="window"``: faithful ROW_NUMBER form. Needs a full shuffle +
  sort of *all* rows; kept for parity testing and for callers that need the
  whole winning row without enumerating value columns.

Tie-breaking: the reference's ROW_NUMBER breaks ties arbitrarily (SURVEY
§7.4.5). We stabilize with ``tiebreak`` (e.g. the row id) so Spark and any
SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window as W, functions as F


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_cols: Sequence[str],
    tiebreak: str | None = None,
    strategy: str = "agg",
) -> DataFrame:
    """One row per ``keys`` holding the ``value_cols`` of the row with the
    greatest ``(order_col, tiebreak)``; output columns = keys + value_cols +
    order_col."""
    order_key: list[Column] = [F.col(order_col)]
    if tiebreak:
        order_key.append(F.col(tiebreak))
    if strategy == "agg":
        ord_struct = F.struct(*order_key)
        aggs = [
            F.max_by(F.col(c), ord_struct).alias(c) for c in value_cols
        ] + [F.max(F.col(order_col)).alias(order_col)]
        return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
    if strategy == "window":
        w = W.partitionBy(*keys).orderBy(*[c.desc() for c in order_key])
        out = df.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") == 1
        )
        return out.select(*keys, *value_cols, order_col)
    raise ValueError(f"unknown strategy: {strategy}")


# test.py:133-141 — the display-name sets the app probes for vitals
HEIGHT_NAMES = ("Body height", "Body height (measured)")
WEIGHT_NAMES = ("Body weight", "Body weight (measured)")


def height_weight(
    obs: DataFrame,
    height_names: Sequence[str] = HEIGHT_NAMES,
    weight_names: Sequence[str] = WEIGHT_NAMES,
    patient_col: str = "patient_id",
    code_col: str = "code_display",
    value_col: str = "value_quantity",
    order_col: str = "effective_datetime",
    tiebreak: str = "observation_id",
    with_bmi: bool = True,
) -> DataFrame:
    """Latest height and weight per patient (reference
    ``get_height_weight``, test.py:265-293: filter ``code_display`` by the
    HEIGHT_NAMES/WEIGHT_NAMES sets at :133-141, sort by
    ``effective_datetime`` desc, take the first row — undated rows sort
    LAST, mirrored here by the leading ``isNotNull`` struct field; ties
    stabilized on ``tiebreak``).

    The reference fetches one patient at a time in pandas; this is the
    distributed form — ONE hash aggregate over all patients (conditional
    ``max_by`` legs share the shuffle; no window sort, map-side partials).

    ``with_bmi`` (extension — the reference displays height/weight only,
    test.py:454-464): ``weight_kg / (height_cm/100)²`` when both present."""
    is_h = F.col(code_col).isin(list(height_names))
    is_w = F.col(code_col).isin(list(weight_names))
    ordk = F.struct(
        F.col(order_col).isNotNull().cast("int"),
        F.col(order_col),
        F.col(tiebreak),
    )
    out = (
        obs.filter(is_h | is_w)
        .groupBy(F.col(patient_col))
        .agg(
            F.max_by(F.when(is_h, F.col(value_col)), F.when(is_h, ordk)).alias(
                "height_cm"
            ),
            F.max_by(F.when(is_w, F.col(value_col)), F.when(is_w, ordk)).alias(
                "weight_kg"
            ),
        )
    )
    if with_bmi:
        hm = F.col("height_cm") / 100.0
        out = out.withColumn(
            "bmi",
            F.when(
                (F.col("height_cm") > 0) & F.col("weight_kg").isNotNull(),
                F.col("weight_kg") / (hm * hm),
            ),
        )
    return out


def first_last_delta(
    df: DataFrame,
    keys: Sequence[str],
    order_col: str,
    value_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per key: first value, last value, delta last-first, and per-step slope
    ``(last-first)/(n-1)`` (reference trend math, ``test.py:669-675``,
    ``mrp_website.py:534-541``).

    Implemented as ``min_by``/``max_by`` hash aggregation (one shuffle with
    partial aggregation) rather than a window — same scale argument as
    :func:`latest_per_key`.
    """
    order_key = [F.col(order_col)] + ([F.col(tiebreak)] if tiebreak else [])
    ord_struct = F.struct(*order_key)
    n = F.count(F.when(F.col(value_col).isNotNull(), 1))
    first_v = F.min_by(F.col(value_col), ord_struct)
    last_v = F.max_by(F.col(value_col), ord_struct)
    return df.filter(F.col(value_col).isNotNull()).groupBy(
        *[F.col(k) for k in keys]
    ).agg(
        first_v.alias("first_value"),
        last_v.alias("last_value"),
        (last_v - first_v).alias("delta"),
        F.when(n > 1, (last_v - first_v) / (n - 1)).alias("slope_per_step"),
        n.alias("n_points"),
    )
