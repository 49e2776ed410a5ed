"""MAX(CASE WHEN key=k THEN expr END) conditional pivot (SURVEY §2.4 A2).

Reference: ``Athena_queries_for_reports.sql:17-31, 98-112`` — one output
column per analyte, numeric and text legs mixed in one GROUP BY.

We deliberately do NOT use ``DataFrame.pivot``: the reference mixes
``TRY_CAST(... AS DOUBLE)`` legs with ``LOWER(TRIM(text))`` legs in one pivot
(SURVEY §7.4.4), and per-column agg expressions preserve each leg's type
exactly. Physically this is a single hash aggregate with map-side partial
aggregation — one shuffle regardless of how many output columns, which is the
scalable shape (a join-per-analyte alternative would be K shuffles).
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, functions as F


def max_case_pivot(
    df: DataFrame,
    group_col: str,
    key_col: str,
    legs: Mapping[str, tuple[object, Column]],
) -> DataFrame:
    """``legs`` maps output column name → (key match, value expression).

    The key match is a single value or a list/tuple/set of values (IN-list
    leg, as in the urine-glucose pivot at
    ``Athena_queries_for_reports.sql:106-108``).
    """
    aggs = []
    for out_name, (match, value_expr) in legs.items():
        if isinstance(match, (list, tuple, set, frozenset)):
            cond = F.col(key_col).isin(list(match))
        else:
            cond = F.col(key_col) == F.lit(match)
        aggs.append(F.max(F.when(cond, value_expr)).alias(out_name))
    return df.groupBy(group_col).agg(*aggs)
