"""Interval (range) join — points joined to the intervals containing
them. Spark has no native interval-join strategy: a raw
``p.v BETWEEN i.lo AND i.hi`` join plans as a broadcast-nested-loop (or
a cross product when neither side broadcasts), O(|p|·|i|) comparisons.

Bin-bucketing rewrite: pick a bin width ``w``; each interval explodes to
the bins it covers (``floor(lo/w) .. floor(hi/w)`` — bounded fan-out of
``width/w + 1`` rows), each point maps to its single bin, and the match
becomes an EQUI-join on bin followed by the exact BETWEEN filter. Every
true (point, interval) pair meets in exactly one bin (the point's), so
no dedup pass is needed.

Scale: one hash shuffle of each side on bin; comparisons drop from
|p|·|i| to Σ_bin |p_bin|·|i_bin|. Choose ``w`` near the typical interval
width — too coarse concentrates the shuffle on few bins (skew), too fine
inflates the interval fan-out. AQE's skew-join split handles residual
hot bins like any other keyed shuffle here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner join of each point row to every interval row with
    ``lo <= point <= hi`` (inclusive both ends). Column names must not
    collide between the two inputs (select/alias first)."""
    p = points.withColumn("__bin", F.floor(F.col(point_col) / bin_width))
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bin_width),
                F.floor(F.col(hi_col) / bin_width),
            )
        ),
    )
    return (
        p.join(i, on="__bin", how="inner")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bin")
    )
