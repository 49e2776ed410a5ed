"""Bucketed-table helpers: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a big⋈big equi-join is shuffling both
sides. Bucketing pays that shuffle ONCE at write time: both tables are
hash-partitioned into the same number of buckets on the join key, so
every future join/aggregate on that key runs with ZERO exchanges (each
task reads matching bucket files from both sides).

The curated healthcare tables join on ``patient_id``/``encounter_id``
constantly (SURVEY §2.3 J1/J2) — bucketing observation/condition/encounter
by ``patient_id`` makes every patient-level join and groupBy shuffle-free.

Requires a session catalog (``saveAsTable``; plain ``.parquet(path)``
files cannot carry bucket metadata).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally sorted-within-bucket) table.

    ``sort_cols`` additionally sorts rows inside each bucket file — joins
    and max_by-style aggregates on (bucket key, sort key) then skip their
    Sort as well."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs the plan contains no Exchange on either side (assert with
    .explain — the test suite does)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)
