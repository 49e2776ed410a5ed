"""Parquet table sources (SURVEY §2.1 S3) and the events→observation analog.

The reference declares its curated tables as external Parquet tables
(``AWS_Athena_queries.sql:3-67``); here the equivalent is
``spark.read.parquet`` + temp-view registration. Scans stay declarative so
Catalyst gets predicate pushdown and column pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _timestamp_ns_columns(path: str) -> list[str]:
    """Column names stored as parquet TIMESTAMP(NANOS) — a metadata-only
    footer read (no data I/O), so it's cheap even against object storage."""
    try:
        import pyarrow.parquet as pq

        schema = pq.read_schema(path)
        return [f.name for f in schema if str(f.type) == "timestamp[ns]"]
    except Exception:
        return []


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata parquet table.

    Spark's vectorized reader rejects INT64 TIMESTAMP(NANOS) columns (the
    driver's ``events.ts`` is one). We read them as raw nanos via the
    ``nanosAsLong`` escape hatch and truncate to microseconds with *integer*
    division (``div``), which matches DuckDB's nanos→micros truncation —
    double division would lose precision above 2^53 ns.
    """
    path = f"{sf_dir}/{name}.parquet"
    # Naive parquet timestamps (isAdjustedToUTC=false, e.g. the driver's
    # ``events.ts`` as timestamp[us]) must read as TIMESTAMP (LTZ), not
    # TIMESTAMP_NTZ: the stored int64 micros are then taken as the epoch
    # instant verbatim — exactly how DuckDB's epoch_ms() treats the same
    # value — and epoch-math functions (unix_millis etc.) stay applicable.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    ns_cols = _timestamp_ns_columns(path)
    if not ns_cols:
        return spark.read.parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(path)
    for c in ns_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` div 1000)"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES, register: bool = False
) -> dict[str, DataFrame]:
    out = {}
    for name in names:
        df = load_table(spark, sf_dir, name)
        if register:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out


def observation_view_from_events(events: DataFrame) -> DataFrame:
    """Map the driver's ``events`` table onto the curated ``observation``
    schema (FIXTURES.md §5): user_id→patient_id, event_type→code_display,
    value→value_quantity, ts→effective_datetime, props→value_string,
    event_id→observation_id.

    A pure column rename/projection — zero cost, fuses into the scan.
    """
    return events.select(
        F.col("event_id").alias("observation_id"),
        F.col("user_id").alias("patient_id"),
        F.col("event_type").alias("code_display"),
        F.col("value").alias("value_quantity"),
        F.col("ts").alias("effective_datetime"),
        F.col("props").alias("value_string"),
    )
