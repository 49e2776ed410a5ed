"""FHIR Bundle JSON source (SURVEY §2.1 S1/S5).

Parity: the recursive, schema-inferred S3 JSON scan at
``Glue_tranformation_json_parquet.py:52-57`` and the single-document upload
at ``test.py:389-399``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_bundles(
    spark: SparkSession,
    path: str,
    multiline: bool = True,
    schema=None,
) -> DataFrame:
    """Read FHIR bundle documents under ``path`` recursively.

    ``multiline=True`` for pretty-printed one-bundle-per-file documents
    (the reference's raw zone); ``False`` for JSONL. Pass ``schema`` in
    production — at 100 TB you never want a second inference pass over the
    raw zone; infer once on a sample, freeze, and reuse.
    """
    reader = (
        spark.read.option("recursiveFileLookup", "true")
        .option("multiLine", "true" if multiline else "false")
    )
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_bundle_string(spark: SparkSession, bundle_json: str) -> DataFrame:
    """One in-memory FHIR bundle document → single-row DataFrame
    (the Streamlit upload path, ``test.py:389-399``)."""
    return spark.read.json(spark.sparkContext.parallelize([bundle_json]))


def explode_entries(bundles: DataFrame) -> DataFrame:
    """One row per bundle entry, null-safe (``explode_outer``, reference
    :60-63): a bundle with no/NULL ``entry`` still yields a row with a NULL
    resource rather than disappearing."""
    return bundles.select(F.explode_outer("entry").alias("e")).select(
        F.col("e.resource").alias("resource")
    )
