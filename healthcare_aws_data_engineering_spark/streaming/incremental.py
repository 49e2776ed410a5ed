"""Incremental FHIR ingest — Glue job-bookmark semantics on Spark
(SURVEY §2.9).

``incremental_fhir_ingest`` = the rebuild of the reference's bookmarked
Glue run (``Glue_tranformation_json_parquet.py:52-57`` source + ``:186-199``
append/commit): a Structured Streaming JSON file source with
``trigger(availableNow=True)`` drains all files not yet recorded in the
checkpoint, applies the SAME four extraction pipelines as the batch ETL
(:mod:`..plans.etl`) inside ``foreachBatch``, appends Parquet, and stops.
Re-running after new files land processes ONLY the new files — exactly the
job-bookmark contract (checkpoint dir ≙ bookmark state; ``job.commit()`` ≙
checkpoint commit).

Scale notes:
- the file source lists incrementally and splits work across executors;
  ``maxFilesPerTrigger`` (latched via ``options``) bounds batch size for
  backfills so one giant drop doesn't produce one giant micro-batch;
- ``foreachBatch`` caches the exploded entries once per micro-batch and
  fans out the four extractions, same as the batch ETL;
- per-batch dedup is WITHIN the batch (matching the reference, which
  dedups within each bookmarked run, not against already-curated data —
  cross-run keyed dedup would need a MERGE-capable table format, recorded
  as a deliberate deviation candidate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..plans.etl import (
    extract_conditions,
    extract_encounters,
    extract_observations,
    extract_patients,
)
from ..sources.fhir import explode_entries
from ..sources.writers import write_parquet

RESOURCES = ("patient", "encounter", "condition", "observation")


def infer_bundle_schema(spark: SparkSession, raw_path: str, multiline: bool = True) -> StructType:
    """One batch inference pass over the current raw zone. Streaming
    sources need an explicit schema; the reference leaned on Glue's per-run
    inference. Pin the returned schema in config for production so late
    fields can't silently change extraction."""
    reader = spark.read.option("recursiveFileLookup", "true")
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.json(raw_path).schema


def _process_batch(batch: DataFrame, curated_path: str, deterministic_dedup: bool) -> None:
    entries = explode_entries(batch).cache()
    try:
        outputs = {
            "patient": extract_patients(entries, deterministic_dedup),
            "encounter": extract_encounters(entries, deterministic_dedup),
            "condition": extract_conditions(entries, deterministic_dedup),
            "observation": extract_observations(entries, deterministic_dedup),
        }
        for name, df in outputs.items():
            write_parquet(df, curated_path, name)
    finally:
        entries.unpersist()


def incremental_fhir_ingest(
    spark: SparkSession,
    raw_path: str,
    curated_path: str,
    checkpoint_path: str,
    schema: StructType | None = None,
    multiline: bool = True,
    deterministic_dedup: bool = False,
    max_files_per_trigger: int | None = None,
    await_termination: bool = True,
):
    """One bookmarked run: drain new raw files → append curated Parquet.

    Returns the (terminated, unless ``await_termination=False``) streaming
    query. Each invocation with the same ``checkpoint_path`` processes only
    files the checkpoint has not seen — Glue bookmark parity.
    """
    schema = schema or infer_bundle_schema(spark, raw_path, multiline)
    reader = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .option("multiLine", "true" if multiline else "false")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.json(raw_path)

    query = (
        stream.writeStream.foreachBatch(
            lambda batch, _id: _process_batch(batch, curated_path, deterministic_dedup)
        )
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        query.awaitTermination()
    return query
