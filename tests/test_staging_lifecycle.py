"""Operator-internal persist lifecycle (r15 verdict #3): a long-lived
session running the same staging-persisting query repeatedly must not
accumulate cached generations — ``operators/staging.py`` bounds each
call site to ONE live entry."""

from __future__ import annotations

import pytest
from pyspark.sql import SparkSession, functions as F

from healthcare_aws_data_engineering_spark.operators import staging
from healthcare_aws_data_engineering_spark.operators.ppjoin import (
    prefix_jaccard_join,
)
from healthcare_aws_data_engineering_spark.operators.spans import (
    repeated_spans,
    scrub_repeated,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from healthcare_aws_data_engineering_spark.session import get_spark

    return get_spark("test-staging-lifecycle")


def _cached_rdd_count(spark) -> int:
    return len(
        [
            i
            for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
            if i.numCachedPartitions() > 0
        ]
    )


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_repeated_calls_hold_at_most_one_generation_per_site(spark):
    spark.catalog.clearCache()
    mkers = [
        lambda: prefix_jaccard_join(_docs(spark)).count(),
        lambda: repeated_spans(_docs(spark)).count(),
        lambda: scrub_repeated(_docs(spark)).count(),
    ]
    for mk in mkers:
        mk()
    first = _cached_rdd_count(spark)
    # run each query twice more: generations must be replaced, not added
    for mk in mkers:
        mk()
        mk()
    assert _cached_rdd_count(spark) <= first, (
        "staging persists accumulated across calls"
    )
    spark.catalog.clearCache()


def test_staged_persist_replaces_previous_generation(spark):
    spark.catalog.clearCache()
    df1 = staging.staged_persist(
        _docs(spark).select("doc_id"), "test.site"
    )
    df1.count()
    assert df1.storageLevel.useMemory
    df2 = staging.staged_persist(
        _docs(spark).select("doc_id", "source"), "test.site"
    )
    df2.count()
    # the first generation was released when the second registered
    assert not df1.storageLevel.useMemory
    assert df2.storageLevel.useMemory
    staging.release("test.site")
    assert not df2.storageLevel.useMemory
    staging.release("test.site")  # idempotent, no KeyError
