"""Bucketed-table tests: the whole point is the PLAN — a join of two
same-bucketed tables must contain zero shuffle exchanges, and results must
equal the plain join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Row, functions as F

from healthcare_aws_data_engineering_spark.sources.bucketing import (
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    obs = spark.createDataFrame(
        [
            Row(patient_id=i % 50, observation_id=i, value=float(i))
            for i in range(2000)
        ]
    )
    pat = spark.createDataFrame(
        [Row(patient_id=i, gender="F" if i % 2 else "M") for i in range(50)]
    )
    write_bucketed(obs, "obs_b", ["patient_id"], num_buckets=8)
    write_bucketed(pat, "pat_b", ["patient_id"], num_buckets=8)
    yield "obs_b", "pat_b"
    spark.sql("DROP TABLE IF EXISTS obs_b")
    spark.sql("DROP TABLE IF EXISTS pat_b")


def _shuffles(df) -> int:
    plan = df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n(1)")[0]
    return len(re.findall(r"[+:]- Exchange ", tree))


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    obs_t, pat_t = bucketed_tables
    # disable broadcast so the test exercises the bucketed path, as a
    # big-big join at scale would
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, obs_t, pat_t, ["patient_id"])
        assert _shuffles(joined) == 0, "bucketed join must not shuffle"
        got = joined.groupBy("gender").count().collect()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    exp = {("F",): 0, ("M",): 0}
    counts = {r.gender: r["count"] for r in got}
    assert counts["M"] + counts["F"] == 2000
    assert counts["M"] == 2000 // 50 * 25 and counts["F"] == 1000


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    """Aggregation on the bucket key also skips its exchange."""
    obs_t, _ = bucketed_tables
    agg = spark.table(obs_t).groupBy("patient_id").agg(F.sum("value"))
    assert _shuffles(agg) == 0


def test_bucketed_matches_plain_join(spark, bucketed_tables):
    obs_t, pat_t = bucketed_tables
    got = sorted(
        (r.patient_id, r.observation_id, r.gender)
        for r in bucketed_join(spark, obs_t, pat_t, ["patient_id"]).collect()
    )
    exp = sorted(
        (r.patient_id, r.observation_id, r.gender)
        for r in spark.table(obs_t).join(spark.table(pat_t), "patient_id").collect()
    )
    assert got == exp
