from __future__ import annotations

from pyspark.sql import functions as F

from healthcare_aws_data_engineering_spark.operators.latest import (
    first_last_delta,
    latest_per_key,
)
from healthcare_aws_data_engineering_spark.operators.pivot import max_case_pivot

EV_SCHEMA = "event_id long, user_id long, code string, v double, ts string"
ROWS = [
    (1, 1, "a", 10.0, "2024-01-01"),
    (2, 1, "a", 20.0, "2024-01-03"),
    (3, 1, "a", 15.0, "2024-01-02"),
    (4, 1, "b", 7.0, "2024-01-01"),
    (5, 2, "a", 1.0, "2024-01-05"),
    (6, 2, "a", 2.0, "2024-01-05"),  # ts tie with 5 → higher id wins
]


def test_latest_per_key_strategies_agree(spark):
    df = spark.createDataFrame(ROWS, EV_SCHEMA)
    kwargs = dict(
        keys=["user_id", "code"],
        order_col="ts",
        value_cols=["v"],
        tiebreak="event_id",
    )
    agg = latest_per_key(df, strategy="agg", **kwargs)
    win = latest_per_key(df, strategy="window", **kwargs)
    a = {(r.user_id, r.code): r.v for r in agg.collect()}
    w = {(r.user_id, r.code): r.v for r in win.collect()}
    assert a == w == {(1, "a"): 20.0, (1, "b"): 7.0, (2, "a"): 2.0}


def test_first_last_delta(spark):
    df = spark.createDataFrame(ROWS, EV_SCHEMA)
    out = {
        r.user_id: r.asDict()
        for r in first_last_delta(
            df.filter(F.col("code") == "a"),
            keys=["user_id"],
            order_col="ts",
            value_col="v",
            tiebreak="event_id",
        ).collect()
    }
    assert out[1]["first_value"] == 10.0
    assert out[1]["last_value"] == 20.0
    assert out[1]["delta"] == 10.0
    assert out[1]["slope_per_step"] == 5.0
    assert out[2]["first_value"] == 1.0  # tie broken by event_id
    assert out[2]["last_value"] == 2.0


def test_max_case_pivot_mixed_types(spark):
    df = spark.createDataFrame(
        [(1, "k1", 5.0, "x"), (1, "k2", None, "Pos"), (2, "k1", 9.0, None)],
        "pid long, key string, num double, txt string",
    )
    out = max_case_pivot(
        df,
        group_col="pid",
        key_col="key",
        legs={
            "n1": ("k1", F.col("num")),
            "t2": (["k2", "k3"], F.lower(F.col("txt"))),
        },
    )
    rows = {r.pid: r for r in out.collect()}
    assert rows[1].n1 == 5.0 and rows[1].t2 == "pos"
    assert rows[2].n1 == 9.0 and rows[2].t2 is None
    assert dict(out.dtypes)["n1"] == "double"
    assert dict(out.dtypes)["t2"] == "string"


# ---------------------------------------------------------- semi_anti_join --
SF = "/root/testdata/sf0.001"


def test_semi_anti_join_partition(spark):
    """Every customer lands in exactly one class; counts match a python
    model; nations without customers report 0/0."""
    from healthcare_aws_data_engineering_spark.plans.testdata_queries import (
        q_semi_anti_join,
    )

    out = {r.n_name: r for r in q_semi_anti_join(spark, SF).collect()}
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders", "nation"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    total = con.sql("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert sum(r.n_buyers + r.n_idle for r in out.values()) == total
    n_nations = con.sql("SELECT COUNT(*) FROM nation").fetchone()[0]
    assert len(out) == n_nations


def test_semi_anti_join_uses_semi_and_anti(spark):
    from conftest import plan_string
    from healthcare_aws_data_engineering_spark.plans.testdata_queries import (
        q_semi_anti_join,
    )

    plan = plan_string(q_semi_anti_join(spark, SF))
    assert "LeftSemi" in plan and "LeftAnti" in plan, plan
