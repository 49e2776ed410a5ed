"""Audit output column types of every driver query + oracle.

The driver's compare is only proven robust for int/bigint, double,
varchar, boolean, and date/timestamp cells (every driver-green r2 query
emits only those).  DECIMAL and HUGEINT outputs hashed differently on
the driver than in the local replica (r2: ann_pq_topk, ml_risk_scores,
dist_summary) — flag ANY query whose DuckDB result carries them, and any
Spark result carrying DecimalType.

Usage: python tools/audit_types.py [sf_dir] [--spark]
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

SAFE_DUCK = {
    "BIGINT", "INTEGER", "SMALLINT", "TINYINT", "UBIGINT", "UINTEGER",
    "DOUBLE", "FLOAT", "VARCHAR", "BOOLEAN", "DATE", "TIMESTAMP",
    "TIMESTAMP WITH TIME ZONE", "BLOB",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    with_spark = "--spark" in sys.argv
    from __spark_entry__ import oracle_sql, queries

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = oracle_sql()
    qs = queries()
    flagged = 0
    spark = None
    if with_spark:
        from healthcare_aws_data_engineering_spark.session import get_spark

        spark = get_spark("type-audit")
        spark.sparkContext.setLogLevel("ERROR")
    for name in qs:
        bad = []
        if name in oracles:
            try:
                rel = con.sql(oracles[name])
                for cname, dtype in zip(rel.columns, rel.types):
                    base = str(dtype).upper()
                    if base not in SAFE_DUCK:
                        bad.append(f"duck {cname}:{dtype}")
            except Exception as e:  # noqa: BLE001
                bad.append(f"duck ERROR {e}")
        if spark is not None:
            try:
                sdf = qs[name](spark, sf_dir)
                for f in sdf.schema.fields:
                    t = f.dataType.simpleString()
                    if t.startswith("decimal"):
                        bad.append(f"spark {f.name}:{t}")
            except Exception as e:  # noqa: BLE001
                bad.append(f"spark ERROR {e}")
        if bad:
            flagged += 1
            print(f"{name:24s} FLAG  {'; '.join(bad)}")
    print(f"\n{flagged} queries flagged")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
