"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at the given scale factor, then compares row count, column names,
and an order-insensitive value hash (rows stringified, sorted, md5).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb

sys.path.insert(0, ".")

from healthcare_aws_data_engineering_spark.session import get_spark
from __spark_entry__ import oracle_sql, queries

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        # Render with enough digits to be exact for doubles.
        return repr(v)
    return str(v)


def _rows_fingerprint(cols, rows):
    proj = sorted(cols)
    idx = [cols.index(c) for c in proj]
    lines = sorted("\x01".join(_norm_cell(r[i]) for i in idx) for r in rows)
    h = hashlib.md5()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs, oracles = queries(), oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        spark_s = time.time() - t0
        # Same cache hygiene as bench.py: queries that persist
        # intermediates (ppjoin's token table, gap_fill's daily rollup)
        # must not accumulate cached generations across a 110-query run.
        spark.catalog.clearCache()
        if name not in oracles:
            print(f"{name:24s} rows={len(srows):7d}  (no oracle: rows-only) "
                  f"[{spark_s:.1f}s]")
            continue
        t0 = time.time()
        res = con.execute(oracles[name])
        ocols = [d[0] for d in res.description]
        orows = res.fetchall()
        duck_s = time.time() - t0
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if not problems:
            hs = _rows_fingerprint(scols, srows)
            ho = _rows_fingerprint(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                # show a few differing lines for debugging
                sset = {
                    "\x01".join(
                        _norm_cell(r[scols.index(c)]) for c in sorted(scols)
                    )
                    for r in srows
                }
                oset = {
                    "\x01".join(
                        _norm_cell(r[ocols.index(c)]) for c in sorted(ocols)
                    )
                    for r in orows
                }
                for line in list(sset - oset)[:3]:
                    print(f"    spark-only: {line!r}")
                for line in list(oset - sset)[:3]:
                    print(f"    duck-only:  {line!r}")
        status = "OK " if not problems else "FAIL"
        print(
            f"{name:24s} {status} rows={len(srows):7d} "
            f"[spark {spark_s:.1f}s, duck {duck_s:.2f}s]"
            + ("  " + "; ".join(problems) if problems else "")
        )
        failures += bool(problems)
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
