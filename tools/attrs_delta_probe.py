"""Composite-suite delta from materialized shared staging (r6 verdict
optional #8).

Times the curation composites three ways at the given SF: (a) deriving
every staging from raw text per query — the driver-gate shape; (b) with
a doc_attributes parquet via ``spark.graft.attributesPath``; (c) with
BOTH the attribute table and the near-dup cluster table
(``spark.graft.clustersPath``) — the once-per-snapshot tagger+dedup
shape a 100 TB pipeline runs. Also reports the one-off materialization
costs. Results recorded in BASELINE.md.

Run: python tools/attrs_delta_probe.py [sf_dir]   # default sf0.1
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from healthcare_aws_data_engineering_spark.operators.text import doc_attributes
from healthcare_aws_data_engineering_spark.plans import (
    training_data_queries as tq,
)
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.sources.tables import load_table

COMPOSITES = {
    "corpus_curation": tq.q_corpus_curation,
    "quality_calibrated": tq.q_quality_calibrated,
    "domain_cap": tq.q_domain_cap,
    "token_budget_fill": tq.q_token_budget_fill,
    "dedup_weighted": tq.q_dedup_weighted,
    "cluster_split": tq.q_cluster_split,
}


def timed(fn):
    t0 = time.perf_counter()
    n = fn().count()
    return round(time.perf_counter() - t0, 2), n


def run_suite(spark, sf_dir):
    out = {}
    for name, q in COMPOSITES.items():
        spark.catalog.clearCache()
        sec, rows = timed(lambda: q(spark, sf_dir))
        out[name] = sec
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("attrs-delta-probe")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/scan path once
    run_suite(spark, sf_dir)
    fresh = run_suite(spark, sf_dir)

    tmp = tempfile.mkdtemp(prefix="attrs_probe_")
    attrs_path = f"{tmp}/attributes.parquet"
    t0 = time.perf_counter()
    doc_attributes(load_table(spark, sf_dir, "documents")).drop(
        "text"
    ).write.parquet(attrs_path)
    tagger_sec = round(time.perf_counter() - t0, 2)

    clusters_path = f"{tmp}/clusters.parquet"
    t0 = time.perf_counter()
    tq.q_dup_clusters(spark, sf_dir).write.parquet(clusters_path)
    dedup_sec = round(time.perf_counter() - t0, 2)

    spark.conf.set(tq.ATTRS_PATH_CONF, attrs_path)
    try:
        staged = run_suite(spark, sf_dir)
        spark.conf.set(tq.CLUSTERS_PATH_CONF, clusters_path)
        both = run_suite(spark, sf_dir)
    finally:
        spark.conf.unset(tq.ATTRS_PATH_CONF)
        try:
            spark.conf.unset(tq.CLUSTERS_PATH_CONF)
        except Exception:
            pass
        shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "tagger_pass_sec": tagger_sec,
                "dedup_pass_sec": dedup_sec,
                "fresh_sec": fresh,
                "attrs_sec": staged,
                "attrs_plus_clusters_sec": both,
                "fresh_total": round(sum(fresh.values()), 2),
                "attrs_total": round(sum(staged.values()), 2),
                "attrs_plus_clusters_total": round(sum(both.values()), 2),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
