"""Growth probe for the materialized-staging seam (r7 verdict optional
#8): does the fresh-vs-staged ratio GROW with corpus size?

The r7 claim — "at 100 TB the ratio moves further toward the
materialized path" — was argued from bytes (the attribute table is ~1%
of corpus bytes, the cluster table pair-sized) but measured only at
sf0.1. This probe replicates the sf0.1 documents ×M with disjoint id
spaces (scale_probe protocol), writes each grown corpus as an sf-shaped
dir, and times the six curation composites fresh vs with BOTH staging
tables (``spark.graft.attributesPath`` + ``spark.graft.clustersPath``),
plus the one-off materialization passes themselves.

Caveat (same as span_growth_probe): replicas DUPLICATE text, so the
near-dup cluster table densifies with M (every doc gains M-1 exact
replicas) — the dedup-pass and cluster-read costs are upper bounds, not
typical-case. The attribute-table leg is shape-faithful at every M.

Run: python tools/staging_growth_probe.py [multipliers ...]  # default 1 2 4
Results recorded in SCALING.md.
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

sys.path.insert(0, "tools")
from scale_probe import replicate  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"

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
    fn().count()
    return round(time.perf_counter() - t0, 2)


def run_suite(spark, sf_dir):
    out = {}
    for name, q in COMPOSITES.items():
        spark.catalog.clearCache()
        out[name] = timed(lambda: q(spark, sf_dir))
    return out


def main() -> int:
    ms = [int(x) for x in sys.argv[1:]] or [1, 2, 4]
    spark = get_spark("staging-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs0 = load_table(spark, SF_DIR, "documents")
    run_suite(spark, SF_DIR)  # JVM/codegen warm-up outside timed region

    rows = []
    for m in ms:
        tmp = tempfile.mkdtemp(prefix=f"staging_probe_x{m}_")
        sf_dir = f"{tmp}/corpus"
        replicate(docs0, "doc_id", m).write.parquet(
            f"{sf_dir}/documents.parquet"
        )
        try:
            fresh = run_suite(spark, sf_dir)

            t0 = time.perf_counter()
            attrs_path = f"{tmp}/attributes.parquet"
            doc_attributes(load_table(spark, sf_dir, "documents")).drop(
                "text"
            ).write.parquet(attrs_path)
            tagger_sec = round(time.perf_counter() - t0, 2)

            t0 = time.perf_counter()
            clusters_path = f"{tmp}/clusters.parquet"
            tq.q_dup_clusters(spark, sf_dir).write.parquet(clusters_path)
            dedup_sec = round(time.perf_counter() - t0, 2)

            spark.conf.set(tq.ATTRS_PATH_CONF, attrs_path)
            spark.conf.set(tq.CLUSTERS_PATH_CONF, clusters_path)
            try:
                staged = run_suite(spark, sf_dir)
            finally:
                spark.conf.unset(tq.ATTRS_PATH_CONF)
                spark.conf.unset(tq.CLUSTERS_PATH_CONF)

            row = {
                "m": m,
                "fresh_total": round(sum(fresh.values()), 2),
                "staged_total": round(sum(staged.values()), 2),
                "ratio": round(sum(fresh.values()) / sum(staged.values()), 2),
                "tagger_pass_sec": tagger_sec,
                "dedup_pass_sec": dedup_sec,
                "fresh": fresh,
                "staged": staged,
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    print(
        json.dumps(
            {"ratios": {r["m"]: r["ratio"] for r in rows}}
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
