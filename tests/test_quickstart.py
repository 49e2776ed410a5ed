"""Quickstart parquet-path mode (r4 verdict ask #7): the library must
run against ANY directory of observation-shaped parquet (4-column
contract), not just the driver's testdata layout."""

from __future__ import annotations

import datetime
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))

from healthcare_aws_data_engineering_spark.plans.reports import CVD_KEYS
from healthcare_aws_data_engineering_spark.sources.tables import (
    load_observations,
)


def _toy_obs_dir(spark, tmp_path, with_optional: bool) -> str:
    rows = []
    ts = datetime.datetime(2025, 1, 1)
    for pid in (1, 2):
        for i, (name, key) in enumerate(CVD_KEYS.items()):
            rows.append(
                (pid, key, str(40.0 + 10 * pid + i), ts + datetime.timedelta(days=i))
            )
    # a later hdl measurement that must win latest-per-key
    rows.append((1, CVD_KEYS["hdl"], "65.0", ts + datetime.timedelta(days=99)))
    df = spark.createDataFrame(
        rows,
        "patient_id long, code_display string, value_quantity string, "
        "effective_datetime timestamp",
    )
    if with_optional:
        from pyspark.sql import functions as F

        df = df.withColumn("observation_id", F.monotonically_increasing_id())
    out = str(tmp_path / "obs")
    df.coalesce(1).write.parquet(out)
    return out


def test_quickstart_runs_on_user_parquet(spark, tmp_path):
    from quickstart import run_observation_demo

    path = _toy_obs_dir(spark, tmp_path, with_optional=False)
    report = run_observation_demo(spark, path, show=False)
    rows = {r["patient"]: r for r in report.collect()}
    assert set(rows) == {1, 2}
    # the day-99 hdl measurement wins latest-per-key
    assert rows[1]["hdl"] == 65.0
    assert rows[1]["hdl_status"] == "Protective"
    assert rows[2]["hdl_status"] in {"Low", "Normal", "Protective", "n/a"}


def test_load_observations_contract_error(spark, tmp_path):
    bad = spark.createDataFrame([(1, "x")], "patient_id long, code string")
    out = str(tmp_path / "bad")
    bad.write.parquet(out)
    with pytest.raises(ValueError, match="code_display"):
        load_observations(spark, out)


def test_load_observations_synthesizes_stable_ids(spark, tmp_path):
    path = _toy_obs_dir(spark, tmp_path, with_optional=False)
    a = sorted(r["observation_id"] for r in load_observations(spark, path).collect())
    b = sorted(r["observation_id"] for r in load_observations(spark, path).collect())
    assert a == b  # deterministic across reads
    assert len(set(a)) == len(a)  # unique per row
    obs = load_observations(spark, path)
    assert "value_string" in obs.columns


def test_load_observations_duplicate_rows_get_distinct_ids(spark, tmp_path):
    """r5 advisor pin: genuinely duplicate measurement rows (same
    patient, analyte, value, timestamp — routine in real exports) must
    get DISTINCT synthesized ids, deterministically across reads, or
    downstream latest-per-key/dedup keyed on observation_id silently
    collapses them."""
    ts = datetime.datetime(2025, 3, 1)
    rows = [(1, "hdl", "55.0", ts)] * 3 + [(2, "hdl", "41.0", ts)]
    df = spark.createDataFrame(
        rows,
        "patient_id long, code_display string, value_quantity string, "
        "effective_datetime timestamp",
    )
    out = str(tmp_path / "dup_obs")
    df.write.parquet(out)
    a = sorted(r["observation_id"] for r in load_observations(spark, out).collect())
    assert len(set(a)) == 4  # all four rows distinct, dup triple included
    b = sorted(r["observation_id"] for r in load_observations(spark, out).collect())
    assert a == b  # reproducible across runs


def test_load_observations_respects_existing_id(spark, tmp_path):
    path = _toy_obs_dir(spark, tmp_path, with_optional=True)
    obs = load_observations(spark, path)
    ids = [r["observation_id"] for r in obs.collect()]
    assert len(set(ids)) == len(ids)


def test_curation_pipeline_example(spark):
    """examples/curation_pipeline.py composes the r6 curation operators
    end-to-end; the manifest must be a consistent selection (unique
    docs, dense shard positions, monotone stage shrinkage)."""
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).parent.parent / "examples" / "curation_pipeline.py"
    spec = importlib.util.spec_from_file_location("curation_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    manifest, stats = mod.curate(spark, "/root/testdata/sf0.001")
    rows = manifest.collect()
    assert stats["corpus_docs"] >= stats["after_domain_cap"] >= stats["after_token_budget"]
    # r8: the mixture draw upsamples (doc, epoch) copies around the
    # epoch budget (hash-threshold partial epochs are binomial, so the
    # draw sits NEAR after_token_budget, not exactly on it)
    assert len(rows) == stats["mixture_rows"] > 0
    budget = stats["after_token_budget"]
    assert abs(len(rows) - budget) <= max(10, budget // 5)
    assert len({(r.doc_id, r.epoch) for r in rows}) == len(rows)
    by_shard = {}
    for r in rows:
        assert 0.0 < r.weight <= 1.0 and r.epoch >= 0
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard


def test_ann_serving_pipeline_example(spark):
    """examples/ann_serving_pipeline.py composes the full ANN family
    over one corpus. Structural pins: every path returns at most K rows
    per query with valid ids; exact-RERANK paths (lsh, ivf) keep real
    recall on the isotropic testdata while code-PRICED paths are
    structurally valid but recall-weak there by design (distance
    concentration — see the example's docstring)."""
    import importlib.util
    import pathlib

    path = (
        pathlib.Path(__file__).parent.parent
        / "examples"
        / "ann_serving_pipeline.py"
    )
    spec = importlib.util.spec_from_file_location("ann_serving_pipeline", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    results, stats = mod.search(spark, "/root/testdata/sf0.001")
    assert stats["corpus_vectors"] > 0
    for name, got in results.items():
        per_q = {}
        for qid, nid in got:
            assert 0 <= qid < mod.N_QUERIES and nid != qid
            per_q[qid] = per_q.get(qid, 0) + 1
        assert max(per_q.values()) <= mod.K, name
    assert len(results["exact"]) == mod.N_QUERIES * mod.K
    rec = stats["recall"]
    assert rec["lsh_multiprobe"] >= 0.6
    assert rec["ivf_flat"] >= 0.3
    for name, r in rec.items():
        assert 0.0 <= r <= 1.0, (name, r)
