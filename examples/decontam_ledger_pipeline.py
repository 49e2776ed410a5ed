"""Cross-snapshot decontamination with the shingle ledger — the "a new
benchmark arrived months after ingest" story end-to-end. Every step is
an independently tested library operator (operators/decontam.py,
streaming/decontam.py).

The problem shape: eval-set decontamination compares corpus shingles to
benchmark shingles, but the corpus was ingested long ago and re-reading
100 TB of text per new benchmark is the most expensive pass a warehouse
can pay. The ledger moves that pass to INGEST TIME: each snapshot
appends one fixed-width (doc_id, xxhash64-shingle) row per distinct
per-doc shingle — and any future benchmark is screened by one scan of
those slim rows.

What the script does:

1. Two document snapshots land as parquet; two bookmarked
   ``shingle_ledger_ingest`` runs drain them (availableNow checkpoint —
   the Glue-bookmark discipline), accruing the ledger incrementally.
2. A NEW benchmark arrives. ``ledger_decontaminate`` screens the whole
   ingested corpus against it: broadcast eval-hash join over the
   ledger, ONE doc_id aggregation, zero text re-reads. With
   ``prune_fpp`` the eval hashes also fold into a bloom binary literal
   probed in-row before the join.
3. The same verdicts are recomputed by the batch text-side twin
   (``decontaminate_external``) to show they match — the re-scan the
   ledger just avoided.

Run from the repo root:

    python examples/decontam_ledger_pipeline.py [work_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from healthcare_aws_data_engineering_spark.operators import decontam as D
from healthcare_aws_data_engineering_spark.session import get_spark
from healthcare_aws_data_engineering_spark.streaming.decontam import (
    shingle_ledger_ingest,
)

SNAP1 = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "pack my box with five dozen liquor jugs right now"),
    (3, "how vexingly quick daft zebras jump around the park"),
]
SNAP2 = [
    (4, "sphinx of black quartz judge my vow said the king"),
    (5, "the quick brown fox jumps over the lazy dog tonight"),
    (6, "bright vixens jump dozy fowl quack and run away fast"),
]
BENCHMARK = [
    (101, "the quick brown fox jumps over the lazy dog tonight"),
    (102, "sphinx of black quartz judge my vow said the queen"),
]


def main() -> int:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    raw, ledger, cp = (os.path.join(work, d) for d in ("raw", "ledger", "cp"))
    spark = get_spark("ledger-example")
    spark.sparkContext.setLogLevel("ERROR")

    def docs(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    # 1. two snapshots land; two bookmarked runs accrue the ledger
    docs(SNAP1).coalesce(1).write.mode("append").parquet(raw)
    shingle_ledger_ingest(spark, raw, ledger, cp)
    docs(SNAP2).coalesce(1).write.mode("append").parquet(raw)
    shingle_ledger_ingest(spark, raw, ledger, cp)
    accrued = spark.read.parquet(ledger)
    print(f"ledger rows accrued at ingest: {accrued.count()}")

    # 2. a NEW benchmark arrives: screen with zero text re-reads
    verdicts = D.ledger_decontaminate(
        accrued, docs(BENCHMARK), prune_fpp=0.01
    )
    got = {
        r.doc_id: (r.overlap_ratio, r.contaminated)
        for r in verdicts.collect()
    }
    for did in sorted(got):
        ratio, flag = got[did]
        print(f"doc {did}: overlap={ratio:.3f} contaminated={flag}")

    # 3. the batch text-side twin agrees (the pass the ledger avoided)
    want = {
        r.doc_id: (r.overlap_ratio, r.contaminated)
        for r in D.decontaminate_external(
            docs(SNAP1 + SNAP2), docs(BENCHMARK)
        ).collect()
    }
    assert got == want, "ledger and batch twin disagree"
    print("ledger verdicts == batch text-side twin: OK")
    if len(sys.argv) <= 1:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
