"""Job entry point — the runnable equivalent of the reference's Glue job.

The reference job is launched with resolved args (``getResolvedOptions``,
``Glue_tranformation_json_parquet.py:10-13``: raw/curated S3 paths wired
via job parameters). Same contract here, argparse-flavored:

    python -m healthcare_aws_data_engineering_spark \
        --raw /data/raw_fhir --curated /data/curated \
        [--incremental --checkpoint /data/ckpt] \
        [--partition-observation-by obs_date] \
        [--deterministic-dedup]

Batch mode runs the full raw→curated ETL once; ``--incremental`` runs one
bookmarked (availableNow + checkpoint) pass that only processes files the
checkpoint hasn't seen — the Glue job-bookmark behavior.
"""

from __future__ import annotations

import argparse

from .plans.etl import fhir_etl
from .session import get_spark
from .streaming.incremental import incremental_fhir_ingest


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="healthcare_aws_data_engineering_spark")
    p.add_argument("--raw", required=True, help="raw FHIR JSON zone (dir/prefix)")
    p.add_argument("--curated", required=True, help="curated parquet zone")
    p.add_argument(
        "--incremental",
        action="store_true",
        help="bookmarked run: process only files the checkpoint hasn't seen",
    )
    p.add_argument("--checkpoint", help="checkpoint dir (required with --incremental)")
    p.add_argument(
        "--partition-observation-by",
        nargs="*",
        default=None,
        help="partition columns for the observation table",
    )
    p.add_argument("--deterministic-dedup", action="store_true")
    p.add_argument("--no-multiline", action="store_true", help="one JSON doc per line")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.incremental and not args.checkpoint:
        raise SystemExit("--incremental requires --checkpoint")
    spark = get_spark("healthcare-etl")
    multiline = not args.no_multiline
    if args.incremental:
        incremental_fhir_ingest(
            spark,
            args.raw,
            args.curated,
            args.checkpoint,
            multiline=multiline,
            deterministic_dedup=args.deterministic_dedup,
        )
    else:
        paths = fhir_etl(
            spark,
            args.raw,
            args.curated,
            observation_partitions=args.partition_observation_by,
            multiline=multiline,
            deterministic_dedup=args.deterministic_dedup,
        )
        for name, path in paths.items():
            print(f"{name}: {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
