#!/usr/bin/env python
"""spark-submit entry point for the extraction pipeline (north_rule:
"run via spark-submit --py-files on a multi-executor cluster").

Usage:
    scripts/package.sh
    spark-submit --py-files dist/mimeograph_spark.zip \\
        scripts/submit_extract.py \\
        --input  /path/to/documents_parquet \\
        --results /path/to/results_table \\
        --lineage /path/to/lineage_table \\
        --run-id  run-2026-08-16 \\
        [--derive-from-flat] [--page-threshold 512]

Reads the documents table (nested span schema, or the flat testdata
shape with --derive-from-flat), runs the resumable extraction, commits
results + per-partition lineage to snapshot checkpoint tables, prints
a one-line JSON summary.  Re-running after a crash processes only the
documents without committed results (left-anti join on the manifest).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--results", required=True)
    p.add_argument("--lineage", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--derive-from-flat", action="store_true")
    p.add_argument("--page-threshold", type=int, default=512)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # spark-submit supplies master/deploy config; only app-level
    # settings are set here so the same script runs on any cluster.
    spark = (
        SparkSession.builder.appName(f"mimeograph-extract-{args.run_id}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    from mimeograph_spark.corpus import derive_documents
    from mimeograph_spark.plans.pipeline import extract
    from mimeograph_spark.sources.checkpoint import CheckpointTable
    from mimeograph_spark.sources.lineage import run_resumable_with_lineage

    docs = spark.read.parquet(args.input)
    if args.derive_from_flat:
        docs = derive_documents(docs)

    results = CheckpointTable(args.results)
    lineage = CheckpointTable(args.lineage)
    snap = run_resumable_with_lineage(
        docs,
        results,
        lineage,
        lambda df: extract(df, page_threshold=args.page_threshold),
        run_id=args.run_id,
    )
    done = results.read(spark)
    summary = {
        "run_id": args.run_id,
        "new_snapshot": snap["id"] if snap else None,
        "docs_total": done.count() if done is not None else 0,
        "snapshots": len(results.snapshots()),
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
