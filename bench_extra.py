#!/usr/bin/env python
"""Extra benchmarks for the optimization rounds (guide §1.1/§1.4).

`bench.py` is FROZEN for driver measurement; this file holds the
working instruments: per-query noop-sink isolation with the same
best-of-N discipline, plus `.explain("formatted")` capture for the
plan evidence committed under `plans/r07/`.

Usage:
  python bench_extra.py q1 q2 ...            # time queries, print JSON
  python bench_extra.py --plans DIR --suffix before q1 q2 ...
      additionally write DIR/<query>_<suffix>.txt with the formatted
      physical plan of each query (captured on a fresh construction
      after the timed runs, so eager operators' plans reflect the
      steady state).
  python bench_extra.py --runs 3 ...         # override best-of-2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def formatted_plan(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    args = ap.parse_args()

    from mimeograph_spark.session import get_spark

    import __spark_entry__ as entry

    spark = get_spark(
        app_name="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
    )
    qs = entry.queries()
    out: dict[str, float] = {}
    for name in args.names:
        fn = qs[name]
        best = None
        df = None
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"{name} run{i}")
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - start
            best = elapsed if best is None else min(best, elapsed)
        spark.sparkContext.setJobDescription(None)
        out[name] = round(best, 3)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(formatted_plan(df))
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
