"""SparkSession builder with scale-aware defaults.

Local testing runs on local[N]; the same knobs are what you would set
on a real 1000-executor cluster (AQE on, shuffle partitions sized to
the stage, Arrow batches bounded so a mega-page document cannot blow an
executor's Python worker memory).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mimeograph_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 4096,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing + skew-join splitting for free.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transfer for pandas UDFs; bound batch size so one batch
        # of mega-page docs stays within Python-worker memory.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records)
        )
        # Session TZ pinned to UTC so results compare bit-exactly with
        # the DuckDB oracle (duckdb timestamps are UTC-naive).
        .config("spark.sql.session.timeZone", "UTC")
        # Single-JVM local mode: the driver heap IS the executor heap.
        # An undersized heap makes 32 concurrent tasks GC-thrash (4x
        # slowdown measured on JVM-only stages); G1 + a large heap
        # restores linear scaling.  On a real cluster this maps to
        # spark.executor.memory per executor instead.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "24g"))
        .config("spark.driver.extraJavaOptions", os.environ.get("SPARK_JVM_OPTS", "-XX:+UseG1GC -XX:ReservedCodeCacheSize=1g -Xms24g -XX:+AlwaysPreTouch"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
