"""SparkSession bootstrap tuned for the local[32] test rig while staying
cluster-correct: everything here is either runtime-settable or a sensible
default on a 1000-executor cluster too (AQE, skew-join handling, UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs we require for deterministic, oracle-comparable
# results. Applied defensively by query entry points because the driver may
# hand us a session we didn't build.
_RUNTIME_CONF = {
    # DuckDB timestamps are UTC-naive; pin Spark to UTC so collected values
    # and date arithmetic agree (pyspark_guide: "Pitfalls").
    "spark.sql.session.timeZone": "UTC",
    # Arrow for any pandas-UDF path (vectorized transfer).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # AQE: runtime coalesce + skew-join splitting. At 100 TB skewed keys are
    # the norm, not the exception.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Spark 4 rejects INT64 TIMESTAMP(NANOS) parquet columns outright; read
    # them as epoch-nano longs and convert in the loader (datasets.table).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet columns otherwise
    # infer as TIMESTAMP_NTZ, which unix_micros()/window() reject. With the
    # session pinned to UTC, reading them as plain TIMESTAMP gives the same
    # wall-clock values DuckDB sees, and scan-level predicate pushdown on
    # the column keeps working (no cast wrapper needed in the loader).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs can be locked down; never fail a query over tuning.
            pass
    return spark


def get_spark(
    app_name: str = "gearpump_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (driver contract) or all cores.
    Shuffle partitions default to the core count — 200 is wrong for a
    single host (over-parallelized) and is re-planned by AQE anyway.
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or (32 if cpus == "*" else int(cpus))),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # No console progress bar: its \r-frames pollute redirected stdout
        # (docs/SCALING.md grew a binary header from exactly this).
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_runtime_conf(spark)
