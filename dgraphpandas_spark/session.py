"""SparkSession factory tuned for the KG-construction pipeline.

All settings are plain public Spark confs: AQE (with skew-join handling for
hot conversations), Arrow for the pandas-parity path, UTC session timezone
so timestamp lexical forms are stable across hosts.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = 'dgraphpandas-spark',
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Default thread count is capped at 16: this class of host penalizes
    # >16 threads in one JVM (~2× slower at local[32] than local[8] on
    # identical jobs — measured, BENCH/BASELINE.md).  Explicit
    # SPARK_GRAFT_CPUS / SPARK_GRAFT_MASTER / master= always win.
    default_cpus = min(os.cpu_count() or 16, 16)
    master = master or os.environ.get(
        'SPARK_GRAFT_MASTER', f"local[{os.environ.get('SPARK_GRAFT_CPUS', str(default_cpus))}]"
    )
    if shuffle_partitions is None:
        # local[N] → N; a real cluster would size this to 2-3× total cores.
        inner = master[master.find('[') + 1:master.find(']')] if '[' in master else '32'
        shuffle_partitions = os.cpu_count() or 32 if inner == '*' else int(inner)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config('spark.sql.session.timeZone', 'UTC')
        .config('spark.sql.shuffle.partitions', str(shuffle_partitions))
        .config('spark.sql.adaptive.enabled', 'true')
        .config('spark.sql.adaptive.coalescePartitions.enabled', 'true')
        .config('spark.sql.adaptive.skewJoin.enabled', 'true')
        .config('spark.sql.execution.arrow.pyspark.enabled', 'true')
        .config('spark.sql.execution.arrow.maxRecordsPerBatch', '65536')
        .config('spark.driver.memory', os.environ.get('SPARK_DRIVER_MEMORY', '8g'))
        .config('spark.ui.enabled', 'false')
        .config('spark.sql.parquet.compression.codec', 'zstd')
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
