"""SparkSession factory with scale-oriented defaults.

The reference delegates physical execution to Postgres; here Catalyst
owns it, so the session is where the engine pins the optimizer
posture: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), dynamic partition overwrite (the M6/M7 delete+insert
strategies become metadata-only partition swaps), and Arrow transfer
for the few Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for large-cluster behavior; local test harnesses
#: override shuffle partitions down to the core count.
ENGINE_CONF: dict[str, str] = {
    # Runtime re-planning: partition coalescing, skew-join splitting,
    # join-strategy switching once real sizes are known.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # M6/M7 (DELETE day + INSERT day) become partition swaps instead of
    # full-table rewrites.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Arrow batches for the Pandas-UDF paths (multimodal decode, xlsx).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic wall-clock semantics for timestamps regardless of
    # host timezone (matches the DuckDB/naive-timestamp oracle).
    "spark.sql.session.timeZone": "UTC",
    # Parquet scans: keep split sizes bounded so a 100 TB table yields
    # sane task counts without tiny-file storms.
    "spark.sql.files.maxPartitionBytes": "256m",
    "spark.sql.parquet.filterPushdown": "true",
    # Broadcast small dims (J1-style fact⋈dim); AQE upgrades at runtime.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Parquet TIMESTAMP(NANOS) (e.g. pandas/pyarrow ns timestamps) is
    # illegal for Spark's µs TimestampType; read as long and convert
    # explicitly (sources.readers.normalize_ns_timestamps).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(
    app_name: str = "ods-v3-dbt-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` when unset so
    the same entry points run on a real cluster (where ``master`` comes
    from spark-submit) and in the local harness.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master:
        builder = builder.master(master)
    conf = dict(ENGINE_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_runtime_conf(spark: SparkSession) -> SparkSession:
    """Apply the runtime-settable engine conf to an existing session.

    The driver harness passes us a session it built; timezone and AQE
    flags are runtime-mutable, so pin the ones correctness depends on.
    """
    for k in (
        "spark.sql.session.timeZone",
        "spark.sql.adaptive.enabled",
        "spark.sql.sources.partitionOverwriteMode",
        "spark.sql.legacy.parquet.nanosAsLong",
    ):
        try:
            spark.conf.set(k, ENGINE_CONF[k])
        except Exception:
            pass  # immutable in this deployment; defaults are sane
    return spark
