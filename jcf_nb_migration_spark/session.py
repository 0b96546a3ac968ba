"""SparkSession factory with scale-oriented defaults.

Local testing runs on ``local[N]``; the same configs are what we would
ship to a 1000-executor cluster (AQE, skew-join handling, broadcast
thresholds). Nothing here is local-mode specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults tuned for the test harness (local[32], 128 GiB). On a real
# cluster the master/memory come from spark-submit; the SQL configs below
# are the ones that matter at 100 TB:
#  - AQE coalesces post-shuffle partitions and splits skewed ones at
#    runtime, so a fixed shuffle.partitions never has to be "right".
#  - autoBroadcastJoinThreshold keeps dimension joins (region/nation/
#    supplier/lookup tables) as BroadcastHashJoin — no shuffle of the
#    fact table.
#  - maxPartitionBytes bounds scan-task input so 100 TB splits into
#    ~800k tasks instead of a few giant ones.
_SQL_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # Keep AQE from squashing small-but-CPU-dense shuffles (shingle
    # hashing, vector folds) onto one core: floor at 256 KiB instead of
    # 1 MiB. At scale partitions are orders of magnitude above either
    # floor, so this only affects small inputs.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "262144",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime Bloom-filter pruning: on a selective join (filtered
    # orders ⋈ lineitem) the build side's keys seed a Bloom filter
    # pushed into the probe side's scan — at 100 TB this skips whole
    # row groups of the fact table. No-op on broadcasts/small inputs.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Initial reduce-partition count. 32 is the LOCAL default (matches
    # the harness's local[32]; AQE coalescing makes the exact value
    # uncritical on small inputs). It is env-parameterised, not a
    # constant the plans depend on: at cluster scale set it (or
    # spark.sql.adaptive.coalescePartitions.initialPartitionNum) so
    # post-shuffle partitions land in the 100 MB-1 GB range the guide
    # prescribes — e.g. ~1e5 initial partitions for a 100 TB shuffle —
    # and let AQE coalesce down. Results are partition-count
    # independent (oracle-checked); only task granularity changes.
    "spark.sql.shuffle.partitions":
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
    "spark.sql.session.timeZone": "UTC",
    # The synthetic events table stores TIMESTAMP(NANOS) which the
    # vectorized reader rejects; read as long and convert (registry.t).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def get_spark(app_name: str = "jcf-nb-migration-spark",
              master: str | None = None,
              extra_conf: dict[str, str] | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*]) when
    no cluster master is configured — on a real deployment spark-submit's
    ``--master`` wins because an active session is reused as-is.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    if master is None or master.startswith("local"):
        # local mode runs driver + all executor threads in ONE JVM whose
        # heap defaults to 1g — 32 concurrent hash-agg tasks OOM that
        # long before the 128 GiB host is stressed (seen on the derived
        # ~sf0.3 sweep). On a cluster spark-submit sets this; here it
        # only takes effect when this call actually launches the JVM.
        builder = builder.config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    for k, v in _SQL_CONFS.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
