"""SparkSession factory with the engine's canonical configuration.

The reference pipeline hand-tunes memory ceilings, chunk sizes and worker
counts (conte-etl-step-2-processor.py:46-54,90-110); under Spark those
become session configs: AQE, shuffle partitioning, broadcast threshold.

Timezone: the reference parses naive timestamps then UTC-localizes
(conte-etl-step-2-processor.py:549-555,922-935).  We therefore pin
``spark.sql.session.timeZone=UTC`` so ``to_timestamp`` + casts never
double-shift (SURVEY §7.3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults chosen for scale: AQE on (runtime coalesce + skew-join), Arrow
#: for any pandas interchange, snappy parquet (reference
#: conte-etl-step-2-processor.py:1800), bounded per-file output rows
#: (reference manager CHUNK_SIZE=1M rows, conte-etl-step-2-manager.py:36).
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.maxRecordsPerFile": "1000000",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "conte-to-fresco-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the canonical SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster callers pass nothing and spark-submit supplies the master.
    """
    # Python workers inherit PYTHONPATH from the environment at JVM
    # launch, NOT the driver's sys.path — a consumer that imported this
    # package via a sys.path tweak (or from another cwd) would get
    # ModuleNotFoundError inside every mapInPandas/applyInPandas UDF.
    # Pin the package root into PYTHONPATH before the session exists.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_root not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + existing if existing else "")
        )
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
