"""SparkSession factory tuned for the engine.

Defaults match the sandbox (single JVM, ``local[N]``) but every setting is
chosen for a multi-executor cluster at 100 TB scale:

- AQE on (runtime coalesce + skew-join splitting),
- Arrow on (all heavy kernels are pandas UDFs),
- shuffle partitions sized to parallelism (overridable; at cluster scale
  AQE coalesces, so err high),
- dynamic partition overwrite (the MERGE INTO analog for the parquet
  tier-store backend; with Iceberg the store uses real MERGE INTO).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "diive_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    Args:
        parallelism: cores for ``local[N]``; default from
            ``$SPARK_GRAFT_CPUS`` or ``*``.
        shuffle_partitions: default = parallelism (AQE coalesces further).
        extra_conf: extra ``spark.conf`` entries.
    """
    # Make the package importable by executor Python workers regardless of
    # the caller's cwd — the local-mode analog of `spark-submit --py-files
    # diive_spark.zip` (the cluster launch path, see bench.py).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root

    cpus = parallelism or os.environ.get("SPARK_GRAFT_CPUS")
    master = f"local[{cpus}]" if cpus else "local[*]"
    n_shuffle = shuffle_partitions or (int(cpus) if cpus else 32)

    # Local-mode shuffle files on tmpfs: disk I/O otherwise serializes
    # shuffle-heavy stages and inverts scaling (measured: 1M-group
    # shuffle 23s on /tmp vs 4.6s on /dev/shm at 32 cores).  On a real
    # cluster this maps to fast local SSDs / external shuffle service.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if not local_dir and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def fs_exists(spark: SparkSession, path: str) -> bool:
    """True if *path* exists on the table's filesystem.

    Probes through Hadoop's FileSystem API so HDFS/S3 URIs resolve on a
    cluster — a driver-local ``os.path.exists`` is always False there
    and silently disables exists-gated logic.  Falls back to a
    schema-inference read probe if the JVM gateway shape ever changes.
    """
    try:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return bool(fs.exists(jpath))
    except Exception:
        try:
            spark.read.parquet(path).schema
            return True
        except Exception:
            return False
