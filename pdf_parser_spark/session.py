"""SparkSession builder tuned for binary-heavy extraction workloads."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "fan_out", "DEFAULT_SHUFFLE_PARTITIONS"]


def _parse_bytes(v: str) -> int:
    # Spark accepts both '16m' and '16mb' forms: strip an optional trailing
    # 'b' FIRST, else '128mb' falls into the plain-'b' branch and raises on
    # int('128m') (masked by fan_out's except into the plan-materializing
    # RDD probe that this estimate exists to avoid)
    v = str(v).strip().lower()
    if v.endswith("b") and len(v) > 1 and not v[-2].isdigit():
        v = v[:-1]
    for suffix, mult in (("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if v.endswith(suffix):
            return int(float(v[: -len(suffix)])) * mult
    return int(float(v))


def fan_out(df):
    """Repartition a DataFrame only if its scan under-splits the cluster.

    A small dimension table (one parquet file under maxPartitionBytes) scans
    as a SINGLE partition, serializing every CPU-heavy downstream operator
    (measured: MinHash+LSH over a 584 KB / 5k-row table ran 3.5x slower
    single-partition than repartitioned). The shuffle costs O(table bytes) —
    trivial for exactly the tables that trigger the condition — while a
    large table already has >= defaultParallelism splits and passes through
    untouched, so this never shuffles big data.

    The under-split probe estimates scan splits from file-listing metadata
    (inputFiles + maxPartitionBytes), NOT df.rdd.getNumPartitions(): the
    RDD conversion forces plan materialization per call, which must never
    creep onto a petabyte scan. Non-file-backed plans fall back to the RDD
    probe (they are already materialized logical plans).
    """
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
        # the getsize estimate only makes sense for local paths; remote
        # schemes (hdfs:/s3a:/...) would FileNotFoundError into the broad
        # except and silently pay the RDD probe — bail out explicitly and
        # let a big remote scan pass through (it has >= parallelism splits)
        if files and any("://" in f and not f.startswith("file:") for f in files):
            return df
        maxpb = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
        est = sum(
            max(1, -(-os.path.getsize(f[len("file:"):] if f.startswith("file:") else f)
                     // maxpb))
            for f in files
        ) if files else 0
    except Exception:
        est = df.rdd.getNumPartitions()
    if est < target:
        return df.repartition(target)
    return df

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "pdf_parser_spark",
    shuffle_partitions: int = DEFAULT_SHUFFLE_PARTITIONS,
) -> SparkSession:
    """Create (or reuse) a session with Arrow enabled and batches capped.

    Rows carry multi-MB binary payloads, so Arrow batches are capped at a
    small record count to bound Python-worker memory (a 2 MB mega-doc times
    the default 10k-records batch would be 20 GB); at cluster scale the same
    settings hold per executor.
    """
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "64")
        # scan splits are the load-balancing unit of the shuffle-free kernel
        # plan: ~16 MB ≈ 1-3 s of kernel work per task on this box. Smaller
        # splits = better balance at high core counts; tune per cluster.
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
        # measured on this box: heaps >= 4g give erratic 3-10x slower warm runs
        # (GC pathology in single-JVM local mode); 2g is stable and ample for
        # count/write actions. Real clusters size executor memory at submit.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "2g"))
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        builder = builder.master(f"local[{cpus}]")
    return builder.getOrCreate()
