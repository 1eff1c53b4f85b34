"""SparkSession factory with scale-oriented defaults.

Test/bench runs are local[N] single-JVM, but every config here is chosen to
also hold on a large cluster: AQE on (runtime shuffle-partition coalescing,
skew-join splitting), Arrow enabled for the few Pandas-UDF paths, shuffle
partition count sized by core count rather than the Spark default of 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_spark(
    app_name: str = "bustub-vectordb-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    cpus defaults to $SPARK_GRAFT_CPUS (driver contract) or all cores.
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cpus = int(env) if env else 0
    master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus if cpus else (os.cpu_count() or 8)

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of shuffle partitions + skew-join handling.
        # At 100 TB this is what keeps a fixed shuffle.partitions setting sane.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for the pandas-UDF paths (multimodal decode, HNSW batch probe).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Deterministic timestamps regardless of host TZ (oracle comparisons).
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # local-mode driver == executor JVM: long sessions accumulate cached
        # index blobs + localCheckpoint blocks across workloads, and an 8g
        # heap measurably GC-throttles the LAST workloads of a 16-key bench
        # (observed 2-3x on the iterative dedup key); 16g removes that
        # artifact on the 128 GiB box. Cluster deploys override per-node.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
