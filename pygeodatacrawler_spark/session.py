"""SparkSession factory tuned for the crawl workload.

The same builder is used by tests (local[*]), bench.py (local[N] at two
parallelism levels for the scaling-efficiency protocol) and, unchanged,
by ``spark-submit --py-files`` on a real cluster — only ``master`` and
the shuffle-partition count move.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pygeodatacrawler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build a SparkSession with AQE, Arrow, and skew handling enabled.

    ``shuffle_partitions`` defaults to 2x the core count of the master —
    small enough to avoid tiny-task overhead at sandbox scale, and AQE
    coalesces further at runtime; on a real cluster it should be sized to
    executors*cores*2-3 (AQE's ``coalescePartitions`` makes over-provision
    cheap, under-provision is what hurts).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] / local[*]
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "4"
        cores = os.cpu_count() if n == "*" else int(n)
        shuffle_partitions = max(8, 2 * (cores or 4))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 16m, not the 64m default: AQE sizes post-shuffle reducer
        # counts from this, and our shuffles move many small rows with
        # compute attached (url canonicalize/dedup) — 64m coalesced a
        # ~550MB link-expand shuffle to ~9 reducers, idling most of a
        # 32-core stage. Data-derived (identical at every cluster
        # size), so the two-size scaling protocol stays fair.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # G1 sizes heap regions from total heap (8 MB regions at a
        # 16-32 GB heap); Arrow record batches and large shuffle/
        # broadcast byte[]s then allocate as HUMONGOUS objects, whose
        # churn forces frequent concurrent cycles and fragmentation —
        # measured on the doc-heavy queries as a 2-3x wall-time
        # inflation late in a long session (ngram_jaccard 15.4 s vs
        # 7.5 s A/B at sf1.0 with everything else identical). 32 MB
        # regions make those allocations regular. Heap-proportional,
        # not cluster-size-specific; executors get the same treatment
        # for real deployments (local mode has only the driver JVM).
        # Overridable via $SPARK_GRAFT_CONF / extra_conf (later
        # .config() calls win).
        .config("spark.driver.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
        .config("spark.executor.extraJavaOptions", "-XX:G1HeapRegionSize=32m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # web-page rows carry ~10-100KB html binaries; the default
        # 4096-row columnar batch means 100MB+ on-heap buffers per scan
        # task, which at high task concurrency turns into G1 full-GC
        # stalls (measured: 4x slowdown at 32 cores). 512 keeps batches
        # ~10-20MB while staying vectorized for narrow-row tables.
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        # contact maps are built with map_from_entries over API-response
        # arrays; duplicate keys resolve like Python dict assignment in
        # the reference (last writer wins, utils.py:475-487)
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
    )
    # deployment-specific overrides without touching callers (bench.py
    # is frozen): $SPARK_GRAFT_CONF holds ;-separated key=value pairs,
    # e.g. event-log capture for profiling, or cluster-sized shuffle
    # partitions / memory on a real deployment. Applied before
    # extra_conf so explicit caller settings still win.
    env_conf = os.environ.get("SPARK_GRAFT_CONF", "")
    for pair in filter(None, env_conf.split(";")):
        k, _, v = pair.partition("=")
        if k and v:
            builder = builder.config(k.strip(), v.strip())
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the --py-files step, automated).

    Pandas UDFs pickle module-level functions by reference; executor
    Python workers must be able to import the package. spark-submit
    users pass --py-files; for everyone else (notebooks, pytest from
    another cwd) we zip the package once and addPyFile it.
    """
    import shutil
    import tempfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    base = os.path.join(
        tempfile.gettempdir(), f"pygeodatacrawler_spark_ship_{os.getpid()}"
    )
    zip_path = base + ".zip"
    if not os.path.exists(zip_path):
        staging = base + "_stage"
        target = os.path.join(staging, "pygeodatacrawler_spark")
        shutil.rmtree(staging, ignore_errors=True)
        shutil.copytree(pkg_dir, target, ignore=shutil.ignore_patterns("__pycache__"))
        shutil.make_archive(base, "zip", staging)
        shutil.rmtree(staging, ignore_errors=True)
    spark.sparkContext.addPyFile(zip_path)
