"""SparkSession factory tuned for this engine (local-mode test harness;
the same conf block is what a spark-submit --py-files cluster launch uses,
minus master/driver-memory)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app: str = "kneaddata_spark", master: str | None = None, cores: int | None = None) -> SparkSession:
    # one python worker per core is the parallelism unit; BLAS/OpenMP fan-out
    # inside numpy would oversubscribe and wreck N->4N scaling
    for v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
        os.environ.setdefault(v, "1")
    if master is None:
        cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        master = f"local[{cores}]"
    else:
        cores = cores or 32
    shuffle_parts = max(8, cores)
    b = (
        SparkSession.builder.master(master)
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config(
            # vectorized parquet batches are sized in ROWS (default 4096);
            # audio rows carry ~100 KB binary payloads, so a 4096-row
            # column vector asks for ~100+ MB of contiguous heap PER TASK
            # and 32 concurrent scan tasks OOM any reasonable driver heap
            # (observed reading the 40k-clip table after a 90-query
            # session). 1024 rows keeps fat-binary scans at ~tens of MB
            # per task; measured neutral for thin relational scans (512
            # cost dup_clusters ~15%).
            "spark.sql.parquet.columnarReaderBatchSize",
            os.environ.get("SPARK_GRAFT_COLUMNAR_BATCH", "1024"),
        )
        .config(
            # small corpora must still split into >= cores tasks; at real
            # scale the default 128m is right (overridable via env)
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "32m"),
        )
        .config("spark.ui.enabled", "false")
        .config(
            # r6 sweep-churn fix (guide §5): a 150+-query sweep in ONE
            # session accumulates unreferenced localCheckpoint blocks
            # (dup_clusters rounds), broadcast relations and shuffle
            # files until a driver GC lets ContextCleaner reap them —
            # the default 30min periodic GC means they pile up for the
            # whole sweep, inflating storage/execution memory pressure
            # for every later query. 2min bounds the backlog at any
            # scale (long-running production drivers want this too).
            "spark.cleaner.periodicGC.interval",
            os.environ.get("SPARK_GRAFT_PERIODIC_GC", "2min"),
        )
        # r6: bound the in-memory status store (kept even with the UI
        # off). Defaults retain 1000 SQL executions with full plan-graph
        # strings + 100k task rows; this repo's generated plans are huge
        # (64-aggregate SimHash, unrolled PageRank), so a long sweep
        # holds hundreds of MB of dead metadata in old-gen. Caps are
        # scale-independent driver hygiene.
        .config("spark.sql.ui.retainedExecutions", "50")
        .config("spark.ui.retainedJobs", "200")
        .config("spark.ui.retainedStages", "400")
        .config("spark.ui.retainedTasks", "20000")
        .config("spark.ui.retainedDeadExecutors", "10")
    )
    # r6 (guide §2.1): shuffle files / spills / broadcast temp default to
    # /tmp, which on this box is the one spinning-rust-class root volume
    # (70% full) — while a 126 GB tmpfs sits idle. Prefer shm when it
    # exists; a cluster deployment overrides with its fast local disks
    # (SPARK_GRAFT_LOCAL_DIR), the standard spark.local.dir practice.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/kneaddata_spark_local"
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
