"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we'd set cluster-side: AQE on (runtime
re-planning + skew-join splitting), Arrow transfer for the pandas-UDF geometry
kernels, shuffle partitions sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "geopull_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else "8"
        shuffle_partitions = cpus if n == "*" else int(n)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # AQE coalescing targets max(minPartitionSize, bytes/parallelism);
        # with the default 1MB floor our geometry group-kernels (tiny bytes,
        # huge CPU) collapse onto ~1 task (measured 10.5× slowdown on the
        # blocker stage). minPartitionSize=1b keeps the coalesce target at
        # bytes/parallelism → every shuffle lands near defaultParallelism.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # co-partitioned assignment plan (spatial_join.py): both join sides
        # hash by pcell (a prefix function of the cell join key) so the
        # refine cogroup reuses the join partitioning. The default
        # requireAllClusterKeysForCoPartition=true rejects subset-key
        # partitionings and re-exchanges the whole candidate stream;
        # relaxing it is exactly the supported use of this knob (equal full
        # keys always co-locate under a hash of any common subset).
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        # Shuffle writer: the bypass-merge writer opens one temp file +
        # 32 KB buffer PER REDUCE PARTITION per map task; at R reduce
        # partitions on a many-core executor that is M×R file
        # create/write/close/merge ops — measured 85 cpu-s (0.67 s/task)
        # to shuffle 4 MB at M=R=128 vs 7.9 cpu-s with the sort-based
        # writer, which writes ONE spill file per map task regardless of
        # R (r6, /tmp/taskfloor repro). Large shuffles already take the
        # sort path (bypass only applies at R ≤ 200), so forcing it is
        # scale-neutral; env-overridable to restore the default.
        .config(
            "spark.shuffle.sort.bypassMergeThreshold",
            os.environ.get("GEOPULL_BYPASS_MERGE_THRESHOLD", "2"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    )
    # Python workers launch through a PYTHONPATH-sanitizing wrapper: with
    # pyspark.zip (and inherited jars) on the worker path, CPython 3.11's
    # eager zipimport invalidation costs ~150 ms PER TASK inside pyspark's
    # setup_spark_files (one TOC re-parse per cached zip finder — measured,
    # see pyworker.sh). The wrapper strips archive entries so workers import
    # the pip pyspark from site-packages like the driver does. Opt out with
    # GEOPULL_WORKER_PYTHON=python (or any interpreter path).
    worker_py = os.environ.get("GEOPULL_WORKER_PYTHON")
    if worker_py is None:
        wrapper = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pyworker.sh")
        if os.access(wrapper, os.X_OK):
            # wrap whatever interpreter was configured (default "python")
            prev = os.environ.get("PYSPARK_PYTHON")
            if prev and os.path.basename(prev) != "pyworker.sh":
                os.environ["GEOPULL_BASE_PYTHON"] = prev
            worker_py = wrapper
    if worker_py:
        # pyspark resolves the worker interpreter from PYSPARK_PYTHON at
        # SparkContext init (spark.pyspark.python alone is not consulted by
        # the in-process python driver), so set both.
        os.environ["PYSPARK_PYTHON"] = worker_py
        b = b.config("spark.pyspark.python", worker_py)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
