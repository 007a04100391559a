"""SparkSession builder tuned for the link-graph engine.

Local-mode defaults mirror a multi-executor deployment: AQE on (runtime
skew-join splitting + partition coalescing), shuffle partitions sized to
cores, Arrow enabled for the pandas-UDF fast paths. On a real cluster the
same builder is used by ``spark-submit --py-files`` (see ``bench.py``).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "neo4j-graph-algorithms-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in this
    sandbox). ``shuffle_partitions`` defaults to the core count — at
    cluster scale the caller sizes it to ``2-3x total cores`` instead.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N; "local[*]" → cpus
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cpus if inner in ("", "*") else int(inner)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # iterative kernels join a big cached hash-partitioned edge table
        # with a small per-superstep state frame: a shuffled-hash join
        # probes the cached side in place, where sort-merge would re-sort
        # the edge partitions every superstep
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        # iterative kernels retire a localCheckpoint per superstep; the
        # blocks are only freed when the JVM GCs the RDD handle, so a
        # periodic GC keeps BlockManager storage flat. Tunable because a
        # forced full GC of a large heap pauses O(seconds) — benchmarks
        # with short supersteps raise it so the pause doesn't masquerade
        # as superstep variance
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("NGA_PERIODIC_GC", "30s"),
        )
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
