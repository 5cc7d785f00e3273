"""SparkSession factory with scale-appropriate defaults."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "lucene_solr_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults are chosen for the sandbox (local[N]) but every knob matters at
    cluster scale too: AQE on (runtime re-plan + skew-join splitting),
    adaptive partition coalescing, Arrow for the pandas-UDF kernels, and a
    shuffle-partition count sized to the core count rather than Spark's 200.
    """
    # Python workers are spawned by the executor JVM with ITS environment, not
    # the driver's sys.path — make the package importable there.  Local mode:
    # the JVM inherits this env var if set before context start.  Cluster mode:
    # ship the package with spark-submit --py-files instead (north rule).
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
        )

    master = master or os.environ.get("SPARK_GRAFT_MASTER") or (
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    )
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        # '*' is a legal all-cores spelling for the master string above —
        # non-numeric values fall back to the standard 32 default
        shuffle_partitions = int(cpus) if cpus and cpus.isdigit() else 32
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the inversion's collect_list(positions) aggregate is an
        # ObjectHashAggregate; Spark's default sort-based fallback threshold
        # is 128 IN-MEMORY KEYS, so any real posting-build task degenerates
        # to a full sort of the occurrence stream (measured: −26% inversion
        # wall at 4 executors, −10% at 1, when kept in hash mode).  4M keys
        # bounds the hash map to ~0.5–1 GB/task; the builder's shuffle
        # sizing keeps (docs/task × unique terms/doc) under that at any
        # input scale (keys/task shrinks as shuffle partitions grow), and
        # beyond the threshold the sort fallback still protects correctness.
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        # columnar-cache batches default to 10k ROWS regardless of row width;
        # the builder caches a per-doc tokenized array (~KBs/row on web pages),
        # and unrolling 10k such rows per task concurrently OOMs the executor.
        # 1024 bounds unroll memory by width, costing nothing on narrow tables.
        .config("spark.sql.inMemoryColumnarStorage.batchSize", "1024")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # shuffle/spill on tmpfs when available: the sandbox's virtual disk
        # throttles concurrent writers and was the scaling bottleneck; on a
        # real cluster this is the executors' local NVMe
        .config(
            "spark.local.dir",
            os.environ.get(
                "SPARK_GRAFT_LOCAL_DIR",
                "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp",
            ),
        )
        # task-side output commit (v2): the driver otherwise renames every
        # task file sequentially at job end — pure serial time that grows
        # with partition count and dominates small-batch writes on a big
        # cluster.  Atomicity of the STORE is provided one level up by its
        # snapshot commit (a write is invisible until the snapshot json
        # lands), so v2's weaker job-level atomicity costs nothing here.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
