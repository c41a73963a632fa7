"""SparkSession builder tuned for the validation engine.

Design notes for 100 TB scale (tested on local[N]):
- AQE on: runtime coalescing of shuffle partitions and skew-join splitting
  cover most skew; hot conv_ids beyond AQE's reach are salted explicitly in
  ``operators.constraints``.
- Arrow on: every per-series kernel crosses the JVM<->Python boundary as
  columnar Arrow batches (pandas UDF / applyInPandas), never per-row Python.
- shuffle.partitions is a default for local runs; on a real cluster AQE's
  coalescing makes the initial number far less sensitive.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "anomaly-detector-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's standard config."""
    # One BLAS thread per Python worker: with N workers on N cores, nested
    # OpenBLAS/MKL pools (N workers x N threads) thrash the box and invert
    # scaling.  Must be set before numpy loads in the workers (they inherit
    # this environment through the pyspark daemon).
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS", "VECLIB_MAXIMUM_THREADS"):
        os.environ.setdefault(var, "1")

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    # Shuffle spill directory: this sandbox's virtio disk serializes under
    # 32 concurrent shuffle writers (heavy window/agg stages ran 7-10x slower
    # at local[32] than local[8]); tmpfs isolates CPU scaling.  Real clusters
    # set spark.local.dir to striped local disks instead.
    local_dir = os.environ.get("SPARK_LOCAL_DIRS")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
        os.makedirs(local_dir, exist_ok=True)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # PySpark 4's DataFrame debugging captures a Python stack trace and
        # posts it to the JVM (PySparkCurrentOrigin) on EVERY DataFrame API
        # call — one extra py4j round-trip per operation, ~0.4s of lazy
        # imports on first use (profiled r7: 682 py4j round-trips just to
        # BUILD the minhash plan).  Error call-site enrichment is a debug
        # aid; production query paths turn it off.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
