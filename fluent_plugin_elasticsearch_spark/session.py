"""SparkSession factory tuned for this engine.

Local mode is a single JVM; on a real cluster the same confs apply, with
``spark.sql.shuffle.partitions`` sized to ~2-3x total cores and AQE
coalescing handling the rest. UTC session timezone is pinned so timestamp
semantics match the reference (`utc_index` default, out_elasticsearch.rb:99)
and the DuckDB oracle (UTC-naive timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


# Only honor a tmpfs-scratch opt-in when /dev/shm has this much free room —
# below it, a big build's shuffle files would ENOSPC where /tmp would not.
_TMPFS_MIN_FREE_BYTES = 24 * 1024**3


def get_spark(
    app_name: str = "fluent_plugin_elasticsearch_spark",
    cores: int | str = "*",
    shuffle_partitions: int = 32,
    extra_conf: dict | None = None,
    tmpfs_scratch: bool = False,
) -> SparkSession:
    # Make the package importable in Python workers regardless of cwd.
    # (Cluster deployment ships it via `spark-submit --py-files` instead —
    # see scripts/; this only covers local-mode drives.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{pkg_root}{os.pathsep}{pp}" if pp else pkg_root
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # local mode = driver-only: the heap serves all executor threads.
        # 8g + 32 concurrent tasks + a cached corpus = GC collapse (measured
        # 3x slowdown); size generously and let the OS lazily commit.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # extraction/tokenization is CPU-heavy per byte: favor more, smaller
        # scan splits so the analysis chain parallelizes even on few files
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        # K8 table-level compression (postings blocks carry their own
        # delta-gap+varint codec; zstd squeezes the parquet envelope)
        .config("spark.sql.parquet.compression.codec", "zstd")
    )
    # Shuffle/spill scratch on tmpfs is OPT-IN only (SPARK_GRAFT_LOCAL_DIR
    # env or tmpfs_scratch=True): tmpfs is typically capped at half of RAM
    # and a large build spills 10-15 GB, so silently defaulting to /dev/shm
    # can ENOSPC builds that would have succeeded on disk. The scaling
    # benchmark (scripts/scaling.py) opts in explicitly; the path carries a
    # per-uid suffix so multi-tenant boxes don't collide; and we require
    # enough free tmpfs headroom before honoring the opt-in.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and tmpfs_scratch and os.path.isdir("/dev/shm"):
        cand = f"/dev/shm/spark-local-{os.getuid()}"
        try:
            st = os.statvfs("/dev/shm")
            free_bytes = st.f_bavail * st.f_frsize
        except OSError:
            free_bytes = 0
        if free_bytes >= _TMPFS_MIN_FREE_BYTES:
            local_dir = cand
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
