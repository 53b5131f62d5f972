"""spark-submit child for the multi-process scaling run (scaling_cluster.py).

Runs under a standalone master (``--master spark://...``) with the engine
shipped via ``--py-files engine.zip`` — the north-rule deployment shape.
Does one small warm-up build (JVM codegen + Python worker forks are
one-time per executor), then times the full 600k-doc index build and the
compute-only (noop-sink) variant, printing one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

from pyspark.sql import SparkSession


def main() -> None:
    corpus, n_docs = sys.argv[1], int(sys.argv[2])
    spark = SparkSession.builder.getOrCreate()  # conf comes from spark-submit
    spark.sparkContext.setLogLevel("WARN")

    from fluent_plugin_elasticsearch_spark.operators.index_build import (
        build_compute_only,
        build_index,
        with_doc_id,
    )

    docs = with_doc_id(spark.read.parquet(corpus), "url")
    docs.count()  # warm the scan (input materialization is not the engine)
    build_index(
        spark, docs.limit(20000), tempfile.mkdtemp(prefix="warm_") + "/idx",
        id_col="doc_id", html_col="html", text_col=None, url_col="url",
        tokenizer="unicode", n_shards=64, n_salts=8,
    )
    idx_dir = tempfile.mkdtemp(prefix="cluster_scale_") + "/idx"
    t0 = time.time()
    build_index(
        spark, docs, idx_dir,
        id_col="doc_id", html_col="html", text_col=None, url_col="url",
        tokenizer="unicode", n_shards=64, n_salts=8,
    )
    wall = time.time() - t0
    t1 = time.time()
    build_compute_only(
        spark, docs,
        id_col="doc_id", html_col="html", text_col=None,
        tokenizer="unicode", n_shards=64, n_salts=8,
    )
    compute_wall = time.time() - t1
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    spark.stop()
    print(json.dumps({
        "wall_s": wall, "docs_per_sec": n_docs / wall,
        "compute_wall_s": compute_wall,
        "compute_docs_per_sec": n_docs / compute_wall,
        "executors": n_exec,
    }))


if __name__ == "__main__":
    main()
