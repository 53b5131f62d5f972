"""Copy-on-write table scale receipt: micro-batch upsert wall vs the
full-table-rewrite MERGE emulation, at a 1M-row table.

Usage: python scripts/stress_cow.py [--json out.json]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_elasticsearch_spark.session import get_spark  # noqa: E402
from fluent_plugin_elasticsearch_spark.sinks.cow_table import CowTable  # noqa: E402
from fluent_plugin_elasticsearch_spark.sinks.write_ops import op_upsert  # noqa: E402


def main() -> None:
    # n_buckets sizes with the table (real deployments hold bucket size
    # ~constant: 100 TB → ~100k buckets), so a micro-batch touches
    # ≤ batch_rows buckets = a vanishing fraction of the table. 512 here
    # keeps per-bucket files sane at 1M rows.
    n = int(os.environ.get("COW_STRESS_ROWS", "1000000"))
    n_batches = int(os.environ.get("COW_STRESS_BATCHES", "10"))
    batch_rows = int(os.environ.get("COW_STRESS_BATCH_ROWS", "20"))
    spark = get_spark("stress_cow", cores="*", shuffle_partitions=64,
                      tmpfs_scratch=True)
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.sha2(F.col("id").cast("string"), 256).alias("text"),
        (F.col("id") % 1000).alias("n"))

    t = CowTable(spark, tempfile.mkdtemp(prefix="cow_stress_") + "/t",
                 id_col="doc_id", n_buckets=512)
    t0 = time.time()
    t.create(base)
    create_s = time.time() - t0

    cow_walls, touched_counts = [], []
    for b in range(n_batches):
        batch = spark.range(b * batch_rows, (b + 1) * batch_rows).select(
            (F.col("id") * 7919 % n).alias("doc_id"),
            F.lit(f"updated-b{b}").alias("text"), F.lit(-1).cast("long").alias("n"))
        t0 = time.time()
        res = t.upsert(batch)
        cow_walls.append(time.time() - t0)
        touched_counts.append(len(res["touched_buckets"]))

    # full-rewrite emulation baseline: ONE batch (each is minutes-free but
    # rewrites 1M rows; one measurement suffices for the ratio)
    out_dir = tempfile.mkdtemp(prefix="full_rw_") + "/t"
    base.write.parquet(out_dir)
    target = spark.read.parquet(out_dir)
    batch = spark.range(batch_rows).select(
        (F.col("id") * 7919 % n).alias("doc_id"),
        F.lit("updated-full").alias("text"), F.lit(-1).cast("long").alias("n"))
    t0 = time.time()
    op_upsert(target, batch, "doc_id").write.parquet(
        tempfile.mkdtemp(prefix="full_rw_out_") + "/t")
    full_s = time.time() - t0

    res = {
        "n_rows": n, "batch_rows": batch_rows, "n_batches": n_batches,
        "n_buckets": 512,
        "create_wall_s": round(create_s, 2),
        "cow_batch_p50_s": round(statistics.median(cow_walls), 3),
        "cow_batch_mean_s": round(sum(cow_walls) / len(cow_walls), 3),
        "cow_batch_walls": [round(w, 2) for w in cow_walls],
        "full_rewrite_batch_s": round(full_s, 2),
        "speedup_vs_full_rewrite": round(full_s / statistics.median(cow_walls), 2),
        "touched_buckets_p50": statistics.median(touched_counts),
        # the SCALE metric: fraction of the table read+rewritten per batch.
        # Wall crossover needs table >> sandbox (full rewrite of 1M rows is
        # seconds here; at 100 TB it is hours while the COW batch I/O stays
        # proportional to this fraction).
        "rows_rewritten_frac_p50": round(
            statistics.median(touched_counts) / 512, 4),
    }
    print(json.dumps(res))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(res, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
