"""Watermarked windowed rollup (streaming/rollup.py): append-mode bucket
finality driven by watermark advance, per-key buckets, late-data drop."""

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_plugin_elasticsearch_spark.streaming.rollup import streaming_date_histogram


def _rows(*specs):
    return [Row(ts=dt.datetime(2024, 1, 1, h, m), tag=t, v=float(v))
            for h, m, t, v in specs]


def test_append_rollup_emits_finalized_buckets(spark, tmp_path):
    src = str(tmp_path / "src")
    b1 = spark.createDataFrame(_rows(
        (10, 5, "a", 1), (10, 20, "a", 2), (10, 40, "b", 3), (11, 10, "a", 4)))
    b1.write.mode("append").parquet(src)

    stream = spark.readStream.schema(b1.schema).parquet(src)
    out = streaming_date_histogram(
        stream, "ts", interval="1 hour", watermark="30 minutes",
        keys=["tag"], metrics=[F.sum("v").alias("v_sum")])
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("rollup").option("checkpointLocation", str(tmp_path / "ck"))
         .start())
    q.processAllAvailable()
    # watermark = max(11:10) - 30m = 10:40 → no bucket end (11:00) passed yet
    assert spark.sql("select * from rollup").count() == 0

    # an event at 13:00 advances the watermark past 11:00 and 12:00
    spark.createDataFrame(_rows((13, 0, "a", 5))).write.mode("append").parquet(src)
    q.processAllAvailable()
    got = {(r["bucket_start"].hour, r["tag"]): (r["doc_count"], r["v_sum"])
           for r in spark.sql("select * from rollup").collect()}
    assert got[(10, "a")] == (2, 3.0)
    assert got[(10, "b")] == (1, 3.0)
    assert got[(11, "a")] == (1, 4.0)
    assert (13, "a") not in got  # still open

    # LATE data for the 10:00 bucket is dropped (watermark passed)
    spark.createDataFrame(_rows((10, 50, "a", 99))).write.mode("append").parquet(src)
    spark.createDataFrame(_rows((15, 0, "a", 6))).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from rollup").collect()
    final_10a = [r for r in rows if r["bucket_start"].hour == 10 and r["tag"] == "a"]
    assert len(final_10a) == 1 and final_10a[0]["doc_count"] == 2  # late row ignored
