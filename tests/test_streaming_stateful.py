"""Stateful streaming: exact per-key accumulators persist across
micro-batches (applyInPandasWithState)."""

import pytest
from pyspark.sql import Row

from fluent_plugin_elasticsearch_spark.streaming.stateful import running_ingest_stats


def test_running_stats_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    b1 = spark.createDataFrame(
        [Row(tag="a", n_tokens=10), Row(tag="a", n_tokens=5), Row(tag="b", n_tokens=7)]
    )
    b1.write.mode("append").parquet(src)

    stream = spark.readStream.schema(b1.schema).parquet(src)
    out = running_ingest_stats(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    got = {r["key"]: (r["n_docs"], r["total_tokens"]) for r in spark.sql("select * from stats").collect()}
    assert got == {"a": (2, 15), "b": (1, 7)}

    # second micro-batch: state carries over
    spark.createDataFrame([Row(tag="a", n_tokens=3)]).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    rows = spark.sql("select * from stats").collect()
    latest_a = max((r for r in rows if r["key"] == "a"), key=lambda r: r["n_docs"])
    assert (latest_a["n_docs"], latest_a["total_tokens"]) == (3, 18)
