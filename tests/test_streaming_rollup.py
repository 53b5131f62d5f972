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


def test_sessionize_stream_e2e(spark, tmp_path):
    """Streaming session_window twin of the batch sessionize: closed
    sessions appear once the watermark passes; totals match the batch
    gaps-and-islands result on the same data."""
    import datetime as dt

    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.streaming.sessionize import (
        sessionize, sessionize_stream)

    base = dt.datetime(2024, 1, 1, 8, 0, 0)
    rows = []
    for u in range(3):
        for s in range(2):          # two sessions per user, 1h apart
            for i in range(4):      # 4 events, 30s gaps
                rows.append(Row(user_id=u, ts=base + dt.timedelta(
                    hours=s, seconds=30 * i)))
    src = str(tmp_path / "src")
    spark.createDataFrame(rows).write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = sessionize_stream(stream, gap_seconds=300, watermark="1 second")
    q = (out.writeStream.format("memory").queryName("sess_out")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = spark.sql("SELECT * FROM sess_out").collect()
    # append mode emits only watermark-closed sessions; every emitted row
    # must match a batch session exactly
    batch = {(r["user_id"], r["session_start"], r["n_events"])
             for r in sessionize(spark.createDataFrame(rows), 300,
                                 user_col="user_id").collect()}
    assert batch  # 6 sessions total in batch mode
    for r in got:
        assert (r["user_id"], r["session_start"], r["n_events"]) in batch


def test_eql_sequence_three_steps(spark):
    import datetime as dt

    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.streaming.sessionize import (
        eql_sequence)

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        Row(event_id=1, user_id=1, event_type="a", ts=t0),
        Row(event_id=2, user_id=1, event_type="b", ts=t0 + dt.timedelta(seconds=10)),
        Row(event_id=3, user_id=1, event_type="c", ts=t0 + dt.timedelta(seconds=20)),
        # chain broken by maxspan: c too late relative to step0
        Row(event_id=4, user_id=2, event_type="a", ts=t0),
        Row(event_id=5, user_id=2, event_type="b", ts=t0 + dt.timedelta(seconds=10)),
        Row(event_id=6, user_id=2, event_type="c", ts=t0 + dt.timedelta(seconds=120)),
        # wrong order never matches
        Row(event_id=7, user_id=3, event_type="c", ts=t0),
        Row(event_id=8, user_id=3, event_type="b", ts=t0 + dt.timedelta(seconds=5)),
        Row(event_id=9, user_id=3, event_type="a", ts=t0 + dt.timedelta(seconds=10)),
    ]
    ev = spark.createDataFrame(rows)
    out = eql_sequence(
        ev, [{"term": {"event_type": "a"}}, {"term": {"event_type": "b"}},
             {"term": {"event_type": "c"}}], within_seconds=60)
    rows_out = out.collect()
    assert [(r["user_id"], r["step0_id"], r["step1_id"], r["step2_id"],
             r["span_seconds"]) for r in rows_out] == [(1, 1, 2, 3, 20)]
    import pytest

    with pytest.raises(ValueError):
        eql_sequence(ev, [{"term": {"event_type": "a"}}], 60)


def test_eql_sequence_stream_matches_batch(spark, tmp_path):
    """Stream-stream EQL join (watermarked) returns exactly the batch
    operator's chains on the same data — live/backfill parity."""
    import datetime as dt

    from fluent_plugin_elasticsearch_spark.streaming.sessionize import (
        eql_sequence, eql_sequence_stream)

    t0 = dt.datetime(2024, 1, 1, 9)
    rows = []
    for u in range(5):
        rows.append(Row(event_id=u * 10, user_id=u, event_type="view",
                        ts=t0 + dt.timedelta(seconds=u)))
        rows.append(Row(event_id=u * 10 + 1, user_id=u, event_type="purchase",
                        ts=t0 + dt.timedelta(seconds=u + (5 if u % 2 else 2000))))
    ev = spark.createDataFrame(rows)
    views_dir, buys_dir = str(tmp_path / "v"), str(tmp_path / "b")
    ev.filter(F.col("event_type") == "view").write.parquet(views_dir)
    ev.filter(F.col("event_type") == "purchase").write.parquet(buys_dir)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    sv = spark.readStream.schema(schema).parquet(views_dir)
    sb = spark.readStream.schema(schema).parquet(buys_dir)
    out = eql_sequence_stream(sv, sb, within_seconds=60, watermark="1 second")
    q = (out.writeStream.format("memory").queryName("eqlstream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = {(r["user_id"], r["step0_id"], r["step1_id"], r["span_seconds"])
           for r in spark.sql("SELECT * FROM eqlstream").collect()}
    want = {(r["user_id"], r["step0_id"], r["step1_id"], r["span_seconds"])
            for r in eql_sequence(
                ev, [{"term": {"event_type": "view"}},
                     {"term": {"event_type": "purchase"}}], 60).collect()}
    assert got == want and len(want) == 2  # odd users (u=1,3) within 60s


def test_dedup_stream_effectively_once(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.streaming.ingest import dedup_stream

    src = str(tmp_path / "dsrc")
    t0 = dt.datetime(2024, 1, 1, 12)
    b1 = spark.createDataFrame(
        [Row(doc_id=i, ts=t0 + dt.timedelta(seconds=i), v=f"a{i}") for i in range(5)])
    b1.write.parquet(src)
    stream = spark.readStream.schema(b1.schema).parquet(src)
    out = dedup_stream(stream, ["doc_id"], "ts", watermark="1 hour")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_out")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    # redelivery batch: same ids (duplicates) + one new id
    b2 = spark.createDataFrame(
        [Row(doc_id=1, ts=t0 + dt.timedelta(seconds=70), v="DUP"),
         Row(doc_id=9, ts=t0 + dt.timedelta(seconds=80), v="fresh")])
    b2.write.mode("append").parquet(src)
    q.processAllAvailable()
    rows = {r["doc_id"]: r["v"] for r in spark.sql("select * from dedup_out").collect()}
    q.stop()
    assert len(rows) == 6           # 5 originals + the one new id
    assert rows[1] == "a1"          # first record won; redelivery dropped
    assert rows[9] == "fresh"
