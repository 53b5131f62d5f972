"""Interval-polling input source tests — mirrors the reference's
test_in_elasticsearch.rb:333-460 expectations (emit, docinfo struct,
custom index name, parse_timestamp + error routing, slices, size) plus the
timer-loop semantics (:159-163): a second cycle re-reads the snapshot and
sees rows appended between cycles.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from fluent_plugin_elasticsearch_spark.sources.poll import PollingSource


@pytest.fixture()
def events_path(spark, tmp_path):
    path = str(tmp_path / "events")
    rows = [
        Row(doc_id=i, message="Hi from Fluentd!",
            ts="2019-11-14T07:45:10Z" if i % 2 == 0 else "not-a-time",
            value=float(i))
        for i in range(10)
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(path)
    return path


def test_emit_two_cycles_sees_appended_rows(spark, events_path):
    """in_elasticsearch.rb:159-163 — every interval tick re-runs the search;
    rows landed between ticks appear in the next emit."""
    src = PollingSource(spark, events_path, tag="es.poll", interval=0.0)
    emitted = []
    src.run(lambda tag, df: emitted.append((tag, df.count())), cycles=1)
    assert emitted == [("es.poll", 10)]

    spark.createDataFrame(
        [Row(doc_id=100, message="late", ts="2019-11-15T00:00:00Z", value=1.0)]
    ).write.mode("append").parquet(events_path)

    src.run(lambda tag, df: emitted.append((tag, df.count())), cycles=1)
    assert emitted[-1] == ("es.poll", 11)
    assert src.cycles_run == 2


def test_docinfo_enrichment(spark, events_path):
    """test_emit_with_docinfo: @metadata carries _index and _id (string).
    _type is omitted — dead in ES8+ (SURVEY.md T6)."""
    src = PollingSource(
        spark, events_path, docinfo=True, index_name="fluentd-2019.11.14",
        id_col="doc_id",
    )
    batch, _ = src.run_once()
    row = batch.orderBy("doc_id").limit(1).collect()[0]
    meta = row["@metadata"].asDict()
    assert meta == {"_index": "fluentd-2019.11.14", "_id": "0"}


def test_query_body_and_size(spark, events_path):
    """query + size compile to pushed-down filter + LIMIT (test_emit_with_size)."""
    src = PollingSource(
        spark, events_path,
        query={"query": {"range": {"doc_id": {"gte": 4}}}, "sort": [{"doc_id": "asc"}]},
        size=3,
    )
    batch, _ = src.run_once()
    assert [r["doc_id"] for r in batch.collect()] == [4, 5, 6]


def test_slices_are_partitions(spark, events_path):
    """test_emit_with_slices: num_slices ≡ scan partitions; the union of
    slices is the full result exactly once."""
    src = PollingSource(spark, events_path, num_slices=4)
    batch, _ = src.run_once()
    assert batch.rdd.getNumPartitions() == 4
    assert sorted(r["doc_id"] for r in batch.collect()) == list(range(10))


def test_parse_timestamp_quarantine(spark, events_path):
    """test_emit_with_parse_timestamp + error-tag routing (:200-205):
    parse failures go to the quarantine emit, not the batch."""
    src = PollingSource(spark, events_path, parse_timestamp=True,
                        timestamp_key="ts", repeat=False)
    good, bad = [], []
    n = src.run(lambda tag, df: good.extend(df.collect()),
                on_error=lambda tag, df: bad.extend(df.collect()))
    assert n == 1  # repeat=False ⇒ one-shot
    assert {r["doc_id"] for r in good} == {0, 2, 4, 6, 8}
    assert {r["doc_id"] for r in bad} == {1, 3, 5, 7, 9}
    assert good[0]["event_time"] == dt.datetime(2019, 11, 14, 7, 45, 10)


def test_repeat_interval_uses_sleep(spark, events_path):
    naps = []
    src = PollingSource(spark, events_path, interval=5.0)
    src.run(lambda tag, df: None, cycles=3, sleep_fn=naps.append)
    assert naps == [5.0, 5.0]  # sleeps BETWEEN cycles, not after the last
