"""Golden bulk-body shapes (FIXTURES.md §5, mirroring the reference's
stub_elastic NDJSON assertions, test_out_elasticsearch.rb:5956-6140) +
size-based splitting (K7) + backoff retry (K10)."""

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_plugin_elasticsearch_spark.sinks.bulk_format import (
    bulk_action_lines,
    retry_with_backoff,
    with_size_splits,
)


@pytest.fixture()
def record_df(spark):
    return spark.createDataFrame(
        [Row(index_name="logstash-2013.01.01", request_id="87d89af7daffad6", name="Johnny")]
    )


def test_index_op_golden(record_df):
    out = bulk_action_lines(record_df, op="index", id_col="request_id",
                            body_cols=["name", "request_id"]).collect()[0]
    assert json.loads(out["header"]) == {
        "index": {"_index": "logstash-2013.01.01", "_id": "87d89af7daffad6"}
    }
    assert json.loads(out["body"]) == {"name": "Johnny", "request_id": "87d89af7daffad6"}


def test_update_and_upsert_wrap_doc(record_df):
    upd = bulk_action_lines(record_df, op="update", id_col="request_id",
                            body_cols=["name"]).collect()[0]
    assert json.loads(upd["header"]) == {
        "update": {"_index": "logstash-2013.01.01", "_id": "87d89af7daffad6"}
    }
    assert json.loads(upd["body"]) == {"doc": {"name": "Johnny"}}
    ups = bulk_action_lines(record_df, op="upsert", id_col="request_id",
                            body_cols=["name"]).collect()[0]
    assert json.loads(ups["body"]) == {"doc": {"name": "Johnny"}, "doc_as_upsert": True}


def test_create_and_routing(record_df):
    out = bulk_action_lines(record_df, op="create", id_col="request_id",
                            routing_col="name", body_cols=["name"]).collect()[0]
    hdr = json.loads(out["header"])
    assert hdr["create"]["routing"] == "Johnny"


def test_size_splits(spark):
    rows = [Row(index_name="i", seq=i, payload="x" * 100) for i in range(100)]
    df = bulk_action_lines(spark.createDataFrame(rows), op="index", body_cols=["payload", "seq"])
    out = with_size_splits(df, threshold_bytes=1000, order_col="seq").collect()
    sizes: dict[int, int] = {}
    for r in out:
        sizes[r["batch_id"]] = sizes.get(r["batch_id"], 0) + len(r["header"]) + len(r["body"]) + 2
    assert len(sizes) > 5  # actually split
    for b, s in sizes.items():
        assert s <= 1000 + 200  # each batch under threshold (+1 row slack)
    # batches are contiguous in order
    seen = [r["batch_id"] for r in sorted(out, key=lambda r: r["seq"])]
    assert seen == sorted(seen)


def test_retry_with_backoff():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise IOError("boom")
        return "ok"

    sleeps = []
    got = retry_with_backoff(flaky, base_sleep=0.0, on_retry=lambda a, s, e: sleeps.append(a))
    assert got == "ok" and len(calls) == 3 and sleeps == [0, 1]
    with pytest.raises(IOError):
        retry_with_backoff(lambda: (_ for _ in ()).throw(IOError("x")), max_retries=1, base_sleep=0.0)
