"""ES ingest-pipeline processors (functions/ingest_pipeline): the
document-shaping subset the reference's `pipeline` parameter delegates
to Elasticsearch (out_elasticsearch.rb:144, :1061), executed here as a
compiled projection chain."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from fluent_plugin_elasticsearch_spark.functions.ingest_pipeline import (
    apply_ingest_pipeline,
    compile_pipeline,
)
from fluent_plugin_elasticsearch_spark.plans.query_ast import UnsupportedQuery


@pytest.fixture(scope="module")
def rows(spark):
    return spark.createDataFrame([
        Row(doc_id=1, msg="  Hello World  ", level="INFO", n="42",
            ts="2024-03-05T10:30:00Z", tags=["a"]),
        Row(doc_id=2, msg="Bye", level="warn", n="7",
            ts="2024-03-06T01:02:03Z", tags=None),
    ])


def test_processor_chain(spark, rows):
    out = apply_ingest_pipeline(rows, [
        {"set": {"field": "env", "value": "prod"}},
        {"rename": {"field": "msg", "target_field": "message"}},
        {"trim": {"field": "message"}},
        {"lowercase": {"field": "level"}},
        {"convert": {"field": "n", "type": "long"}},
        {"gsub": {"field": "message", "pattern": "o", "replacement": "0"}},
        {"split": {"field": "message", "separator": " ",
                   "target_field": "words"}},
        {"append": {"field": "tags", "value": "ingested"}},
        {"date": {"field": "ts", "formats": ["ISO8601"]}},
        {"remove": {"field": "ts"}},
    ])
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[1]["env"] == "prod" and r[2]["env"] == "prod"
    assert r[1]["message"] == "Hell0 W0rld"
    assert r[1]["words"] == ["Hell0", "W0rld"]
    assert r[1]["level"] == "info" and r[2]["level"] == "warn"
    assert r[1]["n"] == 42 and r[2]["n"] == 7
    assert r[1]["tags"] == ["a", "ingested"]
    assert r[2]["tags"] == ["ingested"]  # null source array
    assert isinstance(r[1]["@timestamp"], dt.datetime)
    assert "ts" not in out.columns


def test_set_no_override_and_date_fallback(spark, rows):
    out = apply_ingest_pipeline(rows, [
        {"set": {"field": "level", "value": "UNSET", "override": False}},
        {"set": {"field": "fresh", "value": "x", "override": False}},
        {"date": {"field": "n", "formats": ["epoch_second"],
                  "target_field": "n_ts"}},
    ])
    r = {x["doc_id"]: x for x in out.collect()}
    assert r[1]["level"] == "INFO"  # existing value kept
    assert r[1]["fresh"] == "x"     # absent column created
    assert r[1]["n_ts"] == dt.datetime(1970, 1, 1, 0, 0, 42)


def test_unsupported_raises(spark):
    with pytest.raises(UnsupportedQuery, match="script"):
        compile_pipeline([{"script": {"source": "ctx.x = 1"}}])
    with pytest.raises(UnsupportedQuery, match="top-level"):
        compile_pipeline([{"set": {"field": "a.b", "value": 1}}])
    with pytest.raises(UnsupportedQuery, match="convert type"):
        compile_pipeline([{"convert": {"field": "a", "type": "ip"}}])


def test_catalyst_collapses_chain(spark, rows):
    """The processor chain compiles into ONE projection stage — no
    per-processor shuffle or exchange."""
    out = apply_ingest_pipeline(rows, [
        {"set": {"field": "e", "value": 1}},
        {"lowercase": {"field": "level"}},
        {"gsub": {"field": "msg", "pattern": "l", "replacement": "L"}},
    ])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
