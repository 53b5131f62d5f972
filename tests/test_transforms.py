"""Reference ingest-operator tests: genid golden vectors (ported verbatim
from test/plugin/test_filter_elasticsearch_genid.rb:52-213), timestamp
injection precedence, logstash index naming incl. UTC day rollover
(test_out_elasticsearch.rb:4749-4761), flattening, placeholders, accessors.
"""

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_plugin_elasticsearch_spark.functions.genid import (
    genid_hash,
    genid_seed,
    genid_seed_entire_record,
    genid_random,
)
from fluent_plugin_elasticsearch_spark.functions.transforms import (
    expand_placeholders,
    extract_meta,
    flatten_struct_df,
    inject_tag,
    inject_timestamp,
    parse_time_with_quarantine,
    remove_keys,
    target_index,
)

# reference seed record (FIXTURES.md §4 / test_filter_elasticsearch_genid.rb)
GENID_GOLDENS = {
    "md5": "PPg+zmH1ASUCpNzMUcTzqw==",
    "sha1": "JKfCrEAxeAyRSdcKqkw4unC9xZ8=",
    "sha256": "9Z9i+897bGivSItD/6i0vye9uRwq/sLwWkxOwydtTJY=",
    "sha512": "KWI5OdZPaCFW9/CEY3NoGrvueMtjZJdmGdqIVGJP8vgI4uW+0gHExZVaHerw+RhbtIdLCtVZ43xBgMKH+KliQg==",
}


@pytest.fixture(scope="module")
def genid_df(spark):
    return spark.createDataFrame(
        [
            Row(
                tag="test.fluentd",
                time=dt.datetime(2017, 10, 15, 15, 0, 23),
                age=26,
                request_id="42",
                parent_id="parent",
                routing_id="routing",
                custom_key="This is also encoded value.",
            )
        ]
    )


@pytest.mark.parametrize("alg,expected", sorted(GENID_GOLDENS.items()))
def test_genid_golden_vectors(genid_df, alg, expected):
    seed = genid_seed(["age", "parent_id", "routing_id", "custom_key"], "_")
    got = genid_df.select(genid_hash(seed, alg).alias("h")).collect()[0]["h"]
    assert got == expected


def test_genid_tag_and_time_in_seed(genid_df):
    # with tag: seed = "test.fluentd_26_..."; with time: epoch-seconds prefix
    seed_tag = genid_seed(["age"], "_", include_tag=True)
    row = genid_df.select(seed_tag.alias("s")).collect()[0]
    assert row["s"] == "test.fluentd_26"
    seed_t = genid_seed(["age"], "_", include_time=True)
    row = genid_df.select(seed_t.alias("s")).collect()[0]
    assert row["s"].endswith("_26") and row["s"][:-3].isdigit()


def test_genid_entire_record(genid_df):
    # reference format (filter_elasticsearch_genid.rb:59-62): |k|v pairs,
    # no separator — full golden-vector coverage lives in tests/test_genid.py
    seed = genid_seed_entire_record(
        ["age", "custom_key", "parent_id", "request_id", "routing_id"], "_"
    )
    row = genid_df.select(seed.alias("s")).collect()[0]
    assert row["s"] == (
        "|age|26|custom_key|This is also encoded value."
        "|parent_id|parent|request_id|42|routing_id|routing"
    )


def test_genid_random_shape(genid_df):
    vals = genid_df.select(genid_random().alias("u")).collect()[0]["u"]
    assert len(vals) == 36 and vals.count("-") == 4


def test_timestamp_injection_precedence(spark):
    df = spark.createDataFrame(
        [
            Row(time=dt.datetime(2024, 1, 1, 12, 0, 0), **{"@timestamp": "2020-05-05T00:00:00Z"}, vtm=None),
            Row(time=dt.datetime(2024, 1, 1, 12, 0, 0), **{"@timestamp": None}, vtm="2021-06-06T00:00:00Z"),
            Row(time=dt.datetime(2024, 1, 1, 12, 0, 0), **{"@timestamp": None}, vtm=None),
        ]
    )
    out = inject_timestamp(df, time_key="vtm").collect()
    assert out[0]["@timestamp"] == "2020-05-05T00:00:00Z"  # existing wins
    assert out[1]["@timestamp"] == "2021-06-06T00:00:00Z"  # then time_key
    assert out[2]["@timestamp"] == "2024-01-01T12:00:00.000000000Z"  # event time, ISO-9


def test_target_index_utc_rollover(spark):
    # 2013-01-01T07:59:59Z vs 08:00:01+09:00 ≡ 2012-12-31T23:00:01Z →
    # UTC day boundary must split indices (reference test :4749-4761)
    df = spark.createDataFrame(
        [
            Row(time=dt.datetime(2013, 1, 1, 7, 59, 59)),
            Row(time=dt.datetime(2012, 12, 31, 23, 0, 1)),
        ]
    )
    out = target_index(df, time_col="time").select("index_name").collect()
    assert out[0]["index_name"] == "logstash-2013.01.01"
    assert out[1]["index_name"] == "logstash-2012.12.31"


def test_target_index_key_and_lowercase(spark):
    df = spark.createDataFrame(
        [Row(time=dt.datetime(2024, 1, 1), idx_key="MyIndex"), Row(time=dt.datetime(2024, 1, 1), idx_key=None)]
    )
    out = target_index(df, time_col="time", target_index_key="idx_key")
    rows = out.collect()
    assert rows[0]["index_name"] == "myindex"  # forced lower (rb:1012-1015)
    assert rows[1]["index_name"] == "logstash-2024.01.01"
    assert "idx_key" not in out.columns  # key consumed (rb:1004)


def test_flatten_struct(spark):
    df = spark.createDataFrame(
        [Row(a=1, nested=Row(x=2, deep=Row(y=3)), arr=[1, 2])]
    )
    out = flatten_struct_df(df)
    assert set(out.columns) == {"a", "nested_x", "nested_deep_y", "arr"}
    r = out.collect()[0]
    assert r["nested_deep_y"] == 3 and r["arr"] == [1, 2]  # arrays pass through


def test_nested_accessor_and_meta(spark):
    df = spark.createDataFrame([Row(request_id="42", nested=Row(request_id="99", routing_id="rr"))])
    out = extract_meta(df, id_key="$.nested.request_id", routing_key="$['nested']['routing_id']")
    r = out.collect()[0]
    assert r["doc_id"] == "99" and r["routing"] == "rr"
    out2 = extract_meta(df, id_key="request_id")
    assert out2.collect()[0]["doc_id"] == "42"


def test_remove_keys_and_tag(spark):
    df = spark.createDataFrame([Row(a=1, b=2, c=3)])
    out = remove_keys(inject_tag(df, "my.tag"), ["b", "c"])
    assert set(out.columns) == {"a", "tag"}
    assert out.collect()[0]["tag"] == "my.tag"


def test_placeholder_expansion(spark):
    df = spark.createDataFrame(
        [Row(tag="app.web.prod", time=dt.datetime(2024, 3, 9, 1, 2, 3), env="eu")]
    )
    col = expand_placeholders("logs-${tag_parts[1]}-${env}-%Y%m%d", tag_col="tag", time_col="time")
    assert df.select(col.alias("x")).collect()[0]["x"] == "logs-web-eu-20240309"
    col2 = expand_placeholders("${tag}")
    assert df.select(col2.alias("x")).collect()[0]["x"] == "app.web.prod"


def test_parse_time_quarantine(spark):
    df = spark.createDataFrame(
        [Row(t="2024-01-01T00:00:00"), Row(t="not-a-time"), Row(t="1700000000.5")]
    )
    ok, bad = parse_time_with_quarantine(df, "t")
    assert ok.count() == 2 and bad.count() == 1
    assert bad.collect()[0]["t"] == "not-a-time"
