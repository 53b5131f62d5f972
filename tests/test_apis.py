"""Diagnostic APIs (_analyze, _termvectors, _explain, _count,
_cat/indices): brute-force and cross-operator consistency checks."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from fluent_plugin_elasticsearch_spark.operators import apis


@pytest.fixture(scope="module")
def docs(spark):
    texts = ["the cat sat on the mat", "the dog", "cat dog cat", "mat mat mat the"]
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_analyze(spark):
    rows = apis.analyze(spark, "The CAT, sat!").collect()
    assert [(r["token"], r["position"]) for r in rows] == [
        ("the", 0), ("cat", 1), ("sat", 2)]


def test_termvectors(docs):
    rows = {r["term"]: r for r in apis.termvectors(docs, 2).collect()}
    assert rows["cat"]["term_freq"] == 2
    assert rows["cat"]["doc_freq"] == 2   # docs 0 and 2
    assert rows["cat"]["ttf"] == 3        # 1 + 2 occurrences corpus-wide
    assert rows["dog"]["term_freq"] == 1 and rows["dog"]["doc_freq"] == 2


def test_explain_sums_to_score(docs):
    from fluent_plugin_elasticsearch_spark.operators.bm25 import bm25_scores_df

    terms = ["cat", "mat", "the"]
    scores = {r["doc_id"]: r["score_u"]
              for r in bm25_scores_df(docs, terms).collect()}
    for did in (0, 3):
        parts = apis.explain(docs, did, terms).collect()
        # contributions quantized per term; the pipeline quantizes the SUM —
        # compare at a 1-per-term slack from per-term flooring
        total = sum(r["contrib_u"] for r in parts)
        assert abs(total - scores[did]) <= len(parts)


def test_count(docs):
    assert apis.count(docs) == 4
    assert apis.count(docs, {"query": {"term": {"doc_id": 2}}}) == 1


def test_cat_indices(spark, index_dir):
    out = apis.cat_indices(spark, {"webtext": index_dir}).collect()
    assert len(out) == 1
    r = out[0]
    assert r["index"] == "webtext" and r["docs"] == 600
    assert r["shards"] == 4 and r["postings"] > 0 and r["store_bytes"] > 0


def test_msearch_order_aligned(docs):
    outs = apis.msearch(docs, [
        {"query": {"term": {"doc_id": 1}}},
        {"query": {"match_all": {}}, "size": 2, "sort": [{"doc_id": "asc"}]},
        {"query": {"regexp": {"text": ".*cat.*"}}},
    ])
    assert outs[0].count() == 1
    assert [r["doc_id"] for r in outs[1].collect()] == [0, 1]
    assert outs[2].count() == 2  # docs 0 and 2 contain 'cat'


def test_rank_eval_metrics(spark):
    """All four _rank_eval metrics against hand-computed values on a
    crafted corpus where the ranking is fully determined."""
    import math

    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.apis import rank_eval

    docs = spark.createDataFrame(
        [Row(doc_id=i, grp="a", ordv=i) for i in range(10)])
    req = [{"id": "q", "request": {"query": {"term": {"grp": "a"}},
                                   "sort": [{"ordv": "asc"}]},
            "ratings": [{"_id": 0, "rating": 0}, {"_id": 1, "rating": 2},
                        {"_id": 3, "rating": 3}, {"_id": 9, "rating": 1}]}]
    # hits (k=4): docs 0,1,2,3 -> rated [0, 2, None, 3]

    def run(metric):
        return rank_eval(docs, req, metric).collect()[0]

    p = run({"precision": {"k": 4, "relevant_rating_threshold": 2}})
    assert (p["metric_u"], p["unrated_docs"]) == (500000, 1)  # 2 of 4
    r = run({"recall": {"k": 4, "relevant_rating_threshold": 2}})
    assert r["metric_u"] == 1000000  # both rating>=2 docs retrieved
    m = run({"mean_reciprocal_rank": {"k": 4}})
    assert m["metric_u"] == 500000  # first relevant at rank 2
    d = run({"dcg": {"k": 4}})
    want_u = (math.floor((2**0 - 1) / math.log2(2) * 1e9)
              + math.floor((2**2 - 1) / math.log2(3) * 1e9)
              + math.floor((2**3 - 1) / math.log2(5) * 1e9))
    assert d["metric_u"] == math.floor(want_u / 1e9 * 1e6)
    nd = run({"dcg": {"k": 4, "normalize": True}})
    ideal_u = (math.floor((2**3 - 1) / math.log2(2) * 1e9)
               + math.floor((2**2 - 1) / math.log2(3) * 1e9)
               + math.floor((2**1 - 1) / math.log2(4) * 1e9)
               + math.floor((2**0 - 1) / math.log2(5) * 1e9))
    assert nd["metric_u"] == math.floor(want_u / ideal_u * 1e6)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="metric"):
        run({"nope": {}})


def test_reindex_filter_pipeline_optypes(spark, tmp_path):
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.apis import reindex
    from fluent_plugin_elasticsearch_spark.plans.query_ast import (
        UnsupportedQuery,
    )
    from fluent_plugin_elasticsearch_spark.sinks.cow_table import CowTable

    src = spark.createDataFrame([
        Row(doc_id=i, text=f"doc {i}", lang=["en", "fr"][i % 2])
        for i in range(10)])
    dest = CowTable(spark, str(tmp_path / "t"), id_col="doc_id",
                    n_buckets=4)
    stats = reindex(src, dest, {
        "source": {"query": {"term": {"lang": "en"}}},
        "pipeline": [{"set": {"field": "env", "value": "re"}},
                     {"uppercase": {"field": "lang"}}]})
    assert stats == {"total": 5, "created": 5, "updated": 0}
    rows = {r["doc_id"]: r for r in dest.read().collect()}
    assert set(rows) == {0, 2, 4, 6, 8}
    assert rows[0]["lang"] == "EN" and rows[0]["env"] == "re"
    # op_type create: existing ids skipped, new ones land
    from pyspark.sql import functions as F

    src2 = src.withColumn("env", F.lit("x")).withColumn(
        "lang", F.upper("lang"))
    stats2 = reindex(src2, dest, {"dest": {"op_type": "create"}})
    assert stats2 == {"total": 10, "created": 5, "updated": 0}
    rows = {r["doc_id"]: r for r in dest.read().collect()}
    assert len(rows) == 10 and rows[0]["env"] == "re"  # not clobbered
    # default index op_type overwrites
    stats3 = reindex(src2, dest, {"max_docs": 3})
    assert stats3 == {"total": 3, "created": 0, "updated": 3}
    assert {r["doc_id"]: r["env"] for r in dest.read().collect()}[0] == "x"
    with pytest.raises(UnsupportedQuery, match="pipeline"):
        reindex(src, dest, {"script": {"source": "ctx.x = 1"}})


def test_downsample(spark):
    import datetime as dt

    from fluent_plugin_elasticsearch_spark.operators.apis import downsample
    from fluent_plugin_elasticsearch_spark.plans.query_ast import (
        UnsupportedQuery,
    )

    rows = [Row(ts=dt.datetime(2024, 1, 1, 10, 0) + dt.timedelta(minutes=m),
                host=h, cpu=(float(v) if v is not None else None))
            for m, h, v in [(1, "a", 10), (2, "a", 30), (61, "a", 50),
                            (1, "b", 5), (2, "b", None)]]
    df = spark.createDataFrame(rows)
    out = downsample(df, "1h", ["host"], ["cpu"])
    got = {(r["@timestamp"].hour, r["host"]):
           (r["_doc_count"], r["cpu_min"], r["cpu_max"], r["cpu_sum"],
            r["cpu_value_count"]) for r in out.collect()}
    assert got[(10, "a")] == (2, 10.0, 30.0, 40.0, 2)
    assert got[(11, "a")] == (1, 50.0, 50.0, 50.0, 1)
    assert got[(10, "b")] == (2, 5.0, 5.0, 5.0, 1)  # null metric skipped
    with pytest.raises(UnsupportedQuery, match="fixed_interval"):
        downsample(df, "90m", ["host"], ["cpu"])


def test_terms_enum(spark, docs, index_dir):
    from fluent_plugin_elasticsearch_spark.operators.search import (
        InvertedIndex,
    )

    # fallback path: df is DOC frequency (repeats within a doc count
    # once), output term-ascending
    out = [(r["term"], r["df"])
           for r in apis.terms_enum(docs, "text", string="").collect()]
    assert out == [("cat", 2), ("dog", 2), ("mat", 2),
                   ("on", 1), ("sat", 1), ("the", 3)]
    assert [(r["term"], r["df"]) for r in
            apis.terms_enum(docs, "text", string="ca").collect()] == [
        ("cat", 2)]
    # case_insensitive lowercases the probe to match the dictionary
    assert [r["term"] for r in
            apis.terms_enum(docs, "text", string="CA",
                            case_insensitive=True).collect()] == ["cat"]
    assert apis.terms_enum(docs, "text", string="zz").collect() == []
    # index path: same contract served from the term dictionary
    idx = InvertedIndex(spark, index_dir)
    got = [r["term"] for r in
           apis.terms_enum(None, "text", string="t", size=5,
                           index=idx).collect()]
    want = sorted(r["term"] for r in
                  idx.term_stats().filter("term like 't%'").collect())[:5]
    assert got == want


def test_mtermvectors_matches_per_doc_termvectors(spark, docs):
    from fluent_plugin_elasticsearch_spark.operators import apis

    multi = apis.mtermvectors(docs, doc_ids=[0, 2]).collect()
    for did in (0, 2):
        single = [(r["term"], r["term_freq"], r["doc_freq"], r["ttf"])
                  for r in apis.termvectors(docs, doc_id=did).collect()]
        got = [(r["term"], r["term_freq"], r["doc_freq"], r["ttf"])
               for r in multi if r["doc_id"] == did]
        assert got == single
    # unknown ids simply contribute no rows
    assert apis.mtermvectors(docs, doc_ids=[999]).count() == 0


def test_completion_suggest_weight_ranked(spark):
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.apis import (
        completion_suggest,
    )

    sugg = spark.createDataFrame([
        Row(input="spark", weight=10, doc_id=1),
        Row(input="spark", weight=50, doc_id=2),
        Row(input="spawn", weight=30, doc_id=3),
        Row(input="scala", weight=50, doc_id=4),
        Row(input="merge", weight=99, doc_id=5),
    ])
    out = [(r["input"], r["weight"], r["doc_id"]) for r in
           completion_suggest(sugg, "sp", size=10).collect()]
    # weight desc, input asc, doc_id asc; 'merge'/'scala' excluded by prefix
    assert out == [("spark", 50, 2), ("spawn", 30, 3), ("spark", 10, 1)]
    dedup = [(r["input"], r["weight"], r["doc_id"]) for r in
             completion_suggest(sugg, "s", size=10,
                                skip_duplicates=True).collect()]
    # best entry per input survives; weight ties break by input asc
    assert dedup == [("scala", 50, 4), ("spark", 50, 2), ("spawn", 30, 3)]
    assert completion_suggest(sugg, "zz", size=3).count() == 0


def test_async_search_submit_get_delete(spark):
    import time

    import pytest as _pytest

    from fluent_plugin_elasticsearch_spark.operators.apis import (
        AsyncSearch,
        AsyncSearchNotFound,
    )

    a = AsyncSearch(spark)
    # fast search completes and keeps its result until deleted
    fast = a.submit(spark.range(100).selectExpr("sum(id) AS s"))
    got = a.get(fast, wait_for_completion_timeout=60)
    assert got["is_partial"] is False and got["rows"][0]["s"] == 4950
    st = a.status(fast)
    assert st["is_running"] is False and st["failed"] is False
    # a second get still returns (keep_on_completion)
    assert a.get(fast)["rows"][0]["s"] == 4950

    # slow search: still running at first poll, then cancelled by delete
    def _sleepy(batches):
        for b in batches:
            time.sleep(30)
            yield b

    slow_df = spark.range(64).repartition(8).mapInPandas(
        _sleepy, "id long")
    slow = a.submit(slow_df)
    time.sleep(2)
    assert a.status(slow)["is_running"] is True
    assert a.get(slow, wait_for_completion_timeout=0.5)["is_partial"] is True
    a.delete(slow)
    with _pytest.raises(AsyncSearchNotFound):
        a.status(slow)
    # failed searches report failed=True and re-raise on get — the
    # failure must be an EXECUTION-time one (analysis errors raise at
    # plan construction, before submit)
    def _boom(batches):
        raise RuntimeError("shard failure")
        yield  # pragma: no cover

    bad = a.submit(spark.range(2).mapInPandas(_boom, "id long"))
    with _pytest.raises(Exception):
        a.get(bad, wait_for_completion_timeout=60)
    assert a.status(bad)["failed"] is True
    a.shutdown()


def test_termvectors_positions(spark, docs):
    from fluent_plugin_elasticsearch_spark.operators import apis

    out = {r["term"]: (r["term_freq"], r["positions"]) for r in
           apis.termvectors(docs, doc_id=0, positions=True).collect()}
    # doc 0: "the cat sat on the mat"
    assert out["the"] == (2, [1, 5])
    assert out["cat"] == (1, [2])
    assert out["mat"] == (1, [6])
    assert all(p == sorted(p) for _, p in out.values())
    # stats columns unchanged vs the positions-less form
    plain = {r["term"]: (r["term_freq"], r["doc_freq"], r["ttf"]) for r in
             apis.termvectors(docs, doc_id=0).collect()}
    got = {r["term"]: (r["term_freq"], r["doc_freq"], r["ttf"]) for r in
           apis.termvectors(docs, doc_id=0, positions=True).collect()}
    assert got == plain
