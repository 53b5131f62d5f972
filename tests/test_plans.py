"""Physical-plan assertions: the plans we designed for are the plans
Catalyst actually produces (pushdown, broadcast, no spurious exchanges)."""

import pytest
from pyspark.sql import functions as F

from fluent_plugin_elasticsearch_spark.operators.bm25 import bm25_topk_df
from fluent_plugin_elasticsearch_spark.operators.search import InvertedIndex


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_postings_term_filter_pushdown(spark, index_dir):
    idx = InvertedIndex(spark, index_dir)
    blocks = idx.postings().filter(F.col("term").isin(["the", "of"]))
    plan = plan_of(blocks)
    assert "PushedFilters" in plan and "In(term" in plan
    # column pruning: binary payloads only read when selected
    slim = plan_of(idx.postings().filter(F.col("term") == "the").select("term", "n_docs"))
    assert "docs_enc" not in slim.split("ReadSchema")[1][:200]


def test_bm25_df_broadcasts_small_sides(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = plan_of(bm25_topk_df(docs, ["data", "query"], 10))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_warm_search_has_single_stage_no_exchange(spark, index_dir):
    idx = InvertedIndex(spark, index_dir, cache_term_stats=True).warm()
    q = idx.search("the of", k=5, mode="exhaustive")
    plan = plan_of(q)
    assert "InMemoryTableScan" in plan
    # the only plan segment above the cached relation must be exchange-free:
    # cached partitioning (repartition by shard) satisfies the groupBy
    above_cache = plan.split("InMemoryTableScan")[0]
    assert "Exchange" not in above_cache, above_cache
    rows = q.collect()
    assert len(rows) == 5


def test_ids_query_uses_broadcast_semi_join(spark, index_dir):
    idx = InvertedIndex(spark, index_dir)
    some = [r["doc_id"] for r in idx.doc_stats().limit(3).collect()]
    plan = plan_of(idx.ids_query(some))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
