"""ES simple_query_string (operators/simple_query): the lenient end-user
grammar the reference ships verbatim to ES (out_elasticsearch.rb
client.search), compiled to two corpus passes."""

from __future__ import annotations

import duckdb
import pytest

from fluent_plugin_elasticsearch_spark.operators.simple_query import (
    parse_simple_query_string,
    simple_query_string_df,
    simple_query_string_sql,
)
from fluent_plugin_elasticsearch_spark.plans.query_ast import (
    UnsupportedQuery,
    compile_query,
)

DOCS = [
    (1, "merge data merge fast table table scan"),
    (2, "data quick table slow join"),
    (3, "scanline merge data data"),
    (4, "table table table scandal"),
    (5, "quick brown fox"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _oracle(q, op, k=10):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    return [tuple(r) for r in con.execute(
        simple_query_string_sql("documents", q, k=k,
                                default_operator=op)).fetchall()]


def test_parse_structure():
    p = parse_simple_query_string('merge + data | "table table" -slow')
    assert p["groups"] == [[("term", "merge"), ("term", "data")],
                           [("phrase", ("table", "table"))]]
    assert p["negated"] == [("term", "slow")]
    # default_operator=and: whitespace joins the single AND group
    p = parse_simple_query_string("merge data", "and")
    assert p["groups"] == [[("term", "merge"), ("term", "data")]]
    # prefix, one-term phrase collapses to term
    p = parse_simple_query_string('sca* "merge"')
    assert p["groups"] == [[("prefix", "sca")], [("term", "merge")]]


def test_parse_raises_loudly():
    for bad in ["(a b)", "a ~2", "a\\b", "mid*dle", '"unbalanced']:
        with pytest.raises(UnsupportedQuery):
            parse_simple_query_string(bad)


@pytest.mark.parametrize("q,op", [
    ('merge + data | "table table" | sca* -slow', "or"),
    ("merge data", "and"),
    ("merge data", "or"),
    ('"table table"', "or"),
    ("-slow", "or"),            # pure negative: matches all, score 0
    ("sca* + merge", "or"),     # prefix inside an AND group
    ("zzznope | merge", "or"),  # dead alternative
])
def test_matches_duckdb_mirror(spark, docs, q, op):
    got = [(r.doc_id, r.score_u)
           for r in simple_query_string_df(docs, q, default_operator=op).collect()]
    assert got == _oracle(q, op)


def test_gate_and_negation_semantics(spark, docs):
    # "merge data" AND: docs 1,3 only (2 lacks merge, 4/5 lack both)
    got = {r.doc_id for r in
           simple_query_string_df(docs, "merge data", default_operator="and").collect()}
    assert got == {1, 3}
    # negation removes doc 2 (slow) from the data alternative
    got = {r.doc_id for r in
           simple_query_string_df(docs, "data -slow").collect()}
    assert got == {1, 3}
    # prefix sca* matches scan/scanline/scandal
    got = {r.doc_id for r in simple_query_string_df(docs, "sca*").collect()}
    assert got == {1, 3, 4}
    # phrase needs adjacency: "table table" in 1 and 4 (not "table slow")
    got = {r.doc_id for r in
           simple_query_string_df(docs, '"table table"').collect()}
    assert got == {1, 4}


def test_prefix_constant_score_and_phrase_pf(spark, docs):
    rows = {r.doc_id: r.score_u for r in
            simple_query_string_df(docs, "sca*").collect()}
    assert set(rows.values()) == {1_000_000}  # constant-score rewrite
    # higher phrase frequency ranks first: doc 4 has pf=2, doc 1 pf=1
    rows = [r.doc_id for r in
            simple_query_string_df(docs, '"table table"').collect()]
    assert rows[0] == 4


def test_ast_route_and_options(spark, docs):
    out = compile_query(docs, {"query": {"simple_query_string": {
        "query": "merge data", "default_operator": "AND"}}, "size": 5})
    assert {r.doc_id for r in out.collect()} == {1, 3}
    with pytest.raises(UnsupportedQuery, match="flags"):
        compile_query(docs, {"query": {"simple_query_string": {
            "query": "a", "flags": "PHRASE"}}})
    with pytest.raises(UnsupportedQuery, match="one field"):
        compile_query(docs, {"query": {"simple_query_string": {
            "query": "a", "fields": ["text", "source"]}}})


def test_two_scans_no_shuffle_before_topk(spark, docs):
    """Scale shape: the scoring pass is a pure projection — the plan
    contains no Exchange except the final top-k sort, and exactly two
    scans of the docs relation (stats + scoring)."""
    out = simple_query_string_df(docs, 'merge + data | "table table" | sca*')
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 2
    # the only exchange is the broadcast of the single stats row — no
    # shuffle exchange anywhere (top-k is TakeOrderedAndProject)
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
    assert "TakeOrderedAndProject" in plan
