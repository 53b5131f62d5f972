"""Percolate (reverse search) + significant_text: semantics vs brute
force and the DuckDB mirror."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from fluent_plugin_elasticsearch_spark.operators.percolate import (
    make_query_registry,
    percolate,
    percolate_sql,
)
from fluent_plugin_elasticsearch_spark.plans.aggs import compile_aggs

TEXTS = [
    "error disk full on node seven",
    "login success for user alpha",
    "error timeout connecting upstream",
    "disk usage warning on node two",
    "user beta login failure password",
    "all systems nominal",
]

QUERIES = [
    (1, ["error"], 1),                    # any error
    (2, ["disk", "node"], 2),             # AND: disk AND node
    (3, ["login", "failure", "password"], 2),  # 2 of 3
    (4, ["nonexistentterm"], 1),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS)])


def test_percolate_matches_brute_force(spark, docs):
    reg = make_query_registry(spark, QUERIES)
    got = {(r["doc_id"], r["query_id"]) for r in percolate(docs, reg).collect()}
    want = set()
    for i, t in enumerate(TEXTS):
        toks = set(t.split())
        for qid, terms, msm in QUERIES:
            if len(set(terms) & toks) >= msm:
                want.add((i, qid))
    assert got == want
    assert (0, 1) in got and (3, 2) in got and (4, 3) in got
    assert all(q != 4 for _, q in got)


def test_percolate_matches_sql(spark, docs):
    reg = make_query_registry(spark, QUERIES)
    got = [(r["doc_id"], r["query_id"], r["n_matched"])
           for r in percolate(docs, reg).collect()]
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    want = [(int(a), int(b), int(c))
            for a, b, c in con.sql(percolate_sql("docs", QUERIES)).fetchall()]
    assert got == want


def test_significant_text_surfaces_error_vocab(spark, docs):
    out = compile_aggs(docs, {
        "query": {"prefix": {"text": "error"}},
        "aggs": {"sig": {"significant_text": {"field": "text", "size": 5,
                                              "min_doc_count": 1}}},
    })
    rows = out["sig"].collect()
    keys = [r["key"] for r in rows]
    assert "error" in keys  # the foreground-defining token dominates
    top = rows[0]
    # 'error' appears in all fg docs (2/2) and 2/6 bg docs
    assert top["key"] == "error" and top["doc_count"] == 2 and top["bg_count"] == 2
    for r in rows:
        assert r["doc_count"] / 2 > r["bg_count"] / 6


def test_percolate_stream_alerts_per_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    b1 = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(TEXTS[:3])])
    b1.write.mode("append").parquet(src)
    reg = make_query_registry(spark, QUERIES)
    from fluent_plugin_elasticsearch_spark.operators.percolate import percolate_stream

    seen: list[tuple[int, int]] = []

    def sink(matches, batch_id):
        seen.extend((r["doc_id"], r["query_id"]) for r in matches.collect())

    stream = spark.readStream.schema(b1.schema).parquet(src)
    q = percolate_stream(stream, reg, sink, str(tmp_path / "ckpt"))
    q.processAllAvailable()
    assert (0, 1) in seen and (2, 1) in seen  # errors in batch 1 alert
    n1 = len(seen)
    spark.createDataFrame(
        [Row(doc_id=10 + i, text=t) for i, t in enumerate(TEXTS[3:])]
    ).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()
    assert (13, 2) not in seen  # doc 13 = 'all systems nominal': no match
    assert (10, 2) in seen      # disk+node doc in batch 2
    assert len(seen) > n1


def test_percolate_query_clause(spark):
    """AST route: one inline document against the registry — a pure
    registry filter (no join/exchange in the plan)."""
    from fluent_plugin_elasticsearch_spark.operators.percolate import (
        make_query_registry,
    )
    from fluent_plugin_elasticsearch_spark.plans.query_ast import (
        UnsupportedQuery,
        compile_query,
    )

    reg = make_query_registry(spark, [
        (1, ["alpha", "beta"], 2), (2, ["alpha"], 1), (3, ["gamma"], 1)])
    out = compile_query(reg, {"query": {"percolate": {
        "document": {"text": "alpha beta delta"}}}})
    assert [(r["query_id"], r["matched_terms"]) for r in out.collect()] \
        == [(1, 2), (2, 1)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    with pytest.raises(UnsupportedQuery, match="inline"):
        compile_query(reg, {"query": {"percolate": {}}})
    with pytest.raises(UnsupportedQuery, match="registry"):
        compile_query(reg.drop("msm"), {"query": {"percolate": {
            "document": {"text": "alpha"}}}})


def test_percolate_ranged_filter_context(spark):
    import duckdb
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.percolate import (
        make_ranged_registry,
        percolate_ranged,
        percolate_ranged_sql,
    )

    docs = spark.createDataFrame([
        Row(doc_id=0, text="error disk full", value=9.0),
        Row(doc_id=1, text="error disk full", value=2.0),
        Row(doc_id=2, text="ok all good", value=99.0),
        Row(doc_id=3, text="error cpu hot", value=5.0),
    ])
    qs = [
        (1, ["error"], 1, "value", 5.0, None),       # error AND value>=5
        (2, ["disk", "full"], 2, None, None, None),  # plain match
        (3, ["error"], 1, "value", None, 3.0),       # error AND value<=3
        (4, ["ok"], 1, "doc_id", 0.0, 1.0),          # never (doc 2 is id 2)
    ]
    reg = make_ranged_registry(spark, qs)
    got = [(r["doc_id"], r["query_id"]) for r in
           percolate_ranged(docs, reg, ["value", "doc_id"]).collect()]
    assert got == [(0, 1), (0, 2), (1, 2), (1, 3), (3, 1)]
    # DuckDB mirror identical
    con = duckdb.connect()
    con.register("t", docs.toPandas())
    want = [(r[0], r[1]) for r in
            con.sql(percolate_ranged_sql("t", qs)).fetchall()]
    assert want == got
