"""ES SQL API subset (operators/es_sql.py): the translated DataFrame
plan must equal DuckDB running the IDENTICAL statement (the subset is
ANSI), and MATCH()/SCORE() must equal the engine's own BM25 scorer."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from fluent_plugin_elasticsearch_spark.operators import bm25
from fluent_plugin_elasticsearch_spark.operators.es_sql import es_sql_query
from fluent_plugin_elasticsearch_spark.plans.query_ast import UnsupportedQuery

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a quick brown cat sits on the mat",
    "spark engines merge sorted partitions quickly",
    "the lazy dog sleeps all day in the sun",
    "quick quick quick repetition here",
    "merge partition merge partition merge",
    "wholly unrelated content about gardening roses",
    "fox and dog are friends in the park",
]


@pytest.fixture(scope="module")
def docs(spark):
    rows = [Row(doc_id=i, text=t, lang=["en", "fr"][i % 2], n_chars=len(t))
            for i, t in enumerate(TEXTS)]
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def duck(docs):
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    return con


def _same(spark_df, con, sql):
    got = sorted(tuple(r) for r in spark_df.collect())
    want = sorted(tuple(r) for r in con.sql(sql).fetchall())
    assert got == want


def _same_ordered(spark_df, con, sql):
    got = [tuple(r) for r in spark_df.collect()]
    want = [tuple(r) for r in con.sql(sql).fetchall()]
    assert got == want


def test_es_sql_ansi_statements_match_duckdb(spark, docs, duck):
    stmts_ordered = [
        "SELECT doc_id, n_chars FROM docs WHERE lang = 'en' "
        "ORDER BY n_chars DESC, doc_id ASC LIMIT 3",
        "SELECT doc_id, n_chars + 1 AS np FROM docs "
        "WHERE n_chars BETWEEN 30 AND 45 ORDER BY doc_id",
        "SELECT doc_id FROM docs WHERE text LIKE '%quick%' "
        "AND NOT lang = 'fr' ORDER BY doc_id",
        "SELECT doc_id FROM docs WHERE doc_id IN (1, 3, 5) ORDER BY doc_id",
        "SELECT lang, COUNT(*) AS n, SUM(n_chars) AS c, MAX(n_chars) AS mx "
        "FROM docs GROUP BY lang ORDER BY lang",
        "SELECT lang, COUNT(DISTINCT n_chars) AS u FROM docs "
        "GROUP BY lang ORDER BY lang",
        "SELECT doc_id, LENGTH(text) AS l FROM docs "
        "WHERE LOWER(lang) = 'en' ORDER BY l DESC, doc_id LIMIT 4",
    ]
    for s in stmts_ordered:
        _same_ordered(es_sql_query({"docs": docs}, s), duck, s)
    _same(es_sql_query({"docs": docs}, "SELECT * FROM docs"), duck,
          "SELECT * FROM docs")


def test_es_sql_having_over_aliases(spark, docs, duck):
    s = ("SELECT lang, COUNT(*) AS n FROM docs GROUP BY lang "
         "HAVING n > 3 ORDER BY lang")
    out = es_sql_query({"docs": docs}, s)
    _same_ordered(out, duck, "SELECT lang, COUNT(*) AS n FROM docs "
                             "GROUP BY lang HAVING COUNT(*) > 3 "
                             "ORDER BY lang")


def test_es_sql_match_score_equals_bm25(spark, docs):
    out = es_sql_query(
        {"docs": docs},
        "SELECT doc_id, SCORE() AS score_u FROM docs "
        "WHERE MATCH(text, 'quick fox') "
        "ORDER BY SCORE() DESC, doc_id ASC LIMIT 5")
    got = [(r["doc_id"], r["score_u"]) for r in out.collect()]
    want = [(r["doc_id"], r["score_u"])
            for r in bm25.bm25_topk_df(docs, ["quick", "fox"], k=5).collect()]
    assert got == want
    # MATCH composes with ordinary predicates
    out2 = es_sql_query(
        {"docs": docs},
        "SELECT doc_id FROM docs WHERE MATCH(text, 'quick') "
        "AND lang = 'en' ORDER BY doc_id")
    assert [r["doc_id"] for r in out2.collect()] == [0, 4]


def test_es_sql_raises_outside_subset(spark, docs):
    bad = [
        "SELECT * FROM docs JOIN other ON x = y",
        "SELECT * FROM (SELECT 1)",
        "SELECT doc_id FROM docs WHERE MATCH(text, 'a') OR MATCH(text, 'b')",
        "SELECT SCORE() AS s FROM docs",
        "SELECT lang, SUM(DISTINCT n_chars) AS s FROM docs GROUP BY lang",
        "SELECT n_chars FROM docs HAVING n_chars > 1",
        "SELECT * FROM nope",
        "SELECT rank() FROM docs",
        "SELECT doc_id FROM docs LIMIT 1.5",
    ]
    for s in bad:
        with pytest.raises(UnsupportedQuery):
            es_sql_query({"docs": docs}, s)
