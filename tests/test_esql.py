"""ES|QL pipe surface (operators/esql.py): every stage checked against
DuckDB running the equivalent SQL, plus the raise sites."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

from fluent_plugin_elasticsearch_spark.operators.esql import esql_query
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


def _same_ordered(spark_df, con, sql):
    got = [tuple(r) for r in spark_df.collect()]
    want = [tuple(r) for r in con.sql(sql).fetchall()]
    assert got == want


def test_esql_pipe_stages_match_duckdb(spark, docs, duck):
    out = esql_query({"docs": docs}, """
        FROM docs
        | WHERE n_chars > 25 AND lang == "en"
        | EVAL kchars = n_chars / 10, tag = lang
        | RENAME tag AS language
        | KEEP doc_id, kchars, language
        | SORT kchars DESC, doc_id ASC
        | LIMIT 3
    """)
    _same_ordered(out, duck, """
        SELECT doc_id, n_chars / 10 AS kchars, lang AS language
        FROM docs WHERE n_chars > 25 AND lang = 'en'
        ORDER BY kchars DESC, doc_id ASC LIMIT 3
    """)


def test_esql_stats_by(spark, docs, duck):
    out = esql_query({"docs": docs}, """
        FROM docs
        | STATS n = COUNT(*), total = SUM(n_chars), mx = MAX(n_chars) BY lang
        | SORT lang
    """)
    _same_ordered(out, duck, """
        SELECT lang, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total,
               MAX(n_chars) AS mx
        FROM docs GROUP BY lang ORDER BY lang
    """)
    # global stats (no BY)
    out2 = esql_query({"docs": docs},
                      "FROM docs | STATS n = COUNT(*)")
    assert out2.collect()[0]["n"] == len(TEXTS)


def test_esql_where_match_boolean(spark, docs):
    out = esql_query({"docs": docs}, '''
        FROM docs | WHERE MATCH(text, "quick fox") | KEEP doc_id
        | SORT doc_id
    ''')
    # any-token-present: docs containing 'quick' OR 'fox' (doc 2 has
    # only 'quickly' — tokens, not substrings)
    assert [r["doc_id"] for r in out.collect()] == [0, 1, 4, 7]
    out2 = esql_query({"docs": docs}, '''
        FROM docs | WHERE MATCH(text, "merge") AND lang == "fr"
        | KEEP doc_id | SORT doc_id
    ''')
    assert [r["doc_id"] for r in out2.collect()] == [5]
    out3 = esql_query({"docs": docs}, '''
        FROM docs | WHERE NOT MATCH(text, "the") | KEEP doc_id | SORT doc_id
    ''')
    assert [r["doc_id"] for r in out3.collect()] == [2, 4, 5, 6]


def test_esql_drop_and_multiline_strings(spark, docs):
    out = esql_query({"docs": docs},
                     'FROM docs | DROP text, n_chars | LIMIT 2')
    assert out.columns == ["doc_id", "lang"]


def test_esql_raises_outside_subset(spark, docs):
    bad = [
        "FROM nope | LIMIT 1",
        "docs | LIMIT 1",
        "FROM docs | LOOKUP j ON x",
        "FROM docs | ENRICH nope ON doc_id",
        "FROM docs | STATS COUNT(*) BY lang",
        "FROM docs | LIMIT 1.5",
        'FROM docs | WHERE SCORE() > 1',
        'FROM docs | WHERE MATCH(text, "")',
    ]
    for q in bad:
        with pytest.raises(UnsupportedQuery):
            esql_query({"docs": docs}, q)


def test_esql_dissect_and_mv_expand(spark):
    from pyspark.sql import Row as _Row

    logs = spark.createDataFrame([
        _Row(id=1, line="GET /index.html 200", tags=["a", "b"]),
        _Row(id=2, line="POST /api/v1 503", tags=["c"]),
    ])
    out = esql_query({"logs": logs}, '''
        FROM logs | DISSECT line "%{verb} %{path} %{status}"
        | KEEP id, verb, path, status | SORT id
    ''')
    rows = [tuple(r) for r in out.collect()]
    assert rows == [(1, "GET", "/index.html", "200"),
                    (2, "POST", "/api/v1", "503")]
    out2 = esql_query({"logs": logs}, '''
        FROM logs | MV_EXPAND tags | KEEP id, tags | SORT id, tags
    ''')
    assert [tuple(r) for r in out2.collect()] == [
        (1, "a"), (1, "b"), (2, "c")]
    with pytest.raises(UnsupportedQuery, match="no %"):
        esql_query({"logs": logs}, 'FROM logs | DISSECT line "nofields"')


def test_esql_grok_and_enrich(spark):
    from pyspark.sql import Row as _Row

    logs = spark.createDataFrame([
        _Row(id=1, line="GET /a 200 12.5ms from 10.0.0.1 INFO"),
        _Row(id=2, line="POST /b 503 999ms from 192.168.1.9 ERROR"),
    ])
    out = esql_query({"logs": logs}, '''
        FROM logs
        | GROK line "%{WORD:verb} %{NOTSPACE} %{INT:status} %{NUMBER:ms}ms from %{IP:ip} %{LOGLEVEL:lvl}"
        | KEEP id, verb, status, ms, ip, lvl | SORT id
    ''')
    assert [tuple(r) for r in out.collect()] == [
        (1, "GET", "200", "12.5", "10.0.0.1", "INFO"),
        (2, "POST", "503", "999", "192.168.1.9", "ERROR")]
    with pytest.raises(UnsupportedQuery, match="GROK pattern %"):
        esql_query({"logs": logs}, 'FROM logs | GROK line "%{NOPE:x}"')
    with pytest.raises(UnsupportedQuery, match="no named field"):
        esql_query({"logs": logs}, 'FROM logs | GROK line "%{WORD}"')

    users = spark.createDataFrame([
        _Row(uid=1, name="ada", tier="gold"),
        _Row(uid=2, name="bob", tier="free"),
    ])
    ev = spark.createDataFrame([
        _Row(eid=10, uid=1), _Row(eid=11, uid=2), _Row(eid=12, uid=9)])
    out2 = esql_query(
        {"ev": ev},
        'FROM ev | ENRICH users_policy ON uid WITH tier | SORT eid',
        enrich_policies={"users_policy": (users, "uid")})
    assert [(r["eid"], r["tier"]) for r in out2.collect()] == [
        (10, "gold"), (11, "free"), (12, None)]
    # the lookup side must broadcast — no shuffle of the main stream
    plan = out2._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(UnsupportedQuery, match="unknown enrich"):
        esql_query({"ev": ev}, 'FROM ev | ENRICH nope ON uid')


def test_esql_scalar_functions_and_case(spark, docs, duck):
    out = esql_query({"docs": docs}, '''
        FROM docs
        | EVAL head = SUBSTRING(text, 1, 5),
               tag = CASE(n_chars > 40, "long", n_chars > 30, "mid", "tiny"),
               full = CONCAT(lang, "-", head)
        | KEEP doc_id, head, tag, full | SORT doc_id
    ''')
    _same_ordered(out, duck, """
        SELECT doc_id, substring(text, 1, 5) AS head,
               CASE WHEN n_chars > 40 THEN 'long'
                    WHEN n_chars > 30 THEN 'mid' ELSE 'tiny' END AS tag,
               lang || '-' || substring(text, 1, 5) AS full
        FROM docs ORDER BY doc_id
    """)
    out2 = esql_query({"docs": docs}, '''
        FROM docs | WHERE STARTS_WITH(text, "the") | KEEP doc_id | SORT doc_id
    ''')
    assert [r["doc_id"] for r in out2.collect()] == [0, 3]
    with pytest.raises(UnsupportedQuery, match="SUBSTRING"):
        esql_query({"docs": docs},
                   "FROM docs | EVAL x = SUBSTRING(text, n_chars)")
    with pytest.raises(UnsupportedQuery, match="CASE"):
        esql_query({"docs": docs}, "FROM docs | EVAL x = CASE(doc_id)")


def test_esql_lookup_join(spark):
    from pyspark.sql import Row as _Row

    ev = spark.createDataFrame([
        _Row(eid=10, uid=1), _Row(eid=11, uid=2), _Row(eid=12, uid=9)])
    users = spark.createDataFrame([
        _Row(uid=1, tier="gold"), _Row(uid=2, tier="free")])
    out = esql_query({"ev": ev, "users": users},
                     'FROM ev | LOOKUP JOIN users ON uid | SORT eid')
    assert [(r["eid"], r["tier"]) for r in out.collect()] == [
        (10, "gold"), (11, "free"), (12, None)]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    with pytest.raises(UnsupportedQuery, match="unknown lookup"):
        esql_query({"ev": ev}, 'FROM ev | LOOKUP JOIN nope ON uid')
    with pytest.raises(UnsupportedQuery, match="no field"):
        esql_query({"ev": ev, "users": users},
                   'FROM ev | LOOKUP JOIN users ON eid')


def test_limit_rejects_trailing_tokens(spark):
    """ADVICE r6: 'LIMIT 5 extra' must raise like WHERE/EVAL do, not
    silently ignore the garbage."""
    from pyspark.sql import Row

    import pytest

    from fluent_plugin_elasticsearch_spark.operators.esql import esql_query
    from fluent_plugin_elasticsearch_spark.plans.query_ast import UnsupportedQuery

    df = spark.createDataFrame([Row(a=i) for i in range(10)])
    assert esql_query({"t": df}, "FROM t | LIMIT 5").count() == 5
    with pytest.raises(UnsupportedQuery):
        esql_query({"t": df}, "FROM t | LIMIT 5 extra").count()
