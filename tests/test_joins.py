"""ES join-field queries (operators/joins.py): has_child / has_parent /
parent_id / children agg over a parent-child relation, vs brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_plugin_elasticsearch_spark.operators import joins as J

PARENTS = [(1, "open"), (2, "closed"), (3, "open"), (4, "open"), (5, "closed")]
CHILDREN = [  # (child_id, parent_id, kind, qty)
    (10, 1, "a", 5), (11, 1, "a", 7), (12, 1, "b", 1),
    (20, 2, "a", 2),
    (30, 3, "b", 9),
    (40, 4, "a", 4), (41, 4, "a", 6), (42, 4, "a", 8),
]


@pytest.fixture(scope="module")
def tables(spark):
    p = spark.createDataFrame([Row(pid=a, status=b) for a, b in PARENTS])
    c = spark.createDataFrame(
        [Row(cid=a, pid=b, kind=k, qty=q) for a, b, k, q in CHILDREN])
    return p, c


def test_has_child_min_max(tables):
    p, c = tables
    got = {r["pid"] for r in J.has_child(
        p, c, F.col("kind") == "a", "pid", "pid", min_children=2).collect()}
    assert got == {1, 4}
    got = {r["pid"] for r in J.has_child(
        p, c, F.col("kind") == "a", "pid", "pid",
        min_children=1, max_children=2).collect()}
    assert got == {1, 2}  # 4 has three 'a' children → excluded


def test_has_parent(tables):
    p, c = tables
    got = {r["cid"] for r in J.has_parent(
        p, c, F.col("status") == "closed", "pid", "pid").collect()}
    assert got == {20}  # parent 5 has no children


def test_parent_id_query(tables):
    _, c = tables
    got = {r["cid"] for r in J.parent_id_query(c, [1, 3], "pid").collect()}
    assert got == {10, 11, 12, 30}


def test_children_aggregation(tables):
    p, c = tables
    out = J.children_aggregation(
        p, c, F.col("status") == "open",
        [F.sum("qty").alias("qty_sum"), F.count(F.lit(1)).alias("n")],
        "pid", "pid")
    rows = {r["pid"]: (r["qty_sum"], r["n"]) for r in out.collect()}
    assert rows == {1: (13, 3), 3: (9, 1), 4: (18, 3)}


def test_terms_lookup(spark, tables):
    p, c = tables
    got = {r["cid"] for r in J.terms_lookup(
        c, p, "pid", "pid", F.col("status") == "closed").collect()}
    assert got == {20}  # children of closed parents (5 has none)
    allv = {r["cid"] for r in J.terms_lookup(c, p, "pid", "pid").collect()}
    assert allv == {r[0] for r in CHILDREN}
