"""ES join-field queries — has_child / has_parent over a parent-child
relation (the ES `join` field type the reference's users model
order→lines, thread→messages with; forwarded verbatim like every query
body, in_elasticsearch.rb:94-99).

Spark-first mapping: the relation lives in two tables keyed by the
parent id, and the queries are semi-joins — which is exactly what ES's
global-ordinals join does per shard, except Catalyst gets to pick
broadcast vs shuffled-hash vs sort-merge from real sizes (a filtered
child side usually collapses to a broadcast). No doc-routing constraint
needed: co-location is the bucketing/partitioning of the two tables.

has_child(min_children/max_children) aggregates child match counts
before the semi-join — one partial-aggregated groupBy on the join key,
the same shuffle the join would need anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def has_child(parents: DataFrame, children: DataFrame, child_filter: Column,
              parent_key: str, child_key: str,
              min_children: int = 1, max_children: int | None = None) -> DataFrame:
    """Parents having ≥ min_children (and ≤ max_children, if given)
    children matching child_filter. ES has_child with score_mode=none.
    Plan: filter children (pushdown) → count per parent key → range filter
    → semi-join to parents (broadcast when the matched-parent set is
    small, which is the common case)."""
    counts = (
        children.filter(child_filter)
        .groupBy(F.col(child_key).alias(parent_key))
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= min_children)
    )
    if max_children is not None:
        counts = counts.filter(F.col("__n") <= max_children)
    return parents.join(counts.select(parent_key), parent_key, "left_semi")


def has_parent(parents: DataFrame, children: DataFrame, parent_filter: Column,
               parent_key: str, child_key: str) -> DataFrame:
    """Children whose parent matches parent_filter. ES has_parent with
    score=false. Plan: filter parents (pushdown) → semi-join children on
    the join key; a selective parent filter broadcasts."""
    matched = parents.filter(parent_filter).select(
        F.col(parent_key).alias(child_key))
    return children.join(matched, child_key, "left_semi")


def parent_id_query(children: DataFrame, parent_ids: list,
                    child_key: str) -> DataFrame:
    """ES parent_id query: children of the given parent ids — an IN
    filter on the join key, pushed into the scan."""
    return children.filter(F.col(child_key).isin(list(parent_ids)))


def children_aggregation(parents: DataFrame, children: DataFrame,
                         parent_filter: Column, agg_cols: list[Column],
                         parent_key: str, child_key: str) -> DataFrame:
    """ES `children` agg under a parent query: metrics over the children
    of matching parents, grouped by parent. One semi-join + one
    partial-aggregated groupBy on the join key."""
    matched = parents.filter(parent_filter).select(parent_key)
    # no forced broadcast: AQE downgrades the semi-join to broadcast when
    # the filtered parent set is actually small — forcing it would be a
    # scale hazard for unselective filters
    kids = children.join(
        matched.withColumnRenamed(parent_key, child_key), child_key, "left_semi")
    return kids.groupBy(F.col(child_key).alias(parent_key)).agg(*agg_cols)


def terms_lookup(docs: DataFrame, lookup: DataFrame, field: str,
                 lookup_col: str, lookup_filter: Column | None = None) -> DataFrame:
    """ES terms-lookup query: the terms list comes from ANOTHER index
    (``{"terms": {"field": {"index": ..., "path": ...}}}``) instead of
    the request body — ES fetches the referenced doc's values and
    rewrites to a terms filter. Spark-first: a semi-join against the
    lookup table's (optionally filtered, deduped) column — Catalyst
    broadcasts the lookup side when small (the ES case: lookup lists cap
    at 65k terms), and the semi-join pushes nothing back to the driver."""
    src = lookup
    if lookup_filter is not None:
        src = src.filter(lookup_filter)
    vals = src.select(F.col(lookup_col).alias(field)).distinct()
    return docs.join(vals, field, "left_semi")
