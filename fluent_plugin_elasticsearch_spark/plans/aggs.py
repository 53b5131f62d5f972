"""ES aggregations-body compiler (the `aggs` half of the search API the
reference forwards to the cluster) → Catalyst group-bys.

Supported (the shapes log/analytics users actually send through the
plugin):

    {"terms": {"field": f, "size": n}}                     bucket by value
    {"date_histogram": {"field": ts, "calendar_interval": u}}  u ∈ second…year
    {"histogram": {"field": v, "interval": w}}             numeric buckets
    {"stats"|"avg"|"min"|"max"|"sum"|"value_count": {"field": v}}  metrics
    + ONE nesting level: a bucket agg may carry "aggs" of metric aggs
      (ES sub-aggregations), compiled into the same groupBy.

Buckets are ordered ES-style: doc_count desc, key asc; `size` applies
LIMIT. Everything compiles to scan → filter (the body's `query` via
query_ast) → hash aggregate: partial aggregation, pushdown, AQE all come
free, and the shuffle key is the bucket key — the same plan shape at any
corpus size.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .query_ast import UnsupportedQuery, _compile_clause

_CAL = {
    "second": "second", "minute": "minute", "hour": "hour", "day": "day",
    "week": "week", "month": "month", "quarter": "quarter", "year": "year",
    "1s": "second", "1m": "minute", "1h": "hour", "1d": "day",
    "1w": "week", "1M": "month", "1q": "quarter", "1y": "year",
}

_METRICS = {
    "avg": F.avg, "min": F.min, "max": F.max, "sum": F.sum,
    "value_count": F.count,
}


def _bucket_key(kind: str, spec: dict[str, Any]) -> Column:
    field = spec["field"]
    if kind == "terms":
        return F.col(field)
    if kind == "date_histogram":
        unit = spec.get("calendar_interval") or spec.get("fixed_interval")
        if unit not in _CAL:
            raise UnsupportedQuery(f"unsupported interval: {unit}")
        return F.date_trunc(_CAL[unit], F.col(field))
    if kind == "histogram":
        w = float(spec["interval"])
        return (F.floor(F.col(field) / w) * w)
    raise UnsupportedQuery(f"unsupported bucket agg: {kind}")


ES_DEFAULT_PERCENTS = [1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0]


def _metric_cols(aggs: dict[str, Any]) -> list[Column]:
    cols: list[Column] = []
    for name, spec in aggs.items():
        ((kind, body),) = spec.items()
        field = body["field"]
        if kind == "percentiles":
            # exact linear-interpolation percentiles (identical to DuckDB's
            # quantile_cont — cross-engine-verified). ES itself serves
            # t-digest APPROXIMATIONS; pass approximate=True for Spark's
            # percentile_approx when an exact global sort-agg is too much.
            percents = body.get("percents", ES_DEFAULT_PERCENTS)
            fn = "percentile_approx" if body.get("approximate") else "percentile"
            extra = ", 10000" if body.get("approximate") else ""
            for p in percents:
                label = f"{float(p):g}".replace(".", "_")  # 50 → '50', 99.9 → '99_9'
                cols.append(
                    F.expr(f"{fn}({field}, {float(p) / 100.0}{extra})").alias(f"{name}_p{label}")
                )
        elif kind == "cardinality":
            # ES cardinality is an HLL approximation; approximate=True maps
            # to approx_count_distinct (HLL++), default is exact countDistinct
            if body.get("approximate"):
                cols.append(F.approx_count_distinct(field).alias(name))
            else:
                cols.append(F.countDistinct(field).alias(name))
        elif kind == "stats":
            cols += [
                F.count(field).alias(f"{name}_count"),
                F.min(field).alias(f"{name}_min"),
                F.max(field).alias(f"{name}_max"),
                F.sum(field).alias(f"{name}_sum"),
                F.avg(field).alias(f"{name}_avg"),
            ]
        elif kind in _METRICS:
            cols.append(_METRICS[kind](field).alias(name))
        else:
            raise UnsupportedQuery(f"unsupported sub-agg: {kind}")
    return cols


def compile_aggs(docs: DataFrame, body: dict[str, Any]) -> dict[str, DataFrame]:
    """Compile the body's `aggs` over docs (after its `query` filter).
    Returns {agg_name: DataFrame} — bucket aggs yield (key, doc_count,
    <sub-metrics...>) ordered (doc_count desc, key asc); top-level metric
    aggs yield a single row."""
    out: dict[str, DataFrame] = {}
    base = docs
    query = body.get("query")
    if query:
        base = base.filter(_compile_clause(query))
    for name, spec in (body.get("aggs") or {}).items():
        sub = spec.get("aggs")
        ((kind, inner),) = ((k, v) for k, v in spec.items() if k != "aggs")
        if kind in ("terms", "date_histogram", "histogram"):
            key = _bucket_key(kind, inner).alias("key")
            aggs_cols = [F.count(F.lit(1)).alias("doc_count")]
            if sub:
                aggs_cols += _metric_cols(sub)
            df = base.groupBy(key).agg(*aggs_cols)
            df = df.orderBy(F.desc("doc_count"), F.asc("key"))
            size = inner.get("size")
            if size:
                df = df.limit(int(size))
            out[name] = df
        elif kind in ("stats", "percentiles", "cardinality") or kind in _METRICS:
            out[name] = base.agg(*_metric_cols({name: {kind: inner}}))
        else:
            raise UnsupportedQuery(f"unsupported agg kind: {kind}")
    return out


def top_hits(docs: DataFrame, bucket_field: str, size: int,
             sort: list | None = None, query: dict | None = None) -> DataFrame:
    """ES top_hits sub-aggregation: the top `size` docs per bucket, by the
    given ES-style sort spec (default: doc_id asc). Window partitioned by
    the REAL bucket key — scales with bucket count, no global funnel."""
    from pyspark.sql import Window

    base = docs
    if query:
        base = base.filter(_compile_clause(query))
    order = []
    for s in sort or [{"doc_id": {"order": "asc"}}]:
        if isinstance(s, str):
            order.append(F.col(s).asc())
        else:
            ((field, spec),) = s.items()
            o = spec.get("order", "asc") if isinstance(spec, dict) else spec
            order.append(F.col(field).desc() if o == "desc" else F.col(field).asc())
    w = Window.partitionBy(bucket_field).orderBy(*order)
    return (
        base.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= size)
        .withColumnRenamed("__rank", "hit_rank")
    )
