"""Input-side scan operators — the engine half of the reference's
in_elasticsearch plugin (SURVEY.md §2.1 S1-S6).

The reference polls `client.search` with scroll cursors and thread-sliced
scans (in_elasticsearch.rb:260-298); on Spark a DataFrame scan is already
sliced (partitions = slices) and a snapshot + range predicate replaces the
scroll cursor. What remains engine work is the query-body semantics and the
docinfo/timestamp enrichment of emitted records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.transforms import parse_time_with_quarantine


def index_scan(spark: SparkSession, path: str, *, columns: list[str] | None = None,
               predicate: str | None = None, size: int | None = None) -> DataFrame:
    """S1 — index scan: query body against an index (run_slice,
    in_elasticsearch.rb:272-294; `size` default 1000 :35). Projection and
    predicate reach the parquet scan (pushdown); `size` maps to LIMIT."""
    df = spark.read.parquet(path)
    if predicate:
        df = df.filter(predicate)
    if columns:
        df = df.select(*columns)
    if size:
        df = df.limit(size)
    return df


def sliced_scan(df: DataFrame, num_slices: int) -> DataFrame:
    """S3 — sliced parallel scan (run, in_elasticsearch.rb:260-270): a
    DataFrame scan is already partition-parallel; this only adjusts the
    slice count. The reference warns above 8 slices (:263) — we don't, the
    scheduler handles thousands."""
    return df.repartition(num_slices)


def scroll_pages(df: DataFrame, order_col: str, page_size: int = 1000):
    """S2 — scroll pagination as a generator of page DataFrames over a
    stable snapshot (process_scroll_request, in_elasticsearch.rb:296-298).
    Keyset pagination (WHERE key > last ORDER BY key LIMIT n), not
    offset — each page is one bounded job. Caller iterates until empty
    (≈ the scroll loop :282-287); nothing to clear (:289-293) — the
    snapshot is immutable."""
    last = None
    while True:
        page = df
        if last is not None:
            page = page.filter(F.col(order_col) > F.lit(last))
        rows = page.orderBy(order_col).limit(page_size)
        collected = rows.collect()
        if not collected:
            return
        yield collected
        last = collected[-1][order_col]


def with_docinfo(df: DataFrame, index_name: str | None = None, id_col: str | None = None,
                 docinfo_target: str = "@metadata",
                 fields: tuple[str, ...] = ("_index", "_id")) -> DataFrame:
    """S5 — docinfo enrichment (process_events, in_elasticsearch.rb:306-329):
    merge hit metadata under a target struct column. `_type` is omitted
    (dead in ES8+, SURVEY.md T6)."""
    meta = {}
    if "_index" in fields:
        meta["_index"] = F.col("index_name") if index_name is None else F.lit(index_name)
    if "_id" in fields and id_col:
        meta["_id"] = F.col(id_col).cast("string")
    return df.withColumn(
        docinfo_target, F.struct(*[v.alias(k) for k, v in meta.items()])
    )


def parse_timestamps_on_read(df: DataFrame, time_key: str = "@timestamp",
                             fmt: str | None = None) -> tuple[DataFrame, DataFrame]:
    """S6 — timestamp parse on read; parse failures → quarantine DF (the
    reference emits them to an error tag, in_elasticsearch.rb:200-205)."""
    return parse_time_with_quarantine(df, time_key, fmt, out_col="event_time")


def index_pattern_filter(df: DataFrame, pattern: str,
                         index_col: str = "index_name") -> DataFrame:
    """ES multi-index patterns — `logstash-2024.01.*`, `logs-a,logs-b`,
    `logstash-*` — against the index-name column that models index
    membership here (the reference writes date-partitioned
    `logstash-YYYY.MM.DD` names via T5 and every Kibana query reads them
    back through exactly these patterns, in_elasticsearch.rb:30 `index`
    config). Comma = union of patterns; `*`/`?` ES wildcard semantics.
    Compiles to one anchored rlike (or isin for literal lists) — both
    pushdown-friendly, and on a table PARTITIONED by the index column the
    literal/prefix forms prune partitions at plan time."""
    import re as _re

    parts = [p.strip() for p in pattern.split(",") if p.strip()]
    if all("*" not in p and "?" not in p for p in parts):
        return df.filter(F.col(index_col).isin(parts))
    regexes = []
    for p in parts:
        regexes.append("".join(
            ".*" if ch == "*" else "." if ch == "?" else _re.escape(ch)
            for ch in p))
    return df.filter(F.col(index_col).rlike(f"^(?:{'|'.join(regexes)})$"))


def count_query(docs: DataFrame, body: dict | None = None) -> DataFrame:
    """ES _count API, DataFrame form (single `count` row — the
    oracle-able shape; operators/apis.count is the scalar convenience).
    The hit count of a query body, no hits fetched.
    Compiles the body's `query` through the same clause compiler and
    returns a single-row (count) frame — a count-only aggregate plan, so
    Catalyst prunes every column and parquet serves row-group counts
    where the predicate allows."""
    from pyspark.sql import functions as F

    from ..plans.query_ast import _compile_clause

    q = (body or {}).get("query")
    if q:
        docs = docs.filter(F.coalesce(_compile_clause(q), F.lit(False)))
    return docs.agg(F.count(F.lit(1)).alias("count"))


def mget(docs: DataFrame, ids: list, id_col: str = "doc_id") -> DataFrame:
    """ES _mget API: fetch documents by id list, RESULT IN REQUEST ORDER
    (the _mget contract; missing ids are simply absent — the envelope
    layer's found:false is the caller's diff). The id list is
    coordinator-sized: broadcast join against the table, never a scan per
    id."""
    from pyspark.sql import functions as F

    spark = docs.sparkSession
    order = spark.createDataFrame(
        [(i, v) for i, v in enumerate(ids)], f"__req_order long, {id_col} long")
    return (docs.join(F.broadcast(order), id_col)
            .orderBy("__req_order").drop("__req_order"))


def msearch(docs: DataFrame, bodies: list, index=None) -> DataFrame:
    """ES _msearch API: several search bodies in one request. Each body
    compiles through the same query compiler (index registry honored per
    body) and the hit streams union with a `query_idx` tag — the
    multiplexed-response shape the reference's bulk search callers
    consume. Per-query `size` limits apply before the union, so the
    result is Σ per-query top-k rows, never a corpus concat. Returns
    (query_idx, doc_id) plus whatever metadata columns all bodies share
    — the common-column intersection, since heterogeneous bodies emit
    different scoring columns."""
    from functools import reduce

    from pyspark.sql import functions as F

    from ..plans.query_ast import compile_query

    if not bodies:
        raise ValueError("msearch needs at least one body")
    outs = [compile_query(docs, b, index=index) for b in bodies]
    common = set(outs[0].columns)
    for o in outs[1:]:
        common &= set(o.columns)
    keep = [c for c in outs[0].columns if c in common]
    if "doc_id" not in keep:
        raise ValueError("msearch bodies must all yield doc_id")
    tagged = [o.select(F.lit(i).alias("query_idx"), *keep)
              for i, o in enumerate(outs)]
    return reduce(lambda a, b_: a.unionByName(b_), tagged)


def field_caps(docs: DataFrame) -> DataFrame:
    """ES _field_caps API: per-field capabilities derived from the schema
    — (field, type, searchable, aggregatable). Driver-side schema walk
    (no data touched), ES type names mapped from Spark types; nested
    struct fields are flattened with dotted paths like ES."""
    from pyspark.sql import types as T

    def es_type(dt) -> str:
        if isinstance(dt, T.StringType):
            return "keyword"
        if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
            return "long"
        if isinstance(dt, (T.DoubleType, T.FloatType)):
            return "double"
        if isinstance(dt, T.BooleanType):
            return "boolean"
        if isinstance(dt, T.TimestampType):
            return "date"
        if isinstance(dt, T.BinaryType):
            return "binary"
        if isinstance(dt, T.ArrayType):
            return es_type(dt.elementType)
        if isinstance(dt, T.DecimalType):
            return "double"
        return "object"

    rows = []

    def walk(prefix: str, dt) -> None:
        if isinstance(dt, T.StructType):
            for f in dt.fields:
                if isinstance(f.dataType, T.StructType):
                    walk(f"{prefix}{f.name}.", f.dataType)
                else:
                    rows.append((f"{prefix}{f.name}", es_type(f.dataType)))
        else:
            rows.append((prefix.rstrip("."), es_type(dt)))

    for f in docs.schema.fields:
        if isinstance(f.dataType, T.StructType):
            walk(f"{f.name}.", f.dataType)
        else:
            rows.append((f.name, es_type(f.dataType)))
    spark = docs.sparkSession
    out = [(name, t, True, t not in ("binary", "object")) for name, t in rows]
    return spark.createDataFrame(
        out, "field string, type string, searchable boolean, aggregatable boolean"
    ).orderBy("field")
