"""ES percolate query — REVERSE search: store queries, match documents
against them (alerting/routing; the fluentd world's "which monitors fire
for this log line"). Reference context: the plugin forwards percolate
bodies to ES like any other query (in_elasticsearch.rb:94-99); the
matching semantics implemented here are the ES-side engine's.

Stored-query model (the registered percolator subset): a `match` query
with `minimum_should_match` — (query_id, terms, msm) rows. operator=and
is msm = len(terms); operator=or is msm = 1.

Plan shape — the reverse-index join, which is how percolation scales:
explode each document's DISTINCT terms, equi-join the exploded stored
queries on the term (shuffle keyed by term, partial-aggregated), count
distinct matched terms per (doc, query), keep pairs meeting the query's
msm. Cost scales with Σ per-doc |vocab ∩ query vocab|, NOT
|docs| x |queries| — no cross join anywhere. Skewed head terms behave
like any aggregation key (AQE skew split); a broadcast of the (small)
query-term table avoids shuffling the corpus when the registry fits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..extraction import simple_tokens_col


def make_query_registry(spark, queries: list[tuple[int, list[str], int]]) -> DataFrame:
    """Build the stored-query registry DataFrame from
    (query_id, terms, minimum_should_match) rows."""
    return spark.createDataFrame(
        [(q, list(t), int(m)) for q, t, m in queries],
        "query_id long, terms array<string>, msm int",
    )


def compile_registry(registry: DataFrame) -> DataFrame:
    """Explode the stored queries into the (query_id, msm, term) reverse
    index the match join runs against.  Callers that evaluate MANY times
    against the same registry (streaming percolation) should persist the
    result once — pinning it across micro-batches so each batch's
    broadcast builds from cached partitions instead of re-deriving the
    explode (the r5 p99-tail source)."""
    return registry.select(
        "query_id", "msm", F.explode(F.array_distinct("terms")).alias("term")
    )


def _percolate_compiled(docs: DataFrame, q_terms: DataFrame,
                        id_col: str, text_col: str,
                        small_registry: bool, ordered: bool) -> DataFrame:
    doc_terms = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(simple_tokens_col(F.col(text_col)))).alias("term"),
    )
    if small_registry:
        q_terms = F.broadcast(q_terms)
    out = (
        doc_terms.join(q_terms, "term")
        .groupBy("doc_id", "query_id", "msm")
        .agg(F.count(F.lit(1)).alias("n_matched"))
        .filter(F.col("n_matched") >= F.col("msm"))
        .select("doc_id", "query_id", "n_matched")
    )
    return out.orderBy("doc_id", "query_id") if ordered else out


def percolate(docs: DataFrame, registry: DataFrame,
              id_col: str = "doc_id", text_col: str = "text",
              small_registry: bool = True, ordered: bool = True) -> DataFrame:
    """Match every doc against every stored query. Returns
    (doc_id, query_id, n_matched) for pairs with n_matched >= the query's
    minimum_should_match, sorted (doc_id, query_id) when ``ordered``
    (the alerting sink doesn't need the global sort — pass False there).

    `small_registry=True` (default) forces a broadcast of the exploded
    query-term table — right for the alerting case (thousands of stored
    monitors, KB-MB), where it keeps the corpus un-shuffled. For a
    MILLION-query registry the exploded term table can exceed executor
    memory: pass small_registry=False to drop the hint so AQE/statistics
    choose between broadcast and a term-keyed shuffle join."""
    return _percolate_compiled(docs, compile_registry(registry),
                               id_col, text_col, small_registry, ordered)


def percolate_sql(table: str, queries: list[tuple[int, list[str], int]],
                  id_col: str = "doc_id", text_col: str = "text") -> str:
    """DuckDB mirror of percolate() with the registry inlined as VALUES."""
    lit = lambda t: "'" + t.replace("'", "''") + "'"  # noqa: E731
    rows = ", ".join(
        f"({qid}, {lit(t)}, {msm})"
        for qid, terms, msm in queries
        for t in sorted(set(terms))
    )
    return f"""
WITH reg(query_id, term, msm) AS (VALUES {rows}),
doc_terms AS (
  SELECT {id_col} AS doc_id, unnest(list_distinct(
    list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'),
                t -> t <> ''))) AS term
  FROM {table}
)
SELECT d.doc_id, r.query_id, count(*) AS n_matched
FROM doc_terms d JOIN reg r USING (term)
GROUP BY d.doc_id, r.query_id, r.msm
HAVING count(*) >= r.msm
ORDER BY doc_id, query_id
"""


def percolate_stream(stream_docs: DataFrame, registry: DataFrame,
                     sink, checkpoint: str,
                     id_col: str = "doc_id", text_col: str = "text",
                     small_registry: bool = True):
    """Streaming percolation — the alerting loop: each micro-batch of
    documents is matched against the registered queries and the hits are
    handed to `sink(matches_df, batch_id)`. Matching is per-document, so
    batch-local evaluation is EXACT (no cross-batch state, no watermark);
    checkpointing gives effectively-once alert delivery for an
    idempotent sink.

    The compiled (exploded) registry is persisted and materialized ONCE
    before the stream starts and pinned across micro-batches — each
    batch's broadcast then builds from cached partitions instead of
    re-deriving the explode per trigger (the r5 latency-tail source).
    Swap the registry by restarting the stream (ES PUT-percolator +
    refresh has the same visibility contract).  The per-batch result is
    unsorted: alert delivery is keyed (doc_id, query_id), a global sort
    per trigger is pure overhead."""
    q_terms = compile_registry(registry)
    q_terms.persist()
    q_terms.count()  # materialize before the first trigger

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        sink(_percolate_compiled(batch_df, q_terms, id_col, text_col,
                                 small_registry, ordered=False), batch_id)

    return (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def make_ranged_registry(spark, queries: list[tuple]) -> DataFrame:
    """Registry rows (query_id, terms, msm, range_field, gte, lte) —
    the percolator bool form: match(terms, msm) AND an optional numeric
    range filter. None range_field = no filter; None gte/lte = open."""
    rows = []
    for q in queries:
        qid, terms, msm, rf, gte, lte = q
        rows.append((int(qid), list(terms), int(msm), rf,
                     None if gte is None else float(gte),
                     None if lte is None else float(lte)))
    return spark.createDataFrame(
        rows, "query_id long, terms array<string>, msm int, "
              "range_field string, gte double, lte double")


def percolate_ranged(docs: DataFrame, registry: DataFrame,
                     numeric_fields: list[str],
                     id_col: str = "doc_id", text_col: str = "text",
                     small_registry: bool = True,
                     ordered: bool = True) -> DataFrame:
    """ES percolator with FILTER CONTEXT: each stored query is
    match(terms, msm) AND an optional numeric range over one of the
    declared ``numeric_fields`` (the alerting shape: "message contains X
    AND value > 5"). Same reverse term join as percolate(); the range is
    evaluated AFTER the match join against a doc-side field→value MAP
    built once from the declared fields — heterogeneous per-query range
    fields stay one plan, and the per-query range spec is a broadcast
    (registries are small by contract). Open bounds are NULL; a query
    with NULL range_field behaves exactly like percolate()."""
    pairs = _percolate_compiled(
        docs, compile_registry(registry.select("query_id", "terms", "msm")),
        id_col, text_col, small_registry, ordered=False)
    specs = registry.select("query_id", "range_field", "gte", "lte")
    dmap = docs.select(
        F.col(id_col).alias("doc_id"),
        F.create_map(*[x for f in numeric_fields
                       for x in (F.lit(f), F.col(f).cast("double"))])
        .alias("__nf"))
    v = F.element_at("__nf", F.col("range_field"))
    out = (pairs.join(F.broadcast(specs), "query_id")
           .join(dmap, "doc_id")
           .filter(F.col("range_field").isNull()
                   | ((F.col("gte").isNull() | (v >= F.col("gte")))
                      & (F.col("lte").isNull() | (v <= F.col("lte")))))
           .select("doc_id", "query_id", "n_matched"))
    return out.orderBy("doc_id", "query_id") if ordered else out


def percolate_ranged_sql(table: str, queries: list[tuple],
                         id_col: str = "doc_id",
                         text_col: str = "text") -> str:
    """DuckDB mirror of percolate_ranged, registry inlined as VALUES."""
    lit = lambda t: "'" + t.replace("'", "''") + "'"  # noqa: E731
    num = lambda x: "NULL" if x is None else repr(float(x))  # noqa: E731
    rows = ", ".join(
        f"({qid}, {lit(t)}, {msm}, "
        f"{'NULL' if rf is None else lit(rf)}, {num(gte)}, {num(lte)})"
        for qid, terms, msm, rf, gte, lte in queries
        for t in sorted(set(terms)))
    fields = sorted({rf for _, _, _, rf, _, _ in queries if rf is not None})
    case = ("CASE r.rf " + " ".join(
        f"WHEN {lit(f)} THEN CAST(d.{f} AS DOUBLE)" for f in fields)
        + " END") if fields else "NULL"
    return f"""
WITH reg(query_id, term, msm, rf, gte, lte) AS (VALUES {rows}),
doc_terms AS (
  SELECT src.*, t.term
  FROM {table} src, unnest(list_distinct(
    list_filter(regexp_split_to_array(lower(src.{text_col}), '[^a-z0-9]+'),
                t -> t <> ''))) AS t(term)
)
SELECT d.{id_col} AS doc_id, r.query_id, count(*) AS n_matched
FROM doc_terms d JOIN reg r USING (term)
WHERE r.rf IS NULL
   OR ((r.gte IS NULL OR {case} >= r.gte)
       AND (r.lte IS NULL OR {case} <= r.lte))
GROUP BY d.{id_col}, r.query_id, r.msm
HAVING count(*) >= r.msm
ORDER BY doc_id, query_id
"""
