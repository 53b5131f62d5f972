"""Bulk-payload formatting + sizing — reference parity for the NDJSON wire
format (K1/K7/K8, SURVEY.md §2.2) even though the engine's native sink is
columnar tables.

The reference serializes each record as an action header line + source line
(append_record_to_messages, out_elasticsearch.rb:747-765; delimiter
elasticsearch_constants.rb:4) and splits a request when the buffered bytes
exceed ``bulk_message_request_threshold`` (split_request_size_check?,
out_elasticsearch.rb:971-973). Here:

  * ``bulk_action_lines`` produces byte-exact header/body lines as columns
    (vectorized ``to_json`` — goldens in tests/test_bulk_format.py follow
    FIXTURES.md §5);
  * ``with_size_splits`` assigns batch ids by cumulative serialized size —
    the Spark form of size-based request splitting (and the knob that maps
    to ``maxRecordsPerFile`` / Iceberg ``write.target-file-size-bytes`` for
    table sinks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

OPS = ("index", "create", "update", "upsert")  # elasticsearch_constants.rb:5-8


def bulk_action_lines(df: DataFrame, *, op: str = "index", index_col: str = "index_name",
                      id_col: str | None = None, routing_col: str | None = None,
                      body_cols: list[str] | None = None) -> DataFrame:
    """Adds ``header`` and ``body`` JSON-line columns.

    header: {"<op>":{"_index":...,"_id":...,"routing":...}}
    body:   the record JSON; for update/upsert wrapped as {"doc": ...}
    (+ "doc_as_upsert":true for upsert — update_body,
    out_elasticsearch.rb:770-784).
    """
    if op not in OPS:
        raise ValueError(f"op must be one of {OPS}")
    meta = [F.lit("_index").alias("k1"), F.col(index_col)]
    meta_struct = [F.col(index_col).alias("_index")]
    if id_col:
        meta_struct.append(F.col(id_col).cast("string").alias("_id"))
    if routing_col:
        meta_struct.append(F.col(routing_col).cast("string").alias("routing"))
    action_op = "index" if op == "upsert" else op
    header = F.to_json(F.struct(F.struct(*meta_struct).alias(
        "update" if op in ("update", "upsert") else action_op)))
    cols = body_cols or [c for c in df.columns if c not in {index_col}]
    record = F.struct(*[F.col(c) for c in cols])
    if op in ("update", "upsert"):
        body_struct = F.struct(record.alias("doc"))
        if op == "upsert":
            body_struct = F.struct(record.alias("doc"), F.lit(True).alias("doc_as_upsert"))
        body = F.to_json(body_struct)
    else:
        body = F.to_json(record)
    return df.withColumn("header", header).withColumn("body", body)


def with_size_splits(df: DataFrame, threshold_bytes: int = 20 * 1024 * 1024,
                     order_col: str | None = None,
                     partition_cols: list[str] | None = None) -> DataFrame:
    """K7 — size-based request splitting: assigns ``batch_id`` so each
    batch's serialized bytes stay under the threshold (reference default
    20 MB, ES http.max_content_length ceiling 100 MB — out_elasticsearch.rb:169).
    Window cumulative-sum per index partition; requires header/body columns."""
    size = F.length("header") + F.length("body") + F.lit(2)  # + 2 newlines
    parts = partition_cols or ["index_name"]
    w = Window.partitionBy(*parts).orderBy(order_col or F.monotonically_increasing_id())
    cum = F.sum(size).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return df.withColumn("batch_id", F.floor((cum - 1) / threshold_bytes).cast("int"))


def retry_with_backoff(fn, max_retries: int = 5, base_sleep: float = 1.0,
                       retryable=(IOError, OSError), on_retry=None):
    """K10 — exponential 2**n backoff retry for driver-side operations
    (template install, catalog ops) — retry_operate,
    elasticsearch_index_template.rb:51-73. Task-level retries inside jobs
    are Spark's (spark.task.maxFailures); this covers the control plane."""
    import time as _t

    attempt = 0
    while True:
        try:
            return fn()
        except retryable as e:  # noqa: PERF203
            if attempt >= max_retries:
                raise
            sleep = base_sleep * (2**attempt)
            if on_retry:
                on_retry(attempt, sleep, e)
            _t.sleep(sleep)
            attempt += 1
