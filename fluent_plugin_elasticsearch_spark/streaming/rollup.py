"""Continuous date_histogram rollup — the streaming face of the aggs
compiler (ES rollup jobs / transforms continuously materialize
date_histogram+terms summaries; the reference feeds exactly such
dashboards through its ES sink).

Structured-Streaming mapping: event-time `window()` buckets + a
WATERMARK bounding how late data may arrive. In append mode a bucket is
emitted exactly once, when the watermark passes its end — the rollup
table is append-only (the ES rollup index shape); in update mode each
micro-batch revises open buckets (the live-dashboard shape). State is
per-(window, keys) — partitioned by the bucket key, so state size is
bounded by open-window count x key cardinality, independent of stream
length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_date_histogram(stream: DataFrame, ts_col: str,
                             interval: str = "1 hour",
                             watermark: str = "2 hours",
                             keys: list[str] | None = None,
                             metrics: list[Column] | None = None) -> DataFrame:
    """Windowed rollup over an event-time stream: one row per
    (window, *keys) with doc_count plus optional metric columns.
    `interval` is the date_histogram bucket width; `watermark` bounds
    lateness (later rows are dropped, ES `ignore_above`-style finality).
    Output: bucket_start, bucket_end, *keys, doc_count, *metrics."""
    agg_cols = [F.count(F.lit(1)).alias("doc_count")] + list(metrics or [])
    out = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), interval).alias("__w"),
                 *[F.col(k) for k in (keys or [])])
        .agg(*agg_cols)
    )
    metric_names = [c for c in out.columns
                    if c not in ("__w", "doc_count", *(keys or []))]
    return out.select(
        F.col("__w.start").alias("bucket_start"),
        F.col("__w.end").alias("bucket_end"),
        *[F.col(k) for k in (keys or [])],
        "doc_count",
        *metric_names,
    )
