"""Custom stateful streaming operators (applyInPandasWithState).

The reference maintains per-tag buffers and retry counters across chunks
(Fluentd buffer lifecycle); the Spark-native equivalent is keyed state in
Structured Streaming. ``running_ingest_stats`` keeps an exact per-key
(documents-seen, tokens-seen, last-ts) accumulator across micro-batches —
the state pattern any per-tenant quota / dedup-counter in the ingest path
builds on. Exposed in update mode so each batch emits refreshed totals.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("total_tokens", T.LongType()),
    ]
)
STATE_SCHEMA = T.StructType(
    [T.StructField("n_docs", T.LongType()), T.StructField("total_tokens", T.LongType())]
)


def _update(key, pdf_iter, state: GroupState):
    n, tot = state.get if state.exists else (0, 0)
    for pdf in pdf_iter:
        n += len(pdf)
        tot += int(pdf["n_tokens"].sum())
    state.update((n, tot))
    yield pd.DataFrame({"key": [key[0]], "n_docs": [n], "total_tokens": [tot]})


def running_ingest_stats(stream_df: DataFrame, key_col: str = "tag",
                         tokens_col: str = "n_tokens") -> DataFrame:
    """Per-key exact running counters across micro-batches. stream_df must
    carry (key_col, n_tokens). Returns an update-mode stream of
    (key, n_docs, total_tokens)."""
    src = stream_df.selectExpr(f"{key_col} as key", f"{tokens_col} as n_tokens")
    return src.groupBy("key").applyInPandasWithState(
        _update, OUTPUT_SCHEMA, STATE_SCHEMA, "update", GroupStateTimeout.NoTimeout
    )
