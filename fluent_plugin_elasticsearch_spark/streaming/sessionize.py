"""Event sessionization + EQL-style sequence correlation — the
log-analytics layer over the events table (the reference ships logs INTO
this kind of analysis; ES serves it via transforms / EQL,
in_elasticsearch.rb forwards those bodies like any other).

Batch sessionize is the gaps-and-islands plan (one window partitioned by
the user key — shuffle keyed by user, never global). The streaming form
uses Structured Streaming's built-in session_window with a watermark.
eql_sequence chains per-step self-joins keyed by the `by` column with
strictly-increasing timestamps inside the window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(c: Column) -> Column:
    """FRACTIONAL seconds since epoch for timestamp OR timestamp_ntz
    columns (a direct numeric cast is illegal for NTZ in Spark 4; the
    session runs UTC so the ntz→timestamp hop is value-preserving).
    Double, not long: gap/maxspan comparisons must see sub-second
    fractions or boundary events flip between engines."""
    return c.cast("timestamp").cast("double")


def sessionize(events: DataFrame, gap_seconds: int,
               user_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """Batch sessionization: a new session starts when the gap since the
    user's previous event exceeds gap_seconds. Returns one row per
    session: (user, session_id 1..N per user, session_start, session_end,
    n_events). Plan: ONE window partitioned by user (shuffle on the user
    key) + one groupBy on (user, session_id) — both partial-aggregated,
    the standard gaps-and-islands shape at any scale; skewed power users
    behave like any hot groupBy key (AQE skew split)."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev = F.lag(ts_col, 1).over(w)
    new_session = F.when(
        prev.isNull()
        | (_epoch(F.col(ts_col)) - _epoch(prev) > gap_seconds), 1
    ).otherwise(0)
    tagged = events.withColumn("__new", new_session).withColumn(
        "session_id",
        F.sum("__new").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("int"),
    )
    return (
        tagged.groupBy(F.col(user_col).alias("user_id"), "session_id")
        .agg(F.min(ts_col).alias("session_start"),
             F.max(ts_col).alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
        .orderBy("user_id", "session_id")
    )


def sessionize_sql(table: str, gap_seconds: int,
                   user_col: str = "user_id", ts_col: str = "ts") -> str:
    """DuckDB mirror of sessionize()."""
    return f"""
WITH tagged AS (
  SELECT {user_col} AS user_id, {ts_col} AS ts,
         CASE WHEN lag({ts_col}) OVER w IS NULL
              OR epoch({ts_col}) - epoch(lag({ts_col}) OVER w) > {gap_seconds}
              THEN 1 ELSE 0 END AS new_s
  FROM {table}
  WINDOW w AS (PARTITION BY {user_col} ORDER BY {ts_col} ASC)
),
sess AS (
  SELECT user_id, ts,
         CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts ASC
              ROWS UNBOUNDED PRECEDING) AS INT) AS session_id
  FROM tagged
)
SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events
FROM sess GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def sessionize_stream(stream_events: DataFrame, gap_seconds: int,
                      user_col: str = "user_id", ts_col: str = "ts",
                      watermark: str = "10 minutes") -> DataFrame:
    """Streaming sessionization: Structured Streaming's session_window —
    state-backed dynamic-gap windows per user; the watermark bounds state
    (sessions older than it finalize and evict). Append-mode output, one
    row per CLOSED session — the streaming twin of sessionize()."""
    return (
        stream_events.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col).alias("user_id"),
            F.session_window(F.col(ts_col), f"{gap_seconds} seconds").alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"),
                F.col("w.end").alias("session_end"), "n_events")
    )


def eql_sequence(events: DataFrame, steps: list, within_seconds: int,
                 by_col: str = "user_id", ts_col: str = "ts",
                 id_col: str = "event_id") -> DataFrame:
    """EQL-style sequence query: ordered event chains per `by` key with the
    WHOLE chain inside `within_seconds` (ES EQL
    `sequence by k with maxspan=…`). `steps` are query-AST clause dicts
    (one per step, ≥ 2). Returns all matching chains — one row per chain:
    (user, step1_id, step1_ts, ..., span_seconds), ordered by key/ts.

    Plan: each step is a filtered projection of the same scan; chains are
    built by per-key equi-joins with a strictly-increasing timestamp
    range condition — the shuffle key is the `by` column every time
    (co-partitioned joins, no cross-key work). Skewed keys are the usual
    AQE story. This is the range-join form of EQL: every qualifying
    ordered chain is returned (ES EQL's head-dedup is a LIMIT-style
    post-pass, applied by the caller if wanted)."""
    from ..plans.query_ast import _compile_clause

    if len(steps) < 2:
        raise ValueError("eql_sequence needs at least 2 steps")
    parts = []
    for i, clause in enumerate(steps):
        parts.append(
            events.filter(_compile_clause(clause)).select(
                F.col(by_col).alias("user_id"),
                F.col(id_col).alias(f"step{i}_id"),
                F.col(ts_col).alias(f"step{i}_ts"),
            )
        )
    out = parts[0]
    for i in range(1, len(parts)):
        out = out.join(parts[i], "user_id").filter(
            (F.col(f"step{i}_ts") > F.col(f"step{i-1}_ts"))
            & (_epoch(F.col(f"step{i}_ts"))
               - _epoch(F.col("step0_ts")) <= within_seconds)
        )
    last = len(steps) - 1
    cols = ["user_id"]
    for i in range(len(steps)):
        cols += [f"step{i}_id", f"step{i}_ts"]
    return out.select(
        *cols,
        F.floor(_epoch(F.col(f"step{last}_ts")) - _epoch(F.col("step0_ts")))
        .cast("int").alias("span_seconds"),
    ).orderBy("user_id", "step0_ts", *[f"step{i}_id" for i in range(len(steps))])


def eql_sequence_stream(stream_a: DataFrame, stream_b: DataFrame,
                        within_seconds: int, by_col: str = "user_id",
                        ts_col: str = "ts", id_col: str = "event_id",
                        watermark: str = "10 minutes") -> DataFrame:
    """Streaming twin of the 2-step eql_sequence: a watermarked
    STREAM-STREAM inner join — step-A events buffered in state until the
    maxspan window passes, step-B events matched on (key, time-range).
    The watermark bounds both state stores (ES EQL keeps the same sliding
    window in the coordinating node). Append-mode output: one row per
    matched chain, exactly the batch operator's columns, so a
    backfill-vs-live parity check is a frame compare."""
    a = (
        stream_a.select(F.col(by_col).alias("user_id"),
                        F.col(id_col).alias("step0_id"),
                        F.col(ts_col).alias("step0_ts"))
        .withWatermark("step0_ts", watermark)
    )
    b = (
        stream_b.select(F.col(by_col).alias("b_user_id"),
                        F.col(id_col).alias("step1_id"),
                        F.col(ts_col).alias("step1_ts"))
        .withWatermark("step1_ts", watermark)
    )
    joined = a.join(
        b,
        (F.col("user_id") == F.col("b_user_id"))
        & (F.col("step1_ts") > F.col("step0_ts"))
        & (F.col("step1_ts")
           <= F.col("step0_ts") + F.expr(f"interval {within_seconds} seconds")),
    )
    return joined.select(
        "user_id", "step0_id", "step0_ts", "step1_id", "step1_ts",
        F.floor(_epoch(F.col("step1_ts")) - _epoch(F.col("step0_ts")))
        .cast("int").alias("span_seconds"),
    )
