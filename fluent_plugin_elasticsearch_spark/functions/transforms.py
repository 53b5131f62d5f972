"""Per-record transform operators from the reference write path
(SURVEY.md §2.3) — all pure column expressions (vectorized, codegen'd).

The reference applies these per record in Ruby inside `process_message`
(out_elasticsearch.rb:979-1076); here each is a `withColumn`/`select`
transform so Catalyst constant-folds chunk-level invariants the reference
had to hoist manually (expand_placeholders, out_elasticsearch.rb:874).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ISO-8601 with 9-digit (ns) precision — reference time_precision default 9
# (out_elasticsearch.rb:93, dt.iso8601(@time_precision) :994). Spark
# timestamps are µs, so ns digits 7-9 are zero-padded, matching the
# reference's behavior for µs-precision inputs.
ISO9_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS000'Z'"


def iso8601_ns(ts: Column) -> Column:
    return F.date_format(ts, ISO9_FMT)


def inject_timestamp(df: DataFrame, time_key: str | None = None,
                     event_time_col: str = "time", out_col: str = "@timestamp",
                     keep_time_key: bool = True) -> DataFrame:
    """T3 — `@timestamp` precedence: existing @timestamp → time_key field →
    event time (process_message, out_elasticsearch.rb:986-999)."""
    existing = F.col(out_col) if out_col in df.columns else F.lit(None).cast("string")
    from_key = F.col(time_key).cast("string") if time_key and time_key in df.columns else F.lit(None).cast("string")
    out = df.withColumn(out_col, F.coalesce(existing, from_key, iso8601_ns(F.col(event_time_col))))
    if time_key and not keep_time_key and time_key in df.columns:
        out = out.drop(time_key)  # time_key_exclude_timestamp, :113
    return out


def parse_time_with_quarantine(df: DataFrame, col: str, fmt: str | None = None,
                               out_col: str = "parsed_ts") -> tuple[DataFrame, DataFrame]:
    """T4 — string/numeric time parse; failures go to a quarantine DF
    instead of an error tag (create_time_parser, out_elasticsearch.rb:556-581;
    error tag :142). Numeric epochs (int/float seconds) handled like
    NumericTimeParser (:583-586)."""
    c = F.col(col)
    num = c.try_cast("double")  # ANSI-safe: NULL on non-numeric strings
    parsed = F.when(num.isNotNull(), F.timestamp_seconds(num)).otherwise(
        F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)
    )
    out = df.withColumn(out_col, parsed)
    ok = out.filter(F.col(out_col).isNotNull() | c.isNull())
    quarantine = out.filter(F.col(out_col).isNull() & c.isNotNull())
    return ok, quarantine


def target_index(df: DataFrame, *, logstash_prefix: str = "logstash",
                 separator: str = "-", dateformat: str = "yyyy.MM.dd",
                 time_col: str = "@timestamp", event_time_col: str | None = None,
                 target_index_key: str | None = None, static_index: str | None = None,
                 out_col: str = "index_name") -> DataFrame:
    """T5 — target-index computation (out_elasticsearch.rb:1001-1015):
    target_index_key field (consumed) → logstash date name from @timestamp
    (UTC — utc_index default, :99) → static index_name; always lower-cased
    (:1012-1015). The result is the engine's partition column."""
    ts = F.col(time_col) if time_col in df.columns else F.col(event_time_col or "time")
    candidates = []
    if target_index_key and target_index_key in df.columns:
        candidates.append(F.col(target_index_key))
    candidates.append(
        F.concat(F.lit(logstash_prefix), F.lit(separator), F.date_format(ts.cast("timestamp"), dateformat))
    )
    if static_index:
        candidates.append(F.lit(static_index))
    out = df.withColumn(out_col, F.lower(F.coalesce(*candidates)))
    if target_index_key and target_index_key in df.columns:
        out = out.drop(target_index_key)  # key is deleted from the record (:1004)
    return out


def inject_tag(df: DataFrame, tag: str, tag_key: str = "tag") -> DataFrame:
    """T7 — include_tag_key (out_elasticsearch.rb:1016-1018)."""
    return df.withColumn(tag_key, F.lit(tag))


def inject_lineage(df: DataFrame, run_id: str, chunk_id_key: str = "chunk_id") -> DataFrame:
    """T10 — chunk-id lineage (inject_chunk_id_to_record_if_needed,
    out_elasticsearch.rb:856-863): run id + spark partition id stand in for
    the Fluentd chunk unique id."""
    return df.withColumn(
        chunk_id_key, F.concat_ws("-", F.lit(run_id), F.spark_partition_id().cast("string"))
    )


def flatten_struct_df(df: DataFrame, separator: str = "_") -> DataFrame:
    """T2 — recursive hash flattening (flatten_record,
    out_elasticsearch.rb:795-808): nested struct fields become top-level
    `a{sep}b{sep}c` columns; arrays pass through unprocessed (:800)."""
    cols: list[Column] = []

    def rec(prefix_expr: str, prefix_name: str, dtype):
        for field in dtype.fields:
            path = f"{prefix_expr}.`{field.name}`"
            name = f"{prefix_name}{separator}{field.name}" if prefix_name else field.name
            if isinstance(field.dataType, T.StructType):
                rec(path, name, field.dataType)
            else:
                cols.append(F.expr(path).alias(name))

    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            rec(f"`{field.name}`", field.name, field.dataType)
        else:
            cols.append(F.col(f"`{field.name}`"))
    return df.select(*cols)


def nested_accessor(path: str) -> Column:
    """T8 — `$.a.b` / `$['a']['b']` record accessors for _id/_parent/_routing
    extraction (convert_compat_id_key, out_elasticsearch.rb:538-543;
    get_parent_of :1080-1083). Dotted keys are auto-prefixed `$.`."""
    p = path
    if p.startswith("$."):
        p = p[2:]
    elif p.startswith("$["):
        p = re.sub(r"\[['\"]?([^'\"\]]+)['\"]?\]", r".\1", p[1:]).lstrip(".")
    return F.col(p)


def extract_meta(df: DataFrame, id_key: str | None = None, parent_key: str | None = None,
                 routing_key: str | None = None) -> DataFrame:
    """T8 applied — materialize doc_id/parent_id/routing meta columns
    (process_message, out_elasticsearch.rb:1065-1069). `routing` drives
    repartitioning, the engine analogue of ES shard routing."""
    out = df
    if id_key:
        out = out.withColumn("doc_id", nested_accessor(id_key).cast("string"))
    if parent_key:
        out = out.withColumn("parent_id", nested_accessor(parent_key).cast("string"))
    if routing_key:
        out = out.withColumn("routing", nested_accessor(routing_key).cast("string"))
    return out


def remove_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """T9 — remove_keys projection (out_elasticsearch.rb:1071-1073)."""
    return df.drop(*keys)


_PLACEHOLDER_RE = re.compile(r"\$\{tag\}|\$\{tag_parts\[(\d+)\]\}|\$\{([A-Za-z0-9_.]+)\}|%[YmdHMS]")
_STRFTIME_MAP = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH", "%M": "mm", "%S": "ss"}


def expand_placeholders(template: str, *, tag_col: str = "tag",
                        time_col: str = "time") -> Column:
    """T14 — placeholder expansion (expand_placeholders,
    out_elasticsearch.rb:810-850): `${tag}`, `${tag_parts[n]}`, strftime
    `%Y%m%d...`, `${record_key}` compiled to ONE concat expression. The
    reference evaluates these once per chunk; Catalyst constant-folds the
    literal parts and vectorizes the rest — never per-row eval (the
    out_elasticsearch_dynamic.rb:251-277 anti-pattern, T13)."""
    parts: list[Column] = []
    pos = 0
    for m in _PLACEHOLDER_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        tok = m.group(0)
        if tok == "${tag}":
            parts.append(F.col(tag_col))
        elif m.group(1) is not None:  # ${tag_parts[n]}
            parts.append(F.split(F.col(tag_col), r"\.").getItem(int(m.group(1))))
        elif m.group(2) is not None:  # ${record_key}
            parts.append(F.col(m.group(2)).cast("string"))
        else:  # strftime token
            parts.append(F.date_format(F.col(time_col), _STRFTIME_MAP[tok]))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    return F.concat(*parts) if parts else F.lit("")
