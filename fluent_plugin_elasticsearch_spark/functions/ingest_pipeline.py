"""ES ingest-pipeline processors as declarative column transforms.

The reference plugin tags bulk requests with a `pipeline` parameter
(out_elasticsearch.rb:144, :839-841, :1061 — the request-level `pipeline`
query param) and Elasticsearch executes the named pipeline's processors
server-side before indexing. This engine IS the server side, so the
processor subset the plugin's users lean on is implemented here as a
compiled chain of DataFrame projections — one `withColumn`/`drop` per
processor, all whole-stage-codegen column expressions, no per-row
Python.

Supported processors (the common document-shaping set):
  set, remove, rename, convert, lowercase, uppercase, trim, gsub,
  split, append, date (ISO8601 / epoch_millis / strict_date_time).
Unsupported processors raise UnsupportedQuery loudly (`script` is the
reference's per-record-eval anti-pattern — T13; use the vectorized
transforms instead). Fields are top-level column names; dotted paths
raise (the flattening transform runs upstream — functions/transforms
T2).
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.query_ast import UnsupportedQuery

_CONVERT_TYPES = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


def _field(spec: dict, key: str = "field") -> str:
    f = spec[key]
    if "." in f:
        raise UnsupportedQuery(
            f"ingest processor fields are top-level columns; got '{f}' "
            f"(flatten upstream — functions/transforms)")
    return f


def _one(kind: str, spec: dict) -> Callable[[DataFrame], DataFrame]:
    """Compile one processor to a DataFrame → DataFrame step."""
    if kind == "set":
        f, v = _field(spec), spec["value"]
        override = bool(spec.get("override", True))
        if override:
            return lambda df: df.withColumn(f, F.lit(v))
        return lambda df: (
            df.withColumn(f, F.coalesce(F.col(f), F.lit(v)))
            if f in df.columns else df.withColumn(f, F.lit(v)))
    if kind == "remove":
        fs = spec["field"]
        fs = [fs] if isinstance(fs, str) else list(fs)
        for f in fs:
            if "." in f:
                raise UnsupportedQuery("ingest processor fields are top-level")
        return lambda df: df.drop(*fs)
    if kind == "rename":
        f, t = _field(spec), _field(spec, "target_field")
        return lambda df: df.withColumnRenamed(f, t)
    if kind == "convert":
        f = _field(spec)
        ty = _CONVERT_TYPES.get(spec["type"])
        if ty is None:
            raise UnsupportedQuery(f"convert type: {spec['type']}")
        tgt = spec.get("target_field", f)
        return lambda df: df.withColumn(tgt, F.col(f).cast(ty))
    if kind in ("lowercase", "uppercase", "trim"):
        f = _field(spec)
        fn = {"lowercase": F.lower, "uppercase": F.upper, "trim": F.trim}[kind]
        tgt = spec.get("target_field", f)
        return lambda df: df.withColumn(tgt, fn(F.col(f)))
    if kind == "gsub":
        f = _field(spec)
        patt, repl = spec["pattern"], spec["replacement"]
        tgt = spec.get("target_field", f)
        return lambda df: df.withColumn(
            tgt, F.regexp_replace(F.col(f), patt, repl))
    if kind == "split":
        f = _field(spec)
        sep = spec["separator"]
        tgt = spec.get("target_field", f)
        return lambda df: df.withColumn(tgt, F.split(F.col(f), sep))
    if kind == "append":
        f, v = _field(spec), spec["value"]
        vals = v if isinstance(v, list) else [v]
        lits = F.array(*[F.lit(x) for x in vals])
        return lambda df: df.withColumn(
            f,
            F.concat(F.coalesce(F.col(f), F.array().cast("array<string>")),
                     lits) if f in df.columns else lits)
    if kind == "date":
        f = _field(spec)
        tgt = spec.get("target_field", "@timestamp")
        formats = spec.get("formats", ["ISO8601"])

        def date_col(col: Column) -> Column:
            parsed = None
            for fmt in formats:
                if fmt in ("ISO8601", "strict_date_time",
                           "strict_date_optional_time"):
                    p = F.to_timestamp(col)
                elif fmt in ("epoch_millis", "UNIX_MS"):
                    p = F.timestamp_millis(col.cast("long"))
                elif fmt in ("epoch_second", "UNIX"):
                    p = col.cast("long").cast("timestamp")
                else:  # a Java/Joda pattern forwarded verbatim
                    p = F.to_timestamp(col, fmt)
                parsed = p if parsed is None else F.coalesce(parsed, p)
            return parsed

        return lambda df: df.withColumn(tgt, date_col(F.col(f)))
    raise UnsupportedQuery(f"unsupported ingest processor: {kind}")


def compile_pipeline(processors: list[dict[str, Any]]
                     ) -> Callable[[DataFrame], DataFrame]:
    """Compile an ES ingest pipeline definition ({"processors": [...]} or
    the bare processor list) into one DataFrame transform — processors
    apply in order, Catalyst collapses the projection chain into a
    single stage."""
    if isinstance(processors, dict):
        processors = processors["processors"]
    steps = []
    for p in processors:
        ((kind, spec),) = p.items()
        steps.append(_one(kind, spec))

    def run(df: DataFrame) -> DataFrame:
        for s in steps:
            df = s(df)
        return df

    return run


def apply_ingest_pipeline(df: DataFrame,
                          processors: list[dict[str, Any]]) -> DataFrame:
    """One-shot convenience: compile + apply."""
    return compile_pipeline(processors)(df)
