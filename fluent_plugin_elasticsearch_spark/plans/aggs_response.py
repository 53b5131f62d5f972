"""ES `aggregations` response envelope: render compile_aggs outputs into
the JSON shape ES returns (buckets/doc_count/value trees), so a consumer
of the reference plugin's search responses can read this engine's agg
results unchanged.

Collect here is legitimate by the same argument as to_es_response: an
aggregation RESULT is reduced — bucket count, not doc count — and ES
itself materializes the whole tree in the coordinating node before
serializing. The corpus-sized work happened in the Catalyst aggregates
upstream.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

# ES bounds the whole aggregation tree with search.max_buckets (default
# 65536) and fails the request beyond it. Same contract here: the collect
# below is capped, so a size-less terms agg over a high-cardinality field
# raises instead of materializing the cardinality onto the driver.
DEFAULT_MAX_BUCKETS = 65536


class TooManyBuckets(ValueError):
    pass


def _bounded_rows(df: DataFrame, name: str, max_buckets: int) -> list:
    """Collect at most max_buckets rows; one extra row is fetched only to
    DETECT overflow (never more), so the driver materialization is bounded
    by the cap, not the bucket cardinality."""
    rows = df.limit(max_buckets + 1).collect()
    if len(rows) > max_buckets:
        raise TooManyBuckets(
            f"agg '{name}' produced more than {max_buckets} buckets; set a "
            f"'size' on the agg or raise max_buckets (ES search.max_buckets "
            f"behavior)")
    return rows


def _jsonable(v: Any) -> Any:
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return v


def render_bucket_agg(df: DataFrame, name: str,
                      max_buckets: int = DEFAULT_MAX_BUCKETS) -> dict:
    """Single-level bucket agg frame (key, doc_count, metrics...) →
    {"buckets": [{"key": ..., "doc_count": ..., "<metric>": {"value": v}}]}.
    Internal ordering-helper columns (bucket_idx from range/date_range,
    any __-prefixed helper) are dropped — they are plan artifacts, not
    metrics, and must not appear in the ES envelope."""
    buckets = []
    for r in _bounded_rows(df, name, max_buckets):
        d = r.asDict()
        b: dict[str, Any] = {"key": _jsonable(d.pop("key")),
                             "doc_count": d.pop("doc_count")}
        for k, v in d.items():
            if k == "bucket_idx" or k.startswith("__"):
                continue
            b[k] = {"value": _jsonable(v)}
        buckets.append(b)
    return {name: {"buckets": buckets}}


def render_nested_bucket_agg(df: DataFrame, level_names: list[str],
                             max_buckets: int = DEFAULT_MAX_BUCKETS) -> dict:
    """Flattened nested-bucket frame (plans/aggs._compile_bucket_path
    output: <level>_key columns, <level>_doc_count for non-leaf levels,
    leaf doc_count + metrics) → the recursive ES bucket tree. Row order
    already encodes ES bucket ordering per level; the tree rebuild
    preserves first-seen order."""
    rows = [r.asDict() for r in _bounded_rows(df, level_names[0], max_buckets)]
    root: dict[str, Any] = {level_names[0]: {"buckets": []}}

    def bucket_list(container: dict, name: str) -> list:
        return container.setdefault(name, {"buckets": []})["buckets"]

    for d in rows:
        container = root
        for depth, lname in enumerate(level_names):
            key = _jsonable(d[f"{lname}_key"])
            buckets = bucket_list(container, lname)
            cur = next((b for b in buckets if b["key"] == key), None)
            if cur is None:
                if depth < len(level_names) - 1:
                    cnt = d[f"{lname}_doc_count"]
                else:
                    cnt = d["doc_count"]
                cur = {"key": key, "doc_count": cnt}
                buckets.append(cur)
            if depth == len(level_names) - 1:
                for k, v in d.items():
                    if (k == "doc_count" or k == "bucket_idx"
                            or k.startswith("__")
                            or k.endswith("_key") or k.endswith("_doc_count")):
                        continue
                    cur[k] = {"value": _jsonable(v)}
            container = cur
    return root


def render_metric_agg(df: DataFrame, name: str) -> dict:
    """Single-row metric frame → {"name": {"value": v}} (one column) or
    {"name": {...stats fields...}} (multi-column, `name_` prefix
    stripped — the stats/extended_stats shape)."""
    row = df.take(1)[0].asDict()
    if len(row) == 1:
        return {name: {"value": _jsonable(next(iter(row.values())))}}
    prefix = f"{name}_"
    return {name: {
        (k[len(prefix):] if k.startswith(prefix) else k): _jsonable(v)
        for k, v in row.items()
    }}


def render_aggregations(compiled: dict[str, DataFrame],
                        body: dict[str, Any],
                        max_buckets: int = DEFAULT_MAX_BUCKETS) -> dict:
    """Render every agg of a compiled body into one ES `aggregations`
    section, dispatching on the body's agg kinds."""
    out: dict[str, Any] = {}
    for name, spec in (body.get("aggs") or {}).items():
        ((kind, inner),) = ((k, v) for k, v in spec.items() if k != "aggs")
        df = compiled[name]
        if kind in ("terms", "date_histogram", "histogram", "filters",
                    "range", "date_range", "significant_terms",
                    "significant_text", "adjacency_matrix"):
            sub = spec.get("aggs") or {}
            bucket_subs = [
                n for n, s in sub.items()
                if next(iter(k for k in s if k != "aggs"))
                in ("terms", "date_histogram", "histogram")
            ]
            if bucket_subs:  # nested tree: walk the level chain
                levels = [name]
                cur = spec
                while True:
                    subs = cur.get("aggs") or {}
                    nxt = [
                        (n, s) for n, s in subs.items()
                        if next(iter(k for k in s if k != "aggs"))
                        in ("terms", "date_histogram", "histogram")
                    ]
                    if not nxt:
                        break
                    levels.append(nxt[0][0])
                    cur = nxt[0][1]
                out.update(render_nested_bucket_agg(df, levels, max_buckets))
            else:
                out.update(render_bucket_agg(df, name, max_buckets))
        elif kind == "composite":
            rows = [r.asDict() for r in _bounded_rows(df, name, max_buckets)]
            src_names = [next(iter(s)) for s in inner["sources"]]
            buckets = []
            for d in rows:
                b = {"key": {n: _jsonable(d[n]) for n in src_names},
                     "doc_count": d["doc_count"]}
                for k, v in d.items():
                    if k not in src_names and k != "doc_count":
                        b[k] = {"value": _jsonable(v)}
                buckets.append(b)
            after = buckets[-1]["key"] if buckets else None
            out[name] = {"after_key": after, "buckets": buckets}
        else:
            out.update(render_metric_agg(df, name))
    return out
