"""ES|QL (the Elasticsearch Query Language, ES 8.11+): the piped query
surface — translated stage by stage onto DataFrame operations.

Reference contract: ES|QL runs over the same indices the plugin writes
(out_elasticsearch.rb ships docs; `POST /_query {"query": "FROM ..."}`
is the modern analyst read path). Each pipe stage maps 1:1 to a
DataFrame transformation, so the whole pipe compiles to ONE declarative
Catalyst plan — filters still push to the scan, STATS is a partial
aggregate, nothing is evaluated stage-at-a-time.

Supported stages (everything else raises UnsupportedQuery):

    FROM <index>
    | WHERE <expr>               -- ES|QL ==/!= comparisons, AND/OR/NOT,
                                    IN/BETWEEN/LIKE/IS NULL, arithmetic;
                                    MATCH(field, "q") is the BOOLEAN
                                    full-text predicate (any query token
                                    present — ES|QL's WHERE MATCH form;
                                    scored search stays in the _search
                                    body surface)
    | EVAL name = expr [, ...]
    | KEEP col [, ...]           -- projection (+ order)
    | DROP col [, ...]
    | RENAME old AS new [, ...]
    | STATS [name =] agg [, ...] [BY key [, ...]]
    | SORT expr [ASC|DESC] [, ...]
    | LIMIT n
    | DISSECT col "%{a} - %{b}"  -- literal-delimited extraction, one
                                    anchored regexp_extract per field
    | GROK col "%{WORD:verb}"    -- classic log-pattern extraction
                                    (WORD NOTSPACE DATA GREEDYDATA INT
                                    NUMBER IP LOGLEVEL)
    | MV_EXPAND col              -- explode a multi-value column
    | ENRICH policy ON key [WITH f1, ...]  -- broadcast lookup join
    | LOOKUP JOIN index ON key   -- 8.18 table join (lookup index =
                                    small by ES contract → broadcast)

Expressions reuse the ES SQL parser (operators/es_sql) — one grammar,
two surfaces, which is exactly how ES shares its expression layer.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.query_ast import UnsupportedQuery
from .es_sql import _Parser, _to_col, _tokenize


def _split_stages(toks: list[tuple[str, str]]) -> list[list[tuple[str, str]]]:
    stages, cur, depth = [], [], 0
    for t in toks:
        if t == ("op", "("):
            depth += 1
        elif t == ("op", ")"):
            depth -= 1
        if t == ("op", "|") and depth == 0:
            stages.append(cur)
            cur = []
        else:
            cur.append(t)
    stages.append(cur)
    return stages


def _stage_name(stage: list[tuple[str, str]]) -> str:
    if not stage:
        raise UnsupportedQuery("ES|QL: empty pipe stage")
    return stage[0][1].lower()


def _match_predicate(df: DataFrame, node):
    """ES|QL WHERE MATCH(field, "q"): boolean any-token-present predicate
    (the unscored form; default match operator is OR). Compiles to one
    arrays_overlap against the tokenized field — no join, no shuffle."""
    from ..extraction import simple_tokens_col

    _, fld, txt = node
    terms = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
    if not terms:
        raise UnsupportedQuery("ES|QL: empty MATCH() query")
    return F.arrays_overlap(
        simple_tokens_col(F.col(fld)),
        F.array(*[F.lit(t) for t in terms]))


def _where_col(df: DataFrame, node):
    """Lower a WHERE expression, rewriting MATCH nodes to the boolean
    predicate (no score_u column exists in the ES|QL pipe)."""
    if isinstance(node, tuple):
        if node[0] == "match":
            return _match_predicate(df, node)
        if node[0] == "score":
            raise UnsupportedQuery(
                "ES|QL: SCORE() needs METADATA _score (unsupported); "
                "use the _search surface for scored queries")
        if node[0] in ("bin", "not", "in", "between", "like", "isnull"):
            rewritten = []
            for c in node[1:]:
                if isinstance(c, tuple) and c[0] in (
                        "match", "bin", "not", "in", "between", "like",
                        "isnull"):
                    rewritten.append(_where_col(df, c))
                else:
                    rewritten.append(c)
            kind = node[0]
            from pyspark.sql import Column
            if kind == "bin":
                op, ln, rn = node[1], rewritten[1], rewritten[2]
                l = ln if isinstance(ln, Column) else _to_col(
                    ln, has_match=False)
                r = rn if isinstance(rn, Column) else _to_col(
                    rn, has_match=False)
                return {"and": l & r, "or": l | r, "=": l == r,
                        "<>": l != r, "!=": l != r, "<": l < r,
                        "<=": l <= r, ">": l > r, ">=": l >= r,
                        "+": l + r, "-": l - r, "*": l * r, "/": l / r,
                        "%": l % r}[op]
            if kind == "not":
                inner = rewritten[0]
                if not isinstance(inner, Column):
                    inner = _to_col(inner, has_match=False)
                return ~inner
    return _to_col(node, has_match=False)


# the classic grok pattern subset log pipelines lean on (fluentd/
# logstash heritage — the reference's own domain); each maps to a plain
# regex fragment both Spark (Java regex) and DuckDB (RE2) accept
_GROK_PATTERNS = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "LOGLEVEL": r"(?:TRACE|DEBUG|INFO|WARN|ERROR|FATAL)",
}


def _grok_regex(pattern: str) -> tuple[list[str], str]:
    """Compile an ES|QL GROK pattern ("%{WORD:verb} %{NUMBER:ms}") to an
    anchored regex with one capture group per named field. Unnamed
    patterns (%{WORD}) match without capturing; unknown pattern names
    raise (the supported set is the classic log-pipeline subset)."""
    out, fields, pos = "^", [], 0
    for m in re.finditer(r"%\{(\w+)(?::(\w+))?\}", pattern):
        out += re.escape(pattern[pos:m.start()])
        pname, fname = m.group(1), m.group(2)
        if pname not in _GROK_PATTERNS:
            raise UnsupportedQuery(
                f"ES|QL: GROK pattern %{{{pname}}} (supported: "
                f"{sorted(_GROK_PATTERNS)})")
        frag = _GROK_PATTERNS[pname]
        if fname:
            fields.append(fname)
            out += f"({frag})"
        else:
            out += f"(?:{frag})"
        pos = m.end()
    out += re.escape(pattern[pos:])
    if not fields:
        raise UnsupportedQuery("ES|QL: GROK pattern has no named field")
    return fields, out + "$"


def _dissect_regex(pattern: str) -> tuple[list[str], str]:
    """Compile an ES|QL DISSECT pattern ("%{a} - %{b}") to an anchored
    regex with one capture group per field — literals escaped, fields
    non-greedy (the dissect contract: literals delimit, the final field
    runs to the end because the regex is end-anchored)."""
    parts = re.split(r"(%\{[A-Za-z_][A-Za-z0-9_]*\})", pattern)
    fields, regex = [], "^"
    for part in parts:
        m = re.fullmatch(r"%\{([A-Za-z_][A-Za-z0-9_]*)\}", part)
        if m:
            fields.append(m.group(1))
            regex += "(.*?)"
        else:
            regex += re.escape(part)
    if not fields:
        raise UnsupportedQuery("ES|QL: DISSECT pattern has no %{field}")
    return fields, regex + "$"


def esql_query(tables: dict[str, DataFrame], query: str,
               enrich_policies: dict[str, tuple[DataFrame, str]]
               | None = None) -> DataFrame:
    """Run one ES|QL pipe against named tables. ``enrich_policies``
    maps policy name -> (lookup DataFrame, match_field) for ENRICH."""
    stages = _split_stages(_tokenize(query))
    head = stages[0]
    if _stage_name(head) != "from" or len(head) != 2 or head[1][0] != "id":
        raise UnsupportedQuery("ES|QL: pipe must start with FROM <index>")
    name = head[1][1]
    if name not in tables:
        raise UnsupportedQuery(f"ES|QL: unknown index {name!r}")
    df = tables[name]

    for stage in stages[1:]:
        kind = _stage_name(stage)
        body = stage[1:]
        p = _Parser(body)
        if kind == "where":
            df = df.filter(_where_col(df, p.expr()))
            if p.peek()[0] != "eof":
                raise UnsupportedQuery(f"ES|QL: trailing input {p.peek()}")
        elif kind == "eval":
            while True:
                nm = p.next()
                if nm[0] != "id":
                    raise UnsupportedQuery("ES|QL: EVAL needs name = expr")
                p.expect("op", "=")
                df = df.withColumn(nm[1], _to_col(p.expr(),
                                                  has_match=False))
                if not p.accept("op", ","):
                    break
            if p.peek()[0] != "eof":
                raise UnsupportedQuery(f"ES|QL: trailing input {p.peek()}")
        elif kind == "keep":
            cols = [p.expect("id")[1]]
            while p.accept("op", ","):
                cols.append(p.expect("id")[1])
            df = df.select(*cols)
        elif kind == "drop":
            cols = [p.expect("id")[1]]
            while p.accept("op", ","):
                cols.append(p.expect("id")[1])
            df = df.drop(*cols)
        elif kind == "rename":
            while True:
                old = p.expect("id")[1]
                p.expect("kw", "as")
                new = p.expect("id")[1]
                df = df.withColumnRenamed(old, new)
                if not p.accept("op", ","):
                    break
        elif kind == "stats":
            aggs = []
            while True:
                if (p.peek()[0] == "id" and p.peek(1) == ("op", "=")):
                    nm = p.next()[1]
                    p.next()
                    aggs.append(_to_col(p.expr(), has_match=False,
                                        allow_agg=True).alias(nm))
                else:
                    raise UnsupportedQuery(
                        "ES|QL: STATS items need `name = agg(...)`")
                if not p.accept("op", ","):
                    break
            keys = []
            if p.accept("kw", "by") or (p.peek() == ("id", "BY")
                                        or p.peek() == ("id", "by")):
                if p.peek()[0] == "id" and p.peek()[1].lower() == "by":
                    p.next()
                keys.append(p.expect("id")[1])
                while p.accept("op", ","):
                    keys.append(p.expect("id")[1])
            if keys:
                df = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
            else:
                df = df.agg(*aggs)
        elif kind == "sort":
            sort_cols = []
            while True:
                c = _to_col(p.expr(), has_match=False)
                if p.accept("kw", "desc"):
                    sort_cols.append(c.desc())
                else:
                    p.accept("kw", "asc")
                    sort_cols.append(c.asc())
                if not p.accept("op", ","):
                    break
            df = df.orderBy(*sort_cols)
        elif kind == "dissect":
            col = p.expect("id")[1]
            pat = p.next()
            if pat[0] != "str":
                raise UnsupportedQuery("ES|QL: DISSECT needs a pattern "
                                       "string")
            fields, regex = _dissect_regex(pat[1])
            for i, fname in enumerate(fields, 1):
                df = df.withColumn(
                    fname, F.regexp_extract(F.col(col), regex, i))
        elif kind == "grok":
            col = p.expect("id")[1]
            pat = p.next()
            if pat[0] != "str":
                raise UnsupportedQuery("ES|QL: GROK needs a pattern string")
            fields, regex = _grok_regex(pat[1])
            for i, fname in enumerate(fields, 1):
                df = df.withColumn(
                    fname, F.regexp_extract(F.col(col), regex, i))
        elif kind == "mv_expand":
            col = p.expect("id")[1]
            df = df.withColumn(col, F.explode(F.col(col)))
        elif kind == "lookup":
            # ES|QL LOOKUP JOIN (8.18): left join against a lookup-mode
            # index on a shared field name. Lookup indices are
            # single-shard/replicated by ES contract — i.e. small — so
            # the Spark shape is a broadcast hash join, like ENRICH but
            # table-addressed and joining on a SHARED column name.
            if not (p.peek()[0] == "id" and p.peek()[1].lower() == "join"):
                raise UnsupportedQuery("ES|QL: expected LOOKUP JOIN")
            p.next()
            lname = p.expect("id")[1]
            if lname not in tables:
                raise UnsupportedQuery(
                    f"ES|QL: unknown lookup index {lname!r}")
            if not (p.peek()[0] == "id" and p.peek()[1].lower() == "on"):
                raise UnsupportedQuery("ES|QL: LOOKUP JOIN needs ON <field>")
            p.next()
            key = p.expect("id")[1]
            side = tables[lname]
            if key not in side.columns:
                raise UnsupportedQuery(
                    f"ES|QL: lookup index {lname!r} has no field {key!r}")
            df = df.join(F.broadcast(side), key, "left")
        elif kind == "enrich":
            # ES|QL ENRICH policy ON key [WITH f1, f2]: the lookup join —
            # enrich policies are SMALL reference tables by contract
            # (ES materializes them onto every node; the Spark shape is
            # a broadcast hash join, no shuffle of the main stream)
            policy = p.next()[1]
            if policy not in (enrich_policies or {}):
                raise UnsupportedQuery(
                    f"ES|QL: unknown enrich policy {policy!r}")
            lookup, match_field = enrich_policies[policy]
            if not (p.peek()[0] == "id" and p.peek()[1].lower() == "on"):
                raise UnsupportedQuery("ES|QL: ENRICH needs ON <field>")
            p.next()
            key = p.expect("id")[1]
            cols = None
            if p.peek()[0] == "id" and p.peek()[1].lower() == "with":
                p.next()
                cols = [p.expect("id")[1]]
                while p.accept("op", ","):
                    cols.append(p.expect("id")[1])
            side = lookup
            if cols is not None:
                side = side.select(match_field, *cols)
            side = side.withColumnRenamed(match_field, "__enrich_key")
            df = (df.join(F.broadcast(side),
                          df[key] == F.col("__enrich_key"), "left")
                  .drop("__enrich_key"))
        elif kind == "limit":
            t = p.next()
            if t[0] != "num" or "." in t[1]:
                raise UnsupportedQuery("ES|QL: LIMIT needs an integer")
            if p.peek()[0] != "eof":  # 'LIMIT 5 extra' must raise (ADVICE r6)
                raise UnsupportedQuery("ES|QL: LIMIT takes a single integer")
            df = df.limit(int(t[1]))
        else:
            raise UnsupportedQuery(f"ES|QL: stage {kind.upper()} "
                                   "(supported: WHERE EVAL KEEP DROP "
                                   "RENAME STATS SORT LIMIT DISSECT GROK "
                                   "MV_EXPAND ENRICH LOOKUP JOIN)")
    return df
