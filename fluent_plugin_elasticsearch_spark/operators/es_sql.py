"""ES SQL API (_sql): translate the Elasticsearch SQL dialect's core
SELECT shape onto the engine.

Reference contract: ES exposes `POST /_sql {"query": "SELECT ..."}` over
the same indices the plugin writes (out_elasticsearch.rb ships docs; ES
SQL is the analyst-facing read surface). This module implements the
dialect's single-index analytic core — projection, WHERE (including
full-text MATCH() with SCORE()), GROUP BY + aggregates, HAVING, ORDER BY,
LIMIT — by PARSING the statement and lowering it to DataFrame operations,
so Catalyst sees a declarative plan (pushdown-able filters, partial
aggregates), never a string. Everything outside the subset raises
UnsupportedQuery loudly (JOINs, subqueries, windows, multi-MATCH), the
repo-wide raise-rather-than-silently-wrong rule.

MATCH(field, 'text') lowers to the engine's BM25 scorer
(operators/bm25.bm25_scores_df — identical formula/quantization to the
search path), left-joined on doc_id; MATCH is then the predicate
score_u > 0 and SCORE() surfaces the quantized integer score_u (the
engine-wide ×1e6 scale — documented deviation from ES's float SCORE(),
chosen so results are bit-comparable across engines).

Grammar (case-insensitive keywords):

    SELECT * | item [, item ...]          item := expr [AS alias]
    FROM <table>
    [WHERE expr]
    [GROUP BY name [, name ...]]
    [HAVING expr]
    [ORDER BY expr [ASC|DESC] [, ...]]
    [LIMIT n]

    expr := OR / AND / NOT / comparisons (= <> != < <= > >=) /
            IN (lit, ...) / BETWEEN a AND b / LIKE 'pat' /
            IS [NOT] NULL / + - * / % / unary - /
            ABS LOWER UPPER LENGTH ROUND FLOOR CEIL /
            MATCH(field, 'text') / SCORE()
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..plans.query_ast import UnsupportedQuery

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?)"
    r"|(?P<str>'(?:[^']|'')*')"
    r'|(?P<dstr>"(?:[^"\\]|\\.)*")'
    r"|(?P<id>[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)*)"
    r"|(?P<op><=|>=|<>|!=|==|=|<|>|\(|\)|,|\*|\+|-|/|%|\|))")

_KEYWORDS = {"select", "from", "where", "group", "by", "having", "order",
             "limit", "as", "and", "or", "not", "in", "between", "like",
             "is", "null", "asc", "desc", "distinct"}
_AGGS = {"count", "sum", "avg", "min", "max"}
_FUNCS = {"abs": F.abs, "lower": F.lower, "upper": F.upper,
          "length": F.length, "round": F.round, "floor": F.floor,
          "ceil": F.ceil, "concat": F.concat, "coalesce": F.coalesce,
          "trim": F.trim, "starts_with": F.startswith}
# special-lowered (not a 1:1 pyspark function): SUBSTRING (1-based with
# literal bounds), CASE (ES|QL's function-style cond/value chain)
_SPECIAL_FUNCS = {"substring", "case"}


def _tokenize(sql: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(sql):
        m = _TOKEN_RE.match(sql, pos)
        if not m:
            if sql[pos:].strip() == "":
                break
            raise UnsupportedQuery(f"ES SQL: cannot tokenize at {sql[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "num":
            out.append(("num", m.group("num")))
        elif m.lastgroup == "str":
            out.append(("str", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "dstr":
            # ES|QL string literal form (double-quoted, backslash escapes)
            body = m.group("dstr")[1:-1]
            out.append(("str", re.sub(r'\\(.)', r"\1", body)))
        elif m.lastgroup == "id":
            v = m.group("id")
            out.append(("kw", v.lower()) if v.lower() in _KEYWORDS
                       else ("id", v))
        else:
            out.append(("op", m.group("op")))
    return out


class _Parser:
    """Recursive-descent parser for the subset; emits tuple AST nodes:
    ("col", name) ("lit", v) ("bin", op, l, r) ("not", e) ("func", f, args)
    ("agg", f, arg|None, distinct) ("in", e, [lits]) ("between", e, lo, hi)
    ("like", e, pat) ("isnull", e, negated) ("match", field, text)
    ("score",)"""

    def __init__(self, toks: list[tuple[str, str]]):
        self.toks, self.i = toks, 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, typ, val=None):
        t = self.next()
        if t[0] != typ or (val is not None and t[1] != val):
            raise UnsupportedQuery(f"ES SQL: expected {val or typ}, got {t}")
        return t

    def accept(self, typ, val=None):
        t = self.peek()
        if t[0] == typ and (val is None or t[1] == val):
            self.i += 1
            return True
        return False

    # expression precedence: or < and < not < predicate < add < mul < unary
    def expr(self):
        e = self.and_expr()
        while self.accept("kw", "or"):
            e = ("bin", "or", e, self.and_expr())
        return e

    def and_expr(self):
        e = self.not_expr()
        while self.accept("kw", "and"):
            e = ("bin", "and", e, self.not_expr())
        return e

    def not_expr(self):
        if self.accept("kw", "not"):
            return ("not", self.not_expr())
        return self.predicate()

    def predicate(self):
        e = self.add_expr()
        t = self.peek()
        if t[0] == "op" and t[1] in ("=", "==", "<>", "!=", "<", "<=",
                                     ">", ">="):
            self.i += 1
            op = "=" if t[1] == "==" else t[1]
            return ("bin", op, e, self.add_expr())
        if t == ("kw", "in"):
            self.i += 1
            self.expect("op", "(")
            lits = [self.literal()]
            while self.accept("op", ","):
                lits.append(self.literal())
            self.expect("op", ")")
            return ("in", e, lits)
        if t == ("kw", "between"):
            self.i += 1
            lo = self.add_expr()
            self.expect("kw", "and")
            return ("between", e, lo, self.add_expr())
        if t == ("kw", "like"):
            self.i += 1
            pat = self.next()
            if pat[0] != "str":
                raise UnsupportedQuery("ES SQL: LIKE needs a string pattern")
            return ("like", e, pat[1])
        if t == ("kw", "is"):
            self.i += 1
            neg = self.accept("kw", "not")
            self.expect("kw", "null")
            return ("isnull", e, neg)
        return e

    def add_expr(self):
        e = self.mul_expr()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("+", "-"):
                self.i += 1
                e = ("bin", t[1], e, self.mul_expr())
            else:
                return e

    def mul_expr(self):
        e = self.unary()
        while True:
            t = self.peek()
            if t[0] == "op" and t[1] in ("*", "/", "%"):
                self.i += 1
                e = ("bin", t[1], e, self.unary())
            else:
                return e

    def unary(self):
        if self.peek() == ("op", "-"):
            self.i += 1
            return ("bin", "*", ("lit", -1), self.unary())
        return self.primary()

    def literal(self):
        t = self.next()
        if t[0] == "num":
            return ("lit", float(t[1]) if "." in t[1] else int(t[1]))
        if t[0] == "str":
            return ("lit", t[1])
        raise UnsupportedQuery(f"ES SQL: expected literal, got {t}")

    def primary(self):
        t = self.peek()
        if t[0] in ("num", "str"):
            return self.literal()
        if t == ("kw", "null"):
            self.i += 1
            return ("lit", None)
        if t == ("op", "("):
            self.i += 1
            e = self.expr()
            self.expect("op", ")")
            return e
        if t[0] == "id":
            name = self.next()[1]
            low = name.lower()
            if self.peek() == ("op", "("):
                self.i += 1
                if low == "score":
                    self.expect("op", ")")
                    return ("score",)
                if low == "match":
                    fld = self.expect("id")[1]
                    self.expect("op", ",")
                    txt = self.next()
                    if txt[0] != "str":
                        raise UnsupportedQuery(
                            "ES SQL: MATCH needs a string query")
                    self.expect("op", ")")
                    return ("match", fld, txt[1])
                if low in _AGGS:
                    if low == "count" and self.peek() == ("op", "*"):
                        self.i += 1
                        self.expect("op", ")")
                        return ("agg", "count", None, False)
                    distinct = self.accept("kw", "distinct")
                    arg = self.expr()
                    self.expect("op", ")")
                    return ("agg", low, arg, distinct)
                if low in _FUNCS or low in _SPECIAL_FUNCS:
                    args = [self.expr()]
                    while self.accept("op", ","):
                        args.append(self.expr())
                    self.expect("op", ")")
                    return ("func", low, args)
                raise UnsupportedQuery(f"ES SQL: function {name}()")
            return ("col", name)
        raise UnsupportedQuery(f"ES SQL: unexpected token {t}")


def _parse(sql: str) -> dict[str, Any]:
    p = _Parser(_tokenize(sql))
    p.expect("kw", "select")
    items: list[tuple[Any, str | None]] | None
    if p.accept("op", "*"):
        items = None
    else:
        items = []
        while True:
            e = p.expr()
            alias = None
            if p.accept("kw", "as"):
                alias = p.expect("id")[1]
            items.append((e, alias))
            if not p.accept("op", ","):
                break
    p.expect("kw", "from")
    table = p.expect("id")[1]
    q: dict[str, Any] = {"items": items, "table": table, "where": None,
                         "group": [], "having": None, "order": [],
                         "limit": None}
    if p.accept("kw", "where"):
        q["where"] = p.expr()
    if p.accept("kw", "group"):
        p.expect("kw", "by")
        q["group"].append(p.expect("id")[1])
        while p.accept("op", ","):
            q["group"].append(p.expect("id")[1])
    if p.accept("kw", "having"):
        q["having"] = p.expr()
    if p.accept("kw", "order"):
        p.expect("kw", "by")
        while True:
            e = p.expr()
            d = "asc"
            if p.accept("kw", "desc"):
                d = "desc"
            else:
                p.accept("kw", "asc")
            q["order"].append((e, d))
            if not p.accept("op", ","):
                break
    if p.accept("kw", "limit"):
        t = p.next()
        if t[0] != "num" or "." in t[1]:
            raise UnsupportedQuery("ES SQL: LIMIT needs an integer")
        q["limit"] = int(t[1])
    if p.peek()[0] != "eof":
        raise UnsupportedQuery(f"ES SQL: trailing input at {p.peek()}")
    return q


def _collect_matches(node, out: list):
    if not isinstance(node, tuple):
        return
    if node[0] == "match":
        out.append(node)
    for child in node[1:]:
        if isinstance(child, tuple):
            _collect_matches(child, out)
        elif isinstance(child, list):
            for c in child:
                _collect_matches(c if isinstance(c, tuple) else ("lit", c),
                                 out)


def _to_col(node, *, has_match: bool, allow_agg: bool = False) -> Column:
    kind = node[0]
    if kind == "lit":
        return F.lit(node[1])
    if kind == "col":
        return F.col(node[1])
    if kind == "score":
        if not has_match:
            raise UnsupportedQuery("ES SQL: SCORE() needs a MATCH() filter")
        return F.coalesce(F.col("score_u"), F.lit(0)).cast("long")
    if kind == "match":
        if not has_match:
            raise UnsupportedQuery("ES SQL: MATCH() belongs in WHERE")
        return F.coalesce(F.col("score_u"), F.lit(0)) > 0
    if kind == "not":
        return ~_to_col(node[1], has_match=has_match, allow_agg=allow_agg)
    if kind == "bin":
        op, ln, rn = node[1], node[2], node[3]
        l = _to_col(ln, has_match=has_match, allow_agg=allow_agg)
        r = _to_col(rn, has_match=has_match, allow_agg=allow_agg)
        return {"and": l & r, "or": l | r, "=": l == r, "<>": l != r,
                "!=": l != r, "<": l < r, "<=": l <= r, ">": l > r,
                ">=": l >= r, "+": l + r, "-": l - r, "*": l * r,
                "/": l / r, "%": l % r}[op]
    if kind == "in":
        e = _to_col(node[1], has_match=has_match, allow_agg=allow_agg)
        return e.isin([lit[1] for lit in node[2]])
    if kind == "between":
        e = _to_col(node[1], has_match=has_match, allow_agg=allow_agg)
        lo = _to_col(node[2], has_match=has_match, allow_agg=allow_agg)
        hi = _to_col(node[3], has_match=has_match, allow_agg=allow_agg)
        return (e >= lo) & (e <= hi)
    if kind == "like":
        return _to_col(node[1], has_match=has_match).like(node[2])
    if kind == "isnull":
        e = _to_col(node[1], has_match=has_match)
        return e.isNotNull() if node[2] else e.isNull()
    if kind == "func":
        if node[1] == "substring":
            # ES|QL SUBSTRING(str, start[, length]) — 1-based, literal
            # bounds (Spark's substring takes ints, not columns)
            args = node[2]
            if len(args) not in (2, 3) or any(
                    a[0] != "lit" or not isinstance(a[1], int)
                    for a in args[1:]):
                raise UnsupportedQuery(
                    "SUBSTRING needs (expr, int-literal start[, length])")
            s = _to_col(args[0], has_match=has_match, allow_agg=allow_agg)
            start = args[1][1]
            ln = args[2][1] if len(args) == 3 else (1 << 30)
            return F.substring(s, start, ln)
        if node[1] == "case":
            # ES|QL CASE(cond1, val1[, cond2, val2 ...][, default])
            args = [_to_col(a, has_match=has_match, allow_agg=allow_agg)
                    for a in node[2]]
            if len(args) < 2:
                raise UnsupportedQuery("CASE needs cond, value pairs")
            out = None
            i = 0
            while i + 1 < len(args):
                out = (F.when(args[i], args[i + 1]) if out is None
                       else out.when(args[i], args[i + 1]))
                i += 2
            if i < len(args):  # trailing default
                out = out.otherwise(args[i])
            return out
        fn = _FUNCS[node[1]]
        return fn(*[_to_col(a, has_match=has_match, allow_agg=allow_agg)
                    for a in node[2]])
    if kind == "agg":
        if not allow_agg:
            raise UnsupportedQuery(
                "ES SQL: aggregate outside SELECT/HAVING of a GROUP BY")
        f, arg, distinct = node[1], node[2], node[3]
        if f == "count" and arg is None:
            return F.count(F.lit(1))
        c = _to_col(arg, has_match=has_match)
        if distinct:
            if f != "count":
                raise UnsupportedQuery("ES SQL: DISTINCT only with COUNT")
            return F.countDistinct(c)
        return {"count": F.count, "sum": F.sum, "avg": F.avg,
                "min": F.min, "max": F.max}[f](c)
    raise UnsupportedQuery(f"ES SQL: node {kind}")


def _contains_agg(node) -> bool:
    if not isinstance(node, tuple):
        return False
    if node[0] == "agg":
        return True
    for c in node[1:]:
        if isinstance(c, tuple) and _contains_agg(c):
            return True
        if isinstance(c, list) and any(
                isinstance(x, tuple) and _contains_agg(x) for x in c):
            return True
    return False


def es_sql_query(tables: dict[str, DataFrame], sql: str,
                 id_col: str = "doc_id",
                 match_scorer=None) -> DataFrame:
    """Run one ES SQL statement against named tables. `match_scorer`
    overrides the MATCH() lowering (signature (docs, terms) ->
    (doc_id, score_u)); default is the engine's BM25 DataFrame scorer —
    an InvertedIndex-backed callable slots in for serving."""
    q = _parse(sql)
    if q["table"] not in tables:
        raise UnsupportedQuery(f"ES SQL: unknown index {q['table']!r}")
    df = tables[q["table"]]

    matches: list = []
    if q["where"] is not None:
        _collect_matches(q["where"], matches)
    if len(matches) > 1:
        raise UnsupportedQuery("ES SQL: one MATCH() per statement")
    has_match = bool(matches)
    if has_match:
        from ..extraction import simple_tokens_col  # noqa: F401  (doc link)
        from .bm25 import bm25_scores_df

        _, fld, txt = matches[0]
        terms = [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        if not terms:
            raise UnsupportedQuery("ES SQL: empty MATCH() query")
        scorer = match_scorer or (
            lambda d, ts: bm25_scores_df(d, ts, id_col=id_col, text_col=fld))
        scores = scorer(df, terms)
        df = df.join(scores.select(F.col(id_col).alias("__mid"), "score_u"),
                     df[id_col] == F.col("__mid"), "left").drop("__mid")

    if q["where"] is not None:
        df = df.filter(_to_col(q["where"], has_match=has_match))

    items = q["items"]
    if q["group"]:
        if items is None:
            raise UnsupportedQuery("ES SQL: SELECT * with GROUP BY")
        keys = list(q["group"])
        aggs, names = [], []
        for e, alias in items:
            if e[0] == "col" and e[1] in keys:
                names.append(alias or e[1])
                if alias and alias != e[1]:
                    raise UnsupportedQuery(
                        "ES SQL: aliasing a GROUP BY key is unsupported")
                continue
            if not _contains_agg(e):
                raise UnsupportedQuery(
                    f"ES SQL: non-aggregate SELECT item {e} under GROUP BY")
            if alias is None:
                raise UnsupportedQuery(
                    "ES SQL: aggregate SELECT items need AS aliases")
            aggs.append(_to_col(e, has_match=has_match, allow_agg=True)
                        .alias(alias))
            names.append(alias)
        out = df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)
        if q["having"] is not None:
            out = out.filter(_to_col(q["having"], has_match=has_match,
                                     allow_agg=False))
        out = out.select(*names)
    else:
        if q["having"] is not None:
            raise UnsupportedQuery("ES SQL: HAVING needs GROUP BY")
        # ORDER BY may reference SCORE() or columns not projected, so sort
        # (and limit) the base frame first, then project — the engine-wide
        # select-after-orderBy pattern. SELECT aliases used in ORDER BY
        # are substituted with their defining expression (ES SQL allows
        # ordering by an alias; the base frame doesn't carry it yet).
        alias_map = {alias: e for e, alias in (items or []) if alias}
        out = df
        if q["order"]:
            sort_cols = []
            for e, d in q["order"]:
                if e[0] == "col" and e[1] in alias_map:
                    e = alias_map[e[1]]
                c = _to_col(e, has_match=has_match)
                sort_cols.append(c.desc() if d == "desc" else c.asc())
            out = out.orderBy(*sort_cols)
        if q["limit"] is not None:
            out = out.limit(q["limit"])
        if items is None:
            base_cols = [c for c in tables[q["table"]].columns]
            return out.select(*base_cols)
        cols = []
        for e, alias in items:
            c = _to_col(e, has_match=has_match)
            if alias:
                c = c.alias(alias)
            elif e[0] == "col":
                c = c.alias(e[1])
            else:
                raise UnsupportedQuery(
                    "ES SQL: computed SELECT items need AS aliases")
            cols.append(c)
        return out.select(*cols)

    # GROUP BY tail: ORDER BY / LIMIT over the aggregated frame (aliases)
    if q["order"]:
        sort_cols = []
        for e, d in q["order"]:
            c = _to_col(e, has_match=has_match)
            sort_cols.append(c.desc() if d == "desc" else c.asc())
        out = out.orderBy(*sort_cols)
    if q["limit"] is not None:
        out = out.limit(q["limit"])
    return out
