"""Pure-DataFrame BM25 top-k (no binary codec) + paired ANSI-SQL generator.

This is the declarative form of the scoring pipeline — every step is a
Catalyst-planned aggregate/join (predicate pushdown, partial aggregation,
broadcast joins come free). It is used (a) as the SQL-oracle-matched
correctness surface (the generated DuckDB SQL is the same dataflow,
token-for-token in formula order, so float64 results agree), and (b) as a
reference semantics for the compressed/WAND engine (tests assert
rank-identity between the two).

Scores are reported as ``score_u = floor(score * 1e6)`` (bigint): a
rounding-mode-free quantization that both Spark and DuckDB compute
identically, dodging HALF_UP vs HALF_EVEN mismatches on value hashing.

Quantization contract (why the floor is safe to hash): floating-point sums
are order-sensitive, so BOTH engines accumulate each doc's per-term
contributions SEQUENTIALLY IN TERM-ASCENDING ORDER — Spark via a
collect_list → array_sort → aggregate() left fold, DuckDB via
``list_sum(list(contrib ORDER BY term))`` (verified exact sequential
addition), and the WAND/exhaustive engine paths sum term-asc as well
(wand.py). With identical addend order the only residual divergence is
libm ulp (ln), absorbed by the 1e-6 quantum away from floor boundaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..extraction import simple_tokens_col


def bm25_topk_df(docs: DataFrame, query_terms: list[str], k: int = 10,
                 id_col: str = "doc_id", text_col: str = "text",
                 k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """Top-k BM25 over a docs table via DataFrame ops only.
    Returns (doc_id, score_u) with tie-break (score desc, doc_id asc)."""
    terms = sorted(set(query_terms))
    toks = docs.select(
        F.col(id_col).alias("doc_id"), simple_tokens_col(F.col(text_col)).alias("tokens")
    )
    stats = toks.agg(F.count("*").alias("n"), F.avg(F.size("tokens")).alias("avgdl"))
    base = toks.select("doc_id", F.size("tokens").alias("dl"), F.explode("tokens").alias("term"))
    tfq = (
        base.filter(F.col("term").isin(terms))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfq = tfq.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tfq.join(F.broadcast(dfq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "contrib",
            F.log(1.0 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (k1 + 1.0)
            * F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
        )
    )
    # order-deterministic sum: fold contributions term-asc (see module doc)
    return (
        scored.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("term", "contrib"))).alias("cs"))
        .select(
            "doc_id",
            F.floor(
                F.aggregate(F.col("cs"), F.lit(0.0), lambda acc, x: acc + x["contrib"]) * 1e6
            ).cast("long").alias("score_u"),
        )
        .orderBy(F.desc("score_u"), F.asc("doc_id"))
        .limit(k)
    )


def match_phrase_df(docs: DataFrame, phrase_terms: list[str], k: int = 10,
                    id_col: str = "doc_id", text_col: str = "text",
                    k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """ES `match_phrase` with Lucene PhraseQuery scoring: the phrase acts
    as one synthetic term whose tf is the PHRASE FREQUENCY (count of exact
    adjacent occurrences) and whose idf is the SUM of the constituent
    terms' idfs. Adjacency is checked JVM-side with element_at over the
    token array (whole-stage codegen, no Python). Returns (doc_id,
    score_u), tie-break (score desc, doc_id asc). Mirrored exactly by
    match_phrase_sql."""
    n_terms = len(phrase_terms)
    if n_terms == 0:
        raise ValueError("empty phrase")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), simple_tokens_col(F.col(text_col)).alias("tokens")
    )
    stats = toks.agg(F.count("*").alias("n"), F.avg(F.size("tokens")).alias("avgdl"))
    base = toks.select("doc_id", F.size("tokens").alias("dl"), "tokens")

    def occurs_at(i):
        cond = F.lit(True)
        for j, t in enumerate(phrase_terms):
            cond = cond & (F.element_at(F.col("tokens"), i + j) == F.lit(t))
        return cond

    # guard: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so gate the
    # aggregate on there being at least one candidate start position
    upper = F.size("tokens") - n_terms + 1
    pf = F.when(
        upper >= 1,
        F.aggregate(
            F.sequence(F.lit(1), upper),
            F.lit(0),
            lambda acc, i: acc + F.when(occurs_at(i), F.lit(1)).otherwise(F.lit(0)),
        ),
    ).otherwise(F.lit(0))
    matched = base.withColumn("pf", pf).filter(F.col("pf") > 0)
    # per-term global df (docs containing the term anywhere)
    dfs = [
        toks.select(
            F.sum(F.when(F.array_contains("tokens", t), 1).otherwise(0)).alias(f"df{i}")
        )
        for i, t in enumerate(phrase_terms)
    ]
    df_all = dfs[0]
    for d in dfs[1:]:
        df_all = df_all.crossJoin(d)
    scored = matched.crossJoin(F.broadcast(stats)).crossJoin(F.broadcast(df_all))
    # idf sum in FIXED phrase order — identical expression order in the SQL
    idf_sum = None
    for i in range(n_terms):
        idf_i = F.log(1.0 + (F.col("n") - F.col(f"df{i}") + 0.5) / (F.col(f"df{i}") + 0.5))
        idf_sum = idf_i if idf_sum is None else idf_sum + idf_i
    score = (
        idf_sum * (k1 + 1.0) * F.col("pf")
        / (F.col("pf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        scored.select("doc_id", F.floor(score * 1e6).cast("long").alias("score_u"))
        .orderBy(F.desc("score_u"), F.asc("doc_id"))
        .limit(k)
    )


def match_phrase_sql(table: str, phrase_terms: list[str], k: int = 10,
                     id_col: str = "doc_id", text_col: str = "text",
                     k1: float = BM25_K1, b: float = BM25_B) -> str:
    """DuckDB mirror of match_phrase_df — same tokenizer, same phrase-freq
    definition, same idf-sum order, same quantization."""
    n_terms = len(phrase_terms)
    lit = lambda t: "'" + t.replace("'", "''") + "'"  # noqa: E731
    adj = " AND ".join(
        f"tokens[i + {j}] = {lit(t)}" for j, t in enumerate(phrase_terms)
    )
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN list_contains(tokens, {lit(t)}) THEN 1 ELSE 0 END) AS df{i}"
        for i, t in enumerate(phrase_terms)
    )
    idf_sum = " + ".join(
        f"ln(1.0 + (s.n - d.df{i} + 0.5) / (d.df{i} + 0.5))" for i in range(n_terms)
    )
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'),
                     t -> t <> '') AS tokens
  FROM {table}
),
stats AS (SELECT count(*) AS n, avg(len(tokens)) AS avgdl FROM toks),
dfs AS (SELECT {df_cols} FROM toks),
matched AS (
  SELECT doc_id, len(tokens) AS dl,
         list_sum(list_transform(
           generate_series(1, greatest(len(tokens) - {n_terms - 1}, 0)),
           i -> CASE WHEN {adj} THEN 1 ELSE 0 END)) AS pf
  FROM toks
)
SELECT m.doc_id,
       CAST(floor(({idf_sum}) * {k1 + 1.0} * m.pf
            / (m.pf + {k1} * (1.0 - {b} + {b} * m.dl / s.avgdl)) * 1e6) AS BIGINT) AS score_u
FROM matched m CROSS JOIN stats s CROSS JOIN dfs d
WHERE m.pf > 0
ORDER BY score_u DESC, doc_id ASC
LIMIT {k}
"""


def bm25_topk_sql(table: str, query_terms: list[str], k: int = 10,
                  id_col: str = "doc_id", text_col: str = "text",
                  k1: float = BM25_K1, b: float = BM25_B) -> str:
    """DuckDB SQL computing the exact same result as bm25_topk_df — same
    tokenizer regex, same formula term order, same quantization."""
    terms = sorted(set(query_terms))
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'),
                     t -> t <> '') AS tokens
  FROM {table}
),
stats AS (SELECT count(*) AS n, avg(len(tokens)) AS avgdl FROM toks),
base AS (SELECT doc_id, len(tokens) AS dl, unnest(tokens) AS term FROM toks),
tfq AS (
  SELECT doc_id, dl, term, count(*) AS tf
  FROM base WHERE term IN ({in_list})
  GROUP BY doc_id, dl, term
),
dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY term),
scored AS (
  SELECT t.doc_id, t.term,
         ln(1.0 + (s.n - d.df + 0.5) / (d.df + 0.5))
           * {k1 + 1.0} * t.tf
           / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl)) AS contrib
  FROM tfq t JOIN dfq d USING (term) CROSS JOIN stats s
)
SELECT doc_id,
       CAST(floor(list_sum(list(contrib ORDER BY term)) * 1e6) AS BIGINT) AS score_u
FROM scored
GROUP BY doc_id
ORDER BY score_u DESC, doc_id ASC
LIMIT {k}
"""
