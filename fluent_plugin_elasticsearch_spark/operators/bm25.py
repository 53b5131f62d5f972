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
