"""Deduplication operators for large-scale training-data pipelines:
exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale notes (the point of each design):

  * exact: hash-groupBy — Catalyst partial aggregation, one shuffle on the
    (fingerprint) key; at 100 TB use the md5 fingerprint (fixed 32 bytes)
    as the shuffle key, never the full text.
  * n-gram Jaccard / MinHash: candidate generation NEVER does the O(n²)
    cross join — pairs come from an equi-join on shingle/band buckets
    (shuffle on bucket key), so cost tracks bucket collision counts.
    Hot buckets (boilerplate shingles) are capped (`max_bucket`) — the
    standard guard against quadratic blowup on duplicated boilerplate.
  * hash functions are md5-derived so Spark and the DuckDB oracle compute
    identical signatures (no JVM-specific hashing in results).
  * SimHash: 64-bit signature via per-token md5 bit votes — vectorized
    pandas UDF (bit twiddling in numpy), hamming-distance candidate join on
    16-bit bands.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..extraction import simple_tokens_col


def normalize_text_col(c):
    """lower + collapse whitespace — shared doc normalization."""
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized text: keeps the smallest id per group.
    Returns (doc_id, group_size, fingerprint). One shuffle on the 32-byte
    fingerprint."""
    fp = F.md5(normalize_text_col(F.col(text_col)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), fp.alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("group_size"))
    )


def shingles_df(docs: DataFrame, n: int = 3, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) — distinct word n-grams from the simple tokenizer.
    Pure column expressions: transform over a token-array slide."""
    toks = simple_tokens_col(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)) - 0),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # drop tail grams shorter than n tokens (slice clamps at array end)
    grams = F.filter(grams, lambda g: F.size(F.split(g, " ")) == n)
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(grams)).alias("shingle"))
    )


def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, threshold: float = 0.8,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard ≥ threshold. Candidates from
    the shingle equi-join (doc pairs sharing ≥1 shingle); intersection
    counted per pair, union via per-doc shingle counts. `max_bucket` drops
    boilerplate shingles shared by too many docs (quadratic-blowup guard —
    a dropped shingle can only lower recall for pairs that share *only*
    boilerplate)."""
    sh = shingles_df(docs, n, id_col, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    hot = sh.groupBy("shingle").agg(F.count("*").alias("c")).filter(F.col("c") > max_bucket)
    sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = 16,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig: array<string>) — MinHash over word shingles. Hash k of
    a shingle is md5(k || '_' || shingle); signature element k is the
    minimum such hash. md5-based so the SQL oracle reproduces it exactly."""
    sh = shingles_df(docs, n, id_col, text_col)
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{k}_"), F.col("shingle")))).alias(f"h{k}")
        for k in range(num_hashes)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    return sig.select("doc_id", F.array(*[F.col(f"h{k}") for k in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(docs: DataFrame, n: int = 3, num_hashes: int = 16, bands: int = 4,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_bucket: int = 200) -> DataFrame:
    """LSH candidate pairs: signature split into `bands` bands of
    num_hashes/bands rows; docs sharing any full band collide. Returns
    (id_a, id_b, n_bands_shared). Shuffle key = (band_id, band_hash);
    hot buckets capped at max_bucket."""
    rows = num_hashes // bands
    sig = minhash_signatures(docs, n, num_hashes, id_col, text_col)
    band_cols = [
        F.struct(F.lit(bi).alias("band"), F.md5(F.concat_ws("|", *[F.col("sig")[bi * rows + r] for r in range(rows)])).alias("bh"))
        for bi in range(bands)
    ]
    buckets = sig.select("doc_id", F.explode(F.array(*band_cols)).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh")
    )
    hot = buckets.groupBy("band", "bh").agg(F.count("*").alias("c")).filter(F.col("c") > max_bucket)
    buckets = buckets.join(F.broadcast(hot.select("band", "bh")), ["band", "bh"], "left_anti")
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("n_bands_shared"))
    )


# --- SimHash ----------------------------------------------------------------

_SIMHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def _simhash_batch(pdf_iter):
    import hashlib

    for pdf in pdf_iter:
        out_ids, out_hashes = [], []
        for doc_id, toks in zip(pdf["doc_id"], pdf["tokens"]):
            votes = np.zeros(64, dtype=np.int64)
            for t, cnt in pd.Series(list(toks)).value_counts().items() if len(toks) else []:
                h = np.uint64(int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big"))
                bits = (h >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes += np.where(bits == np.uint64(1), cnt, -cnt)
            sig = int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())
            out_ids.append(doc_id)
            out_hashes.append(np.int64(np.uint64(sig)))  # two's-complement view
        yield pd.DataFrame({"doc_id": out_ids, "simhash": out_hashes})


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash:int64) — 64-bit SimHash from tf-weighted md5 bit
    votes, Arrow-batched (mapInPandas)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), simple_tokens_col(F.col(text_col)).alias("tokens")
    )
    return base.mapInPandas(_simhash_batch, _SIMHASH_SCHEMA)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Candidates via
    the 4×16-bit band trick (hamming ≤ 3 ⇒ at least one of 4 bands equal),
    exact hamming verified with bit_count on the XOR."""
    sig = simhash_signatures(docs, id_col, text_col)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.shiftrightunsigned(F.col("simhash"), 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
                )
                for i in range(4)
            ])
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
