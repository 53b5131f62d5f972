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
from .caching import pin


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
    boilerplate). Score bias note: per-doc counts are taken BEFORE the
    hot-shingle filter while intersections are counted AFTER, so dropped
    boilerplate still inflates the union denominator — reported Jaccard is
    a slight UNDER-estimate for pairs containing hot shingles (recall-safe
    for the ≥ threshold cut, never a false positive).

    Scale note: this is the EXACT-Jaccard path — at corpus scale run it on
    a candidate subset (e.g. docs surfaced by minhash_lsh_pairs, the LSH
    scale path) rather than the whole corpus: the shingle-level
    intersection join grows with Σ c² over shingle buckets, which is the
    cost exactness costs."""
    # persist at the fan-out: sh feeds sizes + hot + BOTH self-join sides —
    # without it the tokenize/shingle pipeline re-executes 4x (self-joins
    # get no ReusedExchange; measured 4x wall on the 600k corpus)
    sh = pin(shingles_df(docs, n, id_col, text_col))
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


def ngram_overlap_topk(docs: DataFrame, n: int = 2, k: int = 20,
                       id_col: str = "doc_id", text_col: str = "text",
                       max_bucket: int = 1000) -> DataFrame:
    """Top-k doc pairs by shared distinct n-grams — the candidate stage of
    ngram_jaccard_pairs exposed as a standalone query, with the hot-shingle
    cap INTACT (this is the copy-paste-able form; never ship the uncapped
    join). Returns (id_a, id_b, inter) ordered (inter desc, id_a, id_b)."""
    sh = pin(shingles_df(docs, n, id_col, text_col))  # hot + both join sides
    hot = sh.groupBy("shingle").agg(F.count("*").alias("c")).filter(F.col("c") > max_bucket)
    sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return inter.orderBy(F.desc("inter"), F.asc("id_a"), F.asc("id_b")).limit(k)


def minhash_signatures(docs: DataFrame, n: int = 3, num_hashes: int = 16,
                       id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, sig: array<long>) — MinHash over word shingles, Carter-
    Wegman style: ONE md5 per shingle (its two 48-bit hex halves a, b),
    hash k = a + k·b (< 2^53, exact in int64 AND float64), signature
    element k = min over the doc's shingles. One md5 instead of
    `num_hashes` md5s per shingle row — at 600k docs that is ~70M vs 1.1B
    digest calls — and still integer-exactly reproducible by the DuckDB
    oracle. Catalyst subexpression elimination computes the md5/conv pair
    once per row across all `num_hashes` aggregates."""
    sh = shingles_df(docs, n, id_col, text_col)
    md5c = F.md5(F.col("shingle"))
    # (a, b) PROJECTED before the aggregation: one md5/conv per shingle row
    # guaranteed (agg-side update expressions are not reliably
    # subexpression-eliminated), aggregates do pure arithmetic
    ab = sh.select(
        "doc_id",
        F.conv(F.substring(md5c, 1, 12), 16, 10).cast("long").alias("__a"),
        F.conv(F.substring(md5c, 13, 12), 16, 10).cast("long").alias("__b"),
    )
    aggs = [F.min(F.col("__a") + k * F.col("__b")).alias(f"h{k}") for k in range(num_hashes)]
    sig = ab.groupBy("doc_id").agg(*aggs)
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
    buckets = pin(buckets)  # feeds hot-bucket count + BOTH self-join sides: without the
    # persist the full signature aggregation re-executes 4x (no
    # ReusedExchange across self-join sides; measured 740s -> see COVERAGE)
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


def connected_components(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """Duplicate-cluster labeling: given near-dup pairs, assign every doc
    `cluster_id` = the minimum doc id reachable through the pair graph
    (the canonical representative; dedup keeps one doc per cluster).

    Algorithm: min-label propagation with POINTER JUMPING — each round
    every vertex takes (a) the min of its own and its neighbors' labels,
    then (b) its label's label (path doubling), so convergence is
    O(log diameter) rounds, not O(diameter). Each round is two shuffles on
    vertex id (bucket/co-partition on a real cluster). Two iterative-Spark
    essentials: `localCheckpoint(eager=True)` per round TRUNCATES the
    logical plan (persist alone leaves a growing lineage whose analysis
    cost explodes exponentially with rounds), and the driver only reads an
    O(1) convergence count per round — the GraphX/Pregel pattern."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # (a) neighbor min (labels monotonically decrease; l(v) <= v)
        neighbor_min = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.min("cluster_id").alias("nmin"))
        )
        stepped = (
            labels.join(neighbor_min, "id", "left")
            .select("id", F.least("cluster_id", F.coalesce("nmin", "cluster_id")).alias("cluster_id"))
        )
        # (b) pointer jump: follow cluster_id -> its own label (l(l(v)))
        parent = labels.select(F.col("id").alias("__pid"), F.col("cluster_id").alias("__pcl"))
        jumped = (
            stepped.join(parent, stepped["cluster_id"] == parent["__pid"], "left")
            .select("id", F.least("cluster_id", F.coalesce("__pcl", "cluster_id")).alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            jumped.withColumnRenamed("cluster_id", "new")
            .join(labels, "id")
            .filter(F.col("new") != F.col("cluster_id"))
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    return labels.select(F.col("id").alias("doc_id"), "cluster_id")


# --- SimHash ----------------------------------------------------------------

_SIMHASH_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
)


def dedup_apply(docs: DataFrame, pairs: DataFrame,
                id_col: str = "doc_id") -> DataFrame:
    """Keep-canonical near-dup removal: label the candidate-pair graph's
    connected components (pointer-jumping CC) and keep exactly ONE doc
    per cluster — the minimum doc id, the deterministic canonical
    survivor; docs in no pair pass through untouched. The loser set is
    |duplicates|-sized and removes via a left-anti join on the id — the
    corpus is never reshuffled beyond that join. This is the standard
    tail of a MinHash/SimHash fuzzy-dedup pipeline (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better")."""
    cl = connected_components(pairs)
    losers = (cl.filter(F.col("doc_id") != F.col("cluster_id"))
              .select(F.col("doc_id").alias("__loser_id")))
    return docs.join(
        losers, docs[id_col] == F.col("__loser_id"), "left_anti")


def _simhash_batch(pdf_iter):
    """Batch-vectorized SimHash: tokens are factorized ACROSS the whole
    Arrow batch, each unique vocab entry is md5-hashed exactly once, and the
    per-doc bit votes are one np.add.at scatter of tf-weighted ±1 sign rows
    — no per-doc or per-token Python in the hot path (the only remaining
    loop is md5 over the batch-unique vocab, which is smaller than the
    token stream by the batch's redundancy factor)."""
    import hashlib

    shifts = np.arange(64, dtype=np.uint64)
    for pdf in pdf_iter:
        n = len(pdf)
        doc_ids = pdf["doc_id"].to_numpy()
        tok_lists = [list(t) for t in pdf["tokens"]]
        lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
        total = int(lens.sum())
        if total == 0:
            yield pd.DataFrame({"doc_id": doc_ids, "simhash": np.zeros(n, dtype=np.int64)})
            continue
        flat = np.empty(total, dtype=object)
        flat[:] = [t for toks in tok_lists for t in toks]
        codes, vocab = pd.factorize(pd.Series(flat))
        doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
        # tf per (doc, vocab-code): group on the combined integer key
        V = len(vocab)
        key = doc_idx * V + codes
        uniq_keys, tf = np.unique(key, return_counts=True)
        u_doc = (uniq_keys // V).astype(np.int64)
        u_code = (uniq_keys % V).astype(np.int64)
        # hash the unique vocab ONCE; bit matrix (V, 64) as bool
        hv = np.fromiter(
            (int.from_bytes(hashlib.md5(t.encode("utf-8")).digest()[:8], "big") for t in vocab),
            dtype=np.uint64, count=V,
        )
        bits = ((hv[:, None] >> shifts[None, :]) & np.uint64(1)).astype(bool)
        # votes_k = Σ tf·(+1 if bit else −1) = 2·Σ tf[bit set] − Σ tf —
        # 64 weighted bincounts instead of materializing the (entries × 64)
        # tf·sign product (which was a ~0.5 GB intermediate per Arrow batch)
        tch = tf.astype(np.float64)
        base = np.bincount(u_doc, weights=tch, minlength=n)
        sigs = np.zeros(n, dtype=np.uint64)
        entry_bits = bits[u_code]  # (entries, 64) bool — 8x smaller than int64
        for k in range(64):
            mask = entry_bits[:, k]
            pos = np.bincount(u_doc[mask], weights=tch[mask], minlength=n)
            sigs |= ((2.0 * pos - base) > 0).astype(np.uint64) << shifts[k]
        yield pd.DataFrame({"doc_id": doc_ids, "simhash": sigs.astype(np.int64)})


def simhash_signatures(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash:int64) — 64-bit SimHash from tf-weighted md5 bit
    votes, Arrow-batched (mapInPandas)."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), simple_tokens_col(F.col(text_col)).alias("tokens")
    )
    return base.mapInPandas(_simhash_batch, _SIMHASH_SCHEMA)


def simhash_pairs(docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id",
                  text_col: str = "text", max_bucket: int = 1000) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Candidates via
    the 4×16-bit band trick (hamming ≤ 3 ⇒ at least one of 4 bands equal),
    exact hamming verified with bit_count on the XOR. `max_bucket` caps hot
    band buckets (template-heavy corpora concentrate signatures into a few
    16-bit patterns — an uncapped band self-join is quadratic in the hot
    bucket; recall loss is confined to pairs that collide ONLY there)."""
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
    bands = pin(bands)  # hot count + both self-join sides reuse one pass
    hot = bands.groupBy("band", "bh").agg(F.count("*").alias("c")).filter(F.col("c") > max_bucket)
    bands = bands.join(F.broadcast(hot.select("band", "bh")), ["band", "bh"], "left_anti")
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


def contamination_check(docs: DataFrame, benchmark: DataFrame, n: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        bench_id_col: str = "bench_id",
                        bench_text_col: str = "text",
                        broadcast_benchmark: bool = True) -> DataFrame:
    """Benchmark-contamination detection for training corpora: which docs
    share at least one word n-gram with an eval/benchmark document
    (the public decontamination recipe — GPT-3 used 13-grams, Gopher 8).

    Plan: distinct n-grams on both sides, equi-join on the gram. The
    benchmark side is eval-set-sized (thousands of docs) so its exploded
    grams broadcast by default and the corpus is never shuffled; pass
    broadcast_benchmark=False for a giant benchmark and AQE picks the
    strategy. Returns (doc_id, bench_id, n_shared_grams) ordered for
    review, one row per contaminated (doc, benchmark-doc) pair."""
    doc_grams = shingles_df(docs, n, id_col, text_col)
    bench_grams = shingles_df(benchmark, n, bench_id_col, bench_text_col
                              ).withColumnRenamed("doc_id", "bench_id")
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    return (
        doc_grams.join(bench_grams, "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .orderBy(F.desc("n_shared_grams"), F.asc("doc_id"), F.asc("bench_id"))
    )
