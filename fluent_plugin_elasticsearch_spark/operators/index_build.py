"""Inverted-index build — the engine-side half of the reference's
`client.bulk` indexing path (out_elasticsearch.rb:1158, SURVEY.md Q6).

Design (Spark-first, sized for 10^12 docs / 1000 executors):

  * **Doc-sharded layout.** Documents are hash-sharded (``shard =
    pmod(xxhash64(id), n_shards)``); each shard holds complete posting
    lists for its documents. Queries fan out per shard, compute a local
    top-k, then merge — the classic distributed-search architecture, and
    the layout that keeps query-time work proportional to query terms.
  * **Salted two-phase build.** Head terms (stopword-scale lists) would
    make a single ``groupBy(term)`` reducer a straggler. Phase 1 groups by
    ``(shard, term, salt)`` with ``salt = pmod(xxhash64(doc_id), n_salts)``
    and emits *compressed sorted partials*; phase 2 merges the (already
    compact) partials per ``(shard, term)`` and re-blocks. The heavy
    token-level shuffle is therefore always split ``n_salts`` ways —
    explicit skew handling per the north rule; AQE skew-join does not
    cover aggregation skew.
  * **Posting blocks** of 128 entries: delta-gap+varint doc ids, varint
    tfs, varint doc lengths (dl inline ⇒ query needs NO doc_stats join),
    and ``max_tfn`` — the idf-independent BM25 upper-bound factor — so
    block-max WAND bounds are ``idf × max_tfn`` with idf resolved at query
    time from the tiny per-term df lookup.
  * **Everything vectorized**: tokenization via Arrow pandas UDFs
    (extraction.py), tf/df/doc-len via Catalyst hash aggregates,
    encode/merge via numpy inside ``applyInPandas`` (no per-row Python).
  * **Resumable**: ``build_index`` can run shard-batch by shard-batch; a
    ``_manifest`` parquet records per-shard lineage (run id, app id,
    timestamps) + metrics (docs, postings, blocks, bytes, wall seconds);
    completed shards are skipped on restart (north rule: "resumable from
    checkpoint with per-partition lineage + metrics").

Storage layout under ``out_dir`` (parquet; Iceberg DDL is the cluster
path — the sandbox image has no Iceberg runtime jar, the layout maps 1:1
onto an Iceberg table partitioned by ``shard``):

    postings/shard=K/*.parquet   (term, block_id, n_docs, first_doc,
                                  last_doc, docs_enc, tfs_enc, dls_enc,
                                  max_tfn)   sorted by (term, first_doc)
    doc_stats/shard=K/*.parquet  (doc_id, doc_len[, url])
    term_stats/*.parquet         (term, df)           sorted by term
    _manifest/*.parquet          per-shard lineage + metrics rows
    meta.json                    corpus stats + codec/scoring params
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from ..extraction import (
    extract_text_udf,
    simple_tokens_col,
    tokenize_simple_tf_html_udf,
    tokenize_simple_tf_udf,
    tokenize_simple_udf,
    tokenize_unicode_tf_html_udf,
    tokenize_unicode_tf_udf,
    tokenize_unicode_udf,
)
from .codec import BLOCK_SIZE, delta_encode, varint_encode

PARTIAL_SCHEMA = (
    "shard int, term string, term_bucket int, salt int, n_docs int, "
    "docs_enc binary, tfs_enc binary, dls_enc binary"
)
N_TERM_BUCKETS = 64  # phase-2 merge granularity within a shard

# Conservative in-task footprint per corpus token in a phase-1 pandas group
# (per-doc tf-map entries: object header + short string + two ints). Used
# only for the group-memory warning, never for allocation.
PHASE1_BYTES_PER_TOKEN = 64
BLOCK_SCHEMA = (
    "shard int, term string, block_id int, n_docs int, first_doc long, "
    "last_doc long, docs_enc binary, tfs_enc binary, dls_enc binary, max_tfn double"
)

TOKENIZERS = {
    "unicode": lambda c: tokenize_unicode_udf(c),
    "simple_udf": lambda c: tokenize_simple_udf(c),
    "simple": simple_tokens_col,  # pure-JVM fast path
}

TF_TOKENIZERS = {
    "unicode": tokenize_unicode_tf_udf,
    "simple_udf": tokenize_simple_tf_udf,
    "simple": tokenize_simple_tf_udf,
}

TF_HTML_TOKENIZERS = {
    "unicode": tokenize_unicode_tf_html_udf,
    "simple_udf": tokenize_simple_tf_html_udf,
    "simple": tokenize_simple_tf_html_udf,
}


def with_doc_id(docs: DataFrame, url_col: str = "url", out_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic non-negative 63-bit doc id from the natural
    key (url — the reference's `id_key`, out_elasticsearch.rb:103). Same
    (url → id) mapping on any cluster size; used by both engine and oracle."""
    return docs.withColumn(out_col, F.shiftrightunsigned(F.xxhash64(F.col(url_col)), 1))


def tokens_df(docs: DataFrame, id_col: str, text_col: str | None = None,
              html_col: str | None = None, tokenizer: str = "unicode") -> DataFrame:
    """(id, tokens) with text extracted from html if needed. Extraction and
    tokenization both Arrow-vectorized."""
    if text_col is None:
        if html_col is None:
            raise ValueError("need text_col or html_col")
        docs = docs.withColumn("__text", extract_text_udf(F.col(html_col)))
        text_col = "__text"
    return docs.withColumn("tokens", TOKENIZERS[tokenizer](F.col(text_col)))


def _hash_bucket(terms: np.ndarray, n_buckets: int = N_TERM_BUCKETS) -> np.ndarray:
    # deterministic cross-process string bucket (python hash() is salted
    # per worker — it would scatter one term's partials across buckets)
    from zlib import crc32

    return np.array([crc32(t.encode("utf-8")) for t in terms], dtype=np.int64) % n_buckets


def _encode_partials(pdf: pd.DataFrame) -> pd.DataFrame:
    """Phase 1 applyInPandas over one (shard, salt) group of DOC rows
    (doc_id, doc_len, tfs:map<term,tf>) → one compressed sorted partial row
    per term. The map explosion happens HERE, python-side: shuffling the
    compact per-doc maps instead of exploded (doc, term, tf) rows cuts the
    phase-1 shuffle ~20x (the exploded shuffle measured superlinear
    slowdown under high task parallelism from spill). Encoding is one
    segmented varint pass (codec.varint_encode_segments)."""
    from itertools import chain

    from .codec import delta_encode_segments, varint_encode_segments

    # Arrow map → pandas cell is a dict (or list[(k, v)] on some versions)
    tfs_col = [m.items() if isinstance(m, dict) else m for m in pdf["tfs"]]
    counts = np.fromiter((len(m) for m in tfs_col), dtype=np.int64, count=len(pdf))
    total = int(counts.sum())
    ids = np.repeat(pdf["doc_id"].to_numpy().astype(np.uint64), counts)
    dls = np.repeat(pdf["doc_len"].to_numpy().astype(np.uint64), counts)
    flat = list(chain.from_iterable(tfs_col))
    terms = np.empty(total, dtype=object)
    terms[:] = [kv[0] for kv in flat]
    tfv = np.fromiter((kv[1] for kv in flat), dtype=np.uint64, count=total)

    codes, uniq_terms = pd.factorize(pd.Series(terms))
    order = np.lexsort((ids, codes))
    codes_s, ids_s, tfs_s, dls_s = codes[order], ids[order], tfv[order], dls[order]
    starts = np.nonzero(np.diff(codes_s, prepend=-1))[0]
    n_docs = np.diff(np.append(starts, codes_s.size))
    uniq_arr = uniq_terms.to_numpy() if hasattr(uniq_terms, "to_numpy") else np.asarray(uniq_terms)
    terms_out = uniq_arr[codes_s[starts]]
    return pd.DataFrame(
        {
            "shard": np.full(starts.size, int(pdf["shard"].iloc[0]), dtype=np.int64),
            "term": terms_out,
            "term_bucket": _hash_bucket(terms_out),
            "salt": np.full(starts.size, int(pdf["salt"].iloc[0]), dtype=np.int64),
            "n_docs": n_docs,
            "docs_enc": delta_encode_segments(ids_s, starts),
            "tfs_enc": varint_encode_segments(tfs_s, starts),
            "dls_enc": varint_encode_segments(dls_s, starts),
        }
    )


def _make_merge_fn(avgdl: float, k1: float, b: float, block_size: int):
    from .codec import (
        delta_encode_segments,
        segmented_cumsum,
        varint_decode,
        varint_encode_segments,
    )

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        """Phase 2 applyInPandas over one (shard, term_bucket) group: merge
        every term's salted partials and re-block — all in whole-group numpy
        passes (one concatenated varint decode, one lexsort, segmented
        re-encode). Group memory is bounded by one term-bucket of one shard."""
        shard = int(pdf["shard"].iloc[0])
        n_per_row = pdf["n_docs"].to_numpy().astype(np.int64)
        total = int(n_per_row.sum())
        row_starts = np.concatenate([[0], np.cumsum(n_per_row)[:-1]])
        gaps = varint_decode(b"".join(pdf["docs_enc"]), total)
        ids = segmented_cumsum(gaps, row_starts, n_per_row)
        tfs = varint_decode(b"".join(pdf["tfs_enc"]), total)
        dls = varint_decode(b"".join(pdf["dls_enc"]), total)
        codes, uniq_terms = pd.factorize(pdf["term"])
        term_idx = np.repeat(codes, n_per_row)

        order = np.lexsort((ids, term_idx))
        ids, tfs, dls, term_idx = ids[order], tfs[order], dls[order], term_idx[order]

        # block boundaries: every `block_size` postings within each term run
        term_starts = np.nonzero(np.diff(term_idx, prepend=-1))[0]
        term_lens = np.diff(np.append(term_starts, total))
        pos_in_term = np.arange(total) - np.repeat(term_starts, term_lens)
        block_starts = np.nonzero(pos_in_term % block_size == 0)[0]
        block_ends = np.append(block_starts[1:], total)

        tff = tfs.astype(np.float64)
        tfns = (k1 + 1.0) * tff / (tff + k1 * (1.0 - b + b * dls.astype(np.float64) / avgdl))

        terms_arr = uniq_terms.to_numpy() if hasattr(uniq_terms, "to_numpy") else np.asarray(uniq_terms)
        return pd.DataFrame(
            {
                "shard": np.full(block_starts.size, shard, dtype=np.int64),
                "term": terms_arr[term_idx[block_starts]],
                "block_id": (pos_in_term[block_starts] // block_size).astype(np.int64),
                "n_docs": (block_ends - block_starts).astype(np.int64),
                "first_doc": ids[block_starts].astype(np.int64),
                "last_doc": ids[block_ends - 1].astype(np.int64),
                "docs_enc": delta_encode_segments(ids, block_starts),
                "tfs_enc": varint_encode_segments(tfs, block_starts),
                "dls_enc": varint_encode_segments(dls, block_starts),
                "max_tfn": np.maximum.reduceat(tfns, block_starts),
            }
        )

    return merge


def build_compute_only(
    spark: SparkSession,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    html_col: str | None = None,
    tokenizer: str = "unicode",
    n_shards: int = 8,
    n_salts: int = 8,
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    avgdl: float = 120.0,
    input_partitions: int | None = None,
) -> int:
    """The full build pipeline (extract → tokenize → salted phase-1 encode →
    phase-2 merge/block) sunk into Spark's `noop` datasource: identical
    compute and shuffles, ZERO output disk I/O. This is the compute-stage
    scaling proxy — on one sandbox box both parallelism levels share a
    single disk, so constant write bandwidth structurally caps the measured
    N→4N wall-clock ratio; a real 4N cluster brings 4N disks. avgdl only
    parameterizes max_tfn arithmetic (same work shape), so a nominal value
    avoids a stats pre-pass. Returns the number of blocks produced."""
    if input_partitions is None:
        input_partitions = spark.sparkContext.defaultParallelism * 2
    if docs.rdd.getNumPartitions() < input_partitions:
        docs = docs.repartition(input_partitions)
    if text_col is None:
        tok_udf = TF_HTML_TOKENIZERS[tokenizer](F.col(html_col))
    else:
        tok_udf = TF_TOKENIZERS[tokenizer](F.col(text_col))
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), tok_udf.alias("tk"))
        .select("doc_id", F.col("tk.tfs").alias("tfs"), F.col("tk.doc_len").alias("doc_len"))
        .withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int"))
        .withColumn("salt", F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(n_salts)).cast("int"))
    )
    partials = (
        toks.select("shard", "salt", "doc_id", "doc_len", "tfs")
        .groupBy("shard", "salt")
        .applyInPandas(_encode_partials, PARTIAL_SCHEMA)
    )
    # same scale-adaptive exchange shape as build_index (compute proxy
    # fidelity); no write here, so the non-fused path needs no block
    # exchange either
    if n_shards >= 2 * spark.sparkContext.defaultParallelism:
        partials = partials.repartition(2 * n_shards, "shard")
    blocks = partials.groupBy("shard", "term_bucket").applyInPandas(
        _make_merge_fn(avgdl, k1, b, block_size), BLOCK_SCHEMA
    )
    from pyspark.sql import Observation

    obs = Observation("compute_only")
    blocks = blocks.observe(obs, F.count(F.lit(1)).alias("n_blocks"))
    blocks.write.format("noop").mode("overwrite").save()
    return int(obs.get["n_blocks"])


def _write_manifest_rows(manifest_path: str, rows: list[dict], file_tag: str) -> None:
    """Manifest rows are driver data (one per shard) — write them with
    pyarrow directly instead of spending a Spark job per checkpoint. The
    directory stays a normal parquet table for spark.read."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("shard", pa.int64()),
            ("status", pa.string()),
            ("run_id", pa.string()),
            ("app_id", pa.string()),
            ("ts", pa.string()),
            ("n_blocks", pa.int64()),
            ("n_postings", pa.int64()),
            ("enc_bytes", pa.int64()),
            ("wall_s", pa.float64()),
        ]
    )
    os.makedirs(manifest_path, exist_ok=True)
    table = pa.Table.from_pylist(rows, schema=schema)
    pq.write_table(table, os.path.join(manifest_path, f"manifest-{file_tag}.parquet"))


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str | None = "text",
    html_col: str | None = None,
    url_col: str | None = None,
    tokenizer: str = "unicode",
    n_shards: int = 8,
    n_salts: int = 8,
    block_size: int = BLOCK_SIZE,
    k1: float = BM25_K1,
    b: float = BM25_B,
    shard_batches: int = 1,
    run_id: str | None = None,
    input_partitions: int | None = None,
    on_batch_done=None,
    with_positions: bool = False,
    max_group_bytes: int = 2 * 1024**3,
) -> dict:
    """Build the full index at ``out_dir``. ``shard_batches>1`` splits the
    build into resumable per-shard-group jobs (manifest-checkpointed); a
    re-run with the same out_dir skips completed shards.
    ``with_positions=True`` stores per-posting token positions (pos_enc)
    enabling exact phrase queries (operators/positions.py)."""
    run_id = run_id or f"run-{int(time.time())}"
    os.makedirs(out_dir, exist_ok=True)

    # Parallelize the extraction/tokenization map side even when the input
    # is a handful of parquet files (a 50 MB file is ONE scan partition —
    # on a 32-core runner that serializes the whole analysis chain).
    if input_partitions is None:
        input_partitions = spark.sparkContext.defaultParallelism * 2
    if docs.rdd.getNumPartitions() < input_partitions:
        docs = docs.repartition(input_partitions)

    # per-doc term-frequency maps straight out of the (extraction +)
    # tokenizer UDF: the corpus-scale (doc, term) groupBy is fused away.
    # When extracting from html, the extract+tokenize chain is ONE fused
    # pandas UDF (guide §4.1): chained UDFs plan as two ArrowEvalPython
    # nodes and ship the extracted text across the boundary twice.
    from_html = text_col is None
    in_col = html_col if from_html else text_col
    base_cols = [F.col(id_col).alias("doc_id")] + ([F.col(url_col).alias("url")] if url_col else [])
    if with_positions:
        from .positions import make_pos_tokenizer_udf

        tok_udf = make_pos_tokenizer_udf(tokenizer, from_html=from_html)
        payload_cols = [F.col("tk.terms").alias("terms"), F.col("tk.tfs").alias("tfs"),
                        F.col("tk.poss").alias("poss")]
        payload_names = ["terms", "tfs", "poss"]
    else:
        tok_udf = (TF_HTML_TOKENIZERS if from_html else TF_TOKENIZERS)[tokenizer]
        payload_cols = [F.col("tk.tfs").alias("tfs")]
        payload_names = ["tfs"]
    toks = docs.select(*base_cols, tok_udf(F.col(in_col)).alias("tk"))
    toks = (
        toks.select("doc_id", *(["url"] if url_col else []),
                    *payload_cols, F.col("tk.doc_len").alias("doc_len"))
        .withColumn("shard", F.pmod(F.xxhash64("doc_id"), F.lit(n_shards)).cast("int"))
        .withColumn("salt", F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(n_salts)).cast("int"))
    )
    # Materialize the tokenized layer to parquet once (the staging table an
    # Iceberg deployment would use): tokenization runs exactly once, every
    # downstream pass gets columnar pruning, and no multi-GB map-typed
    # cache sits on the driver heap.
    # Reuse is gated on Spark's _SUCCESS marker, not bare dir existence: a
    # crash mid-write leaves a partial directory that must be rebuilt.
    # Corpus stats ride the SAME job as the staging write via Observation
    # (per-build fixed job count is the scaling-efficiency tax: every extra
    # job is seconds that do not shrink with cores).
    from pyspark.sql import Observation

    tokenized_path = os.path.join(out_dir, "_tokenized")
    stats = None
    if not os.path.exists(os.path.join(tokenized_path, "_SUCCESS")):
        obs = Observation("corpus_stats")
        toks = toks.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total_tokens"),
            F.min("doc_id").alias("min_id"),
        )
        toks.write.mode("overwrite").parquet(tokenized_path)
        stats = obs.get
    toks = spark.read.parquet(tokenized_path)
    if stats is None:  # resuming over an existing staging table
        stats = toks.agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total_tokens"),
            F.min("doc_id").alias("min_id"),
        ).collect()[0].asDict()
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"])
    # --- phase-1 group-memory guard -------------------------------------
    # Phase 1 materializes one (shard, salt) group per applyInPandas task:
    # ~corpus/(n_shards·n_salts) of per-doc tf-map entries live in that
    # task's pandas frame at once. SIZING RULE the caller must satisfy:
    #     n_shards · n_salts ≥ total_tokens × PHASE1_BYTES_PER_TOKEN
    #                          / target_group_bytes
    # (defaults 8×8 are sandbox-scale; the 600k-doc bench uses 64×8; at
    # 10^12 docs size n_shards·n_salts so a group stays under executor
    # memory). We estimate from the Observation-carried token count and
    # WARN rather than fail — the estimate is intentionally conservative
    # (every token counted as a distinct map entry).
    est_group_bytes = (
        int(stats["total_tokens"]) * PHASE1_BYTES_PER_TOKEN / (n_shards * n_salts)
    )
    if est_group_bytes > max_group_bytes:
        import warnings

        need = math.ceil(int(stats["total_tokens"]) * PHASE1_BYTES_PER_TOKEN / max_group_bytes)
        warnings.warn(
            f"phase-1 group estimate ~{est_group_bytes / 1e9:.1f} GB exceeds "
            f"max_group_bytes={max_group_bytes / 1e9:.1f} GB: raise n_shards*n_salts "
            f"to >= {need} (currently {n_shards * n_salts}) or tasks may OOM",
            ResourceWarning,
            stacklevel=2,
        )
    if stats["min_id"] is not None and int(stats["min_id"]) < 0:
        # codec stores uint64 gaps; signed/unsigned order must agree for
        # rank-identical tie-breaks — derive ids via with_doc_id() instead
        raise ValueError("doc ids must be non-negative (use with_doc_id for url-keyed corpora)")

    manifest_path = os.path.join(out_dir, "_manifest")
    done: set[int] = set()
    if os.path.exists(manifest_path):
        try:
            done = {
                int(r["shard"])
                for r in spark.read.parquet(manifest_path).filter(F.col("status") == "done").collect()
            }
        except Exception:  # crashed mid-manifest-write: treat as no checkpoint
            done = set()

    if with_positions:
        from .positions import (
            BLOCK_POS_SCHEMA,
            PARTIAL_POS_SCHEMA,
            encode_partials_pos,
            make_merge_fn_pos,
        )

        phase1_fn, phase1_schema = encode_partials_pos, PARTIAL_POS_SCHEMA
        merge_fn, block_schema = make_merge_fn_pos(avgdl, k1, b, block_size), BLOCK_POS_SCHEMA
    else:
        phase1_fn, phase1_schema = _encode_partials, PARTIAL_SCHEMA
        merge_fn, block_schema = _make_merge_fn(avgdl, k1, b, block_size), BLOCK_SCHEMA
    all_shards = [s for s in range(n_shards) if s not in done]
    # Crash safety: postings/doc_stats are APPENDED before the manifest row
    # marks a shard 'done', so a crash between the writes would make a
    # re-run double-append those shards (silently doubling tf and BM25
    # scores). Any shard partition on disk that is NOT in the manifest is
    # therefore a torn write from a crashed attempt — delete it before
    # rebuilding. (On Iceberg this whole dance is a transactional
    # REPLACE PARTITION; this is the filesystem equivalent.)
    import shutil

    for table in ("postings", "doc_stats"):
        for s in all_shards:
            pdir = os.path.join(out_dir, table, f"shard={s}")
            if os.path.exists(pdir):
                shutil.rmtree(pdir)
    groups = [all_shards[i::shard_batches] for i in range(shard_batches)] if shard_batches > 1 else [all_shards]
    groups = [g for g in groups if g]

    metrics = []
    for gi, group in enumerate(groups):
        t0 = time.time()
        part = toks.filter(F.col("shard").isin(group)) if len(group) < n_shards else toks
        # phase 1 shuffles COMPACT per-doc rows (tf maps), not exploded
        # (doc, term, tf) rows — ~20x less shuffle; the explosion happens
        # numpy-side inside each (shard, salt) group
        partials = (
            part.select("shard", "salt", "doc_id", "doc_len", *payload_names)
            .groupBy("shard", "salt")
            .applyInPandas(phase1_fn, phase1_schema)
        )
        # Exchange fusion (guide §2.4), scale-adaptive: when the shard
        # count dwarfs the core count (any real cluster build), hash-
        # partition the COMPACT partials by shard once —
        # HashPartitioning(shard) satisfies the phase-2
        # ClusteredDistribution(shard, term_bucket) and the merge output
        # lands shard-clustered, so the write's partitionBy(shard) needs
        # NO third exchange of the full encoded blocks (the heaviest
        # rows). At sandbox scale (shards ≈ cores) the interleaved A/B
        # measured the opposite trade — shard-granular phase-2 tasks lose
        # more to balls-in-bins imbalance than the (tmpfs-cheap) block
        # exchange costs — so small builds keep the fine-grained
        # (shard, term_bucket) exchange and pay the extra block exchange
        # at write. Both paths produce identical files.
        fuse_exchange = len(group) >= 2 * spark.sparkContext.defaultParallelism
        if fuse_exchange:
            partials = partials.repartition(2 * len(group), "shard")
        blocks = partials.groupBy("shard", "term_bucket").applyInPandas(merge_fn, block_schema)
        if not fuse_exchange:
            blocks = blocks.repartition("shard")
        # per-shard metrics observed DURING the write (3 conditional aggs
        # per shard) — no second pass over the written postings
        obs = Observation(f"shard_metrics_{gi}")
        enc_len = F.length("docs_enc") + F.length("tfs_enc") + F.length("dls_enc")
        if with_positions:
            enc_len = enc_len + F.length("pos_enc")
        metric_exprs = []
        for s in group:
            is_s = F.col("shard") == s
            metric_exprs += [
                F.count(F.when(is_s, 1)).alias(f"blk_{s}"),
                F.sum(F.when(is_s, F.col("n_docs"))).alias(f"pst_{s}"),
                F.sum(F.when(is_s, enc_len)).alias(f"byt_{s}"),
            ]
        blocks = blocks.observe(obs, *metric_exprs)

        # doc-side table (doc_len + url) written CONCURRENTLY with the
        # postings job from a second thread: both read the same staging
        # parquet, and the small doc_stats tasks fill scheduler gaps (e.g.
        # the phase-2 skew tail) instead of appending a serial job.
        doc_cols = ["shard", "doc_id", "doc_len"] + (["url"] if url_col else [])
        from concurrent.futures import ThreadPoolExecutor

        def write_doc_stats() -> None:
            part.select(*doc_cols).repartition("shard").write.mode("append").partitionBy(
                "shard"
            ).parquet(os.path.join(out_dir, "doc_stats"))

        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(write_doc_stats)
            # Sort leads with `shard` so the writer's required ordering
            # (partition columns first) is ALREADY satisfied: the previous
            # sortWithinPartitions("term", ...) was silently re-sorted by
            # the writer's own (shard)-only sort, which left files
            # term-UNsorted (verified on round-6 output). Now files come
            # out genuinely (term, first_doc)-sorted, so parquet min/max
            # row-group pruning on `term` works at scale (guide §6).
            (
                blocks.sortWithinPartitions("shard", "term", "first_doc")
                .write.mode("append")
                .partitionBy("shard")
                .parquet(os.path.join(out_dir, "postings"))
            )
            fut.result()

        wall = time.time() - t0
        got = obs.get
        rows = [
            {
                "shard": int(s),
                "status": "done",
                "run_id": run_id,
                "app_id": spark.sparkContext.applicationId,
                "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                "n_blocks": int(got[f"blk_{s}"] or 0),
                "n_postings": int(got[f"pst_{s}"] or 0),
                "enc_bytes": int(got[f"byt_{s}"] or 0),
                "wall_s": wall,
            }
            for s in group
            if int(got[f"blk_{s}"] or 0) > 0
        ]
        if rows:
            _write_manifest_rows(manifest_path, rows, f"{run_id}-g{gi}")
            metrics.extend(rows)
        if on_batch_done is not None:  # test hook: simulate crash mid-build
            on_batch_done(group)

    # term stats: global df per term, derived from the written postings
    # (per-shard posting count per term sums to exact df) — no second
    # tokenize/explode pass over the corpus.
    if all_shards:
        ts = (
            spark.read.parquet(os.path.join(out_dir, "postings"))
            .groupBy("term")
            .agg(F.sum("n_docs").alias("df"))
        )
        # Range partitioning gives term-range file pruning for the
        # per-query pruned lookup mode, but its sampling pass executes
        # the aggregation subtree twice — worth it only at cluster-scale
        # vocabularies. Small builds write ONE term-sorted file: row-group
        # min/max stats give the same pruning granularity there, minus a
        # whole job (A/B: 0.96 -> 0.63 s at the 100k-doc bench index).
        if n_shards >= 2 * spark.sparkContext.defaultParallelism:
            ts = ts.repartitionByRange(max(1, n_shards // 2), "term")
        else:
            ts = ts.repartition(1)
        (
            ts.sortWithinPartitions("term")
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, "term_stats"))
        )

    meta = {
        "n_docs": n_docs,
        "avgdl": avgdl,
        "total_tokens": int(stats["total_tokens"]),
        "n_shards": n_shards,
        "n_salts": n_salts,
        "block_size": block_size,
        "k1": k1,
        "b": b,
        "tokenizer": tokenizer,
        "run_id": run_id,
        "with_positions": with_positions,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    return {"meta": meta, "shard_metrics": metrics}


def reindex(spark, docs, dest_dir: str, query: dict | None = None,
            source_index=None, **build_kwargs) -> dict:
    """ES _reindex: rebuild an index at dest_dir from a (optionally
    query-filtered) document source. The filter goes through the query
    AST so it pushes into the source scan — at corpus scale a selective
    reindex reads only the matching partitions/row-groups, then runs the
    standard resumable build (same manifest/lineage machinery, so a
    crashed reindex resumes like any build). `source_index` routes
    full-text (`match`) filters through an existing InvertedIndex.

    Reference: the plugin era's reindex loops (scroll + bulk re-submit,
    in_elasticsearch.rb scan → out_elasticsearch.rb bulk) become ONE
    declarative job."""
    from ..plans.query_ast import compile_query

    src = docs
    if query is not None:
        src = compile_query(docs, {"query": query}, index=source_index)
        # compile_query may attach search metadata columns (score/rank)
        # when routing through an index — strip to the source schema
        src = src.select(*[c for c in docs.columns])
    return build_index(spark, src, dest_dir, **build_kwargs)


def build_field_indexes(spark, docs, out_dir: str, fields: list[str],
                        **build_kwargs) -> dict:
    """One index per text field under ``out_dir/<field>`` — the per-field
    Lucene-index shape ES's multi_match scores against. Returns
    {field: index_path}; open each with InvertedIndex and serve via
    search.multi_match_topk. Each field build is the standard resumable
    build (own manifest/meta), so a crashed multi-field build resumes
    per field."""
    paths = {}
    for f in fields:
        p = os.path.join(out_dir, f)
        build_index(spark, docs, p, text_col=f, **build_kwargs)
        paths[f] = p
    return paths


def combined_index_key(fields: list[str], weights: dict[str, int] | None = None) -> str:
    """Canonical registry key for a combined_fields index: the serving
    router must only use an index built with the SAME fields+weights."""
    return "combined::" + ",".join(
        f"{f}^{int((weights or {}).get(f, 1))}" for f in fields)


def build_combined_field_index(spark, docs, out_dir: str, fields: list[str],
                               weights: dict[str, int] | None = None,
                               **build_kwargs) -> dict:
    """Index over the WEIGHTED FIELD CONCATENATION — the exact reduction
    bm25.combined_fields_df uses (tf sums across weighted copies, dl is
    the weighted length, df/avgdl from the combined text), so serving
    this index via search.combined_fields_topk reproduces the DataFrame
    scorer bit-for-bit. ES restricts combined_fields weights to >= 1;
    same rule here."""
    from pyspark.sql import functions as F

    parts = []
    for f in fields:
        w = int((weights or {}).get(f, 1))
        if w < 1:
            raise ValueError("combined_fields weights must be >= 1 (ES rule)")
        parts += [F.coalesce(F.col(f).cast("string"), F.lit(""))] * w
    combined = docs.withColumn("__combined", F.concat_ws(" ", *parts))
    return build_index(spark, combined, out_dir, text_col="__combined",
                       **build_kwargs)
