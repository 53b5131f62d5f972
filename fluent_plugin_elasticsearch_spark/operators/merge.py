"""Index merge / compaction — the engine analogue of ES segment merging and
force-merge (the reference's rollover generations accumulate exactly such
mergeable per-period indexes; sinks/lifecycle.py + streaming ingest create
them incrementally).

`merge_indexes` unions the source indexes' posting blocks and re-runs the
SAME phase-2 merge used by the build (decode → lexsort by (term, doc) →
re-block → re-encode), per (shard, term_bucket) group — a compacted index
over disjoint doc sets is therefore byte-equivalent in semantics to a
from-scratch build over the union corpus (rank-identity is tested, with
max_tfn recomputed against the merged avgdl). Works for positional and
non-positional indexes (flags must match across sources).

Scale shape: one shuffle of the already-compressed blocks keyed by
(shard, term_bucket) — compaction cost tracks index size, not corpus text.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index_build import (
    BLOCK_SCHEMA,
    N_TERM_BUCKETS,
    _make_merge_fn,
    _write_manifest_rows,
)


def _bucket_col() -> F.Column:
    # JVM-side crc32 (java.util.zip.CRC32 == zlib.crc32) — matches
    # index_build._hash_bucket's python-side bucketing exactly
    return F.pmod(F.crc32(F.encode(F.col("term"), "utf-8")), F.lit(N_TERM_BUCKETS)).cast("int")


def compact_generations(spark: SparkSession, index_dir: str,
                        dest: str | None = None) -> str:
    """Compact every ``gen=*`` increment under `index_dir` (written by
    streaming.ingest.incremental_index_update) into one index — the
    scheduled force-merge a serving cluster runs between query load peaks."""
    import glob

    gens = sorted(glob.glob(os.path.join(index_dir, "gen=*")))
    if not gens:
        raise ValueError(f"no gen=* increments under {index_dir}")
    dest = dest or os.path.join(index_dir, f"compacted-{int(time.time())}")
    merge_indexes(spark, gens, dest)
    return dest


def merge_indexes(spark: SparkSession, src_dirs: list[str], out_dir: str,
                  run_id: str | None = None) -> dict:
    """Compact `src_dirs` (disjoint doc sets — e.g. rollover generations or
    streaming increments) into one index at `out_dir`."""
    run_id = run_id or f"merge-{int(time.time())}"
    metas = []
    for d in src_dirs:
        with open(os.path.join(d, "meta.json")) as f:
            metas.append(json.load(f))
    m0 = metas[0]
    for m in metas[1:]:
        for key in ("tokenizer", "k1", "b", "n_shards", "with_positions", "block_size"):
            if m.get(key) != m0.get(key):
                raise ValueError(f"meta mismatch on {key!r}: {m.get(key)} vs {m0.get(key)}")
    n_docs = sum(m["n_docs"] for m in metas)
    total_tokens = sum(m["total_tokens"] for m in metas)
    avgdl = total_tokens / n_docs
    k1, b, block_size = m0["k1"], m0["b"], m0["block_size"]
    with_positions = bool(m0.get("with_positions"))

    blocks = None
    for d in src_dirs:
        part = spark.read.parquet(os.path.join(d, "postings"))
        blocks = part if blocks is None else blocks.unionByName(part)
    blocks = blocks.withColumn("term_bucket", _bucket_col())

    if with_positions:
        from .positions import BLOCK_POS_SCHEMA, make_merge_fn_pos

        merge_fn, schema = make_merge_fn_pos(avgdl, k1, b, block_size), BLOCK_POS_SCHEMA
    else:
        merge_fn, schema = _make_merge_fn(avgdl, k1, b, block_size), BLOCK_SCHEMA

    os.makedirs(out_dir, exist_ok=True)
    merged = blocks.groupBy("shard", "term_bucket").applyInPandas(merge_fn, schema)
    from pyspark.sql import Observation

    obs = Observation("merge_metrics")
    enc_len = F.length("docs_enc") + F.length("tfs_enc") + F.length("dls_enc")
    if with_positions:
        enc_len = enc_len + F.length("pos_enc")
    metric_exprs = []
    for s in range(m0["n_shards"]):
        is_s = F.col("shard") == s
        metric_exprs += [
            F.count(F.when(is_s, 1)).alias(f"blk_{s}"),
            F.sum(F.when(is_s, F.col("n_docs"))).alias(f"pst_{s}"),
            F.sum(F.when(is_s, enc_len)).alias(f"byt_{s}"),
        ]
    merged = merged.observe(obs, *metric_exprs)
    t0 = time.time()
    (
        merged.repartition("shard")
        .sortWithinPartitions("term", "first_doc")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "postings"))
    )
    wall = time.time() - t0
    got = obs.get
    ds = None
    for d in src_dirs:
        part = spark.read.parquet(os.path.join(d, "doc_stats"))
        ds = part if ds is None else ds.unionByName(part, allowMissingColumns=True)
    ds.repartition("shard").write.mode("overwrite").partitionBy("shard").parquet(
        os.path.join(out_dir, "doc_stats")
    )
    (
        spark.read.parquet(os.path.join(out_dir, "postings"))
        .groupBy("term")
        .agg(F.sum("n_docs").alias("df"))
        .repartitionByRange(max(1, m0["n_shards"] // 2), "term")
        .sortWithinPartitions("term")
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "term_stats"))
    )
    meta = dict(m0)
    meta.update(
        n_docs=n_docs, avgdl=avgdl, total_tokens=total_tokens, run_id=run_id,
        merged_from=[os.path.basename(d.rstrip("/")) for d in src_dirs],
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    rows = [
        {
            "shard": s, "status": "done", "run_id": run_id,
            "app_id": spark.sparkContext.applicationId,
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "n_blocks": int(got[f"blk_{s}"] or 0),
            "n_postings": int(got[f"pst_{s}"] or 0),
            "enc_bytes": int(got[f"byt_{s}"] or 0),
            "wall_s": wall,
        }
        for s in range(m0["n_shards"])
        if int(got[f"blk_{s}"] or 0) > 0
    ]
    _write_manifest_rows(os.path.join(out_dir, "_manifest"), rows, run_id)
    return {"meta": meta}
