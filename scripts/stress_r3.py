"""Round-3 operator scale stress: PQ ANN at 1M x 64-dim vectors and
percolation of a 600k-doc webtext corpus against a 1,000-query registry.
Records wall times the way ROUND2's dedup stress runs did — evidence the
new operators hold at corpus scale, not just the sf-gate sizes.

Usage: python scripts/stress_r3.py [--json out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from fluent_plugin_elasticsearch_spark.session import get_spark  # noqa: E402


def stress_pq(spark, n: int = 1_000_000, dim: int = 64) -> dict:
    from fluent_plugin_elasticsearch_spark.operators.similarity import PqIndex

    # clustered synthetic embeddings, generated IN SPARK (no driver array):
    # 32 cluster centers from a hash, vector = center + noise
    emb = (
        spark.range(n).withColumnRenamed("id", "vec_id")
        .withColumn("c", (F.col("vec_id") % 32).cast("int"))
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda i: (
                    F.sin(F.col("c") * 7.3 + i * 1.7) * 3.0
                    + F.sin(F.col("vec_id") * 0.913 + i * 3.77)
                ),
            ).alias("embedding"),
        )
    )
    t0 = time.time()
    idx = PqIndex(emb, dim=dim, m=16, seed=42, train_sample=4096)
    build_s = time.time() - t0
    qdf = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding")
    t0 = time.time()
    n_hits = idx.search(qdf, k=10, rerank_factor=4).count()
    serve_s = time.time() - t0
    code_bytes = idx.codes.select(F.sum(F.length("codes"))).collect()[0][0]
    idx.close()
    return {
        "n_vectors": n, "dim": dim,
        "encode_wall_s": round(build_s, 1),
        "encode_vecs_per_sec": round(n / build_s),
        "batch100_serve_wall_s": round(serve_s, 1),
        "hits": n_hits,
        "code_bytes_total": int(code_bytes),
        "bytes_per_vector": code_bytes / n,
        "float32_equivalent_bytes": n * dim * 4,
    }


def stress_percolate(spark, n_docs: int = 600_000, n_queries: int = 1000) -> dict:
    import tempfile

    import numpy as np

    from fluent_plugin_elasticsearch_spark.corpus import write_corpus_spark
    from fluent_plugin_elasticsearch_spark.operators.index_build import with_doc_id
    from fluent_plugin_elasticsearch_spark.operators.percolate import (
        make_query_registry, percolate)

    corpus = tempfile.mkdtemp(prefix="perc_") + "/webtext"
    write_corpus_spark(spark, corpus, n_docs, seed=42, avg_len=120)
    docs = with_doc_id(spark.read.parquet(corpus), "url").select(
        "doc_id", F.col("text"))
    # registry over the corpus zipf vocab: mixed msm, 2-4 terms each
    rng = np.random.default_rng(7)
    vocab = [r["term"] for r in (
        docs.limit(20000)
        .select(F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"))
        .filter(F.length("term") > 2)
        .groupBy("term").count().orderBy(F.desc("count")).limit(3000).collect()
    )]
    queries = []
    for qid in range(n_queries):
        k = int(rng.integers(2, 5))
        terms = sorted({vocab[int(j)] for j in rng.integers(0, len(vocab), k)})
        queries.append((qid, terms, int(rng.integers(1, len(terms) + 1))))
    reg = make_query_registry(spark, queries)
    t0 = time.time()
    n_matches = percolate(docs, reg).count()
    wall = time.time() - t0
    return {
        "n_docs": n_docs, "n_queries": n_queries,
        "wall_s": round(wall, 1),
        "docs_per_sec": round(n_docs / wall),
        "matches": n_matches,
    }


def main() -> None:
    spark = get_spark("stress_r3", cores="*", shuffle_partitions=64,
                      tmpfs_scratch=True)
    out = {"pq": stress_pq(spark), "percolate": stress_percolate(spark)}
    print(json.dumps(out, indent=2))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
