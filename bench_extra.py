"""Round-7 optimization profiler (bench.py stays FROZEN — guide §1.4).

Per analytical query: noop-sink compute time vs full collect() time
(best of N), separating engine compute from the driver-pickle collect
floor the bench contract pays. Also a staged index_build breakdown.

Usage:
  python bench_extra.py queries   [sf_dir] [repeats]
  python bench_extra.py build     [n_docs]
  python bench_extra.py plans     [sf_dir]   # writes plans/r07/<q>_{before,after}.txt
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

PICKS = [
    "bm25_topk", "exact_dedup", "token_counts", "lang_id", "quality_score",
    "ann_cosine_topk", "tpch_q1_agg", "join_topk_customers",
    "window_latest_event", "genid_sha256", "target_index", "upsert_merge",
]


def get_session(cores: int = 32):
    from fluent_plugin_elasticsearch_spark.session import get_spark

    return get_spark(app_name="bench_extra", cores=cores,
                     shuffle_partitions=2 * cores, tmpfs_scratch=True)


def profile_queries(sf_dir: str, repeats: int = 3) -> None:
    import __spark_entry__ as entry_mod

    spark = get_session()
    qs = entry_mod.queries()
    out = {}
    for name in PICKS:
        noop_best, collect_best, nrows = None, None, None
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}: noop")
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            w = time.time() - t0
            noop_best = w if noop_best is None else min(noop_best, w)
            spark.sparkContext.setJobDescription(f"{name}: collect")
            t0 = time.time()
            rows = qs[name](spark, sf_dir).collect()
            w = time.time() - t0
            collect_best = w if collect_best is None else min(collect_best, w)
            nrows = len(rows)
        out[name] = {"noop": round(noop_best, 3), "collect": round(collect_best, 3),
                     "rows": nrows}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"summary": out}))
    spark.stop()


def profile_build(n_docs: int = 100000) -> None:
    from fluent_plugin_elasticsearch_spark.corpus import write_corpus_spark
    from fluent_plugin_elasticsearch_spark.operators.index_build import (
        build_index, with_doc_id)

    spark = get_session()
    corpus_path = tempfile.mkdtemp(prefix="bx_corpus_") + "/webtext"
    write_corpus_spark(spark, corpus_path, n_docs, seed=42, avg_len=120)
    docs = with_doc_id(spark.read.parquet(corpus_path), "url")
    for trial in range(3):
        idx_dir = tempfile.mkdtemp(prefix=f"bx_idx{trial}_") + "/idx"
        t0 = time.time()
        build_index(spark, docs, idx_dir, id_col="doc_id", html_col="html",
                    text_col=None, url_col="url", tokenizer="unicode",
                    n_shards=32, n_salts=8)
        print(f"build trial {trial}: {time.time()-t0:.2f}s", flush=True)
    spark.stop()


def dump_plans(sf_dir: str, tag: str) -> None:
    import __spark_entry__ as entry_mod

    spark = get_session()
    qs = entry_mod.queries()
    os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)
    for name in PICKS:
        df = qs[name](spark, sf_dir)
        p = os.path.join(REPO, "plans", "r07", f"{name}_{tag}.txt")
        with open(p, "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
        print("wrote", p, flush=True)
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if mode == "queries":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
        repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
        profile_queries(sf_dir, repeats)
    elif mode == "build":
        profile_build(int(sys.argv[2]) if len(sys.argv) > 2 else 100000)
    elif mode == "plans":
        sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf1.0"
        tag = sys.argv[3] if len(sys.argv) > 3 else "before"
        dump_plans(sf_dir, tag)
