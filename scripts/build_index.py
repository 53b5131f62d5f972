"""spark-submit entry: build the inverted index over a webtext table.

Cluster usage (north rule: ships as spark-submit --py-files):

    cd /root/repo && zip -r /tmp/engine.zip fluent_plugin_elasticsearch_spark
    spark-submit --py-files /tmp/engine.zip scripts/build_index.py \
        --input /data/webtext --output /data/index \
        --n-shards 4096 --n-salts 64 --shard-batches 16

Local: python scripts/build_index.py --input ... --output ... [--cores 32]

Sizing at 10^12 docs: n_shards ≈ executors×4 (shard = unit of query
parallelism AND resumable build checkpoint); n_salts sized so one
(shard, salt) phase-1 group ≈ 1-2 GB of postings; shard-batches bounds
the blast radius of a failure (manifest skips completed shards on re-run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet/Iceberg dir of (url, warc_ts, html, text, lang)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default=None, help="numeric id column; default: derive from --url-col")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--text-col", default=None)
    ap.add_argument("--html-col", default="html")
    ap.add_argument("--tokenizer", default="unicode", choices=["unicode", "simple", "simple_udf"])
    ap.add_argument("--n-shards", type=int, default=16)
    ap.add_argument("--n-salts", type=int, default=16)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--shard-batches", type=int, default=1)
    ap.add_argument("--positions", action="store_true",
                    help="store token positions (enables match_phrase; ~2.3x build cost)")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fluent_plugin_elasticsearch_spark.operators.index_build import build_index, with_doc_id

    spark = SparkSession.getActiveSession()
    if spark is None:  # local run; under spark-submit the session comes configured
        from fluent_plugin_elasticsearch_spark.session import get_spark

        spark = get_spark("build_index", cores=args.cores)

    docs = spark.read.parquet(args.input)
    id_col = args.id_col
    if id_col is None:
        docs = with_doc_id(docs, args.url_col)
        id_col = "doc_id"
    res = build_index(
        spark, docs, args.output,
        id_col=id_col,
        text_col=args.text_col,
        html_col=args.html_col if args.text_col is None else None,
        url_col=args.url_col,
        tokenizer=args.tokenizer,
        n_shards=args.n_shards,
        n_salts=args.n_salts,
        block_size=args.block_size,
        shard_batches=args.shard_batches,
        with_positions=args.positions,
    )
    print(json.dumps(res["meta"]))


if __name__ == "__main__":
    main()
