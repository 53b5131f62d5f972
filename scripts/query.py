"""spark-submit entry: query a built index.

    spark-submit --py-files /tmp/engine.zip scripts/query.py \
        --index /data/index --query "web crawl dataset" --k 10 [--mode wand]

Also accepts an ES-style query body: --body '{"query":{"ids":{"values":[1,2]}}}'
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--body", default=None, help="ES-style query body JSON")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="auto", choices=["auto", "wand", "exhaustive"])
    ap.add_argument("--phrase", action="store_true",
                    help="treat --query as an exact phrase (needs a positional index)")
    ap.add_argument("--urls", action="store_true", help="join result back to docmap")
    ap.add_argument("--cores", default=os.environ.get("SPARK_GRAFT_CPUS", "*"))
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from fluent_plugin_elasticsearch_spark.operators.search import InvertedIndex

    spark = SparkSession.getActiveSession()
    if spark is None:
        from fluent_plugin_elasticsearch_spark.session import get_spark

        spark = get_spark("query", cores=args.cores)

    idx = InvertedIndex(spark, args.index)
    t0 = time.time()
    if args.body:
        from fluent_plugin_elasticsearch_spark.plans.query_ast import compile_query

        out = compile_query(idx.doc_stats(), json.loads(args.body), index=idx)
    elif args.phrase:
        out = idx.match_phrase(args.query, args.k)
    elif args.urls:
        out = idx.search_with_urls(args.query, args.k, args.mode)
    else:
        out = idx.search(args.query, args.k, args.mode)
    rows = out.collect()
    wall = time.time() - t0
    for r in rows:
        print(json.dumps(r.asDict(), default=str))
    print(json.dumps({"n": len(rows), "wall_s": round(wall, 4)}), file=sys.stderr)


if __name__ == "__main__":
    main()
