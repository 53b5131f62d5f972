"""Same-session A/B of two source trees on the identical pinned compute
job — the controlled-pair protocol VERDICT r5 #7 asked each round's bench
to carry, so absolute walls can be read without a host-noise correction.

Alternates tree A / tree B (N trials each) running the 16-core pinned
compute-only index build (extract + tokenize + both shuffle phases, noop
sink) over ONE shared corpus parquet.  Alternation means slow-host drift
hits both trees equally.

Usage: python scripts/ab_trees.py <treeA> <treeB> [n_docs] [--json out]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

CHILD = """
import json, sys, time
tree = sys.argv[1]
sys.path.insert(0, tree)
from fluent_plugin_elasticsearch_spark.session import get_spark
from fluent_plugin_elasticsearch_spark.operators.index_build import (
    build_compute_only, with_doc_id)

cores, n_docs, corpus = int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
spark = get_spark(app_name=f"ab{cores}", cores=cores,
                  shuffle_partitions=2 * cores, tmpfs_scratch=True)
docs = with_doc_id(spark.read.parquet(corpus), "url")
docs.count()
# warm-up (JVM codegen + python worker forks are one-time per executor)
build_compute_only(spark, docs.limit(20000), id_col="doc_id", html_col="html",
                   text_col=None, tokenizer="unicode", n_shards=64, n_salts=8)
t0 = time.time()
build_compute_only(spark, docs, id_col="doc_id", html_col="html", text_col=None,
                   tokenizer="unicode", n_shards=64, n_salts=8)
print(json.dumps({"wall_s": round(time.time() - t0, 2)}))
spark.stop()
"""


def run_child(tree: str, cores: int, n_docs: int, corpus: str) -> float:
    pin = ["taskset", "-c", f"0-{cores - 1}"] if shutil.which("taskset") else []
    out = subprocess.run(
        pin + [sys.executable, "-c", CHILD, tree, str(cores), str(n_docs), corpus],
        capture_output=True, text=True, timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)["wall_s"]


def main() -> None:
    tree_a, tree_b = os.path.abspath(sys.argv[1]), os.path.abspath(sys.argv[2])
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 and sys.argv[3].isdigit() else 600_000
    cores = int(os.environ.get("AB_CORES", "16"))
    trials = int(os.environ.get("AB_TRIALS", "2"))

    sys.path.insert(0, tree_b)
    corpus = tempfile.mkdtemp(prefix="ab_corpus_") + "/webtext"
    from fluent_plugin_elasticsearch_spark.corpus import write_corpus_spark
    from fluent_plugin_elasticsearch_spark.session import get_spark

    s = get_spark("ab_gen", cores="*")
    write_corpus_spark(s, corpus, n_docs, seed=42, avg_len=120)
    s.stop()

    walls: dict[str, list[float]] = {tree_a: [], tree_b: []}
    for i in range(trials):
        for tree in (tree_a, tree_b):  # alternate so drift hits both
            w = run_child(tree, cores, n_docs, corpus)
            walls[tree].append(w)
            print(f"  trial {i} {os.path.basename(tree)}: {w}s",
                  file=sys.stderr, flush=True)
    result = {
        "job": f"compute-only build, {n_docs} docs, {cores} pinned cores, "
               f"alternating {trials}x each",
        "tree_a": {"path": tree_a, "walls": walls[tree_a],
                   "best": min(walls[tree_a])},
        "tree_b": {"path": tree_b, "walls": walls[tree_b],
                   "best": min(walls[tree_b])},
        "b_over_a": round(min(walls[tree_b]) / min(walls[tree_a]), 3),
    }
    print(json.dumps(result, indent=2))
    if "--json" in sys.argv:
        with open(sys.argv[sys.argv.index("--json") + 1], "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
