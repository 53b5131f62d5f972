"""Index snapshot / restore — the ES snapshot-repository workflow the
reference's operators run for disaster recovery (the plugin writes into
indices that ops snapshot on schedule; ilm/rollover assume restorable
state — lifecycle.rb context).

An index directory is already immutable-after-build (postings/doc_stats/
term_stats parquet + _manifest + meta.json, staging gated by _SUCCESS),
so a snapshot is a consistent copy IF the manifest says every shard is
done — that's the precondition checked here. Restore is the inverse
copy plus an integrity verification (manifest shard set vs postings
shards on disk, meta doc count vs doc_stats rows). On object storage
the copies become server-side copies; nothing here assumes local paths
beyond shutil.
"""

from __future__ import annotations

import json
import os
import shutil

_PARTS = ("postings", "doc_stats", "term_stats", "_manifest")


class SnapshotError(RuntimeError):
    pass


def snapshot_index(spark, index_dir: str, snap_dir: str) -> dict:
    """Snapshot a built index into snap_dir. Refuses if any manifest
    shard is not 'done' (a mid-build copy would be torn). Returns the
    snapshot metadata written alongside the data."""
    man = spark.read.parquet(os.path.join(index_dir, "_manifest"))
    bad = man.filter(man["status"] != "done").count()
    if bad:
        raise SnapshotError(f"{bad} manifest shard(s) not done — refusing torn snapshot")
    if os.path.exists(snap_dir):
        raise SnapshotError(f"snapshot target exists: {snap_dir}")
    os.makedirs(snap_dir)
    for part in _PARTS:
        src = os.path.join(index_dir, part)
        if os.path.exists(src):
            shutil.copytree(src, os.path.join(snap_dir, part))
    shutil.copy2(os.path.join(index_dir, "meta.json"), os.path.join(snap_dir, "meta.json"))
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    info = {
        "state": "SUCCESS",
        "n_docs": meta["n_docs"],
        "shards": int(man.select("shard").distinct().count()),
        "source": os.path.abspath(index_dir),
    }
    with open(os.path.join(snap_dir, "snapshot.json"), "w") as f:
        json.dump(info, f)
    return info


def restore_index(spark, snap_dir: str, index_dir: str) -> dict:
    """Restore a snapshot into index_dir (must not exist) and verify
    integrity: snapshot state, manifest shard set vs restored postings,
    meta doc count vs doc_stats rows."""
    with open(os.path.join(snap_dir, "snapshot.json")) as f:
        info = json.load(f)
    if info.get("state") != "SUCCESS":
        raise SnapshotError(f"snapshot state {info.get('state')!r}")
    if os.path.exists(index_dir):
        raise SnapshotError(f"restore target exists: {index_dir}")
    os.makedirs(index_dir)
    for part in _PARTS:
        src = os.path.join(snap_dir, part)
        if os.path.exists(src):
            shutil.copytree(src, os.path.join(index_dir, part))
    shutil.copy2(os.path.join(snap_dir, "meta.json"), os.path.join(index_dir, "meta.json"))
    verify_index(spark, index_dir)
    return info


def verify_index(spark, index_dir: str) -> dict:
    """Integrity check: manifest shards == postings shards on disk,
    meta.n_docs == doc_stats row count. Raises SnapshotError on any
    mismatch; returns the checked numbers."""
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    man_shards = {
        r["shard"] for r in
        spark.read.parquet(os.path.join(index_dir, "_manifest")).select("shard").distinct().collect()
    }
    post_shards = {
        r["shard"] for r in
        spark.read.parquet(os.path.join(index_dir, "postings")).select("shard").distinct().collect()
    }
    if man_shards != post_shards:
        raise SnapshotError(f"shard mismatch: manifest {sorted(man_shards)} vs postings {sorted(post_shards)}")
    n = spark.read.parquet(os.path.join(index_dir, "doc_stats")).count()
    if n != meta["n_docs"]:
        raise SnapshotError(f"doc_stats rows {n} != meta n_docs {meta['n_docs']}")
    return {"shards": len(man_shards), "n_docs": n}
