"""Snapshot/restore (operators/snapshot.py): consistent copy of a built
index, torn-snapshot refusal, restore integrity, search equivalence."""

import shutil

import pytest

from fluent_plugin_elasticsearch_spark.operators.search import InvertedIndex
from fluent_plugin_elasticsearch_spark.operators.snapshot import (
    SnapshotError,
    restore_index,
    snapshot_index,
    verify_index,
)


def test_snapshot_restore_roundtrip(spark, index_dir, tmp_path):
    snap = str(tmp_path / "snap")
    info = snapshot_index(spark, index_dir, snap)
    assert info["state"] == "SUCCESS" and info["n_docs"] == 600

    before = [(r["doc_id"], round(r["score"], 9))
              for r in InvertedIndex(spark, index_dir).search("the of", k=10).collect()]

    restored = str(tmp_path / "restored")
    restore_index(spark, snap, restored)
    after = [(r["doc_id"], round(r["score"], 9))
             for r in InvertedIndex(spark, restored).search("the of", k=10).collect()]
    assert before == after


def test_snapshot_refuses_existing_target(spark, index_dir, tmp_path):
    snap = str(tmp_path / "s2")
    snapshot_index(spark, index_dir, snap)
    with pytest.raises(SnapshotError):
        snapshot_index(spark, index_dir, snap)
    with pytest.raises(SnapshotError):
        restore_index(spark, snap, index_dir)  # target exists


def test_verify_detects_missing_shard(spark, index_dir, tmp_path):
    snap = str(tmp_path / "s3")
    snapshot_index(spark, index_dir, snap)
    broken = str(tmp_path / "broken")
    restore_index(spark, snap, broken)
    # corrupt: drop one postings shard partition dir
    import glob, os
    shard_dirs = glob.glob(os.path.join(broken, "postings", "shard=*"))
    shutil.rmtree(shard_dirs[0])
    with pytest.raises(SnapshotError):
        verify_index(spark, broken)
