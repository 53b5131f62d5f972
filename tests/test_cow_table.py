"""Copy-on-write bucketed table: MERGE correctness vs the full-rewrite
emulation, touched-bucket-only rewrites, snapshot isolation, vacuum."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_plugin_elasticsearch_spark.sinks.cow_table import CowTable
from fluent_plugin_elasticsearch_spark.sinks.write_ops import op_upsert


def _mk(spark, tmp_path, n=200, n_buckets=8):
    t = CowTable(spark, str(tmp_path / "t"), id_col="doc_id", n_buckets=n_buckets)
    df = spark.createDataFrame(
        [Row(doc_id=i, v=f"v{i}", n=i) for i in range(n)])
    t.create(df)
    return t, df


def test_upsert_matches_full_rewrite_emulation(spark, tmp_path):
    t, df = _mk(spark, tmp_path)
    batch = spark.createDataFrame(
        [Row(doc_id=5, v="NEW5", n=500),
         Row(doc_id=7, v="NEW7", n=700),
         Row(doc_id=999, v="NEW999", n=999)])
    want = {(r["doc_id"], r["v"], r["n"])
            for r in op_upsert(df, batch, "doc_id").collect()}
    t.upsert(batch)
    got = {(r["doc_id"], r["v"], r["n"]) for r in t.read().collect()}
    assert got == want
    assert ("NEW5" in {v for _, v, _ in got}) and (999, "NEW999", 999) in got


def test_update_only_mode_skips_inserts(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=20)
    batch = spark.createDataFrame(
        [Row(doc_id=3, v="U3", n=33), Row(doc_id=777, v="NOPE", n=0)])
    t.upsert(batch, insert_missing=False)
    rows = {r["doc_id"]: r["v"] for r in t.read().collect()}
    assert rows[3] == "U3" and 777 not in rows and len(rows) == 20


def test_only_touched_buckets_rewritten(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=500, n_buckets=16)
    import json

    m0 = json.load(open(os.path.join(t.path, "manifest.json")))
    batch = spark.createDataFrame([Row(doc_id=5, v="X", n=0)])
    res = t.upsert(batch)
    m1 = json.load(open(os.path.join(t.path, "manifest.json")))
    # exactly ONE bucket moved to the new generation; 15 untouched
    assert len(res["touched_buckets"]) == 1
    moved = [b for b in map(str, range(16)) if m0["buckets"][b] != m1["buckets"][b]]
    assert len(moved) == 1 and m1["generation"] == m0["generation"] + 1


def test_snapshot_isolation_and_vacuum(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=100)
    before = t.read()          # plan bound to gen-0 directories
    n0 = before.count()
    t.upsert(spark.createDataFrame([Row(doc_id=1, v="CHANGED", n=-1)]))
    # the pre-swap reader still sees the old snapshot value
    old_rows = {r["doc_id"]: r["v"] for r in before.collect()}
    assert old_rows[1] == "v1" and len(old_rows) == n0
    new_rows = {r["doc_id"]: r["v"] for r in t.read().collect()}
    assert new_rows[1] == "CHANGED"
    # vacuum drops the retired gen-0 bucket dir
    assert t.vacuum() == 1
    assert {r["doc_id"]: r["v"] for r in t.read().collect()}[1] == "CHANGED"


def test_delete_where_rewrites_matching_buckets_only(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=100, n_buckets=8)
    res = t.delete_where(F.col("doc_id") < 10)
    assert 0 < len(res["touched_buckets"]) <= 8
    left = t.read()
    assert left.count() == 90
    assert left.filter(F.col("doc_id") < 10).count() == 0
    # no-match delete touches nothing
    res2 = t.delete_where(F.col("doc_id") > 10_000)
    assert res2["touched_buckets"] == []


def test_create_twice_rejected(spark, tmp_path):
    t, df = _mk(spark, tmp_path, n=10)
    with pytest.raises(ValueError):
        t.create(df)


def test_ingest_pipeline_cow_sink(spark, tmp_path):
    import datetime as dt

    from fluent_plugin_elasticsearch_spark.streaming.ingest import IngestPipeline

    pipe = IngestPipeline(str(tmp_path / "out"), id_keys=["user"],
                          write_op="index", table_format="cow", n_buckets=4)
    b1 = spark.createDataFrame(
        [Row(time=dt.datetime(2024, 1, 1, 5), user=f"u{i}", msg=f"m{i}")
         for i in range(10)])
    pipe.run_batch(b1, 0)
    # second batch: same ids (updated msg) + new ids → cow merge
    b2 = spark.createDataFrame(
        [Row(time=dt.datetime(2024, 1, 1, 6), user="u1", msg="UPDATED"),
         Row(time=dt.datetime(2024, 1, 1, 6), user="u99", msg="fresh")])
    stats = pipe.run_batch(b2, 1)
    assert stats["touched_buckets"]
    rows = {r["user"]: r["msg"] for r in pipe._cow.read().collect()}
    assert rows["u1"] == "UPDATED" and rows["u99"] == "fresh"
    assert len(rows) == 11  # 10 originals + 1 new, u1 replaced not duplicated
    with pytest.raises(ValueError):
        IngestPipeline(str(tmp_path / "x"), table_format="cow")  # no id_keys


def test_retry_after_crash_does_not_duplicate(spark, tmp_path):
    """ADVICE r4 (medium): a crashed attempt (parquet written, manifest NOT
    swapped) followed by a redelivered retry must not duplicate rows."""
    t, _ = _mk(spark, tmp_path, n=50, n_buckets=4)
    batch = spark.createDataFrame([Row(doc_id=5, v="RETRY", n=55)])
    # simulate the crash: do the data write exactly as upsert would,
    # but never swap the manifest
    m = t._load_manifest()
    gen_rel = t._new_gen_rel(m["generation"] + 1)
    touched = t._touched_buckets(batch)
    current = t.read(buckets=touched)
    keep = current.join(batch.select("doc_id"), "doc_id", "left_anti")
    t._write_buckets(keep.unionByName(batch).withColumn("__bucket", t._bucket_col()),
                     gen_rel)
    # redelivery: the real upsert runs; unique staging dir → no collision
    t.upsert(batch)
    rows = t.read().collect()
    assert len(rows) == 50  # no duplicates
    assert {r["v"] for r in rows if r["doc_id"] == 5} == {"RETRY"}
    # the crashed attempt's orphan dir is swept by vacuum
    n = t.vacuum()
    assert n >= 2  # retired bucket + orphan staging dir
    assert len(t.read().collect()) == 50


def test_upsert_noop_returns_stable_shape(spark, tmp_path):
    """ADVICE r4 (low): empty-batch upsert returns the same summary shape
    as a real one, not the whole manifest."""
    t, df = _mk(spark, tmp_path, n=10, n_buckets=4)
    empty = spark.createDataFrame([], df.schema)
    res = t.upsert(empty)
    assert set(res) == {"generation", "touched_buckets"}
    assert res["touched_buckets"] == []


def test_delete_ids_prunes_scan_to_touched_buckets(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=100, n_buckets=8)
    res = t.delete_ids([3, 7])
    assert 0 < len(res["touched_buckets"]) <= 2
    left = t.read()
    assert left.count() == 98
    assert left.filter(F.col("doc_id").isin(3, 7)).count() == 0
    assert t.delete_ids([])["touched_buckets"] == []


def test_compact_coalesces_and_rebuckets(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=100, n_buckets=4)
    for i in range(3):  # accrue generations
        t.upsert(spark.createDataFrame([Row(doc_id=i, v=f"g{i}", n=i)]))
    before = {(r["doc_id"], r["v"]) for r in t.read().collect()}
    res = t.compact(target_buckets=16)
    assert len(res["touched_buckets"]) == 16
    t2 = CowTable(spark, t.path)  # reopen — manifest carries new n_buckets
    assert t2.n_buckets == 16
    after = {(r["doc_id"], r["v"]) for r in t2.read().collect()}
    assert after == before
    t2.vacuum()
    assert {(r["doc_id"], r["v"]) for r in t2.read().collect()} == before
    # post-compact upserts still land in the right (new) buckets
    t2.upsert(spark.createDataFrame([Row(doc_id=0, v="after", n=0)]))
    assert {r["v"] for r in t2.read().filter(F.col("doc_id") == 0).collect()} == {"after"}


# --- concurrent-writer CAS (VERDICT r5 item #3) ----------------------------

def _bucket_of(spark, t, doc_id):
    return (spark.createDataFrame([Row(doc_id=doc_id)])
            .select(t._bucket_col().alias("b")).collect()[0]["b"])


def test_interleaved_overlapping_upserts_both_land_exactly_once(
        spark, tmp_path, monkeypatch):
    """Writer A stages its merge, writer B commits an OVERLAPPING-bucket
    upsert before A's commit → A's first commit attempt conflicts, A
    re-merges from B's snapshot, and both batches land exactly once."""
    t, _ = _mk(spark, tmp_path, n=100, n_buckets=4)
    t2 = CowTable(spark, t.path)  # independent writer handle

    # find an insert id in the SAME bucket as doc 5 (buckets are
    # xxhash64-based, so probe)
    b5 = _bucket_of(spark, t, 5)
    overlap_id = next(i for i in range(2000, 2200)
                      if _bucket_of(spark, t, i) == b5)
    batch_a = spark.createDataFrame([Row(doc_id=5, v="A5", n=-5),
                                     Row(doc_id=1005, v="A1005", n=-1)])
    batch_b = spark.createDataFrame([Row(doc_id=overlap_id, v="B", n=-9)])

    attempts = []
    orig = t._commit_buckets

    def interleaved(base_dirs, gen_rel):
        if not attempts:
            attempts.append(1)
            t2.upsert(batch_b)  # lands first, moves shared buckets
        return orig(base_dirs, gen_rel)

    monkeypatch.setattr(t, "_commit_buckets", interleaved)
    res = t.upsert(batch_a)
    rows = {r["doc_id"]: (r["v"], r["n"]) for r in t.read().collect()}
    assert rows[5] == ("A5", -5) and rows[1005] == ("A1005", -1)
    assert rows[overlap_id] == ("B", -9)
    assert len(rows) == 102  # 100 original + 2 inserts, no duplicates
    # create=gen0, B=gen1, A's retry commit=gen2
    assert res["generation"] == 2


def test_disjoint_bucket_writers_commit_without_conflict(
        spark, tmp_path, monkeypatch):
    """Two writers on DISJOINT buckets: B commits mid-flight, A's commit
    validates only ITS buckets and succeeds on the first attempt."""
    t, _ = _mk(spark, tmp_path, n=100, n_buckets=4)
    t2 = CowTable(spark, t.path)
    # find two doc ids hashing to different buckets
    ids = {}
    for i in range(1000, 1040):
        ids.setdefault(_bucket_of(spark, t, i), i)
        if len(ids) >= 2:
            break
    (b1, id1), (b2, id2) = sorted(ids.items())[:2]
    assert b1 != b2
    batch_a = spark.createDataFrame([Row(doc_id=id1, v="A", n=1)])
    batch_b = spark.createDataFrame([Row(doc_id=id2, v="B", n=2)])

    commits = []
    orig = t._commit_buckets

    def interleaved(base_dirs, gen_rel):
        if not commits:
            commits.append(1)
            t2.upsert(batch_b)
        return orig(base_dirs, gen_rel)

    monkeypatch.setattr(t, "_commit_buckets", interleaved)
    t.upsert(batch_a)
    assert len(commits) == 1  # single attempt — no conflict retry
    rows = {r["doc_id"]: r["v"] for r in t.read().collect()}
    assert rows[id1] == "A" and rows[id2] == "B" and len(rows) == 102


def test_conflict_retries_exhausted_raises(spark, tmp_path, monkeypatch):
    from fluent_plugin_elasticsearch_spark.sinks.cow_table import CommitConflict

    t, _ = _mk(spark, tmp_path, n=50, n_buckets=2)
    t2 = CowTable(spark, t.path)
    batch_a = spark.createDataFrame([Row(doc_id=3, v="A", n=0)])

    orig = t._commit_buckets
    b3 = _bucket_of(spark, t, 3)
    same_bucket = [i for i in range(1000, 1400)
                   if _bucket_of(spark, t, i) == b3]

    def always_conflicting(base_dirs, gen_rel):
        t2.upsert(spark.createDataFrame(
            [Row(doc_id=same_bucket.pop(), v="B", n=0)]))
        return orig(base_dirs, gen_rel)

    monkeypatch.setattr(t, "_commit_buckets", always_conflicting)
    with pytest.raises(CommitConflict):
        t.upsert(batch_a, max_retries=1)


def test_stale_lock_is_broken(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=20, n_buckets=2)
    lockp = os.path.join(t.path, "_commit.lock")
    open(lockp, "w").write("pid=dead\n")
    old = os.path.getmtime(lockp) - 10_000
    os.utime(lockp, (old, old))
    t.upsert(spark.createDataFrame([Row(doc_id=3, v="X", n=0)]))
    assert {r["v"] for r in t.read().filter(F.col("doc_id") == 3).collect()} == {"X"}
    assert not os.path.exists(lockp)


def test_fresh_lock_times_out(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, n=10, n_buckets=2)
    lockp = os.path.join(t.path, "_commit.lock")
    open(lockp, "w").write("pid=alive\n")
    with pytest.raises(TimeoutError):
        with t._commit_lock(timeout=0.2):
            pass
    os.unlink(lockp)


def test_delete_ids_large_int64_ids_match(spark, tmp_path):
    """ADVICE r5: ids >= 2^53 must still delete (no double coercion)."""
    t = CowTable(spark, str(tmp_path / "big"), id_col="doc_id", n_buckets=4)
    big = 2**62 + 12345
    t.create(spark.createDataFrame([Row(doc_id=big, v="big", n=1),
                                    Row(doc_id=7, v="small", n=2)]))
    t.delete_ids([big])
    rows = [r["doc_id"] for r in t.read().collect()]
    assert rows == [7]


def test_compact_sort_by_orders_within_buckets(spark, tmp_path):
    import glob
    import os

    import pyarrow.parquet as pq

    t, _ = _mk(spark, tmp_path, n=200, n_buckets=4)
    before = {(r["doc_id"], r["v"]) for r in t.read().collect()}
    t.compact(sort_by=["n"])
    t2 = CowTable(spark, t.path)
    assert {(r["doc_id"], r["v"]) for r in t2.read().collect()} == before
    # every rewritten parquet file is sorted by n — tight row-group
    # min/max stats are what make sorted compaction pay off on reads
    m = t2._load_manifest()
    files = []
    for rel in set(m["buckets"].values()):
        files += glob.glob(os.path.join(t2.path, rel, "*.parquet"))
    assert files
    for f in files:
        col = pq.read_table(f, columns=["n"]).column("n").to_pylist()
        assert col == sorted(col)


def test_stale_handle_rehashes_after_concurrent_rebucket(spark, tmp_path):
    """ADVICE r6 (medium): a handle opened before another writer's
    compact(target_buckets=...) must pick up the new bucket modulus when
    it reloads the manifest — hashing with the stale modulus would commit
    rows into buckets that don't match their id hash, silently breaking
    later bucket-pruned reads."""
    t1 = CowTable(spark, str(tmp_path / "t"), id_col="doc_id", n_buckets=4)
    t1.create(spark.createDataFrame([Row(doc_id=i, v=f"a{i}")
                                     for i in range(40)]))
    t2 = CowTable(spark, t1.path)          # second writer handle
    assert t2.n_buckets == 4
    t1.compact(target_buckets=8)           # re-bucket under t2's feet
    t2.upsert(spark.createDataFrame([Row(doc_id=i, v=f"b{i}")
                                     for i in range(0, 40, 3)]))
    assert t2.n_buckets == 8               # modulus refreshed on reload
    # every updated row must be found by a bucket-PRUNED id read
    got = {r["doc_id"]: r["v"] for r in t2.read().collect()}
    for i in range(40):
        assert got[i] == (f"b{i}" if i % 3 == 0 else f"a{i}")
    # delete_ids prunes by hash — only correct if rows live where the
    # current modulus says they do
    t2.delete_ids([0, 3, 6])
    left = {r["doc_id"] for r in t2.read().collect()}
    assert left == set(range(40)) - {0, 3, 6}
