

def test_mixture_by_token_budget(spark):
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.packing import (
        mixture_by_token_budget)

    rows = [Row(doc_id=i, source="a" if i < 10 else "b", n_chars=100)
            for i in range(30)]
    d = spark.createDataFrame(rows)
    # a: 10 docs x 100 = 1000 avail, budget 2500 → ratio 2.5: two full
    # epochs for every doc + ~half get a third copy
    out = mixture_by_token_budget(d, {"a": 2500.0, "b": 500.0}).collect()
    a_copies = {}
    for r in out:
        if r["source"] == "a":
            a_copies[r["doc_id"]] = a_copies.get(r["doc_id"], 0) + 1
    assert set(a_copies.values()) <= {2, 3}
    assert len(a_copies) == 10  # every doc kept at ratio >= 1
    b_rows = [r for r in out if r["source"] == "b"]
    assert all(r["epoch"] == 0 for r in b_rows)
    assert 0 < len(b_rows) < 20  # downsampled: ratio 0.25
    # unknown-source strata are dropped (no budget → no rows)
    assert all(r["source"] in ("a", "b") for r in out)
    # deterministic
    out2 = mixture_by_token_budget(d, {"a": 2500.0, "b": 500.0}).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


def test_quality_bins_no_global_window(spark):
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.packing import quality_bins

    d = spark.createDataFrame([Row(doc_id=i, score=float(i)) for i in range(100)])
    out = quality_bins(d, "score", n_bins=4).collect()
    bins = {r["doc_id"]: r["bin"] for r in out}
    # quartile thresholds at 24.75/49.5/74.25 → clean 25-row bins
    assert [bins[i] for i in (0, 24, 25, 49, 50, 74, 75, 99)] == [0, 0, 1, 1, 2, 2, 3, 3]
    # monotone in score
    assert all(bins[i] <= bins[i + 1] for i in range(99))
    # plan check: no single-partition window exchange
    plan = quality_bins(d, "score", n_bins=4)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_epoch_shuffle_deterministic_and_epoch_independent(spark):
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.packing import (
        epoch_shuffle,
    )

    d = spark.createDataFrame([Row(doc_id=i) for i in range(200)])
    e1 = [r["doc_id"] for r in
          epoch_shuffle(d, 1).orderBy("shuffle_key").collect()]
    # identical on a different partitioning
    e1b = [r["doc_id"] for r in
           epoch_shuffle(d.repartition(7), 1).orderBy("shuffle_key").collect()]
    assert e1 == e1b
    # a different epoch is a different permutation of the same ids
    e2 = [r["doc_id"] for r in
          epoch_shuffle(d, 2).orderBy("shuffle_key").collect()]
    assert sorted(e1) == sorted(e2) == list(range(200))
    assert e1 != e2
    # the plan is range-partition + local sort, not a global window
    plan = epoch_shuffle(d, 1)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower() and "Window" not in plan


def test_dsir_logratio_brute_force_and_partition_invariance(spark):
    import hashlib
    import math
    import re

    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.packing import (
        dsir_logratio_scores,
    )

    texts = [("the quick brown fox", True),
             ("quick quick brown", True),
             ("merge sorted partitions", False),
             ("wholly unrelated roses", False),
             ("the fox and the dog", False),
             ("", False)]
    rows = [Row(doc_id=i, text=t, tgt=is_t) for i, (t, is_t) in
            enumerate(texts)]
    d = spark.createDataFrame(rows)
    B = 64
    out = {r["doc_id"]: (r["n_features"], r["logratio_micro"])
           for r in dsir_logratio_scores(d, "tgt", buckets=B).collect()}

    def bucket(ng):
        return int(hashlib.md5(ng.encode()).hexdigest()[:8], 16) % B

    ct, cq, feats = {}, {}, {}
    for i, (t, is_t) in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        ngs = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        feats[i] = [bucket(n) for n in ngs]
        for b in feats[i]:
            cq[b] = cq.get(b, 0) + 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
    tt, tq = sum(ct.values()), sum(cq.values())
    for i, bs in feats.items():
        if not bs:
            assert i not in out
            continue
        want = sum(math.floor(
            (math.log((ct.get(b, 0) + 1.0) / (tt + B))
             - math.log((cq[b] + 1.0) / (tq + B))) * 1e6) for b in bs)
        assert out[i] == (len(bs), want)
    # target docs should score higher than clearly off-domain docs
    assert out[0][1] > out[3][1] and out[1][1] > out[3][1]
    # partition invariance: exact integer sums on any layout
    out12 = {r["doc_id"]: (r["n_features"], r["logratio_micro"])
             for r in dsir_logratio_scores(d.repartition(12), "tgt",
                                           buckets=B).collect()}
    assert out12 == out


def test_dsir_resample_deterministic_gumbel(spark):
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.packing import (
        dsir_resample,
    )

    rows = [Row(doc_id=i,
                text=("alpha beta gamma" if i % 3 == 0
                      else "delta epsilon zeta"),
                tgt=(i % 3 == 0)) for i in range(60)]
    d = spark.createDataFrame(rows)
    a = [(r["doc_id"], r["key_u"]) for r in
         dsir_resample(d, "tgt", k=10, buckets=32, seed=3).collect()]
    b = [(r["doc_id"], r["key_u"]) for r in
         dsir_resample(d.repartition(16), "tgt", k=10, buckets=32,
                       seed=3).collect()]
    assert a == b and len(a) == 10
    # keys strictly ordered desc with doc_id tiebreak
    assert a == sorted(a, key=lambda t: (-t[1], t[0]))
    # a different seed permutes the selection
    c = [r["doc_id"] for r in
         dsir_resample(d, "tgt", k=10, buckets=32, seed=4).collect()]
    assert c != [x for x, _ in a]
