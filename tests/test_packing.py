

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
