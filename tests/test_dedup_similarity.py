"""Dedup + similarity operators: correctness vs brute-force definitions."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_plugin_elasticsearch_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles_df,
    simhash_pairs,
    simhash_signatures,
)
from fluent_plugin_elasticsearch_spark.operators.similarity import (
    cosine_topk,
    embedding_nneardup_pairs,
    lsh_cosine_topk,
)
from fluent_plugin_elasticsearch_spark.textproc import tokenize_simple

TEXTS = {
    1: "the quick brown fox jumps over the lazy dog",
    2: "the quick brown fox jumps over the lazy cat",   # near-dup of 1
    3: "completely different content about spark engines",
    4: "the quick brown fox jumps over the lazy dog",   # exact dup of 1
    5: "unrelated short text",
}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame([Row(doc_id=k, text=v) for k, v in TEXTS.items()])


def brute_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = tokenize_simple(t)
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    sa, sb = sh(a), sh(b)
    return len(sa & sb) / len(sa | sb) if sa | sb else 0.0


def test_exact_dedup(docs):
    out = exact_dedup(docs).collect()
    groups = {r["keep_id"]: r["group_size"] for r in out}
    assert groups[1] == 2  # docs 1 and 4 identical, keep min id
    assert sum(groups.values()) == 5


def test_shingles_match_brute(docs):
    rows = shingles_df(docs, 3).collect()
    got = {(r["doc_id"], r["shingle"]) for r in rows}
    for d, t in TEXTS.items():
        toks = tokenize_simple(t)
        expected = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        assert {s for (dd, s) in got if dd == d} == expected


def test_ngram_jaccard_pairs_match_brute(docs):
    out = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, 3, 0.5).collect()}
    expected = {}
    ids = sorted(TEXTS)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            j = brute_jaccard(TEXTS[a], TEXTS[b])
            if j >= 0.5:
                expected[(a, b)] = j
    assert set(out) == set(expected)
    for k, v in expected.items():
        assert out[k] == pytest.approx(v)


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, n=2, num_hashes=16, bands=8).collect()}
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs  # near-dup with generous bands
    assert (3, 5) not in pairs


def test_minhash_signature_identical_for_identical_docs(docs):
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(docs, n=2).collect()}
    assert sigs[1] == sigs[4]
    assert sigs[1] != sigs[3]


def test_simhash_near_dup(docs):
    sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(docs).collect()}
    assert sigs[1] == sigs[4]
    # pure-Python two's-complement view: np.uint64(negative int) is a
    # DeprecationWarning today and a hard error on future numpy
    m = (1 << 64) - 1
    ham12 = bin((sigs[1] & m) ^ (sigs[2] & m)).count("1")
    ham13 = bin((sigs[1] & m) ^ (sigs[3] & m)).count("1")
    assert ham12 < ham13  # near-dup closer than unrelated
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=8).collect()}
    assert pairs.get((1, 4)) == 0


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16).astype(np.float32)
    rows = [Row(vec_id=0, embedding=[float(x) for x in base])]
    for i in range(1, 30):
        noise = rng.standard_normal(16).astype(np.float32)
        mix = 0.95 * base + 0.05 * noise if i <= 3 else noise
        rows.append(Row(vec_id=i, embedding=[float(x) for x in mix]))
    return spark.createDataFrame(rows)


def brute_cosine_topk(rows, qv, k):
    import numpy as np

    scored = []
    for r in rows:
        v = np.array(r["embedding"])
        scored.append((r["vec_id"], float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv)))))
    return sorted(scored, key=lambda t: (-t[1], t[0]))[:k]


def test_cosine_topk_matches_brute(spark, emb):
    rows = emb.filter(F.col("vec_id") != 0).collect()
    qv = np.array(emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"])
    expected = brute_cosine_topk(rows, qv, 5)
    qdf = emb.filter(F.col("vec_id") == 0).select(F.lit(0).alias("query_id"), "embedding")
    got = cosine_topk(emb.filter(F.col("vec_id") != 0), qdf, k=5).collect()
    assert [r["vec_id"] for r in got] == [i for i, _ in expected]
    for r, (_, s) in zip(got, expected):
        assert r["cosine"] == pytest.approx(s, abs=1e-6)


def test_lsh_topk_recall(spark, emb):
    qdf = emb.filter(F.col("vec_id") == 0).select(F.lit(0).alias("query_id"), "embedding")
    got = lsh_cosine_topk(emb.filter(F.col("vec_id") != 0), qdf, dim=16, k=3,
                          n_planes=6, n_tables=6).collect()
    # the three 0.95-mix vectors must be found by LSH
    assert {r["vec_id"] for r in got} == {1, 2, 3}


def test_embedding_near_dup_pairs(spark, emb):
    pairs = {(r["id_a"], r["id_b"]) for r in
             embedding_nneardup_pairs(emb, dim=16, threshold=0.9, n_planes=6, n_tables=6).collect()}
    for a, b in [(0, 1), (0, 2), (0, 3)]:
        assert (a, b) in pairs


def test_embedding_near_dup_hot_bucket_cap(spark):
    """A degenerate embedding mode (many near-identical vectors) lands in
    one LSH bucket; the max_bucket guard must bound the candidate join
    instead of going quadratic (VERDICT r6 #2 — same cap as
    minhash_lsh_pairs / simhash_pairs)."""
    import pandas as pd

    n = 400
    base = np.ones(16, dtype=np.float64)
    rows = [(i, (base + 1e-9 * i * np.arange(16)).tolist()) for i in range(n)]
    emb = spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows],
                      "embedding": [r[1] for r in rows]}))
    capped = embedding_nneardup_pairs(
        emb, dim=16, threshold=0.99, n_planes=6, n_tables=2, max_bucket=50)
    # every bucket holds ~all 400 near-identical vectors (> cap) → the
    # guard drops them: bounded candidates, not ~n²/2 pairs
    assert capped.count() == 0
    uncapped = embedding_nneardup_pairs(
        emb, dim=16, threshold=0.99, n_planes=6, n_tables=1,
        max_bucket=10**9).limit(5)
    assert len(uncapped.collect()) == 5  # same data joins when uncapped


def test_ivf_topk_recall(spark, emb):
    from fluent_plugin_elasticsearch_spark.operators.similarity import ivf_cosine_topk

    qdf = emb.filter(F.col("vec_id") == 0).select(F.lit(0).alias("query_id"), "embedding")
    got = ivf_cosine_topk(emb.filter(F.col("vec_id") != 0), qdf, dim=16, k=3,
                          n_lists=4, n_probe=2).collect()
    # high-similarity mixes must be found when probing half the lists
    assert {r["vec_id"] for r in got} == {1, 2, 3}
    sims = [r["cosine"] for r in got]
    assert sims == sorted(sims, reverse=True)


def test_knn_query_body_routes_to_ann(spark, sf_dir):
    """ES 8 kNN search body via the query AST: single-query path plans
    TakeOrderedAndProject, no constant-partition window."""
    from pyspark.sql import functions as F

    from fluent_plugin_elasticsearch_spark.plans.query_ast import compile_query

    docs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    out = compile_query(docs, {"knn": {"field": "embedding",
                                       "query_vector": [1.0] * 64, "k": 5}})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Window" not in plan
    rows = out.collect()
    assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
    assert rows[0]["cosine"] >= rows[-1]["cosine"]


def test_ivf_index_reuses_assignment(spark, emb):
    """IvfIndex: one persisted assignment serves multiple query batches,
    results identical to the one-shot ivf_cosine_topk."""
    from fluent_plugin_elasticsearch_spark.operators.similarity import (
        IvfIndex,
        ivf_cosine_topk,
    )

    q1 = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), F.col("embedding"))
    q2 = emb.filter(F.col("vec_id") == 1).select(
        F.lit(1).alias("query_id"), F.col("embedding"))
    idx = IvfIndex(emb, dim=16, n_lists=4, seed=7)
    assert idx.assigned.is_cached
    got1 = idx.search(q1, k=3, n_probe=2).collect()
    got2 = idx.search(q2, k=3, n_probe=2).collect()  # second batch, same assignment
    ref1 = ivf_cosine_topk(emb, q1, dim=16, k=3, n_lists=4, n_probe=2, seed=7).collect()
    assert [(r["vec_id"], r["rank"]) for r in got1] == [(r["vec_id"], r["rank"]) for r in ref1]
    assert len(got2) == 3 and got2[0]["vec_id"] == 1  # self is nearest
    idx.close()


def test_pq_index_recall_and_compression(spark):
    import numpy as np

    from fluent_plugin_elasticsearch_spark.operators.similarity import (
        PqIndex, cosine_topk)

    rng = np.random.RandomState(11)
    # clustered data: PQ codebooks have structure to learn
    centers = rng.randn(8, 32) * 3
    vecs = np.vstack([centers[i % 8] + rng.randn(32) * 0.7 for i in range(600)])
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(600)],
        "vec_id long, embedding array<double>")
    qdf = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")

    idx = PqIndex(emb, dim=32, m=8, seed=3, train_sample=600)
    # storage: m bytes per vector, exactly
    row = idx.codes.limit(1).collect()[0]
    assert len(row["codes"]) == 8

    got = idx.search(qdf, k=10, rerank_factor=6)
    exact = cosine_topk(emb, qdf, k=10)
    g = {(r["query_id"], r["vec_id"]) for r in got.collect()}
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(g & e) / len(e)
    assert recall >= 0.8, recall
    # returned cosines are EXACT (rerank repairs ADC approximation)
    ex = {(r["query_id"], r["vec_id"]): r["cosine"] for r in exact.collect()}
    for r in got.collect():
        key = (r["query_id"], r["vec_id"])
        if key in ex:
            assert abs(r["cosine"] - ex[key]) < 1e-9


def test_pq_index_deterministic(spark):
    import numpy as np

    from fluent_plugin_elasticsearch_spark.operators.similarity import PqIndex

    rng = np.random.RandomState(5)
    vecs = rng.randn(200, 16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<double>")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding")
    a = PqIndex(emb, dim=16, m=4, seed=9, train_sample=200)
    b = PqIndex(emb, dim=16, m=4, seed=9, train_sample=200)
    ra = [(r["vec_id"], round(r["cosine"], 9)) for r in a.search(qdf, k=5).collect()]
    rb = [(r["vec_id"], round(r["cosine"], 9)) for r in b.search(qdf, k=5).collect()]
    assert ra == rb
    a.close(); b.close()


def test_pq_and_ivf_sample_partition_invariant(spark):
    """The md5-keyed training sample makes learned centroids a function of
    the input ROWS, not the partition layout: a repartitioned corpus must
    yield identical PQ search results and identical IVF centroids."""
    import numpy as np

    from fluent_plugin_elasticsearch_spark.operators.similarity import (
        PqIndex, train_ivf_centroids)

    rng = np.random.RandomState(11)
    vecs = rng.randn(300, 16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(300)],
        "vec_id long, embedding array<double>")
    shuffled = emb.repartition(17, "vec_id")
    qdf = emb.filter(F.col("vec_id") == 0).select(
        F.lit(0).alias("query_id"), "embedding")

    a = PqIndex(emb, dim=16, m=4, seed=9, train_sample=120)
    b = PqIndex(shuffled, dim=16, m=4, seed=9, train_sample=120)
    ra = [(r["vec_id"], round(r["cosine"], 9)) for r in a.search(qdf, k=5).collect()]
    rb = [(r["vec_id"], round(r["cosine"], 9)) for r in b.search(qdf, k=5).collect()]
    assert ra == rb
    a.close(); b.close()

    ca = train_ivf_centroids(emb, dim=16, n_lists=4, sample=120, seed=3)
    cb = train_ivf_centroids(shuffled, dim=16, n_lists=4, sample=120, seed=3)
    assert np.array_equal(ca, cb)


def test_contamination_check(spark):
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.dedup import (
        contamination_check)

    docs = spark.createDataFrame([
        Row(doc_id=0, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=1, text="completely different words entirely here now"),
        Row(doc_id=2, text="quick brown fox appears here too"),
    ])
    bench = spark.createDataFrame([
        Row(bench_id=100, text="watch the quick brown fox run"),
    ])
    out = {(r["doc_id"], r["bench_id"]): r["n_shared_grams"]
           for r in contamination_check(docs, bench, n=3).collect()}
    # 'quick brown fox' shared by docs 0 and 2; doc 1 clean
    assert set(out) == {(0, 100), (2, 100)}
    assert out[(0, 100)] >= 1 and out[(2, 100)] >= 1


def test_cosine_topk_batch_matches_jvm(spark):
    import numpy as np

    from fluent_plugin_elasticsearch_spark.operators.similarity import (
        cosine_topk, cosine_topk_batch)

    rng = np.random.RandomState(3)
    vecs = rng.randn(400, 16)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)],
        "vec_id long, embedding array<double>")
    qdf = emb.filter(F.col("vec_id") < 8).select(
        F.lit(0).alias("__drop"), F.col("vec_id").alias("query_id"), "embedding"
    ).drop("__drop")
    a = {(r["query_id"], r["rank"]): r["vec_id"]
         for r in cosine_topk(emb, qdf, k=10).collect()}
    b = {(r["query_id"], r["rank"]): r["vec_id"]
         for r in cosine_topk_batch(emb, qdf, k=10).collect()}
    assert a == b  # rank-identical (random doubles: no exact float ties)


def test_kmeans_integer_exact_and_partition_invariant(spark):
    import numpy as np
    from fluent_plugin_elasticsearch_spark.operators.similarity import kmeans_clusters

    rng = np.random.RandomState(11)
    # three well-separated blobs + their seeds as init ids
    blobs = np.concatenate([rng.randn(30, 8) * 0.1 + c
                            for c in (np.zeros(8), np.ones(8) * 3, -np.ones(8) * 3)])
    rows = [(i, [float(x) for x in blobs[i]]) for i in range(90)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["cluster"]
           for r in kmeans_clusters(emb, k=3, iters=2, init_ids=[0, 30, 60]).collect()}
    # blob membership fully recovered
    assert all(out[i] == 0 for i in range(30))
    assert all(out[i] == 1 for i in range(30, 60))
    assert all(out[i] == 2 for i in range(60, 90))
    # partition invariance: same assignment at a different parallelism
    out2 = {r["vec_id"]: r["cluster"]
            for r in kmeans_clusters(emb.repartition(13), k=3, iters=2,
                                     init_ids=[0, 30, 60]).collect()}
    assert out == out2


def test_dedup_apply_keep_canonical(spark):
    """dedup_apply keeps the min-id doc of every cluster and every
    unpaired doc; losers are gone."""
    from pyspark.sql import Row
    from fluent_plugin_elasticsearch_spark.operators.dedup import dedup_apply

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"t{i}") for i in range(8)])
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=3), Row(id_a=3, id_b=5),   # cluster {1,3,5} -> 1
         Row(id_a=6, id_b=7)])                        # cluster {6,7} -> 6
    kept = sorted(r["doc_id"] for r in dedup_apply(docs, pairs).collect())
    assert kept == [0, 1, 2, 4, 6]


def test_msearch_multiplex(spark):
    from pyspark.sql import Row
    from fluent_plugin_elasticsearch_spark.sources.scan import msearch

    docs = spark.createDataFrame(
        [Row(doc_id=i, lang="en" if i % 2 else "de", n_chars=100 + i)
         for i in range(10)])
    out = msearch(docs, [
        {"query": {"ids": {"values": [2, 4]}}},
        {"query": {"term": {"lang": "en"}}, "size": 3,
         "sort": [{"n_chars": "desc"}, {"doc_id": "asc"}]},
    ])
    rows = sorted((r["query_idx"], r["doc_id"]) for r in out.collect())
    assert rows == [(0, 2), (0, 4), (1, 5), (1, 7), (1, 9)]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one"):
        msearch(docs, [])


def test_feature_hash_embed(spark):
    import hashlib

    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.similarity import (
        feature_hash_embed,
    )

    rows = [Row(doc_id=1, text="alpha beta alpha"),
            Row(doc_id=2, text=""), Row(doc_id=3, text="Alpha!")]
    out = {r["doc_id"]: r["emb"] for r in
           feature_hash_embed(spark.createDataFrame(rows), dim=8).collect()}

    def ref(tokens, dim=8):
        v = [0] * dim
        for t in tokens:
            h = hashlib.md5(t.encode()).hexdigest()
            v[int(h[:8], 16) % dim] += 1 if int(h[8], 16) % 2 == 0 else -1
        return v

    assert out[1] == ref(["alpha", "beta", "alpha"])
    assert out[2] == [0] * 8
    assert out[3] == ref(["alpha"])  # tokenizer lowercases, strips punct
    # exact-int determinism: same embedding under repartitioning
    again = {r["doc_id"]: r["emb"] for r in feature_hash_embed(
        spark.createDataFrame(rows).repartition(5), dim=8).collect()}
    assert out == again
    # shuffle-free plan: no Exchange at all
    plan = (feature_hash_embed(spark.createDataFrame(rows), dim=8)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan


def test_pca_cov_moments_exact(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 5).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from fluent_plugin_elasticsearch_spark.operators.similarity import (
        pca_cov_moments,
    )

    got = {(int(r["i"]), int(r["j"])): (int(r["q"]), int(r["si"]), int(r["n"]))
           for r in pca_cov_moments(df).collect()}
    vu = np.floor(vecs.astype("float64") * 1e6).astype(object)
    for (i, j), (q, si, n) in got.items():
        assert q == int(sum(vu[:, i] * vu[:, j]))
        assert si == int(sum(vu[:, i]))
        assert n == 40
    # partition-invariant (exact ints)
    again = {(int(r["i"]), int(r["j"])): int(r["q"])
             for r in pca_cov_moments(df.repartition(7)).collect()}
    assert again == {k: v[0] for k, v in got.items()}


def test_embedding_pca_invariants(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    base = rng.randn(60, 3) @ rng.randn(3, 6)  # rank-3 structure in 6-d
    base += rng.randn(60, 6) * 0.01
    rows = [(i, [float(x) for x in base[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from fluent_plugin_elasticsearch_spark.operators.similarity import (
        embedding_pca,
    )

    out = embedding_pca(df, out_dim=3)
    p = np.stack([r["pca"] for r in out.orderBy("vec_id").collect()])
    assert p.shape == (60, 3)
    # projected coordinates are centered and mutually uncorrelated
    assert np.allclose(p.mean(axis=0), 0, atol=1e-6)
    c = (p.T @ p) / (60 - 1)
    off = c - np.diag(np.diag(c))
    assert np.allclose(off, 0, atol=1e-6)
    # components capture descending variance; rank-3 data → 3 big evals
    v = np.diag(c)
    assert v[0] >= v[1] >= v[2] > 0.001
    # deterministic under repartitioning (exact moments + fixed signs)
    p2 = np.stack([r["pca"] for r in
                   embedding_pca(df.repartition(9), out_dim=3)
                   .orderBy("vec_id").collect()])
    assert np.array_equal(p, p2)
    # whiten → unit variances
    pw = np.stack([r["pca"] for r in embedding_pca(df, out_dim=3,
                                                   whiten=True)
                   .orderBy("vec_id").collect()])
    assert np.allclose(pw.var(axis=0, ddof=1), 1.0, atol=1e-6)


def test_knn_body_with_explicit_sort(spark, sf_dir):
    """knn + top-level sort: the hit SET is the k nearest (identical to
    the unsorted body), presentation order follows the sort spec with
    similarity rank as tie-break; hybrid knn+query+sort still raises."""
    import pytest

    from fluent_plugin_elasticsearch_spark.plans.query_ast import (
        UnsupportedQuery,
        compile_query,
    )

    docs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding", "label"
    )
    knn = {"field": "embedding", "query_vector": [1.0] * 64, "k": 5}
    plain = compile_query(docs, {"knn": knn}).collect()
    sorted_ = compile_query(docs, {
        "knn": knn, "sort": [{"label": {"order": "desc"}}]}).collect()
    assert {r["doc_id"] for r in sorted_} == {r["doc_id"] for r in plain}
    keys = [(-r["label"], r["rank"]) for r in sorted_]
    assert keys == sorted(keys)
    with pytest.raises(UnsupportedQuery, match="score-ordered"):
        compile_query(docs, {
            "knn": knn, "sort": [{"label": "desc"}],
            "query": {"multi_match": {"query": "x", "fields": ["text"]}}})


def test_semdedup_keep_brute_force(spark):
    import numpy as np
    from pyspark.sql import Row

    from fluent_plugin_elasticsearch_spark.operators.similarity import (
        kmeans_clusters,
        semdedup_keep,
    )

    # two tight groups far apart + one singleton per group region
    vecs = {
        0: [1.0, 0.0, 0.0], 1: [0.999, 0.01, 0.0], 2: [0.998, 0.02, 0.0],
        3: [0.0, 1.0, 0.0], 4: [0.0, 0.999, 0.01],
        5: [0.5, 0.5, 0.7],
    }
    d = spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()])
    kept = [(r["vec_id"], r["cluster"]) for r in
            semdedup_keep(d, k=2, iters=2, threshold=0.999,
                          init_ids=[0, 3]).collect()]
    # brute force with the same clustering
    assign = {r["vec_id"]: r["cluster"] for r in
              kmeans_clusters(d, k=2, iters=2, init_ids=[0, 3]).collect()}

    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    # union-find over within-cluster pairs >= threshold
    parent = {i: i for i in vecs}

    def find(x):
        while parent[x] != x:
            x = parent[x]
        return x

    for i in vecs:
        for j in vecs:
            if i < j and assign[i] == assign[j] \
                    and cos(vecs[i], vecs[j]) >= 0.999:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    want = sorted((i, assign[i]) for i in vecs if find(i) == i)
    assert sorted(kept) == want
    # the tight group collapsed to its min id; distant points all survive
    kept_ids = {i for i, _ in kept}
    assert 0 in kept_ids and not {1, 2} <= kept_ids


def test_knn_similarity_cutoff(spark, sf_dir):
    from pyspark.sql import functions as F

    from fluent_plugin_elasticsearch_spark.plans.query_ast import compile_query

    docs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding")
    knn = {"field": "embedding", "query_vector": [1.0] * 64, "k": 5}
    full = compile_query(docs, {"knn": knn}).collect()
    cut = compile_query(docs, {"knn": {**knn, "similarity":
                                       full[2]["cosine"]}}).collect()
    # exactly the hits at or above the 3rd-best cosine survive, ranks kept
    assert [r["doc_id"] for r in cut] == [r["doc_id"] for r in full[:3]]
    assert [r["rank"] for r in cut] == [1, 2, 3]
    # an impossible threshold returns zero rows, not an error
    assert compile_query(docs, {"knn": {**knn, "similarity": 2.0}}).count() == 0
