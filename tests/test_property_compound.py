"""Seeded-random property tests for the round-3 compound operators
(SURVEY §5c style): invariants that must hold on ANY corpus —
dis_max tie-breaker algebra, search_after page-seam identity, composite
pagination completeness, span_near slop monotonicity, percolate vs
brute force."""

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from fluent_plugin_elasticsearch_spark.operators import relevance as rel
from fluent_plugin_elasticsearch_spark.operators.percolate import (
    make_query_registry,
    percolate,
)
from fluent_plugin_elasticsearch_spark.plans.aggs import compile_aggs
from fluent_plugin_elasticsearch_spark.plans.query_ast import compile_query

VOCAB = [f"w{i}" for i in range(40)]


def random_docs(spark, seed: int, n: int = 80):
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        length = int(rng.integers(3, 40))
        idx = np.minimum(rng.zipf(1.5, length) - 1, len(VOCAB) - 1)
        rows.append(Row(doc_id=i, text=" ".join(VOCAB[j] for j in idx),
                        grp=int(rng.integers(0, 5)), val=float(rng.integers(0, 100))))
    return spark.createDataFrame(rows), rows


@pytest.mark.parametrize("seed", [3, 41])
def test_dis_max_tiebreaker_algebra(spark, seed):
    docs, _ = random_docs(spark, seed)
    rng = np.random.default_rng(seed)
    q1 = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), 3)]
    q2 = [VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), 3)]
    n = docs.count()
    s1 = {r["doc_id"]: r["score_u"]
          for r in rel.dis_max_df(docs, [("text", q1)], k=n).collect()}
    s2 = {r["doc_id"]: r["score_u"]
          for r in rel.dis_max_df(docs, [("text", q2)], k=n).collect()}
    both0 = rel.dis_max_df(docs, [("text", q1), ("text", q2)], 0.0, k=n).collect()
    for r in both0:  # tie=0 → pure max
        assert r["score_u"] == max(s1.get(r["doc_id"], 0), s2.get(r["doc_id"], 0))
    both1 = rel.dis_max_df(docs, [("text", q1), ("text", q2)], 1.0, k=n).collect()
    for r in both1:  # tie=1 → sum
        assert r["score_u"] == s1.get(r["doc_id"], 0) + s2.get(r["doc_id"], 0)


@pytest.mark.parametrize("seed,page", [(5, 7), (17, 13)])
def test_search_after_page_seam_identity(spark, seed, page):
    docs, rows = random_docs(spark, seed)
    body = {"sort": [{"val": {"order": "desc"}}, {"doc_id": {"order": "asc"}}],
            "size": page}
    collected = []
    cursor = None
    while True:
        b = dict(body)
        if cursor is not None:
            b["search_after"] = cursor
        got = compile_query(docs, b).select("doc_id", "val").collect()
        if not got:
            break
        collected += [r["doc_id"] for r in got]
        cursor = [got[-1]["val"], got[-1]["doc_id"]]
    want = [r.doc_id for r in sorted(rows, key=lambda r: (-r.val, r.doc_id))]
    assert collected == want  # no dup, no gap, exact global order


@pytest.mark.parametrize("seed,page", [(11, 3), (29, 5)])
def test_composite_pagination_completeness(spark, seed, page):
    docs, rows = random_docs(spark, seed)
    seen = []
    after = None
    while True:
        spec = {"size": page, "sources": [{"g": {"terms": {"field": "grp"}}}]}
        if after:
            spec["after"] = after
        got = compile_aggs(docs, {"aggs": {"c": {"composite": spec}}})["c"].collect()
        if not got:
            break
        seen += [(r["g"], r["doc_count"]) for r in got]
        after = {"g": got[-1]["g"]}
    from collections import Counter

    want = sorted(Counter(r.grp for r in rows).items())
    assert seen == want


@pytest.mark.parametrize("seed", [13, 37])
def test_span_near_slop_monotone_and_bounded(spark, seed):
    docs, rows = random_docs(spark, seed)
    prev: set = set()
    for slop in (0, 1, 3, 8):
        ids = {r["doc_id"] for r in
               rel.span_near_df(docs, "w0", "w1", slop=slop, k=80).collect()}
        assert prev <= ids  # larger slop can only add matches
        prev = ids
    # bounded by docs containing both terms in either order
    both = {r.doc_id for r in rows
            if "w0" in r.text.split() and "w1" in r.text.split()}
    assert prev <= both


@pytest.mark.parametrize("seed", [19, 53])
def test_percolate_matches_brute_force_random(spark, seed):
    docs, rows = random_docs(spark, seed)
    rng = np.random.default_rng(seed + 1)
    queries = []
    for qid in range(6):
        terms = sorted({VOCAB[int(j)] for j in rng.integers(0, len(VOCAB), 3)})
        queries.append((qid, terms, int(rng.integers(1, len(terms) + 1))))
    got = {(r["doc_id"], r["query_id"])
           for r in percolate(docs, make_query_registry(spark, queries)).collect()}
    want = set()
    for r in rows:
        toks = set(r.text.split())
        for qid, terms, msm in queries:
            if len(set(terms) & toks) >= msm:
                want.add((r.doc_id, qid))
    assert got == want


def _brute_intervals_ordered(tokens, terms, max_gaps):
    """Reference count of anchor positions completing an ordered chain
    q1<...<qn with (qn-q1+1)-n <= max_gaps (mirror of the operator
    contract)."""
    import itertools

    pos = [[i + 1 for i, t in enumerate(tokens) if t == q] for q in terms]
    n = len(terms)
    sf = 0
    for anchor in pos[-1]:
        ok = False
        for combo in itertools.product(*pos[:-1]):
            seq = list(combo) + [anchor]
            if all(a < b for a, b in zip(seq, seq[1:])) and (
                    max_gaps < 0 or (anchor - seq[0] + 1 - n) <= max_gaps):
                ok = True
                break
        if ok:
            sf += 1
    return sf


@pytest.mark.parametrize("seed", [7, 23])
def test_intervals_matches_brute_force(spark, seed):
    docs, rows = random_docs(spark, seed, n=60)
    rng = np.random.default_rng(seed + 1)
    # frequent terms so chains actually occur
    terms = [VOCAB[int(j)] for j in rng.integers(0, 6, 3)]
    if len(set(terms)) < 3:  # operator assumes distinct clause terms
        terms = ["w0", "w1", "w2"]
    for mg in (-1, 0, 3):
        got = {r["doc_id"] for r in rel.intervals_match_df(
            docs, terms, max_gaps=mg, ordered=True, k=100).collect()}
        want = {r.doc_id for r in rows
                if _brute_intervals_ordered(r.text.split(), terms, mg) > 0}
        assert got == want, f"max_gaps={mg}"


@pytest.mark.parametrize("seed", [11, 29])
def test_span_not_matches_brute_force(spark, seed):
    docs, rows = random_docs(spark, seed, n=60)
    inc, exc, pre, post = "w0", "w1", 1, 2
    got = {r["doc_id"] for r in rel.span_not_df(
        docs, inc, exc, pre=pre, post=post, k=100).collect()}
    want = set()
    for r in rows:
        toks = r.text.split()
        pi = [i + 1 for i, t in enumerate(toks) if t == inc]
        px = [i + 1 for i, t in enumerate(toks) if t == exc]
        sf = sum(1 for p in pi if not any(p - pre <= q <= p + post for q in px))
        if sf > 0:
            want.add(r.doc_id)
    assert got == want
