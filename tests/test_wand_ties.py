"""Boundary-tie regression for the shard scorers: when many docs tie at the
k-th score, every path must return the SMALLEST doc_ids (score desc, doc_id
asc contract). Reproduces the argpartition candidate-drop bug: 40 equal-score
docs with k=5 previously returned [121,123,124,125,126] from the exhaustive
path while WAND and brute force returned [100..104].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from fluent_plugin_elasticsearch_spark.operators.codec import delta_encode, varint_encode
from fluent_plugin_elasticsearch_spark.operators.wand import (
    _tfn,
    score_shard_batch,
    score_shard_exhaustive,
    score_shard_wand,
)

K1, B = 1.2, 0.75
AVGDL = 10.0


def _blocks(term: str, doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray,
            block_size: int = 16) -> list[dict]:
    rows = []
    for s in range(0, doc_ids.size, block_size):
        e = min(s + block_size, doc_ids.size)
        ids, tf, dl = doc_ids[s:e], tfs[s:e], dls[s:e]
        rows.append({
            "term": term,
            "first_doc": int(ids[0]),
            "last_doc": int(ids[-1]),
            "n_docs": int(ids.size),
            "docs_enc": delta_encode(ids),
            "tfs_enc": varint_encode(tf),
            "dls_enc": varint_encode(dl),
            "max_tfn": float(_tfn(tf, dl, AVGDL, K1, B).max()),
        })
    return rows


@pytest.fixture()
def tied_pdf() -> pd.DataFrame:
    # 40 docs 100..139, identical tf and dl → identical scores
    ids = np.arange(100, 140, dtype=np.int64)
    tfs = np.full(40, 3, dtype=np.int64)
    dls = np.full(40, 10, dtype=np.int64)
    return pd.DataFrame(_blocks("t", ids, tfs, dls))


def test_exhaustive_keeps_boundary_ties(tied_pdf):
    got = score_shard_exhaustive(tied_pdf, {"t": 1.5}, 5, AVGDL, K1, B)
    assert got["doc_id"].tolist() == [100, 101, 102, 103, 104]
    assert got["score"].nunique() == 1


def test_wand_keeps_boundary_ties(tied_pdf):
    got = score_shard_wand(tied_pdf, {"t": 1.5}, 5, AVGDL, K1, B)
    assert got["doc_id"].tolist() == [100, 101, 102, 103, 104]


def test_batch_keeps_boundary_ties(tied_pdf):
    got = score_shard_batch(tied_pdf, {7: {"t": 1.5}}, 5, AVGDL, K1, B)
    assert got["query_id"].tolist() == [7] * 5
    assert got["doc_id"].tolist() == [100, 101, 102, 103, 104]


def test_partial_tie_at_boundary():
    """Scores: docs 0..9 high, then 30 tied at the k-th boundary (k=12):
    the two tied slots must be the smallest tied doc_ids."""
    ids = np.arange(200, 240, dtype=np.int64)
    tfs = np.concatenate([np.full(10, 9), np.full(30, 2)]).astype(np.int64)
    dls = np.full(40, 10, dtype=np.int64)
    pdf = pd.DataFrame(_blocks("t", ids, tfs, dls))
    for fn in (score_shard_exhaustive,
               lambda p, i, k, a, k1, b: score_shard_wand(p, i, k, a, k1, b)):
        got = fn(pdf, {"t": 2.0}, 12, AVGDL, K1, B)
        assert got["doc_id"].tolist() == list(range(200, 210)) + [210, 211]


def test_batch_multiquery_factorized_lut(tied_pdf):
    """Queries hitting disjoint/absent terms route through the factorized
    idf LUT: absent-term query returns nothing, present-term query scores."""
    extra = pd.DataFrame(_blocks("u", np.arange(500, 510, dtype=np.int64),
                                 np.full(10, 1, dtype=np.int64),
                                 np.full(10, 10, dtype=np.int64)))
    pdf = pd.concat([tied_pdf, extra], ignore_index=True)
    got = score_shard_batch(
        pdf, {1: {"t": 1.0}, 2: {"u": 2.0}, 3: {"zzz": 9.9}, 4: {"t": 1.0, "u": 2.0}},
        3, AVGDL, K1, B)
    by_q = {q: g["doc_id"].tolist() for q, g in got.groupby("query_id")}
    assert by_q[1] == [100, 101, 102]
    assert by_q[2] == [500, 501, 502]
    assert 3 not in by_q
    # q4: docs with both terms don't exist; 'u' idf=2.0 with tf=1 vs 't'
    # idf=1.0 tf=3 — verify against a brute-force recomputation
    t_score = 1.0 * float(_tfn(np.array([3]), np.array([10]), AVGDL, K1, B)[0])
    u_score = 2.0 * float(_tfn(np.array([1]), np.array([10]), AVGDL, K1, B)[0])
    expect = [100, 101, 102] if t_score >= u_score else [500, 501, 502]
    assert by_q[4] == expect
