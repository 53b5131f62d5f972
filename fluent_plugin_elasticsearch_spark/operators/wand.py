"""Shard-local BM25 scoring over compressed posting blocks: exhaustive
(vectorized numpy) and block-max WAND (document-at-a-time with block
skipping) — the ES-side scoring the reference invokes via `client.search`
(out_elasticsearch.rb:957, in_elasticsearch.rb:275), implemented natively.

Both run inside ``applyInPandas`` groups keyed by shard: the distributed
query plan is  postings.filter(term ∈ query) → per-shard local top-k →
global top-k merge. Work per shard is proportional to the query terms'
posting data only (doc lengths are inlined in the blocks, so no doc_stats
join at query time).

Tie-break everywhere: (score desc, doc_id asc) — rank-identical contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .codec import delta_decode, varint_decode

EPS = 1e-12  # conservative slack on float upper bounds (sum-order slop)


def _tfn(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float, b: float) -> np.ndarray:
    tff = tf.astype(np.float64)
    return (k1 + 1.0) * tff / (tff + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))


def score_shard_exhaustive(pdf: pd.DataFrame, idfs: dict[str, float], k: int,
                           avgdl: float, k1: float, b: float) -> pd.DataFrame:
    """Decode every block of the query terms in this shard, accumulate BM25
    fully vectorized (np.add.at over factorized doc ids), return local
    top-k. This is the throughput path (no per-doc Python)."""
    from .codec import segmented_cumsum

    if len(pdf) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    # one concatenated decode for all blocks of all query terms (sorted by
    # term so per-doc accumulation order is deterministic)
    pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
    n_per_blk = pdf["n_docs"].to_numpy().astype(np.int64)
    total = int(n_per_blk.sum())
    blk_starts = np.concatenate([[0], np.cumsum(n_per_blk)[:-1]])
    gaps = varint_decode(b"".join(pdf["docs_enc"]), total)
    ids = segmented_cumsum(gaps, blk_starts, n_per_blk).astype(np.int64)
    tfs = varint_decode(b"".join(pdf["tfs_enc"]), total)
    dls = varint_decode(b"".join(pdf["dls_enc"]), total)
    idf_per_blk = pdf["term"].map(idfs).to_numpy(dtype=np.float64)
    contrib = np.repeat(idf_per_blk, n_per_blk) * _tfn(tfs, dls, avgdl, k1, b)
    uniq, inv = np.unique(ids, return_inverse=True)
    scores = np.zeros(uniq.size, dtype=np.float64)
    np.add.at(scores, inv, contrib)
    cand_ids, cand_scores = _topk_ties(uniq, scores, k)
    order = np.lexsort((cand_ids, -cand_scores))[:k]
    return pd.DataFrame({"doc_id": cand_ids[order], "score": cand_scores[order]})


def _topk_ties(ids: np.ndarray, scores: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Candidate set for an exact (score desc, doc_id asc) top-k: argpartition
    for the k-th score threshold, then include EVERY doc at or above it —
    docs tied at the boundary must survive so the lexsort can pick the
    smallest doc_ids (dropping them returned larger ids and broke the
    rank-identity contract)."""
    if ids.size <= k:
        return ids, scores
    part = np.argpartition(-scores, k - 1)
    thresh = scores[part[:k]].min()
    mask = scores >= thresh
    return ids[mask], scores[mask]


def score_shard_batch(pdf: pd.DataFrame, query_terms: dict[int, dict[str, float]], k: int,
                      avgdl: float, k1: float, b: float) -> pd.DataFrame:
    """Batched multi-query exhaustive scoring for one shard: decode each
    query term's blocks once, score every query that uses the term, local
    top-k per query. This is the offline-query-set mode — one pass over the
    union of the queries' posting data serves the whole set."""
    from .codec import segmented_cumsum

    if len(pdf) == 0:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
    n_per_blk = pdf["n_docs"].to_numpy().astype(np.int64)
    total = int(n_per_blk.sum())
    blk_starts = np.concatenate([[0], np.cumsum(n_per_blk)[:-1]])
    gaps = varint_decode(b"".join(pdf["docs_enc"]), total)
    ids = segmented_cumsum(gaps, blk_starts, n_per_blk).astype(np.int64)
    tfs = varint_decode(b"".join(pdf["tfs_enc"]), total)
    dls = varint_decode(b"".join(pdf["dls_enc"]), total)
    tfn = _tfn(tfs, dls, avgdl, k1, b)
    # factorize terms ONCE per shard: per-query term selection and idf
    # lookup become integer LUT indexing (no np.isin string scans, no
    # np.vectorize per-element Python calls)
    blk_codes, uniq_terms = pd.factorize(pdf["term"])
    codes = np.repeat(blk_codes, n_per_blk)
    term_pos = {t: i for i, t in enumerate(uniq_terms)}

    out_q, out_d, out_s = [], [], []
    for qid in sorted(query_terms):
        idfs = query_terms[qid]
        lut = np.full(len(uniq_terms), np.nan, dtype=np.float64)
        hit = False
        for t, v in idfs.items():
            i = term_pos.get(t)
            if i is not None:
                lut[i] = v
                hit = True
        if not hit:
            continue
        idf_per_posting = lut[codes]
        mask = ~np.isnan(idf_per_posting)
        q_ids = ids[mask]
        q_contrib = tfn[mask] * idf_per_posting[mask]
        uniq, inv = np.unique(q_ids, return_inverse=True)
        scores = np.zeros(uniq.size, dtype=np.float64)
        np.add.at(scores, inv, q_contrib)
        cand_ids, cand_scores = _topk_ties(uniq, scores, k)
        order = np.lexsort((cand_ids, -cand_scores))[:k]
        out_q.append(np.full(order.size, qid, dtype=np.int64))
        out_d.append(cand_ids[order])
        out_s.append(cand_scores[order])
    if not out_q:
        return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                             "doc_id": pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    return pd.DataFrame(
        {"query_id": np.concatenate(out_q), "doc_id": np.concatenate(out_d),
         "score": np.concatenate(out_s)}
    )


class _Cursor:
    """Per-term posting cursor over compressed blocks (lazy block decode)."""

    __slots__ = ("term", "idf", "blocks", "last_docs", "bi", "pos", "ids", "tfs", "dls",
                 "ub", "avgdl", "k1", "b", "done")

    def __init__(self, term: str, idf: float, blocks: pd.DataFrame,
                 avgdl: float, k1: float, b: float):
        self.term, self.idf = term, idf
        self.blocks = blocks.sort_values("first_doc").reset_index(drop=True)
        self.last_docs = self.blocks["last_doc"].to_numpy(dtype=np.int64)
        self.avgdl, self.k1, self.b = avgdl, k1, b
        self.ub = idf * float(self.blocks["max_tfn"].max())  # global term UB
        self.bi = -1
        self.done = False
        self._load(0)

    def _load(self, bi: int) -> None:
        if bi >= len(self.blocks):
            self.done = True
            return
        if bi != self.bi:
            row = self.blocks.iloc[bi]
            n = int(row["n_docs"])
            self.ids = delta_decode(row["docs_enc"], n).astype(np.int64)
            self.tfs = varint_decode(row["tfs_enc"], n)
            self.dls = varint_decode(row["dls_enc"], n)
            self.bi = bi
        self.pos = 0

    @property
    def doc(self) -> int:
        return int(self.ids[self.pos])

    def block_ub(self) -> float:
        return self.idf * float(self.blocks["max_tfn"].iloc[self.bi])

    def block_last(self) -> int:
        return int(self.last_docs[self.bi])

    def score_current(self) -> float:
        tf = float(self.tfs[self.pos])
        dl = float(self.dls[self.pos])
        return self.idf * (self.k1 + 1.0) * tf / (
            tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        )

    def advance_to(self, target: int) -> None:
        """Move to first doc >= target."""
        if self.done:
            return
        if self.block_last() < target:
            nbi = int(np.searchsorted(self.last_docs, target))
            self._load(nbi)
            if self.done:
                return
        p = int(np.searchsorted(self.ids[self.pos:], target)) + self.pos
        if p >= self.ids.size:  # target beyond this block (only when block_last < target handled above)
            self._load(self.bi + 1)
        else:
            self.pos = p

    def next(self) -> None:
        self.pos += 1
        if self.pos >= self.ids.size:
            self._load(self.bi + 1)


def score_shard_wand(pdf: pd.DataFrame, idfs: dict[str, float], k: int,
                     avgdl: float, k1: float, b: float) -> pd.DataFrame:
    """Block-max WAND top-k for one shard. Scores are bit-compatible with
    the exhaustive path (same per-term formula; per-doc sum in sorted-term
    order)."""
    cursors = [
        _Cursor(term, idfs[term], sub, avgdl, k1, b)
        for term, sub in pdf.groupby("term", sort=True)
    ]
    heap: list[tuple[float, int]] = []  # (score, doc_id), kept sorted desc-score
    theta = -np.inf

    def push(score: float, doc: int) -> None:
        nonlocal theta
        if len(heap) < k:
            heap.append((score, doc))
            if len(heap) == k:
                heap.sort(key=lambda x: (-x[0], x[1]))
                theta = heap[-1][0]
        elif score > theta:
            heap[-1] = (score, doc)
            heap.sort(key=lambda x: (-x[0], x[1]))
            theta = heap[-1][0]

    while True:
        active = [c for c in cursors if not c.done]
        if not active:
            break
        active.sort(key=lambda c: c.doc)
        # pivot: first prefix whose summed global UBs can beat theta
        acc = 0.0
        pivot_i = -1
        for i, c in enumerate(active):
            acc += c.ub
            if acc > theta - EPS or len(heap) < k:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # no prefix can beat theta — done
        pivot_doc = active[pivot_i].doc

        if active[0].doc == pivot_doc:
            # sorted ascending + first == pivot ⇒ every cursor on pivot_doc
            # is aligned (their current blocks contain pivot_doc). Include
            # cursors beyond the pivot index that tie on the same doc.
            involved = [c for c in active if c.doc == pivot_doc]
            block_ub = sum(c.block_ub() for c in involved)
            if len(heap) == k and block_ub <= theta - EPS:
                # Block-max skip (BMW "NextShallow"): within the involved
                # cursors' current blocks no doc can beat theta on these
                # terms alone — but cap the jump at the next non-aligned
                # cursor's doc, where an additional term starts contributing.
                target = max(min(c.block_last() for c in involved) + 1, pivot_doc + 1)
                rest = [c.doc for c in active if c.doc > pivot_doc]
                if rest:
                    target = min(target, min(rest))
                for c in involved:
                    c.advance_to(target)
                continue
            # full score of pivot_doc (sorted-term order for determinism)
            contribs = {c.term: c.score_current() for c in involved}
            score = 0.0
            for t in sorted(contribs):
                score += contribs[t]
            push(score, pivot_doc)
            for c in involved:
                c.next()
        else:
            # advance the lagging cursor with the smallest doc to pivot_doc
            active[0].advance_to(pivot_doc)

    heap.sort(key=lambda x: (-x[0], x[1]))
    return pd.DataFrame(
        {"doc_id": np.array([d for _, d in heap], dtype=np.int64),
         "score": np.array([s for s, _ in heap], dtype=np.float64)}
    )
