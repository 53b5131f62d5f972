"""Positional postings: the `with_positions=True` build path and the
phrase scorer over it — ES/Lucene PhraseQuery, natively (SURVEY.md Q5
extension; the reference delegates phrase matching to Elasticsearch).

Layout: each posting block gains one `pos_enc` binary — the block's token
positions, delta-encoded WITHIN each (term, doc) posting (first position
absolute), concatenated in posting order. The per-posting tf doubles as
the position count, so no extra length stream is needed. Everything is
segment-vectorized numpy (the repeat-gather trick reorders variable-length
position segments without a per-posting Python loop).

Phrase scoring (Lucene PhraseQuery): a doc matches when positions align
adjacently across all phrase terms; tf = number of alignments (phrase
frequency); idf = sum of constituent-term idfs; BM25 as usual. The
per-shard verifier works on integer keys ``doc_code * 2^32 + (pos - j)``
so the n-way adjacency intersection is n-1 sorted np.isin passes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import types as T

from .codec import (
    delta_gaps_segments,
    segmented_cumsum,
    varint_decode,
    varint_encode_segments,
)

PARTIAL_POS_SCHEMA = (
    "shard int, term string, term_bucket int, salt int, n_docs int, "
    "docs_enc binary, tfs_enc binary, dls_enc binary, pos_enc binary"
)
BLOCK_POS_SCHEMA = (
    "shard int, term string, block_id int, n_docs int, first_doc long, "
    "last_doc long, docs_enc binary, tfs_enc binary, dls_enc binary, "
    "max_tfn double, pos_enc binary"
)

# carrier: three parallel list columns instead of map<term, array<pos>> —
# numpy-constructible cells (no per-token python dict ops, no Arrow map
# conversion). Per doc: unique terms (factorize order), their tfs, and all
# positions concatenated in the same term order (ascending within a term).
_POS_SCHEMA = T.StructType(
    [
        T.StructField("terms", T.ArrayType(T.StringType())),
        T.StructField("tfs", T.ArrayType(T.IntegerType())),
        T.StructField("poss", T.ArrayType(T.IntegerType())),
        T.StructField("doc_len", T.IntegerType()),
    ]
)


def _pos_struct(series: pd.Series, tokenize) -> pd.DataFrame:
    """Batch-vectorized positional tokenization: one factorize + one lexsort
    across the whole Arrow batch (the per-token python dict version was 5x
    slower end-to-end at 600k docs)."""
    n = len(series)
    tok_lists = [tokenize(t) for t in series]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64, count=n)
    total = int(lens.sum())
    doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.int64)
    if total == 0:
        empty = [np.array([], dtype=object)] * n
        zeros = [np.array([], dtype=np.int32)] * n
        return pd.DataFrame({"terms": empty, "tfs": zeros, "poss": zeros,
                             "doc_len": lens.astype(np.int32)})
    flat = np.empty(total, dtype=object)
    flat[:] = [t for toks in tok_lists for t in toks]
    codes, vocab = pd.factorize(pd.Series(flat))
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lens)
    pos_in_doc = np.arange(total, dtype=np.int64) - np.repeat(doc_starts, lens)
    order = np.lexsort((pos_in_doc, codes, doc_idx))
    d_s, c_s, p_s = doc_idx[order], codes[order], pos_in_doc[order]
    # entry = (doc, term) run boundaries
    entry_starts = np.nonzero((np.diff(d_s, prepend=-1) != 0) | (np.diff(c_s, prepend=-1) != 0))[0]
    tf = np.diff(np.append(entry_starts, total)).astype(np.int32)
    vocab_arr = vocab.to_numpy() if hasattr(vocab, "to_numpy") else np.asarray(vocab)
    entry_terms = vocab_arr[c_s[entry_starts]]
    entry_docs = d_s[entry_starts]
    # per-doc slice boundaries in entry space and position space
    e_bounds = np.searchsorted(entry_docs, np.arange(n + 1))
    p_bounds = np.searchsorted(d_s, np.arange(n + 1))
    p32 = p_s.astype(np.int32)
    return pd.DataFrame(
        {
            "terms": [entry_terms[e_bounds[i]:e_bounds[i + 1]] for i in range(n)],
            "tfs": [tf[e_bounds[i]:e_bounds[i + 1]] for i in range(n)],
            "poss": [p32[p_bounds[i]:p_bounds[i + 1]] for i in range(n)],
            "doc_len": lens.astype(np.int32),
        }
    )


def make_pos_tokenizer_udf(tokenizer: str, from_html: bool = False):
    from pyspark.sql import functions as F

    from ..textproc import extract_text, tokenize_simple, tokenize_unicode

    fn = tokenize_unicode if tokenizer == "unicode" else tokenize_simple

    if from_html:
        # fused extract+tokenize: one Python crossing instead of two
        # chained ArrowEvalPython nodes (guide §4.1)
        @F.pandas_udf(_POS_SCHEMA)
        def tok(html: pd.Series) -> pd.DataFrame:
            return _pos_struct(html.map(extract_text), fn)
    else:
        @F.pandas_udf(_POS_SCHEMA)
        def tok(text: pd.Series) -> pd.DataFrame:
            return _pos_struct(text, fn)

    return tok


def _gather_segments(values: np.ndarray, seg_starts_src: np.ndarray,
                     seg_lens: np.ndarray) -> np.ndarray:
    """Reorder variable-length segments: emit values of segment k (source
    start seg_starts_src[k], length seg_lens[k]) consecutively, for k in
    the given order — fully vectorized (repeat + intra-offset gather)."""
    total = int(seg_lens.sum())
    if total == 0:
        return values[:0]
    out_starts = np.concatenate([[0], np.cumsum(seg_lens)[:-1]])
    intra = np.arange(total, dtype=np.int64) - np.repeat(out_starts, seg_lens)
    src_idx = np.repeat(seg_starts_src.astype(np.int64), seg_lens) + intra
    return values[src_idx]


def encode_partials_pos(pdf: pd.DataFrame) -> pd.DataFrame:
    """Phase-1 over one (shard, salt) group of doc rows (doc_id, doc_len,
    terms[], tfs[], poss[] — the parallel-list carrier) → one compressed
    sorted partial per term, positions included. All-numpy: the cells
    concatenate without touching per-token python objects."""
    from .index_build import _hash_bucket

    term_cells = list(pdf["terms"])
    counts = np.fromiter((len(c) for c in term_cells), dtype=np.int64, count=len(pdf))
    total = int(counts.sum())
    ids = np.repeat(pdf["doc_id"].to_numpy().astype(np.uint64), counts)
    dls = np.repeat(pdf["doc_len"].to_numpy().astype(np.uint64), counts)
    terms = (
        np.concatenate([np.asarray(c, dtype=object) for c in term_cells])
        if total else np.empty(0, dtype=object)
    )
    tf = (
        np.concatenate([np.asarray(c, dtype=np.int64) for c in pdf["tfs"]])
        if total else np.empty(0, np.int64)
    )
    pos_cells = [np.asarray(c, dtype=np.uint64) for c in pdf["poss"]]
    positions = np.concatenate(pos_cells) if pos_cells else np.empty(0, np.uint64)
    entry_pos_starts = np.concatenate([[0], np.cumsum(tf)[:-1]]).astype(np.int64)

    codes, uniq_terms = pd.factorize(pd.Series(terms))
    order = np.lexsort((ids, codes))
    codes_s, ids_s, dls_s, tf_s = codes[order], ids[order], dls[order], tf[order]
    pos_s = _gather_segments(positions, entry_pos_starts[order], tf_s)
    entry_starts_s = np.concatenate([[0], np.cumsum(tf_s)[:-1]]).astype(np.int64)

    term_starts = np.nonzero(np.diff(codes_s, prepend=-1))[0]
    n_docs = np.diff(np.append(term_starts, codes_s.size))
    uniq_arr = uniq_terms.to_numpy() if hasattr(uniq_terms, "to_numpy") else np.asarray(uniq_terms)
    terms_out = uniq_arr[codes_s[term_starts]]

    pos_gaps = delta_gaps_segments(pos_s, entry_starts_s)
    term_pos_starts = entry_starts_s[term_starts]

    from .codec import delta_encode_segments

    return pd.DataFrame(
        {
            "shard": np.full(term_starts.size, int(pdf["shard"].iloc[0]), dtype=np.int64),
            "term": terms_out,
            "term_bucket": _hash_bucket(terms_out),
            "salt": np.full(term_starts.size, int(pdf["salt"].iloc[0]), dtype=np.int64),
            "n_docs": n_docs,
            "docs_enc": delta_encode_segments(ids_s, term_starts),
            "tfs_enc": varint_encode_segments(tf_s.astype(np.uint64), term_starts),
            "dls_enc": varint_encode_segments(dls_s, term_starts),
            "pos_enc": varint_encode_segments(pos_gaps, term_pos_starts),
        }
    )


def make_merge_fn_pos(avgdl: float, k1: float, b: float, block_size: int):
    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        """Phase-2 over one (shard, term_bucket) group: merge salted
        positional partials, re-block, re-encode (positions re-segmented
        per block via the same repeat-gather)."""
        shard = int(pdf["shard"].iloc[0])
        n_per_row = pdf["n_docs"].to_numpy().astype(np.int64)
        total = int(n_per_row.sum())
        row_starts = np.concatenate([[0], np.cumsum(n_per_row)[:-1]])
        gaps = varint_decode(b"".join(pdf["docs_enc"]), total)
        ids = segmented_cumsum(gaps, row_starts, n_per_row)
        tfs = varint_decode(b"".join(pdf["tfs_enc"]), total)
        dls = varint_decode(b"".join(pdf["dls_enc"]), total)
        tf64 = tfs.astype(np.int64)
        total_pos = int(tf64.sum())
        pos_gaps = varint_decode(b"".join(pdf["pos_enc"]), total_pos)
        entry_pos_starts = np.concatenate([[0], np.cumsum(tf64)[:-1]]).astype(np.int64)
        positions = segmented_cumsum(pos_gaps, entry_pos_starts, tf64)

        codes, uniq_terms = pd.factorize(pdf["term"])
        term_idx = np.repeat(codes, n_per_row)
        order = np.lexsort((ids, term_idx))
        ids_s, tfs_s, dls_s, term_s = ids[order], tfs[order], dls[order], term_idx[order]
        tf_s64 = tfs_s.astype(np.int64)
        pos_s = _gather_segments(positions, entry_pos_starts[order], tf_s64)
        entry_starts_s = np.concatenate([[0], np.cumsum(tf_s64)[:-1]]).astype(np.int64)

        term_starts = np.nonzero(np.diff(term_s, prepend=-1))[0]
        term_lens = np.diff(np.append(term_starts, total))
        pos_in_term = np.arange(total) - np.repeat(term_starts, term_lens)
        block_starts = np.nonzero(pos_in_term % block_size == 0)[0]
        block_ends = np.append(block_starts[1:], total)

        tff = tfs_s.astype(np.float64)
        tfns = (k1 + 1.0) * tff / (tff + k1 * (1.0 - b + b * dls_s.astype(np.float64) / avgdl))

        pos_gaps_s = delta_gaps_segments(pos_s, entry_starts_s)
        block_pos_starts = entry_starts_s[block_starts]

        from .codec import delta_encode_segments

        terms_arr = uniq_terms.to_numpy() if hasattr(uniq_terms, "to_numpy") else np.asarray(uniq_terms)
        return pd.DataFrame(
            {
                "shard": np.full(block_starts.size, shard, dtype=np.int64),
                "term": terms_arr[term_s[block_starts]],
                "block_id": (pos_in_term[block_starts] // block_size).astype(np.int64),
                "n_docs": (block_ends - block_starts).astype(np.int64),
                "first_doc": ids_s[block_starts].astype(np.int64),
                "last_doc": ids_s[block_ends - 1].astype(np.int64),
                "docs_enc": delta_encode_segments(ids_s, block_starts),
                "tfs_enc": varint_encode_segments(tfs_s, block_starts),
                "dls_enc": varint_encode_segments(dls_s, block_starts),
                "max_tfn": np.maximum.reduceat(tfns, block_starts),
                "pos_enc": varint_encode_segments(pos_gaps_s, block_pos_starts),
            }
        )

    return merge


_POS_SHIFT = np.uint64(32)  # doc_code * 2^32 + position keys


def score_shard_phrase(pdf: pd.DataFrame, phrase_terms: list[str], idf_sum: float,
                       k: int, avgdl: float, k1: float, b: float,
                       last_terms: list[str] | None = None) -> pd.DataFrame:
    """Phrase scoring for one shard: decode the phrase terms' positional
    blocks, count exact adjacent alignments per doc (phrase frequency),
    BM25-score with tf=pf and the summed idf. Returns local top-k.

    ``last_terms``: optional term SET occupying one extra final slot —
    the dictionary expansion of a match_phrase_prefix last term (any of
    the set aligns). A position holds exactly one token, so set
    membership can't double-count an alignment."""
    from .wand import _topk_ties

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if len(pdf) == 0:
        return empty
    # phrase as slot matchers: exact slots are singleton lists, the
    # optional prefix slot is the expansion set
    slots: list[list[str]] = [[t] for t in phrase_terms]
    if last_terms is not None:
        slots.append(sorted(last_terms))
    pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
    n_per_blk = pdf["n_docs"].to_numpy().astype(np.int64)
    total = int(n_per_blk.sum())
    blk_starts = np.concatenate([[0], np.cumsum(n_per_blk)[:-1]])
    gaps = varint_decode(b"".join(pdf["docs_enc"]), total)
    ids = segmented_cumsum(gaps, blk_starts, n_per_blk).astype(np.int64)
    tfs = varint_decode(b"".join(pdf["tfs_enc"]), total).astype(np.int64)
    dls = varint_decode(b"".join(pdf["dls_enc"]), total).astype(np.int64)
    total_pos = int(tfs.sum())
    pos_gaps = varint_decode(b"".join(pdf["pos_enc"]), total_pos)
    entry_pos_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
    positions = segmented_cumsum(pos_gaps, entry_pos_starts, tfs).astype(np.int64)
    terms = np.repeat(pdf["term"].to_numpy(), n_per_blk)

    doc_codes, uniq_docs = pd.factorize(ids)

    # doc-level pre-intersection: a matching doc must satisfy EVERY slot
    # (>= 1 of the slot's terms), so intersect the (entry-level, much
    # smaller than positions) doc sets first — with one rare term this
    # collapses the position key-space before any expansion (the
    # conjunctive-query prefilter).
    cand = None
    for slot in {tuple(s) for s in slots}:
        mask = (terms == slot[0]) if len(slot) == 1 else np.isin(terms, slot)
        docs_t = np.unique(doc_codes[mask])
        cand = docs_t if cand is None else cand[np.isin(cand, docs_t)]
        if cand.size == 0:
            return empty
    entry_keep = np.isin(doc_codes, cand)
    pos_keep = np.repeat(entry_keep, tfs)
    positions = positions[pos_keep]
    per_pos_doc = np.repeat(doc_codes.astype(np.int64), tfs)[pos_keep]
    per_pos_term = np.repeat(terms, tfs)[pos_keep]

    def slot_mask(slot):
        return (per_pos_term == slot[0]) if len(slot) == 1 \
            else np.isin(per_pos_term, slot)

    # keys for slot j shifted left by j: alignment ⇔ same key as slot 0
    m0 = slot_mask(slots[0])
    target = (per_pos_doc[m0].astype(np.uint64) << _POS_SHIFT) | positions[m0].astype(np.uint64)
    for j, slot in enumerate(slots[1:], start=1):
        mj = slot_mask(slot)
        keys_j = (per_pos_doc[mj].astype(np.uint64) << _POS_SHIFT) | (
            positions[mj].astype(np.uint64) - np.uint64(j)
        )
        target = target[np.isin(target, keys_j)]
        if target.size == 0:
            return empty
    match_docs = (target >> _POS_SHIFT).astype(np.int64)
    pf_docs, pf = np.unique(match_docs, return_counts=True)

    # doc length lookup from any posting of the doc
    dl_by_code = np.zeros(len(uniq_docs), dtype=np.int64)
    dl_by_code[doc_codes] = dls  # last write wins; all equal per doc
    dl = dl_by_code[pf_docs].astype(np.float64)
    pff = pf.astype(np.float64)
    scores = idf_sum * (k1 + 1.0) * pff / (pff + k1 * (1.0 - b + b * dl / avgdl))
    uniq_arr = np.asarray(uniq_docs, dtype=np.int64)
    out_ids, out_scores = _topk_ties(uniq_arr[pf_docs], scores, k)
    order = np.lexsort((out_ids, -out_scores))[:k]
    return pd.DataFrame({"doc_id": out_ids[order], "score": out_scores[order]})


def score_shard_span_near(pdf: pd.DataFrame, first: str, second: str,
                          slop: int, idf_sum: float, k: int, avgdl: float,
                          k1: float, b: float) -> pd.DataFrame:
    """span_near (two clauses, in_order) scoring for one shard: decode
    the two terms' positional blocks; span frequency = count of `second`
    positions with >= 1 `first` position 1..slop+1 tokens BEFORE them —
    the exact relevance.span_near_df contract (each `second` counted at
    most once). BM25 with tf=sf and the summed idf; local top-k.

    The per-doc window test is TWO global np.searchsorted calls over
    composite (doc_code << 32 | position) keys — no per-doc loop: a
    `second` at p has a qualifying `first` iff the sorted first-keys
    contain an entry in [doc|max(p-slop-1, 0), doc|p-1]."""
    from .wand import _topk_ties

    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if len(pdf) == 0:
        return empty
    pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
    n_per_blk = pdf["n_docs"].to_numpy().astype(np.int64)
    total = int(n_per_blk.sum())
    blk_starts = np.concatenate([[0], np.cumsum(n_per_blk)[:-1]])
    gaps = varint_decode(b"".join(pdf["docs_enc"]), total)
    ids = segmented_cumsum(gaps, blk_starts, n_per_blk).astype(np.int64)
    tfs = varint_decode(b"".join(pdf["tfs_enc"]), total).astype(np.int64)
    dls = varint_decode(b"".join(pdf["dls_enc"]), total).astype(np.int64)
    total_pos = int(tfs.sum())
    pos_gaps = varint_decode(b"".join(pdf["pos_enc"]), total_pos)
    entry_pos_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
    positions = segmented_cumsum(pos_gaps, entry_pos_starts, tfs).astype(np.int64)
    terms = np.repeat(pdf["term"].to_numpy(), n_per_blk)

    doc_codes, uniq_docs = pd.factorize(ids)
    # both terms must appear in a matching doc — entry-level intersection
    cand = None
    for t in {first, second}:
        docs_t = np.unique(doc_codes[terms == t])
        cand = docs_t if cand is None else cand[np.isin(cand, docs_t)]
        if cand.size == 0:
            return empty
    entry_keep = np.isin(doc_codes, cand)
    pos_keep = np.repeat(entry_keep, tfs)
    positions = positions[pos_keep]
    per_pos_doc = np.repeat(doc_codes.astype(np.int64), tfs)[pos_keep]
    per_pos_term = np.repeat(terms, tfs)[pos_keep]

    m1 = per_pos_term == first
    keys1 = np.sort((per_pos_doc[m1].astype(np.uint64) << _POS_SHIFT)
                    | positions[m1].astype(np.uint64))
    m2 = per_pos_term == second
    d2 = per_pos_doc[m2].astype(np.uint64)
    p2 = positions[m2].astype(np.int64)
    lo = (d2 << _POS_SHIFT) | np.maximum(p2 - slop - 1, 0).astype(np.uint64)
    hi_ok = p2 >= 1  # a position with no possible predecessor never matches
    hi = (d2 << _POS_SHIFT) | np.maximum(p2 - 1, 0).astype(np.uint64)
    exists = (np.searchsorted(keys1, lo, side="left")
              < np.searchsorted(keys1, hi, side="right")) & hi_ok
    if not exists.any():
        return empty
    sf_docs, sf = np.unique(per_pos_doc[m2][exists], return_counts=True)

    dl_by_code = np.zeros(len(uniq_docs), dtype=np.int64)
    dl_by_code[doc_codes] = dls
    dl = dl_by_code[sf_docs].astype(np.float64)
    sff = sf.astype(np.float64)
    scores = idf_sum * (k1 + 1.0) * sff / (sff + k1 * (1.0 - b + b * dl / avgdl))
    uniq_arr = np.asarray(uniq_docs, dtype=np.int64)
    out_ids, out_scores = _topk_ties(uniq_arr[sf_docs], scores, k)
    order = np.lexsort((out_ids, -out_scores))[:k]
    return pd.DataFrame({"doc_id": out_ids[order], "score": out_scores[order]})


def _decode_shard(pdf: pd.DataFrame):
    """Shared decode for the positional span kernels: returns
    (ids, tfs, dls, positions, per-entry terms) with positions expanded
    per entry. Factorization is left to the caller."""
    pdf = pdf.sort_values(["term", "first_doc"], kind="stable")
    n_per_blk = pdf["n_docs"].to_numpy().astype(np.int64)
    total = int(n_per_blk.sum())
    blk_starts = np.concatenate([[0], np.cumsum(n_per_blk)[:-1]])
    gaps = varint_decode(b"".join(pdf["docs_enc"]), total)
    ids = segmented_cumsum(gaps, blk_starts, n_per_blk).astype(np.int64)
    tfs = varint_decode(b"".join(pdf["tfs_enc"]), total).astype(np.int64)
    dls = varint_decode(b"".join(pdf["dls_enc"]), total).astype(np.int64)
    total_pos = int(tfs.sum())
    pos_gaps = varint_decode(b"".join(pdf["pos_enc"]), total_pos)
    entry_pos_starts = np.concatenate([[0], np.cumsum(tfs)[:-1]]).astype(np.int64)
    positions = segmented_cumsum(pos_gaps, entry_pos_starts, tfs).astype(np.int64)
    terms = np.repeat(pdf["term"].to_numpy(), n_per_blk)
    return ids, tfs, dls, positions, terms


def _span_topk(doc_ids: np.ndarray, sf: np.ndarray, dl: np.ndarray,
               idf_sum: float, k: int, avgdl: float, k1: float,
               b: float) -> pd.DataFrame:
    """Shared tail: BM25 with tf = span frequency, local top-k."""
    from .wand import _topk_ties

    sff = sf.astype(np.float64)
    scores = idf_sum * (k1 + 1.0) * sff / (
        sff + k1 * (1.0 - b + b * dl.astype(np.float64) / avgdl))
    out_ids, out_scores = _topk_ties(doc_ids, scores, k)
    order = np.lexsort((out_ids, -out_scores))[:k]
    return pd.DataFrame({"doc_id": out_ids[order], "score": out_scores[order]})


def _empty_topk() -> pd.DataFrame:
    return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                         "score": pd.Series([], dtype="float64")})


def score_shard_span_first(pdf: pd.DataFrame, term: str, end: int,
                           idf_sum: float, k: int, avgdl: float,
                           k1: float, b: float) -> pd.DataFrame:
    """span_first for one shard: sf = the term's occurrences within the
    first `end` token positions (DF contract positions 1..end, 1-based;
    stored positions are 0-based, so pos <= end-1)."""
    if len(pdf) == 0:
        return _empty_topk()
    ids, tfs, dls, positions, _terms = _decode_shard(pdf)
    per_pos_doc = np.repeat(np.arange(len(ids), dtype=np.int64), tfs)
    keep = positions <= end - 1
    if not keep.any():
        return _empty_topk()
    e_idx, sf = np.unique(per_pos_doc[keep], return_counts=True)
    return _span_topk(ids[e_idx], sf, dls[e_idx], idf_sum, k, avgdl, k1, b)


def score_shard_span_not(pdf: pd.DataFrame, include: str, exclude: str,
                         pre: int, post: int, idf_sum: float, k: int,
                         avgdl: float, k1: float, b: float) -> pd.DataFrame:
    """span_not for one shard: sf = `include` positions p with NO
    `exclude` position q in [p-pre, p+post] (the span_not_df contract).
    The two-sided window test is two global searchsorted calls over
    composite (doc_code << 32 | position) keys — no per-doc loop. Docs
    holding `include` but not `exclude` match with their full tf."""
    if len(pdf) == 0:
        return _empty_topk()
    ids, tfs, dls, positions, terms = _decode_shard(pdf)
    doc_codes, uniq_docs = pd.factorize(ids)
    per_pos_doc = np.repeat(doc_codes.astype(np.int64), tfs)
    per_pos_term = np.repeat(terms, tfs)

    mi = per_pos_term == include
    if not mi.any():
        return _empty_topk()
    mx = per_pos_term == exclude
    keys_x = np.sort((per_pos_doc[mx].astype(np.uint64) << _POS_SHIFT)
                     | positions[mx].astype(np.uint64))
    di = per_pos_doc[mi].astype(np.uint64)
    pi = positions[mi].astype(np.int64)
    lo = (di << _POS_SHIFT) | np.maximum(pi - pre, 0).astype(np.uint64)
    hi = (di << _POS_SHIFT) | (pi + post).astype(np.uint64)
    # searchsorted(hi, 'right') counts keys <= hi — inclusive both ends
    rejected = (np.searchsorted(keys_x, lo, side="left")
                < np.searchsorted(keys_x, hi, side="right"))
    survive = ~rejected
    if not survive.any():
        return _empty_topk()
    codes_sf, sf = np.unique(per_pos_doc[mi][survive], return_counts=True)
    dl_by_code = np.zeros(len(uniq_docs), dtype=np.int64)
    dl_by_code[doc_codes] = dls
    uniq_arr = np.asarray(uniq_docs, dtype=np.int64)
    return _span_topk(uniq_arr[codes_sf], sf, dl_by_code[codes_sf],
                      idf_sum, k, avgdl, k1, b)


_POS_MASK = np.uint64(0xFFFFFFFF)


def score_shard_intervals(pdf: pd.DataFrame, terms: list[str], max_gaps: int,
                          ordered: bool, idf_sum: float, k: int,
                          avgdl: float, k1: float, b: float) -> pd.DataFrame:
    """ES intervals `match` rule for one shard (contract exactly
    relevance.intervals_match_df):

    ordered, n terms: span freq counts last-term anchor positions a that
    complete an increasing chain q0 < q1 < ... < a with
    (a - q0 + 1) - n <= max_gaps. A chain exists iff the GREEDY maximal
    chain (each level the largest predecessor < the level above —
    maximizes q0 by exchange) satisfies the bound, so the check is n-1
    vectorized searchsorted walks over per-term composite
    (doc_code << 32 | position) keys — no per-doc loop.

    unordered, 2 terms: anchors are the SECOND term's positions; a
    qualifying first-term occurrence a has |p - a| - 1 <= max_gaps and
    a != p — one two-sided searchsorted window count with a self-hit
    correction when the clause terms are equal."""
    if len(pdf) == 0:
        return _empty_topk()
    ids, tfs, dls, positions, per_entry_terms = _decode_shard(pdf)
    doc_codes, uniq_docs = pd.factorize(ids)
    # every clause term must occur in a matching doc
    cand = None
    for t in set(terms):
        docs_t = np.unique(doc_codes[per_entry_terms == t])
        cand = docs_t if cand is None else cand[np.isin(cand, docs_t)]
        if cand.size == 0:
            return _empty_topk()
    entry_keep = np.isin(doc_codes, cand)
    pos_keep = np.repeat(entry_keep, tfs)
    positions = positions[pos_keep]
    per_pos_doc = np.repeat(doc_codes.astype(np.int64), tfs)[pos_keep]
    per_pos_term = np.repeat(per_entry_terms, tfs)[pos_keep]

    def keys_of(t):
        m = per_pos_term == t
        return np.sort((per_pos_doc[m].astype(np.uint64) << _POS_SHIFT)
                       | positions[m].astype(np.uint64))

    mg = int(max_gaps)
    anchor_term = terms[-1] if ordered else terms[1]
    ma = per_pos_term == anchor_term
    a_doc = per_pos_doc[ma].astype(np.uint64)
    a_pos = positions[ma].astype(np.int64)

    if not ordered:
        k0 = keys_of(terms[0])
        if mg < 0:
            lo = a_doc << _POS_SHIFT
            hi = (a_doc << _POS_SHIFT) | _POS_MASK
        else:
            lo = (a_doc << _POS_SHIFT) | np.maximum(a_pos - mg - 1, 0).astype(np.uint64)
            hi = (a_doc << _POS_SHIFT) | (a_pos + mg + 1).astype(np.uint64)
        cnt = (np.searchsorted(k0, hi, side="right")
               - np.searchsorted(k0, lo, side="left"))
        if terms[0] == terms[1]:
            cnt = cnt - 1  # the anchor itself sits inside its own window
        alive = cnt > 0
    else:
        per_term_keys = {t: keys_of(t) for t in set(terms[:-1])}
        cur = (a_doc << _POS_SHIFT) | a_pos.astype(np.uint64)
        alive = np.ones(cur.size, dtype=bool)
        for i in range(len(terms) - 2, -1, -1):
            ki = per_term_keys[terms[i]]
            idx = np.searchsorted(ki, cur, side="left") - 1
            ok = idx >= 0
            idx_c = np.maximum(idx, 0)
            prev = ki[idx_c]
            ok &= (prev >> _POS_SHIFT) == (cur >> _POS_SHIFT)
            alive &= ok
            cur = np.where(ok, prev, cur)
        if mg >= 0:
            q0 = (cur & _POS_MASK).astype(np.int64)
            alive &= (a_pos - q0 + 1 - len(terms)) <= mg

    if not alive.any():
        return _empty_topk()
    codes_sf, sf = np.unique(per_pos_doc[ma][alive], return_counts=True)
    dl_by_code = np.zeros(len(uniq_docs), dtype=np.int64)
    dl_by_code[doc_codes] = dls
    uniq_arr = np.asarray(uniq_docs, dtype=np.int64)
    return _span_topk(uniq_arr[codes_sf], sf, dl_by_code[codes_sf],
                      idf_sum, k, avgdl, k1, b)


def score_shard_span_contain(pdf: pd.DataFrame, first: str, second: str,
                             little: str, slop: int, within: bool,
                             idf_sum: float, k: int, avgdl: float,
                             k1: float, b: float) -> pd.DataFrame:
    """span_containing / span_within for one shard (contract exactly
    relevance.span_containing_df / span_within_df). Big spans are the
    ordered pairs (a, b2): `first` at a, `second` at b2, 1 <= b2-a <=
    slop+1; little is a single term at q.

    containing (within=False): anchors are `second` positions b2; a b2
    qualifies iff its MINIMAL valid start amin has a little occurrence
    in [amin, b2] (the minimal start gives the widest window, so the
    exists-any-start test reduces to one searchsorted pair). sf = count
    of qualifying b2.

    within (within=True): anchors are little positions q; since a <= q
    <= b2 and b2 <= a+slop+1 force b2 in [q, q+slop+1], the test loops
    over the slop+2 candidate offsets — each a vectorized exact-match
    probe into the `second` keys plus a start-window existence probe
    with the a <= q cap. sf = count of qualifying q."""
    if len(pdf) == 0:
        return _empty_topk()
    ids, tfs, dls, positions, terms = _decode_shard(pdf)
    doc_codes, uniq_docs = pd.factorize(ids)
    per_pos_doc = np.repeat(doc_codes.astype(np.int64), tfs)
    per_pos_term = np.repeat(terms, tfs)

    def keys_of(t):
        m = per_pos_term == t
        return np.sort((per_pos_doc[m].astype(np.uint64) << _POS_SHIFT)
                       | positions[m].astype(np.uint64))

    keys1 = keys_of(first)
    if keys1.size == 0:
        return _empty_topk()

    def amin_ok(d: np.ndarray, b2: np.ndarray, a_cap: np.ndarray):
        """Per anchor: does a valid big start a in [b2-slop-1,
        min(a_cap, b2-1)] exist, and if so its minimal value."""
        lo = (d << _POS_SHIFT) | np.maximum(b2 - slop - 1, 0).astype(np.uint64)
        cap = np.minimum(a_cap, b2 - 1)
        hi = (d << _POS_SHIFT) | np.maximum(cap, 0).astype(np.uint64)
        i_lo = np.searchsorted(keys1, lo, side="left")
        ok = (b2 >= 1) & (cap >= 0) & (
            i_lo < np.searchsorted(keys1, hi, side="right"))
        amin = (keys1[np.minimum(i_lo, keys1.size - 1)]
                & _POS_MASK).astype(np.int64)
        return ok, amin

    if not within:
        ma = per_pos_term == second
        d = per_pos_doc[ma].astype(np.uint64)
        b2 = positions[ma].astype(np.int64)
        ok, amin = amin_ok(d, b2, b2 - 1)
        keysq = keys_of(little)
        lo_q = (d << _POS_SHIFT) | np.maximum(amin, 0).astype(np.uint64)
        hi_q = (d << _POS_SHIFT) | b2.astype(np.uint64)
        alive = ok & (np.searchsorted(keysq, lo_q, side="left")
                      < np.searchsorted(keysq, hi_q, side="right"))
        anchor_mask = ma
    else:
        keys2 = keys_of(second)
        ma = per_pos_term == little
        d = per_pos_doc[ma].astype(np.uint64)
        q = positions[ma].astype(np.int64)
        alive = np.zeros(q.size, dtype=bool)
        for off in range(0, slop + 2):
            b2 = q + off
            key2 = (d << _POS_SHIFT) | b2.astype(np.uint64)
            i2 = np.searchsorted(keys2, key2, side="left")
            hit = (i2 < keys2.size) & (keys2[np.minimum(i2, keys2.size - 1)]
                                       == key2)
            ok, _ = amin_ok(d, b2, q)
            alive |= hit & ok
        anchor_mask = ma

    if not alive.any():
        return _empty_topk()
    codes_sf, sf = np.unique(per_pos_doc[anchor_mask][alive],
                             return_counts=True)
    dl_by_code = np.zeros(len(uniq_docs), dtype=np.int64)
    dl_by_code[doc_codes] = dls
    uniq_arr = np.asarray(uniq_docs, dtype=np.int64)
    return _span_topk(uniq_arr[codes_sf], sf, dl_by_code[codes_sf],
                      idf_sum, k, avgdl, k1, b)
