"""Pure-Python text processing shared by the engine and the test oracle.

These functions are the *pinned reference implementations* (no external lib,
no version drift) for:

  * ``extract_text``  — HTML → text extraction. The per-row invariant from
    BASELINE.json input_hint ("byte-identical extracted text per url vs the
    reference") is enforced by having exactly ONE implementation, imported
    by both the Spark pandas-UDF wrapper (extraction.py) and the pytest
    oracle. Deterministic regex pipeline, no parser dependency.
  * ``tokenize_unicode`` — Unicode tokenizer (the ICU-style analysis chain
    the reference delegates to Elasticsearch's analyzer): lower-case,
    word-character runs, CJK ideographs/kana as single-char tokens.
  * ``tokenize_simple`` — ASCII-ish tokenizer used for oracle-matched
    queries: lower + split on ``[^a-z0-9]+``. Chosen because it is
    expressible identically in Spark SQL (``split``) and DuckDB
    (``regexp_split_to_array``), so the driver's SQL oracle can reproduce
    it exactly.
  * ``bm25_*`` — scalar BM25 (k1=1.2, b=0.75, Lucene/ES idf) used by the
    brute-force Python oracle in tests.

Reference parity notes: the reference plugin sends raw documents to ES
(`client.bulk`, out_elasticsearch.rb:1158) and ES performs analysis +
scoring; this module is our native stand-in for that analysis chain.
"""

from __future__ import annotations

import math
import re

# --- HTML extraction ------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_HEAD_RE = re.compile(r"(?is)<head\b[^>]*>.*?</head\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")

# Minimal entity set, applied after tag stripping; &amp; must be last so
# double-escaped sequences do not over-unescape.
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def extract_text(html: bytes | str) -> str:
    """Deterministic HTML → text: drop head/script/style/comments, strip
    tags (tag boundary ⇒ single space), unescape entities, collapse
    whitespace. Pinned: any change breaks the byte-identity invariant."""
    s = html.decode("utf-8", errors="replace") if isinstance(html, (bytes, bytearray)) else html
    s = _SCRIPT_STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _HEAD_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return _WS_RE.sub(" ", s).strip()


def escape_html(s: str) -> str:
    """Inverse-direction escaping used by the synthetic corpus generator."""
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


# --- Tokenization ---------------------------------------------------------

_CJK = "぀-ヿ㐀-䶿一-鿿"
# One CJK char per token (unigram, like ES's CJK analyzer fallback), else
# runs of word characters (unicode letters/digits/underscore excluded '_').
_TOKEN_RE = re.compile(rf"[{_CJK}]|[^\W_{_CJK}]+", re.UNICODE)

_SIMPLE_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def tokenize_unicode(text: str) -> list[str]:
    if not text:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokenize_simple(text: str) -> list[str]:
    if not text:
        return []
    return [t for t in _SIMPLE_SPLIT_RE.split(text.lower()) if t]


# --- BM25 (Lucene/Elasticsearch flavor) -----------------------------------

K1 = 1.2
B = 0.75


def bm25_idf(doc_freq: int, n_docs: int) -> float:
    """ES/Lucene BM25 idf: ln(1 + (N - df + 0.5)/(df + 0.5))."""
    return math.log(1.0 + (n_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def bm25_term_score(tf: int, doc_len: int, avgdl: float, idf: float,
                    k1: float = K1, b: float = B) -> float:
    return idf * (k1 + 1.0) * tf / (tf + k1 * (1.0 - b + b * doc_len / avgdl))


def bm25_topk_oracle(docs: dict[int, list[str]], query_terms: list[str], k: int,
                     k1: float = K1, b: float = B) -> list[tuple[int, float]]:
    """Brute-force reference scorer: docs = {doc_id: tokens}. Returns
    [(doc_id, score)] sorted by (score desc, doc_id asc), length ≤ k.
    Duplicate query terms are deduped (ES `match` semantics score each
    unique term once per its tf)."""
    n = len(docs)
    if n == 0:
        return []
    terms = sorted(set(query_terms))
    dls = {d: len(toks) for d, toks in docs.items()}
    avgdl = sum(dls.values()) / n
    scores: dict[int, float] = {}
    for term in terms:
        tfs = {d: toks.count(term) for d, toks in docs.items()}
        tfs = {d: tf for d, tf in tfs.items() if tf > 0}
        if not tfs:
            continue
        idf = bm25_idf(len(tfs), n)
        for d, tf in tfs.items():
            scores[d] = scores.get(d, 0.0) + bm25_term_score(tf, dls[d], avgdl, idf, k1, b)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]
