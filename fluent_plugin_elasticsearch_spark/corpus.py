"""Deterministic synthetic Common-Crawl-style webtext corpus.

Materializes the BASELINE.json input_hint table shape exactly:

    (url:string, warc_ts:timestamp, html:binary, text:string, lang:string)

Seeded (default 42), pure numpy — same (seed, n_docs) always yields the
same bytes. Properties required by FIXTURES.md §1:

  * ``text`` is a Zipf-distributed token stream over a ~50k-term vocabulary
    PLUS stopword-scale head terms (posting-list skew → exercises salting)
    PLUS Unicode tokens (CJK, accented latin) for the Unicode tokenizer.
  * ``html`` wraps ``text`` in tags/entities/scripts/comments such that
    ``textproc.extract_text(html) == text`` byte-identically.
  * ``warc_ts`` spans > 3 UTC days (exercises date-partitioned index naming
    incl. day rollover — reference out_elasticsearch.rb:1004-1010).
  * ``url`` unique per row — the natural doc key (reference `id_key`).
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

from .textproc import escape_html, extract_text

# Head terms at stopword scale — these dominate posting-list size and force
# explicit skew handling in the index build.
STOPWORDS = (
    "the of and to a in is it you that he was for on are as with his they "
    "i at be this have from or one had by word but not what all were we when"
).split()

_UNICODE_TOKENS = ["café", "über", "naïve", "señor", "日", "本", "語", "中", "文", "の"]

LANGS = ["en", "de", "ja", "zh", "es"]


def _vocab(size: int = 50_000) -> np.ndarray:
    # Deterministic pronounceable-ish vocab: base-26 syllable composition.
    syll = np.array([c + v for c in "bcdfghjklmnpqrstvwz" for v in "aeiou"])
    n_s = len(syll)
    i = np.arange(size)
    return np.char.add(
        np.char.add(syll[i % n_s], syll[(i // n_s) % n_s]), syll[(i // (n_s * n_s)) % n_s]
    )


def generate_corpus(n_docs: int, seed: int = 42, avg_len: int = 120,
                    start_idx: int = 0) -> pd.DataFrame:
    """Build the webtext corpus as a pandas DataFrame (columns exactly per
    input_hint). Deterministic in (n_docs, seed, avg_len, start_idx);
    ``start_idx`` offsets urls/timestamps so chunked generation yields
    globally unique keys."""
    rng = np.random.default_rng(seed)
    vocab = _vocab()
    n_vocab = len(vocab)
    n_stop = len(STOPWORDS)
    stop_arr = np.array(STOPWORDS)
    uni_arr = np.array(_UNICODE_TOKENS)

    # Doc lengths: lognormal around avg_len, clipped.
    doc_lens = np.clip(
        rng.lognormal(mean=np.log(avg_len), sigma=0.6, size=n_docs).astype(np.int64), 8, 2000
    )
    total = int(doc_lens.sum())

    # Token stream: 35% stopwords (head skew), 60% Zipf body vocab, 5% unicode.
    kind = rng.random(total)
    toks = np.empty(total, dtype=object)
    stop_mask = kind < 0.35
    uni_mask = kind >= 0.95
    body_mask = ~stop_mask & ~uni_mask
    toks[stop_mask] = stop_arr[rng.integers(0, n_stop, int(stop_mask.sum()))]
    toks[uni_mask] = uni_arr[rng.integers(0, len(uni_arr), int(uni_mask.sum()))]
    # Zipf over vocab ranks (a=1.3), clipped to vocab size.
    zipf_ranks = np.minimum(rng.zipf(1.3, int(body_mask.sum())) - 1, n_vocab - 1)
    toks[body_mask] = vocab[zipf_ranks]

    bounds = np.concatenate([[0], np.cumsum(doc_lens)])
    texts = [" ".join(toks[bounds[i] : bounds[i + 1]]) for i in range(n_docs)]

    # Timestamps: spans ~5 UTC days, second-granularity, monotone-ish.
    t0 = _dt.datetime(2024, 5, 1, 0, 0, 0)
    offsets = np.sort(rng.integers(0, 5 * 86400, n_docs))
    warc_ts = pd.to_datetime(t0) + pd.to_timedelta(offsets, unit="s")

    urls = [
        f"https://host{i % 97:02d}.example/p/{i}"
        for i in range(start_idx, start_idx + n_docs)
    ]
    langs = np.array(LANGS)[rng.integers(0, len(LANGS), n_docs)]

    noise = rng.integers(0, 1_000_000, n_docs)  # deterministic per-doc html noise
    htmls = [
        _wrap_html(texts[i], urls[i], int(noise[i])).encode("utf-8") for i in range(n_docs)
    ]

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def _wrap_html(text: str, url: str, noise: int) -> str:
    """Wrap text in synthetic HTML; extract_text(result) must equal text
    byte-identically (asserted in tests). Tokens are single-space separated,
    so chunking at token boundaries and rejoining blocks with whitespace
    round-trips exactly."""
    words = text.split(" ")
    chunks = [" ".join(words[i : i + 13]) for i in range(0, len(words), 13)]
    parts = [
        "<!DOCTYPE html>",
        f'<html lang="x"><head><title>t{noise}</title>',
        f"<script>var a={noise};</script><style>.c{{color:#fff}}</style></head>",
        f'<body data-u="{noise}">',
        f"<!-- crawl {noise} -->",
    ]
    tags = ["p", "div", "span", "li", "td"]
    for j, chunk in enumerate(chunks):
        tag = tags[(noise + j) % len(tags)]
        parts.append(f'<{tag} class="s{j % 7}">{escape_html(chunk)}</{tag}>')
    parts.append("<script>var z=1;</script></body></html>")
    return "\n".join(parts)


def write_corpus_parquet(path: str, n_docs: int, seed: int = 42, avg_len: int = 120,
                         row_group_size: int = 4096) -> None:
    pdf = generate_corpus(n_docs, seed=seed, avg_len=avg_len)
    # µs timestamps: Spark's parquet reader rejects TIMESTAMP(NANOS).
    # Small row groups: a single-row-group file is UNSPLITTABLE — Spark
    # would scan the whole corpus in one task regardless of cluster size.
    pdf.to_parquet(path, index=False, coerce_timestamps="us",
                   allow_truncated_timestamps=True, row_group_size=row_group_size)


def write_corpus_spark(spark, out_dir: str, n_docs: int, seed: int = 42,
                       avg_len: int = 120, chunk: int = 50_000) -> None:
    """Cluster-parallel corpus materialization: one deterministic chunk per
    task (seed ⊕ chunk index), written as a multi-file parquet dataset.
    Used for multi-million-doc scaling corpora where driver-side pandas
    generation would take tens of minutes."""
    import pandas as _pd

    bounds = [(i, min(i + chunk, n_docs)) for i in range(0, n_docs, chunk)]
    bdf = spark.createDataFrame(_pd.DataFrame({"start": [b[0] for b in bounds],
                                               "end": [b[1] for b in bounds]}))

    def gen(batches):
        for pdf in batches:
            for start, end in zip(pdf["start"], pdf["end"]):
                out = generate_corpus(int(end - start), seed=seed + int(start),
                                      avg_len=avg_len, start_idx=int(start))
                yield out

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    (
        bdf.repartition(len(bounds))
        .mapInPandas(gen, schema)
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def _self_check(n: int = 50) -> None:
    pdf = generate_corpus(n)
    for _, row in pdf.iterrows():
        assert extract_text(row["html"]) == row["text"], row["url"]


if __name__ == "__main__":
    _self_check()
    print("corpus self-check OK")
