"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM codegen, SQL-oracle-reproducible):
the heuristics are deliberately simple and deterministic — the value at
100 TB is that each is a single projection over the scan with no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..extraction import simple_tokens_col
from .dedup import normalize_text_col

# small per-language stopword marker sets (n-gram heuristic, FIXTURES-style)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "por", "con"],
    "fr": ["le", "la", "et", "les", "des", "est", "un", "une", "dans", "que"],
}


def _marker_hits(tokens: Column, markers: list[str]) -> Column:
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens, lambda t: F.array_contains(arr, t)))


def _marker_count_col(text: Column, markers: list[str]) -> Column:
    """Count of tokens equal to any marker, WITHOUT materializing the token
    array: tokens are maximal [a-z0-9]+ runs of lower(text), so a marker
    occurrence is the marker string bounded by (?<![a-z0-9]) / (?![a-z0-9])
    lookarounds — zero-width, so adjacent hits ("the the") both count. One
    codegen'd regexp_count per language replaces the interpreted
    ArrayFilter+array_contains pass per token (guide §4.1: HOFs are
    CodegenFallback). Exactly equal to _marker_hits over simple_tokens_col
    because each match must span a whole token (both lookarounds) and
    markers are distinct literals."""
    pat = "(?<![a-z0-9])(" + "|".join(markers) + ")(?![a-z0-9])"
    return F.regexp_count(F.lower(text), F.lit(pat))


def lang_id_scores(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, predicted_lang, <lang>_hits...) — argmax of stopword-marker
    hit counts; 'und' (undetermined) when nothing matches. Deterministic
    tie-break: language name ascending. One projection over the scan, all
    whole-stage codegen (round-7: regexp_count replaced the per-token
    interpreted HOF filters — same integers, ~2x faster)."""
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        *[
            _marker_count_col(F.col(text_col), markers).alias(f"{lang}_hits")
            for lang, markers in LANG_MARKERS.items()
        ],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"{lang}_hits") for lang in langs])
    pred = F.when(best == 0, F.lit("und"))
    for lang in langs:  # ascending name order = deterministic tie-break
        pred = pred.when(F.col(f"{lang}_hits") == best, F.lit(lang))
    return out.withColumn("predicted_lang", pred)


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: char/token counts, mean token length,
    stopword ratio, alnum ratio, uppercase ratio — the standard cheap
    quality filters for web corpora."""
    # round-7: every feature is a codegen'd regexp_count over the raw text
    # — no token-array materialization, no interpreted HOF, no replaced-
    # string allocation. Each form is exactly equal to its predecessor:
    # token count == count of maximal [a-z0-9]+ runs; kept-char counts
    # == length(regexp_replace(...striped...)) by complementarity.
    c = F.col(text_col)
    n_tok = F.regexp_count(F.lower(c), F.lit("[a-z0-9]+"))
    n_stop = _marker_count_col(c, LANG_MARKERS["en"])
    n_chars = F.length(c)
    n_alnum = F.regexp_count(c, F.lit("[a-zA-Z0-9]"))
    n_upper = F.regexp_count(c, F.lit("[A-Z]"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        (n_chars / F.greatest(n_tok, F.lit(1))).alias("mean_tok_len"),
        (n_stop / F.greatest(n_tok, F.lit(1))).alias("stopword_ratio"),
        (n_alnum / F.greatest(n_chars, F.lit(1))).alias("alnum_ratio"),
        (n_upper / F.greatest(n_chars, F.lit(1))).alias("upper_ratio"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  min_tokens: int = 10, max_mean_tok_len: float = 12.0) -> DataFrame:
    """Composite 0-1 quality score + keep flag (the filter a pretraining
    pipeline applies before tokenization)."""
    feats = quality_features(docs, id_col, text_col)
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.3
        + F.col("alnum_ratio") * 0.3
    )
    return feats.select(
        "doc_id",
        "n_tokens",
        score.alias("quality"),
        (
            (F.col("n_tokens") >= min_tokens) & (F.col("mean_tok_len") <= max_mean_tok_len)
        ).alias("keep"),
    )


def token_counts(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish subword estimate (≈ chars/4 for long
    words — the usual quick corpus-size estimator)."""
    # round-7: codegen regexp_count forms (the old ArrayAggregate lambda was
    # interpreted per token). Exact equalities: word_tokens == number of
    # maximal [a-z0-9]+ runs; Σ ceil(len/4) == matches of the greedy
    # "[a-z0-9]{1,4}" chunking (ceil(len/4) chunks per run, and the old
    # len<=4 branch returned 1 == ceil(len/4) for len in 1..4).
    c = F.col(text_col)
    ws = F.size(F.split(F.trim(c), r"\s+"))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        ws.alias("ws_tokens"),
        F.regexp_count(F.lower(c), F.lit("[a-z0-9]+")).alias("word_tokens"),
        F.regexp_count(F.lower(c), F.lit("[a-z0-9]{1,4}")).cast("long").alias("bpe_est_tokens"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stable document fingerprints: full-text md5 over normalized text +
    a 64-bit prefix as bigint (cheap join/shuffle key)."""
    norm = normalize_text_col(F.col(text_col))
    fp = F.md5(norm)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        fp.alias("fingerprint"),
        F.conv(F.substring(fp, 1, 15), 16, 10).cast("long").alias("fp60"),
    )


def highlight_fragments(docs: DataFrame, query_terms: list[str], window: int = 5,
                        pre_tag: str = "<em>", post_tag: str = "</em>",
                        id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """ES-style highlighting as TOKEN-WINDOW fragments: the fragment is the
    ±`window` tokens around the FIRST query-term hit, with every query term
    inside the window wrapped in pre/post tags. Token-based (analyzer-
    consistent — 'data' never highlights inside 'database') and exactly
    mirrored by the DuckDB oracle via the same list ops. Docs with no hit
    are omitted (ES returns no highlight entry for them).

    Pure column expressions over one scan — no shuffle, no Python."""
    terms = sorted(set(query_terms))
    arr = F.array(*[F.lit(t) for t in terms])
    toks = simple_tokens_col(F.col(text_col))
    # guard sequence(1, 0) (descending!) for empty-token docs
    idx_seq = F.when(F.size(toks) >= 1, F.sequence(F.lit(1), F.size(toks))).otherwise(
        F.array().cast("array<int>")
    )
    hit_idxs = F.filter(idx_seq, lambda i: F.array_contains(arr, F.element_at(toks, i)))
    first = F.array_min(hit_idxs)
    start = F.greatest(first - window, F.lit(1))
    frag_toks = F.slice(toks, start, F.lit(2 * window + 1))
    marked = F.transform(
        frag_toks,
        lambda t: F.when(F.array_contains(arr, t),
                         F.concat(F.lit(pre_tag), t, F.lit(post_tag))).otherwise(t),
    )
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(hit_idxs).alias("n_hits"),
            first.alias("first_pos"),
            F.array_join(marked, " ").alias("fragment"),
        )
        .filter(F.col("n_hits") > 0)
    )


# --- PII scrubbing ----------------------------------------------------------

# Order matters: emails before phone-ish digit runs (an email's digits must
# not be half-redacted first). Patterns are deliberately conservative
# (training-data scrubbing favors recall on the common shapes over NER).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"(?:\+?\d{1,2}[ .-])?\(?\d{3}\)?[ .-]\d{3}[ .-]\d{4}\b", "<PHONE>"),
    ("card", r"\b(?:\d{4}[ -]){3}\d{4}\b", "<CARD>"),
]


def scrub_pii(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
              patterns: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """Training-data PII redaction: chained JVM regexp_replace (one
    projection, no shuffle, no Python) replacing emails / IPv4s / SSNs /
    phone numbers / card-shaped digit runs with typed placeholder tags,
    plus a per-pattern match count BEFORE redaction (the audit columns a
    compliance pass needs). At 100 TB this is a pure map over the scan.
    Returns (doc_id, text, n_<name>... , pii_total)."""
    pats = patterns or PII_PATTERNS
    out = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    counts = []
    for name, pat, _tag in pats:
        # count occurrences pre-redaction: size(split) - 1 on the ORIGINAL
        out = out.withColumn(
            f"n_{name}",
            (F.size(F.split(F.col("text"), pat, -1)) - 1).cast("int"))
        counts.append(F.col(f"n_{name}"))
    scrubbed = F.col("text")
    for name, pat, tag in pats:
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    return out.withColumn("text", scrubbed).withColumn("pii_total", total)


# --- repetition scoring (Gopher-style quality rules) ------------------------

def repetition_scores(docs: DataFrame, n: int = 3,
                      id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Gopher-style repetition features (Rae et al. 2021 §A1.1, public
    recipe): the fraction of n-grams that are duplicates and the fraction
    of tokens covered by the single most-frequent n-gram — the standard
    filters for repetitive/boilerplate web text.

    Plan: per-doc n-gram explode → ONE partial-aggregated groupBy on
    (doc_id, gram) → per-doc re-aggregate. Both shuffles are keyed by
    doc_id(+gram): no global state, scales like any word-count. Returns
    (doc_id, n_grams, dup_gram_frac_u, top_gram_frac_u) with fractions
    quantized floor(x*1e6) for cross-engine exactness."""
    toks = simple_tokens_col(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)) - 0),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(grams, lambda g: F.size(F.split(g, " ", -1)) >= n).alias("__grams"),
    ).filter(F.size("__grams") > 0)
    exploded = base.select("doc_id", F.explode("__grams").alias("gram"))
    per_gram = exploded.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_grams"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(0)).alias("__dup"),
            F.max("cnt").alias("__top"),
        )
        .select(
            "doc_id",
            F.col("n_grams").cast("long").alias("n_grams"),
            F.floor(F.col("__dup") / F.col("n_grams") * 1e6).cast("long")
            .alias("dup_gram_frac_u"),
            F.floor(F.col("__top") / F.col("n_grams") * 1e6).cast("long")
            .alias("top_gram_frac_u"),
        )
    )


def remove_repeated_lines(docs: DataFrame, min_docs: int = 2,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """RefinedWeb/CCNet-style line-level boilerplate removal (public
    recipes: Penedo et al. 2023; Wenzek et al. 2019): a line whose
    normalized form (lower+trim) appears in >= ``min_docs`` DISTINCT
    documents is boilerplate (nav bars, cookie banners, footers) and is
    dropped from every document. Blank lines are never counted as
    boilerplate.

    Plan: posexplode lines → line-hash df aggregate (ONE shuffle on the
    md5 key, partial-aggregated) → equi-join the flag back on the hash
    (never broadcast — the boilerplate set is corpus-sized at 100 TB) →
    per-doc reassembly via array_sort(collect_list(struct(pos, line)))
    keyed by doc_id. Every doc survives (empty text if all lines were
    boilerplate). Returns (doc_id, text, n_lines, n_removed)."""
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("h", F.md5(F.lower(F.trim(F.col("line")))))
    boiler = (
        lines.filter(F.trim("line") != "")
        .groupBy("h").agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= int(min_docs))
        .select("h", F.lit(True).alias("__b")))
    flagged = lines.join(boiler, "h", "left")
    kept_struct = F.when(F.col("__b").isNull(), F.struct("pos", "line"))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(kept_struct)),
                            lambda s: s.getField("line")), "\n").alias("text"),
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("__b"), 1).otherwise(0)).cast("long")
            .alias("n_removed"),
        )
        .select("doc_id", "text", F.col("n_lines").cast("long").alias("n_lines"),
                "n_removed")
    )


def remove_repeated_lines_sql(table: str, min_docs: int = 2,
                              id_col: str = "doc_id",
                              text_col: str = "text") -> str:
    """DuckDB mirror of remove_repeated_lines — same normalization, same
    distinct-doc threshold, same in-order reassembly."""
    return f"""
WITH ls AS (
  SELECT {id_col} AS doc_id, string_split({text_col}, chr(10)) AS lines
  FROM {table}
),
l AS (
  SELECT doc_id, unnest(generate_series(1, len(lines))) AS pos, lines
  FROM ls
),
ll AS (
  SELECT doc_id, pos, lines[pos] AS line,
         md5(lower(trim(lines[pos]))) AS h
  FROM l
),
boiler AS (
  SELECT h FROM ll WHERE trim(line) <> ''
  GROUP BY h HAVING count(DISTINCT doc_id) >= {int(min_docs)}
)
SELECT ll.doc_id,
       coalesce(string_agg(CASE WHEN b.h IS NULL THEN ll.line END,
                           chr(10) ORDER BY ll.pos), '') AS text,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed
FROM ll LEFT JOIN boiler b ON ll.h = b.h
GROUP BY ll.doc_id
"""


# --- light stemming (ES minimal_english-style plural stripping) -------------

def stem_token_col(t: Column) -> Column:
    """S-stemmer (Harman 1991 — the rule set behind ES's light plural
    stemmers): ies→y, (s|x|z|ch|sh)es→(s|x|z|ch|sh), trailing s dropped
    unless ss/us/is. Pure column CASE + regexp_replace — vectorized,
    mirrored verbatim in SQL by stem_sql_expr."""
    return (
        F.when(t.rlike(".{2,}ies$"), F.regexp_replace(t, "ies$", "y"))
        .when(t.rlike("(ss|us|is)$"), t)
        .when(t.rlike("(s|x|z|ch|sh)es$"), F.regexp_replace(t, "es$", ""))
        .when(t.rlike(".{2,}s$"), F.regexp_replace(t, "s$", ""))
        .otherwise(t)
    )


def stem_sql_expr(e: str) -> str:
    """DuckDB mirror of stem_token_col over expression `e`."""
    return (
        f"CASE WHEN regexp_matches({e}, '.{{2,}}ies$')"
        f" THEN regexp_replace({e}, 'ies$', 'y')"
        f" WHEN regexp_matches({e}, '(ss|us|is)$') THEN {e}"
        f" WHEN regexp_matches({e}, '(s|x|z|ch|sh)es$')"
        f" THEN regexp_replace({e}, 'es$', '')"
        f" WHEN regexp_matches({e}, '.{{2,}}s$')"
        f" THEN regexp_replace({e}, 's$', '')"
        f" ELSE {e} END"
    )


def stemmed_token_counts(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Per-doc counts of DISTINCT stemmed terms vs raw terms — the
    vocabulary-compression readout of the stemmer (and an oracle-gated
    exercise of stem_token_col over a corpus). One projection + sizes,
    no shuffle."""
    toks = simple_tokens_col(F.col(text_col))
    stemmed = F.transform(toks, stem_token_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.array_distinct(toks)).alias("n_raw_terms"),
        F.size(F.array_distinct(stemmed)).alias("n_stemmed_terms"),
    )


def unigram_logprob_scores(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean negative log-prob
    under the corpus's own unigram LM — the KenLM-style fluency filter of
    web-scale pipelines (high value = rare/garbled vocabulary), minus the
    external model the image doesn't ship.

    p(t) = count(t)/total_tokens over the WHOLE corpus; per-token surprisal
    is quantized to integer micro-nats (floor(-ln p · 1e6)) BEFORE the
    per-doc mean, so the cross-engine sums are exact integer sums — no
    float-association drift between Spark's partial aggregation and the
    oracle's sequential one. Plan: explode → term-count groupBy (shuffle
    on term) → join back (shuffle on term) → per-doc groupBy (shuffle on
    doc) — three key-partitioned passes, counts per shard, no driver
    funnel; the vocabulary frame is corpus-vocabulary-sized, never
    collected. Returns (doc_id, n_tokens, mean_nll_micro)."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       simple_tokens_col(F.col(text_col)).alias("tokens"))
    exploded = toks.select("doc_id", F.explode("tokens").alias("term"))
    counts = exploded.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    total = exploded.agg(F.count(F.lit(1)).alias("total"))
    surprisal = (
        exploded.join(counts, "term")
        .crossJoin(F.broadcast(total))
        .select("doc_id",
                F.floor(-F.log(F.col("tc") / F.col("total")) * 1e6)
                .cast("long").alias("nll_u")))
    return (surprisal.groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.floor(F.sum("nll_u") / F.count(F.lit(1))).cast("long")
                 .alias("mean_nll_micro")))


def unigram_logprob_sql(table: str, toks_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB mirror of unigram_logprob_scores. `toks_sql` is the shared
    tokenizer expression over the table's text column."""
    return f"""
WITH ex AS (SELECT {id_col} AS doc_id, unnest({toks_sql}) AS term FROM {table}),
counts AS (SELECT term, count(*) AS tc FROM ex GROUP BY term),
total AS (SELECT count(*) AS total FROM ex),
surp AS (
  SELECT e.doc_id,
         CAST(floor(-ln(c.tc * 1.0 / t.total) * 1e6) AS BIGINT) AS nll_u
  FROM ex e JOIN counts c USING (term) CROSS JOIN total t
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(floor(sum(nll_u) * 1.0 / count(*)) AS BIGINT) AS mean_nll_micro
FROM surp GROUP BY doc_id
"""


def bigram_logprob_scores(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Bigram-LM perplexity proxy: per-doc mean negative log-prob under
    the corpus's own bigram model — the next-order fluency filter above
    unigram_logprob_scores (catches shuffled-word salad that unigram
    statistics cannot: every word common, every TRANSITION rare).

    p(t_i | t_{i-1}) = c(t_{i-1}, t_i) / c_ctx(t_{i-1}) — pure MLE is
    well-defined because the corpus is scored under its OWN model, so
    every observed bigram has count >= 1. Each doc's first token is
    scored by the unigram p(t_1) (standard sentence-start handling).
    Same engine-exactness contract as the unigram scorer: per-token
    surprisal floor-quantized to integer micro-nats BEFORE the per-doc
    mean, so cross-engine sums are exact integer sums.

    Plan: one map-side bigram expansion, partial-aggregated groupBys on
    the bigram and context keys, equi-joins back (never broadcast — the
    bigram table is corpus-vocabulary²-bounded), one per-doc groupBy.
    All shuffles key-partitioned; nothing driver-side. Returns
    (doc_id, n_tokens, mean_nll_micro)."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       simple_tokens_col(F.col(text_col)).alias("tokens"))
    pair = F.when(
        F.size("tokens") >= 2,
        F.transform(F.sequence(F.lit(2), F.size("tokens")),
                    lambda i: F.struct(
                        F.element_at(F.col("tokens"), i - 1).alias("prev"),
                        F.element_at(F.col("tokens"), i).alias("cur")))
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    bi = (toks.select("doc_id", F.explode(pair).alias("bg"))
          .select("doc_id", F.col("bg.prev").alias("prev"),
                  F.col("bg.cur").alias("cur")))
    bc = bi.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("bc"))
    cc = bi.groupBy("prev").agg(F.count(F.lit(1)).alias("cc"))
    bigram_nll = (
        bi.join(bc, ["prev", "cur"]).join(cc, "prev")
        .select("doc_id",
                F.floor(-F.log(F.col("bc") / F.col("cc")) * 1e6)
                .cast("long").alias("nll_u")))
    exploded = toks.select("doc_id", F.explode("tokens").alias("term"))
    uc = exploded.groupBy("term").agg(F.count(F.lit(1)).alias("tc"))
    total = exploded.agg(F.count(F.lit(1)).alias("total"))
    first_nll = (
        toks.filter(F.size("tokens") >= 1)
        .select("doc_id", F.element_at(F.col("tokens"), 1).alias("term"))
        .join(uc, "term").crossJoin(F.broadcast(total))
        .select("doc_id",
                F.floor(-F.log(F.col("tc") / F.col("total")) * 1e6)
                .cast("long").alias("nll_u")))
    return (first_nll.unionByName(bigram_nll)
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_tokens"),
                 F.floor(F.sum("nll_u") / F.count(F.lit(1))).cast("long")
                 .alias("mean_nll_micro")))


def bigram_logprob_sql(table: str, toks_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB mirror of bigram_logprob_scores — same tokenizer, same
    MLE conditionals, same micro-nat quantization order."""
    return f"""
WITH tk AS (SELECT {id_col} AS doc_id, {toks_sql} AS tokens FROM {table}),
bi AS (
  SELECT doc_id, tokens[i - 1] AS prev, tokens[i] AS cur
  FROM (SELECT doc_id, tokens,
               unnest(generate_series(2, len(tokens))) AS i FROM tk)
),
bc AS (SELECT prev, cur, count(*) AS bc FROM bi GROUP BY prev, cur),
cc AS (SELECT prev, count(*) AS cc FROM bi GROUP BY prev),
ex AS (SELECT doc_id, unnest(tokens) AS term FROM tk),
uc AS (SELECT term, count(*) AS tc FROM ex GROUP BY term),
total AS (SELECT count(*) AS total FROM ex),
surp AS (
  SELECT b.doc_id,
         CAST(floor(-ln(bc.bc * 1.0 / cc.cc) * 1e6) AS BIGINT) AS nll_u
  FROM bi b JOIN bc ON b.prev = bc.prev AND b.cur = bc.cur
            JOIN cc ON b.prev = cc.prev
  UNION ALL
  SELECT f.doc_id,
         CAST(floor(-ln(u.tc * 1.0 / t.total) * 1e6) AS BIGINT) AS nll_u
  FROM (SELECT doc_id, tokens[1] AS term FROM tk WHERE len(tokens) >= 1) f
  JOIN uc u USING (term) CROSS JOIN total t
)
SELECT doc_id, count(*) AS n_tokens,
       CAST(floor(sum(nll_u) * 1.0 / count(*)) AS BIGINT) AS mean_nll_micro
FROM surp GROUP BY doc_id
"""


def remove_repeated_ngrams(docs: DataFrame, n: int = 50, min_count: int = 2,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """ExactSubstr-style repeated-span removal (public recipe: Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    any token n-gram occurring >= ``min_count`` times across the corpus
    (within-doc repeats included, like ExactSubstr) is a duplicated span;
    every token position covered by a duplicated window is dropped and
    the remaining tokens reassembled in order. The full suffix-array form
    finds spans of EXACTLY >= n tokens; the windowed form is its
    hash-join approximation — any duplicated span of length >= n is
    fully covered by duplicated n-windows, so recall at the n threshold
    is exact, and the window hash join is the 100 TB-shape (no global
    suffix sort).

    Plan: one map-side window expansion (explode of per-doc starts),
    ONE shuffle on the md5 window key (partial-aggregated count), an
    equi-join of duplicated keys back (never broadcast — the duplicate
    set is corpus-sized at scale), one covered-position groupBy keyed by
    doc_id, and a final index-lambda filter over the token array — no
    per-token reassembly shuffle. Output text is the normalized token
    stream (tokenizer spacing). Returns (doc_id, text, n_tokens,
    n_removed); docs shorter than n tokens pass through untouched."""
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       simple_tokens_col(F.col(text_col)).alias("tokens"))
    starts = F.when(
        F.size("tokens") >= n, F.sequence(F.lit(1), F.size("tokens") - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    sh = (toks.select("doc_id", "tokens", F.explode(starts).alias("s"))
          .select("doc_id", "s",
                  F.md5(F.concat_ws(" ", F.slice(F.col("tokens"), F.col("s"),
                                                 n))).alias("h")))
    dup = (sh.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
           .filter(F.col("c") >= int(min_count)).select("h"))
    cov = (sh.join(dup, "h", "left_semi")
           .select("doc_id", F.explode(F.sequence(F.col("s"),
                                                  F.col("s") + n - 1))
                   .alias("p"))
           .groupBy("doc_id").agg(F.collect_set("p").alias("cov")))
    out = toks.join(cov, "doc_id", "left")
    keep = F.filter(
        F.col("tokens"),
        lambda t, i: F.col("cov").isNull() | ~F.array_contains("cov", i + 1))
    return out.select(
        "doc_id",
        F.array_join(keep, " ").alias("text"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.coalesce(F.size("cov"), F.lit(0)).cast("long").alias("n_removed"))


def remove_repeated_ngrams_sql(table: str, n: int = 50, min_count: int = 2,
                               id_col: str = "doc_id",
                               text_col: str = "text") -> str:
    """DuckDB mirror of remove_repeated_ngrams — same tokenizer, same
    window hashing, same coverage semantics, same reassembly."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'),
                     t -> t <> '') AS tokens
  FROM {table}
),
sh AS (
  SELECT doc_id, s,
         md5(array_to_string(tokens[s:s + {n - 1}], ' ')) AS h
  FROM (SELECT doc_id, tokens,
               unnest(generate_series(1, greatest(len(tokens) - {n - 1}, 0)))
                 AS s
        FROM toks)
),
dup AS (SELECT h FROM sh GROUP BY h HAVING count(*) >= {int(min_count)}),
marked AS (SELECT doc_id, s FROM sh JOIN dup USING (h)),
covp AS (
  SELECT DISTINCT doc_id, unnest(generate_series(s, s + {n - 1})) AS p
  FROM marked
),
covl AS (SELECT doc_id, list(p) AS cov FROM covp GROUP BY doc_id)
SELECT t.doc_id,
       coalesce(array_to_string(list_filter(t.tokens,
         (x, i) -> c.cov IS NULL OR NOT list_contains(c.cov, i)), ' '), '')
         AS text,
       CAST(len(t.tokens) AS BIGINT) AS n_tokens,
       CAST(coalesce(len(c.cov), 0) AS BIGINT) AS n_removed
FROM toks t LEFT JOIN covl c USING (doc_id)
"""


def justext_blocks(docs: DataFrame, stopwords: list[str] | None = None,
                   len_low: int = 40, sw_high_u: int = 320_000,
                   sw_low_u: int = 170_000, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """jusText-style per-document boilerplate block classification
    (public recipe: Pomikálek 2011, the context-sensitive
    paragraph classifier behind CommonCrawl text extraction): split each
    doc into newline-delimited blocks, score each block by length and
    stopword density, classify, then resolve borderline blocks by their
    NEIGHBORS — navigation chrome is short/stopword-poor, prose is long/
    stopword-rich, and a borderline block sandwiched next to prose is
    prose.

    Engine-exact contract: density is floor-quantized to ×1e6 integer
    BEFORE any threshold compare, so classification is bit-identical to
    the DuckDB mirror. Simplified-but-pinned rules (cls0):
      good  if n_chars >= len_low and sw_u >= sw_high_u
      near  if n_chars >= len_low and sw_u >= sw_low_u
      bad   otherwise
    Context pass: near → good iff an adjacent block (same doc, block
    order) is good, else bad — one doc-keyed window (lag/lead), never a
    global window.

    Plan: one map-side posexplode of the per-doc block array, pure
    column expressions for the features, one keyed window. Returns
    (doc_id, block_idx, block_text, n_chars, sw_u, cls)."""
    from pyspark.sql import Window

    sws = stopwords if stopwords is not None else LANG_MARKERS["en"]
    arr = F.array(*[F.lit(s) for s in sws])
    blocks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n+"))
        .alias("block_idx", "block_text"))
    toks = simple_tokens_col(F.col("block_text"))
    total = F.size(toks)
    matched = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    feat = blocks.select(
        "doc_id", "block_idx", "block_text",
        F.length("block_text").alias("n_chars"),
        F.when(total > 0, F.floor(matched * F.lit(1_000_000) / total)
               .cast("long")).otherwise(F.lit(0)).alias("sw_u"))
    cls0 = (F.when((F.col("n_chars") >= len_low)
                   & (F.col("sw_u") >= sw_high_u), F.lit("good"))
            .when((F.col("n_chars") >= len_low)
                  & (F.col("sw_u") >= sw_low_u), F.lit("near"))
            .otherwise(F.lit("bad")))
    feat = feat.withColumn("cls0", cls0)
    w = Window.partitionBy("doc_id").orderBy("block_idx")
    near_good = (F.lag("cls0").over(w) == "good") | (
        F.lead("cls0").over(w) == "good")
    cls = (F.when(F.col("cls0") == "near",
                  F.when(F.coalesce(near_good, F.lit(False)),
                         F.lit("good")).otherwise(F.lit("bad")))
           .otherwise(F.col("cls0")))
    return (feat.withColumn("cls", cls).drop("cls0")
            .orderBy("doc_id", "block_idx"))


def justext_blocks_sql(table: str, stopwords: list[str] | None = None,
                       len_low: int = 40, sw_high_u: int = 320_000,
                       sw_low_u: int = 170_000, id_col: str = "doc_id",
                       text_col: str = "text") -> str:
    """DuckDB mirror of justext_blocks — same split, same quantized
    density, same neighbor resolution."""
    sws = stopwords if stopwords is not None else LANG_MARKERS["en"]
    lits = ", ".join("'" + s.replace("'", "''") + "'" for s in sws)
    toks = ("list_filter(regexp_split_to_array(lower(block_text), "
            "'[^a-z0-9]+'), t -> t <> '')")
    return f"""
WITH blocks AS (
  SELECT doc_id, i - 1 AS block_idx, arr[i] AS block_text
  FROM (SELECT {id_col} AS doc_id,
               regexp_split_to_array({text_col}, '\\n+') AS arr,
               unnest(generate_series(1,
                 len(regexp_split_to_array({text_col}, '\\n+')))) AS i
        FROM {table})
),
feat AS (
  SELECT doc_id, block_idx, block_text,
         length(block_text) AS n_chars,
         CASE WHEN len({toks}) > 0
              THEN CAST(floor(len(list_filter({toks},
                     t -> t IN ({lits}))) * 1000000.0 / len({toks}))
                   AS BIGINT)
              ELSE 0 END AS sw_u
  FROM blocks
),
c0 AS (
  SELECT *, CASE WHEN n_chars >= {len_low} AND sw_u >= {sw_high_u}
                 THEN 'good'
                 WHEN n_chars >= {len_low} AND sw_u >= {sw_low_u}
                 THEN 'near'
                 ELSE 'bad' END AS cls0
  FROM feat
),
ctx AS (
  SELECT *,
         lag(cls0) OVER (PARTITION BY doc_id ORDER BY block_idx) AS pc,
         lead(cls0) OVER (PARTITION BY doc_id ORDER BY block_idx) AS nc
  FROM c0
)
SELECT doc_id, block_idx, block_text, n_chars, sw_u,
       CASE WHEN cls0 = 'near'
            THEN CASE WHEN coalesce(pc = 'good' OR nc = 'good', FALSE)
                      THEN 'good' ELSE 'bad' END
            ELSE cls0 END AS cls
FROM ctx ORDER BY doc_id, block_idx
"""


# two-level public suffixes the registered-domain heuristic recognizes
# (the common ccTLD second-level registries; a full PSL is data, not code)
_TWO_LEVEL_SUFFIXES = ["ac.uk", "co.in", "co.jp", "co.kr", "co.uk",
                       "com.au", "com.br", "org.uk"]
_TRACKING_PARAM_RE = r"(utm_[a-z]+|fbclid|gclid)=[^&#]*&?"


def canonical_url_col(u: Column) -> Column:
    """URL canonicalization for dedup keys (the CCNet/web-pipeline
    recipe): lowercase scheme+host, strip default :80/:443 ports, drop
    the fragment, drop utm_*/fbclid/gclid tracking params, trim dangling
    ?/& and trailing slashes. Pure column expressions — a regexp chain
    in whole-stage codegen, one pass over the string, no UDF."""
    head = F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    rest = u.substr(F.length(head) + 1, F.length(u))
    head = F.regexp_replace(F.lower(head), r":(80|443)$", "")
    rest = F.regexp_replace(rest, r"#.*$", "")
    rest = F.regexp_replace(rest, _TRACKING_PARAM_RE, "")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    return F.regexp_replace(F.concat(head, rest), r"/+$", "")


def registered_domain_col(u: Column) -> Column:
    """Registered domain (the pay-level domain web pipelines group and
    rate-limit by): the host's last two labels, or last three when the
    two-label tail is a known second-level public suffix (co.uk form)."""
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))
    last2 = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    last3 = F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1)
    sfx = F.array(*[F.lit(s) for s in _TWO_LEVEL_SUFFIXES])
    return F.when(F.array_contains(sfx, last2)
                  & (last3 != F.lit("")), last3).otherwise(last2)


def url_normalize(docs: DataFrame, url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, canonical_url, domain) — the URL dedup/grouping keys."""
    u = F.col(url_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        canonical_url_col(u).alias("canonical_url"),
        registered_domain_col(u).alias("domain"))


def url_normalize_sql(table: str, url_expr: str = "url",
                      id_col: str = "doc_id") -> str:
    """DuckDB mirror of url_normalize — same regex chain ('g' flags:
    DuckDB replaces first-match by default, Spark replaces all)."""
    sfx = ", ".join(f"'{s}'" for s in _TWO_LEVEL_SUFFIXES)
    head = (f"regexp_extract({url_expr}, "
            "'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)")
    rest = f"substring({url_expr}, length({head}) + 1)"
    head_c = f"regexp_replace(lower({head}), ':(80|443)$', '')"
    rest_c = (f"regexp_replace(regexp_replace(regexp_replace({rest}, "
              f"'#.*$', '', 'g'), '{_TRACKING_PARAM_RE}', '', 'g'), "
              "'[?&]+$', '', 'g')")
    host = (f"lower(regexp_extract({url_expr}, "
            "'^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))")
    return f"""
SELECT {id_col} AS doc_id,
       regexp_replace({head_c} || {rest_c}, '/+$', '', 'g') AS canonical_url,
       CASE WHEN regexp_extract({host}, '([^.]+\\.[^.]+)$', 1)
                 IN ({sfx})
             AND regexp_extract({host}, '([^.]+\\.[^.]+\\.[^.]+)$', 1) <> ''
            THEN regexp_extract({host}, '([^.]+\\.[^.]+\\.[^.]+)$', 1)
            ELSE regexp_extract({host}, '([^.]+\\.[^.]+)$', 1) END AS domain
FROM {table}
"""


def dedup_doc_lines(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """WITHIN-document repeated-line removal — the per-doc half of the
    CCNet line dedup (remove_repeated_lines is the corpus-wide half):
    keep only the FIRST occurrence of each line inside a doc, in
    original order. Templated pages repeat their own chrome (cookie
    banners, share bars) several times per page; this strips the
    repeats without any cross-doc state. Pure column expressions —
    split, keep index i iff it is the line's first occurrence
    (array_position == i), reassemble — zero shuffle, zero explode.
    Returns (doc_id, text, n_lines, n_removed)."""
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines,
                    lambda x, i: F.array_position(lines, x) == i + 1)
    # materialize under temp names FIRST: aliasing the output column back
    # to `text` in the same select makes later expressions re-resolve
    # against the NEW column (Catalyst splits the projection), silently
    # deduping the already-deduped text
    staged = docs.select(F.col(id_col).alias("doc_id"),
                         lines.alias("__lines"), kept.alias("__kept"))
    return staged.select(
        "doc_id",
        F.array_join("__kept", "\n").alias("text"),
        F.size("__lines").alias("n_lines"),
        (F.size("__lines") - F.size("__kept")).alias("n_removed"))


def dedup_doc_lines_sql(table: str, id_col: str = "doc_id",
                        text_col: str = "text") -> str:
    """DuckDB mirror of dedup_doc_lines (list comprehension form)."""
    return f"""
WITH l AS (
  SELECT {id_col} AS doc_id,
         regexp_split_to_array({text_col}, '\\n') AS lines
  FROM {table}
),
k AS (
  SELECT doc_id, lines,
         [lines[i] FOR i IN generate_series(1, len(lines))
          IF list_position(lines, lines[i]) = i] AS kept
  FROM l
)
SELECT doc_id, array_to_string(kept, chr(10)) AS text,
       len(lines) AS n_lines, len(lines) - len(kept) AS n_removed
FROM k
"""
