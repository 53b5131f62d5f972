"""Query engine over a built index: BM25 top-k (`match`), ids query,
sorted/paged scans — the search surface the reference drives through
`client.search` (in_elasticsearch.rb:272-294, out_elasticsearch.rb:947-957).

Distributed plan for ``search``:
    term_stats lookup (≤ query-term rows, parquet min/max pruned)
  → postings.filter(term ∈ terms)            [scan limited to query terms]
  → groupBy(shard).applyInPandas(local top-k) [WAND or exhaustive numpy]
  → global orderBy(score desc, doc_id asc).limit(k)   [TakeOrderedAndProject]

Doc lengths ride inside the posting blocks, so query time touches no
doc-side table; the final (≤ k rows) result can be broadcast-joined back to
``docmap``/docs for materialization.
"""

from __future__ import annotations

import json
import math
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..textproc import bm25_idf, tokenize_simple, tokenize_unicode
from . import wand as _wand

_TOKENIZE = {"unicode": tokenize_unicode, "simple": tokenize_simple, "simple_udf": tokenize_simple}

TOPK_SCHEMA = "doc_id long, score double"

# Below this many postings (per shard, query terms only) the one-pass
# exhaustive decode beats the windowed MaxScore sweep: with nothing to
# skip, the sweep's per-window fixed cost is pure overhead. Both paths are
# rank-identical (property-tested), so the fallback is purely a latency
# decision.
WAND_FALLBACK_POSTINGS = 16384


def empty_topk_df(spark: SparkSession, schema: str) -> DataFrame:
    """Empty result frame from a pure-SQL plan (Range(0) + casts).
    ``spark.createDataFrame([], schema)`` builds an RDD-backed relation —
    measured ~0.1-1.3 s on first use per session (parallelize + schema
    conversion), and every search() constructed one eagerly even when
    unused. This form is a LeafNode with zero driver-side data work.
    Only simple "name type, ..." schemas (the TOPK shapes) are supported."""
    exprs = []
    for field in schema.split(","):
        name, typ = field.strip().split(None, 1)
        exprs.append(f"CAST(NULL AS {typ}) AS {name}")
    return spark.range(0).selectExpr(*exprs)


class InvertedIndex:
    def __init__(self, spark: SparkSession, path: str,
                 cache_term_stats: bool | str = False):
        """``cache_term_stats``: opt-in term→df cache — one parquet read at
        open time saves one Spark job per query.

        * ``True`` — plain driver dict. A Python str→int dict costs
          ~100-200 B/entry, so this holds to ~10^6–10^7 terms (hundreds of
          MB of driver heap); beyond that leave it off (per-query pruned
          lookup) or use "broadcast".
        * ``"broadcast"`` — the map lives in a Spark broadcast variable:
          one torrent-distributed, MEMORY_AND_DISK-backed copy in the block
          manager (spill-able, shared by every query and executor) instead
          of raw driver heap; same lookup API via ``.value``.
        * ``False`` (default) — per-query pruned term_stats lookup; the
          right mode for vocabularies that shouldn't live in one process."""
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "meta.json")) as f:
            self.meta = json.load(f)
        self._df_cache: dict[str, int] | None = None
        self._df_cache_bc = None
        if cache_term_stats:
            m = {r["term"]: int(r["df"]) for r in self.term_stats().collect()}
            if cache_term_stats == "broadcast":
                self._df_cache_bc = spark.sparkContext.broadcast(m)
            else:
                self._df_cache = m

    def _lookup_dfs(self, terms: list[str]) -> dict[str, int]:
        """term→df for the query terms, from whichever cache mode is on
        (falling back to a pruned parquet lookup)."""
        if self._df_cache is not None:
            return {t: self._df_cache[t] for t in terms if t in self._df_cache}
        if self._df_cache_bc is not None:
            m = self._df_cache_bc.value
            return {t: m[t] for t in terms if t in m}
        return {
            r["term"]: int(r["df"])
            for r in self.term_stats().filter(F.col("term").isin(terms)).collect()
        }

    # --- table accessors -------------------------------------------------
    def postings(self) -> DataFrame:
        if getattr(self, "_postings_cached", None) is not None:
            return self._postings_cached
        return self.spark.read.parquet(os.path.join(self.path, "postings"))

    def warm(self) -> "InvertedIndex":
        """Pin the postings table in executor memory (columnar, compressed)
        — the serving-mode analogue of ES's page-cache-resident segments.
        Cached pre-partitioned by shard so the per-query groupBy(shard)
        reuses the partitioning: a search becomes a single-stage job (no
        exchange), just filter → per-shard WAND → top-k.

        Also spins up the Python worker pool and JITs the per-shard kernel
        path by running one real head-term search (round-7): an ES node
        pays exactly this once at segment-load time, not per query —
        previously the FIRST timed search carried ~0.5-2.5 s of worker
        fork + Arrow codec import, which is what the old first-query p99
        measured. No results are retained — pure pool/codegen warm-up."""
        n = self.spark.sparkContext.defaultParallelism
        self._postings_cached = (
            self.spark.read.parquet(os.path.join(self.path, "postings"))
            .repartition(n, "shard")
            .persist()
        )
        self._postings_cached.count()
        head = None
        if self._df_cache:
            head = max(self._df_cache, key=self._df_cache.get)
        elif self._df_cache_bc is not None:
            m = self._df_cache_bc.value
            head = max(m, key=m.get) if m else None
        else:
            row = (self.term_stats().orderBy(F.desc("df")).limit(1).collect() or [None])[0]
            head = row["term"] if row is not None else None
        if head is not None:
            try:
                self.search(head, k=1, mode="exhaustive").collect()
            except Exception:  # warm-up must never fail an open
                pass
        return self

    def doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "doc_stats"))

    def term_stats(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "term_stats"))

    def docmap(self) -> DataFrame:
        # url mapping lives in the combined doc_stats table
        return self.doc_stats().select("doc_id", "url")

    def manifest(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "_manifest"))

    # --- full-text search --------------------------------------------------
    def query_terms(self, query_text: str) -> list[str]:
        return sorted(set(_TOKENIZE[self.meta["tokenizer"]](query_text)))

    def search(self, query_text: str, k: int = 10, mode: str = "wand",
               operator: str = "or", minimum_should_match: int = 1) -> DataFrame:
        """Top-k BM25. mode='wand' (block-max skipping), 'exhaustive'
        (vectorized decode-all), or 'auto' (WAND only when the shard's
        query-term posting mass exceeds WAND_FALLBACK_POSTINGS — the serving
        default). All rank-identical to brute force.

        ES match options: operator='and' requires ALL query terms;
        minimum_should_match=m requires >= m distinct terms. Either gate
        forces the exhaustive kernel (the gate must run before top-k;
        block-max skipping would rank unqualified docs), scoring stays
        the full BM25 sum over matched terms — ES semantics."""
        terms = self.query_terms(query_text)
        msm = len(terms) if operator == "and" else int(minimum_should_match)
        spark = self.spark
        empty = empty_topk_df(spark, TOPK_SCHEMA)
        if not terms:
            return empty
        dfs = self._lookup_dfs(terms)
        if not dfs:
            return empty
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        idfs = {t: bm25_idf(df, n_docs) for t, df in dfs.items()}

        def shard_topk(pdf: pd.DataFrame) -> pd.DataFrame:
            if msm > 1:
                return _wand.score_shard_exhaustive_msm(pdf, idfs, k, avgdl, k1, b, msm)
            use_wand = mode == "wand" or (
                mode == "auto" and int(pdf["n_docs"].sum()) >= WAND_FALLBACK_POSTINGS
            )
            if use_wand:
                return _wand.score_shard_wand(pdf, idfs, k, avgdl, k1, b)
            return _wand.score_shard_exhaustive(pdf, idfs, k, avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(list(dfs)))
        local = blocks.groupBy("shard").applyInPandas(shard_topk, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def match_scores(self, query_terms: list[str],
                     groups: list[list[str]] | None = None,
                     weights: dict[str, float] | None = None,
                     quantize: bool = False) -> DataFrame:
        """All-matched scoring (no top-k cut): every doc containing >= 1
        query term, with its full BM25 sum over the terms it contains.
        Work is bounded by the query terms' POSTING data — never a corpus
        scan — which is what makes the multi_match / combined_fields /
        query_string serving paths index-backed (ES serves every match
        kind from the inverted index; out_elasticsearch.rb:957).
        ``groups`` forwards the query_string OR-of-AND membership gate to
        the shard kernel. Returns (doc_id, score) float; callers quantize
        in Spark and cut the global top-k on the quantized value so the
        tie-break is identical to the DataFrame scorers."""
        terms = sorted(set(query_terms))
        if groups is not None and len(terms) > 64:
            # the shard kernel's membership gate is a per-doc uint64 term
            # bitmask — raise here (driver-side, eagerly) rather than
            # mid-job inside the kernel
            raise ValueError(
                f"query_string gate supports <= 64 distinct terms, got {len(terms)}")
        spark = self.spark
        empty = empty_topk_df(spark, TOPK_SCHEMA)
        if not terms:
            return empty
        dfs = self._lookup_dfs(terms)
        if not dfs:
            return empty
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        if weights is None:
            idfs = {t: bm25_idf(df, n_docs) for t, df in dfs.items()}
        else:  # weighted clauses (fuzzy expansion): idf x clause weight
            idfs = {t: bm25_idf(df, n_docs) * weights.get(t, 1.0)
                    for t, df in dfs.items()}

        def shard_all(pdf: pd.DataFrame) -> pd.DataFrame:
            return _wand.score_shard_matched(pdf, idfs, avgdl, k1, b, groups,
                                             quantize=quantize)

        blocks = self.postings().filter(F.col("term").isin(list(dfs)))
        return blocks.groupBy("shard").applyInPandas(shard_all, TOPK_SCHEMA)

    def sparse_vector_scores(self, query_vector: dict) -> DataFrame:
        """Index-backed sparse_vector serving: Σ_t round(w·1e3)·tf·1000
        per doc from tf postings — bit-identical to
        relevance.sparse_vector_df's BoW-tf form (same planner-side
        integer query units, same doc-side tf·1000), with work bounded
        by the query terms' posting data instead of a corpus scan.
        Returns (doc_id, score_u) for every doc with score_u > 0; the
        caller orders/limits (the engine-wide quantized tie-break)."""
        from .relevance import _sparse_query_units

        qus = dict(_sparse_query_units(query_vector))
        spark = self.spark
        empty = empty_topk_df(spark, "doc_id long, score_u long")
        dfs = self._lookup_dfs(list(qus))
        if not dfs:
            return empty
        units = {t: qus[t] for t in dfs}

        def shard_sparse(pdf: pd.DataFrame) -> pd.DataFrame:
            return _wand.score_shard_weighted_tf(pdf, units)

        blocks = self.postings().filter(F.col("term").isin(list(dfs)))
        return blocks.groupBy("shard").applyInPandas(
            shard_sparse, "doc_id long, score_u long")

    def expand_prefix(self, prefix: str, max_expansions: int = 1024) -> list[str]:
        """Dictionary expansion for a prefix clause: every index term
        starting with ``prefix``, from the term_stats table (a dictionary
        scan, never the corpus). More than ``max_expansions`` raises
        loudly (the repo's raise-rather-than-silently-wrong rule) —
        quietly truncating would change which docs match, unlike ES's
        bitset rewrite which is exhaustive."""
        rows = (self.term_stats()
                .filter(F.col("term").startswith(prefix))
                .select("term").limit(max_expansions + 1).collect())
        if len(rows) > max_expansions:
            raise ValueError(
                f"prefix '{prefix}' expands to > {max_expansions} index "
                f"terms; raise max_expansions or use a longer prefix")
        return sorted(r["term"] for r in rows)

    def fuzzy_expansions(self, term: str, fuzziness: int = 2,
                         max_expansions: int = 50) -> list[tuple[str, int]]:
        """Dictionary expansion for a fuzzy clause: index terms within
        ``fuzziness`` Levenshtein edits of ``term``, ranked ES-style
        (distance asc, df desc, term asc) and capped at
        ``max_expansions`` (the ES default cap is 50 — FuzzyQuery keeps
        the best-weight terms, this deterministic ranking is the
        engine-independent analogue). A length band prunes the
        dictionary scan before the levenshtein (same trick as
        suggest_term); work is dictionary-sized, never the corpus.
        Returns [(term, distance)], bounded driver-side collect."""
        t = F.lit(term)
        cand = self.term_stats().filter(
            (F.length("term") >= F.length(t) - fuzziness)
            & (F.length("term") <= F.length(t) + fuzziness))
        rows = (cand.withColumn("distance", F.levenshtein(F.col("term"), t))
                .filter(F.col("distance") <= fuzziness)
                .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
                .limit(max_expansions)
                .select("term", "distance").collect())
        return [(r["term"], r["distance"]) for r in rows]

    def matched_doc_ids(self, terms: list[str]) -> DataFrame:
        """(doc_id) of every doc containing >= 1 of ``terms`` — postings
        membership only (one row per doc: a doc lives in exactly one
        shard). The constant-score primitive behind prefix clauses."""
        return self.match_scores(terms).select("doc_id")

    def search_dismax(self, queries: list[str], tie_breaker: float = 0.0,
                      k: int = 10) -> DataFrame:
        """ES dis_max served FROM THE INDEX: one job decodes the union of
        the subqueries' posting blocks per shard, scores every subquery
        over the same doc-id domain, and combines with the exact Lucene
        max + tie_breaker * (sum - max) — no per-list over-fetch
        approximation (wand.score_shard_dismax). Returns (doc_id, score),
        tie (score desc, doc_id asc); the single-subquery case is
        rank-identical to search(mode='exhaustive')."""
        spark = self.spark
        per_q_terms = [self.query_terms(q) for q in queries]
        all_terms = sorted({t for ts in per_q_terms for t in ts})
        empty = empty_topk_df(spark, TOPK_SCHEMA)
        if not all_terms:
            return empty
        dfs = self._lookup_dfs(all_terms)
        if not dfs:
            return empty
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        subquery_idfs = [
            {t: bm25_idf(dfs[t], n_docs) for t in ts if t in dfs}
            for ts in per_q_terms
        ]
        subquery_idfs = [m for m in subquery_idfs if m]
        if not subquery_idfs:
            return empty

        def shard_dismax(pdf: pd.DataFrame) -> pd.DataFrame:
            return _wand.score_shard_dismax(pdf, subquery_idfs, tie_breaker,
                                            k, avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(list(dfs)))
        local = blocks.groupBy("shard").applyInPandas(shard_dismax, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def search_batch(self, queries: dict[int, str], k: int = 10) -> DataFrame:
        """Batched multi-query top-k (offline query sets): ONE job decodes
        the union of the queries' posting data per shard and scores every
        query — per-query cost amortizes to near-zero for large sets.
        Returns (query_id, doc_id, score, rank), rank-identical per query
        to `search()`."""
        spark = self.spark
        from pyspark.sql import Window

        per_query_terms = {qid: self.query_terms(q) for qid, q in queries.items()}
        all_terms = sorted({t for ts in per_query_terms.values() for t in ts})
        empty = empty_topk_df(spark, "query_id long, doc_id long, score double, rank int")
        if not all_terms:
            return empty
        dfs = self._lookup_dfs(all_terms)
        if not dfs:
            return empty
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        query_idfs = {
            qid: {t: bm25_idf(dfs[t], n_docs) for t in ts if t in dfs}
            for qid, ts in per_query_terms.items()
        }
        query_idfs = {qid: m for qid, m in query_idfs.items() if m}

        def shard_batch(pdf: pd.DataFrame) -> pd.DataFrame:
            return _wand.score_shard_batch(pdf, query_idfs, k, avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(list(dfs)))
        local = blocks.groupBy("shard").applyInPandas(
            shard_batch, "query_id long, doc_id long, score double"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            local.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank")
        )

    def match_phrase(self, phrase: str, k: int = 10) -> DataFrame:
        """ES match_phrase over a positional index (build_index with
        with_positions=True): per shard, decode the phrase terms'
        positional blocks, count exact adjacent alignments (phrase freq),
        BM25-score with tf=pf and idf = Σ constituent idfs (Lucene
        PhraseQuery semantics — same contract as bm25.match_phrase_df),
        then global top-k merge. Work per shard is the phrase terms'
        posting+position data only."""
        if not self.meta.get("with_positions"):
            raise ValueError("index was built without positions (with_positions=True)")
        from .positions import score_shard_phrase
        from ..textproc import bm25_idf

        terms = _TOKENIZE[self.meta["tokenizer"]](phrase)
        spark = self.spark
        empty = empty_topk_df(spark, TOPK_SCHEMA)
        if not terms:
            return empty
        uniq = sorted(set(terms))
        dfs = self._lookup_dfs(uniq)
        if len(dfs) < len(set(terms)):
            return empty  # a phrase term absent from the corpus ⇒ no match
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        # idf sum in PHRASE order (duplicates counted), matching match_phrase_df
        idf_sum = sum(bm25_idf(dfs[t], n_docs) for t in terms)

        def shard_phrase(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_phrase(pdf, terms, idf_sum, k, avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(uniq))
        local = blocks.groupBy("shard").applyInPandas(shard_phrase, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def match_phrase_prefix(self, phrase: str, k: int = 10,
                            max_expansions: int = 1024) -> DataFrame:
        """ES match_phrase_prefix served from the positional index: the
        last term expands through the term dictionary (expand_prefix) and
        occupies a SET slot in the same adjacency kernel match_phrase
        uses; the prefix clause's df is the distinct-doc count of the
        expansion's postings (exactly the DataFrame scorer's
        "any token startswith" df). Work per query = dictionary scan +
        the exact terms' and expansion's posting/position data — never
        the corpus (contract as relevance.match_phrase_prefix_df, which
        remains the no-index fallback)."""
        if not self.meta.get("with_positions"):
            raise ValueError("index was built without positions (with_positions=True)")
        from .positions import score_shard_phrase
        from ..textproc import bm25_idf

        terms = _TOKENIZE[self.meta["tokenizer"]](phrase)
        spark = self.spark
        empty = empty_topk_df(spark, TOPK_SCHEMA)
        if not terms:
            return empty
        exact, pref = terms[:-1], terms[-1]
        expansion = self.expand_prefix(pref, max_expansions)
        if not expansion:
            return empty
        uniq_exact = sorted(set(exact))
        dfs = self._lookup_dfs(uniq_exact)
        if len(dfs) < len(uniq_exact):
            return empty  # an exact term absent from the corpus ⇒ no match
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        # prefix-clause df = docs containing ANY expansion term (a small
        # postings-bounded count job), matching the DF scorer's df
        df_prefix = self.matched_doc_ids(expansion).count()
        if df_prefix == 0:
            return empty
        idf_sum = sum(bm25_idf(dfs[t], n_docs) for t in exact) \
            + bm25_idf(df_prefix, n_docs)

        def shard_phrase(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_phrase(pdf, exact, idf_sum, k, avgdl, k1, b,
                                      last_terms=expansion)

        wanted = sorted(set(exact) | set(expansion))
        blocks = self.postings().filter(F.col("term").isin(wanted))
        local = blocks.groupBy("shard").applyInPandas(shard_phrase, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def span_near(self, first: str, second: str, slop: int = 0,
                  k: int = 10) -> DataFrame:
        """ES span_near (two clauses, in_order=true) served from the
        positional index: span frequency = `second` positions with a
        `first` within slop+1 tokens before (exactly
        relevance.span_near_df, which stays the no-index fallback);
        BM25 with tf=sf and summed idfs. Work per shard is the two
        terms' posting+position data only — never the corpus."""
        if not self.meta.get("with_positions"):
            raise ValueError("index was built without positions (with_positions=True)")
        from .positions import score_shard_span_near
        from ..textproc import bm25_idf

        spark = self.spark
        empty = empty_topk_df(spark, TOPK_SCHEMA)
        dfs = self._lookup_dfs(sorted({first, second}))
        if len(dfs) < len({first, second}):
            return empty  # a clause term absent from the corpus ⇒ no span
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        # idf sum in CLAUSE order (first + second), matching span_near_df
        idf_sum = bm25_idf(dfs[first], n_docs) + bm25_idf(dfs[second], n_docs)

        def shard_span(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_span_near(pdf, first, second, int(slop),
                                         idf_sum, k, avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(sorted({first, second})))
        local = blocks.groupBy("shard").applyInPandas(shard_span, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def span_first(self, term: str, end: int, k: int = 10) -> DataFrame:
        """ES span_first served from the positional index: sf = the
        term's occurrences within the first `end` token positions
        (contract as relevance.span_first_df — 1-based 1..end window,
        0-based stored positions). Work = one term's posting/position
        data."""
        if not self.meta.get("with_positions"):
            raise ValueError("index was built without positions (with_positions=True)")
        from .positions import score_shard_span_first
        from ..textproc import bm25_idf

        empty = empty_topk_df(self.spark, TOPK_SCHEMA)
        dfs = self._lookup_dfs([term])
        if not dfs:
            return empty
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        idf = bm25_idf(dfs[term], n_docs)

        def shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_span_first(pdf, term, int(end), idf, k,
                                          avgdl, k1, b)

        blocks = self.postings().filter(F.col("term") == term)
        local = blocks.groupBy("shard").applyInPandas(shard, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def span_or(self, terms: list[str], k: int = 10) -> DataFrame:
        """ES span_or over single-term clauses served from the tf index:
        sf = total occurrences of ANY clause term, one saturation with
        the summed clause idfs (contract as relevance.span_or_df). No
        positions needed — postings only."""
        from ..textproc import bm25_idf
        from .wand import score_shard_span_or

        empty = empty_topk_df(self.spark, TOPK_SCHEMA)
        uniq = sorted(set(terms))
        dfs = self._lookup_dfs(uniq)
        if not dfs:
            return empty
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        # idf sum in CLAUSE order over every clause term (absent terms
        # contribute df=0 idf like the DF scorer's corpus pass)
        idf_sum = sum(bm25_idf(dfs.get(t, 0), n_docs) for t in terms)

        def shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_span_or(pdf, idf_sum, k, avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(list(dfs)))
        local = blocks.groupBy("shard").applyInPandas(shard, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def span_not(self, include: str, exclude: str, pre: int = 0,
                 post: int = 0, k: int = 10) -> DataFrame:
        """ES span_not served from the positional index: sf = `include`
        positions with no `exclude` position in [p-pre, p+post]
        (contract as relevance.span_not_df). Docs holding `include` but
        not `exclude` match with their full tf."""
        if not self.meta.get("with_positions"):
            raise ValueError("index was built without positions (with_positions=True)")
        from .positions import score_shard_span_not
        from ..textproc import bm25_idf

        empty = empty_topk_df(self.spark, TOPK_SCHEMA)
        dfs = self._lookup_dfs(sorted({include, exclude}))
        if include not in dfs:
            return empty
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        idf = bm25_idf(dfs[include], n_docs)

        def shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_span_not(pdf, include, exclude, int(pre),
                                        int(post), idf, k, avgdl, k1, b)

        blocks = self.postings().filter(
            F.col("term").isin(sorted({include, exclude})))
        local = blocks.groupBy("shard").applyInPandas(shard, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def span_multi(self, value: str, kind: str = "prefix",
                   max_expansions: int = 50, k: int = 10) -> DataFrame:
        """ES span_multi (prefix/wildcard inner query) served from the tf
        index: the pattern expands against the TERM DICTIONARY (LIKE
        pushdown on the sorted term_stats parquet, term-ascending, capped
        — same expansion as relevance.span_multi_df, whose contract this
        reproduces exactly: sf = Σ tf over expansion postings, one
        saturation with the integer-quantized summed expansion idfs). No
        positions needed; work per shard is the expansion terms'
        postings only."""
        import math as _m

        from ..textproc import bm25_idf
        from .relevance import _span_multi_like
        from .wand import score_shard_span_or

        like = _span_multi_like(value, kind)
        empty = empty_topk_df(self.spark, TOPK_SCHEMA)
        exp_rows = (self.term_stats().filter(F.col("term").like(like))
                    .orderBy(F.asc("term"))
                    .limit(int(max_expansions)).collect())
        if not exp_rows:
            return empty
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        idf_u = sum(_m.floor(bm25_idf(r["df"], n_docs) * 1e6)
                    for r in exp_rows)
        idf_sum = idf_u / 1e6
        terms = [r["term"] for r in exp_rows]

        def shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_span_or(pdf, idf_sum, k, avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(terms))
        local = blocks.groupBy("shard").applyInPandas(shard, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def span_containing(self, first: str, second: str, little: str,
                        slop: int = 0, k: int = 10,
                        within: bool = False) -> DataFrame:
        """ES span_containing / span_within (within=True) served from the
        positional index — contract exactly relevance.span_containing_df
        / span_within_df (the no-index fallbacks): big = ordered
        two-clause span_near (first..second, slop), little = one
        span_term. Work per shard is the three terms' posting/position
        data only; scoring idf is the big's summed clause idfs for
        containing, the little's idf for within (the Lucene source-span
        contract)."""
        if not self.meta.get("with_positions"):
            raise ValueError("index was built without positions (with_positions=True)")
        from .positions import score_shard_span_contain
        from ..textproc import bm25_idf

        empty = empty_topk_df(self.spark, TOPK_SCHEMA)
        wanted = sorted({first, second, little})
        dfs = self._lookup_dfs(wanted)
        if any(t not in dfs for t in (first, second, little)):
            return empty  # a clause term absent ⇒ no span anywhere
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        idf_sum = (bm25_idf(dfs[little], n_docs) if within
                   else bm25_idf(dfs[first], n_docs)
                   + bm25_idf(dfs[second], n_docs))

        def shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_span_contain(pdf, first, second, little,
                                            int(slop), within, idf_sum, k,
                                            avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(wanted))
        local = blocks.groupBy("shard").applyInPandas(shard, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def span_within(self, first: str, second: str, little: str,
                    slop: int = 0, k: int = 10) -> DataFrame:
        return self.span_containing(first, second, little, slop, k,
                                    within=True)

    def intervals_match(self, terms: list[str], max_gaps: int = -1,
                        ordered: bool = False, k: int = 10) -> DataFrame:
        """ES intervals `match` rule served from the positional index
        (contract as relevance.intervals_match_df, the no-index
        fallback): ordered n-term chains via a greedy searchsorted walk,
        unordered 2-term via a two-sided window count — work bounded by
        the clause terms' posting/position data. Same guards as the
        DataFrame scorer (>= 2 terms; unordered needs exactly 2)."""
        from ..plans.query_ast import UnsupportedQuery

        if len(terms) < 2:
            raise UnsupportedQuery("intervals match needs >= 2 terms")
        if not ordered and len(terms) > 2:
            raise UnsupportedQuery("unordered intervals support exactly 2 terms")
        if not self.meta.get("with_positions"):
            raise ValueError("index was built without positions (with_positions=True)")
        from .positions import score_shard_intervals
        from ..textproc import bm25_idf

        empty = empty_topk_df(self.spark, TOPK_SCHEMA)
        uniq = sorted(set(terms))
        dfs = self._lookup_dfs(uniq)
        if len(dfs) < len(uniq):
            return empty  # a clause term absent ⇒ no interval
        n_docs, avgdl = self.meta["n_docs"], self.meta["avgdl"]
        k1, b = self.meta["k1"], self.meta["b"]
        idf_sum = sum(bm25_idf(dfs[t], n_docs) for t in terms)

        def shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return score_shard_intervals(pdf, terms, int(max_gaps),
                                         bool(ordered), idf_sum, k,
                                         avgdl, k1, b)

        blocks = self.postings().filter(F.col("term").isin(uniq))
        local = blocks.groupBy("shard").applyInPandas(shard, TOPK_SCHEMA)
        return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)

    def suggest(self, prefix: str, k: int = 10) -> DataFrame:
        """Completion suggester: top-k index terms with the given prefix,
        ranked by document frequency (df desc, term asc). One scan of the
        tiny term_stats table with StringStartsWith pushed to parquet
        (term_stats is range-partitioned and sorted by term, so min/max
        stats prune most files)."""
        return (
            self.term_stats()
            .filter(F.col("term").startswith(prefix))
            .orderBy(F.desc("df"), F.asc("term"))
            .limit(k)
        )

    def suggest_term(self, term: str, max_edits: int = 2, size: int = 5) -> DataFrame:
        """ES term suggester (spelling correction): vocabulary terms
        within max_edits Levenshtein of the input, ranked ES-style
        (distance asc, df desc, term asc), the input term itself excluded.
        A length band |len(t) - len(term)| <= max_edits prunes the vocab
        scan BEFORE the levenshtein (sargable on the term_stats length;
        ES uses an n-gram candidate index for the same purpose — at
        larger vocabularies swap the band prefilter for a deletion-
        neighborhood join)."""
        t = F.lit(term)
        cand = self.term_stats().filter(
            (F.length("term") >= F.length(t) - max_edits)
            & (F.length("term") <= F.length(t) + max_edits)
            & (F.col("term") != t)
        )
        return (
            cand.withColumn("distance", F.levenshtein(F.col("term"), t))
            .filter(F.col("distance") <= max_edits)
            .orderBy(F.asc("distance"), F.desc("df"), F.asc("term"))
            .limit(size)
            .select("term", "distance", "df")
        )

    def search_with_urls(self, query_text: str, k: int = 10, mode: str = "wand") -> DataFrame:
        topk = self.search(query_text, k, mode)
        return (
            self.docmap()
            .join(F.broadcast(topk), "doc_id")
            .select("doc_id", "url", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )

    # --- ES-style structural queries (SURVEY.md §2.5) ----------------------
    def ids_query(self, ids: list[int]) -> DataFrame:
        """Q1: point lookup by doc ids — broadcast semi-join, shard-pruned."""
        ids_df = self.spark.createDataFrame([(int(i),) for i in ids], "doc_id long")
        return self.doc_stats().join(F.broadcast(ids_df), "doc_id", "left_semi")

    def scan_page(self, after_doc_id: int = -1, page_size: int = 1000) -> DataFrame:
        """Q7 scroll-style pagination: stable order + range predicate (the
        Spark/Iceberg analogue of a scroll cursor over a snapshot)."""
        return (
            self.doc_stats()
            .filter(F.col("doc_id") > after_doc_id)
            .orderBy("doc_id")
            .limit(page_size)
        )


def _quantized_topk(scores: DataFrame, k: int) -> DataFrame:
    """floor(score * 1e6) → global top-k on the QUANTIZED value with the
    (score_u desc, doc_id asc) tie-break — must happen after quantization
    or float-distinct-but-floor-equal docs tie-break differently than the
    DataFrame scorers."""
    return (
        scores.select("doc_id",
                      F.floor(F.col("score") * 1e6).cast("long").alias("score_u"))
        .orderBy(F.desc("score_u"), F.asc("doc_id"))
        .limit(k)
    )


def multi_match_topk(field_indexes: dict[str, "InvertedIndex"],
                     query_terms: list[str], k: int = 10,
                     match_type: str = "best_fields") -> DataFrame:
    """Index-backed ES `multi_match`: each field's OWN index serves
    all-matched scores from its query-term postings (no corpus scan);
    per-field quantized integers are combined exactly like
    bm25.multi_match_df — best_fields = greatest, most_fields = sum —
    then the global top-k is cut on the combined integer. Rank- and
    score-identical to the DataFrame scorer when each index was built
    over that field with the same tokenizer.

    Plan shape: one single-stage postings job per field (k fields), a
    full outer join of the (matched docs only) score tables on doc_id,
    TakeOrderedAndProject for the top-k."""
    if match_type not in ("best_fields", "most_fields"):
        raise ValueError(f"unsupported multi_match type: {match_type}")
    items = list(field_indexes.items())
    per = []
    for i, (_field, idx) in enumerate(items):
        s = idx.match_scores(query_terms)
        per.append(s.select(
            "doc_id", F.floor(F.col("score") * 1e6).cast("long").alias(f"s_{i}")))
    joined = per[0]
    for p in per[1:]:
        joined = joined.join(p, "doc_id", "full_outer")
    parts = [F.coalesce(F.col(f"s_{i}"), F.lit(0)) for i in range(len(items))]
    if match_type == "best_fields":
        comb = F.greatest(*parts) if len(parts) > 1 else parts[0]
    else:
        comb = parts[0]
        for p in parts[1:]:
            comb = comb + p
    return (
        joined.select("doc_id", comb.cast("long").alias("score_u"))
        .orderBy(F.desc("score_u"), F.asc("doc_id"))
        .limit(k)
    )


def more_like_this_topk(index: "InvertedIndex", docs: DataFrame,
                        like_id: int, max_query_terms: int = 10, k: int = 10,
                        id_col: str = "doc_id", text_col: str = "text",
                        min_term_len: int = 3) -> DataFrame:
    """Index-backed ES more_like_this (single liked doc): the seed row is
    a ONE-ROW filter on docs (predicate-pushed point lookup), its
    max_query_terms most interesting terms rank by the quantized
    floor(tf · idf · 1e6) with idf from the TERM DICTIONARY
    (term_stats), and scoring runs from the selected terms' postings
    (`match_scores`), excluding the seed — never a corpus scan.
    Contract, ranking tie-breaks (interest desc, term asc) and
    quantization identical to relevance.more_like_this_df, the no-index
    fallback."""
    from collections import Counter

    from ..textproc import bm25_idf

    spark = index.spark
    empty = empty_topk_df(spark, "doc_id long, score_u long")
    row = docs.filter(F.col(id_col) == like_id).select(text_col).collect()
    if not row or row[0][0] is None:
        return empty
    tokens = [t for t in _TOKENIZE[index.meta["tokenizer"]](row[0][0])
              if len(t) >= min_term_len]
    if not tokens:
        return empty
    tfc = Counter(tokens)
    dfs = index._lookup_dfs(sorted(tfc))
    n_docs = index.meta["n_docs"]
    ranked = sorted(
        (-math.floor(tf * bm25_idf(dfs[t], n_docs) * 1e6), t)
        for t, tf in tfc.items() if t in dfs
    )
    sel = [t for _, t in ranked[:max_query_terms]]
    if not sel:
        return empty
    scores = index.match_scores(sel).filter(F.col("doc_id") != like_id)
    return _quantized_topk(scores, k)


def auto_fuzziness(term: str) -> int:
    """ES "AUTO" fuzziness: 0 edits for terms under 3 chars, 1 for 3-5,
    2 above (the documented ES rule)."""
    n = len(term)
    return 0 if n < 3 else (1 if n <= 5 else 2)


def fuzzy_match_topk(index: "InvertedIndex", text: str,
                     fuzziness: int | str = "AUTO",
                     max_expansions: int = 50, k: int = 10) -> DataFrame:
    """Index-backed ES `match` with `fuzziness`: each query token expands
    through the TERM DICTIONARY within its edit budget
    (`fuzzy_expansions` — distance asc, df desc, term asc, capped), and
    each expanded term scores its BM25 contribution times the classic
    Lucene fuzzy weight 1 - distance/len(token), quantized to integer
    millionths BEFORE summing so the contract is order- and
    engine-exact:

      score_u(doc) = Σ_term floor( idf(term) · (w_u(term)/1e6)
                                   · tf_saturation(doc, term) · 1e6 )

    where w_u(term) = Σ over query tokens of floor((1 - d/len)·1e6),
    entries with w_u <= 0 dropped (a term as far as its own length
    carries no signal). Work per query = dictionary scan + the expanded
    terms' postings — never the corpus. Rank/score-identical to
    relevance.fuzzy_match_df, the no-index fallback."""
    terms = _TOKENIZE[index.meta["tokenizer"]](text)
    spark = index.spark
    uniq = sorted(set(terms))
    if not uniq:
        return empty_topk_df(spark, "doc_id long, score_u long")
    # ONE dictionary scan expands every query token (broadcast token
    # frame x term_stats under the length band) instead of a job per
    # token — the multi-token serving latency win; ranking/cap identical
    # to fuzzy_expansions
    q = spark.createDataFrame(
        [(t, auto_fuzziness(t) if fuzziness == "AUTO" else int(fuzziness))
         for t in uniq],
        "input_term string, fz int")
    from pyspark.sql import Window

    wq = Window.partitionBy("input_term").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term"))
    rows = (
        index.term_stats().crossJoin(F.broadcast(q))
        .filter((F.length("term") >= F.length("input_term") - F.col("fz"))
                & (F.length("term") <= F.length("input_term") + F.col("fz")))
        .withColumn("distance", F.levenshtein(F.col("term"), F.col("input_term")))
        .filter(F.col("distance") <= F.col("fz"))
        .withColumn("__rk", F.row_number().over(wq))
        .filter(F.col("__rk") <= int(max_expansions))
        .select("input_term", "term", "distance").collect())
    tw: dict[str, int] = {}
    for r in rows:
        w_u = math.floor((1.0 - r["distance"] / len(r["input_term"])) * 1e6)
        if w_u > 0:
            tw[r["term"]] = tw.get(r["term"], 0) + w_u
    if not tw:
        return empty_topk_df(spark, "doc_id long, score_u long")
    weights = {t: wu / 1e6 for t, wu in tw.items()}
    scores = index.match_scores(list(tw), weights=weights, quantize=True)
    return (
        scores.select("doc_id", F.col("score").cast("long").alias("score_u"))
        .orderBy(F.desc("score_u"), F.asc("doc_id"))
        .limit(k)
    )


def multi_match_phrase_topk(field_indexes: dict[str, "InvertedIndex"],
                            phrase: str, k: int = 10, prefix: bool = False,
                            max_expansions: int = 1024) -> DataFrame:
    """Index-backed ES `multi_match` with `type: "phrase"` /
    `"phrase_prefix"`: each field's POSITIONAL index serves its phrase
    top-k from the phrase terms' posting+position blocks (never the
    corpus), per-field quantized integers combine by MAX (phrase types
    imply best_fields / DisMax tie_breaker 0). Per-field top-k before a
    MAX combine is exact — see relevance.multi_match_phrase_df, whose
    ranks and scores this reproduces when each index was built over that
    field with the same tokenizer."""
    items = list(field_indexes.items())
    per = []
    for i, (_field, idx) in enumerate(items):
        s = (idx.match_phrase_prefix(phrase, k=k, max_expansions=max_expansions)
             if prefix else idx.match_phrase(phrase, k=k))
        per.append(s.select(
            "doc_id", F.floor(F.col("score") * 1e6).cast("long").alias(f"s_{i}")))
    joined = per[0]
    for p in per[1:]:
        joined = joined.join(p, "doc_id", "full_outer")
    parts = [F.coalesce(F.col(f"s_{i}"), F.lit(0)) for i in range(len(items))]
    comb = F.greatest(*parts) if len(parts) > 1 else parts[0]
    return (
        joined.select("doc_id", comb.cast("long").alias("score_u"))
        .orderBy(F.desc("score_u"), F.asc("doc_id"))
        .limit(k)
    )


def query_string_topk(index: "InvertedIndex", query: str, k: int = 10) -> DataFrame:
    """Index-backed ES `query_string`-lite: the OR-of-AND boolean
    structure gates membership inside the shard kernel (per-doc term
    bitmask over the query terms' postings), scoring stays the BM25 sum
    over every query term the doc contains — identical semantics and
    quantization to bm25.query_string_df, served from postings only."""
    from .bm25 import parse_query_string

    groups = parse_query_string(query)
    if not groups:
        raise ValueError("empty query_string")
    uniq = sorted({t for g in groups for t in g})
    return _quantized_topk(index.match_scores(uniq, groups=groups), k)


def combined_fields_topk(index: "InvertedIndex", query_terms: list[str],
                         k: int = 10) -> DataFrame:
    """Index-backed ES `combined_fields`: serve from an index built over
    the weighted field concatenation (index_build.build_combined_field_index)
    — the same exact reduction bm25.combined_fields_df uses, so scores
    match it bit-for-bit. Quantize-then-top-k like every serving path."""
    return _quantized_topk(index.match_scores(query_terms), k)


def match_bool_prefix_topk(index: "InvertedIndex", query_terms: list[str],
                           k: int = 10, max_expansions: int = 1024) -> DataFrame:
    """Index-backed ES `match_bool_prefix` (search-as-you-type): full
    terms are scored BM25 clauses served from their postings; the LAST
    term is a constant-score prefix clause — term-dictionary expansion
    (`expand_prefix`) then postings membership, worth a flat 1e6 on the
    quantized scale exactly like bm25.match_bool_prefix_df, so results
    are rank- and score-identical to the DataFrame scorer when the index
    shares the field's tokenizer. Work is dictionary scan + the matched
    terms' postings — never the corpus."""
    *full, pref = query_terms
    pside = (index.matched_doc_ids(index.expand_prefix(pref, max_expansions))
             .withColumn("p_u", F.lit(int(1e6))))
    if full:
        b_side = index.match_scores(full).select(
            "doc_id", F.floor(F.col("score") * 1e6).cast("long").alias("b_u"))
        combined = (b_side.join(pside, "doc_id", "full_outer")
                    .select("doc_id",
                            (F.coalesce(F.col("b_u"), F.lit(0))
                             + F.coalesce(F.col("p_u"), F.lit(0)))
                            .cast("long").alias("score_u")))
    else:
        combined = pside.select("doc_id", F.col("p_u").cast("long").alias("score_u"))
    return combined.orderBy(F.desc("score_u"), F.asc("doc_id")).limit(k)


def to_es_response(topk: DataFrame, index_name: str = "docs",
                   took_ms: int | None = None) -> dict:
    """Shape a top-k result into the ES search-response envelope the
    reference's downstream consumers parse (hits.total/max_score/hits[]
    with _index/_id/_score/_source). Collects — legitimate: a top-k result
    is driver-sized by construction (k rows), never the corpus."""
    rows = topk.collect()
    hits = []
    for r in rows:
        d = r.asDict()
        # pop sequentially — d.pop("a", d.pop("b", None)) evaluates the
        # default eagerly and would strip "b" from _source even when "a"
        # exists (a row carrying both score and cosine lost its cosine)
        score = d.pop("score", None)
        if score is None:
            score = d.pop("cosine", None)
        _id = d.pop("doc_id", None)
        if _id is None:
            _id = d.pop("vec_id", None)
        hits.append({
            "_index": index_name,
            "_id": str(_id),
            "_score": float(score) if score is not None else None,
            "_source": d,
        })
    scores = [h["_score"] for h in hits if h["_score"] is not None]
    return {
        "took": took_ms,
        "timed_out": False,
        "hits": {
            "total": {"value": len(hits), "relation": "eq"},
            "max_score": max(scores) if scores else None,
            "hits": hits,
        },
    }
