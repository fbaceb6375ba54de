"""Product quantization (PQ) for embedding search — the FAISS-style
compressed-vector layout (Jégou-Douze-Schmid, "Product quantization
for nearest neighbor search", PAMI 2011 — public algorithm family) in
DataFrame ops: split each d-dim vector into m subvectors, k-means each
subspace into k_sub codewords, store each vector as m SMALL INTEGER
codes (m bytes at k_sub=256 — a 32× compression of a float64 d=64
embedding), and answer queries by ADC (asymmetric distance
computation): one tiny query-vs-codebook distance table, then each
candidate's distance is m table lookups summed.

Complements the vector family: ``similarity.py`` (LSH) and ``ivf.py``
(coarse quantizer) prune CANDIDATES; PQ compresses the VECTORS — at
the 10^12-doc design point the embedding column is the storage/
bandwidth axis, and IVF-PQ (compose ``ivf_index`` for pruning with
these codes for scoring) is the standard production layout.

Scale design:
- **train** = m independent ``kmeans_fit`` runs over sliced subvectors
  (m is config — 4..16; each run is the ivf module's driver-synced
  Lloyd's with k_sub×(d/m) doubles of driver state).
- **encode** = one broadcast-join argmin per row over (sub, cluster)
  — the codebook is k_sub·m rows, kilobytes.
- **search** = the ADC table (n_queries × m × k_sub partial distances
  — bounded, broadcast) joined to the exploded codes on (sub, code);
  per-candidate distance folds over the SUB-SORTED partials (a
  deterministic array fold, not an order-undefined float SUM), then
  the deterministic (distance, vec_id) top-k window per query.

Gate trick (the ivf_ann precedent): with ``k_sub ≥ n_vectors`` and
init = the k lowest ids, every distinct subvector becomes its own
codeword, the encoding is LOSSLESS, and the ADC distance equals the
exact squared L2 — so PQ top-k must equal brute-force top-k, which a
DuckDB oracle can compute without replaying k-means. The lossy
production configuration's recall is pytest-property-tested instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.vector.ivf import kmeans_fit

__all__ = ["pq_train", "pq_encode", "pq_search"]


def _sub_slices(vec_col: str, dim: int, m: int):
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    return [(s, F.slice(F.col(vec_col), s * dsub + 1, dsub)) for s in range(m)]


def pq_train(
    vectors: DataFrame,
    dim: int,
    m: int = 4,
    k_sub: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(sub, cluster, centroid) — one k_sub-codeword codebook per
    subspace, trained with the ivf module's deterministic Lloyd's."""
    out = None
    for s, sl in _sub_slices(vec_col, dim, m):
        sub_vecs = vectors.select(
            F.col(id_col).alias("vec_id"), sl.alias("embedding")
        )
        cb = kmeans_fit(sub_vecs, k=k_sub, iters=iters).select(
            F.lit(s).alias("sub"), "cluster", "centroid"
        )
        out = cb if out is None else out.unionByName(cb)
    return out


def _d2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, c: (x.cast("double") - c) * (x.cast("double") - c)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes array<int>) — nearest codeword per subspace
    (squared L2, ties → lowest cluster — the _assign convention)."""
    subs = None
    for s, sl in _sub_slices(vec_col, dim, m):
        part = vectors.select(
            F.col(id_col).alias("vec_id"),
            F.lit(s).alias("sub"),
            sl.alias("subvec"),
        )
        subs = part if subs is None else subs.unionByName(part)
    scored = subs.join(F.broadcast(codebooks), "sub").withColumn(
        "_d2", _d2(F.col("subvec"), F.col("centroid"))
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.col("_d2").asc(), F.col("cluster").asc()
    )
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("vec_id", "sub", "cluster")
    )
    return best.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cluster"))),
            lambda x: x["cluster"],
        ).alias("codes")
    )


def pq_search(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    topk: int = 10,
    id_col: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id) — ADC top-k per query over the coded
    corpus, rank 1-based by (quantized distance asc, vec_id asc)."""
    qsubs = None
    for s, sl in _sub_slices(vec_col, dim, m):
        part = queries.select(
            F.col(id_col).alias("query_id"),
            F.lit(s).alias("sub"),
            sl.alias("subvec"),
        )
        qsubs = part if qsubs is None else qsubs.unionByName(part)
    dtable = qsubs.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        F.col("cluster").alias("code"),
        _d2(F.col("subvec"), F.col("centroid")).alias("pd2"),
    )
    cand = (
        codes.select(
            "vec_id", F.posexplode("codes").alias("sub", "code")
        )
        .join(dtable.hint("shuffle_hash"), ["sub", "code"])
        .groupBy("query_id", "vec_id")
        .agg(
            # deterministic fold over the sub-sorted partials — never an
            # order-undefined float SUM
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "pd2"))),
                    lambda x: x["pd2"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_dist").asc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select("query_id", "rank", "vec_id")
    )
