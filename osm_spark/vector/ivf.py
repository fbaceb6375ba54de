"""IVF (inverted-file) ANN: k-means coarse quantizer + cluster-probed
exact search — the classic FAISS-style IVF-Flat layout in DataFrame ops.

Complements the hyperplane-LSH path (`similarity.py`): LSH needs no
training and hashes queries independently; IVF adapts partitions to the
data distribution, giving better recall/candidate-count trade-offs on
clustered corpora (like real embedding spaces).

Scale design:
- **fit** is Lloyd's algorithm with a driver-synchronized centroid table
  per iteration (k×d doubles — kilobytes; the per-iteration assign +
  mean is fully distributed: broadcast-join argmin, then one shuffle
  keyed by (cluster, dim) with map-side partial means).
- **index** = one narrow pass assigning each vector its nearest centroid
  (broadcast argmin); at rest this is the table's partition/bucket key,
  so a search touches only nprobe partitions.
- **search** probes the nprobe nearest clusters per query: candidates
  come from an equi join on cluster id, exact cosine refines, top-k via
  the deterministic (score desc, id asc) window.

Determinism: centroid init picks the k lowest vec_ids; means and
assignments are pure arithmetic; ties in assignment break on cluster id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from osm_spark.vector.similarity import cosine


def _assign(vectors: DataFrame, centroids: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Nearest-centroid assignment (squared L2, ties → lowest cluster)."""
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = vectors.join(F.broadcast(centroids)).withColumn("_d2", d2)
    w = Window.partitionBy("vec_id").orderBy(F.col("_d2").asc(), F.col("cluster").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_d2", "centroid")
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd's k-means; returns (cluster int, centroid
    array<double>). Init = the k lowest-id vectors."""
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    init = (
        v.orderBy("vec_id")
        .limit(k)
        .select(
            (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("cluster"),
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("centroid"),
        )
    )
    centroids = init
    for _ in range(iters):
        assigned = _assign(v, centroids)
        dims = assigned.select(
            "cluster", F.posexplode(F.col("embedding")).alias("dim", "val")
        )
        means = (
            dims.groupBy("cluster", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("mean"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "mean"))),
                    lambda s: s["mean"],
                ).alias("centroid")
            )
        )
        # empty clusters keep their previous centroid
        centroids = (
            centroids.alias("prev")
            .join(means.alias("new"), "cluster", "left")
            .select(
                "cluster",
                F.coalesce(F.col("new.centroid"), F.col("prev.centroid")).alias(
                    "centroid"
                ),
            )
        )
        # driver sync: materialize so the next iteration's broadcast is
        # a literal table, not a growing lineage
        centroids = vectors.sparkSession.createDataFrame(
            centroids.collect(), "cluster int, centroid array<double>"
        )
    return centroids


def ivf_index(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, embedding) — the inverted file."""
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    return _assign(v, centroids).select("vec_id", "cluster", "embedding")


def ivf_search(
    queries: DataFrame,
    index: DataFrame,
    centroids: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe the nprobe nearest clusters per query,
    exact cosine inside. (query_id, vec_id, cos_sim, rank)."""
    q = queries.select(F.col(query_id).alias("query_id"), F.col(vec_col).alias("q_vec"))
    d2 = F.aggregate(
        F.zip_with(
            F.col("q_vec"),
            F.col("centroid"),
            lambda x, c: (x.cast("double") - c) * (x.cast("double") - c),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("_d2").asc(), F.col("cluster").asc())
    probes = (
        q.join(F.broadcast(centroids))
        .withColumn("_d2", d2)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "q_vec", "cluster")
    )
    scored = index.join(F.broadcast(probes), "cluster").select(
        "query_id",
        "vec_id",
        F.round(cosine(F.col("q_vec"), F.col("embedding")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )
