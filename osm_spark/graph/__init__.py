"""Web-graph operators: PageRank and connected components.

The Common-Crawl companion workloads: a link graph extracted from the
page corpus, ranked with PageRank, and near-duplicate candidate pairs
clustered into components so each cluster keeps one canonical document.
"""

from osm_spark.graph.components import connected_components, dedup_clusters
from osm_spark.graph.landmarks import landmark_distances
from osm_spark.graph.pagerank import out_degrees, pagerank, vertex_ids

__all__ = [
    "connected_components",
    "dedup_clusters",
    "out_degrees",
    "pagerank",
    "vertex_ids",
]
