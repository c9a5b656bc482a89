"""Similarity search over embedding columns (beyond-reference scope).

* brute-force cosine top-k: the baseline — one broadcast of the query
  vector(s), one scan, one top-k. At 100 TB this is scan-bound and
  embarrassingly parallel; Spark's TakeOrderedAndProject keeps only k
  rows per partition.
* batched knn join (query SET × corpus): broadcast the query side,
  per-row top-k via window row_number — queries must be the small side.
* IVF (inverted-file) index: corpus is k-means-partitioned into nlist
  cells (centroids fit on a driver sample — tiny); search probes the
  nprobe closest cells only, turning top-k into a partition-pruned
  scan. The cell assignment is a native argmin expression, and the
  cell id is a physical partition key when the index is persisted
  (``partitionBy("cell")``) — at 100 TB a query touches nprobe/nlist
  of the data.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clustering_spark.functions.vector import cosine_similarity
from clustering_spark.operators.clustering import kmeans_fit


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    query: list[float],
    id_col: str,
    k: int = 10,
) -> DataFrame:
    """Top-k rows by cosine similarity to one query vector."""
    q = F.array(*[F.lit(float(x)) for x in query])
    return (
        df.select(
            F.col(id_col),
            F.round(
                cosine_similarity(F.col(vec_col).cast("array<double>"), q), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    corpus_vec: str,
    corpus_id: str,
    query_vec: str,
    query_id: str,
    k: int = 5,
) -> DataFrame:
    """For every query row: its k nearest corpus rows by cosine.
    Queries are broadcast (must be the small side); ranking is a window
    per query id."""
    from pyspark.sql import Window

    c = corpus.select(
        F.col(corpus_id).alias("corpus_id"),
        F.col(corpus_vec).cast("array<double>").alias("c_vec"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).cast("array<double>").alias("q_vec"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "corpus_id",
        F.round(cosine_similarity("c_vec", "q_vec"), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("corpus_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "corpus_id", "cosine", "rank")
    )


class IVFIndex:
    """Inverted-file ANN index: nlist k-means cells over a sample,
    cell-pruned search.

    Centroids are fit driver-side on a bounded sample (numpy — the
    centroid table is nlist×dim, trivially broadcastable); the corpus
    gets a ``cell`` column via a native argmin-over-centroids
    expression. ``search`` probes the nprobe nearest cells.
    """

    def __init__(self, nlist: int = 16, seed: int = 42, sample_rows: int = 100_000):
        self.nlist = nlist
        self.seed = seed
        self.sample_rows = sample_rows
        self.centroids: np.ndarray | None = None

    def fit(self, corpus: DataFrame, vec_col: str) -> "IVFIndex":
        sample = (
            corpus.select(F.col(vec_col).cast("array<double>").alias("v"))
            .limit(self.sample_rows)
            .toPandas()["v"]
        )
        X = np.vstack(sample.to_numpy())
        # L2-normalize so euclidean cells approximate cosine cells
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        _, centers, _ = kmeans_fit(X, min(self.nlist, len(X)), self.seed)
        self.centroids = centers
        return self

    def _cell_expr(self, vec_col: str):
        """argmin over centroids of squared distance — native expr:
        build array of distances, array_position of the min."""
        v = F.col(vec_col).cast("array<double>")
        norm = F.sqrt(
            F.aggregate(
                F.transform(v, lambda x: x * x), F.lit(0.0), lambda a, x: a + x
            )
        )
        vn = F.transform(v, lambda x: x / norm)
        dists = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        vn,
                        F.array(*[F.lit(float(c)) for c in ctr]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                for ctr in self.centroids
            ]
        )
        return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")

    def transform(self, corpus: DataFrame, vec_col: str) -> DataFrame:
        """Append the ``cell`` assignment column. Persist with
        ``.write.partitionBy('cell')`` to get physical pruning."""
        assert self.centroids is not None, "fit first"
        return corpus.withColumn("cell", self._cell_expr(vec_col))

    def search(
        self,
        indexed: DataFrame,
        vec_col: str,
        id_col: str,
        query: list[float],
        k: int = 10,
        nprobe: int = 4,
    ) -> DataFrame:
        """Top-k by cosine among the nprobe cells nearest the query."""
        assert self.centroids is not None, "fit first"
        qv = np.asarray(query, dtype=np.float64)
        qn = qv / max(np.linalg.norm(qv), 1e-12)
        d2 = ((self.centroids - qn) ** 2).sum(axis=1)
        probe_cells = [int(c) for c in np.argsort(d2)[:nprobe]]
        q = F.array(*[F.lit(float(x)) for x in query])
        return (
            indexed.filter(F.col("cell").isin(probe_cells))
            .select(
                F.col(id_col),
                F.round(
                    cosine_similarity(F.col(vec_col).cast("array<double>"), q), 6
                ).alias("cosine"),
            )
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k)
        )
