"""clustering_spark — a PySpark-native segmentation + clustering analytics
engine with the query/data-processing capabilities of the reference
(ykursadkaya/Clustering), re-expressed Spark-first.

Reference semantics (see SURVEY.md):
  * two-level segment hierarchy (macro -> micro), modelled here as group
    keys in ONE DataFrame (never N filtered DataFrames);
  * per-segment min-max / percent-of-limit scaling of metric columns;
  * per-segment KMeans / BisectingKMeans / GaussianMixture with a cached,
    auto-tuned, quality-gated cluster count k;
  * per-cluster summaries (center, size, radius) and per-segment metrics
    (entropy, silhouette);
  * flat result table + D3 circle-packing hierarchy JSON sinks.

Beyond the reference: dedup (exact / MinHash-LSH / SimHash / n-gram
Jaccard / banded-hyperplane embedding-cosine), similarity search
(brute-force cosine top-k, knn join, IVF-ANN), text analysis (lang-id,
quality scoring, token counting, fingerprints), the optimal-k tuner +
parquet k-cache with regression-gated re-tuning, nested original/D3
document sinks, explicit-schema PERMISSIVE CSV ingestion
(``sources/``), a Structured Streaming ingest path with watermarked
tumbling/session windows plus a custom applyInPandasWithState
per-key stateful operator with event-time eviction (``streaming/``;
the window/session streams are DuckDB-oracle-checked against their
batch equivalents), multimodal binary-column
plumbing with Arrow-batched decode stages (``operators/multimodal``),
and physical-plan audit helpers (``plans/``) — all designed
partition-first for 100 TB scale.
"""

__version__ = "0.1.0"
