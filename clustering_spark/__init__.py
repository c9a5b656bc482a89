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
Jaccard / embedding-cosine), similarity search (brute-force + LSH
cosine top-k), text analysis (lang-id, quality, tokens, fingerprints),
multimodal binary-column plumbing, and a Structured Streaming ingest
path — all designed partition-first for 100 TB scale.
"""

__version__ = "0.1.0"
