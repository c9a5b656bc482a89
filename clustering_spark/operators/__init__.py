from clustering_spark.operators.segmentation import segment_stats  # noqa: F401
from clustering_spark.operators.clustering import SegmentedClusterer  # noqa: F401
