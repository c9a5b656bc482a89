from clustering_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
    squared_distance,
)
from clustering_spark.functions.scaling import scale_segments  # noqa: F401
from clustering_spark.functions.entropy import shannon_entropy_agg  # noqa: F401
