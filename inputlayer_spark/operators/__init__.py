"""DataFrame-level operators: dedup, similarity search, multimodal,
text analysis. These extend the reference surface with the
training-data-pipeline operations BASELINE.json calls for, designed
DataFrame-native so scale comes from Spark."""

from inputlayer_spark.operators import dedup, multimodal, similarity

__all__ = ["dedup", "multimodal", "similarity"]
