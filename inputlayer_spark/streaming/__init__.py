from inputlayer_spark.streaming.maintainer import IncrementalMaintainer

__all__ = ["IncrementalMaintainer"]
