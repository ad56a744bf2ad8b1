from inputlayer_spark.streaming.maintainer import (
    IncrementalMaintainer,
    StreamingCorpusDeduper,
)

__all__ = ["IncrementalMaintainer", "StreamingCorpusDeduper"]
