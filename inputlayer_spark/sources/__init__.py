from inputlayer_spark.sources.readers import (
    read_bucketed,
    read_relation,
    stream_relation,
    write_bucketed,
    write_relation,
)

__all__ = [
    "read_bucketed",
    "read_relation",
    "stream_relation",
    "write_bucketed",
    "write_relation",
]
