from inputlayer_spark.sources.readers import (
    read_relation,
    stream_relation,
    write_relation,
)

__all__ = ["read_relation", "write_relation", "stream_relation"]
