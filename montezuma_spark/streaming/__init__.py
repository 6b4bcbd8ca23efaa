from montezuma_spark.streaming.incremental import (  # noqa: F401
    IncrementalIndexer,
)
