from montezuma_spark.index.builder import Index, build_index  # noqa: F401
from montezuma_spark.index.config import FieldConfig, IndexConfig  # noqa: F401
