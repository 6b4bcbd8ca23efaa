from montezuma_spark.codec.postings import (  # noqa: F401
    BM25_B,
    BM25_K1,
    DEFAULT_BLOCK,
    META_FIELDS,
    block_upper_bounds,
    bm25_tf_norm,
    decode_cell,
    decode_positions,
    encode_cell,
    encode_positions,
)
from montezuma_spark.codec.varint import (  # noqa: F401
    decode_varints,
    delta_decode,
    delta_encode,
    encode_varints,
    grouped_delta_decode,
)
