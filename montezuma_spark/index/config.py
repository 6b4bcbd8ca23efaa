"""Index configuration: per-field analysis + physical layout knobs.

The reference's index config analog (src/index/index-writer.lisp:7-11 defaults,
src/index/field-infos.lisp flags): here static per build, per BASELINE.json
input_hint (fixed schema, one analyzed text field + untokenized keys).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from montezuma_spark.codec.postings import BM25_B, BM25_K1, DEFAULT_BLOCK


@dataclass(frozen=True)
class FieldConfig:
    name: str                      # index field name (query side: field:term)
    column: str                    # source DataFrame column
    analyzer: str | None = "standard"  # None → untokenized: whole value = 1 term
    positions: bool = True         # store the positions sidecar (phrase support)
    offsets: bool = False          # store (start,end) char offsets in the
                                   # term-vectors sidecar (highlighting;
                                   # term-vector-offset-info.lisp analog).
                                   # Opt-in like the reference's
                                   # store-term-vector field flag; single-
                                   # valued string fields only.
    position_gap: int = 0          # inter-value position gap for multi-valued
                                   # (array) columns — position-increment-gap
                                   # (analyzers.lisp:12-16, document-writer.lisp:64-65)


@dataclass
class IndexConfig:
    fields: list[FieldConfig] = dc_field(
        default_factory=lambda: [FieldConfig("text", "text")]
    )
    key_col: str = "url"           # unique doc key; docid = rank in key order
    shard_bits: int = 20           # docid-range shard = docid >> shard_bits
    block_size: int = DEFAULT_BLOCK
    k1: float = BM25_K1
    b: float = BM25_B
    num_partitions: int | None = None  # build parallelism (None → spark default)
    max_field_length: int = 10_000     # token truncation per field
                                       # (ref: index-writer.lisp:10)
    store_cols: tuple = ()             # source columns kept in doc_map
                                       # (stored fields — fields-io.lisp analog)
    block_codec: str = "packed"        # posting-block stream codec:
                                       # "packed" (default: frame-of-
                                       # reference bit packing, the
                                       # PForDelta-class layout; ~17%
                                       # smaller cells, no encode cost) |
                                       # "varint" (LEB128, the reference's
                                       # wire idea). The positions sidecar
                                       # uses the same codec as the postings
                                       # streams. Stored in meta.json, so
                                       # saved indexes decode with the codec
                                       # they were built with.
    similarity: str = "bm25"           # scoring fn from the similarity
                                       # registry (search/similarity.py:
                                       # "bm25" | "classic" | registered
                                       # custom — similarity.lisp:101-131)
    boost_col: str | None = None       # numeric source column: index-time
                                       # per-doc boost, a multiplicative
                                       # static prior on BM25 (the norms
                                       # boost analog, field.lisp:104-120,
                                       # document-writer.lisp:215-227;
                                       # quantized to 1/1024 steps like the
                                       # reference's byte-quantized norms)

    def to_json(self) -> dict:
        return {
            "fields": [
                {
                    "name": f.name,
                    "column": f.column,
                    "analyzer": f.analyzer,
                    "positions": f.positions,
                    "offsets": f.offsets,
                    "position_gap": f.position_gap,
                }
                for f in self.fields
            ],
            "key_col": self.key_col,
            "shard_bits": self.shard_bits,
            "block_size": self.block_size,
            "k1": self.k1,
            "b": self.b,
            "max_field_length": self.max_field_length,
            "store_cols": list(self.store_cols),
            "block_codec": self.block_codec,
            "similarity": self.similarity,
            "boost_col": self.boost_col,
        }

    @staticmethod
    def from_json(d: dict) -> "IndexConfig":
        return IndexConfig(
            fields=[
                FieldConfig(
                    f["name"], f["column"], f["analyzer"], f["positions"],
                    f.get("offsets", False), f.get("position_gap", 0),
                )
                for f in d["fields"]
            ],
            key_col=d["key_col"],
            shard_bits=d["shard_bits"],
            block_size=d["block_size"],
            k1=d["k1"],
            b=d["b"],
            max_field_length=d.get("max_field_length", 10_000),
            store_cols=tuple(d.get("store_cols", ())),
            block_codec=d.get("block_codec", "varint"),
            similarity=d.get("similarity", "bm25"),
            boost_col=d.get("boost_col"),
        )
