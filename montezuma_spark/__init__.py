"""montezuma_spark — a PySpark-native inverted-index + BM25 full-text engine.

A from-scratch rebuild of the capabilities of the Montezuma full-text search
engine (reference: /root/reference, a Common Lisp Ferret/Lucene port), designed
Spark-first:

* document analysis (tokenize → lowercase → stop → stem) as vectorized
  pandas/Arrow operations inside ``mapInPandas`` (no per-row Python),
* inverted-index construction as partition-local term→postings aggregation
  followed by ONE range shuffle on (field, term) — Spark's sort-merge IS the
  reference's segment-merge priority queue (ref: src/index/segment-merger.lisp),
* posting lists stored as docID-delta varint binary cells with block-max
  metadata (ref wire format: src/index/segment-merger.lisp:233-278, upgraded
  from skip lists to block-max for WAND pruning),
* BM25 top-k query engine executed as a broadcast of query terms + a
  vectorized kernel over docid-range shards, so scoring is embarrassingly
  parallel and the only cross-shard communication is the final top-k merge.
"""

__version__ = "0.1.0"

from montezuma_spark.session import get_spark  # noqa: F401
