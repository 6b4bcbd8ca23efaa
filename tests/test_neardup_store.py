"""Persisted MinHash band store: streaming near-dup probes vs the
indexed corpus (montezuma_spark.neardup_store)."""

import pytest
from pyspark.sql import functions as F

from montezuma_spark.neardup_store import MinHashStore


@pytest.fixture(scope="module")
def spark():
    from montezuma_spark.session import get_spark

    yield get_spark("neardup-store-tests", cores=8, shuffle_partitions=8)


BASE = (
    "the quick brown fox jumps over the lazy dog while the spark engine "
    "merges sorted posting segments into a global term dictionary and "
    "the scheduler assigns docid ranges to worker shards"
)
OTHER = (
    "an unrelated treatise on watermarks sessionization and streaming "
    "state stores with windows triggers and exactly once sinks for "
    "event time aggregation pipelines at arbitrary scale"
)


def _toks(spark, rows):
    return spark.createDataFrame(rows, "docid long, text string").select(
        "docid",
        F.expr("transform(regexp_extract_all(text, '[a-zA-Z]+', 0), "
               "x -> lower(x))").alias("toks"),
    )


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    corpus = _toks(spark, [(0, BASE), (1, OTHER), (2, "tiny")])
    d = str(tmp_path_factory.mktemp("mhstore") / "store")
    st = MinHashStore.build(spark, corpus, d, num_hashes=8, band_rows=1)
    return MinHashStore.load(spark, d)  # reload: artifacts, not session


def test_probe_finds_corpus_near_dup(spark, store):
    batch = _toks(spark, [
        (100, BASE.replace("lazy", "sleepy")),   # near-dup of 0
        (101, "completely fresh content about bit packed posting "
              "cells block max metadata and impact ordered fronts"),
    ])
    pairs = store.near_dups(batch, threshold=0.5).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in pairs} == {(100, 0)}
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_dedup_gate_keeps_fresh_rows(spark, store):
    batch = spark.createDataFrame(
        [(100, BASE.replace("lazy", "sleepy")),
         (101, "fresh content words entirely disjoint from anything "
               "stored in the corpus store today")],
        "docid long, text string",
    ).withColumn(
        "toks",
        F.expr("transform(regexp_extract_all(text, '[a-zA-Z]+', 0), "
               "x -> lower(x))"),
    )
    kept = store.dedup_gate(batch, threshold=0.5)
    assert [r["docid"] for r in kept.select("docid").collect()] == [101]


def test_probe_join_path_matches_pushdown(spark, store):
    batch = _toks(spark, [(100, BASE.replace("lazy", "sleepy")),
                          (101, OTHER.replace("arbitrary", "vast"))])
    a = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in store.near_dups(batch, threshold=0.3).collect()
    )
    b = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in store.near_dups(
            batch, threshold=0.3, pushdown_max_values=0
        ).collect()
    )
    assert a == b and a  # same pairs via literal pushdown and join


def test_add_batch_extends_corpus(spark, tmp_path_factory):
    corpus = _toks(spark, [(0, BASE)])
    d = str(tmp_path_factory.mktemp("mhstore2") / "store")
    st = MinHashStore.build(spark, corpus, d, num_hashes=8, band_rows=1)
    st.add_batch(_toks(spark, [(50, OTHER)]))
    probe = _toks(spark, [(200, OTHER.replace("arbitrary", "vast"))])
    pairs = st.near_dups(probe, threshold=0.5).collect()
    assert {(r["batch_id"], r["corpus_id"]) for r in pairs} == {(200, 50)}
    # reload after append sees both generations
    st2 = MinHashStore.load(spark, d)
    assert {(r["batch_id"], r["corpus_id"])
            for r in st2.near_dups(probe, threshold=0.5).collect()} == {
        (200, 50)
    }


def test_short_docs_never_match(spark, store):
    batch = _toks(spark, [(300, "ti ny")])  # < ngram tokens: no shingles
    assert store.near_dups(batch, threshold=0.1).collect() == []


def test_all_short_corpus_store_matches_nothing(spark, tmp_path_factory):
    corpus = _toks(spark, [(0, "a b"), (1, "x")])  # every doc < ngram
    d = str(tmp_path_factory.mktemp("mhstore3") / "store")
    st = MinHashStore.build(spark, corpus, d, num_hashes=8, band_rows=1)
    st = MinHashStore.load(spark, d)
    batch = _toks(spark, [(9, BASE)])
    assert st.near_dups(batch, threshold=0.1).collect() == []
    kept = st.dedup_gate(batch)
    assert [r["docid"] for r in kept.select("docid").collect()] == [9]


def test_ingest_gate_before_incremental_indexer(spark, tmp_path_factory):
    """The streaming-ingest composition: batch 1 builds the corpus
    (store + index); batch 2 passes through the store's dedup_gate
    before IncrementalIndexer.add_batch, so near-dups of already-indexed
    docs never enter the index; the store then learns the survivors."""
    from montezuma_spark.index import FieldConfig, IndexConfig
    from montezuma_spark.search import Searcher, TermQuery
    from montezuma_spark.streaming import IncrementalIndexer

    root = tmp_path_factory.mktemp("gatepipe")
    cfg = IndexConfig(
        fields=[FieldConfig("text", "text", "whitespace")],
        key_col="url", shard_bits=3,
    )
    ix = IncrementalIndexer(spark, str(root / "ix"), cfg)

    def docs(rows):
        return spark.createDataFrame(rows, "url string, text string")

    def toks_of(df):
        return df.select(
            F.xxhash64("url").alias("docid"),
            F.split("text", " ").alias("toks"),
        )

    b1 = docs([("u://0", BASE), ("u://1", OTHER)])
    ix.add_batch(b1, batch_id=0)
    store = MinHashStore.build(
        spark, toks_of(b1), str(root / "store"),
        num_hashes=8, band_rows=1,
    )

    b2 = docs([
        ("u://2", BASE.replace("lazy", "sleepy")),     # near-dup -> gated
        ("u://3", "genuinely new material about codec cells and "
                  "impact ordered block fronts for pruned scoring"),
    ])
    kept = store.dedup_gate(toks_of(b2), threshold=0.5).select("docid") \
        .join(toks_of(b2).join(b2.selectExpr(
            "xxhash64(url) AS docid", "url", "text"), "docid"), "docid") \
        .select("url", "text")
    assert [r["url"] for r in kept.select("url").collect()] == ["u://3"]
    entry = ix.add_batch(kept, batch_id=1)
    assert entry["num_docs"] == 1
    store.add_batch(toks_of(kept))

    s = Searcher(ix.multi_index())
    # the gated near-dup's marker word never entered the index
    assert s.top_docs(TermQuery("text", "sleepy"), k=5) == []
    assert len(s.top_docs(TermQuery("text", "codec"), k=5)) == 1
    # and the store now knows batch 2's survivor
    probe = toks_of(docs([("u://9", "genuinely new material about codec "
                                    "cells and impact ordered block "
                                    "fronts for pruned scoring today")]))
    assert store.near_dups(probe, threshold=0.5).count() >= 1


def test_compact_preserves_probe_results(spark, tmp_path_factory):
    """compact(): after several appended generations, probing before and
    after compaction returns identical pairs, and both tables collapse
    to one file set (no per-batch generations left)."""
    import glob

    d = str(tmp_path_factory.mktemp("mhstore4") / "store")
    st = MinHashStore.build(
        spark, _toks(spark, [(0, BASE)]), d, num_hashes=8, band_rows=1
    )
    st.add_batch(_toks(spark, [(50, OTHER)]))
    st.add_batch(_toks(spark, [(60, BASE.replace("fox", "wolf"))]))
    probe = _toks(spark, [
        (200, OTHER.replace("arbitrary", "vast")),
        (201, BASE.replace("lazy", "sleepy")),
    ])
    before = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in st.near_dups(probe, threshold=0.4).collect()
    )
    n_gens_before = len(glob.glob(f"{d}/shingles/gen=*"))
    assert n_gens_before == 3  # build + two appended generations
    st.compact()
    after = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in st.near_dups(probe, threshold=0.4).collect()
    )
    assert before == after and before
    assert {c for _, c, _ in before} >= {0, 50, 60} - {0}  # dups found
    assert len(glob.glob(f"{d}/shingles/gen=*")) == 1
    assert len(glob.glob(f"{d}/bands/gen=*")) == 1
    # reload still works over the swapped layout
    st2 = MinHashStore.load(spark, d)
    assert sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in st2.near_dups(probe, threshold=0.4).collect()
    ) == before


def test_auto_merge_bounds_generations(spark, tmp_path_factory):
    """Log-tier auto-merge: many 1-doc appends with a tiny tier-0 target
    keep the committed generation count bounded, and probes return the
    same pairs a never-merged store would (parity across every merge)."""
    import glob

    d = str(tmp_path_factory.mktemp("mhstore5") / "store")
    st = MinHashStore.build(
        spark, _toks(spark, [(0, BASE)]), d, num_hashes=8, band_rows=1
    )
    st.min_merge_docs = 2  # tier-0 target: 2 docs, factor 10
    texts = [OTHER, BASE.replace("fox", "wolf"),
             OTHER.replace("state", "status"),
             BASE.replace("dog", "cat"), OTHER.replace("scale", "size")]
    for i, t in enumerate(texts):
        st.add_batch(_toks(spark, [(50 + i, t)]))
    # 6 one-doc generations would exist without merging; the tier walk
    # keeps strictly fewer committed generations than appends
    assert len(st.meta["gens"]) < 6
    assert len(glob.glob(f"{d}/shingles/gen=*")) == len(st.meta["gens"])
    probe = _toks(spark, [
        (200, OTHER.replace("arbitrary", "vast")),
        (201, BASE.replace("lazy", "sleepy")),
    ])
    got = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in st.near_dups(probe, threshold=0.4).collect()
    )
    # reference: identical corpus built in one generation (no merges)
    d2 = str(tmp_path_factory.mktemp("mhstore5") / "ref")
    rows = [(0, BASE)] + [(50 + i, t) for i, t in enumerate(texts)]
    ref = MinHashStore.build(
        spark, _toks(spark, rows), d2, num_hashes=8, band_rows=1
    )
    want = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in ref.near_dups(probe, threshold=0.4).collect()
    )
    assert got == want and got


def test_load_ignores_and_gcs_orphan_generations(spark, tmp_path_factory):
    """A generation dir with no meta entry (crash after write, before
    the meta commit) is invisible to probes and garbage-collected by
    load() — never half-visible data."""
    import os
    import shutil

    d = str(tmp_path_factory.mktemp("mhstore6") / "store")
    st = MinHashStore.build(
        spark, _toks(spark, [(0, BASE)]), d, num_hashes=8, band_rows=1
    )
    # forge an uncommitted generation holding a would-match near-dup
    orphan = _toks(spark, [(77, BASE.replace("lazy", "sleepy"))])
    sh, bands = st._batch_prep(orphan, "docid", "toks")
    MinHashStore._write_generation(spark, d, 99, bands, sh, 8, 1)
    assert os.path.isdir(f"{d}/bands/gen=99")
    st2 = MinHashStore.load(spark, d)
    probe = _toks(spark, [(200, BASE.replace("lazy", "sleepy"))])
    pairs = st2.near_dups(probe, threshold=0.4).collect()
    assert {r["corpus_id"] for r in pairs} == {0}  # 77 never visible
    assert not os.path.isdir(f"{d}/bands/gen=99")  # GC'd
    assert not os.path.isdir(f"{d}/shingles/gen=99")


def test_legacy_flat_layout_migrates_on_load(spark, tmp_path_factory):
    """A round-4 store (flat bands/band_id=…, no generation list in
    meta.json) loads via the one-time gen=0 migration with identical
    probe results, and supports appends afterwards."""
    import json
    import os

    d = str(tmp_path_factory.mktemp("mhstore7") / "store")
    st = MinHashStore.build(
        spark, _toks(spark, [(0, BASE), (1, OTHER)]), d,
        num_hashes=8, band_rows=1,
    )
    probe = _toks(spark, [(200, BASE.replace("lazy", "sleepy"))])
    want = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in st.near_dups(probe, threshold=0.4).collect()
    )
    # flatten to the legacy layout: gen=0 contents hoisted up a level
    for name in ("bands", "shingles"):
        os.rename(f"{d}/{name}/gen=0", f"{d}/{name}.flat")
        os.rmdir(f"{d}/{name}")
        os.rename(f"{d}/{name}.flat", f"{d}/{name}")
    meta = json.load(open(f"{d}/meta.json"))
    for k in ("gens", "next_gen"):
        meta.pop(k)
    json.dump(meta, open(f"{d}/meta.json", "w"))
    st2 = MinHashStore.load(spark, d)
    assert "gens" in st2.meta and st2.meta["gens"][0]["docs"] == 2
    got = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in st2.near_dups(probe, threshold=0.4).collect()
    )
    assert got == want and got
    st2.add_batch(_toks(spark, [(50, OTHER.replace("scale", "size"))]))
    assert MinHashStore.load(spark, d).near_dups(
        _toks(spark, [(300, OTHER.replace("scale", "size"))]),
        threshold=0.5,
    ).count() >= 1


def test_missing_committed_table_raises(spark, tmp_path_factory):
    """A committed non-empty generation whose directory is gone must
    RAISE at load — silently matching nothing would let dedup_gate
    admit every near-dup (the silent-under-dedup rule)."""
    import shutil

    d = str(tmp_path_factory.mktemp("mhstore8") / "store")
    MinHashStore.build(
        spark, _toks(spark, [(0, BASE)]), d, num_hashes=8, band_rows=1
    )
    shutil.rmtree(f"{d}/bands")
    with pytest.raises(Exception):
        MinHashStore.load(spark, d)


def test_missing_single_generation_raises(spark, tmp_path_factory):
    """One committed non-empty generation dir gone (partial restore,
    stray cleanup) while others remain: load must RAISE, not silently
    match fewer rows."""
    import shutil

    d = str(tmp_path_factory.mktemp("mhstore9") / "store")
    st = MinHashStore.build(
        spark, _toks(spark, [(0, BASE)]), d, num_hashes=8, band_rows=1
    )
    st.add_batch(_toks(spark, [(50, OTHER)]))
    gone = st.meta["gens"][-1]["id"]
    shutil.rmtree(f"{d}/bands/gen={gone}")
    with pytest.raises(Exception):
        MinHashStore.load(spark, d)


def test_empty_batch_commits_no_generation(spark, tmp_path_factory):
    """Empty ingest deltas never grow the generation list (zero-doc
    generations could never satisfy a merge tier target)."""
    import glob

    d = str(tmp_path_factory.mktemp("mhstore10") / "store")
    st = MinHashStore.build(
        spark, _toks(spark, [(0, BASE)]), d, num_hashes=8, band_rows=1
    )
    for _ in range(3):
        st.add_batch(_toks(spark, []))
    assert len(st.meta["gens"]) == 1
    assert len(glob.glob(f"{d}/shingles/gen=*")) == 1
    assert st.near_dups(
        _toks(spark, [(200, BASE.replace("lazy", "sleepy"))]), 0.4
    ).count() == 1


def test_compact_rewrites_migrated_legacy_generation(spark,
                                                     tmp_path_factory):
    """A migrated legacy store's lone gen=0 holds old per-batch append
    files (range-sorted only within each batch); compact() must rewrite
    it rather than no-op, and probes stay identical."""
    import json
    import os

    d = str(tmp_path_factory.mktemp("mhstore11") / "store")
    st = MinHashStore.build(
        spark, _toks(spark, [(0, BASE), (1, OTHER)]), d,
        num_hashes=8, band_rows=1,
    )
    for name in ("bands", "shingles"):
        os.rename(f"{d}/{name}/gen=0", f"{d}/{name}.flat")
        os.rmdir(f"{d}/{name}")
        os.rename(f"{d}/{name}.flat", f"{d}/{name}")
    meta = json.load(open(f"{d}/meta.json"))
    for k in ("gens", "next_gen"):
        meta.pop(k)
    json.dump(meta, open(f"{d}/meta.json", "w"))
    st2 = MinHashStore.load(spark, d)
    assert st2.meta["gens"][0].get("migrated")
    probe = _toks(spark, [(200, BASE.replace("lazy", "sleepy"))])
    before = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in st2.near_dups(probe, threshold=0.4).collect()
    )
    st2.compact()
    assert len(st2.meta["gens"]) == 1
    assert not st2.meta["gens"][0].get("migrated")  # rewritten fresh
    assert st2.meta["gens"][0]["id"] == 1
    after = sorted(
        (r["batch_id"], r["corpus_id"], round(r["jaccard"], 9))
        for r in st2.near_dups(probe, threshold=0.4).collect()
    )
    assert before == after and before
