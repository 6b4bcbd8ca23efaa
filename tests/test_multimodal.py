"""Multimodal plumbing tests: schema, batch shape, determinism, stub gating."""

import pytest

from montezuma_spark.fixtures import synth_web_pages_df
from montezuma_spark.multimodal import (
    FEATURE_DIM,
    _decode_stub,
    dedup_by_content_hash,
    extract_features,
    frame_sample,
)


def test_decode_stub_deterministic():
    a = _decode_stub(b"payload", "image")
    b = _decode_stub(b"payload", "image")
    assert a["sha256"] == b["sha256"]
    assert (a["feature"] == b["feature"]).all()
    assert len(a["feature"]) == FEATURE_DIM


def test_decode_stub_rejects_unknown_type():
    with pytest.raises(NotImplementedError):
        _decode_stub(b"x", "hologram")


def test_extract_features_spark(spark):
    docs = synth_web_pages_df(spark, 40)
    feats = extract_features(docs, payload_col="html", media_type="image")
    pdf = feats.toPandas()
    assert len(pdf) == 40
    assert set(pdf.columns) == {
        "url", "media_type", "n_bytes", "sha256", "feature", "width", "height"
    }
    assert all(len(f) == FEATURE_DIM for f in pdf["feature"])
    assert (pdf["n_bytes"] > 0).all()
    # determinism across runs
    pdf2 = feats.toPandas()
    assert list(pdf.sort_values("url")["sha256"]) == list(
        pdf2.sort_values("url")["sha256"]
    )


def test_frame_sample_spark(spark):
    docs = synth_web_pages_df(spark, 10)
    frames = frame_sample(docs, every_n=5).toPandas()
    assert (frames["frame_idx"] % 5 == 0).all()
    assert frames.groupby("url").size().min() >= 1


def test_dedup_by_content_hash(spark):
    docs = synth_web_pages_df(spark, 30)
    dup = docs.union(docs.limit(5))  # 5 exact duplicate payloads
    feats = extract_features(dup)
    groups = dedup_by_content_hash(feats).toPandas()
    assert (groups["copies"] >= 2).sum() == 5
    assert groups["copies"].sum() == 35
