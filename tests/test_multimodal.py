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


def test_decoder_dispatch_and_optional_pil(spark):
    """decoder="stub" is environment-independent (the oracle pins it);
    "auto" falls back to the stub when PIL is absent; the real PIL branch
    is exercised when the optional dependency is importable."""
    from montezuma_spark.multimodal import _decode, _pil_available

    payload = b"\x89PNG-not-really" * 8
    stub = _decode(payload, "image", decoder="stub")
    assert stub["sha256"] and len(stub["feature"]) == 16
    if not _pil_available():
        # auto == stub without PIL, and the forced branch fails loudly
        auto = _decode(payload, "image", decoder="auto")
        assert auto["width"] == stub["width"]
        assert (auto["feature"] == stub["feature"]).all()
        with pytest.raises(ImportError):
            _decode(payload, "image", decoder="pil")


def test_real_pil_decode_branch(spark):
    """Real decode path (runs wherever PIL is installed): true dims +
    4x4 grayscale feature, end-to-end through extract_features."""
    PIL = pytest.importorskip("PIL")  # noqa: F841
    import io

    from PIL import Image

    from montezuma_spark.multimodal import extract_features

    buf = io.BytesIO()
    Image.new("RGB", (20, 12), (120, 30, 200)).save(buf, format="PNG")
    payload = buf.getvalue()
    df = spark.createDataFrame([("u://1", bytearray(payload))],
                               "url string, html binary")
    out = extract_features(df, decoder="pil").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["width"], r["height"]) == (20, 12)
    assert len(r["feature"]) == 16
    # uniform image → uniform thumbnail feature
    f = np.asarray(r["feature"])
    assert float(f.std()) < 1e-3
