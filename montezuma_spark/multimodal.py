"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; all
transforms are Arrow-batched ``mapInPandas`` over (payload, meta) pairs.
The actual media decode is STUBBED (no media libs in this container): a
clearly-marked deterministic fake keyed on the payload bytes stands in, so
the Spark-side plumbing — schema, batch shape, partitioning, UDF signature —
is real and tested, and swapping in PIL/librosa later only replaces
``_decode_stub``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_type string, width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA = (
    "url string, media_type string, n_bytes long, sha256 string, "
    "feature array<float>, width int, height int"
)

FEATURE_DIM = 16


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def _decode_image_pil(payload: bytes) -> dict:
    """REAL image decode via PIL (optional dependency): true dimensions +
    a 16-dim feature = 4×4 grayscale thumbnail, row-major, /255. Import
    is local so the module (and the stub path) never require PIL."""
    import io

    from PIL import Image

    im = Image.open(io.BytesIO(payload))
    w, h = im.size
    g = im.convert("L").resize((4, 4))
    feature = (
        np.asarray(g, dtype=np.float32) / 255.0
    ).ravel()[:FEATURE_DIM].astype(np.float32)
    return {
        "sha256": hashlib.sha256(payload).hexdigest(),
        "width": int(w),
        "height": int(h),
        "feature": feature,
    }


def _decode(payload: bytes, media_type: str, decoder: str = "auto") -> dict:
    """Dispatch: ``auto`` uses the real PIL decode for images when PIL is
    importable, else the deterministic stub; ``stub``/``pil`` force a
    branch (the contract's mm_features pins ``stub`` so its oracle hash
    is environment-independent)."""
    if decoder == "pil" or (
        decoder == "auto" and media_type == "image" and _pil_available()
    ):
        return _decode_image_pil(payload)
    return _decode_stub(payload, media_type)


def _decode_stub(payload: bytes, media_type: str) -> dict:
    """Deterministic fake decode. A real build would call PIL / ffmpeg /
    librosa here; the container has none, so we derive stable pseudo
    dimensions + a feature vector from the payload hash.

    Raises NotImplementedError for media types the plumbing doesn't model.
    """
    if media_type not in ("image", "audio", "video"):
        raise NotImplementedError(f"unsupported media type: {media_type}")
    h = hashlib.sha256(payload).digest()
    rng_ints = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    feature = (rng_ints[:FEATURE_DIM] / 255.0).astype(np.float32)
    return {
        "sha256": hashlib.sha256(payload).hexdigest(),
        "width": 16 + h[0] % 240 if media_type in ("image", "video") else 0,
        "height": 16 + h[1] % 240 if media_type in ("image", "video") else 0,
        "feature": feature,
    }


def extract_features(
    df: DataFrame, payload_col: str = "html", url_col: str = "url",
    media_type: str = "image", decoder: str = "stub",
) -> DataFrame:
    """binary payload column → per-item feature rows, Arrow-batched.

    ``decoder``: "stub" (default — deterministic, environment-independent,
    what the correctness oracle pins), "pil" (real image decode, optional
    dependency), or "auto" (pil for images when importable, else stub).

    Partitioning note for scale: payloads are large and skew by size; the
    caller should ``repartition`` by a size-aware key before this to even
    out batch bytes (Arrow batch size is rows-based, not bytes-based).
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                d = _decode(b, media_type, decoder)
                rows.append(
                    {
                        "url": url,
                        "media_type": media_type,
                        "n_bytes": len(b),
                        "sha256": d["sha256"],
                        "feature": d["feature"],
                        "width": d["width"],
                        "height": d["height"],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(url_col, payload_col).mapInPandas(
        work, schema=FEATURE_SCHEMA
    )


def frame_sample(df: DataFrame, payload_col: str = "html",
                 url_col: str = "url", every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    Frame count is stubbed from payload length; real decode would use
    ffmpeg. Output schema (url, frame_idx, frame_sha) is what a real
    extractor feeds into the embedding stage.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, idxs, shas = [], [], []
            for url, payload in zip(pdf[url_col], pdf[payload_col]):
                b = bytes(payload) if payload is not None else b""
                n_frames = max(1, len(b) // 64)
                for i in range(0, n_frames, every_n):
                    urls.append(url)
                    idxs.append(i)
                    shas.append(
                        hashlib.sha256(b + i.to_bytes(4, "big")).hexdigest()[:16]
                    )
            yield pd.DataFrame(
                {"url": urls, "frame_idx": idxs, "frame_sha": shas}
            )

    return df.select(url_col, payload_col).mapInPandas(
        work, schema="url string, frame_idx int, frame_sha string"
    )


def dedup_by_content_hash(features: DataFrame) -> DataFrame:
    """Exact media dedup: group by content hash, keep first url per group."""
    return (
        features.groupBy("sha256")
        .agg(
            F.count("*").alias("copies"),
            F.min("url").alias("canonical_url"),
        )
    )
