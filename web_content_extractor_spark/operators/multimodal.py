"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a typed
metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages.  The decode kernels are
STUBBED in this environment (no imaging/audio libraries in the
container — clearly marked below); everything Spark-side is real and
tested: schemas, batch shapes, partitioning behavior, UDF signatures.

On a real cluster you drop in PIL/torchvision/ffmpeg inside
``_decode_image_real`` and nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), nullable=False),
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.StringType(), nullable=False),
        T.StructField("doc_id", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("thumb_w", T.IntegerType()),
        T.StructField("thumb_h", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_real(payload: bytes) -> object:
    """Real decoder slot. STUB: imaging libs absent in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv — not available in this "
        "environment; use deterministic_fake=True for plumbing tests"
    )


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic fake 'embedding': byte-histogram moments.

    Stands in for a real feature extractor so the Spark-side batch
    shape / schema / partitioning can be exercised end to end.
    """
    if not payload:
        return [0.0] * n
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:n]]


def extract_image_features(
    media: DataFrame,
    deterministic_fake: bool = True,
    thumb: tuple[int, int] = (32, 32),
) -> DataFrame:
    """Arrow-batched decode + feature stage over binary payloads.

    One pass, no shuffle; the output schema is fixed (IMAGE_FEATURES)
    regardless of the decode backend.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                if not deterministic_fake:
                    _decode_image_real(payload)  # pragma: no cover
                rows.append(
                    {
                        "media_id": r["media_id"],
                        "doc_id": r["doc_id"],
                        "n_bytes": len(payload),
                        "content_hash": hashlib.sha256(payload).hexdigest(),
                        "thumb_w": thumb[0],
                        "thumb_h": thumb[1],
                        "features": _fake_features(payload),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "doc_id",
                    "n_bytes",
                    "content_hash",
                    "thumb_w",
                    "thumb_h",
                    "features",
                ],
            )

    return media.mapInPandas(run, schema=IMAGE_FEATURES)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, deterministic_fake: bool = True
) -> DataFrame:
    """Frame-sampling plumbing for video payloads.

    Emits one row per sampled frame timestamp (schema + fan-out shape
    real; frame decode itself stubbed behind the fake backend).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if not deterministic_fake:
                    _decode_image_real(b"")  # pragma: no cover
                meta = r["meta"]
                duration = (meta or {}).get("duration_ms") or 0
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                for ts in range(0, max(duration, 1), every_ms):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "doc_id": r["doc_id"],
                            "frame_ts_ms": ts,
                            "frame_hash": hashlib.sha256(
                                payload + ts.to_bytes(8, "little")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "doc_id", "frame_ts_ms", "frame_hash"]
            )

    return media.mapInPandas(
        run,
        schema="media_id string, doc_id string, frame_ts_ms int, frame_hash string",
    )
