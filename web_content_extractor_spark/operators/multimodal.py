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


PDF_LAYOUT = T.StructType(
    [
        T.StructField("media_id", T.StringType(), nullable=False),
        T.StructField("doc_id", T.StringType()),
        T.StructField("page", T.IntegerType()),
        T.StructField("block_idx", T.IntegerType()),
        T.StructField("kind", T.StringType()),  # heading | paragraph
        T.StructField("text", T.StringType()),
        T.StructField("x0", T.FloatType()),
        T.StructField("y0", T.FloatType()),
        T.StructField("x1", T.FloatType()),
        T.StructField("y1", T.FloatType()),
    ]
)


def _parse_pdf_real(payload: bytes) -> object:
    """Real layout-parse slot. STUB: no pdfminer/mupdf in container."""
    raise NotImplementedError(
        "PDF layout parse requires pdfminer/pymupdf — not available in "
        "this environment; use deterministic_fake=True for plumbing tests"
    )


def parse_pdf_layout(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """PDF/layout branch for media spans (north-star requirement).

    Arrow-batched layout parse of PDF payloads into ordered
    (page, block, kind, text, bbox) rows — the media-span counterpart
    of the HTML block classifier (operators/content.py).  The decode
    kernel is stubbed (deterministic blocks derived from the payload
    hash) so the distributed plumbing — schema, batch shape, fan-out,
    downstream joins back to docs — is real and oracle-checkable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in PDF_LAYOUT.fields]
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                payload = bytes(r["payload"]) if r["payload"] is not None else b""
                if not deterministic_fake:
                    _parse_pdf_real(payload)  # pragma: no cover
                digest = hashlib.sha256(payload).hexdigest()
                p_digest = hashlib.sha256(payload + b"p").hexdigest()
                rows.append((r["media_id"], r["doc_id"], 0, 0, "heading",
                             digest[:16], 72.0, 720.0, 540.0, 756.0))
                rows.append((r["media_id"], r["doc_id"], 0, 1, "paragraph",
                             p_digest[:32], 72.0, 96.0, 540.0, 700.0))
            yield pd.DataFrame(rows, columns=cols)

    return media.mapInPandas(run, schema=PDF_LAYOUT)


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
