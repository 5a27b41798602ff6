"""Multimodal (image/audio/video) column handling.

Model (SURVEY.md §2.C): media is an opaque ``binary`` column plus typed
metadata; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched Pandas functions over ``mapInPandas`` — the only place in
this engine where Python touches data, because codec work genuinely can't
be expressed in Spark SQL.

The container has no image/audio codecs (PIL/cv2/librosa absent), so the
actual byte→pixels step is STUBBED: `_decode_image_bytes` raises
``NotImplementedError`` unless PIL is importable, and the pipeline uses
``deterministic_fake=True`` to substitute a seeded, content-derived fake
decode.  Everything around the stub — schema, batch iteration, Arrow
transfer, partitioning — is real and tested.

Scale notes: mapInPandas streams Arrow batches (no per-row pickling);
batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
so a partition of 100 MB images doesn't materialize at once.  Media bytes
should live in their own table partitioned by content-hash prefix, joined
to features by id — never groupBy'd or shuffled wholesale.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, content binary, "
    "meta struct<mime:string, n_bytes:bigint, source:string>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, width int, height int, "
    "n_channels int, mean_intensity double, phash string"
)


def media_from_documents(df: DataFrame, n: int = 100) -> DataFrame:
    """Synthesize a media table from the documents fixture: bytes are the
    utf-8 text (deterministic stand-in for real image bytes)."""
    return (
        df.filter(F.col("doc_id") < n)
        .select(
            F.col("doc_id").alias("media_id"),
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("kind"),
            F.encode("text", "utf-8").alias("content"),
            F.struct(
                F.lit("application/octet-stream").alias("mime"),
                F.length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
                F.col("source").alias("source"),
            ).alias("meta"),
        )
    )


def _decode_image_bytes(raw: bytes):
    """Real decode path — requires an image codec library."""
    try:
        from PIL import Image  # noqa: F401  (absent in this container)
        import io

        return Image.open(io.BytesIO(raw))
    except ImportError as e:  # pragma: no cover - container has no PIL
        raise NotImplementedError(
            "image decode requires PIL/opencv; use deterministic_fake=True"
        ) from e


def _fake_decode(raw: bytes) -> tuple[int, int, int, float, str]:
    """Deterministic content-derived fake: dimensions, channels, mean
    intensity and a perceptual-hash stand-in from sha256(content).
    sha256 (not sha1) so a DuckDB oracle can recompute every feature —
    the whole Arrow/mapInPandas path becomes hash-checkable."""
    h = hashlib.sha256(raw).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    channels = 1 + h[2] % 3
    mean_intensity = round(sum(h[3:11]) / (8 * 255.0), 6)
    phash = h[:8].hex()
    return width, height, channels, mean_intensity, phash


def extract_features(
    media: DataFrame, deterministic_fake: bool = True
) -> DataFrame:
    """Decode + feature-extract every media row via mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, kind, raw in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                raw = bytes(raw)
                if not deterministic_fake:
                    img = _decode_image_bytes(raw)  # NotImplementedError here
                    w, hgt = img.size
                    ch, mi, ph = 3, 0.0, ""
                else:
                    w, hgt, ch, mi, ph = _fake_decode(raw)
                out.append((mid, kind, w, hgt, ch, mi, ph))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "kind",
                    "width",
                    "height",
                    "n_channels",
                    "mean_intensity",
                    "phash",
                ],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_images(
    media: DataFrame, target: tuple[int, int] = (224, 224),
    deterministic_fake: bool = True,
) -> DataFrame:
    """Resize stub: emits (media_id, width, height, content) with the fake
    path producing content = sha256(original || target) — byte-level
    deterministic, so downstream exact-dedup over resized media is
    testable without a codec."""

    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, raw in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(raw)
                if not deterministic_fake:
                    raise NotImplementedError("real resize requires PIL")
                fake = hashlib.sha256(raw + f"{tw}x{th}".encode()).digest()
                rows.append((mid, tw, th, fake))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "content"]
            )

    return media.mapInPandas(
        run, schema="media_id bigint, width int, height int, content binary"
    )


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 4,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Video frame-sampling stub: one output row per sampled frame
    (media_id, frame_idx, content).  Fake frames are
    sha256(content || str(idx)) — a text salt so the oracle can rebuild
    the exact frame bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, raw in zip(
                pdf["media_id"], pdf["kind"], pdf["content"]
            ):
                if kind != "video":
                    continue
                raw = bytes(raw)
                if not deterministic_fake:
                    raise NotImplementedError("real frame sampling requires cv2")
                n_frames = max(1, len(raw) // max(every_n, 1))
                for i in range(min(n_frames, max_frames)):
                    frame = hashlib.sha256(raw + str(i).encode()).digest()
                    rows.append((mid, i * every_n, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "content"])

    return media.mapInPandas(
        run, schema="media_id bigint, frame_idx int, content binary"
    )
