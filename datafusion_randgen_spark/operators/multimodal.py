"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked deterministic fake (or ``NotImplementedError`` for the
real-codec path) — but the Spark-side plumbing is real and tested:
schema, batch iteration, partitioning, and the UDF signatures are
exactly what a production decode stage uses; swapping in Pillow/librosa
is a one-function change.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` sized so a batch of payloads fits
executor memory.  All stages are map-only — zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, byte_len long"
)

FEATURE_SCHEMA = (
    "doc_id long, media_type string, byte_len long, "
    "width int, height int, checksum long"
)


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary 'media' column from the text bytes —
    a stand-in for real image/audio payloads with a deterministic,
    oracle-checkable byte length."""
    media = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        media.alias("media"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
        F.octet_length(media).cast("long").alias("byte_len"),
    )


def _fake_decode_dims(byte_len: pd.Series) -> tuple[pd.Series, pd.Series]:
    """FAKE decode: derive WxH from payload size deterministically.
    Real implementation would parse the container header (PIL.Image.open
    / soundfile.info) — unavailable in this environment."""
    width = 64 + (byte_len % 640)
    height = 64 + ((byte_len // 7) % 480)
    return width.astype("int32"), height.astype("int32")


def real_decode(payload: bytes, media_type: str):  # pragma: no cover - stub
    """Real-codec decode path. STUB: codecs not present in this container."""
    raise NotImplementedError(
        "media decode requires an image/audio codec (Pillow/libsndfile); "
        "not available in this environment — use the deterministic fake path"
    )


def extract_features(media_df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Checksum is a real computation over the bytes (sum of byte values —
    SQL-expressible so the oracle can verify the payload actually
    crossed the Arrow boundary intact); width/height come from the fake
    decode.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            width, height = _fake_decode_dims(pdf["byte_len"])
            checksum = pdf["media"].map(lambda b: int(sum(b)))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "byte_len": pdf["byte_len"],
                    "width": width,
                    "height": height,
                    "checksum": checksum,
                }
            )

    return media_df.mapInPandas(op, schema=FEATURE_SCHEMA)


def resize_stub(media_df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: passes payloads through mapInPandas and records
    the target dims (real resize would transform the payload)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "media", "media_type", "byte_len"]].copy()
            yield out

    return media_df.mapInPandas(op, schema=MEDIA_SCHEMA).withColumns(
        {"target_w": F.lit(target_w), "target_h": F.lit(target_h)}
    )
