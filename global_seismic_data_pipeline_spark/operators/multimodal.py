"""Multimodal column handling: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media travels as a ``binary``
column with typed metadata columns beside it; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so bytes
stream through Python in columnar batches (never row-at-a-time), and the
surrounding plan (partitioning, predicate pushdown on metadata, column
pruning of the heavy payload) stays fully native.

The actual codec step is STUBBED here (no image/audio libraries in this
environment): ``decode_image_batch`` raises NotImplementedError unless the
deterministic fake decoder is requested. The Spark-side plumbing — schema,
batch iteration, payload pruning — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

METADATA_SCHEMA = (
    "doc_id long, payload_bytes long, header_byte long, width long, height long"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test harness: materialize a binary payload column from text (stands
    in for image/audio bytes; real pipelines read binary files directly via
    ``spark.read.format('binaryFile')``)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_image_batch(payloads: pd.Series, *, fake: bool = False) -> pd.DataFrame:
    """Decode a batch of image payloads to (width, height, header_byte).

    STUB: real decoding needs PIL/ffmpeg (absent here). ``fake=True`` uses
    a deterministic stand-in derived from the bytes so the distributed
    plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires PIL/libvips — not available in this "
            "environment; pass fake=True for the deterministic stand-in"
        )
    lengths = payloads.map(len)
    # header as the first CHARACTER's codepoint (UTF-8 decode), not the
    # first raw byte: byte 0 of a multi-byte char is encoding-dependent
    # (0xC3 for 'é') while the codepoint (233) is what SQL engines' ascii()
    # computes — keeps the oracle engine-agnostic for non-ASCII payloads
    def _first_codepoint(b) -> int:
        s = bytes(b).decode("utf-8", errors="ignore")  # decode once per row
        return ord(s[0]) if s else 0

    first = payloads.map(_first_codepoint)
    return pd.DataFrame(
        {
            "payload_bytes": lengths.astype("int64"),
            "header_byte": first.astype("int64"),
            # fake dims: deterministic function of the payload
            "width": (lengths % 640).astype("int64"),
            "height": (first.astype("int64") * 3 % 480),
        }
    )


def extract_metadata(df: DataFrame, *, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas metadata extraction over the binary payload.

    Arrow-batched; only (id, payload) reach Python — Spark prunes all other
    columns. Output is the typed metadata table."""
    pruned = df.select(id_col, "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decode_image_batch(pdf["payload"], fake=True)
            meta.insert(0, "doc_id", pdf[id_col].astype("int64").to_numpy())
            yield meta

    return pruned.mapInPandas(gen, schema=METADATA_SCHEMA)


RESIZED_SCHEMA = "doc_id long, payload binary, out_width long, out_height long"


def resize_images(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    width: int = 224,
    height: int = 224,
    fake: bool = False,
) -> DataFrame:
    """Resize image payloads to (width, height) via mapInPandas.

    STUB codec (no PIL here): ``fake=True`` emits a deterministic
    truncated/padded byte payload of width*height bytes so the Arrow batch
    shape, schema, and pruning are exercised end-to-end; the real decoder
    drops in by replacing the inner function only."""

    def resize_batch(payloads: pd.Series) -> pd.Series:
        if not fake:
            raise NotImplementedError(
                "image resize requires PIL/libvips — pass fake=True for the "
                "deterministic stand-in"
            )
        target = width * height
        return payloads.map(
            lambda b: bytes(b[:target]).ljust(target, b"\0")
        )

    pruned = df.select(id_col, "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": resize_batch(pdf["payload"]),
                    "out_width": width,
                    "out_height": height,
                }
            )

    return pruned.mapInPandas(gen, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx long, frame binary"


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    every_n_bytes: int = 64,
    max_frames: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Sample 'frames' from a video payload — a 1→N mapInPandas expansion
    (the multimodal analogue of explode, but batched through Arrow).

    STUB codec: with ``fake=True`` each frame is a fixed-stride byte slice;
    a real implementation swaps in ffmpeg keyframe extraction with the
    exact same batch contract (one output row per sampled frame)."""

    pruned = df.select(id_col, "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "frame sampling requires ffmpeg — pass fake=True for the "
                "deterministic stand-in"
            )
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, b in zip(pdf[id_col].astype("int64"), pdf["payload"]):
                for j in range(min(max_frames, max(len(b) // every_n_bytes, 0))):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(bytes(b[j * every_n_bytes:(j + 1) * every_n_bytes]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return pruned.mapInPandas(gen, schema=FRAMES_SCHEMA)
