"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as binary columns; per-modality
work (decode, resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` stages so payload bytes never round-trip through per-row
Python. The decode itself is STUBBED — the media libraries (PIL, librosa,
av) are not in this container — behind ``decode_payload``, which raises
``NotImplementedError``; ``_fake_decode`` is the deterministic stand-in
that keeps every piece of Spark-side plumbing (schema, batch shape,
partitioning) real and testable.

Scale notes (100 TB of media):
* payloads stay columnar (parquet binary → Arrow buffers → pandas bytes
  objects); the mapInPandas stage is embarrassingly parallel, no shuffle;
* metadata-only consumers never touch payload bytes: select the metadata
  columns and parquet column pruning skips the binary chunks entirely;
* batch size is governed by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — lower it for large payloads so a batch fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("modality", T.StringType()),
    ]
)

_MODALITIES = ("image", "audio", "video")


def decode_payload(payload: bytes, modality: str) -> dict:
    """Real media decode — requires PIL/librosa/av, absent here."""
    raise NotImplementedError(
        "media decode requires PIL/librosa/av, which are not installed in "
        "this container; the pipeline uses _fake_decode as a deterministic "
        "stand-in (same schema, same batch shape)"
    )


def _fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic fake of a decoded frame's (width, height)."""
    n = len(payload)
    return n % 640 + 1, n % 480 + 1


def multimodal_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Extract typed metadata from opaque binary payloads via Arrow-batched
    mapInPandas: (doc_id, n_bytes, width, height, modality)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = pdf[payload_col]
            n_bytes = payloads.map(len).astype("int64")
            wh = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_bytes": n_bytes,
                    "width": pd.Series([w for w, _ in wh], dtype="int64"),
                    "height": pd.Series([h for _, h in wh], dtype="int64"),
                    "modality": [_MODALITIES[i % 3] for i in ids],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, META_SCHEMA)


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
    ]
)


def resize_stub(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Resize plumbing: same shape as a real resize stage (binary in →
    binary out + new dims); payload transform is a deterministic
    truncation fake in place of a pixel resample."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        budget = max(1, target_w * target_h // 8)
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": pdf[payload_col].map(lambda p: bytes(p)[:budget]),
                    "width": pd.Series([target_w] * len(pdf), dtype="int64"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(resize, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def frame_sample_stub(
    df: DataFrame,
    n_frames: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Video frame-sampling plumbing (1 row in → n rows out, the real
    fan-out shape): deterministic byte-slice fake in place of an av
    keyframe decode."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload)
                step = max(1, len(raw) // max(n_frames, 1))
                for i in range(n_frames):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(raw[i * step : i * step + step])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(sample, FRAME_SCHEMA)
