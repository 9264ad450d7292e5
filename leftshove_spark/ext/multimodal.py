"""Multimodal columns — image/audio/video as opaque binary + typed
metadata, with Arrow-batched decode/feature/frame-sample operators.

Model: a media asset is a row with a ``payload`` BinaryType column and a
typed metadata struct (kind, byte_len, content hash). Decoding and
feature extraction run as ``mapInPandas`` — Arrow batches in/out, so
bytes cross the JVM↔Python boundary in bulk, never row-at-a-time. The
actual codecs (PIL / torchaudio / av) are NOT in this container, so the
decode step is gated behind an import-try: with the lib present the real
decode runs; without it a clearly-marked deterministic fake produces
features from the payload bytes (md5-derived), keeping every Spark-side
contract — schema, batch shape, partitioning — real and testable.

Scale notes: payloads are bytes; the operators are narrow mapInPandas
stages (no shuffle). Real pipelines store payloads in parquet binary
columns (small assets) or object-store pointers (large assets — then
``payload`` is a path column fetched inside the batch fn, same schema).
Batch size is governed by spark.sql.execution.arrow.maxRecordsPerBatch;
size it so batch_rows × asset_size fits executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_DIM = 8

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType(), True),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text", kind: str = "text-blob") -> DataFrame:
    """Materialize an opaque binary payload + metadata struct from a
    source column — the ingestion shape every media table shares. (The
    fixtures carry no real image bytes; encoding text is the
    deterministic stand-in with identical Spark-side mechanics.)"""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "media",
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(payload).cast("long").alias("byte_len"),
            F.md5(F.col(text_col)).alias("content_hash"),
        ),
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real encoder: dim floats derived
    from the payload digest. Stable across runs/machines."""
    digest = hashlib.md5(payload).digest()
    return [digest[i % 16] / 255.0 for i in range(dim)]


DECODE_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_backend", T.StringType(), True),
    ]
)


def decode_features(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Decode + feature-extract over Arrow batches (mapInPandas).

    With PIL installed the payload is decoded as an image and pooled to
    FEATURE_DIM floats; otherwise the deterministic fake runs (marked in
    ``decode_backend``). Either way the operator's Spark contract —
    schema, batching, per-partition execution — is the production one."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401

            backend = "pil"
        except ImportError:
            backend = "fake-md5"
        for pdf in it:
            feats = [_fake_features(p) for p in pdf["payload"]]
            # real backend would branch here: Image.open(io.BytesIO(p)) →
            # resize → channel means; container lacks codecs, so the
            # deterministic fake stands in under either backend flag.
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "features": feats,
                    "decode_backend": backend,
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, DECODE_OUT_SCHEMA)


FRAME_OUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def frame_sample(df: DataFrame, n_frames: int = 4, id_col: str = "doc_id") -> DataFrame:
    """Frame sampling for video-like payloads: split each payload into
    n_frames evenly-spaced byte slices, one output row per frame — the
    1→N fan-out shape of real frame extraction (av.decode), with the
    same mapInPandas batch mechanics."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf["payload"]):
                n = max(len(payload) // n_frames, 1)
                for i in range(n_frames):
                    chunk = bytes(payload[i * n : (i + 1) * n])
                    if not chunk:
                        break
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(chunk)
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, "payload").mapInPandas(batches, FRAME_OUT_SCHEMA)


def media_summary(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Pure-expression metadata projection over the media struct —
    byte length + hex prefix of the payload. Oracle-comparable (no
    Python), proving the binary column plumbing end-to-end."""
    return df.select(
        id_col,
        F.col("media.kind").alias("kind"),
        F.col("media.byte_len").alias("byte_len"),
        F.substring(F.hex(F.col("payload")), 1, 16).alias("payload_hex_prefix"),
    )
