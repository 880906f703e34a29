"""Multimodal column plumbing (north-star J5).

Images/audio/video ride through the engine as opaque ``binary``
payload columns plus a typed metadata struct; decode / feature
extraction runs as Arrow-batched pandas functions over ``mapInPandas``
so each partition streams through Python in columnar batches.

The actual media decode is STUBBED (image/audio libraries are not in
this container): ``decode_media`` raises NotImplementedError, and
``extract_features`` produces a deterministic fake feature vector from
the payload bytes. The Spark-side plumbing — schema, batch iteration,
partition behavior — is real and tested (tests/test_multimodal.py);
swapping the stub kernel for PIL/torchaudio is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

#: Metadata carried alongside every media payload.
MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_fake_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic stand-in payload: the utf-8 bytes of the text
    column plus a synthetic metadata struct. Exercises the real binary
    column path end-to-end without media files."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake").alias("format"),
            (F.length(F.col(text_col)) % 1024).cast("int").alias("width"),
            F.lit(256).alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("media_meta"),
    )


def decode_media(payload: bytes, media_meta) -> object:
    """STUB: real deployments plug PIL/av/torchaudio here."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in "
        "this environment; plug a real kernel into extract_features"
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic pseudo-features from the payload digest — keeps
    the distributed plumbing testable without a decoder."""
    digest = hashlib.sha256(payload).digest()
    return [
        int.from_bytes(digest[2 * i : 2 * i + 2], "big") / 65535.0
        for i in range(FEATURE_DIM)
    ]


def extract_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas.

    Each batch is processed columnar-side; only this stage crosses the
    JVM/Python boundary, and it streams (never materializes a
    partition). At 100 TB, payload size dominates: repartition by size
    beforehand and keep ``spark.sql.execution.arrow.maxRecordsPerBatch``
    tuned so a batch of payloads fits executor memory.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() for p in payloads
                    ],
                    "n_bytes": [len(p) for p in payloads],
                    "features": [_fake_features(p) for p in payloads],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META),
    ]
)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    meta_col: str = "media_meta",
) -> DataFrame:
    """Image resize over mapInPandas: STUB kernel (no image lib in this
    container) that truncates the payload deterministically in place of
    decoding+resampling, while carrying real metadata updates through
    the typed struct. Swap `_fake_resize` for a PIL kernel in
    production; the Spark-side contract (schema, batching, partition
    behavior) is identical."""

    def _fake_resize(payload: bytes) -> bytes:
        cap = max(16, (target_w * target_h) // 64)
        return bytes(payload[:cap])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for m in pdf[meta_col]:
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = target_w, target_h
                metas.append(m)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "payload": [_fake_resize(p) for p in pdf[payload_col]],
                    "media_meta": metas,
                }
            )

    return df.select(
        F.col(id_col), F.col(payload_col), F.col(meta_col)
    ).mapInPandas(kernel, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling plumbing (video -> frame rows): each payload
    yields one output row per sampled 'frame' (deterministic byte-window
    stand-in for a real decoder), exploding 1->N through mapInPandas —
    the same batch/row-fanout shape a real ffmpeg kernel needs."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, start in enumerate(
                    range(0, len(payload), every_n_bytes)
                ):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(bytes(payload[start : start + every_n_bytes]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        kernel, schema
    )
