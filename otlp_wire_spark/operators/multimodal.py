"""Multimodal column plumbing — image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched UDFs over mapInPandas.

The Spark-side machinery (schemas, batch shapes, partitioning, UDF
signatures) is real and tested; the actual media DECODE is stubbed behind
``decode_image_stub`` because no image/audio libraries exist in this
container — swap ``_decode_rgb`` for a real decoder (PIL/libvips) on a
real cluster and nothing else changes.

Scale notes: media bytes never leave the executor (mapInPandas streams
Arrow batches); feature extraction is a narrow map — zero shuffle; sizing
is governed by spark.sql.execution.arrow.maxRecordsPerBatch vs media size
(drop to ~100 rows/batch for MB-scale blobs).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("byte_count", T.LongType()),
        T.StructField("payload_fingerprint", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_error", T.StringType()),
    ]
)


def _decode_rgb(payload: bytes, width: int, height: int) -> list[float]:
    """STUB — deterministic fake 'decode → 4-dim feature'.

    Real deployment: decode with PIL/libvips, resize, pool to a feature
    vector. Here: a deterministic projection of the payload bytes so tests
    can pin exact values. Raises on empty payload like a real decoder.
    """
    if not payload:
        raise ValueError("empty payload")
    n = len(payload)
    sums = [0, 0, 0, 0]
    for i, b in enumerate(payload):
        sums[i & 3] += b
    return [float(s % 997) / 997.0 for s in sums] + [float(width * height % 101)]


def extract_media_features(df: DataFrame, rows_per_batch: int = 256) -> DataFrame:
    """mapInPandas feature extraction over opaque media blobs.

    Arrow-batched; per-row decode errors quarantine into ``decode_error``
    (same per-row error contract as the parse stage)."""
    from otlp_wire_spark.functions.fnv import fnv64a_numpy
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].tolist()
            fps = fnv64a_numpy(payloads).view(np.int64)
            feats, errs = [], []
            for p, m in zip(payloads, pdf["meta"]):
                try:
                    w = (m or {}).get("width") or 0
                    h = (m or {}).get("height") or 0
                    feats.append(_decode_rgb(p if p is not None else b"", w, h))
                    errs.append(None)
                except (ValueError, TypeError) as e:
                    feats.append(None)
                    errs.append(f"decode_error:{e}")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_count": [len(p) if p is not None else 0 for p in payloads],
                    "payload_fingerprint": fps,
                    "feature": feats,
                    "decode_error": errs,
                }
            )

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
        T.StructField("frame_fingerprint", T.LongType()),
    ]
)


def sample_frames(
    df: DataFrame, n_frames: int = 4, frame_size: int = 4
) -> DataFrame:
    """Frame sampling for video payloads — 1→N row explosion via
    mapInPandas (Arrow-batched; frames never pass through the driver).

    STUB decode: a real deployment hands the payload to a demuxer and
    yields decoded frames; here a 'frame' is the i-th ``frame_size``-byte
    slice of the payload (deterministic, so the DuckDB oracle reconstructs
    every frame and its FNV fingerprint from media_id in pure SQL). The
    Spark-side plumbing — filter by kind, batch iteration, row explosion,
    per-frame fingerprinting, output schema — is exactly what a real
    decoder drop-in would keep."""
    import numpy as np

    from otlp_wire_spark.functions.fnv import fnv64a_numpy

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(payload) if payload is not None else b""
                k = min(n_frames, len(p) // frame_size)
                for i in range(k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(p[i * frame_size : (i + 1) * frame_size])
            fps = fnv64a_numpy(frames).view(np.int64) if frames else []
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": pd.Series(frames, dtype=object),
                    "frame_fingerprint": pd.Series(fps, dtype="int64"),
                }
            )

    video = df.where(F.col("kind") == "video").select("media_id", "payload")
    return video.mapInPandas(gen, schema=FRAME_SCHEMA)


def generate_media(spark, n: int) -> DataFrame:
    """Deterministic media fixture: payload = struct-packed bytes of the id
    (binary, opaque); ~2% empty payloads to exercise decode errors."""
    idc = F.col("id")
    payload = F.when(idc % 47 == 0, F.lit(b""))
    payload = payload.otherwise(
        F.concat(
            F.encode(F.concat(F.lit("IMG"), idc.cast("string")), "UTF-8"),
            F.unhex(F.lpad(F.hex(idc * 2654435761), 16, "0")),
        )
    )
    return spark.range(n).select(
        idc.alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (idc % 3 + 1).cast("int"),
        ).alias("kind"),
        payload.alias("payload"),
        F.struct(
            ((idc % 16 + 1) * 64).cast("int").alias("width"),
            ((idc % 9 + 1) * 64).cast("int").alias("height"),
            F.lit("stub").alias("codec"),
        ).alias("meta"),
    )


__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "extract_media_features",
    "generate_media",
]
