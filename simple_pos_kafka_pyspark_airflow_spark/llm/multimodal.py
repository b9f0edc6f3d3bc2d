"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (north-star requirement): image/audio/video payloads live in a
``binary`` column next to a typed metadata struct; decode / feature
extraction / resize / frame-sampling run as **Arrow-batched Pandas UDFs
over mapInPandas** so each Python worker touches a columnar batch, never a
row. The decode itself is STUBBED — codec libraries are not in this
container — but the Spark-side plumbing (schema, batch iteration,
partitioning, UDF signatures) is real and tested; swap `_decode_stub` for
a PIL/ffmpeg call in production.

Scale: payloads dominate storage, so the asset table is partitioned by
(modality, size band) and feature extraction is a map-only pass — no
shuffle at all until features aggregate. Keep batches small
(``spark.sql.execution.arrow.maxRecordsPerBatch``) so a batch of 10 MB
videos fits the Python worker heap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every binary payload.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("payload_sha", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_stub(payload: bytes, modality: str) -> list[float]:
    """Deterministic fake decoder: 8 'features' derived from payload bytes.

    Production swap-point: image → PIL decode + resize + channel means;
    audio → frame RMS; video → frame-sample + per-frame image path. Those
    libs are absent here, so this stub keeps the pipeline shape testable
    while making the substitution obvious.
    """
    if payload is None:
        raise NotImplementedError("real decoders (PIL/ffmpeg) not available in this build")
    n = len(payload)
    window = max(1, n // 8)
    return [
        float(sum(payload[i * window : (i + 1) * window]) % 997) / 997.0 for i in range(8)
    ]


def extract_features(assets: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over asset batches.

    Arrow moves the binary column to Python in columnar batches; each batch
    yields a features frame. This is the canonical slow-path shape: the
    ONLY Python hop in the multimodal pipeline, explicitly batched.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in it:
            feats = [
                _decode_stub(p, m) if p is not None else None
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feature": feats,
                }
            )

    return assets.mapInPandas(batches, schema=FEATURE_SCHEMA)


def resize_assets(assets: DataFrame, max_bytes: int = 1024) -> DataFrame:
    """'Resize' pass: emit a bounded-size payload per asset plus updated
    metadata — the Spark shape of an image-resize stage (map-only, binary
    in / binary out, metadata struct rewritten).

    The transform itself is a STUB (truncate + marker suffix; production:
    PIL thumbnail / ffmpeg scale). What is real and load-bearing: the
    mapInPandas batch iteration over binary columns, the output schema
    matching ``ASSET_SCHEMA``, and the no-shuffle plan.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["payload"] = [
                (p[:max_bytes] if p is not None and len(p) > max_bytes else p)
                for p in pdf["payload"]
            ]
            out["meta"] = [
                {
                    "width": min(m["width"], max_bytes) if m and m.get("width") else None,
                    "height": m.get("height") if m else None,
                    "duration_ms": m.get("duration_ms") if m else None,
                }
                for m in pdf["meta"]
            ]
            yield out

    return assets.mapInPandas(batches, schema=ASSET_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def sample_frames(assets: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling: one row per (asset, frame) — the video analogue of
    explode. STUB decode (equal byte slices stand in for decoded frames;
    production: ffmpeg keyframe extraction), REAL shape: mapInPandas
    yielding a multiplied row count with its own schema, so downstream
    per-frame feature extraction parallelizes over frames, not videos —
    the difference between 1 task per 2-hour video and 1 per frame batch.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                step = max(1, len(p) // n_frames)
                for i in range(min(n_frames, len(p))):
                    ids.append(aid)
                    idxs.append(i)
                    frames.append(bytes(p[i * step : i * step + step]))
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame": frames})

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def synthesize_assets(documents: DataFrame, modality: str = "image") -> DataFrame:
    """Build a deterministic asset table from the documents corpus (text
    bytes stand in for media payloads) — exercises the real binary-column
    path end-to-end without codec libs."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(modality).alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.length("text").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
