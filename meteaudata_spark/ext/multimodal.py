"""Multimodal column plumbing ([EXT]): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The container has no decode libraries (PIL/librosa/av), so the decode
kernels are STUBS — ``decode_image`` raises ``NotImplementedError``
unless given the deterministic fake codec used in tests.  Everything
Spark-side is real and tested: schema contracts, batch iteration,
partition sizing, and the UDF signatures a production decode would
drop into.

Layout convention (one row per asset):

    asset_id BIGINT, modality STRING, payload BINARY,
    meta STRUCT<width INT, height INT, channels INT,
                sample_rate INT, n_frames INT, format STRING>
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("mean_byte", StringType()),
    ]
)

# deterministic fake codec: payload = "FAKE:" + repeated byte pattern.
# Real deployments replace _decode_payload with PIL / librosa / pyav.
FAKE_MAGIC = b"FAKE:"


def make_fake_assets(
    spark: SparkSession, n: int = 64, seed: int = 7
) -> DataFrame:
    """Deterministic synthetic asset table for tests/demos."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        modality = ["image", "audio", "video"][i % 3]
        body = bytes(rng.integers(0, 256, size=128 + (i % 5) * 64, dtype=np.uint8))
        meta = {
            "width": 32 + (i % 4) * 16 if modality != "audio" else None,
            "height": 32 + (i % 3) * 16 if modality != "audio" else None,
            "channels": 3 if modality == "image" else (1 if modality == "audio" else None),
            "sample_rate": 16000 if modality == "audio" else None,
            "n_frames": (i % 7) + 1 if modality == "video" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[modality],
        }
        rows.append((i, modality, FAKE_MAGIC + body, meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def _decode_payload(payload: bytes) -> np.ndarray:
    """STUB decode: real image/audio decoding is not available in this
    container.  The fake codec (payload prefixed with ``FAKE:``)
    decodes to the raw byte array; anything else raises."""
    if payload.startswith(FAKE_MAGIC):
        return np.frombuffer(payload[len(FAKE_MAGIC):], dtype=np.uint8)
    raise NotImplementedError(
        "Real codec support (PIL/librosa/pyav) is not installed in this "
        "environment; only the deterministic FAKE codec is available."
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams Arrow record batches through Python; each
    batch is decoded and reduced vectorized (numpy), never row-at-a-
    time.  At scale, batch size is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` and partitioning
    of the asset table (size partitions so a batch of decoded frames
    fits executor memory)."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [_decode_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() for p in pdf["payload"]
                    ],
                    "mean_byte": [f"{d.mean():.4f}" for d in decoded],
                }
            )

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: demonstrates the transform signature (binary in,
    binary out, metadata rewritten).  The fake codec 'resizes' by
    truncating/padding the byte stream to width·height; a real codec
    would decode → resample → re-encode."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in it:
            out_payload = []
            for p in pdf["payload"]:
                body = _decode_payload(bytes(p))
                resized = np.resize(body, target)
                out_payload.append(FAKE_MAGIC + resized.tobytes())
            pdf = pdf.copy()
            pdf["payload"] = out_payload
            meta = pd.DataFrame(list(pdf["meta"]))
            meta["width"] = width
            meta["height"] = height
            pdf["meta"] = meta.to_dict("records")
            yield pdf

    return assets.mapInPandas(batches, ASSET_SCHEMA)


def sample_video_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """STUB frame sampler: emits one row per kept frame for video
    assets (frame payload faked as a slice of the source bytes).
    Demonstrates the 1→N explode shape of frame extraction."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_payload", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"asset_id": [], "frame_no": [], "frame_payload": []}
            for _, row in pdf.iterrows():
                if row["modality"] != "video":
                    continue
                n_frames = (row["meta"]["n_frames"] or 1)
                body = _decode_payload(bytes(row["payload"]))
                chunk = max(1, len(body) // n_frames)
                for f in range(0, n_frames, every_n):
                    frame = body[f * chunk : (f + 1) * chunk]
                    rows["asset_id"].append(row["asset_id"])
                    rows["frame_no"].append(f)
                    rows["frame_payload"].append(FAKE_MAGIC + frame.tobytes())
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, out_schema)


def embed_assets(assets: DataFrame, dim: int = 64) -> DataFrame:
    """STUB embedding: binary payload → ``array<float>`` of length
    ``dim`` (deterministic byte-histogram features; a real deployment
    swaps in a CLIP/CLAP-style encoder).  Output schema matches the
    ``embeddings`` table — (vec_id, label, embedding) — so the result
    feeds straight into the similarity stack (``lsh_bucketize``,
    IVF, brute top-k): the multimodal → embedding → ANN-index
    pipeline with every Spark-side stage real."""
    from pyspark.sql.types import ArrayType, FloatType

    out_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("label", StringType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            embs = []
            for p in pdf["payload"]:
                body = _decode_payload(bytes(p)).astype(np.float64)
                # byte histogram folded to `dim` buckets, L2-normalized:
                # deterministic, content-sensitive, unit-scale
                hist = np.bincount(
                    (body % dim).astype(np.int64), minlength=dim
                ).astype(np.float64)
                nrm = np.sqrt((hist * hist).sum()) or 1.0
                embs.append((hist / nrm).astype(np.float32))
            yield pd.DataFrame(
                {
                    "vec_id": pdf["asset_id"],
                    "label": pdf["modality"],
                    "embedding": embs,
                }
            )

    return assets.mapInPandas(batches, out_schema)
