"""Multimodal column plumbing ([EXT]): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

Executable codecs (pure numpy + stdlib, no PIL/librosa/pyav needed):

* **PPM (P6)** images — ``encode_ppm`` / ``decode_image`` parse the
  real binary PPM format (header + raw RGB24);
* **PNG** images — ``encode_png`` / ``decode_png`` (stdlib zlib,
  CRC-verified chunks, all five scanline filters);
* **JPEG** images — ``ext/jpeg.py`` baseline sequential codec
  (huffman + DCT in numpy, 4:4:4/4:2:0, restart markers);
* **WAV (PCM16)** audio — ``encode_wav`` / ``decode_audio`` write and
  walk real RIFF chunks;
* **AVI (MJPEG/DIB)** video — ``ext/avi.py`` real RIFF container for
  frame sampling.

Only formats needing external codec libraries (MP4/H.264, …) raise
``NotImplementedError`` from ``_decode_payload``; the deterministic
FAKE codec stands in for tests of the streaming plumbing.

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

from meteaudata_spark.sources.tables import load_table

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

def _spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive parallelism floor for compute-heavy Python-map
    chains (r14 optimization, guide §2.5 input skew / §4).

    The synthesized-asset fixtures feed per-row codec work (encode +
    decode + numpy feature extraction) into ``mapInPandas``; their
    upstream is a SMALL parquet scan whose file has a single row
    group, so Spark plans ONE input split and the entire Python stage
    runs on one core while the other 31 idle.  Repartition round-robin
    to the session's default parallelism — but ONLY when the scan
    yields fewer partitions, so on a real deployment (thousands of
    input splits) this is a no-op and no shuffle is ever added.  The
    shuffled bytes here are the slim pre-synthesis rows (ids +
    digests), never the payloads."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


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


def encode_ppm(arr: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 array as a binary PPM (P6) image."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Strict binary-PPM (P6) parser → ``(h, w, 3)`` uint8 array."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header = magic + width + height + maxval, whitespace-separated,
    # followed by exactly one whitespace byte before the raster
    fields: list[int] = []
    pos = 2
    end = len(payload)
    while len(fields) < 3:
        while pos < end and payload[pos : pos + 1].isspace():
            pos += 1
        start = pos
        while pos < end and not payload[pos : pos + 1].isspace():
            pos += 1
        if pos == start or pos >= end:
            raise ValueError("truncated PPM header")
        fields.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 supported, got {maxval}")
    if w <= 0 or h <= 0 or end < pos + w * h * 3:
        raise ValueError("truncated PPM raster")
    raster = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return raster.reshape(h, w, 3)


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an ``(h, w, 3)`` uint8 array as a real PNG (8-bit RGB,
    non-interlaced, filter 0 scanlines, stdlib-zlib IDAT).  Readable
    by any PNG viewer; no external imaging library involved."""
    import struct
    import zlib

    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (h, w, 3) uint8, got {arr.shape} {arr.dtype}")
    h, w, _ = arr.shape

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 9))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Pure-stdlib PNG decoder → ``(h, w, 3)`` uint8.

    Walks real chunks with CRC verification, inflates the IDAT stream,
    and reverses all five scanline filters (None/Sub/Up/Average/
    Paeth) — so externally-produced 8-bit RGB non-interlaced PNGs
    decode too, not just ``encode_png`` output.  Palette/alpha/16-bit/
    interlaced variants raise ValueError."""
    import struct
    import zlib

    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, end = len(PNG_MAGIC), len(payload)
    w = h = None
    idat = bytearray()
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + size]
        if len(data) != size or pos + 12 + size > end:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(
            ">I", payload[pos + 8 + size : pos + 12 + size]
        )
        if zlib.crc32(typ + data) != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, ctype, comp, filt, ilace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "only 8-bit RGB non-interlaced PNG supported, got "
                    f"depth={depth} color={ctype} interlace={ilace}"
                )
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + size
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG raster size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).copy()
        if ftype == 0:
            pass
        elif ftype == 2:  # Up
            line += prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            ln = line.astype(np.int64)
            pv = prev.astype(np.int64)
            for i in range(stride):
                left = ln[i - 3] if i >= 3 else 0
                if ftype == 1:
                    ln[i] = (ln[i] + left) & 0xFF
                elif ftype == 3:
                    ln[i] = (ln[i] + (left + pv[i]) // 2) & 0xFF
                else:
                    up = pv[i]
                    ul = pv[i - 3] if i >= 3 else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (
                        up if pb <= pc else ul
                    )
                    ln[i] = (ln[i] + pred) & 0xFF
            line = ln.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = line
        prev = out[y]
    return out.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode mono int16 samples as a PCM16 WAV (RIFF) byte string."""
    import struct

    if samples.dtype != np.int16:
        raise ValueError(f"expected int16 samples, got {samples.dtype}")
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte-rate, block-align, bits
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Walk real RIFF chunks → (mono int16 samples, sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        chunk = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", chunk[:8])
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only mono PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(chunk, dtype=np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def _decode_payload(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes: real PPM / PNG / JPEG / WAV / MP4
    parsers, the deterministic FAKE codec for plumbing tests, and a
    clear ``NotImplementedError`` for bitstreams that need external
    decoder libraries this container doesn't ship (H.264/H.265)."""
    if payload.startswith(FAKE_MAGIC):
        return np.frombuffer(payload[len(FAKE_MAGIC):], dtype=np.uint8)
    if payload.startswith(b"P6"):
        return decode_image(payload).reshape(-1)
    if payload.startswith(PNG_MAGIC):
        return decode_png(payload).reshape(-1)
    if payload[:2] == b"\xff\xd8":
        from meteaudata_spark.ext.jpeg import decode_jpeg

        return decode_jpeg(payload).reshape(-1)
    if payload[:4] == b"RIFF":
        return decode_audio(payload)[0]
    if payload[4:8] == b"ftyp":
        from meteaudata_spark.ext.mp4 import decode_mp4

        frames, _fps = decode_mp4(payload)
        return np.concatenate([f.reshape(-1) for f in frames])
    raise NotImplementedError(
        "No decoder for this format: H.264/H.265 bitstreams need "
        "external libs this environment doesn't ship; PPM/PNG/JPEG/WAV/"
        "MJPEG-AVI/MJPEG-MP4/FAKE payloads are the decodable formats."
    )


def _detect_format(payload: bytes) -> str:
    """Magic-byte sniff shared by the decoders and the health triage."""
    if payload.startswith(FAKE_MAGIC):
        return "fake"
    if payload.startswith(b"P6"):
        return "ppm"
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if payload[:4] == b"RIFF":
        return "wav"
    if payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:4] in (b"\x00\x00\x00\x01", b"\x00\x00\x01\x67"):
        return "h264-annexb"
    return "unknown"


DECODE_HEALTH_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("detected_format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("decodable", StringType()),  # 'ok' | 'error'
        StructField("error", StringType()),
    ]
)


def decode_health(assets: DataFrame) -> DataFrame:
    """Corpus triage: classify every payload by magic bytes and
    ATTEMPT the decode, reporting ok/error per asset instead of
    failing the job — the pass a real crawl corpus needs before any
    expensive feature extraction, because undecodable payloads
    (unsupported codecs, truncation, bit rot) are a fact of 100 TB
    inputs.  Quarantine = ``filter(decodable = 'error')``."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "modality", "detected_format", "n_bytes",
                "decodable", "error",
            )}
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                p = bytes(payload)
                rows["asset_id"].append(int(asset_id))
                rows["modality"].append(modality)
                rows["detected_format"].append(_detect_format(p))
                rows["n_bytes"].append(len(p))
                try:
                    _decode_payload(p)
                    rows["decodable"].append("ok")
                    rows["error"].append(None)
                except Exception as exc:  # noqa: BLE001 — triage, not control flow
                    rows["decodable"].append("error")
                    rows["error"].append(f"{type(exc).__name__}: {exc}"[:200])
            yield pd.DataFrame(rows)

    return assets.select("asset_id", "modality", "payload").mapInPandas(
        batches, DECODE_HEALTH_SCHEMA
    )


def extract_features(assets: DataFrame, decode_errors: str = "raise") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` streams Arrow record batches through Python; each
    batch is decoded and reduced vectorized (numpy), never row-at-a-
    time.  At scale, batch size is governed by
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` and partitioning
    of the asset table (size partitions so a batch of decoded frames
    fits executor memory).

    ``decode_errors``: ``'raise'`` fails the job on the first
    undecodable payload (the debugging default); ``'skip'`` drops such
    assets from the output — pair with ``decode_health`` to account
    for what was skipped (silent-cap rule: the skip set is always
    recoverable as the health report's error rows)."""
    if decode_errors not in ("raise", "skip"):
        raise ValueError("decode_errors must be 'raise' or 'skip'")
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "modality", "n_bytes", "payload_sha", "mean_byte",
            )}
            for asset_id, modality, payload in zip(
                pdf["asset_id"], pdf["modality"], pdf["payload"]
            ):
                p = bytes(payload)
                try:
                    d = _decode_payload(p)
                except Exception:
                    if decode_errors == "raise":
                        raise
                    continue
                rows["asset_id"].append(int(asset_id))
                rows["modality"].append(modality)
                rows["n_bytes"].append(len(p))
                rows["payload_sha"].append(hashlib.sha256(p).hexdigest())
                rows["mean_byte"].append(f"{d.mean():.4f}")
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, FEATURE_SCHEMA)


def _decode_rgb(payload: bytes):
    """Decode an image payload to ``(h, w, 3)`` uint8 if it is one of
    the real image formats, else None."""
    if payload.startswith(b"P6"):
        return decode_image(payload)
    if payload.startswith(PNG_MAGIC):
        return decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from meteaudata_spark.ext.jpeg import decode_jpeg

        return decode_jpeg(payload)
    return None


def _resize_nn(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via integer index maps (pure numpy)."""
    h, w, _ = arr.shape
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return arr[ys][:, xs]


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize image payloads to ``width × height`` (binary in, binary
    out, metadata rewritten).

    Real image formats (PPM/PNG/JPEG) decode → nearest-neighbor
    resample → re-encode IN THE SAME FORMAT, all executor-side in the
    Arrow batch.  FAKE-codec payloads keep the byte-truncation stub so
    plumbing tests stay cheap.  Audio/video payloads pass through the
    fake path unchanged in semantics (they carry no raster)."""
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from meteaudata_spark.ext.jpeg import encode_jpeg

        target = width * height
        for pdf in it:
            out_payload = []
            for p in pdf["payload"]:
                p = bytes(p)
                rgb = _decode_rgb(p)
                if rgb is not None:
                    resized = _resize_nn(rgb, width, height)
                    if p.startswith(b"P6"):
                        out_payload.append(encode_ppm(resized))
                    elif p.startswith(PNG_MAGIC):
                        out_payload.append(encode_png(resized))
                    else:
                        out_payload.append(encode_jpeg(resized))
                    continue
                body = _decode_payload(p)
                out_payload.append(
                    FAKE_MAGIC + np.resize(body, target).tobytes()
                )
            pdf = pdf.copy()
            pdf["payload"] = out_payload
            meta = pd.DataFrame(list(pdf["meta"]))
            meta["width"] = width
            meta["height"] = height
            pdf["meta"] = meta.to_dict("records")
            yield pdf

    return assets.mapInPandas(batches, ASSET_SCHEMA)


def sample_video_frames(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampler: one output row per kept frame per video asset
    (the 1→N explode shape of frame extraction).

    RIFF/AVI and ISO-BMFF/MP4 payloads go through the REAL container
    parsers (``ext/avi.py`` — MJPEG or DIB frames; ``ext/mp4.py`` —
    MJPEG sample tables) and each kept frame is re-emitted as a
    standalone baseline JPEG, decodable by ``_decode_payload``
    downstream.  FAKE-codec payloads keep the stub slicing path so
    plumbing tests stay cheap."""
    out_schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame_payload", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from meteaudata_spark.ext import avi as avimod
        from meteaudata_spark.ext.jpeg import encode_jpeg

        for pdf in it:
            rows = {"asset_id": [], "frame_no": [], "frame_payload": []}
            for _, row in pdf.iterrows():
                if row["modality"] != "video":
                    continue
                payload = bytes(row["payload"])
                container = None
                if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
                    container = avimod.decode_avi
                elif payload[4:8] == b"ftyp":
                    from meteaudata_spark.ext import mp4 as mp4mod

                    container = mp4mod.decode_mp4
                if container is not None:
                    frames, _fps = container(payload)
                    for f in range(0, len(frames), every_n):
                        rows["asset_id"].append(row["asset_id"])
                        rows["frame_no"].append(f)
                        rows["frame_payload"].append(encode_jpeg(frames[f]))
                    continue
                n_frames = (row["meta"]["n_frames"] or 1)
                body = _decode_payload(payload)
                chunk = max(1, len(body) // n_frames)
                for f in range(0, n_frames, every_n):
                    frame = body[f * chunk : (f + 1) * chunk]
                    rows["asset_id"].append(row["asset_id"])
                    rows["frame_no"].append(f)
                    rows["frame_payload"].append(FAKE_MAGIC + frame.tobytes())
            yield pd.DataFrame(rows)

    return assets.mapInPandas(batches, out_schema)


def mm_codec_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal gate query over REAL codec bytes.

    Builds one asset per document deterministically from
    ``md5(text)`` — even doc_ids become a 4×4 RGB PPM whose raster
    cycles the 16 digest bytes (×3 exactly), odd doc_ids a 16-sample
    PCM16 WAV with ``sample = (byte − 128)·256`` — then runs the real
    ``encode_ppm``/``encode_wav`` → ``decode_image``/``decode_audio``
    byte round-trip inside Arrow-batched ``mapInPandas`` and reduces
    each decoded asset to exact-integer stats.  Because encode→decode
    is lossless, the DuckDB oracle reproduces the stats straight from
    the digest hex — so the codec path itself is value-verified: any
    header/layout/endianness bug breaks the match.

    Scale shape: narrow map end to end (digest in the JVM, codec work
    Arrow-batched, no shuffle at all until the driver-side sort the
    oracle comparison imposes)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("digest")
    )

    out_schema = (
        "asset_id bigint, modality string, width int, height int, "
        "n_samples int, sample_rate int, payload_bytes bigint, "
        "value_sum bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "modality", "width", "height", "n_samples",
                "sample_rate", "payload_bytes", "value_sum",
            )}
            for doc_id, digest in zip(pdf["doc_id"], pdf["digest"]):
                raw = bytes.fromhex(digest)
                if doc_id % 2 == 0:
                    arr = (
                        np.frombuffer(raw * 3, dtype=np.uint8).reshape(4, 4, 3)
                    )
                    payload = encode_ppm(arr)
                    decoded = decode_image(payload)
                    rows["modality"].append("image")
                    rows["width"].append(decoded.shape[1])
                    rows["height"].append(decoded.shape[0])
                    rows["n_samples"].append(None)
                    rows["sample_rate"].append(None)
                    rows["value_sum"].append(int(decoded.astype(np.int64).sum()))
                else:
                    samples = (
                        np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                        - 128
                    ) * 256
                    payload = encode_wav(samples.astype(np.int16), 8000)
                    dec_samples, dec_rate = decode_audio(payload)
                    rows["modality"].append("audio")
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["n_samples"].append(len(dec_samples))
                    rows["sample_rate"].append(dec_rate)
                    rows["value_sum"].append(int(dec_samples.astype(np.int64).sum()))
                rows["asset_id"].append(doc_id)
                rows["payload_bytes"].append(len(payload))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(batches, out_schema)


# Oracle: reproduce the stats from the md5 hex directly.  PPM payload
# = 11-byte header ("P6\n4 4\n255\n") + 48 raster bytes = 59; WAV
# payload = 44 bytes of RIFF/fmt/data headers + 32 sample bytes = 76.
# value_sum: image = 3 × Σ digest bytes; audio = Σ (byte − 128)·256.
MM_CODEC_STATS_SQL = """
WITH b AS (
  SELECT doc_id, md5(text) AS m FROM documents
),
d AS (
  SELECT doc_id,
         list_transform(generate_series(1, 16),
                        i -> CAST(CONCAT('0x', SUBSTR(m, 2*i - 1, 2)) AS BIGINT)
         ) AS bytes
  FROM b
)
SELECT doc_id AS asset_id,
       CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS modality,
       CASE WHEN doc_id % 2 = 0 THEN 4 END AS width,
       CASE WHEN doc_id % 2 = 0 THEN 4 END AS height,
       CASE WHEN doc_id % 2 = 1 THEN 16 END AS n_samples,
       CASE WHEN doc_id % 2 = 1 THEN 8000 END AS sample_rate,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 59 ELSE 76 END AS BIGINT) AS payload_bytes,
       CAST(CASE WHEN doc_id % 2 = 0
            THEN 3 * list_aggregate(bytes, 'sum')
            ELSE list_aggregate(list_transform(bytes, x -> (x - 128) * 256), 'sum')
       END AS BIGINT) AS value_sum
FROM d
ORDER BY asset_id
"""


def mm_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PNG gate query: every document becomes a real 4×4 RGB PNG
    (raster = the 16 ``md5(text)`` digest bytes cycled ×3), round-
    tripped ``encode_png`` → ``decode_png`` inside Arrow-batched
    ``mapInPandas``, reduced to exact-integer pixel stats.

    The compressed IDAT size is zlib-version-dependent, so unlike
    ``mm_codec_stats`` no payload-length column is exposed; instead
    the decode path itself (chunk walk, CRC verify, inflate, filter
    reversal) guards the bytes, and the DuckDB oracle reproduces the
    pixel stats straight from the digest hex — a chunk-layout, CRC,
    or filter bug breaks the value match.

    Scale shape: narrow map end to end, no shuffle."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.md5("text").alias("digest")
    )

    out_schema = (
        "asset_id bigint, width int, height int, value_sum bigint, "
        "value_min int, value_max int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {k: [] for k in (
                "asset_id", "width", "height", "value_sum",
                "value_min", "value_max",
            )}
            for doc_id, digest in zip(pdf["doc_id"], pdf["digest"]):
                raw = bytes.fromhex(digest)
                arr = np.frombuffer(raw * 3, dtype=np.uint8).reshape(4, 4, 3)
                decoded = decode_png(encode_png(arr))
                rows["asset_id"].append(doc_id)
                rows["width"].append(decoded.shape[1])
                rows["height"].append(decoded.shape[0])
                rows["value_sum"].append(int(decoded.astype(np.int64).sum()))
                rows["value_min"].append(int(decoded.min()))
                rows["value_max"].append(int(decoded.max()))
            yield pd.DataFrame(rows)

    return docs.mapInPandas(batches, out_schema)


MM_PNG_STATS_SQL = """
WITH d AS (
  SELECT doc_id,
         list_transform(generate_series(1, 16),
                        i -> CAST(CONCAT('0x', SUBSTR(md5(text), 2*i - 1, 2)) AS BIGINT)
         ) AS bytes
  FROM documents
)
SELECT doc_id AS asset_id,
       4 AS width,
       4 AS height,
       CAST(3 * list_aggregate(bytes, 'sum') AS BIGINT) AS value_sum,
       CAST(list_aggregate(bytes, 'min') AS INT) AS value_min,
       CAST(list_aggregate(bytes, 'max') AS INT) AS value_max
FROM d
ORDER BY asset_id
"""


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


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_frames", LongType()),
        StructField("rms_micros", LongType()),
        StructField("peak", IntegerType()),
        StructField("zcr_micros", LongType()),
    ]
)


def audio_features(
    assets: DataFrame, frame_ms: int = 25, hop_ms: int = 10
) -> DataFrame:
    """Frame-level audio feature extraction over PCM16 WAV payloads —
    the FEATURE step of the audio pipeline, after ``decode_audio``:
    per asset, duration, frame count, mean frame RMS (full-scale
    micro-units, 1.0 = int16 max), absolute peak, and mean
    zero-crossing rate (crossings per sample, micro-units — a pure
    tone at f Hz reads ≈ 2f/rate).

    Vectorized end-to-end: the decoded sample vector frames through a
    zero-copy stride view, RMS/ZCR reduce per frame in one numpy pass.
    Non-audio payloads are skipped (the mapInPandas batch just emits
    fewer rows).  Deterministic: int16 in, fixed expression shapes,
    micro-unit rounding out."""
    if frame_ms <= 0 or hop_ms <= 0:
        raise ValueError("frame_ms and hop_ms must be positive")
    return assets.select("asset_id", "payload").mapInPandas(
        _audio_features_gen(frame_ms, hop_ms), AUDIO_FEATURE_SCHEMA
    )


def _audio_features_gen(frame_ms: int, hop_ms: int):
    """mapInPandas generator behind ``audio_features`` — factored out
    so gate fixtures can compose it with the synthesis generator in
    ONE Python pass (guide §4.1: the payload bytes then never cross
    the JVM↔Python boundary at all)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r14 optimization (guide §4.2): framing + reductions run once
        # per same-shape ROW GROUP instead of ~10 numpy calls per row.
        # Per-row math is unchanged — each frame's mean reduces the
        # identical contiguous float64 slice, the frame means average
        # along the frame axis exactly as before, and the final
        # rounding is the same half-even ``round`` — so rms/peak/zcr
        # micros are bit-identical.  Decode stays per row (RIFF walk).
        for pdf in it:
            decoded: dict[tuple, list] = {}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                p = bytes(payload)
                if not p.startswith(b"RIFF"):
                    continue
                samples, rate = decode_audio(p)
                decoded.setdefault((len(samples), rate), []).append(
                    (int(asset_id), samples)
                )
            rows = {k: [] for k in (
                "asset_id", "sample_rate", "n_samples", "duration_ms",
                "n_frames", "rms_micros", "peak", "zcr_micros",
            )}
            for (n, rate), grp in decoded.items():
                flen = max(1, rate * frame_ms // 1000)
                hop = max(1, rate * hop_ms // 1000)
                S = np.stack([g[1] for g in grp])  # (rows, n) int16
                X = S.astype(np.float64)
                if n >= flen:
                    n_frames = 1 + (n - flen) // hop
                    idx = (
                        np.arange(flen)[None, :]
                        + hop * np.arange(n_frames)[:, None]
                    )
                    frames = X[:, idx]  # (rows, n_frames, flen)
                    rms_v = (
                        np.mean(np.sqrt(np.mean(frames**2, axis=2)), axis=1)
                        / 32767.0
                    )
                else:
                    n_frames = 1
                    rms_v = np.sqrt(np.mean(X**2, axis=1)) / 32767.0
                signs = np.signbit(X)
                if n > 1:
                    zcr_v = (
                        np.count_nonzero(
                            signs[:, 1:] != signs[:, :-1], axis=1
                        ).astype(np.float64)
                        / n
                    )
                else:
                    zcr_v = np.zeros(len(grp))
                peak_v = (
                    np.max(np.abs(S), axis=1)
                    if n
                    else np.zeros(len(grp), dtype=S.dtype)
                )
                dur = round(n * 1000 / rate)
                for i, (asset_id, _) in enumerate(grp):
                    rows["asset_id"].append(asset_id)
                    rows["sample_rate"].append(int(rate))
                    rows["n_samples"].append(n)
                    rows["duration_ms"].append(dur)
                    rows["n_frames"].append(int(n_frames))
                    rows["rms_micros"].append(round(float(rms_v[i]) * 1_000_000))
                    rows["peak"].append(int(peak_v[i]))
                    rows["zcr_micros"].append(round(float(zcr_v[i]) * 1_000_000))
            yield pd.DataFrame(rows)

    return batches


def image_ahash_blocks(assets: DataFrame) -> DataFrame:
    """64-bit average-hash (aHash) of each image payload, emitted as
    four 16-bit block integers ``h0..h3`` — the perceptual fingerprint
    that makes IMAGE near-dup mining a join problem.

    The hash: decode the payload with the real codec dispatch, take
    the integer channel-sum luma of each pixel of the 8×8 raster, and
    set bit i iff ``64·luma_i > Σ luma`` (the all-integer form of
    "above the mean", exact on both engines).  Emitting 16-bit blocks
    instead of one 64-bit word keeps every value far from signed
    overflow AND doubles as the SimHash-style pigeonhole key: two
    hashes within Hamming distance 3 MUST agree on at least one of
    the 4 blocks, so candidate pairs come from a keyed equi-join on
    (block_idx, block_value) — never an all-pairs scan.

    Input: (asset_id bigint, payload binary).  Decode runs inside
    Arrow-batched ``mapInPandas`` (shuffle-free narrow map)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "h0": [], "h1": [], "h2": [], "h3": []}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = decode_image(bytes(payload))
                if arr.ndim == 3:
                    luma = arr.astype(np.int64).sum(axis=2).reshape(-1)
                else:
                    luma = arr.astype(np.int64).reshape(-1) * 3
                total = int(luma.sum())
                bits = (64 * luma > total).astype(np.int64)
                out["asset_id"].append(asset_id)
                for k in range(4):
                    blk = int(
                        (bits[16 * k : 16 * k + 16] << np.arange(16)).sum()
                    )
                    out[f"h{k}"].append(blk)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        batches, "asset_id bigint, h0 bigint, h1 bigint, h2 bigint, h3 bigint"
    )


def image_neardup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-duplicate image pairs from aHash blocks: pigeonhole
    equi-join on any equal 16-bit block (guaranteed complete for
    Hamming ≤ 3 with 4 blocks), then exact Hamming verification.
    Same candidate-never-all-pairs contract as the SimHash text
    miner."""
    blocks = hashes.select(
        "asset_id",
        "h0",
        "h1",
        "h2",
        "h3",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("blk_idx"), F.col(f"h{k}").alias("blk")
                    )
                    for k in range(4)
                ]
            )
        ).alias("b"),
    ).select("asset_id", "h0", "h1", "h2", "h3", "b.blk_idx", "b.blk")
    left = blocks.select(
        F.col("asset_id").alias("doc_a"),
        *[F.col(f"h{k}").alias(f"a{k}") for k in range(4)],
        "blk_idx",
        "blk",
    )
    right = blocks.select(
        F.col("asset_id").alias("doc_b"),
        *[F.col(f"h{k}").alias(f"b{k}") for k in range(4)],
        "blk_idx",
        "blk",
    )
    cand = (
        left.join(right, ["blk_idx", "blk"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            *[F.col(f"a{k}") for k in range(4)],
            *[F.col(f"b{k}") for k in range(4)],
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    hamming = sum(
        F.bit_count(
            F.col(f"a{k}").bitwiseXOR(F.col(f"b{k}"))
        )
        for k in range(4)
    ).cast("bigint")
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def mm_image_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: perceptual-hash image near-dup mining end to end —
    deterministic 8×8 RGB PPM assets from ``md5(text)`` (every
    ``doc_id % 10 == 7`` re-uses its predecessor's digest, and the
    ``doc_id % 20 == 17`` half additionally perturbs the first byte by
    +3, so the corpus contains planted exact-hash and near-hash
    twins), real ``encode_ppm`` → ``_decode_payload`` codec bytes in
    the loop, aHash blocks, pigeonhole candidate join, exact Hamming
    verify ≤ 3.  The DuckDB oracle replays the hash arithmetic from
    the digest hex, so codec, hash, and miner are all value-checked."""
    assets = _digest_assets(spark, sf_dir)
    return image_neardup_pairs(image_ahash_blocks(assets), max_hamming=3)


def _digest_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 8×8 RGB PPM asset table from ``md5(text)`` — the
    shared fixture of the image-hash gate queries (``mm_image_neardup``
    and ``mm_image_phash``): every ``doc_id % 10 == 7`` re-uses its
    predecessor's digest and the ``doc_id % 20 == 17`` half perturbs
    the first byte by +3, planting exact and near twins."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select("doc_id", F.md5("text").alias("m"))
    src = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 == 7, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
        .alias("sid"),
        (F.col("doc_id") % 20 == 17).alias("perturb"),
    )
    # NOTE(r14): _spread was tried here and REGRESSED (1.06→3.1 s at
    # sf0.1) — the per-row PPM work is too small to amortize 32-way
    # task + Python-worker overhead, and the repartition exchange
    # feeds every downstream join branch.  Left single-split.
    withm = src.join(
        base.select(F.col("doc_id").alias("sid"), "m"), "sid"
    ).select("doc_id", "m", "perturb")

    def build(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, payloads = [], []
            for doc_id, m, perturb in zip(
                pdf["doc_id"], pdf["m"], pdf["perturb"]
            ):
                raw = bytearray(bytes.fromhex(m))
                if perturb:
                    raw[0] = (raw[0] + 3) % 256
                arr = np.frombuffer(bytes(raw) * 12, dtype=np.uint8).reshape(
                    8, 8, 3
                )
                ids.append(doc_id)
                payloads.append(encode_ppm(arr))
            yield pd.DataFrame({"asset_id": ids, "payload": payloads})

    return withm.mapInPandas(build, "asset_id bigint, payload binary")


# ----------------------------------------------------------------------
# perceptual hash v2: quantized-DCT pHash
# ----------------------------------------------------------------------
_PHASH_DCT_SCALE = 1024


def _phash_dct_basis() -> np.ndarray:
    """Integer-quantized orthonormal 8-point DCT-II basis:
    ``B[u, x] = round(1024 · a(u) · cos(π(2x+1)u/16))`` with
    ``a(0)=√(1/8), a(u>0)=√(2/8)``.  Quantizing to integers makes the
    whole pHash pipeline EXACT integer arithmetic on both engines
    (the same trick as the quantized-deterministic PageRank) — the
    DuckDB oracle embeds this table as literals generated from this
    very function."""
    import math

    b = np.zeros((8, 8), dtype=np.int64)
    for u in range(8):
        a = math.sqrt(1.0 / 8.0) if u == 0 else math.sqrt(2.0 / 8.0)
        for x in range(8):
            b[u, x] = round(
                _PHASH_DCT_SCALE * a * math.cos(math.pi * (2 * x + 1) * u / 16.0)
            )
    return b


def image_phash_blocks(assets: DataFrame) -> DataFrame:
    """64-bit DCT perceptual hash (pHash) of each image payload, as
    four 16-bit blocks ``h0..h3`` — the same pigeonhole-joinable shape
    as ``image_ahash_blocks``, so ``image_neardup_pairs`` mines either.

    The hash: decode → integer channel-sum luma → area-reduce to an
    8×8 grid by integer block SUMS (dims are cropped to multiples of
    8; equal block sizes keep comparisons scale-free) → quantized 8×8
    DCT (``B·L·Bᵀ``, exact int64) → set bit ``f>0`` iff its
    coefficient exceeds the lower median of the 63 AC coefficients
    (the DC bit is always 0).  Median-thresholded DCT signs survive
    global, even CLIPPED, brightness shifts that flip mean-threshold
    aHash bits — the classic pHash robustness argument, pinned by
    test_video_audio_analysis's brightness-twin test.

    Input: (asset_id bigint, payload binary); decode runs inside
    Arrow-batched ``mapInPandas`` (shuffle-free narrow map)."""
    B = _phash_dct_basis()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "h0": [], "h1": [], "h2": [], "h3": []}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                arr = decode_image(bytes(payload))
                if arr.ndim == 3:
                    luma = arr.astype(np.int64).sum(axis=2)
                else:
                    luma = arr.astype(np.int64) * 3
                h, w = luma.shape
                bh, bw = max(h // 8, 1), max(w // 8, 1)
                luma8 = (
                    luma[: bh * 8, : bw * 8]
                    .reshape(8, bh, 8, bw)
                    .sum(axis=(1, 3))
                )
                coef = B @ luma8 @ B.T
                flat = coef.reshape(-1)
                med = int(np.sort(flat[1:].copy())[31])
                bits = np.zeros(64, dtype=np.int64)
                bits[1:] = flat[1:] > med
                out["asset_id"].append(asset_id)
                for k in range(4):
                    blk = int(
                        (bits[16 * k : 16 * k + 16] << np.arange(16)).sum()
                    )
                    out[f"h{k}"].append(blk)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        batches, "asset_id bigint, h0 bigint, h1 bigint, h2 bigint, h3 bigint"
    )


def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: quantized-DCT pHash fingerprints of the digest
    asset corpus — codec decode, block reduction, integer DCT, median
    threshold and block packing all value-checked against a DuckDB
    oracle that replays the arithmetic from the digest hex."""
    hashes = image_phash_blocks(_digest_assets(spark, sf_dir))
    return hashes.select(
        F.col("asset_id").alias("doc_id"), "h0", "h1", "h2", "h3"
    )


def _mm_image_phash_sql() -> str:
    B = _phash_dct_basis()
    basis_rows = ", ".join(
        f"({u}, {x}, {int(B[u, x])})" for u in range(8) for x in range(8)
    )
    hk = ",\n       ".join(
        f"CAST(SUM(CASE WHEN f // 16 = {k} THEN bit << (f % 16) "
        f"ELSE 0 END) AS BIGINT) AS h{k}"
        for k in range(4)
    )
    return f"""
WITH b AS (
  SELECT doc_id, md5(text) AS m FROM documents
),
src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 7 THEN doc_id - 1 ELSE doc_id END AS sid,
         doc_id % 20 = 17 AS perturb
  FROM documents
),
dg AS (
  SELECT s.doc_id, b.m, s.perturb FROM src s JOIN b ON b.doc_id = s.sid
),
bl AS (
  SELECT doc_id,
         list_transform(generate_series(1, 16),
           i -> CAST(CONCAT('0x', SUBSTR(m, 2*i - 1, 2)) AS BIGINT)) AS raw,
         perturb
  FROM dg
),
pb AS (
  SELECT doc_id,
         list_transform(generate_series(1, 16),
           i -> CASE WHEN i = 1 AND perturb THEN (raw[1] + 3) % 256
                ELSE raw[i] END) AS bytes
  FROM bl
),
px AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63),
           i -> bytes[((3*i) % 16) + 1] + bytes[((3*i + 1) % 16) + 1]
                + bytes[((3*i + 2) % 16) + 1]) AS luma
  FROM pb
),
pxu AS (
  SELECT doc_id, g.i AS i, luma[g.i + 1] AS l
  FROM px, UNNEST(generate_series(0, 63)) AS g(i)
),
basis(u, x, bv) AS (VALUES {basis_rows}),
coef AS (
  SELECT p.doc_id, bu.u AS u, bv.u AS v, SUM(p.l * bu.bv * bv.bv) AS c
  FROM pxu p
  JOIN basis bu ON bu.x = p.i // 8
  JOIN basis bv ON bv.x = p.i % 8
  GROUP BY p.doc_id, bu.u, bv.u
),
med AS (
  SELECT doc_id, c AS med FROM (
    SELECT doc_id, c,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c) AS rn
    FROM coef WHERE NOT (u = 0 AND v = 0)
  ) WHERE rn = 32
),
bits AS (
  SELECT coef.doc_id, 8 * u + v AS f,
         CASE WHEN u = 0 AND v = 0 THEN 0
              WHEN c > med THEN 1 ELSE 0 END AS bit
  FROM coef JOIN med ON med.doc_id = coef.doc_id
)
SELECT doc_id,
       {hk}
FROM bits
GROUP BY doc_id
ORDER BY doc_id
"""


MM_IMAGE_PHASH_SQL = _mm_image_phash_sql()


def _mm_image_neardup_sql() -> str:
    # blocks h0..h3 replayed from the digest hex: luma_i = sum of the
    # 3 cycled digest bytes of pixel i; bit i set iff 64·luma_i > Σ
    hk = ",\n         ".join(
        "CAST(list_aggregate(list_transform(generate_series(0, 15), "
        f"i -> CASE WHEN 64 * luma[{16 * k} + i + 1] > total "
        "THEN (1::BIGINT << i) ELSE 0 END), 'sum') AS BIGINT) "
        f"AS h{k}"
        for k in range(4)
    )
    return f"""
WITH b AS (
  SELECT doc_id, md5(text) AS m FROM documents
),
src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 7 THEN doc_id - 1 ELSE doc_id END AS sid,
         doc_id % 20 = 17 AS perturb
  FROM documents
),
dg AS (
  SELECT s.doc_id, b.m, s.perturb FROM src s JOIN b ON b.doc_id = s.sid
),
bl AS (
  SELECT doc_id,
         list_transform(generate_series(1, 16),
           i -> CAST(CONCAT('0x', SUBSTR(m, 2*i - 1, 2)) AS BIGINT)) AS raw,
         perturb
  FROM dg
),
pb AS (
  SELECT doc_id,
         list_transform(generate_series(1, 16),
           i -> CASE WHEN i = 1 AND perturb THEN (raw[1] + 3) % 256
                ELSE raw[i] END) AS bytes
  FROM bl
),
px AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63),
           i -> bytes[((3*i) % 16) + 1] + bytes[((3*i + 1) % 16) + 1]
                + bytes[((3*i + 2) % 16) + 1]) AS luma
  FROM pb
),
tot AS (
  SELECT doc_id, luma, list_aggregate(luma, 'sum') AS total FROM px
),
hs AS (
  SELECT doc_id,
         {hk}
  FROM tot
),
cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.h0 AS a0, a.h1 AS a1, a.h2 AS a2, a.h3 AS a3,
         b.h0 AS b0, b.h1 AS b1, b.h2 AS b2, b.h3 AS b3
  FROM hs a JOIN hs b
    ON a.doc_id < b.doc_id
   AND (a.h0 = b.h0 OR a.h1 = b.h1 OR a.h2 = b.h2 OR a.h3 = b.h3)
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
            + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) AS BIGINT)
         AS hamming
FROM cand
WHERE bit_count(xor(a0, b0)) + bit_count(xor(a1, b1))
      + bit_count(xor(a2, b2)) + bit_count(xor(a3, b3)) <= 3
ORDER BY doc_a, doc_b
"""


MM_IMAGE_NEARDUP_SQL = _mm_image_neardup_sql()


def video_scene_changes(
    assets: DataFrame, threshold_millis: int = 80, every_n: int = 1
) -> DataFrame:
    """Scene-change detection over video payloads: sample frames with
    the real container parsers, decode each frame, and flag cuts
    where the mean absolute per-pixel luma delta between consecutive
    frames exceeds ``threshold_millis`` (millis of full scale, 0–255
    → 0–1000) — the shot-boundary step of a video curation pipeline
    (per-scene dedup, thumbnail picking, clip segmentation).

    Two stages, both scale shapes: the frame explode/decode is the
    Arrow map ``sample_video_frames`` already uses; the consecutive-
    frame comparison is a keyed lag window PER ASSET (frames of one
    video are compared, never across videos).  Decode runs once per
    frame; the luma reduction is a single numpy pass."""
    frames = sample_video_frames(assets, every_n=every_n)

    def feat(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"asset_id": [], "frame_no": [], "luma_sum": [], "n_px": []}
            for asset_id, frame_no, payload in zip(
                pdf["asset_id"], pdf["frame_no"], pdf["frame_payload"]
            ):
                try:
                    arr = _decode_rgb(bytes(payload))
                except Exception:
                    continue
                if arr is None:
                    continue
                if arr.ndim == 3:
                    luma = arr.astype(np.int64).sum(axis=2)
                    scale = 3
                else:
                    luma = arr.astype(np.int64)
                    scale = 1
                out["asset_id"].append(asset_id)
                out["frame_no"].append(int(frame_no))
                out["luma_sum"].append(int(luma.sum()) // scale)
                out["n_px"].append(int(luma.size))
            yield pd.DataFrame(out)

    # per-frame mean luma in millis of full scale; scene cut = |Δ| big
    stats = frames.mapInPandas(
        feat, "asset_id bigint, frame_no bigint, luma_sum bigint, n_px bigint"
    ).select(
        "asset_id",
        "frame_no",
        (F.col("luma_sum") * 1000 / (F.col("n_px") * 255))
        .cast("bigint")
        .alias("luma_millis"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("asset_id").orderBy("frame_no")
    return (
        stats.withColumn("prev", F.lag("luma_millis").over(w))
        .withColumn(
            "delta_millis",
            F.abs(F.col("luma_millis") - F.col("prev")),
        )
        .withColumn(
            "is_cut",
            F.when(
                F.col("prev").isNotNull()
                & (F.col("delta_millis") > threshold_millis),
                True,
            ).otherwise(False),
        )
        .select("asset_id", "frame_no", "luma_millis", "delta_millis", "is_cut")
    )


AUDIO_SEGMENT_SCHEMA = (
    "asset_id bigint, segment_no bigint, state string, "
    "start_ms bigint, end_ms bigint, n_frames bigint"
)


def _audio_segments_gen(
    frame_ms: int, hop_ms: int, silence_rms_micros: int
):
    """mapInPandas generator: WAV payload batches → merged segments.

    r14 optimization (guide §2.4 remove shuffles outright): every
    frame of an asset derives from that asset's single payload row, so
    the threshold + gaps-and-islands merge is per-row-LOCAL work — the
    old shape shuffled the whole frame table (16 frames × every asset)
    through a keyed lag window, a running-sum window and a hash
    aggregate just to merge runs the Python pass already held in
    memory.  Framing + RMS are the same vectorized pass as before
    (identical float64 slices, same half-even ``round`` — bit-identical
    rms_micros); the merge reproduces the lag + running-sum semantics
    on those same ints, so segment rows match byte-for-byte."""

    def segs(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "asset_id", "segment_no", "state",
            "start_ms", "end_ms", "n_frames",
        ]
        for pdf in it:
            decoded: dict[tuple, list] = {}
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                try:
                    samples, rate = decode_audio(bytes(payload))
                except Exception:
                    continue
                decoded.setdefault((len(samples), rate), []).append(
                    (int(asset_id), samples)
                )
            ids_parts: list = []
            fno_parts: list = []
            rms_parts: list = []
            for (n_samp, rate), rows in decoded.items():
                flen = max(1, rate * frame_ms // 1000)
                hop = max(1, rate * hop_ms // 1000)
                n = 1 + max(0, (n_samp - flen)) // hop
                ids = np.array([r[0] for r in rows], dtype=np.int64)
                x = (
                    np.stack([r[1] for r in rows]).astype(np.float64)
                    / 32768.0
                )
                idx = (
                    hop * np.arange(n)[:, None] + np.arange(flen)[None, :]
                )
                idx = np.minimum(idx, n_samp - 1)  # matches the short
                # trailing slice only when flen > n_samp (then n == 1
                # and the slice clamps exactly as x[0:flen] would)
                if flen <= n_samp:
                    fr = x[:, idx]  # (rows, n, flen)
                    rms = np.sqrt(np.mean(fr * fr, axis=2))
                else:
                    # single short frame: reduce the true slice
                    rms = np.sqrt(np.mean(x * x, axis=1))[:, None]
                ids_parts.append(np.repeat(ids, n))
                fno_parts.append(
                    np.tile(np.arange(n, dtype=np.int64), len(rows))
                )
                rms_parts.append(
                    np.array(
                        [int(round(v)) for v in (rms * 1e6).reshape(-1)],
                        dtype=np.int64,
                    )
                )
            if not ids_parts:
                yield pd.DataFrame(
                    {c: pd.Series([], dtype="int64") for c in cols}
                ).astype({"state": "object"})
                continue
            fdf = pd.DataFrame(
                {
                    "asset_id": np.concatenate(ids_parts),
                    "frame_no": np.concatenate(fno_parts),
                    "rms_micros": np.concatenate(rms_parts),
                }
            )
            fdf["state"] = np.where(
                fdf["rms_micros"] < silence_rms_micros, "silence", "speech"
            )
            # an asset's frames are contiguous and ascending by
            # construction, so the keyed lag + running-sum merge is a
            # cumsum over "state changed or new asset" per asset
            new_seg = (
                fdf["asset_id"].ne(fdf["asset_id"].shift())
                | fdf["state"].ne(fdf["state"].shift())
            ).astype(np.int64)
            fdf["segment_no"] = new_seg.groupby(fdf["asset_id"]).cumsum()
            out = (
                fdf.groupby(
                    ["asset_id", "segment_no", "state"], sort=False
                )
                .agg(
                    start_ms=("frame_no", "min"),
                    end_ms=("frame_no", "max"),
                    n_frames=("frame_no", "size"),
                )
                .reset_index()
            )
            out["start_ms"] = out["start_ms"] * hop_ms
            out["end_ms"] = out["end_ms"] * hop_ms + frame_ms
            yield out[cols]

    return segs


def audio_segments(
    assets: DataFrame,
    frame_ms: int = 25,
    hop_ms: int = 25,
    silence_rms_micros: int = 10000,
) -> DataFrame:
    """Silence/speech segmentation over PCM16 WAV payloads: frame the
    signal, threshold frame RMS, and merge consecutive same-state
    frames into segments (gaps-and-islands) — the voice-activity step
    before transcription or audio dedup.

    Per asset: (segment_no, state, start_ms, end_ms, n_frames).
    Framing reuses the ``audio_features`` stride-view recipe; the
    segment merge runs INSIDE the Arrow map (per-asset local — no
    exchange at all beyond the presentation sort; guide §2.4)."""
    if frame_ms <= 0 or hop_ms <= 0:
        raise ValueError("frame_ms and hop_ms must be positive")
    return (
        assets.select("asset_id", "payload")
        .mapInPandas(
            _audio_segments_gen(frame_ms, hop_ms, silence_rms_micros),
            AUDIO_SEGMENT_SCHEMA,
        )
        .orderBy("asset_id", "segment_no")
    )


def _digest_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, digest) relation feeding the digest-WAV fixture —
    spread so the Python synthesis/decode chain parallelizes past the
    single-row-group test scan."""
    return _spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("digest")
        )
    )


def _digest_synth_gen():
    """mapInPandas generator: (doc_id, digest) batches → PCM16 WAV
    payload batches, factored out so the audio gate rows can compose
    it with the decode-side generator in ONE Python pass."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # r14 (guide §4.2): one vectorized pass per batch — all
        # payloads share (rate, length), so samples come from ONE
        # byte-matrix repeat and the WAV header is a constant prefix;
        # per-row work is just the header + row-bytes concat.  The
        # bytes are identical to the old per-row encode_wav loop (same
        # header fields, same little-endian int16 payload).
        for pdf in it:
            n = len(pdf)
            if n == 0:
                yield pd.DataFrame({"asset_id": [], "payload": []})
                continue
            raw = np.frombuffer(
                b"".join(bytes.fromhex(d) for d in pdf["digest"]),
                dtype=np.uint8,
            ).reshape(n, 16)
            vals = ((raw.astype(np.int64) - 128) * 256).astype(np.int16)
            samples = np.repeat(vals, 200, axis=1)  # (n, 3200)
            header = encode_wav(samples[0], 8000)[:44]
            body = samples.astype("<i2").tobytes()
            row_nbytes = samples.shape[1] * 2
            payloads = [
                header + body[i * row_nbytes : (i + 1) * row_nbytes]
                for i in range(n)
            ]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["doc_id"].astype("int64"),
                    "payload": payloads,
                }
            )

    return batches


def _digest_wav_assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 3200-sample PCM16 WAV asset table from
    ``md5(text)``: the 16 digest bytes each held constant for one
    25 ms frame (200 samples at 8 kHz, ``sample = (byte − 128)·256``),
    encoded with ``encode_wav`` — the shared fixture of the audio gate
    queries (``mm_audio_vad``, ``mm_audio_features``).  Constant
    frames make every frame statistic pure integer logic on the
    digest bytes, so the DuckDB oracles reproduce decode-side numbers
    from the digest hex.  (Session-memoizing this relation was
    measured and REJECTED in r14: the persist-materialization build
    cost more than the ~0.3 s the two consumer rows saved; the synth
    batch loop is vectorized instead.)"""
    return _digest_docs(spark, sf_dir).mapInPandas(
        _digest_synth_gen(), "asset_id bigint, payload binary"
    )


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature gate query over REAL WAV bytes: the digest-WAV
    assets run through ``audio_features`` at frame-aligned 25 ms
    frames (hop = frame), so per-frame RMS is exactly the constant
    frame's |sample| and every output is integer logic on digest
    bytes:

    - ``rms_micros`` = round(S / 16 / 32767 · 1e6) with S the sum of
      per-byte magnitudes (byte 0 contributes its true 32768 — the
      squared path never touches int16 abs).
    - ``peak`` replicates numpy's int16 ``abs`` overflow faithfully:
      byte 0's sample is −32768 and ``abs`` returns −32768, so it can
      never win the max — the oracle encodes the same CASE.
    - ``zcr_micros``: sign changes happen only at the 15 frame
      boundaries (``(byte < 128)`` flips); the count × 312.5 hits an
      exact .5 for every odd count, so the oracle reproduces Python's
      round-HALF-EVEN with integer logic instead of SQL ROUND.

    Any WAV header, sample-width, striding, or reduction bug breaks
    the value match.  Scale shape: synthesis + framing are FUSED into
    one narrow Arrow map (r14, guide §4.1: the WAV bytes are encoded
    and decoded inside a single Python pass, so the 6.4 KB payloads
    never cross the JVM↔Python boundary); no shuffle at all beyond
    the final sort.  Reference analog: none (pure [EXT])."""
    synth, feat = _digest_synth_gen(), _audio_features_gen(25, 25)

    def fused(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return feat(synth(it))

    # no presentation sort: the driver's value gate is row-order-
    # insensitive (guide §2.4 — "an orderBy used only to make output
    # deterministic" is an accidental exchange; here its range
    # partitioner would also SAMPLE the child, re-running the whole
    # Python pass a second time)
    return _digest_docs(spark, sf_dir).mapInPandas(
        fused, AUDIO_FEATURE_SCHEMA
    )


# Oracle: every statistic is integer logic on the digest bytes (see
# mm_audio_features docstring).  zcr half-even: x2 = 625·cnt is twice
# the exact micro value; odd x2 rounds to the EVEN neighbor of
# (x2−1)/2 and (x2+1)/2.
MM_AUDIO_FEATURES_SQL = """
WITH b AS (
  SELECT doc_id, md5(text) AS m FROM documents
),
bytes AS (
  SELECT doc_id AS asset_id, i,
         CAST(CONCAT('0x', SUBSTR(m, 2*i - 1, 2)) AS BIGINT) AS v
  FROM b, UNNEST(generate_series(1, 16)) AS t(i)
),
feat AS (
  SELECT asset_id,
         SUM(CASE WHEN v = 0 THEN 32768 ELSE ABS(v - 128) * 256 END) AS s_abs,
         MAX(CASE WHEN v = 0 THEN -32768 ELSE ABS(v - 128) * 256 END) AS peak
  FROM bytes GROUP BY asset_id
),
crossings AS (
  SELECT b1.asset_id,
         SUM(CASE WHEN (b1.v < 128) <> (b2.v < 128) THEN 1 ELSE 0 END) AS cnt
  FROM bytes b1 JOIN bytes b2
    ON b2.asset_id = b1.asset_id AND b2.i = b1.i + 1
  GROUP BY b1.asset_id
),
z AS (
  SELECT asset_id, 625 * cnt AS x2 FROM crossings
)
SELECT f.asset_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(3200 AS BIGINT) AS n_samples,
       CAST(400 AS BIGINT) AS duration_ms,
       CAST(16 AS BIGINT) AS n_frames,
       CAST(ROUND(CAST(f.s_abs AS DOUBLE) / 16 / 32767 * 1000000) AS BIGINT)
         AS rms_micros,
       CAST(f.peak AS INT) AS peak,
       CAST(CASE WHEN z.x2 % 2 = 0 THEN z.x2 // 2
                 WHEN ((z.x2 - 1) // 2) % 2 = 0 THEN (z.x2 - 1) // 2
                 ELSE (z.x2 + 1) // 2 END AS BIGINT) AS zcr_micros
FROM feat f JOIN z ON z.asset_id = f.asset_id
ORDER BY f.asset_id
"""


def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity gate query over REAL WAV bytes: every document
    becomes a deterministic 3200-sample PCM16 WAV — the 16 ``md5(text)``
    digest bytes each held constant for one 25 ms frame (200 samples
    at 8 kHz, ``sample = (byte − 128)·256``) — encoded with
    ``encode_wav``, decoded back inside ``audio_segments``'s
    Arrow-batched framing, and segmented into silence/speech spans at
    a 0.5 full-scale RMS threshold.

    Because each frame is a constant span, frame RMS is exactly
    ``|byte − 128| · 7812.5`` micro-units, so the silence decision is
    pure integer logic (silence ⇔ ``|byte − 128| ≤ 63``) and the
    DuckDB oracle reproduces the whole segmentation — framing,
    thresholding, gaps-and-islands merge — from the digest hex
    without touching audio bytes.  Any WAV header, sample-width, or
    framing bug breaks the value match.

    Scale shape: synthesis, framing AND the segment merge are FUSED
    into one narrow Arrow map (r14, guide §2.4/§4.1: every frame of
    an asset derives from its single payload row, so the
    gaps-and-islands merge is per-row-local — the WAV bytes never
    cross the JVM↔Python boundary and the old frame-table shuffle +
    two windows are gone); the only exchange is the presentation
    sort.  Reference analog: none (pure [EXT])."""
    synth = _digest_synth_gen()
    seg = _audio_segments_gen(25, 25, 500_000)

    def fused(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        return seg(synth(it))

    # no presentation sort: the driver's value gate is row-order-
    # insensitive (guide §2.4 — "an orderBy used only to make output
    # deterministic" is an accidental exchange; here its range
    # partitioner would also SAMPLE the child, re-running the whole
    # Python pass a second time)
    return _digest_docs(spark, sf_dir).mapInPandas(
        fused, AUDIO_SEGMENT_SCHEMA
    )


# Oracle: frame i's state is pure integer logic on digest byte i
# (silence ⇔ |byte − 128| ≤ 63 ⇔ byte ∈ [65, 191]); segments are the
# standard lag + running-sum gaps-and-islands merge.
MM_AUDIO_VAD_SQL = """
WITH b AS (
  SELECT doc_id, md5(text) AS m FROM documents
),
f AS (
  SELECT doc_id AS asset_id, i - 1 AS frame_no,
         CASE WHEN ABS(CAST(CONCAT('0x', SUBSTR(m, 2*i - 1, 2)) AS BIGINT) - 128) <= 63
              THEN 'silence' ELSE 'speech' END AS state
  FROM b, UNNEST(generate_series(1, 16)) AS t(i)
),
seg AS (
  SELECT asset_id, frame_no, state,
         CASE WHEN LAG(state) OVER w IS NULL
                OR LAG(state) OVER w <> state THEN 1 ELSE 0 END AS new_seg
  FROM f
  WINDOW w AS (PARTITION BY asset_id ORDER BY frame_no)
),
segn AS (
  SELECT asset_id, frame_no, state,
         SUM(new_seg) OVER (PARTITION BY asset_id ORDER BY frame_no) AS segment_no
  FROM seg
)
SELECT asset_id, CAST(segment_no AS BIGINT) AS segment_no, state,
       CAST(MIN(frame_no) * 25 AS BIGINT) AS start_ms,
       CAST(MAX(frame_no) * 25 + 25 AS BIGINT) AS end_ms,
       CAST(COUNT(*) AS BIGINT) AS n_frames
FROM segn
GROUP BY asset_id, segment_no, state
ORDER BY asset_id, segment_no
"""
