"""MJPEG-in-MP4 container (ext/mp4.py): real ISO BMFF box tree with a
full stsd/stts/stsc/stsz/stco sample table; the frame sampler explodes
real container bytes into standalone decodable JPEG payloads."""

import struct

import numpy as np
import pytest

from meteaudata_spark.ext.mp4 import decode_mp4, encode_mp4_mjpeg


def _frames(n=6, h=16, w=24):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        np.stack(
            [
                (xx * 3 + t * 11) % 256,
                (yy * 5 + t * 7) % 256,
                np.full_like(xx, (t * 29) % 256),
            ],
            axis=-1,
        ).astype(np.uint8)
        for t in range(n)
    ]


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255**2 / mse)


def test_mp4_round_trip():
    frames = _frames()
    payload = encode_mp4_mjpeg(frames, fps=12, quality=92)
    assert payload[4:8] == b"ftyp"
    out, fps = decode_mp4(payload)
    assert len(out) == len(frames)
    assert fps == 12.0
    for a, b in zip(frames, out):
        assert b.shape == a.shape
        assert _psnr(a, b) > 30.0


def test_mp4_rejects_garbage_and_truncation():
    with pytest.raises(ValueError):
        decode_mp4(b"\x00" * 32)
    payload = encode_mp4_mjpeg(_frames(2), fps=5)
    with pytest.raises(ValueError):
        # chop inside mdat: the moov box walk fails cleanly
        decode_mp4(payload[: len(payload) // 2])


def test_mp4_h264_sample_entry_raises_not_implemented():
    """Swap the stsd coding fourcc to avc1: the container parses but
    the decoder must refuse the bitstream explicitly."""
    payload = bytearray(encode_mp4_mjpeg(_frames(2), fps=5))
    idx = payload.find(b"jpeg", payload.find(b"stsd"))
    assert idx > 0
    payload[idx : idx + 4] = b"avc1"
    with pytest.raises(NotImplementedError):
        decode_mp4(bytes(payload))


def test_mp4_multi_chunk_and_co64_layout():
    """Hand-edit the single-chunk table into a two-chunk stsc plus a
    64-bit co64 offset table: the sample-table resolver must handle
    the general layout, not just the writer's."""
    frames = _frames(4)
    payload = encode_mp4_mjpeg(frames, fps=10, quality=90)
    jpeg_sizes = []
    pos = 0
    # recover the four sample sizes from stsz
    i = payload.find(b"stsz")
    n = struct.unpack(">I", payload[i + 12 : i + 16])[0]
    assert n == 4
    jpeg_sizes = list(struct.unpack(">4I", payload[i + 16 : i + 32]))
    # original chunk offset from stco
    i = payload.find(b"stco")
    off0 = struct.unpack(">I", payload[i + 12 : i + 16])[0]

    def full(fourcc, body):
        return struct.pack(">I", 12 + len(body)) + fourcc + b"\x00" * 4 + body

    # two chunks of two samples each; second chunk offset skips the
    # first two samples
    stsc = full(b"stsc", struct.pack(">IIIIIII", 2, 1, 2, 1, 2, 2, 1))
    co64 = full(
        b"co64",
        struct.pack(">IQQ", 2, off0, off0 + jpeg_sizes[0] + jpeg_sizes[1]),
    )

    out = bytearray(payload)
    # replace the old stsc box (size 28) and stco box (size 20) in place
    i = out.find(b"stsc") - 4
    old = struct.unpack(">I", out[i : i + 4])[0]
    out[i : i + old] = stsc
    i = out.find(b"stco") - 4
    old = struct.unpack(">I", out[i : i + 4])[0]
    out[i : i + old] = co64
    # fix every enclosing box size (moov > trak > mdia > minf > stbl)
    delta = len(stsc) + len(co64) - 28 - 20
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = out.find(name) - 4
        sz = struct.unpack(">I", out[j : j + 4])[0]
        out[j : j + 4] = struct.pack(">I", sz + delta)

    dec, fps = decode_mp4(bytes(out))
    assert len(dec) == 4 and fps == 10.0
    for a, b in zip(frames, dec):
        assert _psnr(a, b) > 30.0


def test_mp4_through_spark_frame_sampler(spark):
    from meteaudata_spark.ext.jpeg import decode_jpeg
    from meteaudata_spark.ext.multimodal import ASSET_SCHEMA, sample_video_frames

    frames = _frames(n=7)
    payload = encode_mp4_mjpeg(frames, fps=10, quality=92)
    meta = {"width": 24, "height": 16, "channels": None,
            "sample_rate": None, "n_frames": 7, "format": "mp4"}
    assets = spark.createDataFrame([(0, "video", payload, meta)], ASSET_SCHEMA)
    out = sample_video_frames(assets, every_n=2).toPandas()
    assert list(out["frame_no"]) == [0, 2, 4, 6]
    for _, row in out.iterrows():
        dec = decode_jpeg(bytes(row["frame_payload"]))
        assert dec.shape == (16, 24, 3)
        assert _psnr(frames[row["frame_no"]], dec) > 28.0
