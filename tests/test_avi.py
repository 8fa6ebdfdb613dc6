"""MJPEG-in-AVI container (ext/avi.py): real RIFF tree with hdrl/movi/
idx1, frames as genuine baseline JPEGs; the frame sampler explodes
real container bytes into standalone decodable JPEG payloads."""

import numpy as np
import pytest

from meteaudata_spark.ext.avi import decode_avi, encode_avi_mjpeg


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


def test_avi_round_trip():
    frames = _frames()
    payload = encode_avi_mjpeg(frames, fps=12, quality=92)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
    out, fps = decode_avi(payload)
    assert len(out) == len(frames)
    assert fps == 12.0
    for a, b in zip(frames, out):
        assert b.shape == a.shape
        assert _psnr(a, b) > 30.0


def test_avi_rejects_garbage():
    with pytest.raises(ValueError):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_avi(b"\x00" * 32)
    payload = encode_avi_mjpeg(_frames(2), fps=5)
    with pytest.raises(ValueError):
        decode_avi(payload[: len(payload) // 2])


def test_avi_dib_frames():
    """Uncompressed 00db frames (bottom-up BGR DIB) decode too —
    hand-build a minimal AVI around one raw frame."""
    import struct

    h, w = 5, 7
    rgb = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    stride = (w * 3 + 3) & ~3
    dib = np.zeros((h, stride), dtype=np.uint8)
    dib[:, : w * 3] = rgb[::-1, :, ::-1].reshape(h, w * 3)  # flip + BGR

    def chunk(fourcc, data):
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(t, body):
        return chunk(b"LIST", t + body)

    strh = b"vids" + b"DIB " + struct.pack(
        "<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 1, 0, 0, 0
    ) + struct.pack("<4H", 0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"\x00" * 4,
                       stride * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"strh", strh) + chunk(b"strf", strf))
    movi = lst(b"movi", chunk(b"00db", dib.tobytes()))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    frames, fps = decode_avi(payload)
    assert len(frames) == 1
    assert fps == 10.0
    assert (frames[0] == rgb).all()


def test_avi_through_spark_frame_sampler(spark):
    from meteaudata_spark.ext.jpeg import decode_jpeg
    from meteaudata_spark.ext.multimodal import ASSET_SCHEMA, sample_video_frames

    frames = _frames(n=7)
    payload = encode_avi_mjpeg(frames, fps=10, quality=92)
    meta = {"width": 24, "height": 16, "channels": None,
            "sample_rate": None, "n_frames": 7, "format": "avi"}
    assets = spark.createDataFrame([(0, "video", payload, meta)], ASSET_SCHEMA)
    out = sample_video_frames(assets, every_n=2).toPandas()
    assert list(out["frame_no"]) == [0, 2, 4, 6]
    # each emitted frame is a standalone decodable JPEG matching the
    # container frame it came from
    for _, row in out.iterrows():
        dec = decode_jpeg(bytes(row["frame_payload"]))
        assert dec.shape == (16, 24, 3)
        assert _psnr(frames[row["frame_no"]], dec) > 28.0
