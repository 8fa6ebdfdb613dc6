"""Minimal real AVI (RIFF) video container in pure stdlib + numpy.

Writer: MJPEG-in-AVI — each frame is a real baseline JPEG
(``ext/jpeg.py``) inside a ``00dc`` chunk, with proper ``hdrl``
(``avih`` + ``strl``) headers and an ``idx1`` index; standard players
accept the output.  Reader: walks the RIFF tree, returns decoded RGB
frames from ``00dc`` (MJPEG) and ``00db`` (uncompressed bottom-up BGR
DIB) chunks plus the fps from the stream header.

This makes "video" a real byte format for the multimodal pipeline —
``sample_video_frames`` parses genuine container bytes instead of the
FAKE stub — while true MP4/H.264 remains out of scope (needs external
codecs).
"""

from __future__ import annotations

import struct

import numpy as np

from meteaudata_spark.ext.jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, data: bytes) -> bytes:
    pad = b"\x00" if len(data) % 2 else b""
    return fourcc + struct.pack("<I", len(data)) + data + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """Encode ``(h, w, 3)`` uint8 frames as an MJPEG AVI."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one shape")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    maxbuf = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        maxbuf * fps,      # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # AVIF_HASINDEX
        len(frames), 0, 1, maxbuf,
        w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), maxbuf, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_body = b""
    idx = b""
    offset = 4  # idx1 offsets count from the start of the movi LIST body
    for j in jpegs:
        movi_body += _chunk(b"00dc", j)
        idx += b"00dc" + struct.pack("<III", 0x10, offset, len(j))
        offset += 8 + len(j) + (len(j) % 2)
    movi = _list(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _decode_dib(data: bytes, w: int, h: int) -> np.ndarray:
    """Uncompressed 24-bit DIB frame: bottom-up BGR rows padded to a
    4-byte boundary → (h, w, 3) RGB."""
    stride = (w * 3 + 3) & ~3
    if len(data) < stride * h:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(data, np.uint8, stride * h).reshape(h, stride)
    bgr = rows[:, : w * 3].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()  # flip vertical, BGR→RGB


def decode_avi(payload: bytes):
    """Decode an AVI container → (list of (h, w, 3) uint8 RGB frames,
    fps).  Handles MJPEG (``00dc``) and uncompressed DIB (``00db``)
    frame chunks, flat or inside ``rec `` lists."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    fps = None
    dims = None
    frames: list[np.ndarray] = []

    def walk(data: bytes) -> None:
        nonlocal fps, dims
        pos = 0
        while pos + 8 <= len(data):
            cid = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError(f"truncated {cid!r} chunk")
            if cid == b"LIST":
                if body[:4] in (b"hdrl", b"movi", b"strl", b"rec "):
                    walk(body[4:])
            elif cid == b"strh" and body[:4] == b"vids":
                scale, rate = struct.unpack("<II", body[20:28])
                if scale:
                    fps = rate / scale
            elif cid == b"strf" and len(body) >= 16:
                _, w, h = struct.unpack("<Iii", body[:12])
                dims = (w, abs(h))
            elif cid[2:4] == b"dc" and size:
                frames.append(decode_jpeg(bytes(body)))
            elif cid[2:4] == b"db" and size:
                if dims is None:
                    raise ValueError("DIB frame before strf header")
                frames.append(_decode_dib(bytes(body), dims[0], dims[1]))
            pos += 8 + size + (size & 1)  # chunks are word-aligned

    walk(payload[12:])
    if not frames:
        raise ValueError("no video frames found")
    return frames, fps
