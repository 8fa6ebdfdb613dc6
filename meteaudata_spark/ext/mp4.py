"""Minimal real MP4 (ISO Base Media File Format, ISO/IEC 14496-12)
container in pure stdlib + numpy.

Writer: MJPEG-in-MP4 — each video sample is a real baseline JPEG
(``ext/jpeg.py``) referenced from a proper ``moov`` sample table
(``stsd``/``stts``/``stsc``/``stsz``/``stco``); standard players that
ship a JPEG decoder (QuickTime 'jpeg' sample entry) accept the output.
Reader: walks the box tree, resolves the sample table to byte ranges
in ``mdat``, and returns decoded RGB frames + fps.

With AVI (``ext/avi.py``) this makes both mainstream video CONTAINERS
real byte formats for the multimodal pipeline; only the H.264/H.265
*bitstream* codecs remain out of scope (they need external decoder
libraries this environment doesn't ship).
"""

from __future__ import annotations

import struct

import numpy as np

from meteaudata_spark.ext.jpeg import decode_jpeg, encode_jpeg

_JPEG_FOURCCS = {b"jpeg", b"mjpa", b"MJPG", b"mjpg"}


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + body)


def encode_mp4_mjpeg(
    frames: list[np.ndarray], fps: int = 10, quality: int = 90
) -> bytes:
    """Encode ``(h, w, 3)`` uint8 frames as MJPEG samples in an ISO
    BMFF container (ftyp + mdat + moov, one chunk, constant frame
    duration)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w, _ = frames[0].shape
    if any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one shape")
    if fps <= 0:
        raise ValueError("fps must be positive")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    n = len(jpegs)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom" + b"iso2" + b"mp41")
    mdat = _box(b"mdat", b"".join(jpegs))
    # single chunk: all samples start right after the mdat header
    chunk_offset = len(ftyp) + 8

    timescale = fps  # 1 tick per frame
    duration = n

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH2x8x", 0x00010000, 0x0100)  # rate 1.0, volume 1.0
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">6I", 0, 0, 0, 0, 0, 0)
        + struct.pack(">I", 2),  # next_track_ID
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in_movie | in_preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + struct.pack(">8x4h", 0, 0, 0, 0)  # layer, alt_group, volume, pad
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">HH", 0x55C4, 0),  # language 'und'
    )
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"VideoHandler\x00")
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">4H", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    # VisualSampleEntry with the QuickTime MJPEG 'jpeg' coding name
    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)          # data_reference_index
        + b"\x00" * 16                               # pre_defined / reserved
        + struct.pack(">HH", w, h)
        + struct.pack(">IIIH", 0x00480000, 0x00480000, 0, 1)  # 72 dpi, 1 frame
        + b"\x05MJPEG" + b"\x00" * 26                # 32-byte compressorname
        + struct.pack(">Hh", 24, -1),                # depth, pre_defined
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, 1))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, n) + b"".join(struct.pack(">I", len(j)) for j in jpegs),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(data: bytes, pos: int = 0, end: int | None = None):
    """Yield (fourcc, body_start, body_end) for each box in a range,
    handling 64-bit largesize and size==0 (to end-of-range)."""
    end = len(data) if end is None else end
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box header")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif size == 0:
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"bad {fourcc!r} box size {size}")
        yield fourcc, pos + header, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, path: list[bytes]) -> tuple[int, int]:
    """Resolve a nested box path to (body_start, body_end); first match
    at each level."""
    for name in path:
        for fourcc, b0, b1 in _iter_boxes(data, start, end):
            if fourcc == name:
                start, end = b0, b1
                break
        else:
            raise ValueError(f"missing {name!r} box")
    return start, end


def _video_trak(data: bytes, m0: int, m1: int) -> tuple[int, int]:
    for fourcc, b0, b1 in _iter_boxes(data, m0, m1):
        if fourcc != b"trak":
            continue
        try:
            h0, _h1 = _find(data, b0, b1, [b"mdia", b"hdlr"])
        except ValueError:
            continue
        if data[h0 + 8 : h0 + 12] == b"vide":
            return b0, b1
    raise ValueError("no video track found")


def decode_mp4(payload: bytes):
    """Decode an ISO BMFF container → (list of (h, w, 3) uint8 RGB
    frames, fps).  Resolves the full stsc/stsz/stco sample table (any
    chunk layout, 32- or 64-bit offsets); samples must be MJPEG —
    H.264/H.265 sample entries raise ``NotImplementedError``."""
    boxes = {f: (b0, b1) for f, b0, b1 in _iter_boxes(payload)}
    if b"ftyp" not in boxes or b"moov" not in boxes:
        raise ValueError("not an ISO BMFF payload")
    t0, t1 = _video_trak(payload, *boxes[b"moov"])
    s0, s1 = _find(payload, t0, t1, [b"mdia", b"minf", b"stbl"])
    stbl = {f: (b0, b1) for f, b0, b1 in _iter_boxes(payload, s0, s1)}

    def full_body(name: bytes) -> tuple[int, int]:
        if name not in stbl:
            raise ValueError(f"missing {name!r} box")
        b0, b1 = stbl[name]
        return b0 + 4, b1  # skip version+flags

    # coding fourcc from the first stsd sample entry
    d0, d1 = full_body(b"stsd")
    entry = next(_iter_boxes(payload, d0 + 4, d1))
    codec = entry[0]
    if codec not in _JPEG_FOURCCS:
        raise NotImplementedError(
            f"sample entry {codec!r} needs an external bitstream decoder "
            "(only MJPEG samples decode in this environment)"
        )

    b0, b1 = full_body(b"stsz")
    uniform, count = struct.unpack(">II", payload[b0 : b0 + 8])
    if uniform:
        sizes = [uniform] * count
    else:
        sizes = list(struct.unpack(f">{count}I", payload[b0 + 8 : b0 + 8 + 4 * count]))

    if b"stco" in stbl:
        b0, b1 = full_body(b"stco")
        (n_chunks,) = struct.unpack(">I", payload[b0 : b0 + 4])
        offsets = list(struct.unpack(f">{n_chunks}I", payload[b0 + 4 : b0 + 4 + 4 * n_chunks]))
    else:  # 64-bit co64 variant
        b0, b1 = full_body(b"co64")
        (n_chunks,) = struct.unpack(">I", payload[b0 : b0 + 4])
        offsets = list(struct.unpack(f">{n_chunks}Q", payload[b0 + 4 : b0 + 4 + 8 * n_chunks]))

    b0, b1 = full_body(b"stsc")
    (n_stsc,) = struct.unpack(">I", payload[b0 : b0 + 4])
    stsc = [
        struct.unpack(">III", payload[b0 + 4 + 12 * i : b0 + 16 + 12 * i])
        for i in range(n_stsc)
    ]

    # expand stsc runs -> samples-per-chunk for every chunk
    per_chunk: list[int] = []
    for i, (first, spc, _desc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else len(offsets)
        per_chunk.extend([spc] * (last - first + 1))
    if len(per_chunk) != len(offsets):
        raise ValueError("stsc/stco chunk count mismatch")

    frames: list[np.ndarray] = []
    si = 0
    for chunk_i, chunk_off in enumerate(offsets):
        pos = chunk_off
        for _ in range(per_chunk[chunk_i]):
            if si >= len(sizes):
                break
            sz = sizes[si]
            sample = payload[pos : pos + sz]
            if len(sample) != sz:
                raise ValueError("sample range past end of file")
            frames.append(decode_jpeg(bytes(sample)))
            pos += sz
            si += 1
    if si != len(sizes):
        raise ValueError("sample table references more samples than chunks hold")

    # fps = mdhd timescale / stts delta (constant-delta tracks)
    fps = None
    try:
        h0, _ = _find(payload, t0, t1, [b"mdia", b"mdhd"])
        version = payload[h0]
        timescale = struct.unpack(
            ">I", payload[h0 + (20 if version == 1 else 12) : h0 + (24 if version == 1 else 16)]
        )[0]
        b0, _ = full_body(b"stts")
        (n_stts,) = struct.unpack(">I", payload[b0 : b0 + 4])
        if n_stts >= 1:
            _cnt, delta = struct.unpack(">II", payload[b0 + 4 : b0 + 12])
            if delta:
                fps = timescale / delta
    except (ValueError, struct.error):
        pass
    return frames, fps
