"""Baseline JPEG codec (ext/jpeg.py): lossy, so the contract is
round-trip PSNR + exact determinism (re-encode of a decode is a fixed
point of the integer math), plus decode coverage of the stream
features external baseline JPEGs use (4:2:0, restart markers,
grayscale)."""

import numpy as np
import pytest

from meteaudata_spark.ext.jpeg import decode_jpeg, encode_jpeg


def _test_image(h=40, w=56):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 4) % 256, (yy * 5) % 256, ((xx + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return np.inf if mse == 0 else 10 * np.log10(255**2 / mse)


def test_jpeg_round_trip_psnr():
    arr = _test_image()
    out = decode_jpeg(encode_jpeg(arr, quality=90))
    assert out.shape == arr.shape
    assert _psnr(arr, out) > 35.0


def test_jpeg_420_round_trip():
    arr = _test_image()
    payload = encode_jpeg(arr, quality=90, subsample=True)
    out = decode_jpeg(payload)
    assert out.shape == arr.shape
    assert _psnr(arr, out) > 28.0  # chroma half-res costs fidelity
    assert len(payload) < len(encode_jpeg(arr, quality=90))


def test_jpeg_odd_dimensions():
    rng = np.random.default_rng(1)
    for sub in (False, True):
        arr = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(arr, quality=95, subsample=sub))
        assert out.shape == arr.shape


def test_jpeg_decode_is_deterministic_fixed_point():
    arr = _test_image(24, 24)
    p1 = encode_jpeg(arr, quality=85)
    d1 = decode_jpeg(p1)
    p2 = encode_jpeg(d1, quality=85)
    d2 = decode_jpeg(p2)
    # decode is bit-deterministic
    assert (decode_jpeg(p1) == d1).all()
    # re-encoding a decoded image converges (generation loss bounded)
    assert _psnr(d1, d2) > 40.0


def test_jpeg_quality_monotone():
    arr = _test_image()
    sizes = [len(encode_jpeg(arr, quality=q)) for q in (30, 60, 90)]
    assert sizes == sorted(sizes)
    assert _psnr(arr, decode_jpeg(encode_jpeg(arr, 90))) > _psnr(
        arr, decode_jpeg(encode_jpeg(arr, 30))
    )


def test_jpeg_rejects_non_baseline():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    # progressive SOF2 must be refused
    import struct

    sof2 = (
        b"\xff\xd8"
        + struct.pack(">HH", 0xFFC2, 11)
        + bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0])
    )
    with pytest.raises(ValueError):
        decode_jpeg(sof2)
    # truncated entropy stream
    arr = _test_image(16, 16)
    payload = encode_jpeg(arr)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_jpeg_dispatcher_integration():
    from meteaudata_spark.ext import multimodal

    arr = _test_image(8, 8)
    payload = encode_jpeg(arr, quality=90)
    flat = multimodal._decode_payload(payload)
    assert flat.shape == (8 * 8 * 3,)
    assert _psnr(arr.reshape(-1), flat) > 30.0


def test_jpeg_restart_markers_round_trip():
    arr = _test_image(48, 64)
    for sub in (False, True):
        payload = encode_jpeg(arr, quality=90, subsample=sub, restart_interval=2)
        assert b"\xff\xdd" in payload  # DRI present
        assert b"\xff\xd0" in payload  # at least one RST0
        out = decode_jpeg(payload)
        assert out.shape == arr.shape
        assert _psnr(arr, out) > (28.0 if sub else 35.0)
        # same pixels as the unrestarted stream: predictors reset cleanly
        base = decode_jpeg(encode_jpeg(arr, quality=90, subsample=sub))
        assert (out == base).all()


def test_jpeg_assets_through_spark_pipeline(spark):
    """JPEG payloads flow through the Arrow-batched extract_features
    map like every other codec — decode happens executor-side."""
    from meteaudata_spark.ext.multimodal import ASSET_SCHEMA, extract_features

    rng = np.random.default_rng(13)
    rows = []
    for i in range(6):
        arr = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        payload = encode_jpeg(arr, quality=90, subsample=bool(i % 2))
        meta = {"width": 16, "height": 16, "channels": 3,
                "sample_rate": None, "n_frames": None, "format": "jpeg"}
        rows.append((i, "image", payload, meta))
    assets = spark.createDataFrame(rows, ASSET_SCHEMA)
    feats = extract_features(assets).toPandas().sort_values("asset_id")
    assert len(feats) == 6
    assert (feats["n_bytes"].to_numpy() == [len(r[2]) for r in rows]).all()
    assert feats["payload_sha"].nunique() == 6
    # mean_byte is the EXECUTOR-side decoded pixel mean — match it
    # against a driver-side decode of the same payloads
    expected = [decode_jpeg(r[2]).astype(float).mean() for r in rows]
    got = feats["mean_byte"].astype(float).to_numpy()
    assert np.allclose(got, expected, atol=1e-6)


def test_lut_decoder_byte_identical_to_reference():
    """The vectorized-huffman path must reproduce the per-bit oracle
    decoder EXACTLY (same integer entropy decode, same matmul order in
    the batched IDCT) across sampling modes and restart intervals."""
    from meteaudata_spark.ext.jpeg import (
        _decode_jpeg_lut,
        _decode_jpeg_reference,
    )

    rng = np.random.default_rng(11)
    for h, w, sub, ri, q in [
        (64, 64, False, 0, 90),
        (48, 80, True, 0, 85),
        (33, 57, True, 4, 70),
        (8, 8, False, 0, 95),
        (17, 23, True, 2, 30),
    ]:
        yy, xx = np.mgrid[0:h, 0:w]
        base = (128 + 100 * np.sin(xx / 7.0) * np.cos(yy / 5.0)).astype(int)
        arr = np.clip(
            base[..., None] + rng.integers(-30, 30, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        payload = encode_jpeg(arr, quality=q, subsample=sub, restart_interval=ri)
        assert np.array_equal(
            _decode_jpeg_reference(payload), _decode_jpeg_lut(payload)
        ), (h, w, sub, ri, q)


def test_decode_accel_seam():
    """Default decode routes through the seam (PIL absent here → LUT
    path); explicit modes select implementations; junk modes raise."""
    from meteaudata_spark.ext.jpeg import _decode_jpeg_lut

    arr = np.full((16, 16, 3), 127, np.uint8)
    p = encode_jpeg(arr, quality=90)
    assert np.array_equal(decode_jpeg(p), _decode_jpeg_lut(p))
    assert np.array_equal(decode_jpeg(p, accel="reference"), decode_jpeg(p, accel="lut"))
    with pytest.raises(ValueError):
        decode_jpeg(p, accel="turbo")


def test_jpeg_truncated_mid_magnitude_bits_raises():
    """Round-8 guard regression (jpeg.py `pos + size > n_bits`): a
    stream cut so the final Huffman code's MAGNITUDE bits run past the
    end must raise, not decode garbage.  The pre-fix check
    (`pos >= n_bits`) read the zero-padded window past the stream end
    and silently returned a wrong image for exactly this payload
    (found by differential sweep old-guard vs new-guard, rng seed 0)."""
    rng = np.random.default_rng(0)
    arrs = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(3)]
    payload = encode_jpeg(arrs[2], quality=95)
    assert len(payload) > 778  # the sweep's divergent cut point
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(payload[:778])
    # the missing-EOI terminator check (same round) makes EVERY
    # byte-granular truncation detectable — even cuts whose stray
    # tail bits form valid Huffman codes (e.g. t=760 here decoded
    # to a wrong image under the magnitude guard alone)
    for t in range(len(payload) - 1, len(payload) - 80, -1):
        with pytest.raises(ValueError):
            decode_jpeg(payload[:t])
