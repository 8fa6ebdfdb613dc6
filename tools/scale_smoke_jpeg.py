"""Round-7 decode smoke: 500 synthetic JPEG assets through the
reference (per-bit) decoder vs the vectorized-huffman LUT path —
the accelerated seam must be >=10x on realistic payloads.

Usage: python tools/scale_smoke_jpeg.py [n_assets]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from meteaudata_spark.ext.jpeg import (  # noqa: E402
    _decode_jpeg_lut,
    _decode_jpeg_reference,
    encode_jpeg,
)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500
    rng = np.random.default_rng(42)
    payloads = []
    for i in range(n):
        h, w = int(rng.integers(64, 257)), int(rng.integers(64, 257))
        yy, xx = np.mgrid[0:h, 0:w]
        base = 128 + 90 * np.sin(xx / (3 + i % 7)) * np.cos(yy / (2 + i % 5))
        arr = np.clip(
            base[..., None] + rng.integers(-25, 25, (h, w, 3)), 0, 255
        ).astype(np.uint8)
        payloads.append(
            encode_jpeg(arr, quality=int(rng.integers(40, 95)),
                        subsample=bool(i % 2), restart_interval=(i % 3) * 4)
        )

    t0 = time.perf_counter()
    ref = [_decode_jpeg_reference(p) for p in payloads]
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    lut = [_decode_jpeg_lut(p) for p in payloads]
    t_lut = time.perf_counter() - t0
    identical = all(np.array_equal(a, b) for a, b in zip(ref, lut))
    print(
        f"jpeg decode x{n}: reference {t_ref:.1f}s "
        f"({n / t_ref:.0f}/s), lut {t_lut:.1f}s ({n / t_lut:.0f}/s), "
        f"speedup {t_ref / t_lut:.1f}x, byte-identical: {identical}",
        flush=True,
    )


if __name__ == "__main__":
    main()
