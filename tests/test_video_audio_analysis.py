"""Scene-change detection and audio segmentation over real codec
payloads (MJPEG AVI video, PCM16 WAV audio)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from meteaudata_spark.ext.avi import encode_avi_mjpeg
from meteaudata_spark.ext.multimodal import (
    audio_segments,
    encode_wav,
    video_scene_changes,
)


def test_scene_change_detects_cut(spark):
    # 8 dark frames then 8 bright frames: exactly one cut at frame 8
    dark = np.full((32, 32, 3), 30, dtype=np.uint8)
    bright = np.full((32, 32, 3), 220, dtype=np.uint8)
    frames = [dark] * 8 + [bright] * 8
    payload = encode_avi_mjpeg(frames, fps=10, quality=90)
    assets = spark.createDataFrame(
        pd.DataFrame(
            {"asset_id": [1], "modality": ["video"], "payload": [payload]}
        )
    )
    out = video_scene_changes(assets, threshold_millis=80).collect()
    cuts = [r["frame_no"] for r in out if r["is_cut"]]
    assert cuts == [8], out
    # luma plateaus on either side of the cut
    lumas = {r["frame_no"]: r["luma_millis"] for r in out}
    assert lumas[0] < 300 and lumas[15] > 700


def test_audio_segments_tone_silence_tone(spark):
    rate = 8000
    t = np.arange(rate // 2) / rate  # 0.5 s pieces
    tone = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    silence = np.zeros(rate // 2, dtype=np.int16)
    samples = np.concatenate([tone, silence, tone])
    payload = encode_wav(samples, rate)
    assets = spark.createDataFrame(
        pd.DataFrame({"asset_id": [7], "payload": [payload]})
    )
    segs = audio_segments(assets, frame_ms=25, hop_ms=25).collect()
    states = [r["state"] for r in segs]
    assert states == ["speech", "silence", "speech"], segs
    mid = segs[1]
    assert abs(mid["start_ms"] - 500) <= 50
    assert abs(mid["end_ms"] - 1000) <= 50
    # coverage: segments tile the clip without overlap
    for a, b in zip(segs, segs[1:]):
        assert b["start_ms"] >= a["end_ms"] - 25
