"""Real decode kernels behind the multimodal pluggable seam: the
stdlib PNG/WAV decoders run everywhere (no media library needed); the
Pillow/pyav kernels are skipif-gated on the import."""

from __future__ import annotations

import importlib.util
import io
import struct
import wave
import zlib

import numpy as np
import pytest

from dystonse_gtfs_data_spark.operators.multimodal import (
    best_image_decode,
    best_video_decode,
    decode_and_featurize_images,
    pillow_image_decode,
    png_image_decode,
    pyav_video_decode,
    sample_audio_features,
    video_decode_stub,
    wav_audio_decode,
)
from dystonse_gtfs_data_spark.operators.render import encode_png_rgba

HAS_PIL = importlib.util.find_spec("PIL") is not None
HAS_AV = importlib.util.find_spec("av") is not None


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _make_png(img: np.ndarray, filters: list[int]) -> bytes:
    """Hand-encode an 8-bit PNG applying the given filter per row
    (PNG spec 9: filtered = raw - predictor mod 256)."""
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    lines = []
    prev = np.zeros(stride, dtype=np.int32)
    for y, f in zip(range(h), filters):
        raw = flat[y]
        filt = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            a = raw[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (raw[x] - pred) & 0xFF
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"".join(lines)))
        + _png_chunk(b"IEND", b"")
    )


class TestPngDecode:
    def test_roundtrip_with_repo_encoder(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(5, 7, 4), dtype=np.uint8)
        png = encode_png_rgba(img.tobytes(), 7, 5)
        out = png_image_decode(png)
        assert out.shape == (5, 7, 4)
        assert np.array_equal(out, img)

    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    def test_all_filters_all_color_types(self, channels):
        rng = np.random.default_rng(channels)
        img = rng.integers(0, 256, size=(5, 4, channels), dtype=np.uint8)
        png = _make_png(img, filters=[0, 1, 2, 3, 4])
        assert np.array_equal(png_image_decode(png), img)

    def test_rejects_non_png(self):
        with pytest.raises(ValueError, match="not a PNG"):
            png_image_decode(b"\xff\xd8\xff\xe0 not a png")

    def test_spark_pipeline_with_real_kernel(self, spark):
        rng = np.random.default_rng(11)
        blobs = [
            encode_png_rgba(
                rng.integers(0, 256, size=(6, 6, 4), dtype=np.uint8).tobytes(), 6, 6
            )
            for _ in range(4)
        ]
        assets = spark.createDataFrame(
            [(i, b) for i, b in enumerate(blobs)], "asset_id long, content binary"
        )
        out = decode_and_featurize_images(assets, decode=png_image_decode).collect()
        assert len(out) == 4
        for r in out:
            assert (r["width"], r["height"]) == (6, 6)
            assert len(r["thumbnail"]) == 4 * 4 * 4  # 4×4 thumb × RGBA
            assert 0.0 <= r["mean_intensity"] <= 255.0


class TestWavDecode:
    def _wav(self, samples: np.ndarray, nch: int = 1) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(nch)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((samples * 32767).astype("<i2").tobytes())
        return buf.getvalue()

    def test_sine_rms(self):
        t = np.arange(16000) / 16000.0
        sine = 0.5 * np.sin(2 * np.pi * 440 * t)
        frames = wav_audio_decode(self._wav(sine))
        assert frames.shape == (100, 160)
        # RMS of a 0.5-amplitude sine ≈ 0.5/√2
        assert abs(float(np.sqrt((frames**2).mean())) - 0.5 / 2**0.5) < 0.01

    def test_stereo_downmix_and_short_tail(self):
        stereo = np.stack(
            [np.full(250, 0.25), np.full(250, -0.25)], axis=1
        ).ravel()
        frames = wav_audio_decode(self._wav(stereo, nch=2))
        assert frames.shape == (1, 160)  # 250 samples → one whole frame
        assert abs(frames.mean()) < 1e-4  # L/R average to ~0

    def test_spark_pipeline_with_real_kernel(self, spark):
        t = np.arange(800) / 16000.0
        blob = self._wav(0.3 * np.sin(2 * np.pi * 220 * t))
        assets = spark.createDataFrame(
            [(1, blob)], "asset_id long, content binary"
        )
        out = sample_audio_features(assets, decode=wav_audio_decode).collect()
        assert len(out) == 1 and out[0]["n_frames"] == 5
        assert all(0.0 < v < 1.0 for v in out[0]["rms"])


class TestKernelSelection:
    def test_best_image_decode_matches_environment(self):
        k = best_image_decode()
        assert k is (pillow_image_decode if HAS_PIL else png_image_decode)

    def test_best_video_decode_matches_environment(self):
        k = best_video_decode()
        assert k is (pyav_video_decode if HAS_AV else video_decode_stub)

    @pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
    def test_pillow_kernel_decodes_png(self):
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, size=(3, 3, 4), dtype=np.uint8)
        out = pillow_image_decode(encode_png_rgba(img.tobytes(), 3, 3))
        assert out.shape == (3, 3, 3)  # converted to RGB

    @pytest.mark.skipif(not HAS_AV, reason="pyav not installed")
    def test_pyav_kernel_smoke(self):
        with pytest.raises(Exception):  # no fixture clip in-container
            pyav_video_decode(b"not a video")
