"""Real-codec multimodal pipeline: PNG/WAV/GIF encode→decode inversion,
filter reconstruction, corrupt-payload failure, and the distributed
mapInPandas feature extraction."""

from __future__ import annotations

import struct
import zlib

import pytest

from cocktailsdb_spark.operators import multimodal as M
from cocktailsdb_spark.tables import load


def test_png_roundtrip_and_filters():
    rows = M.decode_png(M.encode_png(33))
    w, h = M._image_dims(33)
    assert (len(rows[0]), len(rows)) == (w, h)
    assert all(set(r) == {M._image_row_value(33, y)} for y, r in enumerate(rows))
    # decoder also reconstructs Sub (1) and Up (2) filtered scanlines
    plain = [bytes((x * 3 + y) % 256 for x in range(5)) for y in range(4)]
    raw = bytearray()
    for y, r in enumerate(plain):
        if y == 1:  # Sub: delta vs left neighbor
            raw += b"\x01" + bytes([r[0]] + [(r[x] - r[x - 1]) & 0xFF for x in range(1, 5)])
        elif y == 2:  # Up: delta vs previous row
            raw += b"\x02" + bytes((r[x] - plain[1][x]) & 0xFF for x in range(5))
        else:
            raw += b"\x00" + r
    ihdr = struct.pack(">IIBBBBB", 5, 4, 8, 0, 0, 0, 0)
    png = (
        M.PNG_SIG
        + M._png_chunk(b"IHDR", ihdr)
        + M._png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + M._png_chunk(b"IEND", b"")
    )
    assert M.decode_png(png) == plain


def test_png_crc_checked():
    png = bytearray(M.encode_png(7))
    png[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        M.decode_png(bytes(png))


def test_wav_header_and_sample_fields():
    d = M.decode_wav(M.encode_wav(10))
    assert d["sample_rate"] == M.AUDIO_RATE
    assert d["n_channels"] == 1
    n = M._audio_n_samples(10)
    assert d["duration_ms"] == n * 1000 // M.AUDIO_RATE
    # mean amplitude computed from the actual PCM frames
    exp = sum((i * 13 + 10) % 1000 - 500 for i in range(n)) / n
    assert abs(d["mean_amp"] - exp) < 1e-9


def test_gif_frame_walker():
    for doc_id in (2, 5, 20, 41):
        g = M.decode_gif(M.encode_gif(doc_id))
        w, h = M._video_dims(doc_id)
        assert g == {"width": w, "height": h, "n_frames": M._video_n_frames(doc_id)}


def test_unknown_magic_raises():
    with pytest.raises(ValueError, match="not a PNG"):
        M.decode_png(b"garbage")
    with pytest.raises(ValueError, match="not a GIF"):
        M.decode_gif(b"garbage")


def test_features_decode_inverts_encode(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(30)
    feats = {r["media_id"]: r for r in M.extract_features(M.synth_media(docs)).collect()}
    assert len(feats) == 30
    for media_id, r in feats.items():
        if media_id % 3 == 0:
            w, h = M._image_dims(media_id)
            assert (r["kind"], r["width"], r["height"], r["n_frames"]) == ("image", w, h, 1)
            exp = sum((y + media_id) % 256 for y in range(h)) / h
            assert abs(r["mean_luma"] - exp) < 1e-4
            assert r["sample_rate"] is None
        elif media_id % 3 == 1:
            assert r["kind"] == "audio" and r["sample_rate"] == M.AUDIO_RATE
            n = M._audio_n_samples(media_id)
            assert r["duration_ms"] == n * 1000 // M.AUDIO_RATE
            exp_amp = sum((i * 13 + media_id) % 1000 - 500 for i in range(n)) / n
            assert abs(r["mean_amp"] - exp_amp) < 1e-4
            assert r["width"] is None and r["mean_luma"] is None
        else:
            w, h = M._video_dims(media_id)
            assert (r["kind"], r["width"], r["height"]) == ("video", w, h)
            assert r["n_frames"] == M._video_n_frames(media_id)


def test_frame_sample_every_second_frame(spark):
    rows = [
        (1, "video", 8, 8, 5, None, None, None, None, None),
        (2, "video", 8, 8, 1, None, None, None, None, None),
        (3, "image", 8, 8, 1, None, None, None, None, None),  # filtered out
    ]
    feats = spark.createDataFrame(rows, M.FEATURE_SCHEMA)
    out = M.frame_sample(feats, step=2, fps=10).collect()
    got = sorted((r["media_id"], r["frame_idx"], r["frame_ms"]) for r in out)
    assert got == [(1, 0, 0), (1, 2, 200), (1, 4, 400), (2, 0, 0)]
