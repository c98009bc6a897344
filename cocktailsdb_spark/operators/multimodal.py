"""Multimodal columns (SURVEY.md §2.9 / north_star): image/audio/video as
opaque ``binary`` payloads with typed metadata, decoded and
feature-extracted by Arrow-batched ``mapInPandas`` stages.

Round 1 stubbed the codec step; round 2 makes it REAL with pure-stdlib
implementations of three public formats:

- **PNG** (image): chunk/CRC writer + reader, zlib-inflated scanlines,
  filter reconstruction (None/Sub/Up), pixel statistics, nearest-neighbor
  resize — no PIL needed for grayscale-8.
- **WAV** (audio): RIFF container via the stdlib ``wave`` module — sample
  rate, channel count, duration from the actual header/data chunk.
- **GIF89a** (video stand-in): logical-screen + image-descriptor walker
  over real LZW-coded sub-blocks; frame sampling = counting/locating the
  0x2C descriptors, the container-level half of video decode. (Pixel-level
  video codecs — H.264 etc — stay out of scope: no public pure-Python
  decoder is practical.)

The synthesizer derives every media parameter (dimensions, sample count,
frame count, pixel values) from ``doc_id`` by fixed arithmetic, so the
DuckDB oracle can PREDICT what a correct decoder must recover — the
decode provably inverts the encode, no image libs required on either side.

At 100 TB: payloads ride in parquet binary columns; mapInPandas keeps the
work per-partition with Arrow batch transfer (no driver involvement, no
shuffle); feature extraction is embarrassingly parallel.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tables import spread

# --- deterministic generation parameters (mirrored in the oracle SQL) -----

AUDIO_RATE = 8000


def _image_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 64 + 16, (doc_id * 7) % 48 + 16


def _image_row_value(doc_id: int, y: int) -> int:
    return (y + doc_id) % 256


def _audio_n_samples(doc_id: int) -> int:
    return (doc_id % 50 + 1) * 80


def _video_dims(doc_id: int) -> tuple[int, int]:
    return doc_id % 32 + 8, (doc_id * 5) % 32 + 8


def _video_n_frames(doc_id: int) -> int:
    return doc_id % 7 + 1


# --- PNG (ISO/IEC 15948): grayscale-8 writer + reader ---------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(doc_id: int) -> bytes:
    """Grayscale-8 PNG; scanline y is the constant byte (y+doc_id)%256,
    filter type 0 per row."""
    w, h = _image_dims(doc_id)
    raw = b"".join(
        b"\x00" + bytes([_image_row_value(doc_id, y)]) * w for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # bit depth 8, gray
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> list[bytes]:
    """Parse chunks (CRC-checked), inflate IDAT, reconstruct scanlines.
    Returns the rows of the grayscale image. Filters 0/1/2 supported (all
    this engine's writers emit 0); anything else raises."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, w = 8, None
    idat = b""
    while pos < len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            w, h, depth, color = struct.unpack(">IIBB", body[:10])
            if (depth, color) != (8, 0):
                raise ValueError("only grayscale-8 supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = zlib.decompress(idat)
    rows: list[bytes] = []
    stride = w + 1
    prev = bytes(w)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ftype, data = line[0], bytearray(line[1:])
        if ftype == 1:  # Sub
            for x in range(1, w):
                data[x] = (data[x] + data[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(w):
                data[x] = (data[x] + prev[x]) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unsupported PNG filter {ftype}")
        prev = bytes(data)
        rows.append(prev)
    return rows


def resize_nearest(rows: list[bytes], out_w: int, out_h: int) -> list[bytes]:
    """Nearest-neighbor thumbnail of a grayscale row list."""
    h, w = len(rows), len(rows[0])
    return [
        bytes(rows[y * h // out_h][x * w // out_w] for x in range(out_w))
        for y in range(out_h)
    ]


# --- WAV (RIFF) via the stdlib wave module --------------------------------


def encode_wav(doc_id: int) -> bytes:
    """Mono 16-bit PCM at AUDIO_RATE; sample i = ((i*13 + doc_id) % 1000) - 500.
    Samples vectorized through numpy — per-sample struct.pack was the
    encode hot spot at bench scale."""
    import numpy as np

    n = _audio_n_samples(doc_id)
    samples = ((np.arange(n, dtype=np.int64) * 13 + doc_id) % 1000 - 500).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(AUDIO_RATE)
        wv.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> dict:
    """Header fields + a DATA-chunk statistic: mean sample amplitude proves
    the decoder reads the actual PCM frames, not just the RIFF header."""
    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as wv:
        rate = wv.getframerate()
        n = wv.getnframes()
        samples = np.frombuffer(wv.readframes(n), dtype="<i2").astype(np.int64)
        return {
            "sample_rate": rate,
            "n_channels": wv.getnchannels(),
            "duration_ms": n * 1000 // rate,
            "mean_amp": float(samples.sum()) / max(n, 1),
        }


# --- GIF89a: container writer + frame walker ------------------------------


from functools import lru_cache


@lru_cache(maxsize=4096)
def _gif_lzw_blocks(n_pixels: int) -> bytes:
    """LZW-code ``n_pixels`` zero pixels with min code size 2: emit a clear
    code before every literal so the code width stays 3 bits — a valid,
    trivially-decodable stream (the classic uncompressed-GIF trick).
    Cached per pixel count: frame dimensions repeat heavily across a
    corpus, and the bit-packing loop dominated encode cost otherwise."""
    bits: list[int] = []
    clear, end = 4, 5
    for code in [clear] + [c for _ in range(n_pixels) for c in (0, clear)][:-1] + [end]:
        bits.extend((code >> k) & 1 for k in range(3))  # LSB-first, 3 bits
    data = bytearray()
    for i in range(0, len(bits), 8):
        data.append(sum(b << k for k, b in enumerate(bits[i : i + 8])))
    out = b""
    for i in range(0, len(data), 255):
        chunk = bytes(data[i : i + 255])
        out += bytes([len(chunk)]) + chunk
    return out + b"\x00"


def encode_gif(doc_id: int) -> bytes:
    """GIF89a, 2-entry global color table, _video_n_frames full-size frames."""
    w, h = _video_dims(doc_id)
    out = b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80, 0, 0)  # GCT, 2 colors
    out += b"\x00\x00\x00\xff\xff\xff"
    frame = struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0) + b"\x02" + _gif_lzw_blocks(w * h)
    out += frame * _video_n_frames(doc_id)
    return out + b"\x3b"


def decode_gif(payload: bytes) -> dict:
    """Walk the GIF block structure: logical screen size + frame count
    (image descriptors), skipping extensions and LZW sub-blocks."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, _, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    if packed & 0x80:
        pos += 3 * (2 << (packed & 0x07))

    def skip_subblocks(p: int) -> int:
        while payload[p]:
            p += payload[p] + 1
        return p + 1

    n_frames = 0
    while pos < len(payload):
        b = payload[pos]
        if b == 0x2C:  # image descriptor
            fpacked = payload[pos + 9]
            pos += 10
            if fpacked & 0x80:
                pos += 3 * (2 << (fpacked & 0x07))
            pos += 1  # LZW min code size
            pos = skip_subblocks(pos)
            n_frames += 1
        elif b == 0x21:  # extension
            pos = skip_subblocks(pos + 2)
        elif b == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
    return {"width": w, "height": h, "n_frames": n_frames}


# --- Spark plumbing -------------------------------------------------------

MEDIA_SCHEMA = "media_id long, kind string, payload binary"

FEATURE_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "sample_rate int, duration_ms int, mean_amp double, "
    "mean_luma double, thumb_mean double"
)

THUMB = 8  # thumbnail edge for the resize feature


# Every media parameter is an affine function of doc_id modulo a small
# constant (see the _image/_audio/_video param functions), so the payload
# bytes repeat exactly with these periods: the memoized encode turns a
# 50k-doc synthesis into ≤ period distinct codec runs per worker. The
# periods are the lcm of each format's parameter moduli.
PNG_PERIOD = 768  # lcm(64 width, 48 height·7, 256 row value)
WAV_PERIOD = 1000  # lcm(50 sample count, 1000 sample value)
GIF_PERIOD = 224  # lcm(32 width, 32 height·5, 7 frames)

# Decorate IN PLACE (wrapper replaces the module attribute under the same
# name) so cloudpickle can serialize the _synth closure by reference: a
# rebind to a new name leaves module.encode_png ≠ the wrapper and pickling
# the _lru_cache_wrapper by value fails.
encode_png = lru_cache(maxsize=PNG_PERIOD)(encode_png)
encode_wav = lru_cache(maxsize=WAV_PERIOD)(encode_wav)
encode_gif = lru_cache(maxsize=GIF_PERIOD)(encode_gif)


def synth_media(docs: DataFrame) -> DataFrame:
    """Synthesize a REAL media table from ``documents``: each doc becomes a
    PNG / WAV / GIF payload (kind cycles by doc_id % 3) with contents fully
    determined by doc_id. Stands in for ``spark.read.format("binaryFile")``
    / parquet binary scans, with bytes actual decoders accept."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoders = {
            0: ("image", encode_png, PNG_PERIOD),
            1: ("audio", encode_wav, WAV_PERIOD),
            2: ("video", encode_gif, GIF_PERIOD),
        }
        for pdf in batches:
            kinds, payloads = [], []
            for doc_id in pdf["doc_id"]:
                kind, enc, period = encoders[int(doc_id) % 3]
                kinds.append(kind)
                # doc_id % period yields byte-identical payloads (all
                # parameter moduli divide the period)
                payloads.append(enc(int(doc_id) % period))
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "kind": kinds, "payload": payloads}
            )

    return spread(docs).select("doc_id").mapInPandas(_synth, schema=MEDIA_SCHEMA)


def frame_sample(features: DataFrame, step: int = 2, fps: int = 10) -> DataFrame:
    """Frame sampling for video media: every ``step``-th frame index with
    its nominal timestamp at ``fps``. The Python decode stage yields
    ``n_frames`` once per payload (memoized); the per-frame expansion is
    JVM-side ``sequence`` + ``explode`` — the sampled-frame work list a
    downstream decode/caption stage would map over, produced without
    re-entering Python. At 100 TB the explode multiplies rows by
    ~n_frames/step, so it runs AFTER filters/pushdown, never before.

    Output: (media_id, n_frames, frame_idx, frame_ms).
    """
    ms_per_frame = 1000 // fps
    return (
        features.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "n_frames",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(step))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ms", F.col("frame_idx") * ms_per_frame)
    )


def _qround4(x: float) -> float:
    """Half-up 4-dp rounding — same as numeric.qround/sql_qround."""
    import math

    return math.floor(x * 10000.0 + 0.5) / 10000.0


@lru_cache(maxsize=4096)
def _payload_features(payload: bytes) -> dict:
    """Feature dict for one payload (everything except media_id/kind).
    Deterministic in the bytes, so memoized by the payload itself: the
    synthetic corpus repeats payloads with period ≤ 1000 per format, and
    real corpora repeat thumbnails/stock assets heavily too. The cache is
    per Python worker and workers are reused across partitions, so a
    full-corpus pass decodes each distinct payload once per worker."""
    row: dict = dict.fromkeys(
        (
            "width", "height", "n_frames", "sample_rate",
            "duration_ms", "mean_amp", "mean_luma", "thumb_mean",
        ),
        None,
    )
    if payload[:8] == PNG_SIG:
        rows = decode_png(payload)
        row["width"], row["height"] = len(rows[0]), len(rows)
        n = row["width"] * row["height"]
        row["mean_luma"] = _qround4(sum(sum(r) for r in rows) / n)
        thumb = resize_nearest(rows, THUMB, THUMB)
        row["thumb_mean"] = _qround4(sum(sum(r) for r in thumb) / (THUMB * THUMB))
        row["n_frames"] = 1
    elif payload[:4] == b"RIFF":
        d = decode_wav(payload)
        row["sample_rate"] = d["sample_rate"]
        row["duration_ms"] = d["duration_ms"]
        row["mean_amp"] = _qround4(d["mean_amp"])
    elif payload[:3] == b"GIF":
        row.update(decode_gif(payload))
    else:
        raise ValueError("unknown payload magic")
    return row


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over the binary payloads:
    PNG → dimensions, mean luma, 8×8 nearest-neighbor thumbnail mean;
    WAV → sample rate, duration; GIF → dimensions, frame count. The codec
    is dispatched on the payload's magic bytes, not the ``kind`` column —
    a mislabeled row fails loudly instead of mis-decoding."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "kind", "width", "height", "n_frames",
                "sample_rate", "duration_ms", "mean_amp", "mean_luma", "thumb_mean",
            )}
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                out["media_id"].append(media_id)
                out["kind"].append(kind)
                try:
                    feats = _payload_features(bytes(payload))
                except ValueError as exc:
                    # the memoized decode is id-free; re-attribute here so
                    # one bad payload in a 50k-row batch names its row
                    raise ValueError(f"media_id={media_id}: {exc}") from exc
                for k, v in feats.items():
                    out[k].append(v)
            yield pd.DataFrame(out)

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)
