"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side contract is real and tested: typed schemas, Arrow-batched
``mapInPandas`` with bounded batch memory, and partition-count preservation.

Decode status (no codec libraries in this container):

* **real, pure numpy** — PPM (P6) image decode, WAV PCM-16 audio decode,
  nearest-neighbor image resize. These run on actual bytes and are
  value-tested.
* **gated** — compressed image formats decode through PIL when it is
  installed (``HAVE_REAL_CODECS``; absent in this container, branch guarded
  and fallback-safe); everything else falls back to deterministic
  byte-statistics features. Audio/video codec swaps (librosa/av) are a
  manual edit of :func:`_decode_any` — the Spark plan around it never
  changes.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, kind string, data binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = "media_id string, kind string, n_bytes long, feature array<float>"

HAVE_REAL_CODECS = False  # flipped when PIL/librosa/av are importable
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_REAL_CODECS = True
except Exception:
    pass


# ---------------------------------------------------------------------------
# Real pure-numpy decoders (uncompressed container formats)
# ---------------------------------------------------------------------------

def decode_ppm_p6(buf: bytes) -> np.ndarray | None:
    """Minimal binary-PPM (P6, maxval ≤ 255) → ``uint8 (h, w, 3)``;
    None when the buffer is not a P6 stream."""
    if not buf or not buf.startswith(b"P6"):
        return None
    # header = magic, width, height, maxval separated by whitespace/comments
    fields: list[bytes] = []
    i = 2
    while len(fields) < 3 and i < len(buf):
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":  # comment to end-of-line
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        fields.append(buf[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raw samples
    try:
        w, h, maxval = (int(f) for f in fields)
    except ValueError:
        return None
    if maxval > 255 or w <= 0 or h <= 0 or len(buf) - i < w * h * 3:
        return None
    return np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=i).reshape(
        h, w, 3
    )


def decode_wav_pcm16(buf: bytes) -> tuple[np.ndarray, int] | None:
    """Minimal RIFF/WAVE PCM-16 → ``(int16 samples, sample_rate)``;
    None when the buffer is not a PCM-16 WAV."""
    if not buf or len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        return None
    pos, rate, data = 12, None, None
    # a malformed chunk (truncated fmt, declared size past the buffer, odd
    # sample payload) must degrade to None, never raise — one corrupt file
    # in a 10^12-file corpus must not kill the extract_features stage
    try:
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            size = struct.unpack("<I", buf[pos + 4 : pos + 8])[0]
            body = buf[pos + 8 : pos + 8 + size]
            if cid == b"fmt ":
                if len(body) < 16:
                    return None
                fmt, _ch, rate = struct.unpack("<HHI", body[:8])
                bits = struct.unpack("<H", body[14:16])[0]
                if fmt != 1 or bits != 16:  # PCM-16 only
                    return None
            elif cid == b"data":
                n = len(body) - len(body) % 2
                data = np.frombuffer(body[:n], dtype="<i2")
            pos += 8 + size + (size & 1)  # chunks are word-aligned
    except (struct.error, ValueError):
        return None
    if rate is None or data is None:
        return None
    return data, rate


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (h, w[, c]) → (out_h, out_w[, c]) — index
    sampling, no interpolation libs needed."""
    h, w = img.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return img[rows][:, cols]


def _decode_any(buf: bytes | None) -> np.ndarray:
    """Per-buffer feature kernel → float32 feature vector.

    PPM → [w, h, mean_r, mean_g, mean_b, std_gray];
    WAV PCM-16 → [n_samples, sample_rate, rms, zero-crossings];
    anything else (compressed formats, no codec libs) → byte-stat fallback
    [n_bytes, mean, std, first_byte] — deterministic, clearly weaker.
    """
    if buf:
        img = decode_ppm_p6(bytes(buf))
        if img is None and HAVE_REAL_CODECS:  # pragma: no cover - no PIL here
            try:
                import io

                import PIL.Image

                img = np.asarray(PIL.Image.open(io.BytesIO(bytes(buf))).convert("RGB"))
            except Exception:
                img = None
        if img is not None:
            gray = img.astype(np.float32).mean(axis=2)
            return np.array(
                [
                    img.shape[1],
                    img.shape[0],
                    img[..., 0].mean(),
                    img[..., 1].mean(),
                    img[..., 2].mean(),
                    gray.std(),
                ],
                dtype=np.float32,
            )
        wav = decode_wav_pcm16(bytes(buf))
        if wav is not None:
            samples, rate = wav
            x = samples.astype(np.float32)
            zc = int(np.count_nonzero(np.diff(np.signbit(x)))) if len(x) > 1 else 0
            rms = float(np.sqrt((x * x).mean())) if len(x) else 0.0
            return np.array([len(x), rate, rms, zc], dtype=np.float32)
    arr = np.frombuffer(buf or b"\x00", dtype=np.uint8)
    return np.array(
        [len(arr), float(arr.mean()), float(arr.std()), float(arr[0])],
        dtype=np.float32,
    )


def extract_features(media: DataFrame, batch_rows: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``mapInPandas`` keeps each Arrow batch bounded (binary payloads can be
    huge — cap via ``spark.sql.execution.arrow.maxRecordsPerBatch`` at the
    session level for real media).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                feats = [_decode_any(b) for b in chunk["data"]]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].values,
                        "kind": chunk["kind"].values,
                        "n_bytes": chunk["data"].map(
                            lambda b: len(b) if b is not None else 0
                        ).astype("int64").values,
                        "feature": feats,
                    }
                )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


def make_ppm(w: int, h: int, rng: np.random.RandomState) -> bytes:
    """Valid binary-PPM payload (used by the synthetic table + tests)."""
    pixels = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def make_wav_pcm16(n: int, rate: int, rng: np.random.RandomState) -> bytes:
    """Valid RIFF/WAVE PCM-16 mono payload."""
    samples = (rng.standard_normal(n) * 3000).astype("<i2")
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media table for tests: REAL PPM images and PCM WAVs
    (decodable by the pure-numpy kernels) plus opaque 'video' payloads
    (compressed-format stand-ins that exercise the fallback path)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            w = 8 + (i % 5) * 4
            payload = make_ppm(w, 8, rng)
            meta = (w, 8, None, None)
        elif kind == "audio":
            payload = make_wav_pcm16(256 + (i % 4) * 64, 16000, rng)
            meta = (None, None, 16000, None)
        else:
            payload = rng.bytes(64 + (i % 5) * 32)
            meta = (None, None, None, 30)
        rows.append((f"m{i:04d}", kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video rows: explode sampled frame indexes
    (decode stubbed — indexes only, deterministic)."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_idx",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(0)),
                    F.lit(every_n),
                )
            ),
        )
        .select("media_id", "frame_idx")
    )
