"""Multimodal columns — opaque binary media with typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns beside typed metadata, and runs decode / feature /
resize / frame-sample stages as Arrow-batched UDFs.

Decoders: UNCOMPRESSED container formats are decoded for REAL in pure
numpy — PGM/PPM (P5/P6), BMP (BI_RGB 8/24/32-bit), and WAV (RIFF PCM
8/16-bit) need no codec library. Compressed codecs (JPEG/PNG/MP3/...)
require libs absent from this container and fail fast with a clear
error naming the format; swapping in PIL/ffmpeg/librosa changes only
the per-blob decode function, never the Spark plumbing.

Design rules (the parts that matter at scale):
- Blobs NEVER pass through a shuffle: every stage is ``mapInPandas``
  over the existing partitioning; only extracted (small) features may
  be aggregated/joined afterwards.
- Batch size is bounded by bytes, not rows: callers control
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` / input file
  splits; kernels stream one pandas batch at a time and never
  accumulate across batches.
- Deterministic: same blob -> same features, independent of
  partitioning (all kernels are per-row pure).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: magic-number -> human name for compressed formats we refuse clearly
_COMPRESSED_MAGICS = [
    (b"\xff\xd8\xff", "JPEG"),
    (b"\x89PNG", "PNG"),
    (b"GIF8", "GIF"),
    (b"RIFF????WEBP", "WEBP"),  # '?' = wildcard byte
    (b"ID3", "MP3"),
    (b"\xff\xfb", "MP3"),
    (b"OggS", "OGG"),
    (b"fLaC", "FLAC"),
]


def _compressed_format(blob: bytes) -> str | None:
    for magic, name in _COMPRESSED_MAGICS:
        if len(blob) < len(magic):
            continue
        if all(m in (0x3F,) or blob[i] == m  # 0x3F = '?' wildcard
               for i, m in enumerate(magic)):
            return name
    return None


def decode_image_gray(blob: bytes) -> np.ndarray:
    """Decode an UNCOMPRESSED image blob to a 2-D uint8 grayscale
    array. Real parsers, no codec libs:

    - PGM ``P5`` / PPM ``P6`` (binary netpbm, maxval <= 255; comments
      handled); RGB converts to gray by integer channel mean.
    - BMP ``BM`` with BI_RGB (compression 0), 8/24/32 bpp, bottom-up
      or top-down rows, 4-byte row padding.

    Compressed formats raise NotImplementedError naming the format and
    the library that would decode it.
    """
    if blob[:2] in (b"P5", b"P6"):
        return _decode_pnm(blob)
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    fmt = _compressed_format(blob)
    if fmt:
        raise NotImplementedError(
            f"{fmt} decode requires an image codec library (PIL/"
            "libjpeg-turbo), absent in this environment; uncompressed "
            "PGM/PPM/BMP decode natively"
        )
    raise ValueError("unrecognized image container (not PGM/PPM/BMP)")


def _decode_pnm(blob: bytes) -> np.ndarray:
    # header = magic, width, height, maxval as whitespace-separated
    # tokens, '#' comments allowed, then ONE whitespace byte then data
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        tokens.append(blob[i:j])
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    if w <= 0 or h <= 0:
        raise ValueError(f"degenerate netpbm dimensions {w}x{h}")
    if maxval > 255:
        raise ValueError("16-bit netpbm not supported")
    channels = 3 if blob[:2] == b"P6" else 1
    need = w * h * channels
    data = np.frombuffer(blob, dtype=np.uint8, count=need, offset=i)
    if channels == 3:
        rgb = data.reshape(h, w, 3).astype(np.uint16)
        return (rgb.sum(axis=2) // 3).astype(np.uint8)
    return data.reshape(h, w).copy()


def _decode_bmp(blob: bytes) -> np.ndarray:
    data_off = struct.unpack_from("<I", blob, 10)[0]
    dib_size = struct.unpack_from("<I", blob, 14)[0]
    if dib_size < 40:
        # 12-byte BITMAPCOREHEADER (OS/2) lays fields out differently —
        # reading the INFOHEADER offsets would decode garbage
        raise NotImplementedError(
            f"BMP with DIB header size {dib_size} (OS/2 core header) "
            "not supported; BITMAPINFOHEADER-family BI_RGB decodes "
            "natively"
        )
    w, h_raw = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0:
        raise NotImplementedError(
            "compressed BMP (BI_RLE/BI_BITFIELDS) not supported; only "
            "BI_RGB decodes natively"
        )
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    h = abs(h_raw)
    if w <= 0 or h == 0:
        raise ValueError(f"degenerate BMP dimensions {w}x{h_raw}")
    bottom_up = h_raw > 0
    row_bytes = ((w * bpp // 8) + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(
        blob, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)
    if bottom_up:
        rows = rows[::-1]
    px = rows[:, : w * bpp // 8]
    if bpp == 8:
        # 8bpp pixels are indices into the color table that follows the
        # DIB header (4-byte BGRX entries) — apply it, gray = mean(RGB)
        n_colors = struct.unpack_from("<I", blob, 46)[0] or 256
        pal = np.frombuffer(
            blob, dtype=np.uint8, count=n_colors * 4,
            offset=14 + dib_size,
        ).reshape(n_colors, 4)[:, :3].astype(np.uint16)
        gray_lut = (pal.sum(axis=1) // 3).astype(np.uint8)
        return gray_lut[px]
    ch = bpp // 8
    bgr = px.reshape(h, w, ch)[:, :, :3].astype(np.uint16)
    return (bgr.sum(axis=2) // 3).astype(np.uint8)


def decode_wav(blob: bytes) -> tuple[int, np.ndarray]:
    """Parse a RIFF/WAVE PCM blob (8- or 16-bit, any channel count) to
    (sample_rate, mono float64 samples in [-1, 1]). Pure struct/numpy —
    PCM wav is a raw sample container, no codec needed."""
    if blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        fmt = _compressed_format(blob)
        if fmt:
            raise NotImplementedError(
                f"{fmt} decode requires an audio codec library "
                "(ffmpeg/librosa), absent in this environment; PCM WAV "
                "decodes natively"
            )
        raise ValueError("unrecognized audio container (not RIFF/WAVE)")
    pos, fmt_chunk, data = 12, None, None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        size = struct.unpack_from("<I", blob, pos + 4)[0]
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt_chunk = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks pad to even
    if fmt_chunk is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt_chunk, 0)
    bits = struct.unpack_from("<H", fmt_chunk, 14)[0]
    if audio_fmt != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_fmt} (non-PCM) requires a codec "
            "library; only PCM decodes natively"
        )
    if bits == 16:
        samples = np.frombuffer(
            data, dtype="<i2", count=len(data) // 2
        ).astype(np.float64) / 32768.0
    elif bits == 8:
        samples = (
            np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0
        ) / 128.0
    else:
        raise ValueError(f"unsupported PCM bit depth {bits}")
    if n_ch > 1:
        samples = samples[: (samples.size // n_ch) * n_ch]
        samples = samples.reshape(-1, n_ch).mean(axis=1)
    return int(rate), samples

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), True),  # image|audio|video
        T.StructField("blob", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

BLOB_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("head_byte", T.IntegerType()),
        T.StructField("tail_byte", T.IntegerType()),
    ]
)


def blob_features(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """Cheap per-blob features (size, byte sum, head/tail bytes) via a
    numpy-vectorized Arrow pass — the validation/triage stage that runs
    BEFORE any expensive decode. Null blobs yield n_bytes=0."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nb, bs, hb, tb = [], [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                ids.append(mid)
                if blob is None or len(blob) == 0:
                    nb.append(0), bs.append(0), hb.append(-1), tb.append(-1)
                    continue
                a = np.frombuffer(blob, dtype=np.uint8)
                nb.append(int(a.size))
                bs.append(int(a.sum(dtype=np.int64)))
                hb.append(int(a[0]))
                tb.append(int(a[-1]))
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "n_bytes": nb,
                    "byte_sum": bs,
                    "head_byte": hb,
                    "tail_byte": tb,
                }
            )

    return df.select(id_col, blob_col).mapInPandas(
        kernel, BLOB_FEATURES_SCHEMA
    )


IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_pixel", T.DoubleType()),
        T.StructField("thumb", T.BinaryType()),  # resized pixel grid
    ]
)


def decode_and_thumbnail(
    df: DataFrame,
    thumb_size: int = 8,
    id_col: str = "media_id",
    blob_col: str = "blob",
    fake: bool = False,
) -> DataFrame:
    """Decode images and emit (width, height, mean_pixel, thumbnail).

    REAL decode for uncompressed containers (PGM/PPM/BMP — see
    ``decode_image_gray``); compressed formats (JPEG/PNG/...) raise
    NotImplementedError naming the missing codec library, surfaced at
    plan execution. ``fake=True`` keeps the legacy deterministic
    synthetic decoder (blob = raw uint8 grid, width = first byte + 1)
    for pipeline tests with arbitrary bytes.

    Thumbnail = nearest-neighbor resample to thumb_size x thumb_size
    grayscale (numpy index grid — no per-pixel Python)."""

    def to_gray(blob: bytes):
        """-> (gray 2-D array, mean) — fake mode keeps its original
        mean-over-unpadded-bytes semantics (pinned by tests)."""
        if fake:
            a = np.frombuffer(blob, dtype=np.uint8)
            w = int(a[0]) + 1
            body = a[1:]
            h = max(1, -(-body.size // w))
            pad = np.zeros(w * h, dtype=np.uint8)
            pad[: body.size] = body
            return pad.reshape(h, w), (
                float(body.mean()) if body.size else 0.0
            )
        img = decode_image_gray(bytes(blob))
        return img, float(img.mean())

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "mean_pixel": [], "thumb": []}
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                out["media_id"].append(mid)
                if blob is None or len(blob) < 2:
                    out["width"].append(0)
                    out["height"].append(0)
                    out["mean_pixel"].append(0.0)
                    out["thumb"].append(b"")
                    continue
                img, mean = to_gray(blob)
                h, w = img.shape
                yi = np.linspace(0, h - 1, thumb_size).astype(int)
                xi = np.linspace(0, w - 1, thumb_size).astype(int)
                thumb = img[np.ix_(yi, xi)]
                out["width"].append(w)
                out["height"].append(h)
                out["mean_pixel"].append(mean)
                out["thumb"].append(thumb.tobytes())
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        kernel, IMAGE_FEATURES_SCHEMA
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 10,
    id_col: str = "media_id",
    blob_col: str = "blob",
) -> DataFrame:
    """Video frame sampling, stub container format: the blob is a
    concatenation of fixed-size frames; emit every Nth frame as its
    own row. Real containers would seek keyframes here (ffmpeg) — the
    one-row-in / many-rows-out mapInPandas shape is what a real
    decoder plugs into."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                if blob is None:
                    continue
                n_frames = len(blob) // frame_bytes
                for fno in range(0, n_frames, every_n):
                    ids.append(mid)
                    nos.append(fno)
                    frames.append(
                        bytes(blob[fno * frame_bytes:(fno + 1) * frame_bytes])
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": nos, "frame": frames}
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, FRAME_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossings", T.LongType()),
    ]
)


def audio_features(
    df: DataFrame, id_col: str = "media_id", blob_col: str = "blob"
) -> DataFrame:
    """Audio triage features from PCM WAV blobs (REAL decode — RIFF
    parse + numpy, see ``decode_wav``): sample rate, length, RMS, peak
    amplitude, zero-crossing count. Compressed audio (MP3/OGG/FLAC)
    raises NotImplementedError naming the missing codec; MFCC/
    spectrogram stages would plug into the same kernel with
    librosa/ffmpeg. Null/empty blobs yield a zero row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                out["media_id"].append(mid)
                if blob is None or len(blob) == 0:
                    out["sample_rate"].append(0)
                    out["n_samples"].append(0)
                    out["duration_ms"].append(0)
                    out["rms"].append(0.0)
                    out["peak"].append(0.0)
                    out["zero_crossings"].append(0)
                    continue
                rate, samples = decode_wav(bytes(blob))
                n = samples.size
                out["sample_rate"].append(rate)
                out["n_samples"].append(n)
                out["duration_ms"].append(
                    int(round(n * 1000.0 / rate)) if rate else 0
                )
                out["rms"].append(
                    float(np.sqrt(np.mean(samples**2))) if n else 0.0
                )
                out["peak"].append(
                    float(np.abs(samples).max()) if n else 0.0
                )
                out["zero_crossings"].append(
                    int(np.count_nonzero(np.diff(np.signbit(samples))))
                    if n > 1
                    else 0
                )
            yield pd.DataFrame(out)

    return df.select(id_col, blob_col).mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )
