"""Multimodal columns — opaque binary media with typed metadata.

A 100 TB training-data pipeline carries images/audio/video as opaque
``binary`` columns beside typed metadata, and runs decode / feature /
resize / frame-sample stages as Arrow-batched UDFs. The image/audio
codec libraries are NOT in this environment, so the decode kernels are
STUBBED deterministically (clearly marked below) — but everything
Spark-side is real and tested: schemas, ``mapInPandas`` batch shapes,
partition behavior, and the driver-facing API. Swapping a stub for
PIL/ffmpeg/librosa changes only the per-batch function body.

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

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

    STUB: real decode needs PIL/turbojpeg, absent in this container —
    pass ``fake=True`` to run the DETERMINISTIC FAKE decoder (treats
    the blob as a row-major uint8 grid: width = first byte + 1, height
    = ceil(rest / width)), which keeps the Spark plumbing (schema,
    batching, resize arithmetic) fully exercised. With fake=False this
    raises NotImplementedError at plan execution time.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if not fake:
            raise NotImplementedError(
                "image decode requires PIL/libjpeg (not in this "
                "environment); pass fake=True for the deterministic "
                "stub decoder"
            )
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
                a = np.frombuffer(blob, dtype=np.uint8)
                w = int(a[0]) + 1
                body = a[1:]
                h = max(1, -(-body.size // w))
                pad = np.zeros(w * h, dtype=np.uint8)
                pad[: body.size] = body
                img = pad.reshape(h, w)
                # nearest-neighbor "resize" to thumb_size x thumb_size
                yi = np.linspace(0, h - 1, thumb_size).astype(int)
                xi = np.linspace(0, w - 1, thumb_size).astype(int)
                thumb = img[np.ix_(yi, xi)]
                out["width"].append(w)
                out["height"].append(h)
                out["mean_pixel"].append(float(body.mean()) if body.size else 0.0)
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


def audio_features(df: DataFrame, **_kw) -> DataFrame:
    """STUB: MFCC/spectrogram extraction needs librosa/ffmpeg, absent
    here. Raises immediately (driver-side) so pipelines fail fast."""
    raise NotImplementedError(
        "audio feature extraction requires librosa (not in this "
        "environment); the blob plumbing path is blob_features()"
    )
