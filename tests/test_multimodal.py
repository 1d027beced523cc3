"""Multimodal binary-column plumbing: schemas, mapInPandas batch
shapes, determinism, real uncompressed-format decoders (PGM/PPM/BMP/
WAV), and the fail-fast gates for compressed codecs (SURVEY.md §2.12 —
beyond the reference's surface; the task's training-pipeline operator
set)."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_clj_spark.functions import multimodal as mm


def make_pgm(img: np.ndarray) -> bytes:
    h, w = img.shape
    return f"P5\n# comment\n{w} {h}\n255\n".encode() + img.tobytes()


def make_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return f"P6\n{w} {h}\n255\n".encode() + rgb.tobytes()


def make_bmp24(img_rgb: np.ndarray) -> bytes:
    """Minimal bottom-up BI_RGB 24-bit BMP."""
    h, w, _ = img_rgb.shape
    row = w * 3
    pad = (4 - row % 4) % 4
    body = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        r = img_rgb[y][:, ::-1].tobytes()  # RGB -> BGR
        body += r + b"\x00" * pad
    off = 14 + 40
    return (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<iiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                      2835, 2835, 0, 0)
        + body
    )


def make_wav(samples: np.ndarray, rate: int = 8000,
             bits: int = 16, ch: int = 1) -> bytes:
    if bits == 16:
        data = (samples * 32767).astype("<i2").tobytes()
    else:
        data = ((samples * 127) + 128).astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                      ch * bits // 8, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", bytes([3]) + bytes(range(12)), "image/fake", None,
         None, None),
        (1, "image", None, "image/fake", None, None, None),
        (2, "video", bytes(range(200)), "video/fake", None, None, 640),
        (3, "image", b"\x00", "image/fake", None, None, None),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_blob_features(spark, media):
    got = {r["media_id"]: r for r in mm.blob_features(media).collect()}
    assert got[0]["n_bytes"] == 13
    assert got[0]["byte_sum"] == 3 + sum(range(12))
    assert got[0]["head_byte"] == 3 and got[0]["tail_byte"] == 11
    assert got[1]["n_bytes"] == 0 and got[1]["head_byte"] == -1


def test_decode_pgm_ppm_bmp_real():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    assert (mm.decode_image_gray(make_pgm(img)) == img).all()
    rgb = np.stack([img, img, img], axis=2)
    assert (mm.decode_image_gray(make_ppm(rgb)) == img).all()
    got = mm.decode_image_gray(make_bmp24(rgb))
    assert (got == img).all()


def test_decode_bmp8_applies_palette():
    """8bpp BMP pixels are palette indices — an inverted-gray palette
    must invert the output (code-review r02 finding 3)."""
    w = h = 4
    idx_px = np.arange(16, dtype=np.uint8).reshape(h, w)
    pal = b"".join(
        bytes([255 - i, 255 - i, 255 - i, 0]) for i in range(256)
    )
    row_bytes = (w + 3) & ~3
    body = b""
    for y in range(h - 1, -1, -1):
        body += idx_px[y].tobytes() + b"\x00" * (row_bytes - w)
    off = 14 + 40 + len(pal)
    blob = (
        b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
        + struct.pack("<iiiHHIIiiII", 40, w, h, 1, 8, 0, len(body),
                      2835, 2835, 256, 0)
        + pal + body
    )
    got = mm.decode_image_gray(blob)
    assert (got == (255 - idx_px)).all()


def test_decode_degenerate_dimensions_rejected():
    with pytest.raises(ValueError, match="degenerate"):
        mm.decode_image_gray(b"P5\n0 0\n255\n")
    with pytest.raises(NotImplementedError, match="OS/2"):
        # 12-byte BITMAPCOREHEADER
        mm.decode_image_gray(
            b"BM" + struct.pack("<IHHI", 26, 0, 0, 26)
            + struct.pack("<IHHHH", 12, 2, 2, 1, 24)
        )


def test_decode_compressed_formats_fail_fast():
    with pytest.raises(NotImplementedError, match="JPEG"):
        mm.decode_image_gray(b"\xff\xd8\xff\xe0" + b"\x00" * 32)
    with pytest.raises(NotImplementedError, match="PNG"):
        mm.decode_image_gray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 32)
    with pytest.raises(ValueError, match="unrecognized"):
        mm.decode_image_gray(b"\x03garbagebytes")


def test_decode_and_thumbnail_real_formats(spark):
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    rows = [
        (0, "image", make_pgm(img), "image/x-pgm", None, None, None),
        (1, "image", make_bmp24(np.stack([img] * 3, axis=2)),
         "image/bmp", None, None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r
           for r in mm.decode_and_thumbnail(df, thumb_size=4).collect()}
    for mid in (0, 1):
        assert (got[mid]["width"], got[mid]["height"]) == (8, 8)
        assert got[mid]["mean_pixel"] == pytest.approx(img.mean())
        thumb = np.frombuffer(got[mid]["thumb"], np.uint8).reshape(4, 4)
        yi = np.linspace(0, 7, 4).astype(int)
        assert (thumb == img[np.ix_(yi, yi)]).all()


def test_fake_decode_and_thumbnail(spark, media):
    got = {
        r["media_id"]: r
        for r in mm.decode_and_thumbnail(media, thumb_size=2,
                                         fake=True).collect()
    }
    # blob 0: width = first byte + 1 = 4, body = 12 bytes -> h = 3
    assert (got[0]["width"], got[0]["height"]) == (4, 3)
    assert got[0]["mean_pixel"] == pytest.approx(np.mean(range(12)))
    thumb = np.frombuffer(got[0]["thumb"], dtype=np.uint8).reshape(2, 2)
    body = np.arange(12, dtype=np.uint8).reshape(3, 4)
    assert (thumb == body[np.ix_([0, 2], [0, 3])]).all()
    assert got[1]["width"] == 0 and got[1]["thumb"] == b""


def test_fake_decode_partition_invariant(spark, media):
    a = sorted(map(tuple, mm.decode_and_thumbnail(
        media.repartition(1), fake=True).collect()))
    b = sorted(map(tuple, mm.decode_and_thumbnail(
        media.repartition(7), fake=True).collect()))
    assert a == b


def test_sample_frames(spark, media):
    got = mm.sample_frames(media, frame_bytes=32, every_n=2).collect()
    by_id = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    # media 2: 200 bytes -> 6 whole frames -> sampled 0, 2, 4
    assert [r["frame_no"] for r in sorted(by_id[2], key=lambda r: r["frame_no"])] == [0, 2, 4]
    f0 = sorted(by_id[2], key=lambda r: r["frame_no"])[0]["frame"]
    assert f0 == bytes(range(32))
    # 13-byte image blob has 0 whole 32-byte frames
    assert 0 not in by_id


def test_audio_features_real_wav(spark):
    t = np.arange(8000) / 8000.0
    sine = np.sin(2 * np.pi * 440 * t)  # 1s of A440
    rows = [
        (0, "audio", make_wav(sine, rate=8000, bits=16), "audio/wav",
         None, None, None),
        (1, "audio", make_wav(sine[:4000], rate=8000, bits=8, ch=1),
         "audio/wav", None, None, None),
        (2, "audio", None, "audio/wav", None, None, None),
    ]
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in mm.audio_features(df).collect()}
    assert got[0]["sample_rate"] == 8000
    assert got[0]["n_samples"] == 8000
    assert got[0]["duration_ms"] == 1000
    # sine RMS = 1/sqrt(2), 440 Hz -> ~880 zero crossings/s
    assert got[0]["rms"] == pytest.approx(1 / np.sqrt(2), rel=1e-3)
    assert abs(got[0]["zero_crossings"] - 880) <= 2
    assert got[0]["peak"] == pytest.approx(1.0, rel=1e-3)
    assert got[1]["duration_ms"] == 500
    assert got[2]["n_samples"] == 0 and got[2]["rms"] == 0.0


def test_audio_stereo_downmix_and_compressed_fail():
    stereo = np.tile(np.linspace(-0.5, 0.5, 100), 2)
    inter = np.empty(200)
    inter[0::2] = stereo[:100]   # L
    inter[1::2] = -stereo[:100]  # R (cancels on downmix)
    rate, mono = mm.decode_wav(make_wav(inter, rate=4000, ch=2))
    assert rate == 4000 and mono.size == 100
    assert np.abs(mono).max() < 1e-4  # L+R cancel
    with pytest.raises(NotImplementedError, match="MP3"):
        mm.decode_wav(b"ID3\x04\x00" + b"\x00" * 32)
