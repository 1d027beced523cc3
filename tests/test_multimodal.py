"""Multimodal binary-column plumbing: schemas, mapInPandas batch
shapes, determinism, and the stub gates (SURVEY.md §2.12 — beyond the
reference's surface; the task's training-pipeline operator set)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_clj_spark.functions import multimodal as mm


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


def test_decode_stub_raises_without_fake(spark, media):
    df = mm.decode_and_thumbnail(media)  # lazy
    with pytest.raises(Exception) as e:
        df.collect()
    assert "NotImplementedError" in str(e.value) or isinstance(
        e.value, NotImplementedError
    )


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


def test_audio_stub_fails_fast(spark, media):
    with pytest.raises(NotImplementedError):
        mm.audio_features(media)
