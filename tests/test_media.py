"""Multimodal operator tests: the Spark plumbing (schemas, Arrow batch
shapes, per-modality routing) is exercised for real with the
deterministic fake codec; the strict stub is asserted to raise."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from conte_to_fresco_etl_spark.operators.media import (
    decode_stats,
    extract_features,
    fake_codec,
    resize_images,
    sample_frames,
    strict_codec,
)
from conte_to_fresco_etl_spark.schemas import MEDIA_SCHEMA


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", b"img-payload-1", ("image/png", 640, 480, None, None)),
        (2, "image", b"img-payload-2", ("image/png", 64, 64, None, None)),
        (3, "audio", b"audio-payload", ("audio/wav", None, None, 2500, 16000)),
        (4, "video", b"video-payload", ("video/mp4", 1920, 1080, 3500, None)),
        (5, "image", None, ("image/png", 1, 1, None, None)),  # null payload
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_stats_deterministic(spark, media_df):
    out = decode_stats(media_df, codec=fake_codec)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,modality:string,n_bytes:bigint,"
        "payload_md5:string,n_values:bigint,mean:double,std:double>"
    )
    rows = {r["media_id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3, 4}  # null payload dropped
    assert rows[1]["n_values"] == 64  # 8x8 image grid
    assert rows[3]["n_values"] == 64  # audio sample vector
    # payload fidelity across the Arrow boundary: length + content hash
    assert rows[1]["n_bytes"] == len(b"img-payload-1")
    assert rows[1]["payload_md5"] == hashlib.md5(b"img-payload-1").hexdigest()
    # exact reproducibility against a local decode of the same payload
    expected = float(fake_codec(b"img-payload-1", "image").mean())
    assert rows[1]["mean"] == pytest.approx(expected, abs=1e-12)


def test_extract_features_feeds_similarity(spark, media_df):
    feats = extract_features(media_df, codec=fake_codec, dim=64)
    assert feats.schema.simpleString() == (
        "struct<media_id:bigint,embedding:array<float>>"
    )
    got = {r["media_id"]: r["embedding"] for r in feats.collect()}
    assert all(len(v) == 64 for v in got.values())
    # embedding column is consumable by the similarity operators
    from conte_to_fresco_etl_spark.operators.similarity import brute_force_topk

    renamed = feats.withColumnRenamed("media_id", "vec_id")
    topk = brute_force_topk(renamed, renamed.filter(F.col("vec_id") == 1), k=2)
    assert [r["rank"] for r in topk.collect()] == [1, 2]


def test_resize_images(spark, media_df):
    out = resize_images(media_df, width=4, height=2, codec=fake_codec)
    rows = out.collect()
    assert {r["media_id"] for r in rows} == {1, 2}  # images only
    arr = np.frombuffer(rows[0]["payload"], dtype=np.float32)
    assert arr.size == 4 * 2


def test_sample_frames(spark, media_df):
    out = sample_frames(media_df, every_ms=1000, codec=fake_codec)
    rows = sorted(out.collect(), key=lambda r: r["frame_index"])
    # 3500 ms at 1000 ms cadence → 3 frames, video rows only
    assert [r["frame_index"] for r in rows] == [0, 1, 2]
    assert [r["timestamp_ms"] for r in rows] == [0, 1000, 2000]
    assert all(r["media_id"] == 4 for r in rows)


def test_strict_codec_raises():
    with pytest.raises(NotImplementedError):
        strict_codec(b"x", "image")


def test_fake_codec_stable():
    a = fake_codec(b"same-bytes", "image")
    b = fake_codec(b"same-bytes", "image")
    assert np.array_equal(a, b)
    assert a.shape == (8, 8) and a.dtype == np.float32
    digest = hashlib.md5(b"same-bytes").digest()
    assert digest  # seeding is content-derived, not time/random
