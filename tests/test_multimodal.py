"""Multimodal plumbing: schemas, Arrow batch shapes, decode stubs."""

import pandas as pd
import pytest

from niamoto_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, b"\x01\x02\x03\x04" * 32, "image/png", 8, 8, {"frame_count": "30"}),
        (2, b"\xff\xee\xdd" * 50, "image/jpeg", 8, 8, {"frame_count": "5"}),
    ]
    return spark.createDataFrame(rows, mm.IMAGE_SCHEMA)


def test_media_features_schema_and_determinism(media):
    out = mm.media_features(media, use_fake_decoder=True, feature_dim=16)
    rows = {r["media_id"]: r for r in out.collect()}
    assert out.schema == mm.FEATURE_SCHEMA
    assert len(rows[1]["feature"]) == 16
    assert rows[1]["n_bytes"] == 128
    # deterministic: same payload -> same hash/features
    again = {r["media_id"]: r for r in
             mm.media_features(media, use_fake_decoder=True).collect()}
    assert again[1]["payload_hash"] == rows[1]["payload_hash"]
    assert again[1]["feature"] == rows[1]["feature"]


def test_media_resize_payload_shape(media):
    out = mm.media_resize(media, target=(4, 4), use_fake_decoder=True)
    rows = out.collect()
    for r in rows:
        assert len(r["payload"]) == 4 * 4 * 3
        assert (r["width"], r["height"]) == (4, 4)


def test_frame_sample_plan(media):
    out = mm.frame_sample_plan(media, every_n=10)
    got = {(r["media_id"], r["frame_idx"]) for r in out.collect()}
    assert got == {(1, 0), (1, 10), (1, 20), (2, 0)}


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"not an image")
