"""Multimodal plumbing: schemas, batch shapes, stub decode contract."""

from __future__ import annotations

import pytest

from relation_extraction_cdr_spark.operators import multimodal as MM


def test_media_schema(spark):
    media = MM.gen_media_df(spark, 12)
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,"
        "meta:struct<width:int,height:int,duration_ms:int,codec:string>>"
    )
    assert media.count() == 12


def test_extract_features_shapes(spark):
    media = MM.gen_media_df(spark, 12)
    feats = MM.extract_features(media).collect()
    assert len(feats) == 12
    for r in feats:
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])
        if r["kind"] == "video":
            assert r["n_frames"] >= 1


def test_extract_deterministic(spark):
    media = MM.gen_media_df(spark, 6)
    a = sorted(map(tuple, MM.extract_features(media).collect()))
    b = sorted(map(tuple, MM.extract_features(media).collect()))
    assert a == b


def test_unknown_kind_raises():
    with pytest.raises(NotImplementedError):
        MM._fake_decode(b"xx", "hologram")


def test_resize_meta(spark):
    media = MM.gen_media_df(spark, 8)
    plan = MM.resize_meta(media, max_side=128).collect()
    for r in plan:
        assert max(r["target_w"], r["target_h"]) <= 128
