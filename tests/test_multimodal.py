"""Multimodal plumbing: payload/metadata columns, the Arrow decode
stage (stubbed kernel), frame sampling, and determinism."""

import pytest

from distributed_system_mapreduce_spark.operators import multimodal as M
from tests.conftest import SF_DIR


def test_payloads_are_binary_with_typed_meta(spark):
    from distributed_system_mapreduce_spark.tables import load_table

    mm = M.attach_payloads(load_table(spark, "documents", SF_DIR))
    types = dict(mm.dtypes)
    assert types["payload"] == "binary"
    assert types["media_type"] == "string"
    assert types["meta"].startswith("struct")
    assert set(r["media_type"] for r in
               mm.select("media_type").distinct().collect()) == set(
                   M.MEDIA_TYPES)


def test_decode_features_schema_and_determinism(spark):
    a = M.multimodal_decode(spark, SF_DIR)
    rows1 = {r["doc_id"]: tuple(r) for r in a.collect()}
    rows2 = {r["doc_id"]: tuple(r) for r in
             M.multimodal_decode(spark, SF_DIR).collect()}
    assert rows1 == rows2
    assert len(rows1) == 500
    some = next(iter(rows1.values()))
    assert len(some) == 10


def test_media_specific_fields(spark):
    decoded = M.multimodal_decode(spark, SF_DIR)
    img = decoded.filter("media_type = 'image'").first()
    assert img["width"] and img["height"] and img["sample_rate"] is None
    aud = decoded.filter("media_type = 'audio'").first()
    assert aud["sample_rate"] and aud["width"] is None
    vid = decoded.filter("media_type = 'video'").first()
    assert vid["n_frames"] and vid["n_channels"] == 3


def test_frame_sample_every_24(spark):
    fs = M.multimodal_frame_sample = M.frame_sample(spark, SF_DIR)
    r = fs.groupBy("doc_id").count().first()
    assert r["count"] >= 1
    idx = [x["frame_idx"] for x in
           fs.filter(fs.doc_id == r["doc_id"]).collect()]
    assert idx == list(range(0, max(idx) + 1, 24))


def test_decode_real_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        M.decode_real(b"bytes", "image")
