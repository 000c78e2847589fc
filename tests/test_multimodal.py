"""Multimodal plumbing: binary columns + metadata + Arrow-batched
decode/frame-sample shapes (codec itself is a deterministic stub)."""

from __future__ import annotations

from distributed_mapreduce_spark.multimodal import (
    attach_fake_media,
    extract_image_features,
    sample_frames,
)


def test_attach_fake_media_schema_and_determinism(spark):
    df = spark.createDataFrame([(1,), (2,)], ["doc_id"])
    m = attach_fake_media(df)
    assert dict(m.dtypes)["media"] == "binary"
    assert dict(m.dtypes)["media_meta"].startswith("struct<media_type:string")
    rows = {r["doc_id"]: bytes(r["media"]) for r in m.collect()}
    rows2 = {r["doc_id"]: bytes(r["media"]) for r in attach_fake_media(df).collect()}
    assert rows == rows2  # deterministic blobs
    assert all(len(b) == 64 for b in rows.values())
    meta = m.collect()[0]["media_meta"]
    assert meta["media_type"] == "image" and meta["n_bytes"] == 64


def test_extract_image_features_batch_shape(spark):
    df = attach_fake_media(spark.createDataFrame([(i,) for i in range(10)], ["doc_id"]))
    feats = extract_image_features(df)
    assert feats.columns == ["doc_id", "width", "height", "n_bytes"]
    got = {r["doc_id"]: (r["width"], r["height"], r["n_bytes"]) for r in feats.collect()}
    assert len(got) == 10
    assert all(1 <= w <= 256 and 1 <= h <= 256 and n == 64 for w, h, n in got.values())


def test_sample_frames_explodes_chunks(spark):
    df = attach_fake_media(spark.createDataFrame([(1,)], ["doc_id"]))
    frames = sample_frames(df, every_n_bytes=16).collect()
    assert len(frames) == 4  # 64 bytes / 16
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert all(len(bytes(f["frame"])) == 16 for f in frames)
