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
    assert feats.columns == ["doc_id", "width", "height", "n_bytes", "decode_error"]
    got = {r["doc_id"]: (r["width"], r["height"], r["n_bytes"]) for r in feats.collect()}
    assert len(got) == 10
    assert all(1 <= w <= 256 and 1 <= h <= 256 and n == 64 for w, h, n in got.values())
    assert feats.filter("decode_error IS NOT NULL").count() == 0


def test_extract_image_features_corrupt_blobs_become_error_rows(spark):
    """One corrupt payload must produce an error ROW, never a failed
    stage (at 100 TB a raise would retry 4× then kill the job)."""
    from pyspark.sql import functions as F

    df = attach_fake_media(
        spark.createDataFrame([(i,) for i in range(12)], ["doc_id"])
    )
    # inject three corruption modes: truncated-to-1-byte, empty, null
    df = df.withColumn(
        "media",
        F.when(F.col("doc_id") == 3, F.expr("substring(media, 1, 1)"))
        .when(F.col("doc_id") == 5, F.expr("substring(media, 1, 0)"))
        .when(F.col("doc_id") == 7, F.lit(None).cast("binary"))
        .otherwise(F.col("media")),
    )
    rows = {r["doc_id"]: r for r in extract_image_features(df).collect()}
    assert len(rows) == 12  # every input row survives, corrupt or not
    for bad in (3, 5, 7):
        assert rows[bad]["width"] is None and rows[bad]["height"] is None
        assert rows[bad]["decode_error"].startswith("undecodable")
    assert rows[3]["n_bytes"] == 1
    assert rows[5]["n_bytes"] == 0
    assert rows[7]["n_bytes"] is None
    ok = [r for i, r in rows.items() if i not in (3, 5, 7)]
    assert all(r["decode_error"] is None and r["n_bytes"] == 64 for r in ok)


def test_frames_and_resample_tolerate_null_blobs(spark):
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.multimodal import resample_media

    df = attach_fake_media(spark.createDataFrame([(1,), (2,)], ["doc_id"]))
    df = df.withColumn(
        "media",
        F.when(F.col("doc_id") == 2, F.lit(None).cast("binary")).otherwise(
            F.col("media")
        ),
    )
    frames = sample_frames(df, every_n_bytes=16).collect()
    assert {f["doc_id"] for f in frames} == {1}  # null blob → zero frames
    rs = {r["doc_id"]: r["resampled"] for r in resample_media(df).collect()}
    assert rs[2] is None and rs[1] is not None


def test_sample_frames_explodes_chunks(spark):
    df = attach_fake_media(spark.createDataFrame([(1,)], ["doc_id"]))
    frames = sample_frames(df, every_n_bytes=16).collect()
    assert len(frames) == 4  # 64 bytes / 16
    assert [f["frame_idx"] for f in sorted(frames, key=lambda r: r["frame_idx"])] == [0, 1, 2, 3]
    assert all(len(bytes(f["frame"])) == 16 for f in frames)
