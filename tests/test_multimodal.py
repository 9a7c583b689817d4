"""Unit tests for the multimodal operators: stubbed codec edge, Arrow
batch plumbing, frame-sampling fan-out (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from kinesis_customer_sample_spark.catalog import table
from kinesis_customer_sample_spark.operators.multimodal import (
    attach_media,
    decode_image_real,
    extract_features,
    sample_frames,
)


def test_codec_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG....")


def test_media_schema_typed_metadata(spark, sf_dir):
    media = attach_media(table(spark, sf_dir, "documents"))
    fields = dict(media.dtypes)
    assert fields["data"] == "binary"
    assert fields["meta"].startswith("struct<mime:string,declared_bytes:bigint")
    row = media.filter(F.col("media_id") == 0).first()
    assert row.meta.declared_bytes == len(row.data)


def test_feature_extract_degrades_to_fake(spark, sf_dir):
    media = attach_media(table(spark, sf_dir, "documents")).limit(5)
    feats = extract_features(media).collect()
    assert len(feats) == 5
    for f in feats:
        assert f.decoder == "fake"  # no codec in this container
        assert 1 <= f.width <= 640 and 1 <= f.height <= 480
        assert len(f.content_md5) == 32


def test_feature_md5_matches_python(spark, sf_dir):
    doc = table(spark, sf_dir, "documents").filter(F.col("doc_id") == 0).first()
    feat = (
        extract_features(attach_media(table(spark, sf_dir, "documents")))
        .filter(F.col("media_id") == 0)
        .first()
    )
    assert feat.content_md5 == hashlib.md5(doc.text.encode()).hexdigest()
    assert feat.n_bytes == len(doc.text.encode())


def test_frame_sample_fanout_and_offsets(spark, sf_dir):
    media = attach_media(table(spark, sf_dir, "documents")).limit(3)
    frames = sample_frames(media, stride=64).collect()
    by_media: dict[int, list] = {}
    for fr in frames:
        by_media.setdefault(fr.media_id, []).append(fr)
    sizes = {r.media_id: len(r.data) for r in media.collect()}
    for media_id, rows in by_media.items():
        rows.sort(key=lambda r: r.frame_idx)
        n = len(rows)
        assert n == (sizes[media_id] + 63) // 64
        assert [r.frame_off for r in rows] == [i * 64 for i in range(n)]


def test_resize_fixed_output_size_and_deterministic(spark, sf_dir):
    from kinesis_customer_sample_spark.operators.multimodal import resize_media

    media = attach_media(table(spark, sf_dir, "documents")).limit(8)
    out1 = {r.media_id: (len(r.data), r.resized_md5, r.width, r.height)
            for r in resize_media(media, 64, 48).collect()}
    out2 = {r.media_id: (len(r.data), r.resized_md5, r.width, r.height)
            for r in resize_media(media, 64, 48).collect()}
    assert out1 == out2  # deterministic
    for n_bytes, _, w, h in out1.values():
        assert n_bytes == 64 * 48 and (w, h) == (64, 48)
