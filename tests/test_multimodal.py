from __future__ import annotations

import pytest

from hadoop_gpu_spark.multimodal import attach_fake_media, decode_image, frame_sample
from hadoop_gpu_spark.tables import load_table


def test_decode_requires_fake_flag(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(5)
    media = attach_fake_media(docs, "doc_id", "text")
    with pytest.raises(NotImplementedError):
        decode_image(media)


def test_fake_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(30)
    media = attach_fake_media(docs, "doc_id", "text")
    a = decode_image(media, fake=True).toPandas().sort_values("media_id")
    b = decode_image(media, fake=True).toPandas().sort_values("media_id")
    assert a["pixel_hash"].tolist() == b["pixel_hash"].tolist()
    assert (a["width"] == a["width"].astype(int)).all()
    assert ((a["mean_pixel"] >= 0) & (a["mean_pixel"] <= 255)).all()


def test_frame_sample_counts(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    media = attach_fake_media(docs, "doc_id", "text")
    frames = frame_sample(media, every_ms=1000, fake=True).toPandas()
    vids = media.filter("kind = 'video'").toPandas()
    if len(vids):
        expect = sum(max(r.meta_ms - 1, 0) // 1000 + 1 for r in vids.itertuples())
        assert len(frames) == expect
