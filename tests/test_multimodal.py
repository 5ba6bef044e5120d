"""Multimodal plumbing tests: schema, batch shape, deterministic fakes,
and the clearly-marked real-decode stub."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rust_gd_spark import multimodal as mm


@pytest.fixture(scope="module")
def assets(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = mm.synth_assets(docs)
    df.cache().count()
    return df


def test_schema_and_kinds(assets):
    got = [(f.name, f.dataType.simpleString()) for f in assets.schema.fields]
    exp = [(f.name, f.dataType.simpleString()) for f in mm.ASSET_SCHEMA.fields]
    assert got == exp
    kinds = {r.kind for r in assets.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_real_is_marked_stub():
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"xx", "image")


def test_decode_fake_shape_and_determinism():
    a = mm.decode_fake(b"hello world", 16, 12)
    b = mm.decode_fake(b"hello world", 16, 12)
    assert a.shape == (12, 16) and a.dtype == np.uint8
    assert (a == b).all()


def test_extract_features(assets):
    feats = mm.extract_features(assets)
    rows = feats.collect()
    assert len(rows) == assets.count()
    for r in rows[:20]:
        v = np.array(r.feature)
        assert len(v) == 256
        assert abs(v.sum() - 1.0) < 1e-9
        assert r.n_bytes > 0
    # deterministic: feature equals python-side histogram of the payload
    one = assets.orderBy("asset_id").first()
    got = feats.filter(F.col("asset_id") == one.asset_id).first()
    b = np.frombuffer(one.payload, dtype=np.uint8)
    exp = np.bincount(b, minlength=256) / len(b)
    assert np.allclose(np.array(got.feature), exp)


def test_resize_images(assets):
    out = mm.resize_images(assets, out_w=8, out_h=8)
    rows = out.collect()
    n_img = assets.filter(F.col("kind") == "image").count()
    assert len(rows) == n_img
    for r in rows[:10]:
        assert len(r.pixels) == 64 and r.width == 8 and r.height == 8
    # nearest-neighbor oracle on one asset
    src = assets.filter(F.col("kind") == "image").orderBy("asset_id").first()
    got = [r for r in rows if r.asset_id == src.asset_id][0]
    img = mm.decode_fake(src.payload, src.meta.width, src.meta.height)
    ys = (np.arange(8) * img.shape[0] // 8).clip(0, img.shape[0] - 1)
    xs = (np.arange(8) * img.shape[1] // 8).clip(0, img.shape[1] - 1)
    assert got.pixels == img[np.ix_(ys, xs)].tobytes()


def test_sample_frames(assets):
    frames = mm.sample_frames(assets, every_k=2)
    rows = frames.collect()
    vids = {r.asset_id: r for r in assets.filter(F.col("kind") == "video").collect()}
    assert {r.asset_id for r in rows} == set(vids)
    from collections import Counter

    per = Counter(r.asset_id for r in rows)
    for aid, cnt in per.items():
        nf = max(vids[aid].meta.n_frames, 1)
        assert cnt == len(range(0, nf, 2))
    for r in rows[:10]:
        assert r.frame_idx % 2 == 0 and len(r.frame) > 0


def test_features_feed_embedding_neardup(spark, assets):
    """Plumbing integration: byte-histogram features flow into the
    embedding near-dup operator unchanged."""
    from rust_gd_spark.operators import embedding as emb

    feats = mm.extract_features(assets).select(
        F.col("asset_id").alias("vec_id"), F.col("feature").alias("embedding")
    )
    pairs = emb.embedding_near_dup_pairs(feats, threshold=0.999, bands=8)
    assert pairs.count() >= 0  # runs end-to-end; histogram dups possible
