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


def test_decode_real_unsupported_formats_raise():
    """Non-PNG images / non-WAV audio / video still raise with a clear
    message (no PIL/ffmpeg in this sandbox)."""
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"\xff\xd8\xff\xe0jpeg-ish", "image")
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"not riff", "audio")
    with pytest.raises(NotImplementedError):
        mm.decode_real(b"\x00\x00\x00 ftypmp42", "video")
    with pytest.raises(ValueError):
        mm._png_decode(b"definitely not a png")


def test_png_roundtrip_all_shapes():
    """encode_png -> decode_real is the identity for every supported
    colour type (gray, gray+alpha, RGB, RGBA), including non-square."""
    rng = np.random.default_rng(3)
    for shape in [(11, 7), (5, 9, 2), (16, 16, 3), (8, 3, 4)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = mm.decode_real(mm.encode_png(arr), "image")
        assert out.shape == arr.shape and out.dtype == np.uint8
        assert np.array_equal(out, arr), shape


def test_png_decode_all_filter_types():
    """Spec coverage beyond our encoder: hand-build a PNG whose rows use
    filters 0..4 and check against an independent reference unfilter."""
    import struct
    import zlib

    rng = np.random.default_rng(5)
    h, w, ch = 5, 6, 3
    img = rng.integers(0, 256, size=(h, w * ch), dtype=np.uint8)
    # reference-filter each row y with filter type y (0..4), per RFC 2083
    lines = []
    prev = np.zeros(w * ch, dtype=np.int64)
    for y in range(h):
        cur = img[y].astype(np.int64)
        f = y % 5
        line = np.zeros(w * ch, dtype=np.int64)
        for x in range(w * ch):
            a = cur[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            line[x] = (cur[x] - pred) & 0xFF
        lines.append(np.concatenate([[f], line]).astype(np.uint8))
        prev = cur
    raw = zlib.compress(np.concatenate(lines).tobytes())

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data)))

    png = (mm._PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", raw) + chunk(b"IEND", b""))
    out = mm.decode_real(png, "image")
    assert np.array_equal(out, img.reshape(h, w, ch))


def test_wav_roundtrip():
    rng = np.random.default_rng(4)
    mono = rng.integers(-(1 << 15), 1 << 15, size=(160, 1)).astype(np.int16)
    stereo = rng.integers(0, 256, size=(80, 2), dtype=np.uint8)
    for arr, rate in [(mono, 16000), (stereo, 8000)]:
        payload = mm.encode_wav(arr, rate)
        out = mm.decode_real(payload, "audio")
        assert np.array_equal(out, arr)
        dec, got_rate = mm._wav_decode(payload)
        assert got_rate == rate and np.array_equal(dec, arr)


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
