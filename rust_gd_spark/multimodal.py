"""Multimodal columns: image/audio/video as opaque ``binary`` + typed meta.

The Spark-side plumbing is REAL and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures. The codec layer is STUBBED: this
container has no PIL/ffmpeg, so ``decode_real`` raises a clearly-marked
NotImplementedError, and every operator runs on ``decode_fake`` — a
deterministic byte-level decode that exercises identical plumbing (same
shapes, dtypes, batch behavior). Swapping in a real codec changes ONE
function.

Operators (all ``mapInPandas``, Arrow-batched, never per-row Python over
JVM boundaries):

* ``extract_features`` — 256-bin normalized byte histogram per asset (the
  deterministic fake embedding; a real model would slot in here).
* ``resize_images``    — nearest-neighbor resample of the fake-decoded 2-D
  array; real resize is the same index arithmetic on a real decode.
* ``sample_frames``    — every k-th frame of the fake-decoded "video"
  (payload split into ``n_frames`` equal segments).

Dedup tie-in: feature vectors feed ``operators.embedding`` near-dup;
payload bytes feed the GD kernel (``gd.core``) — binary chunks are exactly
the reference's native input type (`src/libecc/src/types.rs:8`).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
            False,
        ),
    ]
)


def decode_real(payload: bytes, kind: str):
    """Real codec hook — NOT AVAILABLE in this container (no PIL/ffmpeg).

    STUB: replace with PIL.Image.open / soundfile / pyav in production.
    """
    raise NotImplementedError(
        "real image/audio/video decode requires PIL/soundfile/pyav; "
        "this sandbox uses decode_fake (deterministic byte-level decode)"
    )


def decode_fake(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: payload bytes tiled/truncated into a
    (height, width) uint8 array. Same shape contract as a real grayscale
    decode, so downstream index arithmetic is the real thing."""
    need = width * height
    b = np.frombuffer(payload, dtype=np.uint8)
    if len(b) == 0:
        b = np.zeros(1, dtype=np.uint8)
    reps = -(-need // len(b))
    return np.tile(b, reps)[:need].reshape(height, width)


def synth_assets(docs: DataFrame, kinds: tuple[str, ...] = ("image", "audio", "video")) -> DataFrame:
    """Deterministic fake asset table from the documents table: payload =
    utf-8 bytes of the text (repeated), meta derived from doc_id. No RNG —
    reproducible across runs and engines."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in kinds]),
        (F.col("doc_id") % len(kinds) + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        kind.alias("kind"),
        F.encode(F.repeat(F.col("text"), 3), "utf-8").alias("payload"),
        F.struct(
            (F.col("doc_id") % 32 + 16).cast("int").alias("width"),
            (F.col("doc_id") % 24 + 12).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("doc_id") % 8 + 2).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def extract_features(assets: DataFrame) -> DataFrame:
    """256-bin normalized byte histogram per asset — the deterministic fake
    feature extractor. Batched: one np.bincount per row, zero-copy from
    Arrow; a model inference would use the same iterator shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, nbytes = [], []
            for payload in pdf["payload"]:
                b = np.frombuffer(payload, dtype=np.uint8)
                h = np.bincount(b, minlength=256).astype(np.float64)
                s = h.sum()
                feats.append((h / s if s else h).tolist())
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "n_bytes": np.asarray(nbytes, dtype=np.int64),
                }
            )

    return assets.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("pixels", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def resize_images(assets: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize of image assets to (out_h, out_w).

    The index arithmetic is the real algorithm; only the decode is fake.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, m in zip(pdf["payload"], pdf["meta"]):
                img = decode_fake(payload, int(m["width"]), int(m["height"]))
                ys = (np.arange(out_h) * img.shape[0] // out_h).clip(0, img.shape[0] - 1)
                xs = (np.arange(out_w) * img.shape[1] // out_w).clip(0, img.shape[1] - 1)
                out.append(img[np.ix_(ys, xs)].tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "pixels": out,
                    "width": np.full(len(pdf), out_w, dtype=np.int32),
                    "height": np.full(len(pdf), out_h, dtype=np.int32),
                }
            )

    return assets.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(assets: DataFrame, every_k: int = 2) -> DataFrame:
    """Every k-th 'frame' of video assets; payload split into n_frames
    equal segments (fake container format). One output row per frame —
    the explode happens Python-side inside the Arrow batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for aid, m, b in zip(pdf["asset_id"], pdf["meta"], pdf["payload"]):
                nf = max(int(m["n_frames"]), 1)
                step = max(len(b) // nf, 1)
                for fi in range(0, nf, every_k):
                    ids.append(aid)
                    idxs.append(fi)
                    frames.append(bytes(b[fi * step : (fi + 1) * step]))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame": frames,
                }
            )

    return assets.filter(F.col("kind") == "video").mapInPandas(run, schema=FRAME_SCHEMA)
