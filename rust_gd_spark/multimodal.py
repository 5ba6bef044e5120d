"""Multimodal columns: image/audio/video as opaque ``binary`` + typed meta.

The Spark-side plumbing is REAL and tested — schema, partitioning, Arrow
batch shape, mapInPandas signatures. The codec layer: ``decode_real`` is
REAL for PNG (pure zlib+numpy RFC 2083 decoder, colour types 0/2/4/6,
8-bit non-interlaced, all five filters) and PCM WAV (stdlib ``wave``),
with matching encoders for round-trip tests; JPEG/MP4/other containers
raise a clearly-marked NotImplementedError (no PIL/ffmpeg in this
sandbox). The synthetic-fixture operators run on ``decode_fake`` — a
deterministic byte-level decode exercising identical plumbing (same
shapes, dtypes, batch behavior) — so oracle results stay reproducible
from the text fixtures alone.

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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# colour type -> samples per pixel (3 = palette, unsupported without PLTE)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_decode(payload: bytes) -> np.ndarray:
    """Minimal spec-true PNG decoder (RFC 2083): 8-bit depth, colour types
    0/2/4/6, non-interlaced. zlib is stdlib; unfiltering is numpy (filters
    0–2 vectorized; 3/4 take the sequential slow path — our encoder emits
    filter 0 only). Returns (h, w) for grayscale else (h, w, channels)."""
    import struct
    import zlib

    if payload[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG: bad signature")
    pos, idat = 8, []
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + data + crc
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("not a PNG: no IHDR")
    ch = _PNG_CHANNELS.get(ctype)
    if depth != 8 or interlace != 0 or ch is None:
        raise NotImplementedError(
            f"png decoder supports 8-bit non-interlaced colour types "
            f"{sorted(_PNG_CHANNELS)}; got depth={depth} colour={ctype} "
            f"interlace={interlace}"
        )
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * ch
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f, line = int(filters[y]), lines[y]
        if f == 0:
            rec = line.copy()
        elif f == 1:  # sub: per-channel cumulative sum mod 256
            rec = line.copy()
            for c in range(ch):
                rec[c::ch] = np.cumsum(rec[c::ch], dtype=np.uint64) & 0xFF
        elif f == 2:  # up
            rec = line + prev
        elif f in (3, 4):  # average / paeth: sequential by spec
            rec = np.zeros(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if f == 3:
                    rec[x] = (int(line[x]) + ((a + b) >> 1)) & 0xFF
                else:
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                    rec[x] = (int(line[x]) + pr) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = rec
        prev = rec
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode a uint8 array — (h, w) gray or (h, w, {2,3,4}) — as a PNG
    (filter 0, one IDAT). Round-trips through ``_png_decode``."""
    import struct
    import zlib

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, ch = *arr.shape, 1
    elif arr.ndim == 3 and arr.shape[2] in (2, 3, 4):
        h, w, ch = arr.shape
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), arr.reshape(h, w * ch)], axis=1
    )
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan.tobytes(), 6))
        + chunk(b"IEND", b"")
    )


def _wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV via the stdlib ``wave`` module: returns
    ``((n_frames, n_channels) int16|uint8 array, sample_rate)``."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as wf:
        sw, nch, rate, n = (
            wf.getsampwidth(), wf.getnchannels(), wf.getframerate(),
            wf.getnframes(),
        )
        frames = wf.readframes(n)
    if sw == 2:
        a = np.frombuffer(frames, dtype="<i2")
    elif sw == 1:
        a = np.frombuffer(frames, dtype=np.uint8)
    else:
        raise NotImplementedError(f"wav sample width {sw} (need 1 or 2)")
    return a.reshape(-1, nch), rate


def encode_wav(arr: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Encode an int16/uint8 ``(n_frames, n_channels)`` array as PCM WAV.
    Round-trips through ``_wav_decode``."""
    import io
    import wave

    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.dtype == np.int16:
        sw, buf = 2, arr.astype("<i2").tobytes()
    elif arr.dtype == np.uint8:
        sw, buf = 1, arr.tobytes()
    else:
        raise ValueError(f"unsupported wav dtype {arr.dtype}")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(arr.shape[1])
        wf.setsampwidth(sw)
        wf.setframerate(sample_rate)
        wf.writeframes(buf)
    return bio.getvalue()


def decode_real(payload: bytes, kind: str):
    """Real codec hook — REAL for PNG images (pure zlib+numpy decoder,
    RFC 2083) and PCM WAV audio (stdlib ``wave``); the sandbox has no
    PIL/ffmpeg, so JPEG/MP4/other containers still raise with a clear
    message (swap in PIL.Image.open / pyav in production for those).

    Returns a numpy array: (h, w[, ch]) uint8 for images,
    (n_frames, n_channels) for audio."""
    if kind == "image":
        if payload[:8] == _PNG_MAGIC:
            return _png_decode(payload)
        raise NotImplementedError(
            "non-PNG image decode requires PIL (not in this sandbox); "
            "PNG decodes natively"
        )
    if kind == "audio":
        if payload[:4] == b"RIFF":
            return _wav_decode(payload)[0]
        raise NotImplementedError(
            "non-WAV audio decode requires soundfile/ffmpeg (not in this "
            "sandbox); PCM WAV decodes natively"
        )
    raise NotImplementedError(
        f"kind={kind!r}: video container decode requires pyav/ffmpeg "
        "(not in this sandbox)"
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
