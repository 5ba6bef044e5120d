"""File-based sources: the reference CLI's file → block → GD flow, Spark-shaped.

The reference's example driver (`examples/main.rs:15-40`) reads an
arbitrary file, walks it in fixed-size blocks (512 KiB default), and feeds
each block through ONE stateful GD instance — the LRU base dictionary
persists across the blocks of a file, which is where cross-block dedup
comes from. This module reproduces that contract over Spark:

* ``read_binary_blocks`` — ``spark.read.format("binaryFile")`` (one row
  per file: path, length, content) split into ``(file, block_idx, data)``
  rows by a ``mapInPandas`` pass. Files are the unit of distribution;
  blocks of a file stay reconstructable by ``block_idx``.
* ``gd_file_roundtrip`` — per-file sequential GD dedup→dup over the
  ordered blocks with one encode and one decode instance (two instances,
  exactly like the reference pair `gd_dedup`/`gd_dup` — a shared instance
  would replay dictionary ids differently), plus round-trip verification
  and compression metrics.

Scale notes: ``binaryFile`` materializes each file as one row, so a
file must fit an executor (Spark's own documented contract for this
source); the per-file GD pass is inherently sequential BY SPEC (the
dictionary is stateful across blocks — same reasoning as the
per-conversation path, `gd/spark.py`), and parallelism comes from the
number of files. For corpus-scale text the parquet/transcript paths are
the right entry; this source exists for reference-CLI parity on raw
files.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, types as T

BLOCK_BYTES_DEFAULT = 512 * 1024  # the reference CLI's block size

_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("block_idx", T.LongType()),
        T.StructField("data", T.BinaryType()),
        T.StructField("file_len", T.LongType()),
    ]
)

_FILE_RT_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("n_blocks", T.LongType()),
        T.StructField("orig_bytes", T.LongType()),
        T.StructField("deduped_bytes", T.LongType()),
        T.StructField("dedup_ratio", T.DoubleType()),
        T.StructField("roundtrip_ok", T.BooleanType()),
    ]
)


def read_binary_blocks(
    spark: SparkSession,
    path: str,
    block_bytes: int = BLOCK_BYTES_DEFAULT,
    glob: str | None = None,
) -> DataFrame:
    """``(file, block_idx, data, file_len)`` — every file under ``path``
    cut into ``block_bytes``-sized blocks (last block ragged), preserving
    order via ``block_idx``. ``glob`` filters filenames
    (``pathGlobFilter``, e.g. ``"*.bin"``). Zero-byte files produce no
    rows — Spark's ``binaryFile`` source omits them (upstream contract);
    the reference CLI likewise emits nothing for empty input."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    files = reader.load(path).select("path", "length", "content")

    def split(batches):
        # The per-row loop is per-FILE (each row is a whole file), so the
        # Python iteration count is bounded by file count, not bytes. The
        # memory bound is the Arrow INPUT batch: it holds
        # `spark.sql.execution.arrow.maxRecordsPerBatch` whole-file blobs
        # at once (default 10k) — for multi-GB files set that conf to a
        # single-digit value so a batch never concatenates more content
        # than one task's memory. Output frames are one file each.
        for pdf in batches:
            for _, row in pdf.iterrows():
                buf = bytes(row["content"] or b"")
                blocks = [
                    buf[off : off + block_bytes]
                    for off in range(0, max(len(buf), 1), block_bytes)
                ]
                yield pd.DataFrame(
                    {
                        "file": [row["path"]] * len(blocks),
                        "block_idx": range(len(blocks)),
                        "data": blocks,
                        "file_len": [len(buf)] * len(blocks),
                    }
                )

    return files.mapInPandas(split, schema=_BLOCK_SCHEMA)


def gd_file_roundtrip(
    blocks: DataFrame,
    kind: str = "rs",
    dict_size: int = 255,
    precoding=None,
    **params,
) -> DataFrame:
    """Per-file sequential GD dedup → dup over ordered blocks.

    One row per file: block count, original vs deduped byte totals, and
    whether every block round-trips byte-exactly. The encode-side GD and
    decode-side GD are separate instances whose dictionaries evolve in
    lockstep as blocks stream through — the reference CLI loop
    (`examples/main.rs:15-40`) block-for-block.
    """
    from .gd import make_gd

    if not params:
        params = {"n": 128, "k": 124} if kind == "rs" else {"deg": 8}

    def run(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values("block_idx")
        enc = make_gd(kind, dict_size, precoding=precoding, **params)
        dec = make_gd(kind, dict_size, precoding=precoding, **params)
        orig = deduped = 0
        ok = True
        for buf in group["data"]:
            buf = bytes(buf)
            d = enc.dedup(buf)
            orig += len(buf)
            deduped += len(d.data)
            if bytes(dec.dup(d)) != buf:
                ok = False
        return pd.DataFrame(
            {
                "file": [group["file"].iloc[0]],
                "n_blocks": [len(group)],
                "orig_bytes": [orig],
                "deduped_bytes": [deduped],
                "dedup_ratio": [deduped / max(orig, 1)],
                "roundtrip_ok": [ok],
            }
        )

    return blocks.groupBy("file").applyInPandas(run, schema=_FILE_RT_SCHEMA)
