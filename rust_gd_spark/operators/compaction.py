"""Small-file compaction planning — bin output files toward a target
size with a deterministic, distributed rule.

A 10^12-turn table maintained by incremental dedup/CDC jobs accretes
small files (every micro-batch sink, every AQE-coalesced final stage);
scan efficiency then dies by open() overhead and footer reads long
before bytes are the problem. Iceberg's own maintenance actions
(rewrite_data_files / binpack) solve this with a bin-packing pass over
the manifest's per-file sizes; this operator is that planning pass as a
DataFrame query: file list in → ``(file, bin)`` assignment out, ready
to drive a group-by-bin rewrite.

The rule is NEXT-FIT over the (bytes desc, file asc) order: running
cumulative bytes, ``bin = (cumsum − bytes) div target``. Properties:

* deterministic and engine-independent (exact integer arithmetic — the
  oracle is bit-exact, no float anywhere);
* bins partition the cumulative byte line into target-width windows:
  every bin's total lies in ``(0, target + max_file)`` and averages
  ``target`` (a file straddling a window boundary carries its tail
  bytes into its own bin, so individual bins may undershoot — the
  average, not each bin, hits target; rewrite jobs care about the
  file-count collapse and the mean, not per-bin exactness);
* a file ≥ target lands alone in its bin — oversized files are
  reported, not split (chunk-level splitting is the writer's job);
* size-descending order keeps big files from fragmenting many bins —
  the greedy FFD intuition without FFD's inherently sequential
  open-bin state (which cannot be computed scalably OR reproduced by
  a set-based oracle).

Scale shape: the running sum uses the same no-global-window machinery
as ``snm.global_ranks`` — range partition on the sort key, P-row
per-partition totals collected to the driver, one mapInPandas
cumulative pass. The file list is ~10^6 rows at 100 TB; every stage is
P-way parallel and the collect is one long per partition.

Reference analogue: the reference packs variable-size deviation
records into fixed 512 KiB blocks in its CLI stream
(`examples/main.rs:36-61`); compaction is the same bin discipline at
file granularity.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    file_col: str = "path",
    size_col: str = "bytes",
    num_partitions: int | None = None,
) -> DataFrame:
    """``(path, bytes, bin, bin_bytes, bin_files, oversized)`` — one row
    per input file; ``bin`` is the rewrite group, ``bin_bytes``/
    ``bin_files`` its totals, ``oversized`` flags files ≥ target (their
    bins are single-file by construction)."""
    if target_bytes <= 0:
        raise ValueError(f"target_bytes must be positive, got {target_bytes}")
    parts = (
        num_partitions or files.sparkSession.sparkContext.defaultParallelism
    )
    keyed = files.select(
        F.col(file_col).alias("path"), F.col(size_col).cast("long").alias("bytes")
    )
    sdf = (
        keyed.repartitionByRange(parts, F.col("bytes").desc(), F.col("path"))
        .sortWithinPartitions(F.col("bytes").desc(), F.col("path"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["_pid"]: r["tot"]
        for r in sdf.groupBy("_pid").agg(F.sum("bytes").alias("tot")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += int(totals[pid])
    out_schema = T.StructType(
        [
            T.StructField("path", sdf.schema["path"].dataType),
            T.StructField("bytes", T.LongType()),
            T.StructField("bin", T.LongType()),
        ]
    )
    tgt = int(target_bytes)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        run = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if run is None:
                run = offsets[int(pdf["_pid"].iloc[0])]
            csum = pdf["bytes"].cumsum() + run
            run = int(csum.iloc[-1])
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "bytes": pdf["bytes"],
                    "bin": (csum - pdf["bytes"]) // tgt,
                }
            )

    planned = sdf.mapInPandas(assign, out_schema)
    bins = planned.groupBy("bin").agg(
        F.sum("bytes").alias("bin_bytes"), F.count("*").alias("bin_files")
    )
    return planned.join(bins, "bin").select(
        "path",
        "bytes",
        "bin",
        "bin_bytes",
        "bin_files",
        (F.col("bytes") >= tgt).alias("oversized"),
    )


def compaction_plan_sql(
    table: str,
    file_expr: str,
    size_expr: str,
    target_bytes: int,
) -> str:
    """DuckDB twin of ``compaction_plan`` — exact integer arithmetic,
    bit-for-bit."""
    return f"""
        with f as (
          select {file_expr} as path, ({size_expr})::bigint as bytes
          from {table}
        ),
        runs as (
          select path, bytes,
                 ((sum(bytes) over (order by bytes desc, path) - bytes)
                   // {int(target_bytes)})::bigint as bin
          from f
        ),
        bins as (
          select bin, sum(bytes)::bigint as bin_bytes,
                 count(*)::bigint as bin_files
          from runs group by 1
        )
        select r.path, r.bytes, r.bin, b.bin_bytes, b.bin_files,
               r.bytes >= {int(target_bytes)} as oversized
        from runs r join bins b using (bin)
    """
