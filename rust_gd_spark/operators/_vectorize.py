"""Segment-chunked vectorization helper for Arrow-batch UDFs.

A pandas UDF receives up to ``spark.sql.execution.arrow.maxRecordsPerBatch``
rows at once; flattening every row's array into one matrix can allocate
gigabytes (10k rows × 300 shingles × 128 perms × 8B ≈ 3 GB). This helper
yields bounded chunks: vectorized enough to amortize numpy dispatch, small
enough to stay cache/memory friendly regardless of row count or skewed row
sizes (one oversized row still gets its own chunk).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd


def iter_segments(
    col: pd.Series, budget: int = 1 << 16
) -> Iterator[tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Yield ``(row_idx, flat, starts)`` chunks over the array column.

    * ``row_idx`` — positions (into ``col``) of rows in this chunk with
      at least one element;
    * ``flat``    — their values concatenated (int64);
    * ``starts``  — segment start offsets into ``flat`` (for reduceat).

    Total ``len(flat)`` per chunk ≤ max(budget, largest single row).
    """
    n = len(col)
    lens = np.fromiter(
        (0 if v is None else len(v) for v in col), dtype=np.int64, count=n
    )
    i = 0
    while i < n:
        j, tot = i, 0
        while j < n and (tot == 0 or tot + lens[j] <= budget):
            tot += lens[j]
            j += 1
        idx = np.arange(i, j)[lens[i:j] > 0]
        if len(idx):
            flat = np.concatenate(
                [np.asarray(col.iloc[r], dtype=np.int64) for r in idx]
            )
            seg_lens = lens[idx]
            starts = np.zeros(len(idx), dtype=np.int64)
            np.cumsum(seg_lens[:-1], out=starts[1:])
            yield idx, flat, starts
        i = j
