"""Materialize the deterministic transcript fixture as parquet (no Spark).

The SAME generator the pytest fixtures use (FIXTURES.md §1, seed-fixed) at a
configurable scale, so correctness tests and the scaling bench share one
corpus definition. Pure pandas/pyarrow — generating input must not consume
the Spark cluster being measured.

Usage: python tools/gen_transcripts.py --n-conv 5000 --turns 20 \
           --out /root/repo/.scratch/transcripts_100k
"""

from __future__ import annotations

import argparse
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_gd_spark.fixtures import synth_transcripts  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n-conv", type=int, default=5000)
    ap.add_argument("--turns", type=int, default=20)
    ap.add_argument("--out", required=True)
    ap.add_argument(
        "--row-group-size",
        type=int,
        default=20_000,
        help="small row groups => many splittable input partitions",
    )
    args = ap.parse_args()

    corpus = synth_transcripts(
        seed=args.seed, n_conv=args.n_conv, turns_per_conv=args.turns
    )
    os.makedirs(args.out, exist_ok=True)
    table = pa.Table.from_pandas(corpus.transcripts, preserve_index=False)
    pq.write_table(
        table,
        os.path.join(args.out, "transcripts.parquet"),
        row_group_size=args.row_group_size,
        # Spark cannot read TIMESTAMP(NANOS) parquet; store micros
        coerce_timestamps="us",
        allow_truncated_timestamps=True,
    )
    pq.write_table(
        pa.Table.from_pandas(corpus.expected_pairs, preserve_index=False),
        os.path.join(args.out, "expected_pairs.parquet"),
    )
    print(
        f"wrote {len(corpus.transcripts)} turns "
        f"({args.n_conv} convs x {args.turns}) -> {args.out}"
    )


if __name__ == "__main__":
    main()
