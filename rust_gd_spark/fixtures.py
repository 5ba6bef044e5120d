"""Deterministic synthetic multi-turn transcript corpus (FIXTURES.md §1).

Schema (BASELINE.json input_hint, authoritative):
    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp

The text mixture exercises every dedup path; every duplicated turn records
its source turn, so the generator doubles as the ground-truth oracle for
recall tests (``expected_pairs``):

* exact (15%)      — verbatim copy of an earlier turn, cross-conversation
* near_token (20%) — earlier turn with word swaps/inserts, Jaccard >= ~0.8
* near_char (10%)  — earlier turn with <= 3 character edits (SimHash path;
  mirrors the reference's noise-confined-to-parity test, src/lib.rs:163-175)
* substring (10%)  — >= 200-char span of an earlier turn embedded in
  otherwise-unique text (suffix/winnowing path)
* boilerplate (10%)— a fixed phrase repeated, "padpadpad..." tail (the
  reference's Jugemu corpus pattern, src/lib.rs:104-105) — LSH hot buckets
* unique (35%)     — seeded random sentences; must NOT cluster

No wall-clock anywhere: seed-fixed numpy RNG, fixed epoch timestamps.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

VOCAB = [
    f"{w}{i}"
    for i, w in enumerate(
        [
            "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
            "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
            "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
            "victor", "whiskey", "xray", "yankee", "zulu", "spark", "shuffle",
            "partition", "cluster", "window", "lineage", "checkpoint", "batch",
            "stream", "vector", "matrix", "kernel", "syndrome", "codeword",
        ]
        * 5
    )
]

BOILERPLATE_CORE = "jugemu jugemu gokou no surikire kaijarisuigyo no suigyoumatsu"
EPOCH_2026 = pd.Timestamp("2026-01-01T00:00:00Z")

KIND_PROPS = [
    ("exact", 0.15),
    ("near_token", 0.20),
    ("near_char", 0.10),
    ("substring", 0.10),
    ("boilerplate", 0.10),
    ("unique", 0.35),
]

ROLES = ["user", "assistant", "tool"]


@dataclass
class TranscriptCorpus:
    transcripts: pd.DataFrame
    # ground truth: (uid_l, uid_r, kind) for every generated duplicate
    expected_pairs: pd.DataFrame
    seed: int
    extras: dict = field(default_factory=dict)


def _unique_sentence(rng: np.random.Generator, lo: int = 12, hi: int = 40) -> str:
    n = int(rng.integers(lo, hi))
    words = rng.integers(0, len(VOCAB), n)
    return " ".join(VOCAB[int(w)] for w in words)


def _near_token_variant(rng: np.random.Generator, text: str) -> str:
    """Word swaps/inserts keeping w-shingle Jaccard roughly >= 0.8."""
    toks = text.split()
    n_edit = max(1, len(toks) // 12)
    out = list(toks)
    for _ in range(n_edit):
        op = int(rng.integers(0, 2))
        pos = int(rng.integers(0, len(out)))
        word = VOCAB[int(rng.integers(0, len(VOCAB)))]
        if op == 0:
            out[pos] = word
        else:
            out.insert(pos, word)
    return " ".join(out)


def _near_char_variant(rng: np.random.Generator, text: str) -> str:
    """<= 3 single-character substitutions."""
    chars = list(text)
    n_edit = int(rng.integers(1, 4))
    for _ in range(n_edit):
        pos = int(rng.integers(0, len(chars)))
        chars[pos] = chr(ord("a") + int(rng.integers(0, 26)))
    return "".join(chars)


def _substring_variant(rng: np.random.Generator, text: str) -> str:
    """>= 200-char verbatim span of `text` inside otherwise-unique filler."""
    span_len = min(len(text), 200 + int(rng.integers(0, 100)))
    start = int(rng.integers(0, max(1, len(text) - span_len)))
    span = text[start : start + span_len]
    return f"{_unique_sentence(rng, 6, 14)} {span} {_unique_sentence(rng, 6, 14)}"


def synth_transcripts(
    seed: int = 42,
    n_conv: int = 200,
    turns_per_conv: int = 20,
) -> TranscriptCorpus:
    rng = np.random.default_rng(seed)
    n_total = n_conv * turns_per_conv
    kinds = [k for k, _ in KIND_PROPS]
    probs = np.array([p for _, p in KIND_PROPS])
    kind_draw = rng.choice(len(kinds), size=n_total, p=probs)

    rows: list[tuple] = []
    pairs: list[tuple] = []
    # pool of previously generated (uid, text) usable as duplication sources:
    # only reasonably long unique/boilerplate-free turns make good sources
    source_pool: list[tuple[str, str]] = []

    flat = 0
    for ci in range(n_conv):
        conv_id = f"conv-{ci:08d}"
        for ti in range(turns_per_conv):
            uid = f"{conv_id}:{ti}"
            kind = kinds[kind_draw[flat]]
            base_text: str | None = None
            if kind in ("exact", "near_token", "near_char", "substring"):
                if not source_pool:
                    kind = "unique"
                else:
                    src_uid, base_text = source_pool[
                        int(rng.integers(0, len(source_pool)))
                    ]
            if kind == "unique":
                text = _unique_sentence(rng)
                source_pool.append((uid, text))
            elif kind == "boilerplate":
                reps = int(rng.integers(3, 7))
                text = (BOILERPLATE_CORE + " ") * reps + "padpadpad" * int(
                    rng.integers(1, 4)
                )
            elif kind == "exact":
                text = base_text
                pairs.append((src_uid, uid, "exact"))
            elif kind == "near_token":
                text = _near_token_variant(rng, base_text)
                pairs.append((src_uid, uid, "near_token"))
            elif kind == "near_char":
                text = _near_char_variant(rng, base_text)
                pairs.append((src_uid, uid, "near_char"))
            else:  # substring
                text = _substring_variant(rng, base_text)
                pairs.append((src_uid, uid, "substring"))

            role = ROLES[ti % 3]
            tool = (
                f"tool-{int(rng.integers(0, 8))}"
                if role == "tool" and rng.random() < 0.2
                else None
            )
            ts = EPOCH_2026 + pd.Timedelta(seconds=ci * 3600 + ti * 10)
            rows.append((conv_id, np.int32(ti), role, text, tool, ts))
            flat += 1

    transcripts = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    expected = pd.DataFrame(pairs, columns=["uid_l", "uid_r", "kind"])
    return TranscriptCorpus(transcripts=transcripts, expected_pairs=expected, seed=seed)


def transcripts_spark(spark, corpus: TranscriptCorpus):
    """Materialize the corpus as a Spark DataFrame with the contract schema."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("role", T.StringType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("tool", T.StringType(), True),
            T.StructField("ts", T.TimestampType(), False),
        ]
    )
    return spark.createDataFrame(corpus.transcripts, schema=schema)


def ensure_highsim_fixture(sf_dir: str, cache_root: str = "/root/repo/dist/fixtures") -> str:
    """Materialize the `embedding_ann_highsim` planted-pair corpus to
    parquet (round-4 VERDICT task 7: the bench row should time the LSH
    operator, not fixture construction).

    The content is a PURE function of ``{sf_dir}/embeddings.parquet`` —
    original vectors cast to float64 plus, for every vec_id % 5 == 0 with
    a successor row, a planted near-dup ``0.95·v + 0.3·v_next`` under
    vec_id + 1,000,000 — bit-identical to the in-query construction in
    ``__spark_entry__._q_embedding_ann_highsim`` (same float32→float64
    cast then float64 mixture), so the DuckDB all-pairs oracle is
    unchanged whichever path built the table. Returns the parquet path;
    regenerates only when missing.
    """
    import os

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(cache_root, f"highsim_{tag}.parquet")
    if os.path.exists(out):
        return out
    os.makedirs(cache_root, exist_ok=True)
    rows = duckdb.sql(
        f"select vec_id, embedding from '{sf_dir}/embeddings.parquet' order by vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    V = np.array([r[1] for r in rows], dtype=np.float32).astype(np.float64)
    pos = {int(i): p for p, i in enumerate(ids)}
    p_ids, p_vecs = [], []
    for i in ids:
        if i % 5 == 0 and int(i) + 1 in pos:
            p_ids.append(int(i) + 1_000_000)
            p_vecs.append(0.95 * V[pos[int(i)]] + 0.3 * V[pos[int(i) + 1]])
    all_ids = np.concatenate([ids, np.array(p_ids, dtype=np.int64)])
    all_vecs = list(V) + p_vecs
    tbl = pa.table(
        {
            "vec_id": pa.array(all_ids, type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in all_vecs], type=pa.list_(pa.float64())
            ),
        }
    )
    tmp = out + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, out)
    return out
