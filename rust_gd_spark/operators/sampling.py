"""Deterministic hash sampling, stratified sampling, and corpus mixing.

The data-mixing stage of a training pipeline: down/up-weight sources or
quality strata to hit a target mixture. Spark's ``df.sample`` is seeded
per-partition, so its output changes with partitioning — useless for a
resumable 100 TB job where a retried task must keep the SAME rows. This
operator samples by content key instead:

    keep row  ⇔  md5(key || ':' || seed)  <  hex_threshold(fraction)

* md5 emits lowercase hex in both Spark and DuckDB, and the comparison is
  a plain string compare on a uniform 128-bit space — so the decision is
  a pure function of (key, seed, fraction): reproducible across retries,
  repartitioning, engines, and cluster sizes, and fully SQL-oracle-able.
* The filter is one whole-stage-codegen expression over the scan — no
  shuffle, no driver work, trivially 100 TB-parallel.
* Monotone in ``fraction``: raising a stratum's weight only ADDS rows
  (the kept set at f1 ⊆ kept set at f2 for f1 ≤ f2) — the property that
  makes iterative mixture tuning cheap (only the delta is new).

Relation to the reference engine: the keep/drop decision is the same
shape as the GD dictionary probe (`src/dict.rs:38-63`) — a deterministic
function of the content key, never of placement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_HEX_WIDTH = 32  # md5 digest length in hex chars
_SPACE = 16 ** _HEX_WIDTH


def hash_threshold(fraction: float) -> str:
    """Zero-padded 32-char lowercase hex threshold: a uniformly hashed
    key falls below it with probability ``fraction`` (exact at the
    2^-128 granularity)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    bound = min(int(round(fraction * _SPACE)), _SPACE)
    if bound >= _SPACE:  # fraction == 1.0: every digest compares below
        return "g" * _HEX_WIDTH
    return format(bound, f"0{_HEX_WIDTH}x")


def _digest(key_col: Column, seed: int) -> Column:
    # coalesce, not concat_ws NULL-skipping: concat_ws would hash a NULL
    # key to md5('<seed>') while the SQL twin's `||` nulls out and DROPS
    # the row — the engines must agree. (NULL keys all share one digest
    # either way — key-hash sampling is degenerate on non-unique keys;
    # callers key on a unique id.)
    return F.md5(
        F.concat(
            F.coalesce(key_col.cast("string"), F.lit("")), F.lit(f":{seed}")
        )
    )


def _digest_sql(key_expr: str, seed: int) -> str:
    return f"md5(coalesce({key_expr}::varchar, '') || ':' || '{seed}')"


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample keyed on ``key_col``."""
    return df.filter(_digest(F.col(key_col), seed) < hash_threshold(fraction))


def hash_sample_sql(key_expr: str, fraction: float, seed: int = 0) -> str:
    """The WHERE predicate equivalent to ``hash_sample`` (DuckDB/ANSI)."""
    return f"{_digest_sql(key_expr, seed)} < '{hash_threshold(fraction)}'"


_U52 = float(1 << 52)  # 13 hex chars = 52 bits — exact in an IEEE double


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    seed: int = 0,
    precision: int | None = 6,
) -> DataFrame:
    """Per-row deterministic Bernoulli(``weight_col``) — the consumer of
    `softdedup.soft_dedup_weights`: keep each row with probability equal
    to its own weight, so a near-dup cluster with weight 1/|cluster|
    contributes one document of expected mass.

    Decision: ``u < floor(round(weight, precision) · 2^52)`` where ``u``
    is the first 13 hex chars of ``md5(key:seed)`` read as an integer —
    52 bits, exact in a double, so Spark (``conv``) and the SQL twin
    (``'0x…'::ubigint``) compute bit-identical keep sets. Same properties
    as ``hash_sample``: pure function of (key, seed, weight) — stable
    across retries, partitioning, and engines; one codegen'd filter over
    the scan, no shuffle. Weights outside [0, 1] clamp naturally
    (thr ≤ 0 drops the row, thr ≥ 2^52 always keeps it).

    ``precision=6`` is the repo-wide oracle doctrine (both engines agree
    on a 6-dp round) — but it quantizes at 1e-6, so a weight below 5e-7
    (a near-dup cluster with > 2M members) rounds to 0 and would drop
    EVERY member, worse than hard dedup's keep-one. For mega-cluster
    corpora pass ``precision=None``: the raw double is used, which is
    still engine-identical whenever both engines derive the weight by
    the same arithmetic (e.g. ``1.0 / count``, one IEEE division).
    """
    u = F.conv(
        F.substring(_digest(F.col(key_col), seed), 1, 13), 16, 10
    ).cast("double")
    w = F.col(weight_col).cast("double")
    if precision is not None:
        w = F.round(w, precision)
    return df.filter(u < F.floor(w * F.lit(_U52)))


def weighted_sample_sql(
    key_expr: str, weight_expr: str, seed: int = 0, precision: int | None = 6
) -> str:
    """WHERE predicate equivalent to ``weighted_sample`` (DuckDB)."""
    w = f"({weight_expr})::double"
    if precision is not None:
        w = f"round({w}, {precision})"
    return (
        f"('0x' || substr({_digest_sql(key_expr, seed)}, 1, 13))::ubigint::double"
        f" < floor({w} * {_U52!r})"
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive.

    ``fractions`` maps stratum value → keep fraction; strata not listed
    get ``default_fraction``. One CASE expression + one digest compare
    over the scan: no shuffle, and a row's fate never depends on which
    task scans it.
    """
    # right-folded CASE whose arm order matches sorted(fractions), so the
    # Spark expression and the SQL template are the same decision tree
    thr = F.lit(hash_threshold(default_fraction))
    for value, frac in sorted(fractions.items(), reverse=True):
        thr = F.when(
            F.col(strata_col).cast("string") == F.lit(str(value)),
            F.lit(hash_threshold(frac)),
        ).otherwise(thr)
    return df.filter(_digest(F.col(key_col), seed) < thr)


def exact_k_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    k: int,
    seed: int = 0,
) -> DataFrame:
    """Exactly ``k`` rows per stratum (fewer if the stratum is smaller),
    chosen uniformly and deterministically: rank rows within each stratum
    by their md5 digest (ties — impossible for distinct keys — broken by
    the key itself) and keep rank ≤ k.

    The fixed-size counterpart of ``stratified_sample``: eval slices,
    per-source audit samples, and few-shot pools need "exactly 1,000
    docs per source", not a fraction. Same determinism properties: the
    kept set is a pure function of (keys, seed, k) — stable across
    retries, partitioning, and engines.

    Scale: one shuffle on the stratum key; the ``row_number() ≤ k``
    filter compiles to WindowGroupLimit (Spark ≥ 3.5), so every map task
    pre-selects its local top-k per stratum and the shuffle carries
    O(k · tasks) rows per stratum, not the stratum. (Contrast a global
    ``ORDER BY digest LIMIT k`` per stratum — a driver-side loop over
    strata; this is one job regardless of strata count.)
    """
    w = Window.partitionBy(F.col(strata_col)).orderBy(
        _digest(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def exact_k_sample_sql(
    table: str,
    key_expr: str,
    strata_expr: str,
    k: int,
    seed: int = 0,
    select: str = "*",
) -> str:
    """DuckDB twin of ``exact_k_sample`` (QUALIFY form)."""
    return f"""
        select {select} from {table}
        qualify row_number() over (
          partition by {strata_expr}
          order by {_digest_sql(key_expr, seed)}, {key_expr}
        ) <= {k}
    """


def mixture_plan(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    budget: int,
    size_col: str,
) -> DataFrame:
    """Plan a target corpus mixture: ``(stratum, actual_size,
    target_size, fraction)`` — the data-mixing planner (Pile/DoReMi-style
    static mixtures).

    ``weights`` maps stratum value → share of ``budget`` (caller
    normalizes; unlisted strata get weight 0); ``fraction`` =
    ``round(min(1, weight*budget/actual_size), 6)`` — capped at 1
    (down-sampling only; upsampling is an epoch/repeat decision, not a
    row filter). Feed the result straight into ``stratified_sample``:
    the plan is one tiny aggregate (#strata rows), collected driver-side
    exactly as a 100 TB job would, and the applied filter inherits every
    determinism property above.

    Rounding to 6 dp makes the fraction engine-portable (the repo-wide
    oracle doctrine: both engines compute the same double to 6 dp); the
    SQL twin builds the identical CASE decision tree.
    """
    per = df.groupBy(F.col(strata_col).cast("string").alias("stratum")).agg(
        F.sum(F.col(size_col)).alias("actual_size"),
    )
    w = F.lit(0.0)
    for value, weight in sorted(weights.items(), reverse=True):
        w = F.when(
            F.col("stratum") == F.lit(str(value)), F.lit(float(weight))
        ).otherwise(w)
    target = w * F.lit(float(budget))
    return per.select(
        "stratum",
        "actual_size",
        F.round(target).cast("long").alias("target_size"),
        F.round(
            F.least(
                F.lit(1.0),
                target / F.greatest(F.col("actual_size"), F.lit(1)).cast("double"),
            ),
            6,
        ).alias("fraction"),
    )


def mixture_plan_sql(
    table: str,
    strata_expr: str,
    weights: dict[str, float],
    budget: int,
    size_expr: str,
) -> str:
    """DuckDB twin of ``mixture_plan`` — same CASE tree, same rounding."""
    arms = " ".join(
        f"when stratum = '{v}' then {float(w)!r}"
        for v, w in sorted(weights.items())
    )
    w = f"(case {arms} else 0.0 end)"
    return f"""
        select stratum, actual_size,
               cast(round({w} * {budget}) as bigint) as target_size,
               round(least(1.0, {w} * {budget}
                     / greatest(actual_size, 1)::double), 6) as fraction
        from (
          -- ::bigint: DuckDB sum() yields HUGEINT (float64 in pandas),
          -- which would break value-hash parity with Spark's long
          select {strata_expr}::varchar as stratum,
                 cast(sum({size_expr}) as bigint) as actual_size
          from {table}
          group by 1
        )
    """


def stratified_sample_sql(
    key_expr: str,
    strata_expr: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> str:
    """WHERE predicate equivalent to ``stratified_sample``."""
    arms = " ".join(
        f"when {strata_expr}::varchar = '{v}' then '{hash_threshold(f)}'"
        for v, f in sorted(fractions.items())
    )
    case = f"case {arms} else '{hash_threshold(default_fraction)}' end"
    return f"{_digest_sql(key_expr, seed)} < {case}"


def training_shuffle(
    df: DataFrame, key_col: str, n_shards: int, seed: int = 0
) -> DataFrame:
    """``(…input cols…, shard, pos)`` — deterministic global shuffle of a
    training corpus into ``n_shards`` randomly-ordered shards (the
    example-order randomization every pretraining loader needs; Meng et
    al.'s "shuffle the corpus once, stream shards sequentially" layout).

    Each row's shard and within-shard position are pure functions of
    ``(key, seed)``: ``u = 52-bit md5 integer of key:seed``; ``shard =
    u % n_shards``; ``pos`` = the row's 1-based rank within its shard
    ordered by the full 32-hex digest (hex string order = numeric order
    on the 128-bit space), key as tie-break. Re-running with the same
    seed on any partitioning/cluster size reproduces the identical
    layout (a resumed 100 TB job re-emits byte-identical shards); a new
    seed is a fresh permutation.

    Scale: a GLOBAL total order (one row_number over everything) cannot
    scale — this is the standard decomposition: the digest randomizes
    ACROSS shards, the within-shard sort randomizes WITHIN, and
    ``sortWithinPartitions`` semantics come from one shuffle on
    ``shard`` (hash-balanced by construction: shard sizes are Binomial
    (n, 1/n_shards), so AQE sees near-equal partitions). Writers then
    emit ``partitionBy(shard)`` files whose row order IS ``pos``.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    dig = _digest(F.col(key_col), seed)
    u = F.conv(F.substring(dig, 1, 13), 16, 10).cast("long")
    w = Window.partitionBy("shard").orderBy("_dig", key_col)
    return (
        df.withColumn("shard", (u % n_shards).cast("int"))
        .withColumn("_dig", dig)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_dig")
    )


def training_shuffle_sql(
    table: str, key_expr: str, cols: str, n_shards: int, seed: int = 0
) -> str:
    """DuckDB twin of ``training_shuffle`` over ``table``, projecting
    ``cols`` alongside ``shard``/``pos``."""
    dig = _digest_sql(key_expr, seed)
    u = f"(('0x' || substr({dig}, 1, 13))::ubigint % {n_shards})"
    return f"""
        select {cols},
               {u}::int as shard,
               row_number() over (
                 partition by {u} order by {dig}, {key_expr}
               )::bigint as pos
        from {table}
    """


def leakage_safe_split(
    clusters: DataFrame,
    cluster_col: str = "cluster_id",
    frac_train: float = 0.9,
    seed: int = 0,
) -> DataFrame:
    """Adds ``split`` ('train' | 'val') decided PER NEAR-DUP CLUSTER, so
    no duplicate pair ever straddles the split boundary.

    The leakage-safe form of the train/validation split every training
    pipeline needs: a per-DOCUMENT hash split leaks — a document and its
    near-duplicate land on opposite sides with probability
    2·f·(1−f), and the validation loss silently measures memorization.
    Keying the decision on the cluster label (every member inherits its
    cluster's coin flip) makes straddling impossible BY CONSTRUCTION,
    and because the label itself is content-derived (min member id), the
    split is reproducible across runs, partitionings, and engines — the
    same md5-threshold rule as ``hash_sample``, zero shuffles on top of
    the clusters table.

    Expected (not exact) train mass is ``frac_train`` of CLUSTERS; heavy
    clusters skew realized document mass — by design (the alternative,
    balancing document counts, would have to split some cluster).
    """
    return clusters.withColumn(
        "split",
        F.when(
            _digest(F.col(cluster_col), seed) < hash_threshold(frac_train),
            F.lit("train"),
        ).otherwise(F.lit("val")),
    )


def leakage_safe_split_sql(
    cluster_expr: str, frac_train: float, seed: int = 0
) -> str:
    """The SELECT expression equivalent to ``leakage_safe_split``."""
    return (
        f"case when {_digest_sql(cluster_expr, seed)} < "
        f"'{hash_threshold(frac_train)}' then 'train' else 'val' end"
    )


def quality_threshold_plan(
    df: DataFrame,
    text_col: str = "text",
    target_keep_frac: float = 0.7,
) -> DataFrame:
    """Calibrate the quality-gate threshold for a target keep rate.

    The quality gate (`prep.training_data_prep`, `functions/
    quality_model.py`) takes a THRESHOLD; production picks it from a
    budget ("keep the best ~70%"), not from first principles. This
    planner computes, EXACTLY, the smallest 6-dp quality-score
    threshold whose keep fraction still meets the target — the planner
    family's answer (`mixture_plan`, `lsh_param_plan`,
    `compaction_plan`) for the quality tier. One row::

        (threshold, n_docs, n_kept, keep_frac, target_keep_frac)

    where ``n_kept`` = docs with score ≥ threshold, ``keep_frac`` =
    n_kept / n_docs (≥ target by construction; the next-higher distinct
    score would undershoot).

    Exactness over approximation: ``percentile_approx`` is
    partition-order dependent and engine-specific; here scores are
    ROUNDED to 6dp first (the repo-wide gate convention), so the
    distinct-score distribution is small and the selection is an exact
    cumulative count over it — one partial-agg shuffle on the rounded
    score plus a window over (distinct scores) rows, which is bounded
    by 10⁶ regardless of corpus size.
    """
    from ..functions import textstats as ts

    score = F.round(ts.quality_score(F.col(text_col)), 6)
    dist = df.select(score.alias("q")).groupBy("q").agg(
        F.count("*").alias("c")
    )
    w = Window.orderBy(F.col("q").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # the distinct-score table is tiny (≤ 10^6 rows at 6dp): the global
    # window runs on one task over kilobytes, not over the corpus
    cum = dist.select(
        "q", F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy()).alias("n_docs"),
    )
    kept = cum.filter(
        F.col("cum") >= F.col("n_docs") * F.lit(target_keep_frac)
    )
    best = kept.agg(
        F.max("q").alias("threshold"),
        F.max("n_docs").alias("n_docs"),
    )
    return (
        best.join(cum.select(F.col("q").alias("threshold"), "cum"), "threshold")
        .select(
            "threshold",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("cum").cast("long").alias("n_kept"),
            F.round(F.col("cum") / F.col("n_docs").cast("double"), 6).alias(
                "keep_frac"
            ),
            F.lit(target_keep_frac).alias("target_keep_frac"),
        )
    )
