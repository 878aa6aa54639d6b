"""Deterministic, reproducible corpus sampling — exact and stratified.

A training-data pipeline must be able to re-run a sample and get the SAME
rows (ablations, incremental rebuilds, holdout splits).  Spark's
``df.sample`` / ``sampleBy`` draw per-task random streams, so results change
with partitioning; these operators instead hash the ROW KEY — membership is
a pure function of (id, seed), stable at any parallelism, any cluster size,
any engine.

The key is the first 8 hex chars of ``md5(id ':' seed)`` read as an integer
uniform in [0, 16^8) — md5 because Spark and DuckDB produce identical
digests, so every sample is full-SQL-oracle-checkable.  A row is kept when
its key falls under ``fraction * 16^8``.

Properties (tested):
- deterministic at any partitioning;
- NESTED: sample(0.2) is a subset of sample(0.5) at the same seed — growing
  a sample never reshuffles previously selected rows (the property that
  makes incremental dataset scaling reproducible);
- disjoint seeds give independent draws (holdout vs train).

Scale shape: a narrow Catalyst filter — no shuffle, no state, no RNG; at
10^10 rows it runs inside the scan's whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_KEY_SPACE = 16**8


def sample_key(id_col: str, seed: int = 42) -> F.Column:
    """Uniform [0, 16^8) hash key of (id, seed) — md5-based so DuckDB
    reproduces it bit-for-bit (``('0x' || substr(md5(...), 1, 8))::BIGINT``)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(str(seed)))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")


def deterministic_sample(
    df: DataFrame, fraction: float, id_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership a pure function of (id, seed)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction={fraction} outside [0, 1]")
    return df.where(sample_key(id_col, seed) < int(fraction * _KEY_SPACE))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Per-stratum keep fractions (e.g. language rebalancing:
    ``{'en': 0.1, 'de': 0.5}``); strata absent from the map keep
    ``default_fraction``.  Same key as :func:`deterministic_sample`, so the
    same row stays selected when its stratum's fraction grows."""
    for k, v in fractions.items():
        if not 0.0 <= v <= 1.0:
            raise ValueError(f"fraction for stratum {k!r} = {v} outside [0, 1]")
    thresholds = F.create_map(
        *[
            x
            for k, v in sorted(fractions.items())
            for x in (F.lit(k), F.lit(int(v * _KEY_SPACE)))
        ]
    )
    thr = F.coalesce(
        thresholds[F.col(strata_col)],
        F.lit(int(default_fraction * _KEY_SPACE)),
    )
    return df.where(sample_key(id_col, seed) < thr)


def mixture_sample(
    df: DataFrame,
    target_weights: dict[str, float],
    budget_tokens: int,
    source_col: str = "source",
    token_col: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Token-budget-aware data-mixture sampling: keep a deterministic
    per-source sample sized so each source contributes ~``budget_tokens *
    weight`` tokens — the mixing step every pretraining corpus runs
    (upweight curated sources, downsample crawl) expressed as pure
    per-row filters.

    ``fraction_s = min(1, budget * w_s / available_tokens_s)`` from ONE
    aggregation over the corpus (the per-source totals collect is
    #sources-sized — metadata); membership then comes from the same
    md5-keyed :func:`stratified_sample` filter, so the chosen rows are
    deterministic at any parallelism, NESTED under budget growth (raising
    the budget only adds rows), and a source short of its target keeps
    everything it has (fraction capped at 1).  Sources absent from
    ``target_weights`` are dropped.  Expected sampled token mass per
    source ~= its target (exact only in expectation: membership is
    per-row, tokens vary per doc).

    Returns the sampled rows with an ``n_tokens`` column appended when
    ``token_col`` is None (derived via ``token_count``).
    """
    from singer_tap_spark.ops.text import token_count

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens={budget_tokens} < 0")
    if token_col is None:
        df = df.withColumn("n_tokens", token_count(F.col(text_col)).cast("long"))
        token_col = "n_tokens"
    totals = {
        r["s"]: r["tk"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.sum(token_col).alias("tk"))
        .collect()
    }
    fractions = {}
    for s, w in target_weights.items():
        if w < 0:
            raise ValueError(f"weight for source {s!r} = {w} < 0")
        avail = totals.get(s, 0) or 0
        if avail > 0:
            # evaluation order pinned: (budget * w) / avail, then min —
            # the DuckDB oracle repeats it verbatim so the truncated
            # md5 thresholds agree bit-for-bit
            fractions[s] = min(1.0, (budget_tokens * w) / avail)
    if not fractions:
        return df.where(F.lit(False))
    return stratified_sample(
        df, source_col, fractions, default_fraction=0.0,
        id_col=id_col, seed=seed,
    )


def assign_splits(
    df: DataFrame,
    weights: dict[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint dataset splits (train/val/test): the key space
    is interval-partitioned by cumulative weight, so every row lands in
    exactly one split, reproducibly, at any parallelism.  Weights must sum
    to ~1.0 (1e-6 tolerance).

    Leakage note: splitting on ``doc_id`` puts near-duplicate documents in
    DIFFERENT splits ~at the duplication rate — for contamination-safe
    splits pass the content key instead: ``id_col='fingerprint'`` (after
    ``doc_fingerprint``) for exact copies, or the near-dup cluster id from
    :func:`singer_tap_spark.ops.cluster.near_dup_clusters` over LSH/SimHash
    pairs for transitive chains — all copies then share a hash key and land
    in the same split.
    """
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-6:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    key = sample_key(id_col, seed)
    expr = None
    acc = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = key < int(acc * _KEY_SPACE)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)


def exact_k_sample(
    df: DataFrame,
    k: int,
    strata_col: str | None = None,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """EXACTLY ``k`` rows (per stratum): rank rows by the md5 sample key and
    keep the k smallest — the eval-set constructor ("exactly 1000 docs per
    language").  Same determinism/nesting contract as the fraction
    samplers: membership is a pure function of (id, seed), independent of
    partitioning and engine, and the k+1 sample is a superset of the k
    sample.  Ties cannot occur (key ties fall back to the unique id).

    Scale shape: with ``strata_col``, one shuffle on the stratum and a
    bounded per-stratum window.  WITHOUT strata the global form compiles
    to TakeOrderedAndProject (per-partition partial top-k, then one
    k-sized merge — never a full sort); keep global k modest (it
    materializes k rows on one task)."""
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    key = sample_key(id_col, seed)
    if strata_col is None:
        return df.orderBy(key.asc(), F.col(id_col).asc()).limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )
