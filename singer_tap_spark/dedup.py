"""Last-writer-wins dedup — operator O17 (SURVEY.md §2.1).

The reference gets LWW implicitly: binlog order per shard
(planetscale_edge_database.go:207-227) plus the destination's per-PK
``sequence`` resolution (types.go:496-503).  Here it is explicit and
distributed; the total order per key is ``(ts, seq)`` — equal (ts, seq)
means the same event replayed, so either copy is correct (§2.3 #3, #10).

Two equivalent implementations:

- :func:`lww_latest` — ``groupBy(key).agg(max_by(payload, order))``.
  ``max_by`` is a declarative aggregate, so Spark runs a *partial* max on
  every input partition before the shuffle (map-side combine).  A key with
  10^6 duplicate updates ships at most one row per input partition — this is
  the skew-proof default and needs NO salting for the dedup stage itself.
- :func:`lww_latest_window` — window ``row_number`` over
  ``partitionBy(key).orderBy(desc(order))``.  No partial aggregation (all
  rows of a key shuffle to one task), kept for parity testing and because
  it is the shape the DuckDB oracle uses.

At 100 TB: `lww_latest` is one shuffle on the key columns; AQE coalesces
small post-shuffle partitions. Hot *conversations* are naturally spread
because the key includes ``turn_idx``; hot single *keys* are absorbed by
the partial aggregation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lww_latest(
    df: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    order_cols: Sequence[str] = ("ts", "seq"),
    value_cols: Sequence[str] | None = None,
    hash_prefix: bool = True,
) -> DataFrame:
    """One row per key: the one with the max ``(order_cols)`` tuple.

    Struct comparison in Spark is lexicographic, so ``max_by(payload,
    struct(ts, seq))`` picks the latest-(ts, seq) row — partial-aggregatable,
    hence skew-proof (see module docstring).

    ``hash_prefix``: payload-carrying max_by forces SortAggregate, and
    Spark's sort fast-path compares an 8-byte prefix of the FIRST group
    column — string keys sharing a common prefix (``conv-0000…``) defeat
    it.  Prepending ``xxhash64(keys)`` as an extra (redundant) group column
    gives every comparison a discriminating numeric prefix (~10% faster at
    16 cores / 16M rows); grouping semantics are unchanged because the hash
    is a function of the keys.
    """
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in key_cols]
    group_cols = list(key_cols)
    if hash_prefix:
        df = df.withColumn("__khash", F.xxhash64(*[F.col(c) for c in key_cols]))
        group_cols = ["__khash", *key_cols]
    ord_struct = F.struct(*[F.col(c) for c in order_cols])
    val_struct = F.struct(*[F.col(c) for c in value_cols])
    agg = df.groupBy(*group_cols).agg(F.max_by(val_struct, ord_struct).alias("_w"))
    return agg.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in value_cols]
    )


def lww_latest_window(
    df: DataFrame,
    key_cols: Sequence[str] = ("conv_id", "turn_idx"),
    order_cols: Sequence[str] = ("ts", "seq"),
) -> DataFrame:
    """Window-function variant (oracle-shaped; no map-side combine)."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.desc(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def drop_exact_duplicates(
    df: DataFrame, identity_cols: Sequence[str] = ("shard", "offset", "seq")
) -> DataFrame:
    """Remove exact replay duplicates — same (shard, offset, seq) is the
    same binlog event re-received (no-double-emission invariant,
    planetscale_edge_database_test.go:669-679).  In streaming this becomes
    ``dropDuplicatesWithinWatermark`` (state bounded by the watermark)."""
    return df.dropDuplicates(list(identity_cols))
