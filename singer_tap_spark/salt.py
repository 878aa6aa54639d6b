"""Deterministic salted repartition — hot-conversation skew defusal.

The LWW dedup itself is skew-proof (``max_by`` does map-side partial
aggregation — see dedup.py), but *write-side* skew remains: one conversation
holding 50% of a batch (FIXTURES.md §7.8) lands every surviving row in one
bucket partition writer.  We spread the shuffle/write work with a
deterministic salt — ``pmod(xxhash64(conv_id, turn_idx), S)`` — NEVER
``rand()``, so the same input yields the same layout at any parallelism
(the local[8] == local[32] determinism requirement, BASELINE.md §4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_expr(cols: Sequence[str], n_salts: int) -> F.Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salts)).cast("int")


def salted_repartition(
    df: DataFrame,
    key_cols: Sequence[str],
    salt_cols: Sequence[str],
    n_partitions: int,
    n_salts: int = 8,
) -> DataFrame:
    """Repartition on (key, salt) so a hot key spreads over ``n_salts``
    tasks while rows of one (key, salt) stay co-located."""
    return df.repartition(
        n_partitions, *[F.col(c) for c in key_cols], salt_expr(salt_cols, n_salts)
    )
