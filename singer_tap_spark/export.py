"""Training-data export: assemble per-conversation documents from turns.

The engine's output table is keyed (conv_id, turn_idx); the thing a training
pipeline consumes is whole conversations with STABLE TURN ORDERING — the
per-row invariant the north rule verifies.  ``assemble_conversations`` does
it in one partial-aggregatable pass: ``collect_list(struct(turn_idx, ...))``
then ``array_sort`` (JVM-side; sorting per conversation, never a global
sort), so a 10^10-row table exports with a single shuffle on conv_id.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(
    turns: DataFrame,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """One row per conversation: ordered turn array + flattened text.

    Output: (conv_id, n_turns, turns array<struct>, doc string) where
    ``doc`` is ``role: text`` lines in turn order — the export format a
    tokenizer/packer consumes downstream.
    """
    turn_struct = F.struct(
        F.col(order_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("text"),
    )
    agg = turns.groupBy(conv_col).agg(
        F.array_sort(F.collect_list(turn_struct)).alias("turns")
    )
    return agg.select(
        F.col(conv_col),
        F.size("turns").alias("n_turns"),
        "turns",
        F.array_join(
            F.transform(
                "turns", lambda t: F.concat(t["role"], F.lit(": "), t["text"])
            ),
            sep,
        ).alias("doc"),
    )


def pack_sequences(
    docs: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "conv_id",
    max_tokens: int = 4096,
) -> DataFrame:
    """Greedy sequence packing: assign docs to training-sequence bins of at
    most ``max_tokens`` (first-fit in id order within each partition-range).

    Implemented as a running token sum over the deterministic id order,
    then ``bin = floor(cumsum / max_tokens)`` — an approximation of
    bin-packing (no cross-bin backfill) that is deterministic.  NOTE: the
    global ordered window serializes to one task; at 10^9-doc scale replace
    with the standard two-pass form — ``repartitionByRange(id)``, per-
    partition sums, broadcast prefix offsets, per-partition window — same
    result, fully parallel.  This module ships the simple form because the
    export stage is dwarfed by tokenization anyway.
    """
    from pyspark.sql import Window

    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
    with_cum = docs.withColumn(
        "_cum", F.coalesce(F.sum(token_col).over(w), F.lit(0))
    )
    return with_cum.withColumn(
        "bin", F.floor(F.col("_cum") / max_tokens).cast("long")
    ).drop("_cum")
