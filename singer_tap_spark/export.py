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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T



def _ordered_turns(
    turns: DataFrame, conv_col: str, order_col: str, role_col: str, text_col: str
) -> DataFrame:
    """(conv_col, turns): per-conversation array_sort'd turn-struct array —
    THE single-shuffle assembly every export op shares (collect_list +
    array_sort; per-conversation sort, never global).  One definition so
    ordering/null semantics cannot silently diverge between ops."""
    turn_struct = F.struct(
        F.col(order_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        F.col(text_col).alias("text"),
    )
    return turns.groupBy(conv_col).agg(
        F.array_sort(F.collect_list(turn_struct)).alias("turns")
    )


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
    agg = _ordered_turns(turns, conv_col, order_col, role_col, text_col)
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


def conversation_prefix_dedup(
    turns: DataFrame,
    prefix_turns: int = 3,
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """Group conversations sharing their first ``prefix_turns`` turns —
    agent/transcript corpora are full of retries and forks that replay a
    common prefix, and training on every fork over-weights it.  Output:
    (prefix_fp, canonical_conv_id = min conv over the group, n_convs),
    one row per distinct prefix.

    One partial-agg pass: per-conversation ordered turn array (the
    assemble_conversations shape), ``slice`` to the prefix, md5 of the
    rendered prefix, then a groupBy on the fingerprint — two shuffles
    total (conv key, then uniform md5 key), no self-join, no explosion.
    Conversations with FEWER than ``prefix_turns`` turns fingerprint their
    whole (shorter) prefix — forks that diverge inside the window stay
    distinct.
    """
    agg = _ordered_turns(turns, conv_col, order_col, role_col, text_col)
    # INJECTIVE serialization (length-prefixed fields, netstring-style):
    # rendering 'role: text' lines is forgeable — a single turn whose text
    # contains '\nassistant: ...' renders identically to several real
    # turns, colliding distinct conversations under one fingerprint.
    # Length prefixes pin every field boundary, so no crafted text can
    # imitate another turn sequence.  NULL fields encode as the sentinel
    # 'N' (unforgeable: every non-null field starts with a digit) —
    # a bare concat would go NULL and array_join would silently DROP the
    # element, colliding conversations that differ only by a null turn,
    # and making NULL distinct from '' ('0:').
    def _field(x):
        return F.when(x.isNull(), F.lit("N")).otherwise(
            F.concat(F.length(x), F.lit(":"), x)
        )

    prefix_doc = F.array_join(
        F.transform(
            F.slice(F.col("turns"), 1, prefix_turns),
            lambda t: F.concat(
                _field(t["role"]), F.lit(":"), _field(t["text"]), F.lit("|"),
            ),
        ),
        "",
    )
    fps = agg.select(F.col(conv_col), F.md5(prefix_doc).alias("prefix_fp"))
    return fps.groupBy("prefix_fp").agg(
        F.min(conv_col).alias("canonical_conv_id"),
        F.count("*").alias("n_convs"),
    )


# (prefix, role/text separator, suffix, turn separator)
_CHAT_TEMPLATES = {
    "plain": ("", ": ", "", "\n"),
    "chatml": ("<|im_start|>", "\n", "<|im_end|>", "\n"),
}


def render_chat_template(
    turns: DataFrame,
    template: str = "chatml",
    conv_col: str = "conv_id",
    order_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
) -> DataFrame:
    """(conv_id, n_turns, text): turns rendered into the string a tokenizer
    consumes — the step between the merged transcript table and
    ``pack_sequences``.  Same single-shuffle ``collect_list`` +
    ``array_sort`` pass as :func:`assemble_conversations` (stable turn
    ordering, per-conversation sort, never global).

    Templates (public formats): ``'chatml'`` renders
    ``<|im_start|>role\\ntext<|im_end|>`` per turn; ``'plain'`` renders
    ``role: text`` lines.
    """
    try:
        pre, mid, post, sep = _CHAT_TEMPLATES[template]
    except KeyError:
        raise ValueError(
            f"unknown chat template {template!r}; known: "
            f"{sorted(_CHAT_TEMPLATES)}"
        ) from None
    agg = _ordered_turns(turns, conv_col, order_col, role_col, text_col)
    return agg.select(
        F.col(conv_col),
        F.size("turns").alias("n_turns"),
        F.array_join(
            F.transform(
                "turns",
                lambda t: F.concat(
                    F.lit(pre), t["role"], F.lit(mid), t["text"], F.lit(post)
                ),
            ),
            sep,
        ).alias("text"),
    )


def pack_sequences(
    docs: DataFrame,
    token_col: str = "n_tokens",
    id_col: str = "conv_id",
    max_tokens: int = 4096,
    n_ranges: int | None = None,
) -> DataFrame:
    """Greedy sequence packing: assign docs to training-sequence bins so
    that bin totals never exceed ``max_tokens`` for docs that individually
    fit (a doc larger than ``max_tokens`` gets a bin of its own size).

    NEXT-FIT packing, parallel per id-range (the r1 version was a global
    ``floor(cumsum/max)`` over a single-task ordered window — quadratic-ly
    wrong twice over: one task for the whole corpus, AND a straddling doc
    let the next bin fill to ~2x the cap, violating the contract):

      1. range-bucket docs on the numeric ``id_col`` into ``n_ranges``
         explicit intervals computed from (min, max) — deterministic at any
         parallelism, unlike ``spark_partition_id`` after a sampled
         ``repartitionByRange``;
      2. each range packs independently with sequential next-fit (open a
         new bin when the doc would overflow the current one) inside ONE
         ``applyInPandas`` pass — packing is an inherently sequential fold,
         the documented use-case for dropping out of Catalyst; ranges are
         the parallel unit, so no single-task stage;
      3. local bins become global via per-range bin-count prefix offsets
         (an ``n_ranges``-row collect — metadata-sized).

    Guarantees: every bin holds docs from one range, in id order, totalling
    <= ``max_tokens`` (a doc bigger than the cap sits alone in its own
    bin); same output at any parallelism for a fixed ``n_ranges``.  At most
    ``n_ranges`` partially-filled trailing bins — negligible waste at 10^9
    docs.  ``id_col`` must be numeric and unique (it defines pack order).

    Caching: the packed stage is persisted (consumed by the bin-count
    collect AND by the caller) and auto-unpersisted when the returned
    DataFrame is garbage-collected — drop the reference (or call
    ``returned_df._release_pack_cache()``) once written, so repeated calls
    in a long-lived session don't accumulate cached partitions (ADVICE r3).
    """
    spark = docs.sparkSession
    if n_ranges is None:
        n_ranges = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    bounds = docs.agg(
        F.min(id_col).alias("lo"), F.max(id_col).alias("hi")
    ).first()
    if bounds["lo"] is None:  # empty input
        return docs.withColumn("bin", F.lit(None).cast("long"))
    lo, hi = bounds["lo"], bounds["hi"]
    width = max((float(hi) - float(lo) + 1.0) / n_ranges, 1.0)
    rng = F.least(
        F.lit(n_ranges - 1),
        F.floor((F.col(id_col) - F.lit(lo)) / F.lit(width)).cast("int"),
    )
    bucketed = docs.withColumn("_rng", rng)

    out_schema = T.StructType(
        bucketed.schema.fields + [T.StructField("_local_bin", T.LongType())]
    )

    def _pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        toks = pdf[token_col].to_numpy()
        bins = np.empty(len(toks), dtype=np.int64)
        b, fill = 0, 0
        for i, t in enumerate(toks):  # sequential by definition (next-fit)
            if fill > 0 and fill + t > max_tokens:
                b, fill = b + 1, 0
            bins[i] = b
            fill += t
        pdf["_local_bin"] = bins
        return pdf

    # persist: the packing stage is consumed TWICE — once by the bin-count
    # collect below, again when the caller evaluates the returned frame.
    # Without it the sequential next-fit fold runs twice over the whole
    # corpus (ADVICE r2).  MEMORY_AND_DISK: spills instead of recomputing.
    from pyspark import StorageLevel

    packed = (
        bucketed.groupBy("_rng")
        .applyInPandas(_pack, out_schema)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # per-range bin counts -> global prefix offsets (n_ranges rows)
    counts = {
        r["_rng"]: r["nb"]
        for r in packed.groupBy("_rng")
        .agg((F.max("_local_bin") + 1).alias("nb"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for i in range(n_ranges):
        offsets[i] = acc
        acc += int(counts.get(i, 0))
    off_map = F.create_map(
        *[x for i in range(n_ranges) for x in (F.lit(i), F.lit(offsets[i]))]
    )
    result = (
        packed.withColumn(
            "bin", (off_map[F.col("_rng")] + F.col("_local_bin")).cast("long")
        )
        .drop("_rng", "_local_bin")
    )

    # release the cache when the caller is done: explicitly, or for free at
    # GC of the returned frame (best-effort — session may already be gone)
    def _release(_packed=packed):
        try:
            _packed.unpersist()
        except Exception:
            pass

    import weakref

    weakref.finalize(result, _release)
    result._release_pack_cache = _release
    return result
