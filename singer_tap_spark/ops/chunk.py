"""Document chunking: token-window split with overlap — the step between
curation and tokenization in a training-data pipeline (long documents become
model-context-sized pieces; the stride overlap preserves cross-boundary
context).  Role analogue of the reference's record batching (size-capped
batches, http_record_writer.go:17-26) applied to tokens instead of records.

Pure Catalyst: split -> posexplode(sequence of starts) -> slice/array_join.
No HOF ``transform`` lambda in the loop (interpreted, the r3/r4 lesson) —
the per-chunk work happens AFTER the explode as ordinary whole-stage-codegen
expressions.  Narrow plan: zero shuffles, zero Python; scales as a map-only
stage at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_tokens: int = 256,
    stride: int = 192,
) -> DataFrame:
    """(id, chunk_idx, chunk_tokens, chunk_text): sliding token windows.

    Chunk ``i`` covers whitespace-token positions ``[i*stride, i*stride +
    max_tokens)``; the number of chunks is ``1`` when the document fits,
    else ``floor((n - max_tokens + stride - 1)/stride) + 1`` — every token
    is covered, the final window may extend past the end (slice truncates),
    and no window starts at-or-beyond ``n``.  ``stride < max_tokens`` gives
    overlapping context; ``stride == max_tokens`` is a disjoint split.
    Empty/blank documents yield one empty chunk (chunk_tokens=0), so every
    input id survives — callers filter ``chunk_tokens > 0`` to drop them.

    Deterministic and engine-independent: tokenization is the same
    ``\\s+``-on-trimmed-text rule as :func:`ops.text.token_count`.
    """
    if not (0 < stride <= max_tokens):
        raise ValueError(f"need 0 < stride <= max_tokens, got {stride}/{max_tokens}")
    t = F.trim(F.coalesce(F.col(text_col), F.lit("")))
    words = F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )
    n = F.size(words)
    n_chunks = F.when(n <= max_tokens, F.lit(1)).otherwise(
        F.floor((n - max_tokens + stride - 1) / F.lit(stride)).cast("long") + 1
    )
    sized = docs.select(
        F.col(id_col), words.alias("_w"), n_chunks.alias("_nc")
    )
    exploded = sized.select(
        id_col,
        "_w",
        F.posexplode(
            F.sequence(F.lit(0).cast("long"), (F.col("_nc") - 1) * stride, F.lit(stride).cast("long"))
        ).alias("chunk_idx", "_start"),
    )
    piece = F.slice("_w", F.col("_start").cast("int") + 1, max_tokens)
    return exploded.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(piece).cast("int").alias("chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
