"""Corpus curation: the composed filter -> dedup -> annotate pipeline.

One call chaining the text-analysis and dedup operators the way a training-
data pipeline actually runs them, in dependency-cost order so the cheap
filters shrink the corpus before the expensive dedup join:

    1. annotate: token count, quality score, language (pure JVM exprs);
    2. filter: quality/lang/length gates (predicate pushdown applies);
    3. exact dedup: md5-fingerprint groupBy keeps the min-id copy;
    4. (optional) near-dup removal: MinHash-LSH candidates verified by
       n-gram Jaccard; the LOWER id of each verified pair survives.

Every stage is a declarative DataFrame op — Catalyst fuses 1+2 into the
scan, and the only shuffles are the dedup groupBy and the LSH band join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from singer_tap_spark.ops.dedup_text import minhash_lsh_candidates
from singer_tap_spark.ops.text import (
    doc_fingerprint,
    lang_id,
    quality_score,
    token_count,
)


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    min_tokens: int = 5,
    languages: tuple[str, ...] | None = None,
    near_dup_jaccard: float | None = None,
    near_dup_hamming: int | None = None,
) -> DataFrame:
    """Curated corpus: annotated, filtered, exact-deduped (and optionally
    near-deduped).  Output keeps the original columns plus
    (n_tokens, quality, lang_pred, fingerprint).

    Near-dup removal, lower id survives each pair: ``near_dup_jaccard``
    routes through MinHash-LSH + candidates-only exact-Jaccard verify;
    ``near_dup_hamming`` routes through SimHash chunk-join pairs (cheaper —
    one signature pass, no shingle explode — coarser).  Valid hamming range
    is 0..14: the chunk count is derived as hamming+1 so the pigeonhole
    guarantee always holds (out-of-range raises in simhash_near_dup_pairs);
    for looser similarity use the Jaccard route."""
    t = F.col(text_col)
    annotated = docs.select(
        "*",
        token_count(t).cast("long").alias("n_tokens"),
        quality_score(t).alias("quality"),
        lang_id(t).alias("lang_pred"),
        doc_fingerprint(t).alias("fingerprint"),
    )
    gated = annotated.where(
        (F.col("quality") >= min_quality) & (F.col("n_tokens") >= min_tokens)
    )
    if languages:
        gated = gated.where(F.col("lang_pred").isin(list(languages)))

    # exact dedup: keep the min-id doc per fingerprint (one shuffle)
    keep = gated.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    out = gated.join(keep, ["fingerprint", id_col])  # semi-join by key pair

    if near_dup_jaccard is not None:
        pairs = minhash_lsh_candidates(
            out, text_col=text_col, id_col=id_col,
            verify_threshold=near_dup_jaccard,
        )
        losers = pairs.select(F.col("b").alias(id_col)).distinct()
        out = out.join(losers, id_col, "left_anti")
    if near_dup_hamming is not None:
        from singer_tap_spark.ops.dedup_text import simhash_near_dup_pairs

        pairs = simhash_near_dup_pairs(
            out, text_col=text_col, id_col=id_col, max_hamming=near_dup_hamming
        )
        losers = pairs.select(F.col("b").alias(id_col)).distinct()
        out = out.join(losers, id_col, "left_anti")
    return out
