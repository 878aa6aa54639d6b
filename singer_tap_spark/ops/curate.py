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


def remove_boilerplate_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_doc_frac: float = 0.05,
    min_docs: int = 2,
) -> DataFrame:
    """Per-line corpus-frequency dedup (the CCNet-style boilerplate pass):
    a LINE that appears in at least ``max(min_docs, ceil(min_doc_frac *
    n_docs))`` distinct documents is navigation/footer/cookie-banner
    boilerplate — drop it from every document; unique prose survives.
    This catches what whole-doc dedup can't: the 10^6 pages that are each
    unique but all end with the same subscribe blurb.

    Output: ``(id, clean_text, n_removed)`` — lines rejoined in original
    order; blank lines are structure, never counted or removed.

    Plan shape (10^10 docs): explode to lines (map-only) -> distinct
    (line-key, doc) + partial-agg count = the line-frequency shuffle ->
    left join on line-key -> one groupBy(id) reassembly shuffle.  All
    keyed, no cartesian; the doc-count threshold rides in as a 1-row
    broadcast (no driver-side count job).  Line keys are trimmed verbatim
    text — hash them (md5) if line lengths make the frequency shuffle
    heavy."""
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("idx", "ln"),
    ).select(id_col, "idx", "ln", F.trim("ln").alias("k"))
    n_docs = docs.agg(F.count("*").alias("_n"))
    freq = (
        lines.where(F.col("k") != "")
        .select(id_col, "k")
        .distinct()
        .groupBy("k")
        .agg(F.count("*").alias("_df"))
    )
    boiler = (
        freq.crossJoin(F.broadcast(n_docs))
        .where(
            F.col("_df")
            >= F.greatest(F.lit(min_docs), F.ceil(min_doc_frac * F.col("_n")))
        )
        .select("k", F.lit(True).alias("_boiler"))
    )
    marked = lines.join(boiler, "k", "left")
    kept = marked.where(F.col("_boiler").isNull() | (F.col("k") == ""))
    removed = marked.where(F.col("_boiler").isNotNull() & (F.col("k") != ""))
    # struct-field extraction (GetArrayStructFields, whole-stage codegen)
    # instead of a transform() HOF lambda — interpreted per line, the
    # ~us/element cost class the repo bans from per-row loops
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.array_sort(F.collect_list(F.struct("idx", "ln"))).getField("ln"),
            "\n",
        ).alias("clean_text")
    )
    counts = removed.groupBy(id_col).agg(F.count("*").alias("n_removed"))
    # left-join from the full id set: a doc whose EVERY line was
    # boilerplate survives as clean_text='' instead of vanishing
    return (
        docs.select(id_col)
        .join(rebuilt, id_col, "left")
        .join(counts, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.coalesce(F.col("n_removed"), F.lit(0)).cast("long").alias("n_removed"),
        )
    )


def quantile_gate(
    docs: DataFrame,
    score_col: str = "quality",
    keep_frac: float = 0.5,
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Keep the top ``keep_frac`` of rows by ``score_col`` — corpus-relative
    quality gating ("best 30% of the crawl"), the complement of curate()'s
    absolute ``min_quality`` cut.

    Threshold = percentile(score, 1 - keep_frac); rows with score >= it
    survive (ties inflate the kept set — deterministic, never drops a
    tied row).  One aggregation over the score column + a 1-row broadcast
    nested-loop join: the corpus itself never shuffles or sorts.

    ``exact=True`` uses Spark's exact interpolated ``percentile``
    (bit-identical to DuckDB's quantile_cont — oracle-checked); it buffers
    the score column per partition, fine up to ~10^9 rows of one double.
    At larger scale set ``exact=False``: ``approx_percentile`` (bounded-
    memory KLL-style sketch, rank error ~1/accuracy) — same plan shape,
    sketch-mergeable, no oracle exactness."""
    if not (0.0 < keep_frac <= 1.0):
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    p = 1.0 - keep_frac
    # backtick-quote (and escape embedded backticks) so column names with
    # spaces/dots/hyphens parse as one identifier instead of failing
    # analysis or resolving a nested field
    col_q = "`" + score_col.replace("`", "``") + "`"
    expr = (
        f"percentile({col_q}, {p!r})"
        if exact
        else f"approx_percentile({col_q}, {p!r}, {accuracy})"
    )
    thr = docs.agg(F.expr(expr).alias("_thr"))
    # the backticked form resolves the literal name (bare '.' would parse
    # as nested-field access)
    return docs.join(
        F.broadcast(thr), F.col(col_q) >= F.col("_thr")
    ).drop("_thr")


def curate(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.3,
    min_tokens: int = 5,
    languages: tuple[str, ...] | None = None,
    near_dup_jaccard: float | None = None,
    near_dup_hamming: int | None = None,
    cluster_resolve: bool = False,
    survivor: str = "min_id",
    normalize: bool = False,
    boilerplate_min_doc_frac: float | None = None,
    top_quality_frac: float | None = None,
) -> DataFrame:
    """Curated corpus: (optionally cleaned), annotated, filtered,
    exact-deduped (and optionally near-deduped).  Output keeps the
    original columns plus (n_tokens, quality, lang_pred, fingerprint).

    Cleanup pre-passes (run BEFORE annotation, in this order, each
    rewriting ``text_col``):
    - ``boilerplate_min_doc_frac``: per-line corpus-frequency dedup
      (:func:`remove_boilerplate_lines`) — drop nav/footer lines shared by
      at least that fraction of docs;
    - ``normalize=True``: :func:`singer_tap_spark.ops.text.normalize_text`
      (control strip, unicode folds, whitespace collapse).
    Post-gate: ``top_quality_frac`` keeps only that top fraction by the
    quality score (:func:`quantile_gate`) AFTER the absolute
    ``min_quality``/``min_tokens``/``languages`` gates — corpus-relative
    on top of absolute.

    Near-dup removal: ``near_dup_jaccard`` routes through MinHash-LSH +
    candidates-only exact-Jaccard verify; ``near_dup_hamming`` routes
    through SimHash chunk-join pairs (cheaper — one signature pass, no
    shingle explode — coarser).  Valid hamming range is 0..14: the chunk
    count is derived as hamming+1 so the pigeonhole guarantee always holds
    (out-of-range raises in simhash_near_dup_pairs); for looser similarity
    use the Jaccard route.

    Survivor policy over the discovered pairs:
    - default (``cluster_resolve=False``): greedy — the LOWER id of each
      pair survives (drop every ``b``).  Cheap (one anti-join) but a
      component can keep several local minima: ids 1-3, 2-3 keeps BOTH
      1 and 2 even though they are transitively connected through 3.
    - ``cluster_resolve=True``: resolve connected components over the pair
      graph (:func:`singer_tap_spark.ops.cluster.near_dup_clusters`) and
      keep exactly ONE survivor per component — one per transitive
      near-dup chain, the policy a training corpus actually wants.
      ``survivor='min_id'`` (default) keeps the min member id;
      ``survivor='quality'`` keeps the HIGHEST-quality member (the
      annotate stage's score, ties to min id) — keep the cleanest copy,
      not the accidentally-lowest id."""
    if survivor not in ("min_id", "quality"):
        raise ValueError(f"survivor must be 'min_id' or 'quality', got {survivor!r}")
    if survivor != "min_id" and not cluster_resolve:
        # the greedy route never consults the survivor policy — refuse
        # rather than silently returning min-id survivors
        raise ValueError(
            "survivor='quality' requires cluster_resolve=True (the greedy "
            "pair-loser route has no per-component survivor choice)"
        )
    if boilerplate_min_doc_frac is not None:
        cleaned = remove_boilerplate_lines(
            docs, text_col=text_col, id_col=id_col,
            min_doc_frac=boilerplate_min_doc_frac,
        )
        docs = (
            docs.drop(text_col)
            .join(cleaned.select(id_col, "clean_text"), id_col)
            .withColumnRenamed("clean_text", text_col)
        )
    if normalize:
        from singer_tap_spark.ops.text import normalize_text

        docs = docs.withColumn(text_col, normalize_text(F.col(text_col)))
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
    if top_quality_frac is not None:
        # corpus-relative gate on top of the absolute ones; NOTE the
        # threshold branch re-executes the annotate chain — callers doing
        # this at scale should stage-checkpoint first (see docs_preprocess)
        gated = quantile_gate(gated, score_col="quality", keep_frac=top_quality_frac)

    # exact dedup: keep the min-id doc per fingerprint (one shuffle)
    keep = gated.groupBy("fingerprint").agg(F.min(id_col).alias(id_col))
    out = gated.join(keep, ["fingerprint", id_col])  # semi-join by key pair

    def _pairs_jaccard(corpus):
        return minhash_lsh_candidates(
            corpus, text_col=text_col, id_col=id_col,
            verify_threshold=near_dup_jaccard,
        ).select("a", "b")

    def _pairs_hamming(corpus):
        from singer_tap_spark.ops.dedup_text import simhash_near_dup_pairs

        return simhash_near_dup_pairs(
            corpus, text_col=text_col, id_col=id_col,
            max_hamming=near_dup_hamming,
        ).select("a", "b")

    routes = []
    if near_dup_jaccard is not None:
        routes.append(_pairs_jaccard)
    if near_dup_hamming is not None:
        routes.append(_pairs_hamming)
    if not routes:
        return out

    if cluster_resolve:
        # one pair graph over the full corpus (both routes' edges union),
        # one component resolution, exactly one survivor per component
        from functools import reduce

        from singer_tap_spark.ops.cluster import cluster_survivors, near_dup_clusters

        pairs = reduce(lambda x, y: x.unionByName(y), (r(out) for r in routes))
        clusters = near_dup_clusters(out.select(id_col), pairs, id_col=id_col)
        if survivor == "quality":
            members = clusters.join(out.select(id_col, "quality"), id_col)
            survivors = cluster_survivors(
                members, id_col=id_col, score_col="quality"
            ).select(id_col)
        else:
            # min-label components: the min member IS the cluster_id
            survivors = clusters.where(
                F.col(id_col) == F.col("cluster_id")
            ).select(id_col)
        return out.join(survivors, id_col, "left_semi")

    # greedy: routes apply sequentially, each over the already-thinned corpus
    for route in routes:
        losers = route(out).select(F.col("b").alias(id_col)).distinct()
        out = out.join(losers, id_col, "left_anti")
    return out
