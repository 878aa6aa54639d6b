"""ADVICE r2: the LSH-family driver entries have EXACT SQL oracles only
because banding recall is measured complete at the entries' pinned settings
— so that parity must be enforced at the same id-cutoffs/settings on EVERY
shipped sf, not just sf0.001.  A testdata regeneration that broke recall
would fail here loudly instead of surfacing as a driver hash mismatch.

Cheap at every sf: the entries' id cutoffs (doc_id < 150, vec_id < 200/300)
bound the compared corpus regardless of scale factor.
"""

import pytest
from pyspark.sql import functions as F

from singer_tap_spark.ops.dedup_text import minhash_lsh_candidates
from singer_tap_spark.ops.similarity import (
    _dot,
    embedding_near_dup_pairs,
    lsh_ann_topk,
    with_unit_vec,
)

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


@pytest.mark.parametrize("sf", SFS)
def test_minhash_lsh_parity_at_driver_settings(spark, sf):
    """docs_minhash_lsh: banding at 64/16 recovers EVERY pair with exact
    jaccard >= 0.5 on the doubled doc_id<150 corpus (the driver entry's
    exact-SQL oracle is valid only if this holds)."""
    d = spark.read.parquet(f"{sf}/documents.parquet").where(F.col("doc_id") < 150)
    dd = d.select("doc_id", "text").unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    )
    got = {(r.a, r.b, r.jaccard) for r in
           minhash_lsh_candidates(dd, verify_threshold=0.5).select(
               "a", "b", "jaccard").collect()}

    # exact: shingle self-join jaccard on the same corpus
    from singer_tap_spark.ops.dedup_text import ngram_jaccard_pairs

    want = {(r.a, r.b, r.jaccard) for r in
            ngram_jaccard_pairs(dd, n=4, threshold=0.5).collect()}
    assert got == want
    assert len(got) > 0


@pytest.mark.parametrize("vec", [False, True], ids=["hof", "gemm"])
@pytest.mark.parametrize("sf", SFS)
def test_lsh_ann_parity_at_driver_settings(spark, sf, vec):
    """emb_lsh_ann: planes=2 x tables=32 top-5 equals exact brute-force
    top-5 on the vec_id<200 corpus — via BOTH signature paths (the entry
    ships the Arrow GEMM kernel, so its exact-SQL oracle needs the gemm
    leg enforced at every shipped sf, same argument as banding recall)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").where(F.col("vec_id") < 200)
    got = {tuple(r) for r in
           lsh_ann_topk(emb, k=5, n_planes=2, n_tables=32,
                        vectorized_signatures=vec).collect()}
    want = {tuple(r) for r in _brute_topk(emb, k=5).collect()}
    assert got == want
    assert len(got) > 0


@pytest.mark.parametrize("vec", [False, True], ids=["hof", "gemm"])
@pytest.mark.parametrize("sf", SFS)
def test_embedding_near_dup_parity_at_driver_settings(spark, sf, vec):
    """emb_near_dup_pairs: planes=2 x tables=16 at threshold 0.35 recovers
    every brute-force pair on the vec_id<300 corpus — both signature
    paths (entry ships gemm)."""
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").where(F.col("vec_id") < 300)
    got = {(r.a, r.b, r.cos_sim) for r in
           embedding_near_dup_pairs(
               emb, threshold=0.35, n_planes=2, n_tables=16,
               vectorized_signatures=vec).collect()}
    u = with_unit_vec(emb).select(F.col("vec_id").alias("id"), F.col("_unit").alias("v"))
    want = {(r.a, r.b, r.cos_sim) for r in (
        u.alias("l").join(u.alias("r"), F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                F.round(_dot("l.v", "r.v"), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.35)).collect()}
    assert got == want
    assert len(got) > 0


def _brute_topk(emb, k):
    from singer_tap_spark.ops.similarity import brute_force_topk

    return brute_force_topk(emb, emb, k=k)


@pytest.mark.parametrize("sf", SFS)
def test_incremental_minhash_parity_at_driver_settings(spark, sf, tmp_path):
    """docs_dup_incremental: batch-vs-index at the entry's slices equals the
    full-corpus recompute at EVERY shipped sf — the banding-recall argument
    behind its exact-SQL oracle, enforced where the driver can't see."""
    from singer_tap_spark.ops.incremental import MinHashIndex

    d = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .where(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    corpus = d.where(F.col("doc_id") < 100)
    batch = d.where(F.col("doc_id") >= 100).unionByName(
        d.where(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.upsert(corpus, batch_id=0)
    got = {(r.a, r.b, r.jaccard) for r in
           idx.dedup_batch(batch, verify_threshold=0.5).select(
               "a", "b", "jaccard").collect()}

    from singer_tap_spark.ops.dedup_text import ngram_jaccard_pairs

    exact = ngram_jaccard_pairs(corpus.unionByName(batch), n=4, threshold=0.5)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {(r.a, r.b, r.jaccard) for r in exact.collect()
            if r.a in batch_ids or r.b in batch_ids}
    assert got == want
    assert len(got) > 0


@pytest.mark.parametrize("vec", [False, True], ids=["hof", "gemm"])
@pytest.mark.parametrize("sf", SFS)
def test_embedding_index_parity_at_driver_settings(spark, sf, tmp_path, vec):
    """emb_ann_incremental: batch top-5 vs the persisted index equals the
    exact brute-force answer at the entry's pinned slices/settings on
    EVERY shipped sf (candidate-exactness is what licenses its SQL
    oracle) — both signature paths (entry ships gemm)."""
    from singer_tap_spark.ops.incremental import EmbeddingLSHIndex

    emb = spark.read.parquet(f"{sf}/embeddings.parquet").where(
        F.col("vec_id") < 200
    )
    dim = len(emb.select("embedding").first()[0])
    corpus = emb.where(F.col("vec_id") < 150)
    batch = emb.where(F.col("vec_id") >= 150)
    idx = EmbeddingLSHIndex(spark, str(tmp_path / "eidx"), dim=dim,
                            n_planes=2, n_tables=32,
                            vectorized_signatures=vec)
    idx.upsert(corpus, batch_id=0)
    got = {tuple(r) for r in idx.topk_batch(batch, k=5).collect()}
    want = {tuple(r) for r in
            _brute_topk(emb, k=5).where(F.col("query_id") >= 150).collect()}
    assert got == want
    assert len(got) > 0


@pytest.mark.parametrize("sf", SFS)
def test_incremental_cluster_parity_at_driver_settings(spark, sf, tmp_path):
    """docs_dup_clusters_incremental: seed-then-batch index maintenance at
    the entry's slices equals near_dup_clusters over the EXACT n-gram
    jaccard pairs of the combined corpus at EVERY shipped sf — pair
    completeness (banding) plus subgraph-relabel correctness, enforced
    end-to-end where the driver can't see."""
    from singer_tap_spark.ops.cluster import near_dup_clusters
    from singer_tap_spark.ops.dedup_text import ngram_jaccard_pairs
    from singer_tap_spark.ops.incremental import ClusterIndex, MinHashIndex

    d = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .where(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    corpus = d.where(F.col("doc_id") < 100)
    batch = d.where(F.col("doc_id") >= 100).unionByName(
        d.where(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    mh = MinHashIndex(spark, str(tmp_path / "mh"))
    cc = ClusterIndex(spark, str(tmp_path / "cc"))
    for bid, b in enumerate([corpus, batch]):
        prs = mh.dedup_batch(b, verify_threshold=0.5).select("a", "b")
        cc.update(b.select("doc_id"), prs, batch_id=bid)
        mh.upsert(b, batch_id=bid)
    got = {(r.doc_id, r.cluster_id) for r in cc.read_clusters().collect()}

    exact = ngram_jaccard_pairs(corpus.unionByName(batch), n=4, threshold=0.5)
    want = {(r.doc_id, r.cluster_id) for r in near_dup_clusters(
        corpus.unionByName(batch).select("doc_id"), exact).collect()}
    assert got == want
    assert len(got) > 0
