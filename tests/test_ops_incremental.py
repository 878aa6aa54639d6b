"""Incremental dedup vs a persisted MinHash signature index: batch-vs-index
must equal the full-corpus recompute restricted to batch-touching pairs,
upserts must be idempotent, and parameter mismatches must fail loudly."""

import pytest
from pyspark.sql import functions as F

from singer_tap_spark.ops.dedup_text import minhash_lsh_candidates
from singer_tap_spark.ops.incremental import MinHashIndex


def _docs(spark, sf="0.01"):
    return spark.read.parquet(f"/root/testdata/sf{sf}/documents.parquet").select(
        "doc_id", "text"
    )


def _pairs(df):
    return {(r["a"], r["b"], r["est_jaccard"], r["jaccard"]) for r in df.collect()}


def test_batch_vs_index_equals_full_recompute(spark, tmp_path):
    """The Done criterion (VERDICT r3 #3): dedup_batch(batch) ==
    minhash_lsh_candidates(corpus + batch) filtered to pairs touching the
    batch — same columns, same est/verify values, zero corpus recompute."""
    d = _docs(spark).where(F.col("doc_id") < 150)
    corpus = d.where(F.col("doc_id") < 100)
    # batch: new docs 100..149 plus planted near-dups of corpus docs < 30
    batch = d.where(F.col("doc_id") >= 100).unionByName(
        d.where(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.upsert(corpus, batch_id=0)
    got = _pairs(idx.dedup_batch(batch, verify_threshold=0.5))

    full = minhash_lsh_candidates(
        corpus.unionByName(batch), verify_threshold=0.5
    )
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {
        t
        for t in _pairs(full)
        if t[0] in batch_ids or t[1] in batch_ids
    }
    assert got == want
    assert len(got) > 0
    # cross pairs (corpus side) actually present — the index contributed
    assert any(t[0] not in batch_ids or t[1] not in batch_ids for t in got)


def test_upsert_idempotent_and_growing(spark, tmp_path):
    """Replaying an upsert leaves the index unchanged (LWW tie); a second
    batch joins against corpus + first batch."""
    d = _docs(spark).where(F.col("doc_id") < 120)
    c = d.where(F.col("doc_id") < 80)
    b1 = d.where((F.col("doc_id") >= 80) & (F.col("doc_id") < 100))
    b2 = d.where(F.col("doc_id") >= 100)

    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.upsert(c, batch_id=0)
    n0 = idx.read_signatures().count()
    idx.upsert(c, batch_id=0)  # replay
    assert idx.read_signatures().count() == n0

    idx.upsert(b1, batch_id=1)
    assert idx.read_signatures().count() == n0 + b1.count()

    got = _pairs(idx.dedup_batch(b2, verify_threshold=0.5))
    full = minhash_lsh_candidates(d, verify_threshold=0.5)
    b2_ids = {r["doc_id"] for r in b2.select("doc_id").collect()}
    want = {t for t in _pairs(full) if t[0] in b2_ids or t[1] in b2_ids}
    assert got == want


def test_parameter_mismatch_raises(spark, tmp_path):
    d = _docs(spark).where(F.col("doc_id") < 20)
    idx = MinHashIndex(spark, str(tmp_path / "idx"), num_hashes=64)
    idx.upsert(d, batch_id=0)
    with pytest.raises(ValueError, match="incompatible"):
        MinHashIndex(spark, str(tmp_path / "idx"), num_hashes=32)
    # same params re-open fine
    again = MinHashIndex(spark, str(tmp_path / "idx"), num_hashes=64)
    assert again.exists()


def test_reingested_doc_replaces_signature(spark, tmp_path):
    """A doc_id re-upserted with NEW text at a later batch_id replaces its
    signature (LWW), and subsequent dedup uses the new text."""
    docs_v1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string",
    )
    docs_v2 = spark.createDataFrame(
        [(1, "completely different content now entirely changed words")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(2, "completely different content now entirely changed words")],
        "doc_id long, text string",
    )
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.upsert(docs_v1, batch_id=0)
    assert _pairs(idx.dedup_batch(batch, verify_threshold=0.9)) == set()
    idx.upsert(docs_v2, batch_id=1)
    assert idx.read_signatures().count() == 1
    got = _pairs(idx.dedup_batch(batch, verify_threshold=0.9))
    assert {(a, b) for a, b, *_ in got} == {(1, 2)}


def test_batch_reingestion_ignores_stale_index_signature(spark, tmp_path):
    """A batch that ITSELF re-ingests a doc must not let the doc's STALE
    index signature drive candidate discovery: the old text no longer
    exists, so a pair found through its bands would diverge from the
    full-corpus recompute (est-only mode has no verify to catch it)."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.upsert(
        spark.createDataFrame([(1, shared)], "doc_id long, text string"),
        batch_id=0,
    )
    batch = spark.createDataFrame(
        [(1, "totally new unrelated replacement content words here now"),
         (2, shared)],  # identical to doc 1's OLD text
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]) for r in
           idx.dedup_batch(batch, verify_threshold=None).collect()
           if r["est_jaccard"] > 0.9}
    assert (1, 2) not in got  # stale signature must not produce the pair


def test_simhash_batch_vs_index_equals_full_recompute(spark, tmp_path):
    """SimHash flavor: dedup_batch == simhash_near_dup_pairs on the
    combined corpus, restricted to batch-touching pairs (exact-by-
    construction: the verify is bit_count over the same signatures)."""
    from singer_tap_spark.ops.dedup_text import simhash_near_dup_pairs
    from singer_tap_spark.ops.incremental import SimHashIndex

    d = _docs(spark).where(F.col("doc_id") < 150)
    corpus = d.where(F.col("doc_id") < 100)
    batch = d.where(F.col("doc_id") >= 100).unionByName(
        d.where(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    idx = SimHashIndex(spark, str(tmp_path / "sidx"))
    idx.upsert(corpus, batch_id=0)
    got = {
        (r["a"], r["b"], r["hamming"])
        for r in idx.dedup_batch(batch, max_hamming=2).collect()
    }
    full = simhash_near_dup_pairs(corpus.unionByName(batch), max_hamming=2)
    batch_ids = {r["doc_id"] for r in batch.select("doc_id").collect()}
    want = {
        (r["a"], r["b"], r["hamming"])
        for r in full.collect()
        if r["a"] in batch_ids or r["b"] in batch_ids
    }
    assert got == want
    assert len(got) > 0


def test_simhash_index_reingest_and_params(spark, tmp_path):
    from singer_tap_spark.ops.incremental import SimHashIndex

    d = _docs(spark).where(F.col("doc_id") < 40)
    idx = SimHashIndex(spark, str(tmp_path / "sidx"))
    idx.upsert(d, batch_id=0)
    n0 = idx.read_signatures().count()
    idx.upsert(d, batch_id=0)  # replay no-op
    assert idx.read_signatures().count() == n0
    with pytest.raises(ValueError, match="incompatible"):
        SimHashIndex(spark, str(tmp_path / "sidx"), bits=32)


def _emb(spark, sf="0.01"):
    return spark.read.parquet(f"/root/testdata/sf{sf}/embeddings.parquet")


def test_embedding_index_topk_equals_full_recompute(spark, tmp_path):
    """EmbeddingLSHIndex.topk_batch == lsh_ann_topk on the combined corpus
    at the same pinned settings, restricted to batch queries — identical
    candidate sets AND identical (stored-unit) cosine values."""
    from singer_tap_spark.ops.incremental import EmbeddingLSHIndex
    from singer_tap_spark.ops.similarity import lsh_ann_topk

    emb = _emb(spark).where(F.col("vec_id") < 200)
    dim = len(emb.select("embedding").first()[0])
    corpus = emb.where(F.col("vec_id") < 150)
    batch = emb.where(F.col("vec_id") >= 150)

    idx = EmbeddingLSHIndex(spark, str(tmp_path / "eidx"), dim=dim,
                            n_planes=2, n_tables=32)
    idx.upsert(corpus, batch_id=0)
    got = {tuple(r) for r in idx.topk_batch(batch, k=5).collect()}

    full = lsh_ann_topk(emb, k=5, n_planes=2, n_tables=32)
    want = {tuple(r) for r in full.where(F.col("query_id") >= 150).collect()}
    assert got == want
    assert len(got) > 0
    # neighbors from the INDEX side actually appear
    assert any(n < 150 for _, n, _, _ in got)


def test_embedding_index_near_dup_equals_full_recompute(spark, tmp_path):
    from singer_tap_spark.ops.incremental import EmbeddingLSHIndex
    from singer_tap_spark.ops.similarity import embedding_near_dup_pairs

    emb = _emb(spark).where(F.col("vec_id") < 300)
    dim = len(emb.select("embedding").first()[0])
    corpus = emb.where(F.col("vec_id") < 200)
    batch = emb.where(F.col("vec_id") >= 200)

    idx = EmbeddingLSHIndex(spark, str(tmp_path / "eidx"), dim=dim,
                            n_planes=2, n_tables=16)
    idx.upsert(corpus, batch_id=0)
    got = {tuple(r) for r in
           idx.near_dup_batch(batch, threshold=0.35).collect()}

    full = embedding_near_dup_pairs(emb, threshold=0.35, n_planes=2,
                                    n_tables=16)
    batch_ids = set(range(200, 300))
    want = {tuple(r) for r in full.collect()
            if r["a"] in batch_ids or r["b"] in batch_ids}
    assert got == want
    assert len(got) > 0


def test_embedding_index_vectorized_signatures_equal(spark, tmp_path):
    """An index ingested via the Arrow GEMM signature kernel stores the
    SAME rows as the default explode+fold path (same table-ordered sigs,
    same units) and answers queries identically — execution detail, not
    signature-space param, so the two can interoperate on one index."""
    from singer_tap_spark.ops.incremental import EmbeddingLSHIndex

    emb = _emb(spark).where(F.col("vec_id") < 200)
    dim = len(emb.select("embedding").first()[0])
    corpus = emb.where(F.col("vec_id") < 150)
    batch = emb.where(F.col("vec_id") >= 150)

    a = EmbeddingLSHIndex(spark, str(tmp_path / "a"), dim=dim,
                          n_planes=2, n_tables=16)
    b = EmbeddingLSHIndex(spark, str(tmp_path / "b"), dim=dim,
                          n_planes=2, n_tables=16,
                          vectorized_signatures=True)
    for idx in (a, b):
        idx.upsert(corpus, batch_id=0)

    rows_a = {(r["id"], tuple(r["sigs"]), tuple(round(x, 9) for x in r["unit"]))
              for r in a.read_signatures().collect()}
    rows_b = {(r["id"], tuple(r["sigs"]), tuple(round(x, 9) for x in r["unit"]))
              for r in b.read_signatures().collect()}
    assert rows_a == rows_b
    assert len(rows_a) == 150

    got_a = {tuple(r) for r in a.topk_batch(batch, k=5).collect()}
    got_b = {tuple(r) for r in b.topk_batch(batch, k=5).collect()}
    assert got_a == got_b and len(got_a) > 0


def test_embedding_index_params_and_idempotence(spark, tmp_path):
    from singer_tap_spark.ops.incremental import EmbeddingLSHIndex

    emb = _emb(spark).where(F.col("vec_id") < 50)
    dim = len(emb.select("embedding").first()[0])
    idx = EmbeddingLSHIndex(spark, str(tmp_path / "eidx"), dim=dim)
    idx.upsert(emb, batch_id=0)
    n0 = idx.read_signatures().count()
    idx.upsert(emb, batch_id=0)  # replay no-op
    assert idx.read_signatures().count() == n0
    sigs = idx.read_signatures().first()["sigs"]
    assert len(sigs) == idx.n_tables
    with pytest.raises(ValueError, match="incompatible"):
        EmbeddingLSHIndex(spark, str(tmp_path / "eidx"), dim=dim, n_tables=8)


def test_streaming_dedup_union_equals_one_shot(spark, tmp_path):
    """run_streaming_dedup: the union of per-microbatch pair outputs over a
    document stream equals the one-shot full-corpus LSH dedup of the final
    corpus — arriving docs are deduped against everything seen before,
    zero recomputation."""
    from singer_tap_spark.ops.incremental import MinHashIndex, run_streaming_dedup

    base = str(tmp_path)
    d = _docs(spark).where(F.col("doc_id") < 150)
    # several files -> several microbatches at maxFilesPerTrigger=1
    d.repartition(5).write.parquet(f"{base}/docs")

    idx = MinHashIndex(spark, f"{base}/idx")
    run_streaming_dedup(
        spark, f"{base}/docs", idx, f"{base}/pairs", f"{base}/ckpt",
        verify_threshold=0.5, max_files_per_trigger=1,
    )
    got = _pairs(spark.read.parquet(f"{base}/pairs"))
    want = _pairs(minhash_lsh_candidates(d, verify_threshold=0.5))
    assert got == want
    assert len(got) > 0
    # index converged to the full corpus
    assert idx.read_signatures().count() == d.count()


def test_streaming_dedup_replay_idempotent(spark, tmp_path):
    """Forced replay of the last microbatch (checkpoint commit removed
    after the index already advanced) must re-emit the IDENTICAL pair set
    — the no-marker exactly-once argument in the docstring, exercised."""
    import os

    from singer_tap_spark.ops.incremental import MinHashIndex, run_streaming_dedup

    base = str(tmp_path)
    d = _docs(spark).where(F.col("doc_id") < 100)
    d.repartition(3).write.parquet(f"{base}/docs")
    idx = MinHashIndex(spark, f"{base}/idx")
    run_streaming_dedup(
        spark, f"{base}/docs", idx, f"{base}/pairs", f"{base}/ckpt",
        max_files_per_trigger=1,
    )
    before = _pairs(spark.read.parquet(f"{base}/pairs"))
    last = max(
        int(e.split("=", 1)[1])
        for e in os.listdir(f"{base}/pairs")
        if e.startswith("batch=")
    )
    os.remove(f"{base}/ckpt/commits/{last}")
    crc = f"{base}/ckpt/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_dedup(
        spark, f"{base}/docs", idx, f"{base}/pairs", f"{base}/ckpt",
        max_files_per_trigger=1,
    )
    after = _pairs(spark.read.parquet(f"{base}/pairs"))
    assert after == before


# ---------------------------------------------------------------------------
# ClusterIndex — incremental near-dup cluster maintenance (VERDICT r4 #1)
# ---------------------------------------------------------------------------


def _clusters(df):
    return {(r["doc_id"], r["cluster_id"]) for r in df.collect()}


def _full_cc(spark, ids, pairs):
    from singer_tap_spark.ops.cluster import near_dup_clusters

    return _clusters(near_dup_clusters(ids, pairs))


def test_cluster_index_batch_update_equals_full_recompute(spark, tmp_path):
    """Constructed graph, three phases: seed, a batch that extends one
    cluster and adds a singleton, and a batch whose single pair MERGES two
    existing clusters.  After every update the persisted state must equal
    near_dup_clusters over the cumulative graph."""
    from singer_tap_spark.ops.incremental import ClusterIndex

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc_id long")

    def pairs(*ps):
        return spark.createDataFrame(list(ps) or [], "a long, b long")

    idx = ClusterIndex(spark, str(tmp_path / "cc"))
    # seed: clusters {1,2,3} (chain), {10,11}, singleton 20
    p0 = [(1, 2), (2, 3), (10, 11)]
    idx.update(ids(1, 2, 3, 10, 11, 20), pairs(*p0), batch_id=0)
    all_ids, all_pairs = [1, 2, 3, 10, 11, 20], list(p0)
    assert _clusters(idx.read_clusters()) == _full_cc(
        spark, ids(*all_ids), pairs(*all_pairs))

    # batch 1: 30 pairs into the {10,11} cluster; 40 is a new singleton
    p1 = [(30, 10)]
    idx.update(ids(30, 40), pairs(*p1), batch_id=1)
    all_ids += [30, 40]
    all_pairs += p1
    assert _clusters(idx.read_clusters()) == _full_cc(
        spark, ids(*all_ids), pairs(*all_pairs))

    # batch 2: 50 bridges cluster {1,2,3} and cluster {10,11,30} -> MERGE;
    # every member of both old clusters must relabel to the global min 1
    p2 = [(50, 3), (50, 11)]
    out = idx.update(ids(50), pairs(*p2), batch_id=2)
    all_ids += [50]
    all_pairs += p2
    state = _clusters(idx.read_clusters())
    assert state == _full_cc(spark, ids(*all_ids), pairs(*all_pairs))
    assert {c for i, c in state if i in (1, 2, 3, 10, 11, 30, 50)} == {1}
    # the returned slice covers the batch id + every affected member,
    # and does NOT touch the unrelated singletons
    relabeled = {i for i, _ in out.collect()}
    assert relabeled == {1, 2, 3, 10, 11, 30, 50}


def test_cluster_index_int_typed_batch_ids(spark, tmp_path):
    """Bucket pruning must survive a batch whose id column is a NARROWER
    type than the stored key: xxhash64(int 5) != xxhash64(bigint 5), so
    hashing the caller's raw type would prune the WRONG buckets — the
    affected lookup silently comes back empty and stored members never
    relabel (no error).  probe_bucket_expr casts to the stored type
    first; this pins the merge-two-clusters case with int batch ids."""
    from singer_tap_spark.ops.incremental import ClusterIndex

    idx = ClusterIndex(spark, str(tmp_path / "cc"))
    idx.update(
        spark.createDataFrame([(i,) for i in (1, 2, 10, 11)], "doc_id long"),
        spark.createDataFrame([(1, 2), (10, 11)], "a long, b long"),
        batch_id=0,
    )
    # batch ids/pairs arrive INT-typed (e.g. an int-typed upstream source)
    idx.update(
        spark.createDataFrame([(50,)], "doc_id int"),
        spark.createDataFrame([(50, 2), (50, 11)], "a int, b int"),
        batch_id=1,
    )
    state = _clusters(idx.read_clusters())
    assert {c for i, c in state if i in (1, 2, 10, 11, 50)} == {1}


def test_cluster_index_update_idempotent(spark, tmp_path):
    """Replaying an update against the already-advanced state must no-op
    (LWW tie) — the exactly-once shape the signature indexes share."""
    from singer_tap_spark.ops.incremental import ClusterIndex

    idx = ClusterIndex(spark, str(tmp_path / "cc"))
    ids0 = spark.createDataFrame([(i,) for i in (1, 2, 5, 6)], "doc_id long")
    p0 = spark.createDataFrame([(1, 2), (5, 6)], "a long, b long")
    idx.update(ids0, p0, batch_id=0)
    ids1 = spark.createDataFrame([(9,)], "doc_id long")
    p1 = spark.createDataFrame([(9, 2), (9, 5)], "a long, b long")
    idx.update(ids1, p1, batch_id=1)
    want = _clusters(idx.read_clusters())
    idx.update(ids1, p1, batch_id=1)  # replay
    assert _clusters(idx.read_clusters()) == want
    assert {c for _, c in want} == {1}


def test_cluster_index_minhash_pipeline_equals_full(spark, tmp_path):
    """End-to-end with the real pair producer: sequential MinHashIndex
    ingest feeding ClusterIndex.update must converge to near_dup_clusters
    over minhash_lsh_candidates of the FULL corpus (the cumulative union
    of batch-touching pair sets is the full pair set)."""
    from singer_tap_spark.ops.incremental import ClusterIndex, MinHashIndex

    d = _docs(spark).where(F.col("doc_id") < 150)
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

    full = minhash_lsh_candidates(
        corpus.unionByName(batch), verify_threshold=0.5
    ).select("a", "b")
    want = _full_cc(
        spark, corpus.unionByName(batch).select("doc_id"), full)
    assert _clusters(cc.read_clusters()) == want
    # the planted dups really did merge cross-batch clusters
    merged = {c for i, c in want if i >= 100000}
    assert merged and all(c < 30 for c in merged)


def test_streaming_plans_namespaced_by_query_and_gcd(spark, tmp_path):
    """Cluster plan slices are committed under _plans/<query-id>/ — a
    SECOND stream (fresh checkpoint, new docs dir, SAME index + cluster
    state: e.g. reprocessing continues from a new feed location) starts
    at batch 0 again, and without the namespace it would find the first
    run's update=0/_SUCCESS, merge that stale slice verbatim, and never
    fold its own batch-0 pairs.  Also (r6): a CLEANLY terminated run
    removes its whole namespace — plan dirs never accumulate, and a
    leftover namespace unambiguously means dirty shutdown (refusal case,
    separate test)."""
    import os

    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        MinHashIndex,
        run_streaming_dedup,
    )

    base = str(tmp_path)
    d = _docs(spark).where(F.col("doc_id") < 60)
    idx = MinHashIndex(spark, f"{base}/idx")
    cc = ClusterIndex(spark, f"{base}/cc")

    # run 1: docs 0..39 plus planted dups of 0..9, two files -> two batches
    c1 = d.where(F.col("doc_id") < 40)
    c1.unionByName(
        d.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    ).repartition(2).write.parquet(f"{base}/docs1")
    run_streaming_dedup(
        spark, f"{base}/docs1", idx, f"{base}/pairs1", f"{base}/ckpt1",
        max_files_per_trigger=1, cluster_index=cc,
    )

    # clean termination removes the run's namespace entirely — every
    # batch is checkpoint-committed by then, so no replay can need the
    # final slice, and the next start sees an unambiguous empty root
    assert os.listdir(f"{base}/cc/_plans") == []

    # run 2: NEW feed dir + NEW checkpoint, same index/cc — its batch 0
    # plants dups of docs 40..49 so the fold MUST run (a stale-plan merge
    # would silently drop these pairs)
    c2 = d.where(F.col("doc_id") >= 40)
    c2.unionByName(
        c2.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    ).coalesce(1).write.parquet(f"{base}/docs2")
    run_streaming_dedup(
        spark, f"{base}/docs2", idx, f"{base}/pairs2", f"{base}/ckpt2",
        max_files_per_trigger=1, cluster_index=cc,
    )
    assert os.listdir(f"{base}/cc/_plans") == []

    full = d.unionByName(
        d.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text")
    ).unionByName(
        c2.select((F.col("doc_id") + 200000).alias("doc_id"), "text")
    )
    want = _full_cc(
        spark, full.select("doc_id"),
        minhash_lsh_candidates(full, verify_threshold=0.5).select("a", "b"),
    )
    got = _clusters(cc.read_clusters())
    assert got == want
    # the planted run-2 dup really did fold (identical text -> min-id hub)
    assert (200040, 40) in got


def test_streaming_refuses_legacy_plan_layout(spark, tmp_path):
    """Pre-namespace plan slices directly under _plans/ are ambiguous (a
    mid-kill resume MUST honor them; a fresh checkpoint MUST ignore them
    — and the code cannot tell which run wrote them), so starting a
    stream over them refuses loudly with the migration instruction
    instead of guessing either way."""
    import os

    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        MinHashIndex,
        run_streaming_dedup,
    )

    base = str(tmp_path)
    _docs(spark).where(F.col("doc_id") < 10).coalesce(1).write.parquet(
        f"{base}/docs"
    )
    cc = ClusterIndex(spark, f"{base}/cc")
    os.makedirs(f"{base}/cc/_plans/update=0", exist_ok=True)
    open(f"{base}/cc/_plans/update=0/_SUCCESS", "w").close()
    with pytest.raises(Exception, match="pre-namespace plan slices"):
        run_streaming_dedup(
            spark, f"{base}/docs", MinHashIndex(spark, f"{base}/idx"),
            f"{base}/pairs", f"{base}/ckpt", max_files_per_trigger=1,
            cluster_index=cc,
        )


def test_streaming_delete_relabel_honors_threshold(spark, tmp_path):
    """The post-delete relabel must pair at the STREAM's verify_threshold,
    not pairs_among's 0.5 default: three docs where A~B (0.818) and A~C
    (0.814) clear 0.8 but B~C (0.689) sits in [0.5, 0.8) — deleting A
    must SPLIT the cluster into singletons (B-C is not a 0.8-pair),
    where a 0.5-threshold relabel would keep them merged."""
    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        MinHashIndex,
        run_streaming_dedup,
    )

    base = str(tmp_path)
    core = " ".join(f"tok{i:03d} common body word" for i in range(40))
    rows = [
        (1, core, "UPSERT"),  # A
        (2, core + " " + " ".join(f"beta{i} extra" for i in range(6)), "UPSERT"),
        (3, core + " " + " ".join(f"gamma{i} other" for i in range(6)), "UPSERT"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, op string"
    ).coalesce(1).write.parquet(f"{base}/docs")

    idx = MinHashIndex(spark, f"{base}/idx")
    cc = ClusterIndex(spark, f"{base}/cc")

    def run():
        run_streaming_dedup(
            spark, f"{base}/docs", idx, f"{base}/pairs", f"{base}/ckpt",
            verify_threshold=0.8, max_files_per_trigger=1,
            cluster_index=cc, op_col="op",
        )

    run()
    corpus = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], "doc_id long, text string"
    )
    # scenario preconditions, measured not assumed: A pairs with both at
    # 0.8; B~C really is a sub-0.8 pair that 0.5 WOULD link
    p80 = {(r["a"], r["b"]) for r in
           minhash_lsh_candidates(corpus, verify_threshold=0.8).collect()}
    p50 = {(r["a"], r["b"]) for r in
           minhash_lsh_candidates(corpus, verify_threshold=0.5).collect()}
    assert p80 == {(1, 2), (1, 3)}
    assert (2, 3) in p50
    assert _clusters(cc.read_clusters()) == {(1, 1), (2, 1), (3, 1)}

    spark.createDataFrame(
        [(1, None, "DELETE")], "doc_id long, text string, op string"
    ).coalesce(1).write.mode("append").parquet(f"{base}/docs")
    run()
    assert _clusters(cc.read_clusters()) == {(2, 2), (3, 3)}


def test_streaming_dedup_with_deletes(spark, tmp_path):
    """op_col: a CDC document feed with DELETE rows.  The stream's end
    state (signatures AND clusters) must equal the one-shot pipeline over
    the NET corpus after each phase; an in-batch delete+re-add survives;
    a forced replay of the delete batch leaves everything identical."""
    import os

    from singer_tap_spark.ops.cluster import near_dup_clusters
    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        MinHashIndex,
        run_streaming_dedup,
    )

    base = str(tmp_path)
    d = _docs(spark).where(F.col("doc_id") < 80)
    corpus = d.unionByName(
        d.where(F.col("doc_id") < 20).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    idx = MinHashIndex(spark, f"{base}/idx")
    cc = ClusterIndex(spark, f"{base}/cc")

    def run():
        run_streaming_dedup(
            spark, f"{base}/docs", idx, f"{base}/pairs", f"{base}/ckpt",
            verify_threshold=0.5, max_files_per_trigger=1,
            cluster_index=cc, op_col="op",
        )

    def check(net):
        assert {r["id"] for r in idx.read_signatures().select("id").collect()} \
            == {r["doc_id"] for r in net.select("doc_id").collect()}
        got = _clusters(cc.read_clusters())
        want = _full_cc(
            spark, net.select("doc_id"),
            minhash_lsh_candidates(net, verify_threshold=0.5).select("a", "b"),
        )
        assert got == want

    # phase 1: plain upsert feed
    corpus.withColumn("op", F.lit("UPSERT")).repartition(2).write.parquet(
        f"{base}/docs"
    )
    run()
    check(corpus)

    # phase 2: one appended batch deleting originals 5, 12 (their planted
    # copies survive and relabel) and 40 — DELETE rows carry null text
    dele_rows = spark.createDataFrame(
        [(5, None, "DELETE"), (12, None, "DELETE"), (40, None, "DELETE")],
        "doc_id long, text string, op string",
    )
    dele_rows.coalesce(1).write.mode("append").parquet(f"{base}/docs")
    run()
    net2 = corpus.where(~F.col("doc_id").isin(5, 12, 40))
    check(net2)

    # phase 3: one batch that deletes 7 AND re-adds it (delete-first
    # in-batch semantics: the re-add wins), plus re-adds the deleted 5
    re5 = d.where(F.col("doc_id") == 5).select(
        "doc_id", "text", F.lit("UPSERT").alias("op")
    )
    re7 = d.where(F.col("doc_id") == 7).select(
        "doc_id", "text", F.lit("UPSERT").alias("op")
    )
    del7 = spark.createDataFrame(
        [(7, None, "DELETE")], "doc_id long, text string, op string"
    )
    del7.unionByName(re7).unionByName(re5).coalesce(1).write.mode(
        "append"
    ).parquet(f"{base}/docs")
    run()
    net3 = corpus.where(~F.col("doc_id").isin(12, 40))
    check(net3)

    # forced replay of the last batch: state must not move (the committed
    # delete_plan/cluster_plan partitions replay verbatim; the replayed
    # delete loses to the stored re-add instead of tying)
    last = max(
        int(e.split("=", 1)[1])
        for e in os.listdir(f"{base}/pairs")
        if e.startswith("batch=")
    )
    os.remove(f"{base}/ckpt/commits/{last}")
    crc = f"{base}/ckpt/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    check(net3)


# ---------------------------------------------------------------------------
# Deletes — pairs_among + ClusterIndex.delete (r5: closes the grow-only
# caveat; a removed doc can split its component or take the min id with it)
# ---------------------------------------------------------------------------


def test_cluster_index_delete_synthetic(spark, tmp_path):
    """Constructed graph, three delete phases against the full recompute:
    deleting a BRIDGE splits its component, deleting the HUB (min id)
    relabels to the new min, deleting a whole cluster empties it;
    unrelated clusters keep their rows; a replayed delete no-ops."""
    from singer_tap_spark.ops.incremental import ClusterIndex

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc_id long")

    def pairs(ps):
        return spark.createDataFrame(list(ps) or [], "a long, b long")

    # chain 1-2-3-4 (hub 1, bridge 2), cluster {10,11}, singleton 20
    cur_pairs = [(1, 2), (2, 3), (3, 4), (10, 11)]
    cur_ids = [1, 2, 3, 4, 10, 11, 20]
    idx = ClusterIndex(spark, str(tmp_path / "cc"))
    idx.update(ids(*cur_ids), pairs(cur_pairs), batch_id=0)

    def pf(remaining):
        rem = {r["id"] for r in remaining.collect()}
        return pairs([(a, b) for a, b in cur_pairs if a in rem and b in rem])

    def check():
        assert _clusters(idx.read_clusters()) == _full_cc(
            spark, ids(*cur_ids), pairs(cur_pairs)
        )

    # phase 1: delete bridge 2 -> {1}, {3,4} split (1 was the hub of the
    # old component, so survivors 3,4 must relabel to the new min 3)
    out = idx.delete(ids(2), pf, batch_id=1)
    assert {r["doc_id"] for r in out.collect()} == {1, 3, 4}
    cur_ids = [1, 3, 4, 10, 11, 20]
    cur_pairs = [(3, 4), (10, 11)]
    check()

    # phase 2: delete hub 10 -> 11 survives as its own singleton
    idx.delete(ids(10), pf, batch_id=2)
    cur_ids = [1, 3, 4, 11, 20]
    cur_pairs = [(3, 4)]
    check()

    # phase 3: delete the whole {3,4} cluster + the never-clustered id 999
    idx.delete(ids(3, 4, 999), pf, batch_id=3)
    cur_ids = [1, 11, 20]
    cur_pairs = []
    check()

    # replay of phase 3 at the same batch_id: LWW ties, state unchanged
    idx.delete(ids(3, 4, 999), pf, batch_id=3)
    check()

    # growth after deletes still works (update at an advanced batch_id)
    idx.update(ids(30), pairs([(30, 11)]), batch_id=4)
    cur_ids = [1, 11, 20, 30]
    cur_pairs = [(30, 11)]
    check()


def test_pairs_among_equals_full_restriction(spark, tmp_path):
    """pairs_among (stored signatures only, no text) must equal the
    full-corpus pair op run on the restricted corpus — MinHash and SimHash
    flavors.  This is the delete path's correctness precondition."""
    from singer_tap_spark.ops.dedup_text import simhash_near_dup_pairs
    from singer_tap_spark.ops.incremental import SimHashIndex

    d = _docs(spark).where(F.col("doc_id") < 100)
    corpus = d.unionByName(
        d.where(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    keep = corpus.where(
        (F.col("doc_id") % 2 == 0) | (F.col("doc_id") >= 100000)
    )
    sel = keep.select("doc_id")

    mh = MinHashIndex(spark, str(tmp_path / "mh"))
    mh.upsert(corpus, batch_id=0)
    got = _pairs(mh.pairs_among(sel, verify_threshold=0.5))
    want = _pairs(minhash_lsh_candidates(keep, verify_threshold=0.5))
    assert got == want
    assert len(got) > 0

    sh = SimHashIndex(spark, str(tmp_path / "sh"))
    sh.upsert(corpus, batch_id=0)
    got_s = {
        (r["a"], r["b"], r["hamming"])
        for r in sh.pairs_among(sel, max_hamming=2).collect()
    }
    want_s = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_near_dup_pairs(keep, max_hamming=2).collect()
    }
    assert got_s == want_s
    assert len(got_s) > 0


def test_embedding_pairs_among_equals_full_restriction(spark, tmp_path):
    """Embedding flavor of the restriction equality, at the index's pinned
    settings (the full op's adaptive n_planes is pinned to match)."""
    from singer_tap_spark.ops.incremental import EmbeddingLSHIndex
    from singer_tap_spark.ops.similarity import embedding_near_dup_pairs

    emb = _emb(spark).where(F.col("vec_id") < 300)
    dim = len(emb.select("embedding").first()[0])
    idx = EmbeddingLSHIndex(
        spark, str(tmp_path / "eidx"), dim=dim, n_planes=2, n_tables=16
    )
    idx.upsert(emb, batch_id=0)
    keep = emb.where(F.col("vec_id") % 3 != 0)
    got = {
        tuple(r)
        for r in idx.pairs_among(
            keep.select("vec_id"), id_col="vec_id", threshold=0.35
        ).collect()
    }
    want = {
        tuple(r)
        for r in embedding_near_dup_pairs(
            keep, threshold=0.35, n_planes=2, n_tables=16
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_signature_index_delete_semantics(spark, tmp_path):
    """Index-level delete: the row disappears, later batches see no ghost
    pairs from the deleted doc, and a STALE-batch_id delete no-ops (the
    LWW tie contract)."""
    d = _docs(spark).where(F.col("doc_id") < 50)
    mh = MinHashIndex(spark, str(tmp_path / "mh"))
    mh.upsert(d, batch_id=2)

    mh.delete(spark.createDataFrame([(5,)], "doc_id long"), batch_id=3)
    left = {r["id"] for r in mh.read_signatures().select("id").collect()}
    assert 5 not in left and 6 in left

    # a batch duplicating doc 5's text: no pair against the deleted id
    ghost_probe = d.where(F.col("doc_id") == 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    prs = _pairs(mh.dedup_batch(ghost_probe, verify_threshold=0.5))
    assert not any(a == 5 or b == 5 for a, b, *_ in prs)

    # stale delete (batch_id strictly BELOW the row's last write): the
    # stored row's seq guard wins deterministically.  (An EQUAL batch_id is
    # a max_by tie — undefined, which is why the contract says the delete's
    # batch_id must advance.)
    mh.delete(spark.createDataFrame([(7,)], "doc_id long"), batch_id=1)
    assert 7 in {r["id"] for r in mh.read_signatures().select("id").collect()}


def test_cluster_index_delete_minhash_equals_full(spark, tmp_path):
    """End-to-end delete with the real pair producer: MinHash-driven
    clustering, delete docs through BOTH indexes (ClusterIndex.delete with
    mh.pairs_among, then mh.delete), and the state must equal the
    from-scratch pipeline over the remaining corpus — including deleting
    one side of a planted near-dup pair (the copy survives alone)."""
    from singer_tap_spark.ops.incremental import ClusterIndex

    d = _docs(spark).where(F.col("doc_id") < 100)
    corpus = d.unionByName(
        d.where(F.col("doc_id") < 30).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    mh = MinHashIndex(spark, str(tmp_path / "mh"))
    cc = ClusterIndex(spark, str(tmp_path / "cc"))
    prs = mh.dedup_batch(corpus, verify_threshold=0.5).select("a", "b")
    cc.update(corpus.select("doc_id"), prs, batch_id=0)
    mh.upsert(corpus, batch_id=0)

    # delete originals 5 and 17 (their +100000 copies survive) and 40
    dele = spark.createDataFrame([(5,), (17,), (40,)], "doc_id long")
    cc.delete(
        dele, lambda r: mh.pairs_among(r, id_col="id"), batch_id=1
    )
    mh.delete(dele, batch_id=1)

    remaining = corpus.where(~F.col("doc_id").isin(5, 17, 40))
    full = minhash_lsh_candidates(remaining, verify_threshold=0.5)
    want = _full_cc(
        spark, remaining.select("doc_id"), full.select("a", "b")
    )
    state = _clusters(cc.read_clusters())
    assert state == want
    # the deleted originals are gone; their planted copies survive (their
    # cluster lost its old min-id member and was relabeled)
    by_id = dict(state)
    for orig in (5, 17):
        assert orig not in by_id and 40 not in by_id
        assert 100000 + orig in by_id


# ---------------------------------------------------------------------------
# IVFIndex — persisted quantizer + inverted lists (VERDICT r4 #6)
# ---------------------------------------------------------------------------


def _emb(spark, lo=None, hi=None):
    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    if lo is not None:
        e = e.where(F.col("vec_id") >= lo)
    if hi is not None:
        e = e.where(F.col("vec_id") < hi)
    return e


def test_ivf_index_topk_equals_full_recompute(spark, tmp_path):
    """At probe-all the persisted-quantizer path is EXACT, so it must
    equal both the full-corpus ivf_ann_topk (which re-trains k-means on
    the combined corpus — different centroids, same exact answer) and
    brute force, restricted to batch queries."""
    from singer_tap_spark.ops.incremental import IVFIndex
    from singer_tap_spark.ops.similarity import brute_force_topk, ivf_ann_topk

    corpus, batch = _emb(spark, hi=150), _emb(spark, 150, 200)
    idx = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=8)
    idx.build(corpus, batch_id=0)
    got = {tuple(r) for r in idx.topk_batch(batch, k=5, n_probe=8).collect()}

    combined = _emb(spark, hi=200)
    full = ivf_ann_topk(combined, k=5, n_centroids=8, n_probe=8)
    want = {tuple(r) for r in full.where(F.col("query_id") >= 150).collect()}
    assert got == want
    brute = brute_force_topk(combined, batch, k=5)
    assert got == {tuple(r) for r in brute.collect()}
    assert len(got) > 0


def test_ivf_index_persists_quantizer_and_guards(spark, tmp_path):
    """Reopening loads the stored centroids (no re-training job); an
    incompatible n_centroids reopen raises; upsert before build raises."""
    import numpy as np

    from singer_tap_spark.ops.incremental import IVFIndex

    corpus = _emb(spark, hi=100)
    p = str(tmp_path / "ivf")
    idx = IVFIndex(spark, p, n_centroids=8)
    with pytest.raises(ValueError, match="before build"):
        idx.upsert(corpus)
    idx.build(corpus, batch_id=0)
    cents = idx.centroids.copy()

    re = IVFIndex(spark, p)  # adaptive arg, stored quantizer wins
    assert re.centroids is not None and np.array_equal(re.centroids, cents)
    # build() on a populated index must NOT re-train
    re.build(_emb(spark, 100, 120), batch_id=1)
    assert np.array_equal(re.centroids, cents)
    assert re.read_assignments().count() == 120

    with pytest.raises(ValueError, match="incompatible"):
        IVFIndex(spark, p, n_centroids=16)


def test_ivf_index_upsert_idempotent_and_reingest(spark, tmp_path):
    """Replayed upserts tie (LWW); a re-ingested vec_id's new vector wins
    on the batch side of topk_batch (anti-join drops its stale row)."""
    from singer_tap_spark.ops.incremental import IVFIndex

    corpus = _emb(spark, hi=100)
    idx = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=8)
    idx.build(corpus, batch_id=0)
    before = {(r["id"], r["c"]) for r in idx.read_assignments().collect()}
    idx.upsert(corpus, batch_id=0)  # replay
    assert {(r["id"], r["c"]) for r in idx.read_assignments().collect()} == before

    # batch containing an id already in the index: exactly one lists row
    # per id feeds the probe join (no duplicate neighbors)
    batch = _emb(spark, 90, 110)
    out = idx.topk_batch(batch, k=5, n_probe=8)
    dup = (out.groupBy("query_id", "neighbor_id").count()
           .where(F.col("count") > 1).count())
    assert dup == 0


def test_streaming_dedup_with_cluster_maintenance(spark, tmp_path):
    """run_streaming_dedup(cluster_index=...): the stream's end state must
    equal near_dup_clusters over the one-shot full-corpus pair set, and a
    forced replay of the last microbatch must leave the clustering
    byte-identical (the no-marker exactly-once argument extended to the
    cluster fold)."""
    import os

    from singer_tap_spark.ops.cluster import near_dup_clusters
    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        MinHashIndex,
        run_streaming_dedup,
    )

    base = str(tmp_path)
    d = _docs(spark).where(F.col("doc_id") < 100)
    d.repartition(3).write.parquet(f"{base}/docs")
    idx = MinHashIndex(spark, f"{base}/idx")
    cc = ClusterIndex(spark, f"{base}/cc")
    run_streaming_dedup(
        spark, f"{base}/docs", idx, f"{base}/pairs", f"{base}/ckpt",
        max_files_per_trigger=1, cluster_index=cc,
    )
    got = {(r["doc_id"], r["cluster_id"]) for r in cc.read_clusters().collect()}
    want = {(r["doc_id"], r["cluster_id"]) for r in near_dup_clusters(
        d.select("doc_id"),
        minhash_lsh_candidates(d, verify_threshold=0.5).select("a", "b"),
    ).collect()}
    assert got == want
    assert len(got) == d.count()

    # forced replay of the last batch: remove its checkpoint commit
    last = max(
        int(e.split("=", 1)[1])
        for e in os.listdir(f"{base}/pairs")
        if e.startswith("batch=")
    )
    os.remove(f"{base}/ckpt/commits/{last}")
    crc = f"{base}/ckpt/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run_streaming_dedup(
        spark, f"{base}/docs", idx, f"{base}/pairs", f"{base}/ckpt",
        max_files_per_trigger=1, cluster_index=cc,
    )
    after = {(r["doc_id"], r["cluster_id"]) for r in cc.read_clusters().collect()}
    assert after == got


def _mirror_equals_primary(idx):
    prim = {(r.doc_id, r.cluster_id) for r in idx.read_clusters().collect()}
    mirr = {
        (r.doc_id, r.cluster_id)
        for r in idx.mirror.read().select("doc_id", "cluster_id").collect()
    }
    assert mirr == prim, (sorted(mirr - prim), sorted(prim - mirr))


def test_cluster_mirror_tracks_primary(spark, tmp_path):
    """The cluster-keyed mirror (r6: bucket-pruned member pulls) must hold
    exactly the primary's rows after every update/delete — including a
    cluster MERGE (rows move buckets: the old bucket must shed them) and a
    hub delete — and a pre-r6 index (no mirror on disk) must backfill on
    first use and continue correctly."""
    import shutil

    from singer_tap_spark.ops.incremental import ClusterIndex

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc_id long")

    def pairs(ps):
        return spark.createDataFrame(list(ps) or [], "a long, b long")

    idx = ClusterIndex(spark, str(tmp_path / "cc"), n_buckets=8)
    idx.update(
        ids(1, 2, 3, 10, 11, 20), pairs([(1, 2), (2, 3), (10, 11)]),
        batch_id=0,
    )
    _mirror_equals_primary(idx)

    # merge two clusters: members of {10,11} relabel 10 -> 1, i.e. their
    # mirror rows MOVE from bucket(10) to bucket(1) — stale-duplicate trap
    idx.update(ids(50), pairs([(50, 3), (50, 11)]), batch_id=1)
    _mirror_equals_primary(idx)

    # delete the hub: survivors relabel to the new min, tombstone must
    # sweep the deleted doc's mirror row out of its old bucket
    cur_pairs = [(1, 2), (2, 3), (10, 11), (50, 3), (50, 11)]

    def pf(remaining):
        rem = {r["id"] for r in remaining.collect()}
        return pairs([(a, b) for a, b in cur_pairs if a in rem and b in rem])

    idx.delete(ids(1), pf, batch_id=2)
    _mirror_equals_primary(idx)

    # pre-r6 index: drop the mirror from disk, reopen, keep updating —
    # the backfill (one-time full scan) must restore exact equality
    shutil.rmtree(f"{idx.path}/by_cluster")
    idx2 = ClusterIndex(spark, str(tmp_path / "cc"), n_buckets=8)
    idx2.update(ids(60), pairs([(60, 20)]), batch_id=3)
    _mirror_equals_primary(idx2)
    state = _clusters(idx2.read_clusters())
    assert state == _full_cc(
        spark,
        ids(2, 3, 10, 11, 20, 50, 60),
        pairs([(2, 3), (10, 11), (50, 3), (50, 11), (60, 20)]),
    )


def test_cluster_legacy_plan_replay_rebuilds_mirror(spark, tmp_path):
    """A committed plan slice written BEFORE the mirror existed (no
    `_old_cid` column) must still replay: the mirror merge falls back to a
    full-bucket rewrite (correct, one-off), and both tables end equal."""
    from singer_tap_spark.ops.incremental import ClusterIndex

    def ids(*xs):
        return spark.createDataFrame([(x,) for x in xs], "doc_id long")

    def pairs(ps):
        return spark.createDataFrame(list(ps) or [], "a long, b long")

    idx = ClusterIndex(spark, str(tmp_path / "cc"), n_buckets=8)
    idx.update(ids(1, 2, 10, 11), pairs([(1, 2), (10, 11)]), batch_id=0)

    # legacy-layout committed plan: (doc_id, cluster_id) only
    plan = str(tmp_path / "plan")
    spark.createDataFrame(
        [(10, 1), (11, 1), (1, 1), (2, 1), (50, 1)],
        "doc_id long, cluster_id long",
    ).write.parquet(plan)
    idx.update(ids(50), pairs([(50, 2), (50, 11)]), batch_id=1, plan_path=plan)
    _mirror_equals_primary(idx)
    assert _clusters(idx.read_clusters()) == _full_cc(
        spark,
        ids(1, 2, 10, 11, 50),
        pairs([(1, 2), (10, 11), (50, 2), (50, 11)]),
    )


def test_streaming_refuses_dirty_foreign_namespace(spark, tmp_path):
    """ADVICE r5: a foreign plan namespace holding a COMMITTED slice means
    the run that wrote it died inside the commit->merge window (a clean
    run removes its namespace) — the cluster state may be half-merged and
    the slice is the only recovery artifact.  A fresh-checkpoint start
    must refuse loudly instead of rmtree-ing it; a foreign namespace with
    NO committed slice is swept silently."""
    import os

    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        MinHashIndex,
        run_streaming_dedup,
    )

    base = str(tmp_path)
    _docs(spark).where(F.col("doc_id") < 10).coalesce(1).write.parquet(
        f"{base}/docs"
    )
    cc = ClusterIndex(spark, f"{base}/cc")
    # simulate a dirty shutdown of some other checkpoint's run
    os.makedirs(f"{base}/cc/_plans/dead-qid/update=3", exist_ok=True)
    open(f"{base}/cc/_plans/dead-qid/update=3/_SUCCESS", "w").close()
    with pytest.raises(Exception, match="did not terminate cleanly"):
        run_streaming_dedup(
            spark, f"{base}/docs", MinHashIndex(spark, f"{base}/idx"),
            f"{base}/pairs", f"{base}/ckpt", max_files_per_trigger=1,
            cluster_index=cc,
        )

    # an UNcommitted foreign namespace (died before its first plan commit)
    # carries nothing recoverable: swept, and the run proceeds
    import shutil

    shutil.rmtree(f"{base}/cc/_plans/dead-qid")
    os.makedirs(f"{base}/cc/_plans/dead-qid-2/update=0", exist_ok=True)
    shutil.rmtree(f"{base}/ckpt", ignore_errors=True)
    run_streaming_dedup(
        spark, f"{base}/docs", MinHashIndex(spark, f"{base}/idx2"),
        f"{base}/pairs2", f"{base}/ckpt2", max_files_per_trigger=1,
        cluster_index=cc,
    )
    assert not os.path.exists(f"{base}/cc/_plans/dead-qid-2")
    assert cc.read_clusters().count() == 10


# ---------------------------------------------------------------------------
# run_streaming_ann — the embedding family's streaming composition (r6,
# VERDICT r5 missing #3): EmbeddingLSHIndex (+ IVFIndex + ClusterIndex)
# driven per microbatch with the same crash/plan contracts as the MinHash
# driver.
# ---------------------------------------------------------------------------


def test_streaming_ann_union_equals_one_shot(spark, tmp_path):
    """run_streaming_ann: the union of per-microbatch pair outputs over a
    vector stream equals the one-shot embedding_near_dup_pairs of the
    final corpus at the index's pinned settings — each arriving vector is
    paired against everything seen before, zero re-signing; and a forced
    replay of the last microbatch re-emits the identical union."""
    import os

    from singer_tap_spark.ops.incremental import (
        EmbeddingLSHIndex,
        run_streaming_ann,
    )
    from singer_tap_spark.ops.similarity import embedding_near_dup_pairs

    base = str(tmp_path)
    emb = _emb(spark).where(F.col("vec_id") < 300)
    dim = len(emb.select("embedding").first()[0])
    emb.repartition(4).write.parquet(f"{base}/vecs")

    idx = EmbeddingLSHIndex(spark, f"{base}/eidx", dim=dim,
                            n_planes=2, n_tables=16)

    def run():
        run_streaming_ann(
            spark, f"{base}/vecs", idx, f"{base}/pairs", f"{base}/ckpt",
            threshold=0.35, max_files_per_trigger=1,
        )

    run()
    got = {tuple(r) for r in spark.read.parquet(f"{base}/pairs")
           .select("a", "b", "cos_sim").collect()}
    want = {tuple(r) for r in embedding_near_dup_pairs(
        emb, threshold=0.35, n_planes=2, n_tables=16).collect()}
    assert got == want
    assert len(got) > 0
    assert idx.read_signatures().count() == 300

    last = max(
        int(e.split("=", 1)[1])
        for e in os.listdir(f"{base}/pairs")
        if e.startswith("batch=")
    )
    os.remove(f"{base}/ckpt/commits/{last}")
    crc = f"{base}/ckpt/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    after = {tuple(r) for r in spark.read.parquet(f"{base}/pairs")
             .select("a", "b", "cos_sim").collect()}
    assert after == got


def test_streaming_ann_cluster_ivf_and_deletes(spark, tmp_path):
    """The full embedding streaming composition: an op-column CDC vector
    feed drives EmbeddingLSHIndex + IVFIndex + ClusterIndex per
    microbatch.  After the upsert phase and again after a delete batch,
    every persisted artifact must equal its one-shot recompute over the
    NET corpus (LSH ids, cluster rows vs near_dup_clusters, IVF
    assignments, probe-all == brute force); a forced replay of the delete
    batch leaves everything identical."""
    import os

    from singer_tap_spark.ops.cluster import near_dup_clusters
    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        EmbeddingLSHIndex,
        IVFIndex,
        run_streaming_ann,
    )
    from singer_tap_spark.ops.similarity import (
        brute_force_topk,
        embedding_near_dup_pairs,
    )

    base = str(tmp_path)
    d = _emb(spark).where(F.col("vec_id") < 150).select("vec_id", "embedding")
    # planted exact copies (cos 1.0) of vectors < 20 — cross-batch welds
    corpus = d.unionByName(
        d.where(F.col("vec_id") < 20).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
        )
    )
    dim = len(d.select("embedding").first()[0])
    idx = EmbeddingLSHIndex(spark, f"{base}/eidx", dim=dim,
                            n_planes=2, n_tables=16)
    cc = ClusterIndex(spark, f"{base}/cc")
    ivf = IVFIndex(spark, f"{base}/ivf", n_centroids=8)

    def run():
        run_streaming_ann(
            spark, f"{base}/vecs", idx, f"{base}/pairs", f"{base}/ckpt",
            threshold=0.9, max_files_per_trigger=1,
            cluster_index=cc, ivf_index=ivf, op_col="op",
        )

    def check(net):
        net_ids = {r["vec_id"] for r in net.select("vec_id").collect()}
        assert {r["id"] for r in idx.read_signatures().select("id").collect()} \
            == net_ids
        assert {r["id"] for r in ivf.read_assignments().select("id").collect()} \
            == net_ids
        got_cc = _clusters(cc.read_clusters())
        want_cc = _full_cc(
            spark,
            net.select(F.col("vec_id").alias("doc_id")),
            embedding_near_dup_pairs(
                net, threshold=0.9, n_planes=2, n_tables=16,
                vec_col="embedding", id_col="vec_id",
            ).select("a", "b"),
        )
        assert got_cc == want_cc
        # IVF probe-all == exact brute force over the net corpus
        queries = _emb(spark).where(
            (F.col("vec_id") >= 300) & (F.col("vec_id") < 320)
        ).select("vec_id", "embedding")
        got_k = {tuple(r) for r in
                 ivf.topk_batch(queries, k=3, n_probe=8).collect()}
        brute = brute_force_topk(net.unionByName(queries), queries, k=3)
        assert got_k == {tuple(r) for r in brute.collect()}

    # phase 1: plain upsert feed
    corpus.withColumn("op", F.lit("UPSERT")).repartition(2).write.parquet(
        f"{base}/vecs"
    )
    run()
    check(corpus)

    # phase 2: delete originals 5, 12 (planted copies survive and relabel
    # — the copy's cluster hub was the deleted original) and plain 140
    # null embedding cast to the TABLE's exact element type: a double-typed
    # null file next to float-typed upsert files makes the stream-start
    # schema inference order-dependent (PARQUET_COLUMN_DATA_TYPE_MISMATCH)
    etype = corpus.schema["embedding"].dataType.simpleString()
    dele_rows = (
        _emb(spark).where(F.col("vec_id").isin(5, 12, 140))
        .select("vec_id", F.lit(None).cast(etype).alias("embedding"))
        .withColumn("op", F.lit("DELETE"))
    )
    dele_rows.coalesce(1).write.mode("append").parquet(f"{base}/vecs")
    run()
    net2 = corpus.where(~F.col("vec_id").isin(5, 12, 140))
    check(net2)

    # forced replay of the delete batch: nothing moves
    last = max(
        int(e.split("=", 1)[1])
        for e in os.listdir(f"{base}/pairs")
        if e.startswith("batch=")
    )
    os.remove(f"{base}/ckpt/commits/{last}")
    crc = f"{base}/ckpt/commits/.{last}.crc"
    if os.path.exists(crc):
        os.remove(crc)
    run()
    check(net2)


def test_ivf_mirror_tracks_primary(spark, tmp_path):
    """The cid-bucketed assignments mirror (r6: probe reads prune to the
    probed lists' buckets) must hold exactly the primary's rows after
    build, upsert, a RE-INGESTED vector whose cid changes (its mirror row
    moves buckets — the old bucket must shed it), and a delete; a pre-r6
    index (no mirror on disk) must backfill on first use; topk answers
    stay equal to the pre-mirror semantics (probe-all == brute force)."""
    import shutil

    from singer_tap_spark.ops.incremental import IVFIndex
    from singer_tap_spark.ops.similarity import brute_force_topk

    def mirror_eq(idx):
        prim = {(r.doc_id, r.cid, tuple(r.unit)) for r in
                idx.table.read().select("doc_id", "cid", "unit").collect()}
        mirr = {(r.doc_id, r.cid, tuple(r.unit)) for r in
                idx.mirror.read().select("doc_id", "cid", "unit").collect()}
        assert mirr == prim, (len(mirr), len(prim))

    corpus, batch = _emb(spark, hi=120), _emb(spark, 120, 160)
    idx = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=8)
    idx.build(corpus, batch_id=0)
    mirror_eq(idx)
    idx.upsert(batch, batch_id=1)
    mirror_eq(idx)

    # re-ingest vec 5 with vec 130's embedding: near-certainly a different
    # centroid; even if not, the LWW replacement must leave ONE mirror row
    donor = _emb(spark, 130, 131).withColumn(
        "vec_id", F.lit(5).cast("long")
    )
    idx.upsert(donor, batch_id=2)
    mirror_eq(idx)
    assert idx.mirror.read().where(F.col("doc_id") == 5).count() == 1

    # delete sweeps the mirror row out of its cid bucket
    idx.delete(spark.createDataFrame([(7,), (121,)], "doc_id long"),
               batch_id=3)
    mirror_eq(idx)

    # pre-r6 index: drop the mirror, reopen, query + upsert — backfill
    shutil.rmtree(f"{idx.path}/by_list")
    idx2 = IVFIndex(spark, str(tmp_path / "ivf"))
    queries = _emb(spark, 160, 170)
    got = {tuple(r) for r in
           idx2.topk_batch(queries, k=3, n_probe=8).collect()}
    mirror_eq(idx2)
    remaining = (
        corpus.unionByName(batch)
        .where(~F.col("vec_id").isin(5, 7, 121))
        .unionByName(donor)
    )
    brute = brute_force_topk(remaining.unionByName(queries), queries, k=3)
    assert got == {tuple(r) for r in brute.collect()}


def test_ivf_topk_prunes_probed_buckets(spark, tmp_path):
    """topk_batch's index-side read must carry a PartitionFilter on the
    mirror's `_bucket` (only the probed lists' buckets are scanned) —
    at partial probe the scan node must NOT read the whole index."""
    import re as _re

    from singer_tap_spark.ops.incremental import IVFIndex

    corpus, batch = _emb(spark, hi=150), _emb(spark, 150, 160)
    idx = IVFIndex(spark, str(tmp_path / "ivf"), n_centroids=8)
    idx.build(corpus, batch_id=0)
    out = idx.topk_batch(batch, k=3, n_probe=2)
    phys = out._jdf.queryExecution().executedPlan().toString()
    # the only partitioned scan in this plan is the mirror (batch-side
    # frames are unpartitioned) — it must carry a bucket IN-list filter
    filters = _re.findall(r"PartitionFilters: \[([^\]]*)\]", phys)
    assert any("_bucket" in f and "IN" in f for f in filters), phys


def test_streaming_dedup_simhash_flavor(spark, tmp_path):
    """run_streaming_dedup with a SimHashIndex (r6: match_kwargs makes the
    driver signature-family-generic): the union of per-microbatch pair
    outputs equals the one-shot simhash_near_dup_pairs of the final
    corpus, the cluster fold equals the one-shot CC, and a DELETE batch
    relabels at the SAME max_hamming through pairs_among."""
    from singer_tap_spark.ops.dedup_text import simhash_near_dup_pairs
    from singer_tap_spark.ops.incremental import (
        ClusterIndex,
        SimHashIndex,
        run_streaming_dedup,
    )

    base = str(tmp_path)
    d = _docs(spark).where(F.col("doc_id") < 80)
    corpus = d.unionByName(
        d.where(F.col("doc_id") < 15).select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    idx = SimHashIndex(spark, f"{base}/idx")
    cc = ClusterIndex(spark, f"{base}/cc")

    def run():
        run_streaming_dedup(
            spark, f"{base}/docs", idx, f"{base}/pairs", f"{base}/ckpt",
            max_files_per_trigger=1, cluster_index=cc, op_col="op",
            match_kwargs={"max_hamming": 3},
        )

    def check(net):
        assert {r["id"] for r in idx.read_signatures().select("id").collect()} \
            == {r["doc_id"] for r in net.select("doc_id").collect()}
        got_cc = _clusters(cc.read_clusters())
        want_cc = _full_cc(
            spark, net.select("doc_id"),
            simhash_near_dup_pairs(net, max_hamming=3).select("a", "b"),
        )
        assert got_cc == want_cc

    corpus.withColumn("op", F.lit("UPSERT")).repartition(2).write.parquet(
        f"{base}/docs"
    )
    run()
    got = {(r["a"], r["b"]) for r in
           spark.read.parquet(f"{base}/pairs").select("a", "b").collect()}
    want = {(r["a"], r["b"]) for r in
            simhash_near_dup_pairs(corpus, max_hamming=3)
            .select("a", "b").collect()}
    assert got == want and len(got) > 0
    check(corpus)

    # delete an original whose planted copy survives (hub relabel via
    # pairs_among at the stream's max_hamming), plus a plain doc
    dele = spark.createDataFrame(
        [(3, None, "DELETE"), (40, None, "DELETE")],
        "doc_id long, text string, op string",
    )
    dele.coalesce(1).write.mode("append").parquet(f"{base}/docs")
    run()
    check(corpus.where(~F.col("doc_id").isin(3, 40)))
