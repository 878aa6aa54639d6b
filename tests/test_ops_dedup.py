"""Pytest oracles for the non-SQL-expressible dedup/similarity ops:
MinHash-LSH vs exact Jaccard, SimHash near-dup property, LSH-ANN recall
vs brute force."""

import pytest
from pyspark.sql import functions as F

from singer_tap_spark.ops.dedup_text import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_dup_pairs,
)
from singer_tap_spark.ops.similarity import (
    brute_force_topk,
    embedding_near_dup_pairs,
    lsh_ann_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _planted(docs):
    """Corpus with exact-duplicate texts planted under new ids."""
    dup = docs.where(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return docs.unionByName(dup)


def test_exact_dedup_counts(spark, docs):
    out = exact_dedup(_planted(docs))
    dups = out.where("n_dups > 1")
    assert dups.count() == 50
    assert dups.where("canonical_id >= 100000").count() == 0  # min id canonical


def test_minhash_finds_planted_dups(spark, docs):
    """Every planted exact dup (jaccard=1.0) must surface as an LSH candidate;
    verified candidates must match the exact-Jaccard join on the same pairs."""
    corpus = _planted(docs)
    cand = minhash_lsh_candidates(corpus, verify_threshold=0.5)
    got_pairs = {(r["a"], r["b"]) for r in cand.collect()}
    planted = {(i, i + 100000) for i in range(50)}
    assert planted <= got_pairs
    # est_jaccard for identical docs is exactly 1.0
    perfect = cand.where((F.col("b") - F.col("a")) == 100000)
    assert perfect.where(F.col("est_jaccard") < 1.0).count() == 0
    assert perfect.where(F.col("jaccard") < 1.0).count() == 0


def test_minhash_estimate_tracks_exact(spark, docs):
    """On organic near-pairs, |est - exact| stays within MinHash error
    (~1/sqrt(K) + slack) for K=64."""
    corpus = docs.where(F.col("doc_id") < 120)
    cand = minhash_lsh_candidates(corpus, num_hashes=64, verify_threshold=0.3)
    bad = cand.where(F.abs(F.col("est_jaccard") - F.col("jaccard")) > 0.35)
    assert bad.count() == 0, bad.collect()[:5]


def test_minhash_verified_equals_exact_join(spark, docs):
    """THE driver-oracle guarantee: at threshold 0.5 on the (doubled)
    corpus, LSH-discovered + candidate-verified pairs equal the exact
    full-join result — banding loses nothing here, so the driver can
    hash-compare against plain Jaccard SQL.  A recall regression fails
    HERE before the driver ever sees it."""
    d = docs.where(F.col("doc_id") < 150)
    corpus = d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text", "lang",
                 "source", "n_chars")
    )
    got = {(r.a, r.b, r.jaccard) for r in
           minhash_lsh_candidates(corpus, verify_threshold=0.5)
           .select("a", "b", "jaccard").collect()}
    exact = {(r.a, r.b, r.jaccard) for r in
             ngram_jaccard_pairs(corpus, n=4, threshold=0.5).collect()}
    assert got == exact
    assert len(got) > 50  # planted dups + organic pairs: non-trivial set


def test_embedding_near_dup_equals_brute_force(spark, emb):
    """Same guarantee for the embedding variant: LSH-bucketed discovery at
    the driver-pinned settings (2 planes x 16 tables) recovers EVERY pair
    with cos >= 0.35 on this corpus."""
    from singer_tap_spark.ops.similarity import _dot, with_unit_vec

    e = emb.where(F.col("vec_id") < 150)
    got = {(r.a, r.b, r.cos_sim) for r in
           embedding_near_dup_pairs(e, threshold=0.35,
                                    n_planes=2, n_tables=16).collect()}
    u = with_unit_vec(e).select(F.col("vec_id").alias("id"), F.col("_unit").alias("v"))
    brute = {(r.a, r.b, r.cos_sim) for r in (
        u.alias("l").join(u.alias("r"), F.col("l.id") < F.col("r.id"))
        .select(F.col("l.id").alias("a"), F.col("r.id").alias("b"),
                F.round(_dot("l.v", "r.v"), 6).alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.35)).collect()}
    assert got == brute
    assert len(got) > 0


def test_simhash_pairs_find_planted_dups(spark, docs):
    """Planted exact dups have hamming 0 and must all surface as pairs via
    the chunk equi-join."""
    out = simhash_near_dup_pairs(_planted(docs), max_hamming=3)
    got = {(r.a, r.b) for r in out.collect()}
    planted = {(i, i + 100000) for i in range(50)}
    assert planted <= got
    zero = out.where((F.col("b") - F.col("a")) == 100000)
    assert zero.where(F.col("hamming") != 0).count() == 0


def test_simhash_pairs_chunk_count_follows_max_hamming(spark, docs):
    """ADVICE r2: hamming <= H needs H+1 pigeonhole chunks.  At H=5 the
    discovery join must run on 6 chunk buckets (visible as 6 struct
    entries in the explode), and out-of-range H raises."""
    import pytest

    d = _planted(docs.where(F.col("doc_id") < 300))
    out5 = simhash_near_dup_pairs(d, max_hamming=5)
    got3 = {(r.a, r.b) for r in simhash_near_dup_pairs(d, max_hamming=3).collect()}
    got5 = {(r.a, r.b) for r in out5.collect()}
    assert got3 <= got5  # looser threshold is a superset
    planted = {(i, i + 100000) for i in range(50)}
    assert planted <= got5
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_near_dup_pairs(d, max_hamming=15)


def test_simhash_chunking_partitions_all_bits():
    """The derived (shift, mask) chunking must cover bits 0..62 exactly
    once for every legal max_hamming — the pigeonhole precondition."""
    for h in range(0, 15):
        n_chunks = h + 1
        width = 63 // n_chunks
        covered = []
        for c in range(n_chunks):
            w = 63 - c * width if c == n_chunks - 1 else width
            covered.extend(range(c * width, c * width + w))
        assert covered == list(range(63)), f"H={h}: bits {covered}"


def test_simhash_identical_docs_equal_hash(spark, docs):
    out = simhash(_planted(docs))
    joined = (
        out.alias("l")
        .join(out.alias("r"), F.col("l.id") + 100000 == F.col("r.id"))
        .where(F.col("l.simhash") != F.col("r.simhash"))
    )
    assert joined.count() == 0


def test_simhash_deterministic(spark, docs):
    a = simhash(docs).orderBy("id").collect()
    b = simhash(docs.repartition(7)).orderBy("id").collect()
    assert a == b


def test_lsh_ann_recall_vs_brute_force(spark, emb):
    """Default settings: LSH-ANN top-5 must recover a decent fraction of
    the true top-5 (approximate by design; brute force is the verifier)."""
    corpus = emb.where(F.col("vec_id") < 150)
    truth = brute_force_topk(corpus, corpus, k=5)
    approx = lsh_ann_topk(corpus, k=5)
    hits = truth.join(approx, ["query_id", "neighbor_id"]).count()
    total = truth.count()
    assert total > 0
    assert hits / total >= 0.4, f"recall@5 = {hits/total:.2f}"


def test_lsh_ann_driver_settings_exact(spark, emb):
    """At the driver entry's settings (2 planes x 32 tables), LSH-ANN
    equals exact brute-force top-5 on this corpus — the guarantee that lets
    the driver hash-compare emb_lsh_ann against the exact top-k SQL
    oracle.  (Top-k recall needs more tables than threshold recall: true
    k-th neighbors can sit at large angles.)"""
    corpus = emb.where(F.col("vec_id") < 150)
    truth = {tuple(r) for r in brute_force_topk(corpus, corpus, k=5).collect()}
    approx = {tuple(r) for r in
              lsh_ann_topk(corpus, k=5, n_planes=2, n_tables=32).collect()}
    assert approx == truth


def test_brute_force_topk_self_excluded_and_ranked(spark, emb):
    q = emb.where(F.col("vec_id") < 5)
    out = brute_force_topk(emb, q, k=3)
    assert out.where(F.col("query_id") == F.col("neighbor_id")).count() == 0
    per_q = out.groupBy("query_id").count().collect()
    assert all(r["count"] == 3 for r in per_q)
    # rank 1 has max cos_sim per query
    import pandas as pd

    pdf = out.toPandas()
    for _, g in pdf.groupby("query_id"):
        assert g.sort_values("rank")["cos_sim"].is_monotonic_decreasing


def test_ngram_jaccard_symmetric_bounds(spark, docs):
    pairs = ngram_jaccard_pairs(docs.where(F.col("doc_id") < 80), threshold=0.2)
    bad = pairs.where((F.col("jaccard") < 0.2) | (F.col("jaccard") > 1.0))
    assert bad.count() == 0
    assert pairs.where(F.col("a") >= F.col("b")).count() == 0  # ordered pairs


def test_curate_near_dup_paths_remove_planted(spark, docs):
    """Both near-dup routes in curate (MinHash-LSH verified, SimHash
    chunk-join) must drop the planted higher-id exact duplicates and keep
    the originals."""
    from singer_tap_spark.ops.curate import curate

    corpus = _planted(docs)
    for kw in ({"near_dup_jaccard": 0.8}, {"near_dup_hamming": 0}):
        out = curate(corpus, min_quality=0.0, min_tokens=0, **kw)
        ids = {r["doc_id"] for r in out.select("doc_id").collect()}
        assert not any(i >= 100000 for i in ids), kw  # planted copies gone
        survivors = {i for i in ids if i < 50}
        assert survivors == set(range(50)) & survivors  # originals kept
        assert len(survivors) > 0


def test_ivf_probe_all_lists_equals_brute_force(spark, emb):
    """IVF machinery anchor: probing every list IS the exhaustive search —
    results must equal brute force exactly (quantizer, list assignment,
    scoring and ranking all correct)."""
    from singer_tap_spark.ops.similarity import ivf_ann_topk

    corpus = emb.where(F.col("vec_id") < 120)
    truth = {tuple(r) for r in brute_force_topk(corpus, corpus, k=5).collect()}
    full = {tuple(r) for r in
            ivf_ann_topk(corpus, k=5, n_centroids=8, n_probe=8).collect()}
    assert full == truth


def test_ivf_recall_grows_with_probes(spark, emb):
    from singer_tap_spark.ops.similarity import ivf_ann_topk

    corpus = emb.where(F.col("vec_id") < 120)
    truth = {tuple(r) for r in brute_force_topk(corpus, corpus, k=5).collect()}

    def recall(n_probe):
        got = {tuple(r) for r in
               ivf_ann_topk(corpus, k=5, n_centroids=8, n_probe=n_probe).collect()}
        return len(got & truth) / len(truth)

    r2, r6 = recall(2), recall(6)
    assert r2 < r6 <= 1.0
    assert r6 >= 0.6


def test_ivf_deterministic_across_parallelism(spark, emb):
    from singer_tap_spark.ops.similarity import ivf_ann_topk

    corpus = emb.where(F.col("vec_id") < 100)
    a = {tuple(r) for r in ivf_ann_topk(corpus, n_probe=3).collect()}
    b = {tuple(r) for r in ivf_ann_topk(corpus.repartition(7), n_probe=3).collect()}
    assert a == b


def test_vectorized_scoring_matches_hof(spark, emb):
    """The opt-in numpy pair-scoring kernel must agree with the JVM HOF
    fold after round(6) on every op that offers it (production flips it on
    where candidate scoring dominates; entries keep the fold for bit-exact
    DuckDB parity)."""
    from singer_tap_spark.ops.similarity import ivf_ann_topk

    e = emb.where(F.col("vec_id") < 150)
    for fn, kw in [
        (lsh_ann_topk, dict(k=5, n_planes=2, n_tables=8)),
        (embedding_near_dup_pairs, dict(threshold=0.35, n_planes=2, n_tables=16)),
        (ivf_ann_topk, dict(k=5, n_centroids=8, n_probe=3)),
    ]:
        a = {tuple(r) for r in fn(e, **kw).collect()}
        b = {tuple(r) for r in fn(e, vectorized_scoring=True, **kw).collect()}
        assert a == b, fn.__name__
        assert len(a) > 0


def test_unit_fold_kernel_bit_exact(spark, emb):
    """r7: the vectorized IVF leg routes normalization through an Arrow
    kernel whose column-sequential accumulation must reproduce the JVM HOF
    fold BIT-exactly (same float64 casts, same left-to-right adds, IEEE
    sqrt/divide) — this is what guarantees the fast leg trains the same
    quantizer and emits the same rows as the HOF leg.  Compared with <=>
    (null-safe equality) element-wise, not round-trip strings."""
    from singer_tap_spark.ops.similarity import _unit_fold_kernel, with_unit_vec

    hof = with_unit_vec(emb).select("vec_id", F.col("_unit").alias("v"))
    ker = emb.select(
        "vec_id", _unit_fold_kernel()(F.col("embedding")).alias("v")
    )
    diff = (
        hof.alias("h")
        .join(ker.alias("k"), "vec_id")
        .where(~F.expr("h.v <=> k.v"))
        .count()
    )
    assert diff == 0
    # degenerate rows: a NULL vector emits NULL (dropped from the fast
    # leg's candidate scoring); NULL elements round-trip Arrow as NaN and
    # come back as an all-NULL array — the same all-null unit the HOF fold
    # produces for a null-tainted vector
    bad = spark.createDataFrame(
        [(1, None), (2, [1.0, None, 3.0])],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["v"]
        for r in bad.select(
            "vec_id", _unit_fold_kernel()(F.col("embedding")).alias("v")
        ).collect()
    }
    assert got == {1: None, 2: [None, None, None]}


def test_ivf_fast_leg_deterministic_across_parallelism(spark, emb):
    """r7: the cogroup-scored vectorized IVF leg must stay deterministic
    at any input partitioning (per-(query,list) top-k selection and the
    outer-product fold are batch-shape-independent by construction)."""
    from singer_tap_spark.ops.similarity import ivf_ann_topk

    corpus = emb.where(F.col("vec_id") < 100)
    a = {
        tuple(r)
        for r in ivf_ann_topk(
            corpus, n_probe=3, vectorized_scoring=True
        ).collect()
    }
    b = {
        tuple(r)
        for r in ivf_ann_topk(
            corpus.repartition(7), n_probe=3, vectorized_scoring=True
        ).collect()
    }
    assert a == b and len(a) > 0


def test_vectorized_signatures_match_hof(spark, emb):
    """The opt-in Arrow GEMM signature kernel (one (B,dim)@(dim,T*P)
    matmul per batch) must agree with the JVM plane-tensor fold on every
    op that offers it — same seeds, same 2**p bit weights.  The HOF form
    costs ~0.7us per interpreted lambda ELEMENT (n x T x P x dim), so the
    kernel is the scale path; the fold stays default for bit-exact DuckDB
    oracle parity (sign flips need |dot| within summation-order float
    error of exactly zero — absent on these corpora, pinned here)."""
    e = emb.where(F.col("vec_id") < 150)
    for fn, kw in [
        (lsh_ann_topk, dict(k=5, n_planes=2, n_tables=8)),
        (embedding_near_dup_pairs, dict(threshold=0.35, n_planes=2, n_tables=16)),
    ]:
        a = {tuple(r) for r in fn(e, **kw).collect()}
        b = {tuple(r) for r in fn(e, vectorized_signatures=True, **kw).collect()}
        assert a == b, fn.__name__
        assert len(a) > 0


def test_signature_kernels_survive_degenerate_vectors(spark):
    """One NULL / ragged / zero / NaN vector must not kill the Arrow task
    (numpy throws on the inhomogeneous batch): every degenerate row gets
    the uniform (NULL unit, sig 0) — matching the fold for NULL vectors,
    and deliberately SAFER than the fold for NaN-tainted ones (the fold's
    NaN unit survives into cos_sim where NaN >= t is TRUE in Spark; the
    kernel's NULL unit nulls every downstream dot, so garbage never
    pairs).  Clean rows stay bit-equal to the fold."""
    from singer_tap_spark.ops.similarity import (
        _all_table_sigs,
        _hyperplanes,
        _table_sigs_kernel,
        _unit_sigs_kernel,
        with_unit_vec,
    )

    df = spark.createDataFrame(
        [(1, [1.0, 2.0, 3.0]), (2, None), (3, [1.0, 2.0]),
         (4, [0.0, 0.0, 0.0]), (5, [float("nan"), 1.0, 2.0]),
         (6, [-1.0, 4.0, 0.5])],
        "id long, v array<double>",
    )
    u = with_unit_vec(df, "v").select("id", F.col("_unit").alias("v"))

    def norm(rows):
        out = set()
        for r in rows:
            v = (None if r["v"] is None else
                 tuple(None if x is None or x != x else round(x, 9)
                       for x in r["v"]))
            out.add((r["id"], v, r["tbl"], r["sig"]))
        return out

    hof = norm(_all_table_sigs(u, 3, 2, 2, 42).collect())
    gemm = norm(_all_table_sigs(u, 3, 2, 2, 42, vectorized=True).collect())
    clean = {1, 2, 6}  # NULL vector folds to (NULL unit, sig 0) both ways
    assert {t for t in gemm if t[0] in clean} == \
        {t for t in hof if t[0] in clean}
    # ragged/zero/NaN rows: sig 0 in every table (v passes through as-is)
    assert {(i, t, s) for i, _, t, s in gemm if i not in clean} == {
        (i, t, 0) for i in (3, 4, 5) for t in (0, 1)
    }

    planes = [_hyperplanes(3, 2, 42 + t) for t in range(2)]
    k = _unit_sigs_kernel(planes)
    got = norm(
        df.select("id", k(F.col("v")).alias("us")).select(
            "id", F.col("us.unit").alias("v"),
            F.posexplode("us.sigs").alias("tbl", "sig"),
        ).collect()
    )
    assert {t for t in got if t[0] in clean} == \
        {t for t in hof if t[0] in clean}
    # from RAW vectors every degenerate row is (NULL unit, sig 0)
    assert {t for t in got if t[0] not in clean} == {
        (i, None, t, 0) for i in (3, 4, 5) for t in (0, 1)
    }


def test_vectorized_signatures_and_scoring_compose(spark, emb):
    """Both Arrow kernels on at once — the full production configuration
    — still reproduces the all-JVM result."""
    e = emb.where(F.col("vec_id") < 120)
    a = {tuple(r) for r in lsh_ann_topk(e, k=5, n_planes=2, n_tables=8).collect()}
    b = {tuple(r) for r in lsh_ann_topk(
        e, k=5, n_planes=2, n_tables=8,
        vectorized_scoring=True, vectorized_signatures=True).collect()}
    assert a == b
    assert len(a) > 0


def test_benchmark_contamination(spark):
    """A doc QUOTING a benchmark item verbatim is flagged (near-dup dedup
    can't catch that); unrelated docs are not; a bench item shorter than n
    words still matches via its whole-text gram."""
    from singer_tap_spark.ops.dedup_text import benchmark_contamination

    bench = spark.createDataFrame(
        [
            (100, "what is the capital city of the great nation of france"),
            (101, "tiny prompt"),  # < n words
        ],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # quotes bench 100 inside unrelated prose
            (1, "training text says: What is the capital city of the "
                "great nation of France according to the atlas"),
            # unrelated
            (2, "completely different content about maritime law and "
                "lighthouse construction procedures in northern europe"),
            # contains the tiny prompt verbatim
            (3, "a doc with the tiny prompt inside it"),
            # shares only a 7-word prefix with bench 100 -> below n=8
            (4, "what is the capital city of the kingdom far away"),
        ],
        "doc_id long, text string",
    )
    out = {(r["doc_id"], r["bench_id"]): r["n_shared"]
           for r in benchmark_contamination(docs, bench, n=8).collect()}
    assert (1, 100) in out and out[(1, 100)] >= 1
    # short bench item (< n words) matched inside a LONG doc: the doc side
    # emits the short lengths' grams too
    assert (3, 101) in out and out[(3, 101)] == 1
    assert all(d != 2 for d, _ in out)
    assert (4, 100) not in out  # 7-word overlap < n


def test_benchmark_contamination_impls_identical(spark):
    """Arrow gram UDF == pure-Catalyst expr form on the real corpus with a
    short bench item in play (exercises the whole-short-text floor)."""
    from singer_tap_spark.ops.dedup_text import benchmark_contamination

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    bench = docs.where(F.col("doc_id") < 10).select(
        F.col("doc_id").alias("bench_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), 1, 5)
        ).alias("text"),  # 5-word items: short path active at n=8
    )
    a = benchmark_contamination(docs, bench, n=8)
    b = benchmark_contamination(docs, bench, n=8, impl="expr")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_verbatim_span_pairs(spark):
    """Partial copying caught (a pasted 32-word span inside an otherwise-
    unique doc); whole-doc Jaccard at 0.5 misses the same pair; the
    boilerplate cap drops ubiquitous spans; impls identical."""
    from singer_tap_spark.ops.dedup_text import (
        ngram_jaccard_pairs,
        verbatim_span_pairs,
    )

    span = " ".join(f"w{i}" for i in range(40))  # 40 unique words
    filler_a = " ".join(f"a{i}" for i in range(200))
    filler_b = " ".join(f"b{i}" for i in range(200))
    boiler = " ".join(f"t{i}" for i in range(32))
    docs = spark.createDataFrame(
        [
            (1, span + " " + filler_a),
            (2, filler_b + " " + span),
            (3, "unrelated " + " ".join(f"c{i}" for i in range(100))),
        ]
        # boilerplate span shared by many docs -> capped out
        + [(10 + i, boiler + f" unique{i} " + " ".join(f"d{i}_{j}" for j in range(40)))
           for i in range(8)],
        "doc_id long, text string",
    )
    out = {(r["a"], r["b"]): r["n_shared_spans"]
           for r in verbatim_span_pairs(docs, n=32, max_gram_docs=4).collect()}
    assert (1, 2) in out and out[(1, 2)] == 9  # 40-32+1 shared spans
    assert all(a not in range(10, 18) and b not in range(10, 18)
               for a, b in out)  # boilerplate capped, no pair storm
    # whole-doc similarity misses the partial copy at mainstream thresholds
    jac = {(r["a"], r["b"]) for r in
           ngram_jaccard_pairs(docs.where("doc_id <= 3"), n=4,
                               threshold=0.5).collect()}
    assert (1, 2) not in jac

    a = {tuple(r) for r in verbatim_span_pairs(docs, n=32).collect()}
    b = {tuple(r) for r in verbatim_span_pairs(docs, n=32, impl="expr").collect()}
    assert a == b


def test_quantile_gate_keeps_top_fraction(spark):
    """quantile_gate: survivors are exactly the rows at-or-above the
    (1-keep_frac) percentile; every kept score >= every dropped score."""
    from singer_tap_spark.ops.curate import quantile_gate

    rows = [(i, i / 100.0) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, quality double")
    out = quantile_gate(docs, keep_frac=0.3).collect()
    kept = {r["doc_id"] for r in out}
    # percentile(q, 0.7) over 0.00..0.99 = 0.693 -> keeps 0.70..0.99
    assert kept == set(range(70, 100))
    # ties never split: duplicate the threshold value
    docs2 = spark.createDataFrame(
        [(i, 0.5) for i in range(10)] + [(10, 0.9)],
        "doc_id long, quality double")
    out2 = quantile_gate(docs2, keep_frac=0.5).count()
    assert out2 == 11  # threshold 0.5, all ties kept

    # approx path: same plan shape, near-identical result at this size
    approx = quantile_gate(docs, keep_frac=0.3, exact=False).count()
    assert abs(approx - 30) <= 2

    # score column names needing backticks (space/dot/hyphen) must parse
    # as ONE identifier, not fail analysis or resolve a nested field
    odd = docs.withColumnRenamed("quality", "quality score.v1")
    assert quantile_gate(odd, score_col="quality score.v1",
                         keep_frac=0.3).count() == 30

    import pytest

    with pytest.raises(ValueError):
        quantile_gate(docs, keep_frac=0.0)


def test_quantile_gate_no_corpus_shuffle(spark):
    """The corpus side reaches the join without an Exchange: only the
    1-row threshold aggregate shuffles (partial agg), then broadcasts."""
    from singer_tap_spark.ops.curate import quantile_gate

    docs = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") / 1000.0).alias("quality")
    )
    plan = (
        quantile_gate(docs, keep_frac=0.2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    # no full-corpus Exchange: every Exchange in the plan is the SinglePartition
    # gather for the 1-row percentile agg
    import re
    # agg gather + the broadcast of its 1-row result
    exchanges = re.findall(r"Exchange (\w+)", plan)
    assert all(
        e in ("SinglePartition", "IdentityBroadcastMode") for e in exchanges
    ), exchanges


def test_contamination_ignores_empty_items(spark):
    """Empty/whitespace bench items and docs carry no content: they must
    neither register a short length (which would explode every corpus
    word) nor 'match' each other via the '' gram."""
    from singer_tap_spark.ops.dedup_text import benchmark_contamination

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, ""), (11, "  "), (12, "beta gamma")],
        "bench_id long, text string",
    )
    out = benchmark_contamination(docs, bench, n=2).collect()
    assert {(r["doc_id"], r["bench_id"]) for r in out} == {(1, 12)}


def test_brute_force_impl_parity(spark, emb):
    """r7: the arrow mapInPandas brute-force leg (corpus crosses the Python
    boundary once, slim rows back) must be BIT-identical to the Catalyst
    join+HOF-fold form — same unit values, same fold-order dots, rounding
    Catalyst-side in both."""
    q = emb.where(F.col("vec_id") < 8)
    a = {tuple(r) for r in brute_force_topk(emb, q, k=5).collect()}
    b = {tuple(r) for r in brute_force_topk(emb, q, k=5, impl="expr").collect()}
    assert a == b and len(a) > 0
