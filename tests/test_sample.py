"""Deterministic sampling: parallelism-independence, nesting, stratification,
fraction accuracy."""

import pytest
from pyspark.sql import functions as F

from singer_tap_spark.ops.sample import deterministic_sample, stratified_sample

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sample_deterministic_across_parallelism(spark, docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    b = {r.doc_id for r in
         deterministic_sample(docs.repartition(7), 0.3).select("doc_id").collect()}
    assert a == b
    assert len(a) > 0


def test_sample_nested(spark, docs):
    """Growing the fraction only ADDS rows — incremental dataset scaling
    never reshuffles previously selected data."""
    s2 = {r.doc_id for r in deterministic_sample(docs, 0.2).select("doc_id").collect()}
    s5 = {r.doc_id for r in deterministic_sample(docs, 0.5).select("doc_id").collect()}
    assert s2 <= s5


def test_sample_fraction_accuracy(spark, docs):
    n = docs.count()
    got = deterministic_sample(docs, 0.5).count()
    assert abs(got / n - 0.5) < 0.1  # binomial tolerance at n=500


def test_sample_seeds_differ(spark, docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.5, seed=1).select("doc_id").collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.5, seed=2).select("doc_id").collect()}
    assert a != b


def test_stratified_fractions_respected(spark, docs):
    tagged = docs.withColumn("stratum", (F.col("doc_id") % 2 == 0).cast("string"))
    out = stratified_sample(tagged, "stratum", {"true": 1.0, "false": 0.0})
    rows = out.select("doc_id").collect()
    assert len(rows) == docs.where("doc_id % 2 = 0").count()
    assert all(r.doc_id % 2 == 0 for r in rows)


def test_stratified_default_fraction(spark, docs):
    tagged = docs.withColumn("stratum", F.lit("other"))
    assert stratified_sample(tagged, "stratum", {"en": 1.0}).count() == 0
    n = stratified_sample(tagged, "stratum", {"en": 0.0}, default_fraction=1.0).count()
    assert n == docs.count()


def test_sample_rejects_bad_fraction(spark, docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5)
    with pytest.raises(ValueError):
        stratified_sample(docs, "lang", {"en": -0.1})


def test_splits_partition_exactly(spark, docs):
    from singer_tap_spark.ops.sample import assign_splits

    out = assign_splits(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    n = docs.count()
    by = {r["split"]: r["n"] for r in
          out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == n           # every row in exactly one split
    assert abs(by.get("train", 0) / n - 0.8) < 0.1
    # deterministic at any parallelism
    a = {(r.doc_id, r.split) for r in out.select("doc_id", "split").collect()}
    b = {(r.doc_id, r.split) for r in
         assign_splits(docs.repartition(5), {"train": 0.8, "val": 0.1, "test": 0.1})
         .select("doc_id", "split").collect()}
    assert a == b


def test_splits_fingerprint_key_keeps_dups_together(spark, docs):
    """Contamination-safe mode: splitting on the content fingerprint puts
    exact duplicates in the SAME split."""
    from singer_tap_spark.ops.sample import assign_splits
    from singer_tap_spark.ops.text import doc_fingerprint

    doubled = docs.select("doc_id", "text").unionByName(
        docs.select((F.col("doc_id") + 100000).alias("doc_id"), "text")
    ).withColumn("fingerprint", doc_fingerprint(F.col("text")))
    out = assign_splits(doubled, {"train": 0.5, "test": 0.5},
                        id_col="fingerprint")
    leaks = (
        out.groupBy("fingerprint")
        .agg(F.countDistinct("split").alias("ns"))
        .where(F.col("ns") > 1)
    )
    assert leaks.count() == 0


def test_splits_weights_validated(spark, docs):
    from singer_tap_spark.ops.sample import assign_splits

    import pytest as _pytest

    with _pytest.raises(ValueError, match="sum"):
        assign_splits(docs, {"train": 0.8, "test": 0.1})


def test_mixture_sample_properties(spark):
    """Budget-growth nesting, availability cap, absent-source drop, and
    sampled token mass tracking the target mixture."""
    import pytest as _pytest

    from singer_tap_spark.ops.sample import mixture_sample

    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").select(
        "doc_id", "source", "text"
    )
    w = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
    small = mixture_sample(d, w, budget_tokens=3000)
    big = mixture_sample(d, w, budget_tokens=9000)
    s_ids = {r["doc_id"] for r in small.select("doc_id").collect()}
    b_ids = {r["doc_id"] for r in big.select("doc_id").collect()}
    assert s_ids <= b_ids  # nested: growing the budget only adds rows
    assert {r["source"] for r in big.select("source").distinct().collect()} \
        <= set(w)  # absent sources dropped

    # huge budget: fraction caps at 1 -> every doc of targeted sources kept
    every = mixture_sample(d, w, budget_tokens=10_000_000)
    assert every.count() == d.where(F.col("source").isin(list(w))).count()

    # sampled token mass per source ~ budget * weight (loose: per-row
    # membership; 3-sigma-ish slack on a 25-doc stratum)
    got = {
        r["source"]: r["tk"]
        for r in mixture_sample(d, w, budget_tokens=4000)
        .groupBy("source").agg(F.sum("n_tokens").alias("tk")).collect()
    }
    for s, frac in w.items():
        target = 4000 * frac
        assert got.get(s, 0) < 3 * target + 800, (s, got.get(s), target)

    with _pytest.raises(ValueError, match="budget_tokens"):
        mixture_sample(d, w, budget_tokens=-1)
    with _pytest.raises(ValueError, match="weight for source"):
        mixture_sample(d, {"src0": -0.1}, budget_tokens=100)
    # no targeted source present -> empty
    assert mixture_sample(d, {"nope": 1.0}, budget_tokens=100).count() == 0


def test_exact_k_sample_properties(spark):
    """Exactly k per stratum; deterministic across partitioning; nested
    under k growth; global form returns exactly k."""
    from singer_tap_spark.ops.sample import exact_k_sample

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    out = exact_k_sample(df, 7, strata_col="lang")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 7, "de": 7, "fr": 7}

    # partitioning-independent
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in
         exact_k_sample(df.repartition(13), 7, strata_col="lang").collect()}
    assert a == b

    # nested: k=7 subset of k=9
    c = {r["doc_id"] for r in
         exact_k_sample(df, 9, strata_col="lang").collect()}
    assert a <= c

    # k larger than a stratum: the whole stratum, no error
    small = df.where("doc_id < 5")
    assert exact_k_sample(small, 100, strata_col="lang").count() == 5

    # global form: exactly k, deterministic
    g1 = [r["doc_id"] for r in exact_k_sample(df, 11).collect()]
    g2 = [r["doc_id"] for r in exact_k_sample(df.repartition(17), 11).collect()]
    assert len(g1) == 11 and sorted(g1) == sorted(g2)

    import pytest

    with pytest.raises(ValueError):
        exact_k_sample(df, -1)
