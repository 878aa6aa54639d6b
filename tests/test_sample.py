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
