"""Generator determinism + knob coverage (FIXTURES.md §2 knobs)."""

from pyspark.sql import functions as F

from singer_tap_spark.changelog import generate_changelog


def _fingerprint(df):
    """Order- and partitioning-insensitive content hash."""
    return df.select(
        F.bit_xor(F.xxhash64(*df.columns)).alias("h"), F.count("*").alias("n")
    ).collect()[0]


def test_deterministic_across_parallelism(spark):
    a = generate_changelog(spark, 5000, seed=7).repartition(3)
    b = generate_changelog(spark, 5000, seed=7).repartition(17)
    assert _fingerprint(a) == _fingerprint(b)


def test_seed_changes_content(spark):
    a = _fingerprint(generate_changelog(spark, 2000, seed=1))
    b = _fingerprint(generate_changelog(spark, 2000, seed=2))
    assert a != b


def test_dup_and_delete_knobs(spark):
    df = generate_changelog(spark, 4000, dup_frac=0.1, delete_frac=0.2)
    assert df.count() > 4000  # exact replays appended
    dels = df.where("op = 'DELETE'")
    assert dels.count() > 0
    assert dels.where(F.col("text").isNotNull()).count() == 0  # null payload


def test_offsets_monotone_per_shard_in_seq(spark):
    df = generate_changelog(spark, 3000)
    bad = (
        df.groupBy("shard", "offset").count().where("count > 1").count()
    )
    assert bad == 0  # (shard, offset) unique when no dup injection


def test_hot_conv_skew(spark):
    df = generate_changelog(spark, 10000, hot_conv_frac=0.5)
    top = (
        df.groupBy("conv_id").count().orderBy(F.desc("count")).first()
    )
    assert top["count"] > 4000  # ~50% funneled into one conversation
