"""Salted repartition: deterministic, spreads a hot conversation (FIXTURES §7.8)."""

from pyspark.sql import functions as F

from singer_tap_spark.changelog import generate_changelog
from singer_tap_spark.salt import salted_repartition


def test_salt_spreads_hot_key(spark):
    df = generate_changelog(spark, 20000, hot_conv_frac=0.5)
    n_parts = 16
    salted = salted_repartition(df, ["conv_id"], ["conv_id", "turn_idx"], n_parts)
    sizes = (
        salted.withColumn("p", F.spark_partition_id())
        .groupBy("p").count().agg(
            F.max("count").alias("mx"), F.expr("percentile(count, 0.5)").alias("md")
        ).collect()[0]
    )
    # unsalted, one partition would hold >= 50% of rows (>= 10000);
    # salted, the max partition must be well below that
    assert sizes["mx"] < 4000, sizes


def test_salt_deterministic(spark):
    df = generate_changelog(spark, 2000)
    a = salted_repartition(df, ["conv_id"], ["conv_id", "turn_idx"], 8, 4)
    b = salted_repartition(df.repartition(13), ["conv_id"], ["conv_id", "turn_idx"], 8, 4)
    ha = a.select(F.bit_xor(F.xxhash64(*df.columns))).collect()[0][0]
    hb = b.select(F.bit_xor(F.xxhash64(*df.columns))).collect()[0][0]
    assert ha == hb
