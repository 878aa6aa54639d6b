"""LWW dedup: max_by (skew-proof) vs window (oracle-shaped) equivalence,
exact-duplicate drop — operator O17, §2.3 invariants #3/#10."""

from pyspark.sql import functions as F

from singer_tap_spark.changelog import generate_changelog
from singer_tap_spark.dedup import drop_exact_duplicates, lww_latest, lww_latest_window


def test_lww_agg_equals_window(spark):
    df = generate_changelog(spark, 8000, update_frac=0.5, ooo_frac=0.3)
    a = lww_latest(df).select("conv_id", "turn_idx", "text", "ts", "seq")
    b = lww_latest_window(df).select("conv_id", "turn_idx", "text", "ts", "seq")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_lww_one_row_per_key(spark):
    df = generate_changelog(spark, 6000, update_frac=0.6)
    out = lww_latest(df)
    assert out.groupBy("conv_id", "turn_idx").count().where("count > 1").count() == 0


def test_lww_picks_max_ts_seq(spark):
    rows = [
        ("s", 1, 1, "UPDATE", "2024-01-01 00:00:10", "c1", 0, "u", "late-ts", None, 1),
        ("s", 2, 2, "UPDATE", "2024-01-01 00:00:05", "c1", 0, "u", "early-ts-high-seq", None, 1),
        ("s", 3, 3, "INSERT", "2024-01-01 00:00:10", "c1", 1, "u", "tie-ts-low-seq", None, 1),
        ("s", 4, 4, "UPDATE", "2024-01-01 00:00:10", "c1", 1, "u", "tie-ts-high-seq", None, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "shard string, offset long, seq long, op string, ts string, conv_id string,"
        " turn_idx int, role string, text string, tool string, schema_version int",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {r["turn_idx"]: r["text"] for r in lww_latest(df).collect()}
    assert got[0] == "late-ts"  # ts dominates seq
    assert got[1] == "tie-ts-high-seq"  # seq breaks ts ties


def test_drop_exact_duplicates(spark):
    df = generate_changelog(spark, 3000, dup_frac=0.2)
    out = drop_exact_duplicates(df)
    assert out.count() == 3000
    assert out.groupBy("shard", "offset", "seq").count().where("count > 1").count() == 0
