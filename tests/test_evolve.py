"""Schema evolution: add-column, type-widen, incompatible-change error, and
the end-to-end mid-stream evolution scenario (FIXTURES.md §7.7)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from singer_tap_spark import CDCPipeline, PipelineConfig
from singer_tap_spark.changelog import generate_changelog, write_changelog
from singer_tap_spark.evolve import SchemaEvolutionError, align, evolve_schema
from tests.conftest import assert_frames_equal, duck


def test_add_column():
    cur = T.StructType([T.StructField("a", T.LongType())])
    inc = T.StructType([T.StructField("a", T.LongType()), T.StructField("b", T.StringType())])
    out, changes = evolve_schema(cur, inc)
    assert [f.name for f in out.fields] == ["a", "b"]
    assert out["b"].nullable
    assert changes == ["add column b: string"]


def test_widen_int_and_float():
    cur = T.StructType([T.StructField("a", T.IntegerType()), T.StructField("f", T.FloatType())])
    inc = T.StructType([T.StructField("a", T.LongType()), T.StructField("f", T.DoubleType())])
    out, changes = evolve_schema(cur, inc)
    assert isinstance(out["a"].dataType, T.LongType)
    assert isinstance(out["f"].dataType, T.DoubleType)
    assert len(changes) == 2


def test_narrowing_keeps_wide():
    cur = T.StructType([T.StructField("a", T.LongType())])
    inc = T.StructType([T.StructField("a", T.IntegerType())])
    out, changes = evolve_schema(cur, inc)
    assert isinstance(out["a"].dataType, T.LongType)
    assert changes == []


def test_incompatible_raises():
    cur = T.StructType([T.StructField("a", T.StringType())])
    inc = T.StructType([T.StructField("a", T.LongType())])
    with pytest.raises(SchemaEvolutionError):
        evolve_schema(cur, inc)


def test_align_fills_missing_and_casts(spark):
    df = spark.createDataFrame([(1, "x")], "a int, b string")
    target = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    row = align(df, target).collect()[0]
    assert row["a"] == 1 and row["c"] is None
    assert align(df, target).schema == target


def test_e2e_mid_stream_evolution(spark, tmp_path):
    """Events after the evolution point carry a `model` column; replaying in
    two sessions (pre/post) must null-fill old rows and keep new values."""
    base = str(tmp_path)
    df = generate_changelog(spark, 8000, schema_evolution_at=4000, update_frac=0.4)
    pre = df.where("schema_version = 1").drop("model")
    post = df.where("schema_version = 2")
    write_changelog(pre, f"{base}/log")
    cfg = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
    )
    p = CDCPipeline(spark, cfg)
    p.replay()
    assert "model" not in p.lake.read().columns

    # append evolved events to the log, resume incrementally
    post.repartition(2).write.mode("append").partitionBy("shard").parquet(f"{base}/log")
    p2 = CDCPipeline(spark, cfg)
    m = p2.replay()
    assert any("add column model" in c for b in m.batches for c in b.schema_changes)
    final = p2.lake.read()
    assert "model" in final.columns

    want = duck(
        f"""
        WITH dedup AS (SELECT DISTINCT * FROM read_parquet(
            '{base}/log/*/*.parquet', hive_partitioning=1, union_by_name=1)),
        ranked AS (SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) rn FROM dedup)
        SELECT conv_id, turn_idx, text, model FROM ranked WHERE rn=1 AND op <> 'DELETE'
        """
    )
    got = final.select("conv_id", "turn_idx", "text", "model").toPandas()
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])


def test_e2e_type_widen(spark, tmp_path):
    """turn_idx int32 -> int64 widening mid-stream, old files still readable."""
    base = str(tmp_path)
    df = generate_changelog(spark, 3000)
    write_changelog(df.where("seq < 1500"), f"{base}/log")
    cfg = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
    )
    CDCPipeline(spark, cfg).replay()

    widened = df.where("seq >= 1500").withColumn(
        "turn_idx", (F.col("turn_idx") + F.lit(2**31)).cast("long")
    )
    widened.repartition(2).write.mode("append").partitionBy("shard").parquet(f"{base}/log")
    p2 = CDCPipeline(spark, cfg)
    m = p2.replay()
    assert any("widen turn_idx" in c for b in m.batches for c in b.schema_changes)
    final = p2.lake.read()
    assert isinstance(final.schema["turn_idx"].dataType, T.LongType)
    assert final.where(F.col("turn_idx") >= 2**31).count() > 0
    assert final.where(F.col("turn_idx") < 2**31).count() > 0  # old rows intact


def test_streaming_mid_stream_evolution_across_sessions(spark, tmp_path):
    """The STREAMING form of the re-discover-then-restart evolution model
    (sync.go:63-66 analogue): session 1 tails the pre-evolution log;
    the log gains a `model` column; session 2 (same checkpoint) re-derives
    the widened schema from the footers, processes ONLY the new files, and
    the merged table null-fills old rows — equal to the batch oracle."""
    base = str(tmp_path)
    df = generate_changelog(spark, 8000, schema_evolution_at=4000, update_frac=0.4)
    pre = df.where("schema_version = 1").drop("model")
    post = df.where("schema_version = 2")
    write_changelog(pre, f"{base}/log")
    cfg = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
        checkpoint_dir=f"{base}/ckpt",
    )
    p = CDCPipeline(spark, cfg)
    p.run_streaming(available_now=True)
    assert "model" not in p.lake.read().columns
    n_files_s1 = sum(len(b.schema_changes) >= 0 for b in p.metrics.batches)

    post.repartition(2).write.mode("append").partitionBy("shard").parquet(
        f"{base}/log"
    )
    p2 = CDCPipeline(spark, cfg)  # new session, same checkpoint
    m2 = p2.run_streaming(available_now=True)
    assert any(
        "add column model" in c for b in m2.batches for c in b.schema_changes
    )
    final = p2.lake.read()
    assert "model" in final.columns

    want = duck(
        f"""
        WITH dedup AS (SELECT DISTINCT * FROM read_parquet(
            '{base}/log/*/*.parquet', hive_partitioning=1, union_by_name=1)),
        ranked AS (SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) rn FROM dedup)
        SELECT conv_id, turn_idx, text, model FROM ranked WHERE rn=1 AND op <> 'DELETE'
        """
    )
    got = final.select("conv_id", "turn_idx", "text", "model").toPandas()
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])
    assert n_files_s1 >= 1  # both sessions actually processed batches
