"""Stateful streaming LWW delta feed (applyInPandasWithState): emits a key
only when a batch advances its winner; final per-key emission equals the
batch LWW oracle."""

from pyspark.sql import functions as F

from singer_tap_spark.changelog import generate_changelog, write_changelog
from singer_tap_spark.dedup import lww_latest
from singer_tap_spark.streaming_state import stateful_lww_updates


def _run_stream(spark, log_path, ckpt, out_name):
    schema = spark.read.parquet(log_path).schema
    src = spark.readStream.schema(schema).parquet(log_path)
    delta = stateful_lww_updates(src)
    collected = []

    def sink(bdf, _bid):
        collected.append(bdf.toPandas())

    q = (
        delta.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import pandas as pd

    frames = [f for f in collected if len(f)]
    if not frames:
        return spark.createDataFrame([], delta.schema)
    return spark.createDataFrame(pd.concat(frames), schema=delta.schema)


def test_delta_feed_matches_batch_lww(spark, tmp_path):
    base = str(tmp_path)
    df = generate_changelog(spark, 4000, update_frac=0.5, delete_frac=0.1, ooo_frac=0.2)
    write_changelog(df, f"{base}/log")
    out = _run_stream(spark, f"{base}/log", f"{base}/ck", "delta1")

    # last emission per key == batch LWW winner (op included: DELETE flows)
    final = lww_latest(
        out, ("conv_id", "turn_idx"), ("ts", "seq"),
        value_cols=["op", "role", "text", "tool", "ts", "seq"],
    )
    want = lww_latest(df, ("conv_id", "turn_idx"), ("ts", "seq"),
                      value_cols=["op", "role", "text", "tool", "ts", "seq"])
    assert final.exceptAll(want).count() == 0
    assert want.exceptAll(final).count() == 0


def test_delta_feed_suppresses_stale_batches(spark, tmp_path):
    """Second session carrying only older events for known keys must emit
    nothing new for them (state won)."""
    base = str(tmp_path)
    df = generate_changelog(spark, 3000, update_frac=0.5, ooo_frac=0.0)
    newer = df.where("seq >= 1500")
    older = df.where("seq < 1500")
    write_changelog(newer, f"{base}/log")
    out1 = _run_stream(spark, f"{base}/log", f"{base}/ck", "delta2")
    n1 = out1.count()

    # append strictly-older events; stream resumes from checkpoint
    older.repartition(2).write.mode("append").partitionBy("shard").parquet(f"{base}/log")
    out2 = _run_stream(spark, f"{base}/log", f"{base}/ck", "delta2b")
    emitted_keys_2 = out2.select("conv_id", "turn_idx", "ts", "seq")
    # any key emitted in session 2 must NOT already have a >= (ts,seq) winner
    # from session 1
    stale = (
        emitted_keys_2.alias("n")
        .join(out1.alias("o"), ["conv_id", "turn_idx"])
        .where(
            F.struct(F.col("o.ts"), F.col("o.seq"))
            >= F.struct(F.col("n.ts"), F.col("n.seq"))
        )
    )
    assert stale.count() == 0
    assert n1 > 0


def test_pipeline_delta_feed_head(spark, tmp_path):
    """The pipeline wiring for the stateful feed (VERDICT r1 #10): the
    parquet change feed written by run_delta_feed resolves (LWW + DELETE
    filter) to the same final state as the merge sink over the same log."""
    from singer_tap_spark import CDCPipeline, PipelineConfig

    base = str(tmp_path)
    df = generate_changelog(spark, 4000, update_frac=0.5, delete_frac=0.1)
    write_changelog(df, f"{base}/log")
    cfg = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
        checkpoint_dir=f"{base}/ckpt_feed",
    )
    p = CDCPipeline(spark, cfg)
    p.run_delta_feed(f"{base}/feed")

    feed = spark.read.parquet(f"{base}/feed")
    resolved = lww_latest(
        feed, ("conv_id", "turn_idx"), ("ts", "seq"),
        value_cols=["op", "role", "text", "tool", "ts", "seq"],
    ).where(F.col("op") != "DELETE").drop("op", "seq")

    cfg2 = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt2",
        lineage_path=f"{base}/lineage2.json",
    )
    p2 = CDCPipeline(spark, cfg2)
    p2.replay()
    want = p2.lake.read().select(*resolved.columns)
    assert resolved.exceptAll(want).count() == 0
    assert want.exceptAll(resolved).count() == 0


def test_delta_feed_impls_equivalent(spark, tmp_path):
    """The JVM 'merge' delta feed and the applyInPandasWithState 'stateful'
    feed must emit the SAME event set on the same log with the same
    microbatching — one row per key per batch iff the batch strictly
    advanced the key's (ts, seq), DELETE winners included."""
    from pyspark.sql import functions as F

    from singer_tap_spark import CDCPipeline, PipelineConfig
    from singer_tap_spark.changelog import generate_changelog, write_changelog

    base = str(tmp_path)
    write_changelog(
        generate_changelog(spark, 4000, update_frac=0.5, delete_frac=0.1,
                           dup_frac=0.08),
        f"{base}/log",
    )
    feeds = {}
    for impl in ("merge", "stateful"):
        cfg = PipelineConfig(
            changelog_path=f"{base}/log",
            target_path=f"{base}/tgt_{impl}",
            lineage_path=f"{base}/lin_{impl}.json",
            checkpoint_dir=f"{base}/ckpt_{impl}",
            max_files_per_trigger=4,  # several microbatches, same pacing
            # historical-replay setting: file order is not event-time order,
            # so a short watermark would make the stateful path DROP
            # late-arriving rows that the JVM path (no event-time bound)
            # processes — the one intended semantic difference between them
            watermark_delay="3650 days",
        )
        p = CDCPipeline(spark, cfg)
        p.run_delta_feed(f"{base}/feed_{impl}", available_now=True, impl=impl)
        df = spark.read.parquet(f"{base}/feed_{impl}")
        cols = ["conv_id", "turn_idx", "op", "role", "text", "tool", "ts", "seq"]
        feeds[impl] = {tuple(r) for r in df.select(*cols).collect()}
    assert feeds["merge"] == feeds["stateful"]
    assert len(feeds["merge"]) > 0
    # DELETE events flow through the feed
    assert any(r[2] == "DELETE" for r in feeds["merge"])
