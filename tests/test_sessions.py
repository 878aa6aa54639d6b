"""session_window sessionization: batch equality with the lag+cumsum form,
and the same operator running under Structured Streaming."""

from pyspark.sql import functions as F

from singer_tap_spark.ops.sessions import sessionize

SF = "/root/testdata/sf0.001"


def _lag_cumsum_sessions(spark, path):
    from pyspark.sql import Window

    ev = spark.read.parquet(path)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gapped = ev.withColumn(
        "_new",
        F.when(
            F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTES"),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("sid", F.sum("_new").over(w))
    return (
        gapped.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )


def test_session_window_equals_lag_cumsum(spark):
    got = sessionize(spark.read.parquet(f"{SF}/events.parquet"))
    want = _lag_cumsum_sessions(spark, f"{SF}/events.parquet")
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.count() > 0


def test_sessionize_streaming_matches_batch(spark, tmp_path):
    """The SAME operator over a stream.  Session windows stream in APPEND
    mode only: a session emits when the watermark passes its end, and the
    watermark used by batch N is the one computed from batch N-1 — so the
    source is staged as two files (real events, then a far-future sentinel
    user) with maxFilesPerTrigger=1.  Every real session except the one
    holding the globally-latest event must emit and match the batch twin."""
    import os
    import time as _time

    src = str(tmp_path / "src")
    real = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        # watermarks need TIMESTAMP (LTZ); fixture ts is NTZ (UTC session
        # TZ pins the values, so the cast is value-preserving)
        "ts", F.col("ts").cast("timestamp")
    )
    real.coalesce(1).write.parquet(src)
    cols = []
    for c in real.columns:
        if c == "user_id":
            cols.append(F.lit(-1).cast(dict(real.dtypes)["user_id"]).alias(c))
        elif c == "ts":
            cols.append((F.col("ts") + F.expr("INTERVAL 48 HOURS")).alias(c))
        else:
            cols.append(F.col(c))
    sentinel = real.limit(1).select(*cols)
    _time.sleep(1.1)  # FileStreamSource orders by mtime: sentinel LAST
    sentinel.coalesce(1).write.mode("append").parquet(src)
    newest = max(
        (os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")),
        key=os.path.getmtime,
    )
    os.utime(newest, (_time.time() + 5, _time.time() + 5))

    stream = (
        spark.readStream.schema(real.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        sessionize(stream, watermark="0 seconds")
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("sess_stream").where(F.col("user_id") >= 0)
    want = sessionize(real)
    assert got.exceptAll(want).count() == 0  # nothing spurious
    missing = want.exceptAll(got).count()
    assert missing <= 1, f"{missing} sessions never emitted"  # only the tail
    assert got.count() > 0


def test_session_window_exact_gap_boundary(spark):
    """MEASURED boundary semantics (ADVICE r2 raised this; the claim was
    backwards): Spark merges session windows that merely TOUCH, so an event
    arriving EXACTLY gap after its predecessor stays in the SAME session —
    i.e. strict '> gap' starts a new one, matching the lag+cumsum twin and
    the DuckDB oracles as already written.  This test pins the behavior so
    a Spark-version change would surface loudly."""
    rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:30:00"),   # exactly 30 min later -> SAME session
        (1, "2024-01-01 01:00:00.001"),  # 1 ms over the gap -> NEW session
    ]
    ev = spark.createDataFrame(rows, "user_id int, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got = sessionize(ev).orderBy("session_start").collect()
    assert [r.n_events for r in got] == [2, 1]
