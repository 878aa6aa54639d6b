"""Multi-stream sync loop + snapshot bootstrap (sync.go:15-147 semantics)."""

from pyspark.sql import functions as F

from singer_tap_spark import CDCPipeline, PipelineConfig
from singer_tap_spark.catalog import FULL_TABLE, Catalog, Stream, discover
from singer_tap_spark.changelog import generate_changelog, write_changelog
from singer_tap_spark.sync import SyncLayout, bootstrap_from_snapshot, sync_all
from tests.conftest import assert_frames_equal, duck, lww_oracle_sql

KEYS = ["conv_id", "turn_idx"]


def test_sync_all_selected_streams_only(spark, tmp_path):
    base = str(tmp_path)
    for name, seed in [("transcripts_a", 1), ("transcripts_b", 2), ("ignored", 3)]:
        write_changelog(generate_changelog(spark, 3000, seed=seed),
                        f"{base}/log/{name}")
    cat = discover(
        spark, f"{base}/log",
        key_properties={n: KEYS for n in ["transcripts_a", "transcripts_b", "ignored"]},
    )
    # discover() walks dataset dirs too; select two of three streams
    for s in cat.streams:
        s.selected = s.name in ("transcripts_a", "transcripts_b")
    layout = SyncLayout(f"{base}/log", f"{base}/tgt", f"{base}/state")
    metrics = sync_all(spark, cat, layout)
    assert set(metrics) == {"transcripts_a", "transcripts_b"}
    assert all(m.total_events > 0 for m in metrics.values())

    for name, seed in [("transcripts_a", 1), ("transcripts_b", 2)]:
        p = CDCPipeline(spark, layout.config_for(name))
        got = p.lake.read().select("conv_id", "turn_idx", "text").toPandas()
        want = duck(lww_oracle_sql(f"{base}/log/{name}/*/*.parquet"))[
            ["conv_id", "turn_idx", "text"]
        ]
        assert_frames_equal(got, want, KEYS)
    import os

    assert not os.path.exists(f"{base}/tgt/ignored")


def test_bootstrap_then_incremental(spark, tmp_path):
    """Snapshot rows load at seq=-1; later change-log events win LWW; the
    combined final state equals snapshot-overlaid-with-changes."""
    base = str(tmp_path)
    changes = generate_changelog(spark, 4000, update_frac=0.5, delete_frac=0.1)
    write_changelog(changes, f"{base}/log")
    # snapshot: some pre-existing conversations, disjoint + overlapping keys
    snapshot = spark.createDataFrame(
        [("conv-pre-1", 0, "user", "pre-existing text", None),
         ("conv-pre-1", 1, "assistant", "pre answer", None),
         ("conv-00000001", 0, "user", "will-be-overwritten-if-changed", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).withColumn("ts", F.to_timestamp(F.lit("2020-01-01 00:00:00")))

    cfg = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
    )
    p = CDCPipeline(spark, cfg)
    bootstrap_from_snapshot(p, snapshot)
    assert p.lake.read().count() == 3
    p.replay()

    final = p.lake.read()
    # pre-existing conversations untouched by the log survive
    assert final.where("conv_id = 'conv-pre-1'").count() == 2
    # keys present in the change log follow the log's LWW outcome
    want = duck(lww_oracle_sql(f"{base}/log/*/*.parquet"))
    got = (
        final.where(~F.col("conv_id").startswith("conv-pre"))
        .join(
            spark.createDataFrame(want[["conv_id", "turn_idx"]]),
            ["conv_id", "turn_idx"],
            "left_anti",
        )
    )
    # every non-snapshot row in the target is justified by the oracle,
    # except the overlapping snapshot key if the log never touched it
    assert got.count() <= 1


def test_chunked_bootstrap_resumes_after_crash(spark, tmp_path):
    """Kill-between-chunks: a crashed chunked bootstrap must resume from
    the persisted last_pk and NOT re-copy completed PK ranges
    (planetscale_edge_database.go:244-252 LastKnownPk semantics)."""
    base = str(tmp_path)
    snapshot = (
        spark.range(1000)
        .selectExpr(
            "concat('conv-', lpad(cast(id as string), 6, '0')) AS conv_id",
            "cast(id % 3 AS int) AS turn_idx",
            "'user' AS role",
            "concat('text-', id) AS text",
            "cast(NULL as string) AS tool",
        )
        .withColumn("ts", F.to_timestamp(F.lit("2020-01-01 00:00:00")))
    )
    cfg = PipelineConfig(
        changelog_path=f"{base}/log",  # unused: bootstrap only
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
    )
    p = CDCPipeline(spark, cfg)

    # crash after 2 of 5 chunks
    real_apply = CDCPipeline.apply_batch
    calls = {"n": 0, "rows": 0}

    def crashing(self, batch, batch_id):
        if calls["n"] == 2:
            raise RuntimeError("simulated crash mid-bootstrap")
        calls["n"] += 1
        m = real_apply(self, batch, batch_id)
        calls["rows"] += m.events
        return m

    CDCPipeline.apply_batch = crashing
    try:
        import pytest

        with pytest.raises(RuntimeError, match="simulated crash"):
            bootstrap_from_snapshot(p, snapshot, n_chunks=5)
    finally:
        CDCPipeline.apply_batch = real_apply
    first_run_rows = calls["rows"]
    assert 0 < first_run_rows < 1000  # partial progress, persisted

    # resume: a FRESH pipeline (no in-memory state) finishes the copy
    p2 = CDCPipeline(spark, cfg)
    bootstrap_from_snapshot(p2, snapshot, n_chunks=5)
    resumed_rows = p2.metrics.total_events
    # completed ranges are NOT re-copied: the two runs partition the table
    assert first_run_rows + resumed_rows == 1000
    final = p2.lake.read()
    assert final.count() == 1000
    assert final.select("conv_id", "turn_idx").distinct().count() == 1000
