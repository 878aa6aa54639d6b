"""Multi-stream sync orchestration — the reference's top-level Sync loop.

``internal.Sync`` (cmd/internal/sync.go:15-147) iterates selected streams
STRICTLY SEQUENTIALLY, and within a stream iterates shards sequentially —
the reference's structural parallelism ceiling (SURVEY §6).  Here each
stream is one Spark pipeline whose stages parallelize across the cluster,
and independent streams can run concurrently from the driver (thread pool —
Spark schedules their jobs fairly).

Also provides the snapshot bootstrap: VStream semantics are "current table
state + changes from here on" (planetscale_edge_database.go:175-186 with an
empty cursor starts a full copy).  ``bootstrap_from_snapshot`` loads an
existing table as the initial state, then the change log applies on top.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from singer_tap_spark.catalog import Catalog, FULL_TABLE
from singer_tap_spark.metrics import RunMetrics
from singer_tap_spark.pipeline import CDCPipeline, PipelineConfig


@dataclass
class SyncLayout:
    """Directory convention wiring streams to paths."""

    changelog_root: str  # <root>/<stream>/  change-event parquet
    target_root: str     # <root>/<stream>/  lake table
    state_root: str      # <root>/<stream>.lineage.json + checkpoints

    def config_for(self, stream_name: str, **kw) -> PipelineConfig:
        return PipelineConfig(
            changelog_path=f"{self.changelog_root}/{stream_name}",
            target_path=f"{self.target_root}/{stream_name}",
            lineage_path=f"{self.state_root}/{stream_name}.lineage.json",
            checkpoint_dir=f"{self.state_root}/{stream_name}.ckpt",
            stream_name=stream_name,
            **kw,
        )


def sync_all(
    spark: SparkSession,
    catalog: Catalog,
    layout: SyncLayout,
    max_concurrent_streams: int = 4,
) -> dict[str, RunMetrics]:
    """Run every selected stream's pipeline (filterSchema semantics:
    unselected streams skipped, unselected non-key columns dropped —
    sync.go:191-235).  Streams run concurrently up to
    ``max_concurrent_streams``; each stream's FULL_TABLE/INCREMENTAL mode
    comes from its catalog metadata (sync.go:68-83)."""
    selected = catalog.filter_selected()

    def run(stream) -> tuple[str, RunMetrics]:
        payload_cols = [
            c for c in stream.selected_columns() if c not in stream.key_properties
        ]
        cfg = layout.config_for(
            stream.name,
            key_cols=tuple(stream.key_properties),
            replication_method=stream.replication_method,
            selected_columns=payload_cols,
        )
        return stream.name, CDCPipeline(spark, cfg).replay()

    with ThreadPoolExecutor(max_workers=max_concurrent_streams) as ex:
        return dict(ex.map(run, selected.streams))


def bootstrap_from_snapshot(
    pipeline: CDCPipeline, snapshot: DataFrame, ts_col: str = "ts"
) -> None:
    """Initial full copy: every snapshot row becomes an INSERT at sequence 0
    (so ANY later change wins the LWW guard), applied through the normal
    merge path — then incremental replay takes over from the change log.
    Mirrors VStream's copy-then-stream phase with `LastKnownPk` resume: to
    resume a partial bootstrap, pass ``pipeline.cfg.last_pk`` and filter the
    snapshot with :meth:`CDCPipeline.pk_resume_filter`."""
    cfg = pipeline.cfg
    snap = snapshot
    if cfg.last_pk:
        snap = CDCPipeline.pk_resume_filter(snap, cfg.key_cols, cfg.last_pk)
    batch = (
        snap.withColumn("shard", F.lit("-"))
        .withColumn("offset", F.lit(-1).cast("long"))
        .withColumn("seq", F.lit(-1).cast("long"))
        .withColumn("op", F.lit("INSERT"))
    )
    if ts_col != "ts":
        batch = batch.withColumn("ts", F.col(ts_col))
    pipeline.apply_batch(batch, batch_id=-1)
