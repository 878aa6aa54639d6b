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
    keyless = [s.name for s in selected.streams if not s.key_properties]
    if keyless:
        # a key-less stream makes the keyed merge sink meaningless — refuse
        # loudly instead of silently emitting an unmergeable table
        raise ValueError(
            f"selected streams have no key_properties: {keyless}; supply keys "
            "via discover(key_properties=...), parquet footer metadata, or a "
            "_keys.json sidecar"
        )

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


_SNAPSHOT_SHARD = "-"


def _pk_boundaries(
    snap: DataFrame, key_cols: tuple[str, ...], n_chunks: int
) -> list[dict]:
    """Approximate PK-tuple quantile boundaries for chunking, from a
    driver-side sorted sample (~200 pks per chunk — metadata-sized).  Works
    for ANY orderable key type (strings included), unlike approxQuantile.
    Boundary imbalance only skews chunk sizes, never correctness: chunks
    are contiguous PK ranges either way."""
    total = snap.count()
    if total == 0:
        return []
    frac = min(1.0, (n_chunks * 200.0) / total)
    pks = (
        snap.select(*key_cols).sample(fraction=frac, seed=7)
        .collect()
    )
    pks.sort(key=lambda r: tuple(r))
    out: list[dict] = []
    for i in range(1, n_chunks):
        b = pks[min(len(pks) - 1, i * len(pks) // n_chunks)]
        d = b.asDict()
        if not out or out[-1] != d:
            out.append(d)
    return out


def bootstrap_from_snapshot(
    pipeline: CDCPipeline,
    snapshot: DataFrame,
    ts_col: str = "ts",
    n_chunks: int = 1,
) -> None:
    """Initial full copy: every snapshot row becomes an INSERT at sequence
    -1 (so ANY later change wins the LWW guard), applied through the normal
    merge path — then incremental replay takes over from the change log.

    Mirrors VStream's copy-then-stream phase WITH `LastKnownPk` mid-table
    resume (planetscale_edge_database.go:175-186, :244-252; types.go:
    471-484): with ``n_chunks > 1`` the snapshot is applied in contiguous
    PK-range chunks and the chunk's upper PK bound is persisted as the
    snapshot cursor's ``last_pk`` after each chunk commits (flush-before-
    state, same as the change path).  A crashed bootstrap therefore resumes
    after the last COMPLETED chunk instead of re-copying the table; a chunk
    replayed across the crash boundary ties on (ts, seq=-1) and is absorbed
    by the merge guard.  Explicit ``pipeline.cfg.last_pk`` overrides the
    persisted cursor."""
    from singer_tap_spark.lineage import Lineage, ShardCursor

    cfg = pipeline.cfg

    # resume point: explicit config > persisted snapshot cursor
    last_pk = cfg.last_pk
    if last_pk is None:
        saved = Lineage.load(cfg.lineage_path)
        if saved is not None:
            cur = saved.streams.get(cfg.stream_name, {}).get(_SNAPSHOT_SHARD)
            if cur is not None and cur.last_pk:
                last_pk = cur.last_pk
    snap = snapshot
    if last_pk:
        snap = CDCPipeline.pk_resume_filter(snap, cfg.key_cols, last_pk)

    def _to_batch(df: DataFrame) -> DataFrame:
        b = (
            df.withColumn("shard", F.lit(_SNAPSHOT_SHARD))
            .withColumn("offset", F.lit(-1).cast("long"))
            .withColumn("seq", F.lit(-1).cast("long"))
            .withColumn("op", F.lit("INSERT"))
        )
        if ts_col != "ts":
            b = b.withColumn("ts", F.col(ts_col))
        return b

    def _persist_last_pk(pk: dict) -> None:
        lin = Lineage.load(cfg.lineage_path) or Lineage.empty(
            cfg.stream_name, [_SNAPSHOT_SHARD]
        )
        shards = lin.streams.setdefault(cfg.stream_name, {})
        cur = shards.setdefault(_SNAPSHOT_SHARD, ShardCursor())
        cur.last_pk = pk
        lin.save(cfg.lineage_path)

    if n_chunks <= 1:
        pipeline.apply_batch(_to_batch(snap), batch_id=-1)
        return

    bounds = _pk_boundaries(snap, cfg.key_cols, n_chunks)
    lhs = F.struct(*[F.col(c) for c in cfg.key_cols])

    def _lit_pk(pk: dict) -> F.Column:
        return F.struct(*[F.lit(pk[c]).alias(c) for c in cfg.key_cols])

    prev: dict | None = None
    for b in [*bounds, None]:
        pred = None
        if prev is not None:
            pred = lhs > _lit_pk(prev)
        if b is not None:
            upper = lhs <= _lit_pk(b)
            pred = upper if pred is None else (pred & upper)
        chunk = snap if pred is None else snap.where(pred)
        pipeline.apply_batch(_to_batch(chunk), batch_id=-1)
        if b is not None:  # flush-before-state: chunk committed, now cursor
            _persist_last_pk(b)
        prev = b
