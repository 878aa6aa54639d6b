"""Resume, projection, stale-log and PK-resume scenarios (FIXTURES.md §7.5/6;
operators O8/O9/O10/O11)."""

import pytest
from pyspark.sql import functions as F

from singer_tap_spark import CDCPipeline, PipelineConfig
from singer_tap_spark.changelog import generate_changelog, write_changelog
from singer_tap_spark.lineage import Lineage, StaleCheckpointError
from tests.conftest import assert_frames_equal, duck, lww_oracle_sql

KEYS = ["conv_id", "turn_idx"]


def _cfg(base, **kw):
    return PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
        **kw,
    )


def test_stop_and_resume_equals_single_run(spark, tmp_path):
    base = str(tmp_path)
    df = generate_changelog(spark, 10000, delete_frac=0.1, update_frac=0.4)
    write_changelog(df.where("seq < 6000"), f"{base}/log")
    cfg = _cfg(base)
    CDCPipeline(spark, cfg).replay()  # session 1, then 'stop'

    # more events land in the log; a NEW pipeline resumes from lineage
    df.where("seq >= 6000").repartition(2).write.mode("append").partitionBy(
        "shard"
    ).parquet(f"{base}/log")
    p2 = CDCPipeline(spark, cfg)
    m = p2.replay()
    assert 0 < m.total_events <= 4000  # only the new tail was processed

    got = p2.lake.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts").toPandas()
    want = duck(lww_oracle_sql(f"{base}/log/*/*.parquet"))
    assert_frames_equal(got, want, KEYS)


def test_stale_lineage_raises(spark, tmp_path):
    """Lineage far behind the retained log -> StaleCheckpointError, the
    purged-binlogs analogue (planetscale_edge_database.go:117-126)."""
    base = str(tmp_path)
    df = generate_changelog(spark, 5000)
    write_changelog(df.where("offset >= 3000"), f"{base}/log")  # head purged
    cfg = _cfg(base)
    lin = Lineage.empty("transcripts", [])
    lin.advance("transcripts", {"shard-0": 100}, 0, "old")  # way behind 3000
    lin.save(cfg.lineage_path)
    with pytest.raises(StaleCheckpointError):
        CDCPipeline(spark, cfg).replay()


def test_column_projection_selected_only(spark, tmp_path):
    """Unselected payload columns never reach the target; keys + engine
    columns always ride along (O10/O11)."""
    base = str(tmp_path)
    write_changelog(generate_changelog(spark, 3000), f"{base}/log")
    cfg = _cfg(base, selected_columns=["text"])  # drop role/tool
    p = CDCPipeline(spark, cfg)
    p.replay()
    cols = set(p.lake.read().columns)
    assert "text" in cols and "conv_id" in cols and "turn_idx" in cols
    assert "role" not in cols and "tool" not in cols


def test_pk_resume_filter(spark, tmp_path):
    """Mid-table snapshot resume: rows with PK <= last_pk skipped (O8)."""
    base = str(tmp_path)
    write_changelog(generate_changelog(spark, 4000, update_frac=0, delete_frac=0),
                    f"{base}/log")
    last_pk = {"conv_id": "conv-00000050", "turn_idx": 10}
    cfg = _cfg(base, last_pk=last_pk)
    p = CDCPipeline(spark, cfg)
    p.replay()
    final = p.lake.read()
    below = final.where(
        (F.col("conv_id") < last_pk["conv_id"])
        | ((F.col("conv_id") == last_pk["conv_id"]) & (F.col("turn_idx") <= 10))
    )
    assert below.count() == 0
    assert final.count() > 0
