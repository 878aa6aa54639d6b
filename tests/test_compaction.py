"""Lake maintenance: multi-merge file accumulation + compaction rewrite
(content-preserving, per-bucket)."""

import os

from singer_tap_spark import CDCPipeline, PipelineConfig
from singer_tap_spark.changelog import generate_changelog, write_changelog
from tests.conftest import assert_frames_equal, duck, lww_oracle_sql


def _count_files(root):
    return sum(
        len([f for f in files if f.endswith(".parquet")])
        for _, _, files in os.walk(root)
    )


def test_compact_preserves_content_and_reduces_files(spark, tmp_path):
    base = str(tmp_path)
    write_changelog(generate_changelog(spark, 9000, update_frac=0.4, delete_frac=0.1),
                    f"{base}/log")
    cfg = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
        n_buckets=8,
    )
    p = CDCPipeline(spark, cfg)
    p.replay(n_batches=6)  # several merges -> several file sets per bucket
    before_files = _count_files(f"{base}/tgt/data")
    before = p.lake.read().toPandas()

    after_files = p.lake.compact()
    after = p.lake.read().toPandas()
    # copy-on-write merges already rewrite whole buckets (one file set per
    # bucket), so compaction cannot grow the count; it becomes a real
    # reducer for a merge-on-read variant / multi-file writes
    assert after_files <= before_files
    assert_frames_equal(after, before, ["conv_id", "turn_idx"])
    # content still equals the oracle
    got = p.lake.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts").toPandas()
    want = duck(lww_oracle_sql(f"{base}/log/*/*.parquet"))
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])
