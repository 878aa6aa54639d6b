"""`cdc_archive_tail` Python DataSource (singer_tap_spark/pysource.py):
the generic non-file `source_format` path actually executing — offset
protocol, checkpoint resume, both envelopes, schema folding, and
equivalence with the built-in file source over the same bytes."""

import os

import pytest

from singer_tap_spark import CDCPipeline, PipelineConfig
from singer_tap_spark.changelog import generate_changelog
from singer_tap_spark.pysource import (
    ArchiveStreamReader,
    _list_segments,
    write_archive,
)
from tests.conftest import assert_frames_equal, duck, lww_oracle_sql

KEYS = ["conv_id", "turn_idx"]
SEL = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _cfg(base, **kw):
    return PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
        checkpoint_dir=f"{base}/ckpt",
        source_format="cdc_archive_tail",
        **kw,
    )


def _flat_oracle(base):
    return duck(
        lww_oracle_sql("__never__").replace(
            "read_parquet('__never__', hive_partitioning=1)",
            f"read_parquet('{base}/log/seg-*.parquet')",
        )
    )


def test_archive_tail_matches_oracle_and_resumes(spark, tmp_path):
    """AvailableNow drains the archive through the Python source; a second
    session picks up ONLY appended segments from the checkpoint (the
    GTID-cursor restart over a cold-storage binlog archive)."""
    base = str(tmp_path)
    df = generate_changelog(
        spark, 6000, delete_frac=0.1, update_frac=0.4, dup_frac=0.03
    )
    write_archive(df.where("seq < 4000"), f"{base}/log", max_records_per_file=1500)

    cfg = _cfg(base, source_options={"rowsPerTask": "1000"})
    m = CDCPipeline(spark, cfg).run_streaming(available_now=True)
    assert m.total_events > 0

    write_archive(df.where("seq >= 4000"), f"{base}/log", max_records_per_file=1500)
    p2 = CDCPipeline(spark, cfg)
    m2 = p2.run_streaming(available_now=True)
    # second session saw only the appended ~2060 events, not a re-read
    assert 0 < m2.total_events < 3000

    got = p2.lake.read().select(*SEL).toPandas()
    assert_frames_equal(got, _flat_oracle(base), KEYS)


def test_archive_tail_value_envelope_decodes(spark, tmp_path):
    """envelope=value re-serializes events as JSON lines in a `value`
    column (the Kafka wire shape) and must route through the engine's
    from_json decode to the identical final table."""
    base = str(tmp_path)
    df = generate_changelog(spark, 3000, delete_frac=0.08, update_frac=0.3)
    write_archive(df, f"{base}/log", max_records_per_file=1000)

    cfg = _cfg(base, source_options={"envelope": "value"})
    p = CDCPipeline(spark, cfg)
    m = p.run_streaming(available_now=True)
    assert m.total_events == 3000
    got = p.lake.read().select(*SEL).toPandas()
    assert_frames_equal(got, _flat_oracle(base), KEYS)


def test_archive_tail_equals_file_source_same_bytes(spark, tmp_path):
    """The flat segment layout doubles as a plain parquet dir: the Python
    source and the built-in file source over the SAME files must land the
    identical final table (the pluggable-source contract)."""
    base = str(tmp_path)
    df = generate_changelog(spark, 4000, delete_frac=0.1, update_frac=0.4)
    write_archive(df, f"{base}/log", max_records_per_file=1200)

    pa_ = CDCPipeline(spark, _cfg(base)).run_streaming(available_now=True)

    cfg_file = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt_file",
        lineage_path=f"{base}/lineage_file.json",
        checkpoint_dir=f"{base}/ckpt_file",
        source_format="parquet",
    )
    pb = CDCPipeline(spark, cfg_file)
    mb = pb.run_streaming(available_now=True)
    assert pa_.total_events == mb.total_events == 4000

    a = CDCPipeline(spark, _cfg(base)).lake.read().select(*SEL).toPandas()
    b = pb.lake.read().select(*SEL).toPandas()
    assert_frames_equal(a, b, KEYS)


def test_archive_tail_folds_evolved_segments(spark, tmp_path):
    """Older segments written before a column add conform to the folded
    schema (null-filled) — the self-describing-archive analogue of the
    pipeline's footer folding."""
    base = str(tmp_path)
    df = generate_changelog(spark, 3000, schema_evolution_at=1500)
    write_archive(df.where("seq < 1500").drop("model"), f"{base}/log")
    write_archive(df.where("seq >= 1500"), f"{base}/log")

    cfg = _cfg(base)
    p = CDCPipeline(spark, cfg)
    m = p.run_streaming(available_now=True)
    assert m.total_events == 3000
    tgt = p.lake.read()
    assert "model" in tgt.columns
    # rows whose LWW winner predates the evolution have NULL model
    assert tgt.where("model is not null").count() > 0


def test_archive_tail_pacing_caps_batches_in_session(spark, tmp_path):
    """maxEventsPerBatch paces batch N+1 once batch N commits (the bounded
    sync-session analogue); the first batch of a session is uncapped by
    contract."""
    reader = ArchiveStreamReader.__new__(ArchiveStreamReader)
    reader.path = str(tmp_path / "log")
    reader.per_batch = 100
    reader.envelope = "typed"
    reader.rows_per_task = 10_000
    reader.arrow_schema = None
    reader._committed = None

    base = str(tmp_path)
    df = generate_changelog(spark, 500)
    write_archive(df, f"{base}/log", max_records_per_file=200)

    first = reader.latestOffset()  # uncapped: absolute end
    segs = _list_segments(f"{base}/log")
    assert first["file"] == segs[-1]
    reader.commit(reader.initialOffset())
    paced = reader.latestOffset()
    # expected: exactly 100 rows past offset zero in segment order
    from singer_tap_spark.pysource import _num_rows

    budget, want = 100, None
    for s in segs:
        n = _num_rows(s)
        take = min(n, budget)
        if take:
            want = {"file": s, "row": take}
        budget -= take
        if budget <= 0:
            break
    assert paced == want


def test_archive_tail_replay_is_deterministic(spark, tmp_path):
    """partitions(start, end) is a pure function of (listing, offsets):
    re-planning the same offset range yields identical slices — the WAL
    replay contract."""
    base = str(tmp_path)
    df = generate_changelog(spark, 1000)
    write_archive(df, f"{base}/log", max_records_per_file=300)

    reader = ArchiveStreamReader.__new__(ArchiveStreamReader)
    reader.path = f"{base}/log"
    reader.per_batch = 0
    reader.envelope = "typed"
    reader.rows_per_task = 250
    reader.arrow_schema = None
    reader._committed = None
    start = reader.initialOffset()
    end = reader.latestOffset()
    p1 = [(s.path, s.start, s.end) for s in reader.partitions(start, end)]
    p2 = [(s.path, s.start, s.end) for s in reader.partitions(start, end)]
    assert p1 == p2
    assert sum(e - s for _, s, e in p1) == 1000
    assert all(e - s <= 250 for _, s, e in p1)


def test_archive_tail_rejects_bad_options(spark, tmp_path):
    with pytest.raises(ValueError, match="envelope"):
        ArchiveStreamReader(
            {"path": str(tmp_path), "envelope": "protobuf"}, None
        )
    with pytest.raises(ValueError, match="path"):
        ArchiveStreamReader({}, None)


def test_write_archive_names_are_append_monotonic(spark, tmp_path):
    base = str(tmp_path)
    df = generate_changelog(spark, 300)
    write_archive(df.where("seq < 150"), f"{base}/log")
    first = [os.path.basename(f) for f in _list_segments(f"{base}/log")]
    write_archive(df.where("seq >= 150"), f"{base}/log")
    both = [os.path.basename(f) for f in _list_segments(f"{base}/log")]
    appended = [n for n in both if n not in first]
    assert appended and min(appended) > max(first)  # lexicographic commit order
    assert both == sorted(both)


def test_fold_arrow_matches_evolve_schema():
    """pysource._fold_arrow is evolve.evolve_schema restated at the Arrow
    level (so the source stays import-free in Spark's Python workers) —
    pin the two folds equal across add-column and every widen direction."""
    import pyarrow as pa

    from pyspark.sql.pandas.types import from_arrow_schema, to_arrow_schema

    from singer_tap_spark.evolve import evolve_schema
    from singer_tap_spark.pysource import _fold_arrow

    cases = [
        # add column
        (
            pa.schema([("a", pa.int64()), ("b", pa.string())]),
            pa.schema([("a", pa.int64()), ("b", pa.string()), ("c", pa.float64())]),
        ),
        # int widen both directions
        (pa.schema([("a", pa.int32())]), pa.schema([("a", pa.int64())])),
        (pa.schema([("a", pa.int64())]), pa.schema([("a", pa.int8())])),
        # float widen + int->float
        (pa.schema([("a", pa.float32())]), pa.schema([("a", pa.float64())])),
        (pa.schema([("a", pa.int32())]), pa.schema([("a", pa.float64())])),
        (pa.schema([("a", pa.float32())]), pa.schema([("a", pa.int64())])),
        # identical
        (pa.schema([("a", pa.string())]), pa.schema([("a", pa.string())])),
    ]
    for cur, inc in cases:
        got = _fold_arrow(cur, inc)
        want = to_arrow_schema(
            evolve_schema(from_arrow_schema(cur), from_arrow_schema(inc))[0]
        )
        assert [(f.name, f.type) for f in got] == [
            (f.name, f.type) for f in want
        ], (cur, inc)

    with pytest.raises(ValueError, match="incompatible"):
        _fold_arrow(
            pa.schema([("a", pa.string())]), pa.schema([("a", pa.int64())])
        )


def test_slice_read_is_row_group_selective():
    """The per-slice read must fetch only the row groups overlapping
    [start, end) — S slices of one segment previously re-read and decoded
    the WHOLE file S times.  Pin: every slice across group boundaries
    yields exactly the naive slice's rows, and a slice's read touches
    only its overlapping groups (observed via ParquetFile instrumentation)."""
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from singer_tap_spark.pysource import ArchiveStreamReader, _Slice

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "seg.parquet")
        tbl = pa.table({"i": list(range(100)), "s": [f"v{i}" for i in range(100)]})
        pq.write_table(tbl, path, row_group_size=30)  # groups: 30/30/30/10

        reader = ArchiveStreamReader.__new__(ArchiveStreamReader)  # read() only
        touched = []
        orig = pq.ParquetFile.read_row_groups

        def spy(self, groups, **kw):
            touched.append(list(groups))
            return orig(self, groups, **kw)

        pq.ParquetFile.read_row_groups = spy
        try:
            for start, end, want_groups in [
                (0, 100, [0, 1, 2, 3]),   # whole file
                (0, 30, [0]),             # exactly one group
                (30, 60, [1]),            # aligned interior group
                (25, 35, [0, 1]),         # boundary straddle
                (95, 100, [3]),           # tail remainder
                (59, 61, [1, 2]),         # two-group straddle
            ]:
                touched.clear()
                sl = _Slice(path, start, end, "typed", tbl.schema)
                got = pa.Table.from_batches(
                    list(reader.read(sl)), schema=tbl.schema
                )
                assert got.equals(tbl.slice(start, end - start)), (start, end)
                assert touched == [want_groups], (start, end, touched)
        finally:
            pq.ParquetFile.read_row_groups = orig
