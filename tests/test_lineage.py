"""Lineage/state: save/load (both Singer STATE forms), merge semantics,
staleness — operators O18/O19/O9 and sync_test.go state-machine cases."""

import json

import pytest

from singer_tap_spark.lineage import Lineage, ShardCursor, StaleCheckpointError


def test_save_load_roundtrip(tmp_path):
    lin = Lineage.empty("transcripts", ["shard-0", "shard-1"])
    lin.advance("transcripts", {"shard-0": 42}, batch_id=3, snapshot_id="snap-3")
    path = str(tmp_path / "state.json")
    lin.save(path)
    back = Lineage.load(path)
    assert back.streams["transcripts"]["shard-0"].offset == 42
    assert back.streams["transcripts"]["shard-0"].batch_id == 3
    assert back.streams["transcripts"]["shard-1"].offset == -1


def test_load_wrapped_state_form(tmp_path):
    """Accept {"type":"STATE","value":...} wrapping (parser.go:20-43)."""
    doc = {
        "type": "STATE",
        "value": {"streams": {"t": {"shards": {"-": {"offset": 7}}}}},
    }
    path = str(tmp_path / "wrapped.json")
    path_w = str(tmp_path / "wrapped.json")
    with open(path_w, "w") as f:
        json.dump(doc, f)
    back = Lineage.load(path)
    assert back.streams["t"]["-"].offset == 7


def test_load_missing_returns_none(tmp_path):
    assert Lineage.load(str(tmp_path / "nope.json")) is None


def test_merge_saved_over_empty():
    """Known shards keep bookmarks, new shards start empty, saved-but-
    unknown streams retained (sync.go:41-58, sync_test.go:284-350)."""
    empty = Lineage.empty("t", ["s0", "s1", "s2"])
    saved = Lineage({"t": {"s0": ShardCursor(offset=99)},
                     "old_stream": {"-": ShardCursor(offset=5)}})
    merged = empty.merged_with_saved(saved)
    assert merged.streams["t"]["s0"].offset == 99
    assert merged.streams["t"]["s1"].offset == -1
    assert merged.streams["old_stream"]["-"].offset == 5


def test_stale_detection():
    """Saved offset behind retained log -> hard error, not silent re-sync
    (planetscale_edge_database.go:117-126)."""
    lin = Lineage({"t": {"s0": ShardCursor(offset=10)}})
    lin.check_not_stale("t", {"s0": 11})  # contiguous: ok
    lin.check_not_stale("t", {"s0": 5})   # log retains older: ok
    with pytest.raises(StaleCheckpointError):
        lin.check_not_stale("t", {"s0": 50})  # offsets 11..48 purged


def test_fresh_cursor_never_stale():
    lin = Lineage.empty("t", ["s0"])
    lin.check_not_stale("t", {"s0": 1000})  # offset -1 = full sync from start
