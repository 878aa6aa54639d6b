"""Discovery + selection semantics — operators O1-O5, O10, O11
(discover_test.go / sync_test.go selection cases)."""

from pyspark.sql import types as T

from singer_tap_spark.catalog import Catalog, Stream, discover

SF = "/root/testdata/sf0.001"


def test_discover_testdata(spark):
    cat = discover(spark, SF, key_properties={"events": ["event_id"]})
    names = {s.name for s in cat.streams}
    assert {"events", "lineitem", "orders", "documents", "embeddings"} <= names
    ev = next(s for s in cat.streams if s.name == "events")
    assert ev.key_properties == ["event_id"]
    assert not ev.selected  # discovery never auto-selects


def test_discover_excluded(spark):
    cat = discover(spark, SF, excluded={"events"})
    assert "events" not in {s.name for s in cat.streams}


def test_selected_streams_only(spark):
    """Only selected tables sync (sync_test.go:11-53)."""
    cat = discover(spark, SF)
    for s in cat.streams:
        s.selected = s.name == "events"
    filtered = cat.filter_selected()
    assert [s.name for s in filtered.streams] == ["events"]


def test_keys_always_included(spark):
    """Key columns cannot be deselected (types.go:274-281, sync.go:205-222)."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("tool", T.StringType()),
        ]
    )
    s = Stream(
        name="transcripts",
        schema=schema,
        key_properties=["conv_id", "turn_idx"],
        selected=True,
        column_selection={"conv_id": False, "turn_idx": False, "text": True, "tool": False},
    )
    assert s.selected_columns() == ["conv_id", "turn_idx", "text"]


def test_catalog_roundtrip(spark, tmp_path):
    cat = discover(spark, SF, key_properties={"events": ["event_id"]})
    for s in cat.streams:
        if s.name == "events":
            s.selected = True
            s.column_selection = {"props": False}
    path = str(tmp_path / "catalog.json")
    cat.save(path)
    back = Catalog.load(path)
    ev = next(s for s in back.streams if s.name == "events")
    assert ev.selected and ev.key_properties == ["event_id"]
    assert ev.column_selection.get("props") is False
    assert "props" not in ev.selected_columns()
    assert ev.schema == next(s for s in cat.streams if s.name == "events").schema


def test_jsonschema_type_mapping(spark):
    """§1.2 type table: timestamp -> date-time string, ints -> integer."""
    cat = discover(spark, SF, key_properties={"events": ["event_id"]})
    ev = next(s for s in cat.streams if s.name == "events")
    props = ev.properties()
    assert props["ts"].custom_format == "date-time"
    assert "integer" in props["event_id"].types
    assert "number" in props["value"].types
    assert "string" in props["event_type"].types
    assert all("null" in p.types for p in props.values())  # ["null", T] unions


# -- PK auto-discovery (discover.go:36-44 / planetscale_edge_mysql.go:169-195)

def _write_keyed_parquet(path, keys):
    """Parquet file whose footer key-value metadata names its PKs — the
    information_schema analogue a lake writer embeds."""
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table({"conv_id": [1, 2], "turn_idx": [0, 0], "text": ["a", "b"]})
    tbl = tbl.replace_schema_metadata(
        {b"key_properties": _json.dumps(keys).encode()}
    )
    pq.write_table(tbl, path)


def test_discover_infers_keys_from_footer_metadata(spark, tmp_path):
    root = str(tmp_path)
    _write_keyed_parquet(f"{root}/keyed.parquet", ["conv_id", "turn_idx"])
    cat = discover(spark, root)  # NO key_properties argument
    s = {x.name: x for x in cat.streams}["keyed"]
    assert s.key_properties == ["conv_id", "turn_idx"]


def test_discover_infers_keys_from_sidecar(spark, tmp_path):
    import json as _json

    root = str(tmp_path)
    spark.range(5).selectExpr("id AS event_id", "id * 2 AS v").write.parquet(
        f"{root}/plain.parquet"
    )
    with open(f"{root}/_keys.json", "w") as f:
        _json.dump({"plain": ["event_id"]}, f)
    cat = discover(spark, root)
    s = {x.name: x for x in cat.streams}["plain"]
    assert s.key_properties == ["event_id"]
    # explicit config still wins over inference
    cat2 = discover(spark, root, key_properties={"plain": ["v"]})
    assert {x.name: x for x in cat2.streams}["plain"].key_properties == ["v"]


def test_sync_all_refuses_keyless_selected_stream(spark, tmp_path):
    import pytest as _pytest

    from singer_tap_spark.sync import SyncLayout, sync_all

    root = str(tmp_path)
    spark.range(5).selectExpr("id AS a").write.parquet(f"{root}/nokeys.parquet")
    cat = discover(spark, root)
    for s in cat.streams:
        s.selected = True
    layout = SyncLayout(f"{root}", f"{root}/tgt", f"{root}/state")
    with _pytest.raises(ValueError, match="no key_properties"):
        sync_all(spark, cat, layout)
