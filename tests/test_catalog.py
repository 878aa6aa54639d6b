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
