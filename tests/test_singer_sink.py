"""Singer-message sink round trip: RECORD lines out (O14), parsed back in
(O20), SCHEMA sidecar, flush-before-STATE file."""

import json
import os

from singer_tap_spark.catalog import Stream
from singer_tap_spark.changelog import CHANGE_SCHEMA, generate_changelog
from singer_tap_spark.decode import decode_json_changes
from singer_tap_spark.singer_sink import read_records, write_records

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_singer_roundtrip(spark, tmp_path):
    base = str(tmp_path / "tap")
    events = generate_changelog(spark, 800, delete_frac=0.1)
    stream = Stream(
        name="transcript_changes",
        schema=CHANGE_SCHEMA,
        key_properties=["conv_id", "turn_idx"],
        selected=True,
    )
    state = {"streams": {"transcript_changes": {"shards": {"shard-0": {"offset": 799}}}}}
    write_records(events, base, stream, state=state)

    # RECORD lines parse back to the identical DataFrame
    raw = read_records(spark, base)
    payload = raw.select(
        F.from_json("value", T.StructType([
            T.StructField("type", T.StringType()),
            T.StructField("stream", T.StringType()),
            T.StructField("record", CHANGE_SCHEMA),
        ])).alias("m")
    )
    assert payload.where("m.type <> 'RECORD'").count() == 0
    back = payload.select("m.record.*")
    assert back.exceptAll(events).count() == 0
    assert events.exceptAll(back).count() == 0

    # SCHEMA sidecar carries key properties and the JSON-Schema unions
    with open(f"{base}/schema.json") as f:
        doc = json.load(f)
    assert doc["type"] == "SCHEMA"
    assert doc["key_properties"] == ["conv_id", "turn_idx"]
    assert doc["schema"]["properties"]["conv_id"]["type"] == ["null", "string"]

    # STATE written as wrapped form, loadable by our lineage parser
    state_files = os.listdir(f"{base}/state")
    assert len(state_files) == 1
    from singer_tap_spark.lineage import Lineage

    lin = Lineage.load(f"{base}/state/{state_files[0]}")
    assert lin.streams["transcript_changes"]["shard-0"].offset == 799
