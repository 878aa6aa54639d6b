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


def test_jsonl_changelog_replay_matches_parquet(spark, tmp_path):
    """Full wire-format loop: engine events -> Singer RECORD lines
    (singer_sink) -> jsonl pipeline replay == parquet pipeline replay."""
    import singer_tap_spark as sts
    from singer_tap_spark.changelog import generate_changelog, write_changelog
    from singer_tap_spark.singer_sink import write_records
    from tests.conftest import assert_frames_equal

    base = str(tmp_path)
    events = generate_changelog(spark, 5000, update_frac=0.4, delete_frac=0.1)
    write_changelog(events, f"{base}/plog")
    stream = Stream(name="transcript_changes", schema=CHANGE_SCHEMA,
                    key_properties=["conv_id", "turn_idx"], selected=True)
    write_records(events, f"{base}/tap", stream)

    p_parq = sts.CDCPipeline(spark, sts.PipelineConfig(
        changelog_path=f"{base}/plog", target_path=f"{base}/t1",
        lineage_path=f"{base}/l1.json"))
    p_parq.replay()

    p_json = sts.CDCPipeline(spark, sts.PipelineConfig(
        changelog_path=f"{base}/tap/records", target_path=f"{base}/t2",
        lineage_path=f"{base}/l2.json", changelog_format="jsonl"))
    m = p_json.replay()
    assert m.total_events == 5000

    a = p_parq.lake.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts").toPandas()
    b = p_json.lake.read().select("conv_id", "turn_idx", "role", "text", "tool", "ts").toPandas()
    assert_frames_equal(b, a, ["conv_id", "turn_idx"])


def test_jsonl_streaming_and_resume(spark, tmp_path):
    """jsonl path under Structured Streaming + incremental batch resume."""
    import singer_tap_spark as sts
    from singer_tap_spark.changelog import generate_changelog
    from singer_tap_spark.singer_sink import write_records
    from tests.conftest import assert_frames_equal, duck

    base = str(tmp_path)
    events = generate_changelog(spark, 6000, update_frac=0.3, delete_frac=0.1)
    stream = Stream(name="t", schema=CHANGE_SCHEMA,
                    key_properties=["conv_id", "turn_idx"], selected=True)
    write_records(events.where("seq < 3000"), f"{base}/tap", stream)
    cfg = sts.PipelineConfig(
        changelog_path=f"{base}/tap/records", target_path=f"{base}/tgt",
        lineage_path=f"{base}/l.json", checkpoint_dir=f"{base}/ck",
        changelog_format="jsonl")
    sts.CDCPipeline(spark, cfg).run_streaming(available_now=True)

    # more RECORD lines land; batch replay resumes from lineage
    record = F.to_json(F.struct(
        F.lit("RECORD").alias("type"), F.lit("t").alias("stream"),
        F.struct(*[F.col(c) for c in events.columns]).alias("record")))
    events.where("seq >= 3000").select(record.alias("value")) \
        .write.mode("append").text(f"{base}/tap/records")
    p2 = sts.CDCPipeline(spark, cfg)
    m = p2.replay()
    assert 0 < m.total_events <= 3000

    got = p2.lake.read().select("conv_id", "turn_idx", "text").toPandas()
    want = duck(f"""
        WITH src AS (SELECT j.* FROM (
          SELECT from_json(json_extract(line, '$.record'),
            '{{"shard":"VARCHAR","offset":"BIGINT","seq":"BIGINT","op":"VARCHAR",
              "ts":"TIMESTAMP","conv_id":"VARCHAR","turn_idx":"INTEGER",
              "role":"VARCHAR","text":"VARCHAR","tool":"VARCHAR",
              "schema_version":"INTEGER"}}') AS j
          FROM read_csv('{base}/tap/records/*.txt', columns={{'line':'VARCHAR'}},
                        delim=chr(1), header=false, quote='')
        )),
        ranked AS (SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) rn FROM src)
        SELECT conv_id, turn_idx, text FROM ranked WHERE rn = 1 AND op <> 'DELETE'
    """)
    assert_frames_equal(got, want, ["conv_id", "turn_idx"])


def test_jsonl_schema_from_schema_messages(spark, tmp_path):
    """Self-describing wire (VERDICT r1 missing #4): the pipeline derives
    its read schema from the log's own SCHEMA lines — including a
    mid-stream SCHEMA that adds a column (http-tap re-latch semantics) —
    with jsonl_schema='from_schema_messages' and no config schema."""
    import duckdb
    import pandas as pd

    from singer_tap_spark import CDCPipeline, PipelineConfig
    from singer_tap_spark.changelog import generate_changelog

    base = str(tmp_path)
    ev = generate_changelog(spark, 3000, delete_frac=0.1, update_frac=0.4)
    v1 = ev.where("seq < 2000")
    v2 = ev.where("seq >= 2000").withColumn(
        "model", F.concat(F.lit("model-"), (F.col("seq") % 3).cast("string"))
    )

    def props(extra=()):
        p = {
            "shard": {"type": ["null", "string"]},
            "offset": {"type": ["null", "integer"]},
            "seq": {"type": ["null", "integer"]},
            "op": {"type": ["null", "string"]},
            "ts": {"type": ["null", "string"], "format": "date-time"},
            "conv_id": {"type": ["null", "string"]},
            "turn_idx": {"type": ["null", "integer"]},
            "role": {"type": ["null", "string"]},
            "text": {"type": ["null", "string"]},
            "tool": {"type": ["null", "string"]},
            "schema_version": {"type": ["null", "integer"]},
        }
        for name in extra:
            p[name] = {"type": ["null", "string"]}
        return p

    def schema_line(extra=()):
        return json.dumps({
            "type": "SCHEMA", "stream": "transcripts",
            "schema": {"type": ["null", "object"], "properties": props(extra)},
        })

    def record_lines(df):
        env = F.to_json(F.struct(
            F.lit("RECORD").alias("type"),
            F.lit("transcripts").alias("stream"),
            F.struct(*df.columns).alias("record"),
        ))
        return [r[0] for r in df.select(env).collect()]

    os.makedirs(f"{base}/log")
    with open(f"{base}/log/part-0.jsonl", "w") as f:
        f.write("\n".join([schema_line()] + record_lines(v1)) + "\n")
    with open(f"{base}/log/part-1.jsonl", "w") as f:
        f.write("\n".join([schema_line(("model",))] + record_lines(v2)) + "\n")

    cfg = PipelineConfig(
        changelog_path=f"{base}/log",
        target_path=f"{base}/tgt",
        lineage_path=f"{base}/lineage.json",
        changelog_format="jsonl",
        jsonl_schema="from_schema_messages",
    )
    p = CDCPipeline(spark, cfg)
    p.replay()
    got = p.lake.read().select(
        "conv_id", "turn_idx", "role", "text", "tool", "model"
    ).toPandas()
    assert "model" in got.columns  # the evolved column folded in

    ev.join(v2.select("seq", "model"), "seq", "left").write.parquet(
        f"{base}/oracle_src"
    )
    want = duckdb.sql(f"""
        WITH dedup AS (
          SELECT DISTINCT * FROM read_parquet('{base}/oracle_src/*.parquet')
        ), ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) rn
          FROM dedup
        )
        SELECT conv_id, turn_idx, role, text, tool, model
        FROM ranked WHERE rn = 1 AND op <> 'DELETE'
    """).df()
    keys = ["conv_id", "turn_idx"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want[got.columns.tolist()].sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
