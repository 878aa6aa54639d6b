"""Singer-message JSON-lines sink — operator O14 + the tap's message surface.

The reference's default RecordWriter buffers 10k records and writes Singer
``SCHEMA`` / ``RECORD`` / ``STATE`` JSON lines to stdout
(cmd/internal/logger.go:21, 71-91; message shapes types.go:394-418).  Here
the equivalent is a distributed JSON-lines dataset: one SCHEMA sidecar, one
RECORD line per row (built JVM-side with ``to_json`` — no Python), and a
STATE line after the data is durably written (flush-before-state, §2.3 #2).
Useful as a debug tap of any pipeline stage and as the wire format for
:func:`singer_tap_spark.decode.decode_json_changes` round-trips.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from singer_tap_spark.catalog import Stream


def write_records(
    df: DataFrame,
    path: str,
    stream: Stream,
    state: dict[str, Any] | None = None,
    time_extracted: str = "1970-01-01T00:00:00Z",
) -> None:
    """Write ``df`` as Singer RECORD JSON lines under ``path`` plus a
    ``schema.json`` (SCHEMA message) and — only after the records are
    durably on disk — a timestamped STATE file, mirroring http-tap's
    ``state/state-<millis>.json`` (cmd/http-tap/main.go:128-160)."""
    record = F.to_json(
        F.struct(
            F.lit("RECORD").alias("type"),
            F.lit(stream.name).alias("stream"),
            F.lit(time_extracted).alias("time_extracted"),
            F.struct(*[F.col(c) for c in df.columns]).alias("record"),
        )
    )
    df.select(record.alias("value")).write.mode("overwrite").text(f"{path}/records")

    with open(f"{path}/schema.json", "w") as f:
        json.dump(
            {"type": "SCHEMA", **stream.to_json()}, f, indent=2
        )
    if state is not None:
        os.makedirs(f"{path}/state", exist_ok=True)
        millis = int(time.time() * 1000)
        with open(f"{path}/state/state-{millis}.json", "w") as f:
            json.dump({"type": "STATE", "value": state}, f, indent=2)


def read_records(spark, path: str) -> DataFrame:
    """Raw RECORD lines back as a DataFrame of JSON strings (column
    ``value``) — feed to ``decode_json_changes`` with the record schema."""
    return spark.read.text(f"{path}/records")
