"""Catalog, discovery and stream/column selection — operators O1-O5, O10, O11.

Rebuilds the reference's discover mode (cmd/internal/discover.go:18-63): walk
the source namespace, infer each table's schema and keys, emit a catalog with
selection metadata; and its sync-time ``filterSchema`` (cmd/internal/sync.go
:191-235): only ``selected`` streams sync, only selected + ``automatic``
(key) columns are emitted — keys can never be deselected (types.go:274-281).

Source here is a directory of parquet/Iceberg tables rather than MySQL
``information_schema`` (planetscale_edge_mysql.go:114-195) — schema comes
from the file/table metadata, keys from config or an Iceberg table's
identifier fields.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from singer_tap_spark.decode import PropertySpec

FULL_TABLE = "FULL_TABLE"
INCREMENTAL = "INCREMENTAL"

_SPARK_TO_JSONSCHEMA: list[tuple[type, list[str]]] = [
    (T.BooleanType, ["null", "boolean"]),
    (T.ByteType, ["null", "integer"]),
    (T.ShortType, ["null", "integer"]),
    (T.IntegerType, ["null", "integer"]),
    (T.LongType, ["null", "integer"]),
    (T.FloatType, ["null", "number"]),
    (T.DoubleType, ["null", "number"]),
]


def _prop_for(dt: T.DataType) -> PropertySpec:
    """Spark type -> JSON-Schema property, the §1.2 table in reverse
    (getJsonSchemaType, planetscale_edge_mysql.go:198-238)."""
    for klass, types_ in _SPARK_TO_JSONSCHEMA:
        if isinstance(dt, klass):
            return PropertySpec(types=list(types_))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return PropertySpec(types=["null", "string"], custom_format="date-time")
    return PropertySpec(types=["null", "string"])  # everything else stringly


@dataclass
class Stream:
    """Singer Stream analogue (types.go:78-113)."""

    name: str
    schema: T.StructType
    key_properties: list[str] = field(default_factory=list)
    cursor_properties: list[str] = field(default_factory=list)
    selected: bool = False
    replication_method: str = INCREMENTAL
    # column -> selected; keys are always force-included ('automatic')
    column_selection: dict[str, bool] = field(default_factory=dict)

    def properties(self) -> dict[str, PropertySpec]:
        return {f.name: _prop_for(f.dataType) for f in self.schema.fields}

    def selected_columns(self) -> list[str]:
        """Selected + automatic(key) columns, in schema order — the
        filterSchema property rule (sync.go:205-222)."""
        out = []
        for f in self.schema.fields:
            if f.name in self.key_properties or self.column_selection.get(
                f.name, not self.column_selection  # no explicit map => all
            ):
                out.append(f.name)
        return out

    def to_json(self) -> dict:
        return {
            "stream": self.name,
            "tap_stream_id": self.name,
            "schema": {
                "type": ["null", "object"],
                "properties": {
                    n: (
                        {"type": p.types, "format": p.custom_format}
                        if p.custom_format
                        else {"type": p.types}
                    )
                    for n, p in self.properties().items()
                },
            },
            "key_properties": self.key_properties,
            "bookmark_properties": self.cursor_properties,
            "metadata": [
                {
                    "breadcrumb": [],
                    "metadata": {
                        "selected": self.selected,
                        "replication-method": self.replication_method,
                        "table-key-properties": self.key_properties,
                    },
                }
            ]
            + [
                {
                    "breadcrumb": ["properties", f.name],
                    "metadata": {
                        "inclusion": (
                            "automatic" if f.name in self.key_properties else "available"
                        ),
                        "selected": self.column_selection.get(f.name, True),
                    },
                }
                for f in self.schema.fields
            ],
            "spark_schema": self.schema.jsonValue(),
        }


@dataclass
class Catalog:
    streams: list[Stream] = field(default_factory=list)

    def filter_selected(self) -> "Catalog":
        """filterSchema analogue (sync.go:191-235): keep only selected
        streams; unselected non-key columns are dropped from the schema."""
        out = []
        for s in self.streams:
            if not s.selected:
                continue
            cols = s.selected_columns()
            out.append(
                Stream(
                    name=s.name,
                    schema=T.StructType([f for f in s.schema.fields if f.name in cols]),
                    key_properties=s.key_properties,
                    cursor_properties=s.cursor_properties,
                    selected=True,
                    replication_method=s.replication_method,
                    column_selection={c: True for c in cols},
                )
            )
        return Catalog(out)

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump({"streams": [s.to_json() for s in self.streams]}, f, indent=2)

    @staticmethod
    def load(path: str) -> "Catalog":
        with open(path) as f:
            doc = json.load(f)
        streams = []
        for sj in doc.get("streams", []):
            meta = {}
            col_sel: dict[str, bool] = {}
            for m in sj.get("metadata", []):
                bc = m.get("breadcrumb", [])
                if not bc:
                    meta = m.get("metadata", {})
                elif len(bc) == 2 and bc[0] == "properties":
                    col_sel[bc[1]] = m["metadata"].get("selected", True)
            streams.append(
                Stream(
                    name=sj["stream"],
                    schema=T.StructType.fromJson(sj["spark_schema"]),
                    key_properties=sj.get("key_properties", []),
                    cursor_properties=sj.get("bookmark_properties", []),
                    selected=meta.get("selected", False),
                    replication_method=meta.get("replication-method", INCREMENTAL),
                    column_selection=col_sel,
                )
            )
        return Catalog(streams)


def _infer_keys(root: str, name: str, path: str) -> list[str]:
    """PK auto-discovery — the information_schema PRI-column scan analogue
    (planetscale_edge_mysql.go:169-195).  Sources, in precedence order:

    1. parquet footer key-value metadata ``key_properties`` (a JSON list) —
       the source-embedded form, like MySQL's own schema metadata; an
       Iceberg table's *identifier fields* play this role on the cluster
       path;
    2. a ``<root>/_keys.json`` sidecar mapping table name -> key list —
       the operator-maintained form for key-less parquet exports.
    """
    try:
        import pyarrow.dataset as pds

        d = pds.dataset(path, format="parquet")
        frag = next(iter(d.get_fragments()), None)
        if frag is not None:
            meta = frag.physical_schema.metadata or {}
            raw = meta.get(b"key_properties")
            if raw:
                keys = json.loads(raw.decode())
                if isinstance(keys, list):
                    return [str(k) for k in keys]
    except Exception:
        pass
    sidecar = os.path.join(root, "_keys.json")
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            mapping = json.load(f)
        if name in mapping:
            return [str(k) for k in mapping[name]]
    return []


def discover(
    spark: SparkSession,
    root: str,
    key_properties: dict[str, list[str]] | None = None,
    excluded: set[str] | None = None,
) -> Catalog:
    """Discover mode (discover.go:18-63): every ``<root>/<name>.parquet`` (or
    ``<name>/`` dataset dir) becomes a Stream; schema read from footer
    metadata only — no data scan.  ``excluded`` mirrors the tap's excluded
    tables filter (discover.go:31-34).

    Keys come from explicit ``key_properties`` config when given, else are
    AUTO-DISCOVERED from source metadata (:func:`_infer_keys`) — the
    reference reads information_schema PKs the same way (discover.go:36-44
    via planetscale_edge_mysql.go:169-195); a config dict is no longer
    required for keyed streams."""
    key_properties = key_properties or {}
    excluded = excluded or set()
    streams = []
    for entry in sorted(os.listdir(root)):
        name = entry[: -len(".parquet")] if entry.endswith(".parquet") else entry
        path = os.path.join(root, entry)
        if name in excluded or name.startswith("_"):
            continue
        try:
            schema = spark.read.parquet(path).schema
        except Exception:
            continue  # not a parquet dataset
        keys = key_properties.get(name) or _infer_keys(root, name, path)
        streams.append(
            Stream(
                name=name,
                schema=schema,
                key_properties=keys,
                cursor_properties=keys,
                selected=False,  # discovery never auto-selects (types.go:258-286)
            )
        )
    return Catalog(streams)
