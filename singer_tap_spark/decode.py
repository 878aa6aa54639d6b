"""Record decoding & type normalization — operators O12/O13/O20 (SURVEY §2.1).

The reference converts every MySQL value to its JSON-Schema type row-at-a-time
(``Convert``, cmd/internal/value_converter.go:11-45; RFC3339 reformat
:47-57) and parses Singer messages line-by-line (cmd/http-tap/main.go:98-126).
Here the same semantics run columnar: native ``cast()`` expressions (JVM,
whole-stage codegen) for everything Catalyst can do, and ONE Arrow-vectorized
pandas UDF for the date-time-string reformat whose failure semantics
(unparseable -> "" empty string; fraction truncated; NULL passes through)
built-ins don't reproduce exactly (value_converter_test.go:88-109).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


@dataclass
class PropertySpec:
    """JSON-Schema property — StreamProperty analogue (types.go:125-153)."""

    types: list[str] = field(default_factory=lambda: ["null", "string"])
    custom_format: str | None = None  # "date-time"

    def is_type(self, t: str) -> bool:
        return t in self.types


@pandas_udf(T.StringType())
def rfc3339(s: pd.Series) -> pd.Series:
    """Vectorized ``getISOTimeStamp`` (value_converter.go:47-57): parse a
    datetime string, emit RFC3339 with fractional seconds TRUNCATED; a value
    that fails to parse becomes ``""`` (the reference's documented quirk,
    value_converter_test.go:88-90); NULL stays NULL (:23-25)."""
    parsed = pd.to_datetime(s, errors="coerce", format="mixed")
    out = parsed.dt.strftime("%Y-%m-%dT%H:%M:%SZ")
    out[parsed.isna()] = ""
    out[s.isna()] = None
    return out


def normalize_column(
    name: str, spec: PropertySpec, *, tinyint_as_boolean: bool = True
) -> Column:
    """One column of the §1.2 type table as a Catalyst expression.

    integer -> long, number -> double, boolean -> boolean (the
    ``--tinyint-as-boolean`` switch, singer-tap/main.go:43), date-time
    string -> RFC3339 via :func:`rfc3339`, everything else -> string.
    NULLs pass through every branch (``["null", T]`` unions, types.go:119-128).
    """
    c = F.col(name)
    # try_cast, not cast: null-coerce malformed values (reference-faithful
    # lenient Convert semantics) even if the session runs ANSI-on
    if spec.custom_format == "date-time":
        return rfc3339(c.try_cast("string"))
    if spec.is_type("boolean"):
        return c.try_cast("boolean") if tinyint_as_boolean else c.try_cast("long")
    if spec.is_type("integer"):
        return c.try_cast("long")
    if spec.is_type("number"):
        return c.try_cast("double")
    return c.try_cast("string")


def normalize(
    df: DataFrame,
    specs: dict[str, PropertySpec],
    *,
    tinyint_as_boolean: bool = True,
) -> DataFrame:
    """Apply :func:`normalize_column` to every spec'd column, projecting
    ONLY spec'd columns (selected-properties semantics, sync.go:149-172)."""
    return df.select(
        *[
            normalize_column(n, s, tinyint_as_boolean=tinyint_as_boolean).alias(n)
            for n, s in specs.items()
        ]
    )


# ---------------------------------------------------------------------------
# Singer-message envelope decoding (O20) — raw JSON-lines change feed.
# ---------------------------------------------------------------------------

def _spark_type_for(prop: dict) -> T.DataType:
    """JSON-Schema property -> Spark type: the §1.2 table forward
    (getJsonSchemaType's output read back; catalog._prop_for in reverse)."""
    if prop.get("format") == "date-time":
        return T.TimestampType()
    # JSON-Schema allows both "type": ["null","integer"] and the scalar
    # form "type": "integer" (common in external Singer taps) — iterating
    # a bare string char-by-char would silently fall through to string
    t = prop.get("type", ["string"])
    types = [x for x in ([t] if isinstance(t, str) else t) if x != "null"] or ["string"]
    return {
        "integer": T.LongType(),
        "number": T.DoubleType(),
        "boolean": T.BooleanType(),
        "string": T.StringType(),
    }.get(types[0], T.StringType())


def schema_from_singer_messages(spark, path: str) -> T.StructType:
    """Derive the record schema from the stream's own SCHEMA messages —
    http-tap re-latches its parser on every SCHEMA line (http-tap/main.go
    :64-78); here all SCHEMA lines are folded (add-column / int->long
    widening via evolve_schema) into one read schema, so a log that evolved
    mid-stream self-describes and ``jsonl_schema`` config is optional.

    Cost: one coarse-filtered pass over the text log collecting only the
    (rare) SCHEMA lines; at production scale prefer the catalog's schema.
    """
    import json as _json

    from pyspark.sql import functions as _F

    from singer_tap_spark.evolve import evolve_schema

    rows = (
        spark.read.text(path)
        .where(_F.col("value").contains('"SCHEMA"'))
        .collect()
    )
    folded: T.StructType | None = None
    for r in rows:
        try:
            doc = _json.loads(r["value"])
        except ValueError:
            continue
        if doc.get("type") != "SCHEMA":
            continue
        props = (doc.get("schema") or {}).get("properties", {})
        if not props:
            continue
        s = T.StructType(
            [T.StructField(n, _spark_type_for(p), True) for n, p in props.items()]
        )
        folded = s if folded is None else evolve_schema(folded, s)[0]
    if folded is None:
        raise ValueError(f"no SCHEMA messages found in {path}")
    return folded


def decode_json_changes(raw: DataFrame, payload_schema: T.StructType) -> DataFrame:
    """Parse a DataFrame of raw JSON lines (column ``value``) into typed
    change events — ``parseInput``'s RECORD branch (http-tap/main.go:98-126)
    as one JVM-side ``from_json``; no Python in the loop."""
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), payload_schema).alias("r")
    )
    return parsed.select("r.*")
