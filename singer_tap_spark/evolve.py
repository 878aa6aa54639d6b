"""Schema evolution: add-column and type-widen — north-rule requirement.

The reference's evolution model is "re-discover, re-emit SCHEMA, destination
reconciles" (sync.go:63-66; http-tap flushes on new SCHEMA, main.go:64-78).
Our engine reconciles per batch: the union of target and batch schemas, with
nullable add-column and safe numeric widening (int8<int16<int32<int64,
float32<float64 — the widenings Iceberg supports as metadata-only changes).
Anything else is an incompatibility error, mirroring the reference's
fail-loudly stance on stale state (planetscale_edge_database.go:117-126).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class SchemaEvolutionError(ValueError):
    """Incompatible schema change (e.g. string -> int, drop of a key col)."""


_WIDEN_ORDER: dict[type, int] = {
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 3,
    T.LongType: 4,
}
_FLOAT_ORDER: dict[type, int] = {T.FloatType: 1, T.DoubleType: 2}


def _wider(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    ta, tb = type(a), type(b)
    if ta in _WIDEN_ORDER and tb in _WIDEN_ORDER:
        return a if _WIDEN_ORDER[ta] >= _WIDEN_ORDER[tb] else b
    if ta in _FLOAT_ORDER and tb in _FLOAT_ORDER:
        return a if _FLOAT_ORDER[ta] >= _FLOAT_ORDER[tb] else b
    # int -> double is a lossy-but-conventional widen; allow int* -> float/double
    if ta in _WIDEN_ORDER and tb in _FLOAT_ORDER:
        return b
    if tb in _WIDEN_ORDER and ta in _FLOAT_ORDER:
        return a
    raise SchemaEvolutionError(f"incompatible type change: {a} vs {b}")


def evolve_schema(
    current: T.StructType, incoming: T.StructType
) -> tuple[T.StructType, list[str]]:
    """Merged schema = current columns (possibly widened) + new incoming
    columns appended nullable.  Returns (schema, human-readable changes)."""
    changes: list[str] = []
    by_name = {f.name: f for f in incoming.fields}
    fields: list[T.StructField] = []
    for f in current.fields:
        inc = by_name.pop(f.name, None)
        if inc is None or inc.dataType == f.dataType:
            fields.append(f)
            continue
        wide = _wider(f.dataType, inc.dataType)
        if wide != f.dataType:
            changes.append(f"widen {f.name}: {f.dataType.simpleString()} -> {wide.simpleString()}")
        fields.append(T.StructField(f.name, wide, f.nullable or inc.nullable))
    for name, f in by_name.items():
        changes.append(f"add column {name}: {f.dataType.simpleString()}")
        fields.append(T.StructField(name, f.dataType, True))  # new cols nullable
    return T.StructType(fields), changes


def align(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project/cast ``df`` to exactly ``target`` (missing columns -> NULL).
    Pure column expressions — Catalyst folds the casts into the scan."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name in have:
            src = F.col(f.name)
            cols.append(
                src.alias(f.name)
                if have[f.name].dataType == f.dataType
                else src.cast(f.dataType).alias(f.name)
            )
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
