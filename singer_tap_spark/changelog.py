"""Change-event log: schema + deterministic, fully-distributed generator.

The change log is the Spark-native analogue of the reference's VStream
`SyncResponse{Cursor, Result[]}` feed (cmd/internal/planetscale_edge_database.go
:144-237): per-shard, offset-ordered INSERT/UPDATE/DELETE row-images over the
transcripts table (shape from BASELINE.json input_hint / FIXTURES.md §2).

The generator is pure column expressions over ``spark.range`` — every
pseudo-random decision is ``xxhash64(seed, id, tag)``, so the same
(seed, n_events) produces byte-identical data at any parallelism (local[8]
== local[32] == a 1000-executor cluster), with NO driver-side loops and no
``rand()``/wall-clock. That is what makes the two-cluster-size scaling
evidence and the replay-idempotence tests meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# FIXTURES.md §2 — the engine's source schema. `shard` mirrors Vitess shard
# names (types.go:463-465), `offset` the GTID position (monotone per shard),
# `seq` the global emit sequence (ImportMessage.EmittedAt, types.go:496-499).
CHANGE_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("schema_version", T.IntegerType(), False),
    ]
)

# FIXTURES.md §1 — the target lake table (transcripts). `_seq` is sink
# metadata used for the LWW sequence guard (types.go:496-503 semantics).
TARGET_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("_seq", T.LongType(), True),
    ]
)

KEY_COLS = ["conv_id", "turn_idx"]
PAYLOAD_COLS = ["role", "text", "tool"]
ORDER_COLS = ["ts", "seq"]  # LWW total order per key (§2.3 #3; ties = same event)

_BASE_EPOCH = 1_700_000_000  # fixed base — no wall-clock anywhere


def _h(seed: int, tag: str) -> F.Column:
    """Deterministic non-negative 63-bit stream keyed by (seed, row id, tag)."""
    return F.abs(F.xxhash64(F.lit(seed), F.col("id"), F.lit(tag)))


def generate_changelog(
    spark: SparkSession,
    n_events: int,
    *,
    seed: int = 42,
    n_convs: int | None = None,
    n_shards: int = 4,
    max_turns: int = 40,
    hot_conv_frac: float = 0.0,
    update_frac: float = 0.30,
    delete_frac: float = 0.05,
    dup_frac: float = 0.0,
    ooo_frac: float = 0.10,
    max_ooo_seconds: int = 300,
    schema_evolution_at: int | None = None,
) -> DataFrame:
    """Synthesize a transcript change log (FIXTURES.md §2 knobs).

    - ``hot_conv_frac``: fraction of events funneled into ONE conversation
      (skew fixture, FIXTURES.md §7.8).
    - ``dup_frac``: exact replay duplicates — identical (shard, offset, seq)
      rows appended, mirroring binlog-session replays the reference dedups
      (planetscale_edge_database_test.go:669-679).
    - ``ooo_frac``: events whose ts lags up to ``max_ooo_seconds`` behind
      their seq order (bounded by the pipeline watermark).
    - ``schema_evolution_at``: seq after which events carry
      ``schema_version=2`` and a ``model`` payload column (FIXTURES.md §7.7).
    """
    if n_convs is None:
        n_convs = max(1, n_events // 20)

    df = spark.range(n_events)  # id == seq: total emit order

    conv_u = _h(seed, "conv") % F.lit(n_convs)
    if hot_conv_frac > 0:
        is_hot = (_h(seed, "hot") % 10_000) < int(hot_conv_frac * 10_000)
        conv_u = F.when(is_hot, F.lit(0)).otherwise(conv_u)
    conv_id = F.concat(F.lit("conv-"), F.lpad(conv_u.cast("string"), 8, "0"))
    turn_idx = (_h(seed, "turn") % F.lit(max_turns)).cast("int")

    op_r = _h(seed, "op") % 10_000
    upd_cut = int(update_frac * 10_000)
    del_cut = upd_cut + int(delete_frac * 10_000)
    op = (
        F.when(op_r < upd_cut, F.lit("UPDATE"))
        .when(op_r < del_cut, F.lit("DELETE"))
        .otherwise(F.lit("INSERT"))
    )

    is_ooo = (_h(seed, "ooo") % 10_000) < int(ooo_frac * 10_000)
    lag = F.when(is_ooo, _h(seed, "lag") % F.lit(max_ooo_seconds)).otherwise(F.lit(0))
    ts = F.timestamp_seconds(F.lit(_BASE_EPOCH) + F.col("id") - lag)

    # shard = hash-range of conv_id, mirroring Vitess keyspace sharding
    shard_n = F.pmod(F.xxhash64(conv_id), F.lit(n_shards))
    shard = F.concat(F.lit("shard-"), shard_n.cast("string"))

    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
        (turn_idx % 3 + 1).cast("int"),
    )
    is_del = op == "DELETE"
    text = F.when(
        is_del, F.lit(None).cast("string")
    ).otherwise(F.format_string("text %s turn %d rev %d", conv_id, turn_idx, F.col("id")))
    tool = F.when(
        (~is_del) & ((_h(seed, "tool") % 10) < 2),
        F.concat(F.lit("tool-"), (_h(seed, "toolid") % 5).cast("string")),
    ).otherwise(F.lit(None).cast("string"))

    if schema_evolution_at is not None:
        schema_version = F.when(F.col("id") >= schema_evolution_at, F.lit(2)).otherwise(
            F.lit(1)
        )
    else:
        schema_version = F.lit(1)

    out = df.select(
        shard.alias("shard"),
        F.col("id").alias("offset"),  # globally monotone => monotone per shard
        F.col("id").alias("seq"),
        op.alias("op"),
        ts.alias("ts"),
        conv_id.alias("conv_id"),
        turn_idx.alias("turn_idx"),
        F.when(is_del, F.lit(None).cast("string")).otherwise(role).alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        schema_version.cast("int").alias("schema_version"),
    )

    if schema_evolution_at is not None:
        out = out.withColumn(
            "model",
            F.when(
                F.col("schema_version") >= 2,
                F.concat(F.lit("model-"), (F.pmod(F.xxhash64("seq"), F.lit(3))).cast("string")),
            ).otherwise(F.lit(None).cast("string")),
        )

    if dup_frac > 0:
        dups = out.where(
            (F.abs(F.xxhash64(F.lit(seed), F.col("seq"), F.lit("dup"))) % 10_000)
            < int(dup_frac * 10_000)
        )
        out = out.unionByName(dups)  # exact replays: same shard/offset/seq

    return out


def write_changelog(
    df: DataFrame, path: str, *, n_files_per_shard: int = 4
) -> None:
    """Persist a change log as shard-partitioned parquet (the test/file
    source layout; in production the source is Kafka/Iceberg CDC).  The
    deterministic salt spreads a hot shard over ``n_files_per_shard`` writer
    tasks/files (same layout at any parallelism)."""
    from singer_tap_spark.salt import salted_repartition

    (
        salted_repartition(
            df, ["shard"], ["seq"], n_files_per_shard, n_salts=n_files_per_shard
        )
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
