from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

from singer_tap_spark import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def duck(sql: str) -> pd.DataFrame:
    return duckdb.sql(sql).df()


def lww_oracle_sql(log_glob: str) -> str:
    """Naive-LWW final-state oracle over a changelog parquet glob: distinct
    exact rows, latest (ts, seq) per key wins, DELETE winner removes."""
    return f"""
    WITH dedup AS (
      SELECT DISTINCT * FROM read_parquet('{log_glob}', hive_partitioning=1)
    ), ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) rn
      FROM dedup
    )
    SELECT conv_id, turn_idx, role, text, tool, ts
    FROM ranked WHERE rn = 1 AND op <> 'DELETE'
    """


def assert_frames_equal(got: pd.DataFrame, want: pd.DataFrame, keys: list[str]):
    got = got[want.columns.tolist()].sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
