"""chunk_documents: sliding token windows — coverage, overlap, edge sizes."""

import pytest

from pyspark.sql import functions as F

from singer_tap_spark.ops.chunk import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_disjoint_split_reconstructs(spark):
    """stride == max_tokens: chunks are a partition of the token stream —
    concatenating them in chunk_idx order rebuilds the document exactly."""
    text = " ".join(f"w{i}" for i in range(103))
    out = (
        chunk_documents(_docs(spark, [(1, text)]), max_tokens=10, stride=10)
        .orderBy("chunk_idx")
        .collect()
    )
    assert [r["chunk_idx"] for r in out] == list(range(11))
    assert sum(r["chunk_tokens"] for r in out) == 103
    assert " ".join(r["chunk_text"] for r in out) == text


def test_overlap_shares_context(spark):
    """stride < max_tokens: consecutive chunks share max_tokens - stride
    tokens, and every token position is covered."""
    text = " ".join(f"w{i}" for i in range(20))
    out = (
        chunk_documents(_docs(spark, [(1, text)]), max_tokens=8, stride=5)
        .orderBy("chunk_idx")
        .collect()
    )
    words = [r["chunk_text"].split(" ") for r in out]
    for a, b in zip(words, words[1:]):
        if len(b) >= 3:
            assert a[-3:] == b[:3]  # 8-5=3 shared tokens
    covered = {w for ws in words for w in ws}
    assert covered == {f"w{i}" for i in range(20)}


@pytest.mark.parametrize(
    "n,mt,st,expect",
    [
        (0, 5, 5, 1),   # empty doc -> one empty chunk
        (5, 5, 3, 1),   # exactly fits
        (6, 5, 3, 2),   # one token past -> second window
        (10, 5, 3, 3),  # ceil((10-5)/3)+1
        (11, 5, 3, 3),  # last window covers 6..10
        (12, 5, 3, 4),
    ],
)
def test_chunk_count_formula(spark, n, mt, st, expect):
    text = " ".join(f"w{i}" for i in range(n))
    out = chunk_documents(_docs(spark, [(1, text)]), max_tokens=mt, stride=st)
    assert out.count() == expect
    # no window starts at-or-beyond n (a fully-redundant tail chunk)
    if n > 0:
        starts = [r["chunk_idx"] * st for r in out.collect()]
        assert all(s < n for s in starts)


def test_blank_and_null_text_survive_as_empty(spark):
    out = chunk_documents(_docs(spark, [(1, ""), (2, "   "), (3, None)]))
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["chunk_tokens"] == 0 and r["chunk_text"] == "" for r in rows)


def test_invalid_stride_raises(spark):
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), max_tokens=5, stride=6)
    with pytest.raises(ValueError):
        chunk_documents(_docs(spark, [(1, "a")]), max_tokens=5, stride=0)


def test_plan_is_narrow(spark):
    """Map-only: no Exchange in the chunking plan (scales as a scan)."""
    df = _docs(spark, [(1, "a b c d e f")])
    plan = chunk_documents(df, max_tokens=3, stride=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
