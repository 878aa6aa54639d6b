"""PII redaction op: typed placeholders, per-kind counts, RE2-safe patterns."""

from pyspark.sql import functions as F



def test_redact_pii_shapes(spark):
    from singer_tap_spark.ops.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.user+tag@sub.example.co phone 555-123-4567 "
                "ssn 123-45-6789 ip 192.168.1.17 done"),
            (2, "dots 555.123.4567 not-pii 12345 1.2 version 1.2.3"),
            (3, "no pii here at all"),
        ],
        "id long, t string",
    )
    out = {r["id"]: r for r in df.select(
        "id", redact_pii(F.col("t")).alias("c"), *pii_counts(F.col("t"))
    ).collect()}
    assert out[1]["c"] == (
        "mail <EMAIL> phone <PHONE> ssn <SSN> ip <IP> done"
    )
    assert (out[1]["n_email"], out[1]["n_ssn"], out[1]["n_phone"],
            out[1]["n_ipv4"]) == (1, 1, 1, 1)
    # dotted phone redacts as PHONE, short digit runs / versions untouched
    assert out[2]["c"] == "dots <PHONE> not-pii 12345 1.2 version 1.2.3"
    assert out[3]["c"] == "no pii here at all"
    assert out[3]["n_email"] == 0

    # kinds subset: only emails masked
    sub = df.where("id = 1").select(
        redact_pii(F.col("t"), kinds=("email",)).alias("c")
    ).first()["c"]
    assert "<EMAIL>" in sub and "555-123-4567" in sub


def test_repetition_ratio(spark):
    from singer_tap_spark.ops.text import repetition_ratio

    df = spark.createDataFrame(
        [
            (1, "a b c a b c a b c"),        # loop: 7 grams, 3 distinct
            (2, "all words entirely unique here today"),
            (3, "two words"),                # shorter than n -> 0.0
            (4, ""),
        ],
        "id long, t string",
    )
    out = {r["id"]: r["r"] for r in df.select(
        "id", repetition_ratio(F.col("t"), n=3).alias("r")
    ).collect()}
    assert out[1] == round(1 - 3 / 7, 4)
    assert out[2] == 0.0
    assert out[3] == 0.0
    assert out[4] == 0.0


def test_repetition_ratio_impls_identical(spark):
    """Arrow default == pure-Catalyst 'expr' form, bit for bit, on the
    real corpus (the UDF returns raw counts; division/rounding shared)."""
    from singer_tap_spark.ops.text import repetition_ratio

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = d.select("doc_id", repetition_ratio(F.col("text")).alias("r"))
    b = d.select("doc_id", repetition_ratio(F.col("text"), impl="expr").alias("r"))
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown repetition_ratio impl"):
        repetition_ratio(F.col("text"), impl="nope")


def test_normalize_text_folds_and_strips(spark):
    """Control chars stripped, exotic spaces/quotes/dashes/ellipsis folded
    to ASCII, whitespace collapsed; NULL -> ''; idempotent."""
    from singer_tap_spark.ops.text import normalize_text

    s = "a\x07b c‘d’ “q” – … e​f"
    df = spark.createDataFrame(
        [(1, s), (2, None), (3, "  x \n\n y  "), (4, "plain ascii.")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["c"]
           for r in df.select("doc_id", normalize_text(F.col("text")).alias("c")).collect()}
    assert out[1] == 'ab c\'d\' "q" - ... e f'
    assert out[2] == ""
    assert out[3] == "x y"
    assert out[4] == "plain ascii."
    # idempotent: a second pass is the identity
    twice = df.select(
        normalize_text(normalize_text(F.col("text"))).alias("c2")
    ).collect()
    assert [r["c2"] for r in twice] == [out[i] for i in (1, 2, 3, 4)]


def test_normalize_text_keeps_newlines_when_asked(spark):
    from singer_tap_spark.ops.text import normalize_text

    df = spark.createDataFrame([("para one\n\npara two here",)], ["text"])
    out = df.select(
        normalize_text(F.col("text"), collapse_whitespace=False).alias("c")
    ).first()["c"]
    assert out == "para one\n\npara two here"  # NBSP folded, newlines kept


def test_vocab_and_exact_k_plans_are_topk(spark):
    """Both top-k ops compile to TakeOrderedAndProject — partial top-k per
    partition, never a full global sort."""
    from singer_tap_spark.ops.sample import exact_k_sample
    from singer_tap_spark.ops.text import vocab_top_k

    docs = spark.createDataFrame(
        [(i, f"alpha beta w{i}") for i in range(50)], "doc_id long, text string"
    )
    p1 = vocab_top_k(docs, 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p1 and "Sort [" not in p1
    p2 = exact_k_sample(docs, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p2 and "Sort [" not in p2


def test_arrow_impls_match_expr(spark):
    """r7: the Arrow/RE2 kernels behind lang_id / quality_score /
    redact_pii / pii_counts / normalize_text must agree with the
    pure-Catalyst expr impls EXACTLY — same integer counts, byte-identical
    replaced text — on real corpus text plus the decorated/degenerate
    family (dirty unicode suffix, planted PII, NULL/empty/whitespace-only
    rows; NULL-text pii_counts must reproduce the session's size(NULL)
    semantics)."""
    from functools import reduce

    from singer_tap_spark.ops.text import (
        lang_id,
        normalize_text,
        pii_counts,
        quality_score,
        redact_pii,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dirty = F.concat(F.col("text"), F.lit("\x07 “quoted” – … tail"))
    pii = F.concat(
        F.col("text"), F.lit(" contact u"), F.col("doc_id").cast("string"),
        F.lit("@ex.com or 555-123-0001 from 10.0.0.1 ssn 123-45-6789"),
    )
    extra = spark.createDataFrame(
        [(100001, None), (100002, ""), (100003, "   "),
         (100004, "　‘x’—y\x07")],
        "doc_id long, text string",
    )
    dd = d.select(
        "doc_id", dirty.alias("t1"), pii.alias("t2"), F.col("text").alias("t0")
    ).unionByName(extra.select(
        "doc_id", F.col("text").alias("t1"), F.col("text").alias("t2"),
        F.col("text").alias("t0"),
    ))
    for col in ("t0", "t1", "t2"):
        t = F.col(col)
        checks = [
            lang_id(t).eqNullSafe(lang_id(t, impl="expr")),
            quality_score(t).eqNullSafe(quality_score(t, impl="expr")),
            redact_pii(t).eqNullSafe(redact_pii(t, impl="expr")),
            normalize_text(t).eqNullSafe(normalize_text(t, impl="expr")),
        ] + [
            x.eqNullSafe(y)
            for x, y in zip(pii_counts(t), pii_counts(t, impl="expr"))
        ]
        cmp = dd.select(*[c.alias(f"c{i}") for i, c in enumerate(checks)])
        anybad = reduce(lambda a, b: a | b, [~F.col(c) for c in cmp.columns])
        assert cmp.where(anybad).count() == 0, col
