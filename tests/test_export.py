"""Sequence packing: cap contract, next-fit equivalence, determinism, and
the no-single-task plan gate (VERDICT r1 #3 / ADVICE r1).

Note the cap contract is STRONGER than ADVICE r1's suggested inclusive-
cumsum fix: cumsum binning still lets a boundary-straddling doc overfill
the next bin to ~2x the cap; next-fit (implemented) never does.
"""

import contextlib
import io
import random

from pyspark.sql import functions as F

from singer_tap_spark.export import assemble_conversations, pack_sequences

MAX = 1000


def _docs(spark, tokens):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(tokens)], "conv_id long, n_tokens long"
    )


def _next_fit(tokens, max_tokens=MAX):
    """Reference implementation: sequential next-fit in id order."""
    b, fill, out = 0, 0, []
    for t in tokens:
        if fill > 0 and fill + t > max_tokens:
            b, fill = b + 1, 0
        out.append(b)
        fill += t
    return out


def test_pack_bins_respect_cap(spark):
    # includes a straddler (999 after 2400 filled) that breaks cumsum binning
    tokens = [300, 300, 300, 300, 600, 600, 999, 1, 500, 500, 500]
    out = pack_sequences(_docs(spark, tokens), max_tokens=MAX).toPandas()
    sums = out.groupby("bin")["n_tokens"].sum()
    assert (sums <= MAX).all(), sums.to_dict()


def test_pack_two_big_docs_do_not_share_a_bin(spark):
    # the ADVICE r1 case: the r1 exclusive cumsum put two 3000s in one 4096 bin
    out = pack_sequences(_docs(spark, [3000, 3000]), max_tokens=4096).toPandas()
    assert out["bin"].nunique() == 2


def test_pack_single_range_equals_serial_next_fit(spark):
    rnd = random.Random(7)
    tokens = [rnd.randint(1, 700) for _ in range(500)]
    out = (
        pack_sequences(_docs(spark, tokens), max_tokens=MAX, n_ranges=1)
        .orderBy("conv_id")
        .toPandas()
    )
    assert out["bin"].tolist() == _next_fit(tokens)


def test_pack_multi_range_valid_and_globally_numbered(spark):
    rnd = random.Random(13)
    tokens = [rnd.randint(1, 700) for _ in range(400)]
    out = (
        pack_sequences(_docs(spark, tokens), max_tokens=MAX, n_ranges=8)
        .orderBy("conv_id")
        .toPandas()
    )
    sums = out.groupby("bin")["n_tokens"].sum()
    assert (sums <= MAX).all()
    # bins are consecutive 0..N-1 and non-decreasing in id order
    bins = out["bin"].tolist()
    assert sorted(set(bins)) == list(range(max(bins) + 1))
    assert bins == sorted(bins)


def test_pack_deterministic_across_parallelism(spark):
    rnd = random.Random(11)
    tokens = [rnd.randint(1, 700) for _ in range(300)]
    df = _docs(spark, tokens)
    a = pack_sequences(df, max_tokens=MAX, n_ranges=4).orderBy("conv_id").collect()
    b = (
        pack_sequences(df.repartition(13), max_tokens=MAX, n_ranges=4)
        .orderBy("conv_id")
        .collect()
    )
    assert [r["bin"] for r in a] == [r["bin"] for r in b]


def test_pack_plan_has_no_single_partition_stage(spark):
    """The r1 global window forced Exchange SinglePartition — the whole
    corpus through one task.  The per-range form must not."""
    df = pack_sequences(_docs(spark, list(range(1, 200))), max_tokens=MAX)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    assert "SinglePartition" not in buf.getvalue()


def test_oversized_doc_sits_alone(spark):
    tokens = [100, 5000, 100, 100]
    out = (
        pack_sequences(_docs(spark, tokens), max_tokens=MAX, n_ranges=1)
        .orderBy("conv_id")
        .toPandas()
    )
    assert out["bin"].tolist() == _next_fit(tokens)  # [0, 1, 2, 2]
    big_bin = out[out["n_tokens"] > MAX]["bin"].iloc[0]
    assert (out["bin"] == big_bin).sum() == 1


def test_assemble_conversations_orders_turns(spark):
    turns = spark.createDataFrame(
        [(1, 2, "assistant", "b"), (1, 1, "user", "a"), (2, 1, "user", "x")],
        "conv_id long, turn_idx int, role string, text string",
    )
    out = assemble_conversations(turns).orderBy("conv_id").collect()
    assert out[0]["doc"] == "user: a\nassistant: b"
    assert out[0]["n_turns"] == 2
    assert out[1]["doc"] == "user: x"


def test_render_chat_template_formats_and_order(spark):
    from singer_tap_spark.export import render_chat_template

    turns = spark.createDataFrame(
        [
            ("c1", 2, "assistant", "hi there"),
            ("c1", 1, "user", "hello"),
            ("c2", 1, "user", "solo"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    chatml = {r["conv_id"]: r for r in
              render_chat_template(turns, "chatml").collect()}
    assert chatml["c1"]["text"] == (
        "<|im_start|>user\nhello<|im_end|>\n"
        "<|im_start|>assistant\nhi there<|im_end|>"
    )
    assert chatml["c1"]["n_turns"] == 2
    assert chatml["c2"]["text"] == "<|im_start|>user\nsolo<|im_end|>"

    plain = {r["conv_id"]: r["text"] for r in
             render_chat_template(turns, "plain").collect()}
    assert plain["c1"] == "user: hello\nassistant: hi there"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown chat template"):
        render_chat_template(turns, "nope")


def test_conversation_prefix_dedup_groups_forks(spark):
    from singer_tap_spark.export import conversation_prefix_dedup

    rows = []
    # conv 1 and 2: identical first 3 turns, divergent 4th (fork pair)
    for c in (1, 2):
        rows += [(c, 1, "user", "hi"), (c, 2, "assistant", "hello"),
                 (c, 3, "user", "do a thing")]
        rows.append((c, 4, "assistant", f"result-{c}"))
    # conv 3: diverges INSIDE the prefix window -> its own group
    rows += [(3, 1, "user", "hi"), (3, 2, "assistant", "different"),
             (3, 3, "user", "do a thing")]
    # conv 4: shorter than the window, unique
    rows += [(4, 1, "user", "solo")]
    # conv 5: same single turn as 4 -> groups with it (whole-prefix match)
    rows += [(5, 1, "user", "solo")]
    turns = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string"
    )
    out = {r["canonical_conv_id"]: r["n_convs"]
           for r in conversation_prefix_dedup(turns, prefix_turns=3).collect()}
    assert out == {1: 2, 3: 1, 4: 2}


def test_prefix_fingerprint_is_injective(spark):
    """A single turn whose text imitates rendered 'role: text' lines must
    NOT collide with the real multi-turn conversation it imitates (the
    length-prefixed netstring serialization pins field boundaries)."""
    from singer_tap_spark.export import conversation_prefix_dedup

    real = [("A", i, r, t) for i, (r, t) in enumerate(
        [("user", "a"), ("assistant", "b"), ("user", "c")])]
    forged = [("B", 0, "user", "a|9:assistant:1:b|4:user:1:c|")]
    # a second forgery targeting the old '\n'-joined rendering
    forged2 = [("C", 0, "user", "a\nassistant: b\nuser: c")]
    df = spark.createDataFrame(real + forged + forged2,
                               "conv_id string, turn_idx int, role string, text string")
    out = conversation_prefix_dedup(df, prefix_turns=3)
    assert out.count() == 3  # three distinct fingerprints, no merge
    assert out.where("n_convs > 1").count() == 0


def test_prefix_fingerprint_null_fields_stay_distinct(spark):
    """NULL role/text must not collapse the netstring element (a NULL
    concat would be dropped by array_join, colliding conversations that
    differ only by a null-text turn), and NULL must stay distinct from
    the empty string ('N' sentinel vs '0:')."""
    from singer_tap_spark.export import conversation_prefix_dedup

    rows = [
        ("A", 0, "user", "hi"), ("A", 1, "assistant", None),
        ("B", 0, "user", "hi"),                     # missing-2nd-turn conv
        ("C", 0, "user", "hi"), ("C", 1, "assistant", ""),  # empty != NULL
        ("D", 0, "user", "hi"), ("D", 1, "assistant", None),  # dup of A
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    )
    out = conversation_prefix_dedup(df, prefix_turns=3)
    groups = {r["canonical_conv_id"]: r["n_convs"] for r in out.collect()}
    assert groups == {"A": 2, "B": 1, "C": 1}
