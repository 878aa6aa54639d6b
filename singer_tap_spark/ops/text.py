"""Text analysis operators — language-ID, quality, token counts, fingerprints.

Pure Catalyst column expressions (string/regex built-ins, JVM-side,
whole-stage codegen) throughout, so plans scale linearly and the DuckDB
oracles reproduce them exactly — with ONE deliberate exception:
``repetition_ratio``'s default impl runs its per-row gram loop in an Arrow
pandas UDF (interpreted HOF lambdas measured ~8x slower; the UDF emits raw
integer counts only, so oracle exactness is preserved — see its docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# small fixed marker sets: deterministic n-gram/stopword heuristic language ID
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "es": ["el", "la", "de", "que", "y", "los", "una"],
    "de": ["der", "die", "und", "das", "nicht", "ist"],
    "fr": ["le", "la", "les", "des", "une", "est", "dans"],
}

STOPWORDS = LANG_MARKERS["en"]


def _norm(text: Column) -> Column:
    """lower + collapse whitespace — the canonical form every operator keys on."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank text counts 0."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    ).cast("int")


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish count: word pieces + digits + punctuation as separate
    tokens (a BPE-style regex proxy for LLM token budgeting)."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
    ).cast("int")


# normalize_text patterns as REGEX-ESCAPE TEXT (\x{...} codepoint form),
# not raw characters: the identical pattern strings parse under Java regex
# (Spark) and RE2 (DuckDB), and they can be embedded verbatim in oracle SQL
# literals (raw control bytes cannot).  Steps:
# (1) strip C0 control chars except \t\n\r, plus DEL;
# (2) exotic spaces (NBSP, ogham, en/em/thin/zero-width, line/para sep,
#     ideographic) -> ' ';
# (3) curly single / (4) curly double quotes -> ASCII; (5) en/em/
# horizontal-bar dashes -> '-'; (6) ellipsis -> '...'
CLEANUP_STEPS: list[tuple[str, str]] = [
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),
    (r"[\x{00a0}\x{1680}\x{2000}-\x{200b}\x{2028}\x{2029}\x{202f}\x{205f}\x{3000}]", " "),
    (r"[\x{2018}\x{2019}\x{201a}\x{201b}]", "'"),
    (r"[\x{201c}\x{201d}\x{201e}\x{201f}]", '"'),
    (r"[\x{2013}\x{2014}\x{2015}]", "-"),
    (r"\x{2026}", "..."),
]


# --- Arrow/RE2 kernels (r7) -------------------------------------------------
# java.util.regex in Catalyst regexp_replace/regexp_extract_all measured
# 70-90 us/doc/pass on the 50k-doc sf1.0 corpus (docs_lang_id 3.9 s,
# docs_redact 4.1 s — each a chain of full-string regex passes).  The same
# patterns run through pyarrow.compute's RE2 engine an order of magnitude
# faster, and the portability bet is one the repo has ALREADY made: every
# one of these pattern strings is oracle-checked byte-exact against DuckDB,
# whose regex engine IS RE2 — so "Java == RE2 on these patterns" is a
# pinned invariant, and pyarrow's RE2 sits on the same side of it.  The
# kernels emit raw INTEGER COUNTS or the replaced TEXT only; thresholds,
# argmax chains and float formulas stay Catalyst-side, so both impls — and
# the DuckDB oracles — are bit-identical (same discipline as
# repetition_ratio).  Every op keeps an ``impl='expr'`` pure-Catalyst form,
# parity-pytest-pinned at the shipped sfs.


def _marker_counts_kernel(patterns: list[str], lower: bool):
    """One Arrow pass -> array<int> of per-pattern RE2 match counts
    (non-overlapping, left-to-right — the regexp_extract_all count
    semantics both engines share).  ``lower``: count on the lowercased
    text (marker words); raw otherwise (char-class densities)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def counts(s: pd.Series) -> pd.Series:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(s, type=pa.string())
        src = pc.utf8_lower(arr) if lower else arr
        cols = [
            pc.fill_null(
                pc.count_substring_regex(src, pattern=p), 0
            ).to_numpy(zero_copy_only=False)
            for p in patterns
        ]
        mat = np.stack(cols, axis=1)
        null = np.asarray(pc.is_null(arr))
        out = [None if null[i] else mat[i] for i in range(len(arr))]
        return pd.Series(out, dtype=object)

    return counts


def _replace_chain_kernel(steps: list[tuple[str, str]], collapse: bool):
    """One Arrow pass applying an RE2 replace chain (global,
    non-overlapping, literal replacements) + optional whitespace collapse
    and ASCII-space trim — byte-identical to the Catalyst
    regexp_replace chain on these engine-portable patterns."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def chain(s: pd.Series) -> pd.Series:
        import pyarrow as pa
        import pyarrow.compute as pc

        out = pa.Array.from_pandas(s, type=pa.string())
        for pat, repl in steps:
            out = pc.replace_substring_regex(
                out, pattern=pat, replacement=repl
            )
        if collapse:
            out = pc.utf8_trim(
                pc.replace_substring_regex(out, pattern=r"\s+", replacement=" "),
                characters=" ",
            )
        return out.to_pandas()

    return chain


def normalize_text(
    text: Column, collapse_whitespace: bool = True, impl: str = "arrow"
) -> Column:
    """Web-corpus text cleanup (the C4/CCNet-style pre-pass): strip control
    characters, fold exotic Unicode spaces / curly quotes / long dashes /
    ellipsis to ASCII, then (optionally) collapse whitespace runs and trim.
    Every pattern is engine-portable (oracle-checked byte-exact in DuckDB).
    ``impl='arrow'`` (default, r7) runs the chain through pyarrow's RE2 in
    one Arrow pass (the Catalyst chain measured 3.6 s at sf1.0, ~6 full
    java-regex passes over every doc); ``impl='expr'`` keeps the pure-
    Catalyst whole-stage-codegen chain (parity-pinned)."""
    out = F.coalesce(text, F.lit(""))
    if impl == "arrow":
        return _replace_chain_kernel(CLEANUP_STEPS, collapse_whitespace)(out)
    if impl != "expr":
        raise ValueError(f"unknown normalize_text impl: {impl!r}")
    for pat, repl in CLEANUP_STEPS:
        out = F.regexp_replace(out, pat, repl)
    if collapse_whitespace:
        out = F.trim(F.regexp_replace(out, r"\s+", " "))
    return out


def doc_fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint of the normalized text (md5 — same
    bytes-in/bytes-out in Spark and DuckDB, so oracle-checkable)."""
    return F.md5(_norm(text))


def _count_matches(text: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pat), 0))


def _quality_counts_kernel(stop_pat: str):
    """One Arrow pass -> [toks, stop, punct, alpha] int counts for
    :func:`quality_score` (see its docstring for the count equivalences).
    Stopwords counted on the lowercased text; the rest on the raw."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def counts(s: pd.Series) -> pd.Series:
        import numpy as np
        import pyarrow as pa
        import pyarrow.compute as pc

        arr = pa.Array.from_pandas(s, type=pa.string())
        # alpha = total codepoints - non-alpha codepoints: counting the
        # POSITIVE class iterates one RE2 match per letter (~every char on
        # prose, measured 1.35 s alone at sf1.0); the negated class
        # matches ~5x fewer positions and utf8_length is vectorized.
        # Equal by construction: every codepoint is alpha or non-alpha.
        alpha = pc.subtract(
            pc.utf8_length(arr),
            pc.count_substring_regex(arr, pattern=r"[^A-Za-z]"),
        )
        cols = [
            pc.count_substring_regex(arr, pattern=r"\S+"),
            pc.count_substring_regex(pc.utf8_lower(arr), pattern=stop_pat),
            pc.count_substring_regex(arr, pattern=r"[!-/:-@\[-`{-~]"),
            alpha,
        ]
        mat = np.stack(
            [
                pc.fill_null(c, 0).to_numpy(zero_copy_only=False)
                for c in cols
            ],
            axis=1,
        )
        null = np.asarray(pc.is_null(arr))
        out = [None if null[i] else mat[i] for i in range(len(arr))]
        return pd.Series(out, dtype=object)

    return counts


def lang_id(text: Column, impl: str = "arrow") -> Column:
    """Marker-stopword language heuristic: argmax of per-language marker hit
    counts, ties broken by language-code order (deterministic).
    ``impl='arrow'`` (default, r7): the 4 marker counts come from ONE Arrow
    RE2 pass (the 4-java-regex Catalyst form measured 3.9 s at sf1.0); the
    argmax chain and the empty-text guard stay Catalyst-side, so both
    impls — and the DuckDB oracle — agree exactly (integer counts only
    cross the boundary)."""
    items = sorted(LANG_MARKERS.items())
    if impl == "arrow":
        pats = [r"\b(" + "|".join(ws) + r")\b" for _, ws in items]
        c = _marker_counts_kernel(pats, lower=True)(text)
        scored = [(c[i], code) for i, (code, _) in enumerate(items)]
    elif impl == "expr":
        scored = [(_count_matches(text, ws), code) for code, ws in items]
    else:
        raise ValueError(f"unknown lang_id impl: {impl!r}")
    best = scored[0]
    expr = F.lit(best[1])
    best_n = best[0]
    for n, code in scored[1:]:
        expr = F.when(n > best_n, F.lit(code)).otherwise(expr)
        best_n = F.greatest(n, best_n)
    return F.when(F.coalesce(F.length(F.trim(text)), F.lit(0)) == 0, F.lit("und")).otherwise(expr)


def quality_score(text: Column, impl: str = "arrow") -> Column:
    """Document quality in [0, 1]: length saturation, stopword presence,
    low punctuation density, alpha density.  The exact formula is arbitrary
    but FIXED — the oracle recomputes it verbatim; rounded to 4 dp so both
    engines hash identically.  ``impl='arrow'`` (default, r7): the four
    integer inputs (token/stopword/punct/alpha counts) come from ONE Arrow
    RE2 pass — token count as the number of ``\\S+`` runs (== the split
    count on trimmed text), char-class densities as positive-class match
    counts (== length minus the negated-class strip) — and the float
    formula stays Catalyst-side, so both impls and the DuckDB oracle are
    bit-identical (``impl='expr'`` = the original Catalyst chain,
    parity-pinned)."""
    n_chars = F.length(text)
    if impl == "arrow":
        stop_pat = r"\b(" + "|".join(STOPWORDS) + r")\b"
        c = _quality_counts_kernel(stop_pat)(text)
        toks, stop, punct, alpha = c[0], c[1], c[2], c[3]
    elif impl == "expr":
        toks = token_count(text)
        stop = _count_matches(text, STOPWORDS)
        punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
        alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    else:
        raise ValueError(f"unknown quality_score impl: {impl!r}")
    len_score = F.least(F.lit(1.0), n_chars.cast("double") / F.lit(500.0))
    stop_frac = F.when(toks > 0, stop.cast("double") / toks.cast("double")).otherwise(F.lit(0.0))
    punct_frac = F.when(n_chars > 0, punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    alpha_frac = F.when(n_chars > 0, alpha.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    score = (
        F.lit(0.35) * len_score
        + F.lit(0.25) * F.least(F.lit(1.0), stop_frac * 4)
        + F.lit(0.20) * (F.lit(1.0) - F.least(F.lit(1.0), punct_frac * 5))
        + F.lit(0.20) * alpha_frac
    )
    return F.round(score, 4)


# PII patterns chosen for cross-engine parity: Java regex (Spark) and RE2
# (DuckDB) agree on these constructs — character classes, bounded repeats,
# non-capturing groups, ASCII \b; NO backrefs or lookaround (RE2 lacks
# them).  Order matters: email first (its local part may contain digits),
# then SSN before phone (disjoint middle-group widths, but explicit order
# keeps the output stable if patterns evolve), IP last (cannot match the
# 4-digit phone tail, \b blocks partial digit runs).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
]


def redact_pii(
    text: Column, kinds: tuple[str, ...] | None = None, impl: str = "arrow"
) -> Column:
    """Mask common PII shapes with typed placeholder tokens — the scrub
    pass a training corpus runs before export (emails, SSNs, phone
    numbers, IPv4 addresses -> ``<EMAIL>``/``<SSN>``/``<PHONE>``/``<IP>``).

    Global replacement, deterministic; patterns are RE2-safe so a DuckDB
    oracle reproduces the output byte-for-byte.  ``kinds`` selects a
    subset (in PII_PATTERNS order).  ``impl='arrow'`` (default, r7) runs
    the replace chain through pyarrow's RE2 in one Arrow pass (the
    4-java-regex Catalyst chain measured 4.1 s at sf1.0);
    ``impl='expr'`` keeps the pure-Catalyst chain (parity-pinned)."""
    steps = [
        (pat, repl)
        for name, pat, repl in PII_PATTERNS
        if kinds is None or name in kinds
    ]
    if impl == "arrow":
        return _replace_chain_kernel(steps, collapse=False)(text)
    if impl != "expr":
        raise ValueError(f"unknown redact_pii impl: {impl!r}")
    out = text
    for pat, repl in steps:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column, impl: str = "arrow") -> list[Column]:
    """One count column per PII kind (``n_<kind>``) — corpus-audit stats;
    non-overlapping left-to-right matching in both engines.  The arrow
    impl (default, r7) computes all four counts in ONE Arrow RE2 pass —
    the four element references share a single kernel evaluation
    (duplicate deterministic UDF expressions collapse to one
    ArrowEvalPython node, plan-checked)."""
    if impl == "arrow":
        c = _marker_counts_kernel(
            [pat for _, pat, _ in PII_PATTERNS], lower=False
        )(text)
        # NULL text: the expr form is size(regexp_extract_all(NULL)) whose
        # value is SESSION-dependent (-1 under legacy sizeOfNull / ANSI
        # off, NULL under ANSI on) — reproduce it exactly by evaluating
        # size(NULL array) in the session instead of baking one choice
        # into the kernel
        null_size = F.size(F.lit(None).cast("array<string>"))
        return [
            F.when(text.isNull(), null_size)
            .otherwise(c[i])
            .alias(f"n_{name}")
            for i, (name, _, _) in enumerate(PII_PATTERNS)
        ]
    if impl != "expr":
        raise ValueError(f"unknown pii_counts impl: {impl!r}")
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]


def repetition_ratio(text: Column, n: int = 3, impl: str = "arrow") -> Column:
    """Intra-document repetition: 1 - distinct/total word n-grams — the
    Gopher-style repetition filter (public practice: highly repetitive
    docs are boilerplate/spam and poison training).  0 = no repeated
    n-gram, -> 1 as the doc degenerates into a loop.  Rounded to 4 dp;
    docs shorter than n words score 0.0.

    ``impl='arrow'`` (default): the per-row gram loop runs in an Arrow
    pandas UDF — Catalyst HOF lambdas evaluate INTERPRETED per element
    (~us each; the 'expr' form measured 3.8 s vs ~0.5 s on the 5k-doc
    sf0.1 corpus — same lesson as the IVF argmin kernels).  The UDF
    returns only the RAW (total, distinct) integer counts; the division
    and rounding stay Catalyst-side, so both impls — and the DuckDB
    oracle — are bit-identical.  ``impl='expr'`` keeps the pure-Catalyst
    form (useful where a Python runtime is unavailable); equality is
    pytest-enforced."""
    norm = _norm(text)
    if impl == "expr":
        words = F.split(norm, " ")
        total = F.greatest(F.size(words) - (n - 1), F.lit(0))
        grams = F.transform(
            F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
        distinct = F.size(F.array_distinct(grams))
        return F.round(
            F.when(total > 0,
                   F.lit(1.0) - distinct.cast("double") / total.cast("double"))
            .otherwise(F.lit(0.0)),
            4,
        )
    if impl != "arrow":
        raise ValueError(f"unknown repetition_ratio impl: {impl!r}")

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _counts(s: pd.Series) -> pd.Series:
        out = []
        for t in s:
            if not t:
                out.append([0, 0])
                continue
            w = t.split(" ")
            total = len(w) - (n - 1)
            if total <= 0:
                out.append([0, 0])
                continue
            out.append([total, len({tuple(w[i:i + n]) for i in range(total)})])
        return pd.Series(out)

    c = _counts(norm)
    total, distinct = c[0], c[1]
    return F.round(
        F.when(total > 0,
               F.lit(1.0) - distinct.cast("double") / total.cast("double"))
        .otherwise(F.lit(0.0)),
        4,
    )


def vocab_top_k(docs, k: int = 100, text_col: str = "text"):
    """Corpus vocabulary: the k most frequent normalized words (count desc,
    word asc — boundary ties deterministic).  The counting prep every
    tokenizer-training / frequency-filter pass starts from.  Plan: explode
    (map-only) -> one partial-agg count shuffle -> TakeOrderedAndProject
    (per-partition top-k, never a full sort); word space, not doc space,
    bounds the agg state."""
    from pyspark.sql import functions as F

    words = docs.select(
        F.explode(F.split(_norm(F.col(text_col)), " ")).alias("word")
    ).where(F.col("word") != "")
    counts = words.groupBy("word").agg(F.count("*").alias("n"))
    return counts.orderBy(F.col("n").desc(), F.col("word").asc()).limit(k)
