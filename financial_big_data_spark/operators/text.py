"""Text-analysis operators for large-corpus pipelines (BASELINE.json north star).

Beyond-reference surface: language ID, quality scoring, token counting and
document fingerprinting over the ``documents`` table. Everything here is
built-in Column expressions — JVM-side, whole-stage-codegen'd, no Python in
the hot path — and embarrassingly parallel (no shuffle at all until an
aggregation is requested), so it scales linearly to a 100 TB corpus.

Tokenization is a bare single-space split (kept deliberately primitive so the
DuckDB oracle can reproduce it byte-for-byte with ``string_split``); swap in
``F.split(text, r'\\s+')`` for real corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker vocabularies for the n-gram/stopword heuristic
# language ID. Deterministic and oracle-expressible; a production pipeline
# would plug a fastText-style model in via predict_batch_udf.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "de", "et", "un"],
    "de": ["der", "die", "und", "das", "ein"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"]


def tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def _count_token(toks: Column, word: str) -> Column:
    return F.size(F.filter(toks, lambda t: t == F.lit(word)))


def _count_tokens_any(text: Column, words: list[str]) -> Column:
    """Total occurrences of any ``words`` member as a single-space-split
    token of ``text`` — ONE codegen'd ``regexp_count`` scan.

    Exactly equivalent to ``sum(_count_token(split(text, " "), w))``: a
    token matches iff it is delimited by string start/end or a literal
    space, and exact equality means each token can match at most one
    alternative, so the alternation never double-counts. The lambda form
    it replaces ran 30 *interpreted* higher-order filters per row — and,
    with no common-subexpression elimination in interpreted expressions,
    re-ran the ``split`` for every one of them (measured 2-3s of the
    curation gate's quality stage at sf0.1; optimization guide §4.1
    "prefer built-ins"). NULL text → NULL, matching size(filter(NULL)).

    The leading delimiter is CONSUMED by each match while the trailing one
    is a lookahead, so consecutive stopword tokens ("the the") each find
    their own leading space (the shared space is consumed exactly once as
    the second token's lead)."""
    import re as _re

    alt = "|".join(_re.escape(w) for w in words)
    return F.regexp_count(text, F.lit(f"(?:^| )(?:{alt})(?= |$)"))


def text_stats(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features: token/char counts, avg token length,
    punctuation & digit & whitespace ratios, stopword ratio, uppercase ratio.
    """
    t = F.col(text)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    stop_hits = F.lit(0) + _count_tokens_any(t, STOPWORDS)
    punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = n_chars - F.length(F.regexp_replace(t, r" ", ""))
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_text"),
        n_tokens.alias("n_tokens"),
        F.try_divide((n_chars - spaces).cast("double"), n_tokens).alias("avg_token_len"),
        F.try_divide(punct.cast("double"), n_chars).alias("punct_ratio"),
        F.try_divide(digits.cast("double"), n_chars).alias("digit_ratio"),
        F.try_divide(stop_hits.cast("double"), n_tokens).alias("stopword_ratio"),
    )


def language_id(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language scoring → argmax label.

    Emits one score column per candidate language plus the predicted label;
    ties break on language code order (deterministic).
    """
    t = F.col(text)
    scores = {
        lang: F.lit(0) + _count_tokens_any(t, words)
        for lang, words in LANG_MARKERS.items()
    }
    out = docs.select(
        F.col(id_col),
        *[s.alias(f"score_{lang}") for lang, s in scores.items()],
    )
    # argmax over score columns, tie → lexicographically smallest lang code
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", F.when(best > 0, pred).otherwise(F.lit("und")))


def fingerprint(docs: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic document fingerprint: md5 of the lower-cased,
    space-normalized text (cross-engine stable — DuckDB md5 matches)."""
    normalized = F.lower(F.regexp_replace(F.col(text), r"\s+", " "))
    return docs.select(
        F.col(id_col),
        F.md5(normalized).alias("fingerprint"),
    )


def text_profile(
    docs: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    keep_text: bool = False,
) -> DataFrame:
    """``text_stats`` + ``language_id`` fused into ONE map-only select.

    Same columns as the two operators joined on ``id_col``, without the join:
    every expression shares the single tokenize pass and the whole profile
    stays inside one whole-stage-codegen span (no shuffle at any scale).

    ``keep_text`` carries the raw ``text`` column through the projection —
    consumers that need the text alongside the stats (the curation DAG's
    quality gate) would otherwise re-join the corpus to itself on
    ``id_col``, a full shuffle of both sides purely to re-attach a column
    this select already had in hand (optimization guide §2.4).
    """
    t = F.col(text)
    toks = tokens(t)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    stop_hits = F.lit(0) + _count_tokens_any(t, STOPWORDS)
    punct = n_chars - F.length(F.regexp_replace(t, r"[\.,;:!\?]", ""))
    digits = n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    spaces = n_chars - F.length(F.regexp_replace(t, r" ", ""))
    scores = {
        lang: F.lit(0) + _count_tokens_any(t, words)
        for lang, words in LANG_MARKERS.items()
    }
    out = docs.select(
        F.col(id_col),
        *([t] if keep_text else []),
        n_chars.alias("n_chars_text"),
        n_tokens.alias("n_tokens"),
        F.try_divide((n_chars - spaces).cast("double"), n_tokens).alias("avg_token_len"),
        F.try_divide(punct.cast("double"), n_chars).alias("punct_ratio"),
        F.try_divide(digits.cast("double"), n_chars).alias("digit_ratio"),
        F.try_divide(stop_hits.cast("double"), n_tokens).alias("stopword_ratio"),
        *[s.alias(f"score_{lang}") for lang, s in scores.items()],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_MARKERS])
    pred = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(pred)
    return out.withColumn("pred_lang", F.when(best > 0, pred).otherwise(F.lit("und")))


# PII patterns: deliberately conservative, regex-only (JVM regexp_replace —
# map-only, no UDF). A production pipeline would layer an NER model via
# predict_batch_udf; these catch the high-volume mechanical identifiers.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"(\+?\d{1,3}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact_pii(
    docs: DataFrame,
    text: str = "text",
    out: str = "text_redacted",
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Replace mechanical PII (emails, phones, IPs, SSNs) with typed tokens
    like ``<EMAIL>`` — one chained regexp_replace per pattern, all JVM-side,
    map-only (scales linearly, no shuffle). Appends a redaction count per
    doc so downstream quality filters can drop identifier-dense documents.
    """
    patterns = patterns or PII_PATTERNS
    col = F.col(text)
    n_redactions = F.lit(0)
    for name, pat in patterns.items():
        token = f"<{name.upper()}>"
        # count BEFORE replacing (regexp_count on the running column)
        n_redactions = n_redactions + F.regexp_count(col, F.lit(pat))
        col = F.regexp_replace(col, pat, token)
    return docs.withColumn(out, col).withColumn("n_redactions", n_redactions)
