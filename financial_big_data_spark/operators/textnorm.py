"""Unicode text normalization — the first transform of real corpus ingest.

Web-crawled text arrives in mixed Unicode forms: decomposed accents
(e + U+0301 vs é), compatibility ligatures (ﬁ), fullwidth ASCII (Ａ１),
stray C0/C1 control bytes. Everything downstream — fingerprint dedup,
shingling, token counting, contamination hashing — keys on EXACT bytes,
so two visually identical documents in different forms silently escape
dedup unless ingest canonicalizes first.

Pipeline (one map-only pass, no shuffle):

1. **Unicode normalization** (NFC default, NFKC option) — the one step
   with no JVM builtin, done in an Arrow-batched scalar pandas UDF
   (``unicodedata.normalize`` is a C call per string; this is the
   sanctioned vectorized-Python boundary, not a row UDF).
2. **Control-character strip** — C0 controls (minus \\t \\n \\r) + DEL,
   JVM ``regexp_replace``.
3. **Whitespace collapse + trim** — ``\\s+`` → single space, JVM-side.

NFC is cross-engine verifiable: DuckDB's ``nfc_normalize`` matches
Python's ``unicodedata.normalize("NFC", ...)`` codepoint-for-codepoint
(checked in tests), so the registry query carries a full hash oracle.
NFKC (ligature/fullwidth folding — what you want before tokenization)
has no DuckDB twin and is pinned by pytest against unicodedata.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# C0 controls except \t \n \r, plus DEL — identical pattern string for
# Java regex (Spark) and RE2 (DuckDB oracle): both interpret \xNN.
CONTROL_CLASS = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def unicode_normalize_udf(form: str = "NFC"):
    """Arrow-batched scalar UDF applying ``unicodedata.normalize(form)``."""
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def _norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return _norm


def normalize_text(
    docs: DataFrame,
    text: str = "text",
    form: str = "NFC",
    out: str | None = None,
) -> DataFrame:
    """Canonicalize a text column: normalize(form) → strip control chars
    → collapse whitespace → trim. Map-only; idempotent (normalizing the
    output again is a no-op — pinned in tests)."""
    out = out or text
    norm = unicode_normalize_udf(form)(F.col(text))
    cleaned = F.regexp_replace(norm, CONTROL_CLASS, "")
    collapsed = F.trim(F.regexp_replace(cleaned, r"\s+", " "))
    return docs.withColumn(out, collapsed)
