"""Unicode normalization: unicodedata reference parity, NFKC folding,
idempotence, null safety, and DuckDB NFC cross-engine agreement."""

from __future__ import annotations

import unicodedata

import duckdb
import pytest
from pyspark.sql import functions as F

from financial_big_data_spark.operators.textnorm import normalize_text

ADVERSARIAL = [
    "café meets café",          # decomposed vs composed
    "ﬁle and ＡＢＣ 123",  # ligature + fullwidth
    "tabs\tand\nnewlines\r\nsurvive as spaces",
    "ctrl\x00\x07\x1fchars\x7fgone",
    "  doubled   spaces   collapse  ",
    "½ + ¼ = ¾",            # vulgar fractions (NFKC folds)
    "",
]


def _py_reference(t, form):
    n = unicodedata.normalize(form, t)
    n = "".join(
        c for c in n
        if not (ord(c) <= 0x08 or 0x0B <= ord(c) <= 0x0C
                or 0x0E <= ord(c) <= 0x1F or ord(c) == 0x7F)
    )
    return " ".join(n.split())


@pytest.mark.parametrize("form", ["NFC", "NFKC"])
def test_normalize_matches_python_reference(spark, form):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], "id long, text string"
    )
    got = {
        r.id: r.text
        for r in normalize_text(df, form=form).collect()
    }
    for i, t in enumerate(ADVERSARIAL):
        assert got[i] == _py_reference(t, form), (form, i)


def test_normalize_idempotent(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ADVERSARIAL)], "id long, text string"
    )
    once = normalize_text(df, form="NFKC")
    twice = normalize_text(once, form="NFKC")
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_normalize_null_passthrough(spark):
    df = spark.createDataFrame([(1, None), (2, "ok")], "id long, text string")
    got = {r.id: r.text for r in normalize_text(df).collect()}
    assert got[1] is None and got[2] == "ok"


def test_nfkc_folds_compatibility_forms(spark):
    df = spark.createDataFrame(
        [(1, "ﬁle ＡＢ ½")], "id long, text string"
    )
    out = normalize_text(df, form="NFKC").collect()[0].text
    assert out == "file AB 1⁄2"  # ligature→fi, fullwidth→AB, ½→1⁄2


def test_duckdb_nfc_agrees_with_python(spark):
    """The oracle contract: DuckDB nfc_normalize must equal unicodedata
    NFC on the adversarial set — if an engine upgrade ever breaks this,
    the doc_normalized oracle breaks loudly here first."""
    for t in ADVERSARIAL:
        duck = duckdb.sql("select nfc_normalize(?)", params=[t]).fetchone()[0]
        assert duck == unicodedata.normalize("NFC", t), repr(t)


def test_unknown_form_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")
