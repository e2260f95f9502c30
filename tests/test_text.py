"""F8-F10 text-function tests against a pure-Python port of the reference
semantics (utils/clean.go), char-based per the documented divergence."""

from __future__ import annotations

from etl_consumer_spark import functions as EF
from etl_consumer_spark.functions.text import _DELETIONS, _MULTI_REPLACEMENTS, _SUBSTITUTIONS

CHAR_MAP = dict(_MULTI_REPLACEMENTS) | dict(_SUBSTITUTIONS) | {c: "" for c in _DELETIONS}


def py_clean_text(text: str, max_length: int) -> str:
    """Python port of reference utils/clean.go:9-102 (char-based lengths)."""
    if len(text) < 5:
        return ""
    if "\n" in text:
        sections = text.split("\n")
        new_text = sections[0]
        for s in sections[1:]:
            if len(new_text) < max_length:
                new_text = new_text + " " + s
        text = new_text
    text = "".join(CHAR_MAP.get(c, c) for c in text)
    if len(text) > max_length:
        return text[: max_length - 3] + "..."
    return text


def test_char_map_matches_reference_size():
    # reference charMap (utils/clean.go:26-81) has 54 distinct keys
    assert len(CHAR_MAP) == 54


def test_clean_text(spark):
    samples = [
        "ab",                                  # < 5 chars -> ""
        "hello world",
        "line one\nline two\nline three",
        "x" * 50,                              # truncation
        "rock & roll … done",                  # multi-char replacements
        "curly ‘quotes’ and “double”",
        "dash – em — bullet • ok",
        "emoji \U0001f525 fire \U0001f44d up",
        "nb\xa0sp and \xfcmlaut",
        "first line is quite long here\nsecond\nthird\nfourth",
    ]
    max_len = 30
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    out = [r[0] for r in df.select(EF.clean_text("s", max_len)).collect()]
    for s, got in zip(samples, out):
        assert got == py_clean_text(s, max_len), f"mismatch for {s!r}: {got!r}"


def test_clean_string(spark):
    df = spark.createDataFrame([("a-b c_d1!@#",), ("",), ("...",)], "s string")
    out = [r[0] for r in df.select(EF.clean_string("s")).collect()]
    assert out == ["abcd1", "", ""]


def test_sanitize_basename(spark):
    df = spark.createDataFrame([("Error 1062: Duplicate entry 'x' for key",)], "s string")
    out = [r[0] for r in df.select(EF.sanitize_basename("s")).collect()]
    assert out == ["Error-1062-Duplicate-entry-x-for-key"]


def test_repetition_signals_edges(spark):
    """Gopher repetition battery: empty doc scores 0 everywhere; a looping
    doc scores high; a clean doc keeps."""
    from pyspark.sql import functions as F

    from etl_consumer_spark.extensions.text_analysis import (
        duplicate_line_fraction,
        duplicate_ngram_fraction,
        gopher_repetition_signals,
        passes_gopher_filters,
    )

    docs = spark.createDataFrame(
        [
            (1, ""),                                          # empty
            (2, "spam spam spam spam spam spam"),             # 2-gram loop
            (3, "nav\nnav\nnav\nbody text here"),             # dup lines
            (4, "The quick brown fox jumps over the lazy dog today."),
            (5, "1 2 3 4 5 6 7 8 9 10"),                      # all-digit
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            *[c.alias(n) for n, c in gopher_repetition_signals(F.col("text"))],
            passes_gopher_filters(F.col("text")).alias("keep"),
        ).collect()
    }
    assert rows[1]["dup_line_frac"] == 0.0 and rows[1]["dup_2gram_frac"] == 0.0
    # "spam spam" x5 -> 5 bigrams, 1 distinct -> 4/5
    assert abs(rows[2]["dup_2gram_frac"] - 0.8) < 1e-9
    assert not rows[2]["keep"]
    # 4 lines, 2 distinct -> 2/4 duplicated
    assert abs(rows[3]["dup_line_frac"] - 0.5) < 1e-9
    assert not rows[3]["keep"]
    assert rows[4]["keep"]
    assert rows[5]["alpha_word_frac"] == 0.0 and not rows[5]["keep"]


def test_word_ngrams_not_distinct(spark):
    from pyspark.sql import functions as F

    from etl_consumer_spark.extensions.text_analysis import word_ngrams

    df = spark.createDataFrame([("a b a b",)], "text string")
    out = df.select(word_ngrams(F.col("text"), 2).alias("g")).collect()[0]["g"]
    assert out == ["a b", "b a", "a b"]   # repetition preserved
