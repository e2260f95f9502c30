"""F8-F10 text-function tests against a pure-Python port of the reference
semantics (utils/clean.go), char-based per the documented divergence."""

from __future__ import annotations

from pyspark.sql import functions as F

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


# -- round-5 additions: chunking + mix upsampling ---------------------------


def test_chunk_split_covers_all_tokens(spark):
    from etl_consumer_spark.extensions.text_analysis import chunk_spans

    rows = [
        (1, " ".join(f"t{i}" for i in range(200))),  # 200 tokens -> 4 chunks
        (2, "short doc"),                             # 1 chunk
        (3, " ".join(f"t{i}" for i in range(64))),    # exactly one window
        (4, " ".join(f"t{i}" for i in range(65))),    # one full + one partial
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = (
        df.select("doc_id", F.explode(chunk_spans(F.col("text"), 64, 16)).alias("c"))
        .select("doc_id", "c.chunk_idx", "c.chunk_text", "c.n_tokens")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # stride 48: 200 tokens -> chunks start at 0,48,96,144 (4 chunks)
    assert len(by_doc[1]) == 4
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 2
    assert len(by_doc[3]) == 1
    assert len(by_doc[4]) == 2 and by_doc[4][1]["n_tokens"] == 65 - 48
    # overlap property: consecutive chunks share exactly 16 tokens
    c0, c1 = by_doc[1][0]["chunk_text"].split(), by_doc[1][1]["chunk_text"].split()
    assert c0[48:] == c1[:16]
    # coverage: union of chunk tokens reconstructs the document
    seen = []
    for i, r in enumerate(sorted(by_doc[1], key=lambda r: r["chunk_idx"])):
        toks = r["chunk_text"].split()
        seen.extend(toks if i == 0 else toks[16:])
    assert seen == [f"t{i}" for i in range(200)]


def test_chunk_overlap_must_be_smaller(spark):
    import pytest as _pytest

    from etl_consumer_spark.extensions.text_analysis import chunk_spans

    with _pytest.raises(ValueError):
        chunk_spans(F.lit("x"), chunk_tokens=16, overlap=16)


def test_upsample_mix_expected_multiplicity(spark):
    from etl_consumer_spark.extensions.text_analysis import upsample_counts

    rows = [(i, "web" if i % 3 == 0 else ("code" if i % 3 == 1 else "other"))
            for i in range(6000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    cnt = upsample_counts(F.col("doc_id"), F.col("source"), {"web": 2.5, "code": 0.3})
    agg = (
        df.select("source", cnt.alias("n"))
        .groupBy("source")
        .agg(F.avg("n").alias("m"), F.min("n").alias("lo"), F.max("n").alias("hi"))
        .collect()
    )
    by = {r["source"]: r for r in agg}
    # md5 selection is uniform: means land near the weights; bounds exact
    assert 2.3 < by["web"]["m"] < 2.7 and by["web"]["lo"] == 2 and by["web"]["hi"] == 3
    assert 0.2 < by["code"]["m"] < 0.4 and by["code"]["lo"] == 0 and by["code"]["hi"] == 1
    assert by["other"]["m"] == 1.0  # unlisted source passes through once


def test_upsample_mix_is_deterministic(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    a = QUERIES["sample_upsample_mix"].fn(spark, "/root/testdata/sf0.001").collect()
    b = QUERIES["sample_upsample_mix"].fn(spark, "/root/testdata/sf0.001").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
