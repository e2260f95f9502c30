"""CSV/JSONL source roundtrip hardening.

Regression for the ADVICE finding that the CSV reader lacked
``multiLine=true``: quote/escape protect embedded delimiters and quotes, but
a quoted field containing a raw newline splits into two records unless the
reader parses multi-line records. The driver testdata happens to contain no
newlines in ``documents.text``; these tests pin the behavior with inputs
that do.
"""

import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

NASTY = [
    (1, "plain text"),
    (2, "embedded,comma and \"quotes\""),
    (3, "line one\nline two\nline three"),
    (4, "trailing newline\n"),
    (5, "\nleading newline"),
    (6, "crlf\r\nline"),
    (7, ""),
    (8, None),
]


def _roundtrip_csv(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    base = tempfile.mkdtemp(prefix="csv_rt_")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(f"{base}/docs")
    )
    return (
        spark.read.schema(SCHEMA)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(f"{base}/docs")
    )


def test_csv_roundtrip_preserves_embedded_newlines(spark):
    back = _roundtrip_csv(spark, NASTY)
    got = {r["doc_id"]: r["text"] for r in back.collect()}
    # CSV cannot distinguish empty string from null without emptyValue
    # tricks; both sides of the roundtrip agree they are null-ish. Compare
    # the rest byte-for-byte — in particular rows 3-6 survive intact
    # instead of shearing into extra records.
    assert len(got) == len(NASTY)
    for doc_id, text in NASTY:
        if text:
            assert got[doc_id] == text, f"doc {doc_id} mangled: {got[doc_id]!r}"
        else:
            assert got[doc_id] in (None, ""), got[doc_id]


def test_csv_roundtrip_row_count_without_multiline_would_shear(spark):
    """Documents the failure mode being guarded: without multiLine the
    newline-bearing rows parse as extra (malformed) records."""
    df = spark.createDataFrame(NASTY, SCHEMA)
    base = tempfile.mkdtemp(prefix="csv_rt_nm_")
    (
        df.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(f"{base}/docs")
    )
    naive = (
        spark.read.schema(SCHEMA)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .csv(f"{base}/docs")
    )
    assert naive.count() != len(NASTY)


def test_registered_csv_roundtrip_matches_source(spark):
    """The registered query's md5 oracle shape, run on sf0.001."""
    from etl_consumer_spark.plans.queries import QUERIES
    from etl_consumer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = QUERIES["source_csv_roundtrip"].fn(spark, sf)
    docs = load_table(spark, sf, "documents").select(
        "doc_id", F.md5(F.col("text").cast("binary")).alias("text_md5")
    )
    diff = (
        out.select("doc_id", "text_md5")
        .exceptAll(docs)
        .count()
    )
    assert diff == 0
