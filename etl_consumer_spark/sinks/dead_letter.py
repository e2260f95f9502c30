"""K2 — dead-letter sink.

Reference: every schema/exec error inserts ``(data, error, table_name,
db_name)`` into ``data_err``, with the error text sanitized
(main.go:76-81,92-96,143-147). Engine: an append-only parquet (or JDBC)
table with the identical four-column schema (FIXTURES.md §5)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_consumer_spark.functions.text import sanitize_basename


def dead_letter_rows(
    df: DataFrame,
    error_col: str,
    table_name: str,
    db_name: str,
    data_col: str = "value",
) -> DataFrame:
    """Shape error rows into the data_err schema, sanitizing the error text
    exactly like sanitize.BaseName usage in the reference."""
    return df.select(
        F.col(data_col).cast("string").alias("data"),
        sanitize_basename(F.col(error_col)).alias("error"),
        F.lit(table_name).alias("table_name"),
        F.lit(db_name).alias("db_name"),
    )


def write_dead_letters(df: DataFrame, path: str) -> None:
    """Append to the data_err parquet table."""
    df.write.mode("append").parquet(path)
