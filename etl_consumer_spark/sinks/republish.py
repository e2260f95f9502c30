"""K3 — Kafka republish sink with the ``loop`` retry header.

Reference: failed messages re-produce to their source topic with an
incremented ``loop`` header after a 100 ms delay, bounded by
REPUBLISH_LIMIT (publish(), main.go:174-203). Engine: the retry branch of a
micro-batch becomes one Kafka batch write (headers column supported by the
Kafka sink); the delay is the trigger interval, and the bound is the E2
gate applied before this sink."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_consumer_spark.operators.retry import (
    loop_count_from_headers,
    next_attempt,
    republish_gate,
    republish_headers,
)


def republish_frame(failed: DataFrame, limit: int = 3) -> DataFrame:
    """Build the (topic, value, headers) frame for messages that should be
    retried: parse the current loop header, gate on the limit, and attach
    the incremented header."""
    lc = loop_count_from_headers("headers")
    return (
        failed.withColumn("_lc", lc)
        .filter(republish_gate(F.col("_lc"), limit))
        .select(
            "topic",
            "value",
            republish_headers(next_attempt(F.col("_lc"))).alias("headers"),
        )
    )


def write_republish(df: DataFrame, bootstrap_servers: str) -> None:
    """Produce the retry batch back to Kafka (topic taken per-row from the
    ``topic`` column, matching the reference's republish-to-source-topic)."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("includeHeaders", "true")
        .save()
    )
