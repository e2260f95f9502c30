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
    not_before_from_headers,
    republish_gate,
    republish_headers,
)


def republish_frame(failed: DataFrame, limit: int = 3, delay_ms: int | None = None) -> DataFrame:
    """Build the (topic, value, headers) frame for messages that should be
    retried: parse the current loop header, gate on the limit, and attach
    the incremented header. ``delay_ms`` adds a ``not_before`` deadline
    header (E3) honored by :func:`split_due` on the consume side."""
    lc = loop_count_from_headers("headers")
    return (
        failed.withColumn("_lc", lc)
        .filter(republish_gate(F.col("_lc"), limit))
        .select(
            "topic",
            "value",
            republish_headers(next_attempt(F.col("_lc")), delay_ms=delay_ms).alias("headers"),
        )
    )


def split_due(batch: DataFrame, now_ms: int | None = None) -> tuple[DataFrame, DataFrame]:
    """E3 consume side — split a transport batch into (due, deferred) by the
    ``not_before`` header. Deferred messages are re-fed to the transport
    VERBATIM (headers untouched, so deferral never consumes a retry
    attempt) until their deadline passes — the micro-batch equivalent of
    the reference's 100 ms sleep-then-republish (main.go:180), without
    blocking an executor. ``now_ms=None`` uses the batch wall clock."""
    nb = not_before_from_headers("headers")
    now = F.lit(now_ms) if now_ms is not None else F.unix_millis(F.current_timestamp())
    is_due = nb.isNull() | (nb <= now)
    return batch.filter(is_due), batch.filter(~is_due)


def write_republish(df: DataFrame, bootstrap_servers: str) -> None:
    """Produce the retry batch back to Kafka (topic taken per-row from the
    ``topic`` column, matching the reference's republish-to-source-topic)."""
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("includeHeaders", "true")
        .save()
    )
