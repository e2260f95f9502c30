"""Kafka streaming source builders S1-S4 (SURVEY §2.1).

Reference: a librdkafka consumer subscribing to per-table CDC topics or the
schema topic (main.go:30-68). Here the same topology is a Structured
Streaming source; consumer-group offset management becomes checkpointing,
and the poll loop becomes micro-batch triggers.

No broker exists in the test container — these builders are exercised
end-to-end in tests through the file-based envelope source
(:func:`file_envelope_stream`), which produces byte-identical downstream
DataFrames (topic/value/headers columns) for the same pipeline code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_consumer_spark.config import Config

# What the downstream pipeline expects from any envelope transport.
TRANSPORT_SCHEMA = T.StructType(
    [
        T.StructField("topic", T.StringType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("headers", T.ArrayType(
            T.StructType(
                [
                    T.StructField("key", T.StringType()),
                    T.StructField("value", T.BinaryType()),
                ]
            )
        )),
        T.StructField("timestamp", T.TimestampType()),
    ]
)


def _require_kafka(spark: SparkSession) -> None:
    """The spark-sql-kafka connector jar is not bundled with a plain pyspark
    install; fail with an actionable message instead of Spark's generic
    DATA_SOURCE_NOT_FOUND (tests use the file transport, which needs no
    broker or jar)."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as exc:
        raise RuntimeError(
            "Kafka source requires the spark-sql-kafka-0-10 package "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>); "
            "use file_envelope_stream for broker-free runs"
        ) from exc


def kafka_stream(spark: SparkSession, cfg: Config) -> DataFrame:
    """S1-S4 — subscribe to the config's topic list (per-table CDC topics,
    or the schema topic alone under ActiveScheme — reference main.go:50-58),
    with offset policy and backpressure.

    Checkpointing supplies the consumer-group semantics (S3); the driver
    must set ``checkpointLocation`` on the writer side."""
    _require_kafka(spark)
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka)
        .option("subscribe", ",".join(cfg.topics()))
        .option("startingOffsets", "earliest" if cfg.auto_offset == "earliest" else "latest")
        .option("includeHeaders", "true")
        .option("maxOffsetsPerTrigger", str(cfg.max_offsets_per_trigger))
        .option("failOnDataLoss", "false")
        .load()
        .select("topic", "value", "headers", "timestamp")
    )


def kafka_batch(spark: SparkSession, cfg: Config) -> DataFrame:
    """Batch-mode replay of the same topics (for backfills): identical
    downstream schema, bounded read."""
    _require_kafka(spark)
    return (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", cfg.kafka)
        .option("subscribe", ",".join(cfg.topics()))
        .option("startingOffsets", "earliest")
        .option("endingOffsets", "latest")
        .option("includeHeaders", "true")
        .load()
        .select("topic", "value", "headers", "timestamp")
    )


def file_envelope_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """Broker-free transport: a file stream of (topic, value, headers,
    timestamp) rows in parquet under ``path``. Same columns as the Kafka
    source, so the whole pipeline (parse → route → decode → apply) is the
    production code path; used by tests and availableNow backfills.

    ``max_files_per_trigger`` bounds each micro-batch (the file-source
    analog of Kafka's maxOffsetsPerTrigger): an availableNow replay then
    processes the backlog as MULTIPLE sequential batches with a state
    commit between each — how a large backfill actually runs, and what the
    cross-batch exactly-once test drives."""
    reader = spark.readStream.schema(TRANSPORT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def file_envelope_batch(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(TRANSPORT_SCHEMA).parquet(path)


def as_transport(df: DataFrame) -> DataFrame:
    """Normalize any source to the transport schema (adds missing optional
    columns as nulls)."""
    cols = {f.name for f in df.schema.fields}
    out = df
    if "headers" not in cols:
        out = out.withColumn(
            "headers", F.lit(None).cast("array<struct<key:string,value:binary>>")
        )
    if "timestamp" not in cols:
        out = out.withColumn("timestamp", F.lit(None).cast("timestamp"))
    return out.select("topic", "value", "headers", "timestamp")
