"""Sinks K1-K3: state upsert, dead-letter, Kafka republish."""

from etl_consumer_spark.sinks.dead_letter import dead_letter_rows, write_dead_letters
from etl_consumer_spark.sinks.republish import republish_frame, write_republish
from etl_consumer_spark.sinks.state import ParquetStateStore

__all__ = [
    "ParquetStateStore",
    "dead_letter_rows",
    "republish_frame",
    "write_dead_letters",
    "write_republish",
]
