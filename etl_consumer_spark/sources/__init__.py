"""Sources S1-S7: Kafka / file transports, envelope parse, testdata tables."""

from etl_consumer_spark.sources.envelope import (
    WireField,
    bind_decoder,
    decode_envelope,
    decode_image,
    parse_ddl_envelope,
    parse_dml_envelope,
)
from etl_consumer_spark.sources.kafka import (
    TRANSPORT_SCHEMA,
    as_transport,
    file_envelope_batch,
    file_envelope_stream,
    kafka_batch,
    kafka_stream,
)
from etl_consumer_spark.sources.tables import TABLES, load_table, load_tables, register_views

__all__ = [
    "TABLES",
    "TRANSPORT_SCHEMA",
    "WireField",
    "as_transport",
    "bind_decoder",
    "decode_envelope",
    "decode_image",
    "file_envelope_batch",
    "file_envelope_stream",
    "kafka_batch",
    "kafka_stream",
    "load_table",
    "load_tables",
    "parse_ddl_envelope",
    "parse_dml_envelope",
    "register_views",
]
