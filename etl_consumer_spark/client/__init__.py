"""External-control clients (X1/X2: Debezium Connect REST)."""

from etl_consumer_spark.client.debezium import DebeziumAPI

__all__ = ["DebeziumAPI"]
