"""Structured Streaming wiring (SURVEY §7 Phase 4)."""

from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec

__all__ = ["CDCPipeline", "TableSpec"]
