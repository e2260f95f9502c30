"""Structured Streaming wiring (SURVEY §7 Phase 4)."""

from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec
from etl_consumer_spark.streaming.scd2 import SCD2StreamMaintainer

__all__ = ["CDCPipeline", "TableSpec", "SCD2StreamMaintainer"]
