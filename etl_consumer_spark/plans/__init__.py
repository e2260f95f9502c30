"""Named query plans: the driver-facing registry mapping every implemented
operator (SURVEY §2) to a Spark DataFrame builder and a DuckDB oracle."""

from etl_consumer_spark.plans.queries import QUERIES, QueryDef, oracle_sql_dict, queries_dict

__all__ = ["QUERIES", "QueryDef", "oracle_sql_dict", "queries_dict"]
