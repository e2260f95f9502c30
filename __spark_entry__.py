"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship decode-everything pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the engine's operator registry
(etl_consumer_spark.plans.queries) — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_consumer_spark import functions as EF
from etl_consumer_spark.operators import classify_op
from etl_consumer_spark.plans import oracle_sql_dict, queries_dict
from etl_consumer_spark.sources.tables import load_table

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: build a Debezium-style wire envelope from the events
    table, decode every logical type through the engine (F1-F7), and classify
    CDC ops by image nullness (C1-C3) — the engine's reason to exist, end to
    end on sf0.001."""
    ev = load_table(spark, SF_SMOKE, "events")
    k = F.col("event_id") % 10
    img_t = "struct<event_id:bigint,user_id:bigint>"
    img = F.struct("event_id", "user_id")
    wire = ev.select(
        "event_id",
        EF.decimal_encode_b64(F.floor((F.col("value") - 50) * 1000).cast("long")).alias("dec_b64"),
        F.unix_date(F.col("ts").cast("date")).alias("epoch_day"),
        F.unix_millis("ts").alias("epoch_ms"),
        ((F.col("event_id") * 7919823) % 86_400_000_000).alias("micros"),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("zoned"),
        (F.col("value") > 50).alias("flag"),
        F.col("event_type"),
        F.when(k < 6, F.lit(None).cast(img_t)).otherwise(img).alias("before"),
        F.when(k >= 9, F.lit(None).cast(img_t)).otherwise(img).alias("after"),
    )
    return wire.select(
        "event_id",
        EF.decimal_decode("dec_b64", F.lit(3)).alias("dec_val"),
        EF.epoch_day_to_date("epoch_day").alias("event_date"),
        EF.epoch_ms_to_timestamp("epoch_ms").alias("event_ts"),
        EF.micros_to_time("micros").alias("event_time"),
        EF.zoned_ts_normalize("zoned").alias("zoned_ts"),
        EF.bool_to_int("flag").alias("flag_int"),
        EF.topic_name(F.lit("srv"), F.lit("db0"), "event_type").alias("topic"),
        classify_op(F.col("before"), F.col("after")).alias("cdc_op"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return queries_dict()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL for each queries() entry (omitted for
    non-SQL-expressible operators -> rows-only check)."""
    return oracle_sql_dict()


def query_meta() -> dict[str, dict]:
    """Optional metadata surface (additive; not part of the frozen driver
    contract): per-query doc and scale_safe flag — False marks retained
    correctness baselines whose plan is quadratic under skew, each naming
    its capped scale-path twin in the doc."""
    from etl_consumer_spark.plans.queries import query_info

    return query_info()
