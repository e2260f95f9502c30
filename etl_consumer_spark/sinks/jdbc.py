"""K1 (JDBC variant) — apply CDC state to an external RDBMS, the
reference's actual target (GORM/MySQL, main.go:28,88,135).

No database exists in the test container, so this module is the thin,
import-clean wrapper the engine uses when ``--target jdbc`` is configured;
the parquet state store covers the tested path. The upsert protocol is the
standard Spark-JDBC pattern: write the compacted micro-batch to a staging
table, then issue one server-side ``INSERT ... ON DUPLICATE KEY UPDATE``
(MySQL) / ``MERGE`` statement — never row-at-a-time executemany from the
driver, and never the reference's one-statement-per-event loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from etl_consumer_spark.config import Config


def jdbc_url(cfg: Config) -> str:
    return f"jdbc:mysql://{cfg.db_address}:{cfg.db_port}/{cfg.db_source_name}"


def jdbc_options(cfg: Config) -> dict[str, str]:
    return {
        "url": jdbc_url(cfg),
        "user": cfg.db_user,
        "password": cfg.db_password,
        "driver": "com.mysql.cj.jdbc.Driver",
    }


def write_staging(df: DataFrame, cfg: Config, staging_table: str) -> None:
    """Land the compacted batch in a staging table (parallel JDBC writers,
    one per partition — batch inserts, rewriteBatchedStatements on)."""
    (
        df.write.format("jdbc")
        .options(**jdbc_options(cfg))
        .option("dbtable", staging_table)
        .option("batchsize", "10000")
        .option("rewriteBatchedStatements", "true")
        .mode("overwrite")
        .save()
    )


def upsert_sql(target: str, staging: str, cols: list[str], pk_cols: list[str]) -> str:
    """The server-side merge statement executed after staging (driver-side,
    one statement per micro-batch per table)."""
    collist = ", ".join(f"`{c}`" for c in cols)
    updates = ", ".join(f"`{c}`=VALUES(`{c}`)" for c in cols if c not in pk_cols)
    return (
        f"INSERT INTO `{target}` ({collist}) "
        f"SELECT {collist} FROM `{staging}` "
        f"ON DUPLICATE KEY UPDATE {updates}"
    )


def delete_sql(target: str, staging_deletes: str, pk_cols: list[str]) -> str:
    on = " AND ".join(f"t.`{c}` = d.`{c}`" for c in pk_cols)
    return f"DELETE t FROM `{target}` t JOIN `{staging_deletes}` d ON {on}"
