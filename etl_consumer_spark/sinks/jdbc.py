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


def upsert_sql(
    target: str, staging: str, cols: list[str], pk_cols: list[str], dialect: str = "mysql"
) -> str:
    """The server-side merge statement executed after staging (driver-side,
    one statement per micro-batch per table).

    ``dialect='mysql'`` emits ``INSERT ... ON DUPLICATE KEY UPDATE`` (the
    reference's target, main.go:28); ``dialect='ansi'`` emits
    ``INSERT ... ON CONFLICT (pk) DO UPDATE`` — runs unchanged on
    DuckDB/Postgres/SQLite, which is what lets the protocol be validated
    against a real in-process engine (see :class:`InProcessSqlTarget`)."""
    if dialect == "ansi":
        collist = ", ".join(f'"{c}"' for c in cols)
        conflict = ", ".join(f'"{c}"' for c in pk_cols)
        updates = ", ".join(f'"{c}" = excluded."{c}"' for c in cols if c not in pk_cols)
        return (
            f'INSERT INTO "{target}" ({collist}) '
            f'SELECT {collist} FROM "{staging}" '
            f"ON CONFLICT ({conflict}) DO UPDATE SET {updates}"
        )
    collist = ", ".join(f"`{c}`" for c in cols)
    updates = ", ".join(f"`{c}`=VALUES(`{c}`)" for c in cols if c not in pk_cols)
    return (
        f"INSERT INTO `{target}` ({collist}) "
        f"SELECT {collist} FROM `{staging}` "
        f"ON DUPLICATE KEY UPDATE {updates}"
    )


def delete_sql(
    target: str, staging_deletes: str, pk_cols: list[str], dialect: str = "mysql"
) -> str:
    if dialect == "ansi":
        on = " AND ".join(f't."{c}" = d."{c}"' for c in pk_cols)
        return (
            f'DELETE FROM "{target}" t '
            f'WHERE EXISTS (SELECT 1 FROM "{staging_deletes}" d WHERE {on})'
        )
    on = " AND ".join(f"t.`{c}` = d.`{c}`" for c in pk_cols)
    return f"DELETE t FROM `{target}` t JOIN `{staging_deletes}` d ON {on}"


def batch_statements(
    target: str,
    staging_upserts: str,
    staging_deletes: str,
    cols: list[str],
    pk_cols: list[str],
    dialect: str = "mysql",
) -> list[str]:
    """Ordered statements for one compacted micro-batch: deletes first, then
    the merge. After LWW compaction each key appears at most once, so the
    two staging tables touch disjoint keys and the whole sequence is
    idempotent — replaying a batch converges to the same table."""
    return [
        delete_sql(target, staging_deletes, pk_cols, dialect),
        upsert_sql(target, staging_upserts, cols, pk_cols, dialect),
    ]


class InProcessSqlTarget:
    """DuckDB-backed K1 target speaking the identical staging+merge protocol
    as the JDBC path (ANSI dialect). Two uses: (1) validating statement
    ordering and idempotency against a real SQL engine where no MySQL
    exists; (2) a dependency-free local materialization target.

    The Spark-side landing step (``write_staging``'s parallel JDBC writers)
    is replaced by an Arrow handoff of the compacted batch — the compacted
    batch is O(micro-batch), not O(state), so a driver-side handoff is the
    honest equivalent of the staging write."""

    def __init__(self, con):
        self.con = con

    def init(self, table: str, pdf, pk_cols: list[str]) -> None:
        self.con.register("_init_df", pdf)
        self.con.execute(f'CREATE OR REPLACE TABLE "{table}" AS SELECT * FROM _init_df')
        self.con.unregister("_init_df")
        pklist = ", ".join(f'"{c}"' for c in pk_cols)
        self.con.execute(f'CREATE UNIQUE INDEX "idx_{table}_pk" ON "{table}" ({pklist})')

    def apply_compacted(
        self, table: str, upserts_pdf, deletes_pdf, cols: list[str], pk_cols: list[str]
    ) -> None:
        """Land the two staging frames, run the ordered merge statements,
        drop staging — one round-trip sequence per micro-batch per table."""
        up, dl = f"_stg_{table}_upserts", f"_stg_{table}_deletes"
        self.con.register(up, upserts_pdf)
        self.con.register(dl, deletes_pdf)
        try:
            for stmt in batch_statements(table, up, dl, cols, pk_cols, dialect="ansi"):
                self.con.execute(stmt)
        finally:
            self.con.unregister(up)
            self.con.unregister(dl)

    def read(self, table: str):
        return self.con.execute(f'SELECT * FROM "{table}"').df()
