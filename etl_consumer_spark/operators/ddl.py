"""DDL pipeline operators (SURVEY §2.3 P3-P6, §2.4 C7, §3.2).

The reference replays MySQL DDL verbatim against the target MySQL after a
filter chain (main.go:382-424). In the Spark engine the filter chain is
declarative (see operators.routing) and the *apply* step needs a dialect
translation when the state tables live in the Spark catalog rather than
behind JDBC. Translation is deliberately minimal: the ALTER forms Debezium
actually emits (cf. reference collection.json:121 — ``ALTER TABLE ...
CHANGE COLUMN``), plus ADD/DROP COLUMN.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_consumer_spark.functions.decoders import ddl_strip_db
from etl_consumer_spark.operators.routing import (
    drop_blocked_ddl,
    drop_instance_events,
    is_empty_ddl,
    table_whitelist,
)

# MySQL -> Spark SQL type mapping for the column types Debezium CDC emits.
_TYPE_MAP = [
    (r"(?i)\bTINYINT\s*\(\s*1\s*\)", "BOOLEAN"),
    (r"(?i)\bTINYINT(\s*\(\d+\))?( UNSIGNED)?", "TINYINT"),
    (r"(?i)\bSMALLINT(\s*\(\d+\))?( UNSIGNED)?", "SMALLINT"),
    (r"(?i)\bMEDIUMINT(\s*\(\d+\))?( UNSIGNED)?", "INT"),
    (r"(?i)\bBIGINT(\s*\(\d+\))?( UNSIGNED)?", "BIGINT"),
    (r"(?i)\bINT(EGER)?(\s*\(\d+\))?( UNSIGNED)?", "INT"),
    (r"(?i)\bDOUBLE(\s*\(\d+\s*,\s*\d+\))?", "DOUBLE"),
    (r"(?i)\bFLOAT(\s*\(\d+\s*,\s*\d+\))?", "FLOAT"),
    (r"(?i)\bDECIMAL\s*\((\d+)\s*,\s*(\d+)\)", r"DECIMAL(\1,\2)"),
    (r"(?i)\bDATETIME(\s*\(\d+\))?", "TIMESTAMP"),
    (r"(?i)\bTIMESTAMP(\s*\(\d+\))?", "TIMESTAMP"),
    (r"(?i)\bDATE\b", "DATE"),
    (r"(?i)\bTIME(\s*\(\d+\))?\b", "STRING"),  # engine stores MicroTime as H:M:S string (F4)
    (r"(?i)\b(VAR)?CHAR\s*\(\d+\)", "STRING"),
    (r"(?i)\b(TINY|MEDIUM|LONG)?TEXT\b", "STRING"),
    (r"(?i)\bENUM\s*\([^)]*\)", "STRING"),
    (r"(?i)\b(TINY|MEDIUM|LONG)?BLOB\b", "BINARY"),
    (r"(?i)\bVAR?BINARY\s*\(\d+\)", "BINARY"),
    (r"(?i)\bJSON\b", "STRING"),
]

# MySQL column attributes Spark SQL doesn't take in ALTER ... ADD/CHANGE
_ATTR_STRIP = re.compile(
    r"(?i)\s+(NOT\s+NULL|NULL|AUTO_INCREMENT|DEFAULT\s+(?:'[^']*'|\S+)|"
    r"CHARACTER\s+SET\s+\S+|COLLATE\s+\S+|UNSIGNED|ON\s+UPDATE\s+\S+(?:\(\))?)"
)


def translate_mysql_type(mysql_type: str) -> str:
    out = mysql_type
    for pat, repl in _TYPE_MAP:
        new = re.sub(pat, repl, out)
        if new != out:
            return new
    return out


@dataclass
class TranslatedDDL:
    """One Spark-SQL statement derived from a MySQL DDL, or a skip marker."""

    statement: str | None
    reason: str | None = None  # set when statement is None


_ADD_RE = re.compile(
    r"(?i)^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+ADD\s+(?:COLUMN\s+)?`?(\w+)`?\s+(.+?)\s*$"
)
_DROP_RE = re.compile(r"(?i)^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+DROP\s+(?:COLUMN\s+)?`?(\w+)`?\s*$")
_CHANGE_RE = re.compile(
    r"(?i)^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+CHANGE\s+(?:COLUMN\s+)?`?(\w+)`?\s+`?(\w+)`?\s+(.+?)\s*$"
)
_MODIFY_RE = re.compile(
    r"(?i)^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+MODIFY\s+(?:COLUMN\s+)?`?(\w+)`?\s+(.+?)\s*$"
)


def translate_mysql_ddl(ddl: str) -> list[TranslatedDDL]:
    """Translate a (db-qualifier-stripped) MySQL DDL statement into Spark SQL
    statements. Unsupported statements come back as skip markers so the
    caller can dead-letter them rather than fail the batch."""
    stmts = [s.strip() for s in ddl.split(";") if s.strip()]
    out: list[TranslatedDDL] = []
    for s in stmts:
        m = _ADD_RE.match(s)
        if m and not re.match(r"(?i).*(ADD\s+(INDEX|KEY|CONSTRAINT|PRIMARY))", s):
            tbl, col, typ = m.groups()
            typ = _ATTR_STRIP.sub("", typ).strip()
            out.append(TranslatedDDL(f"ALTER TABLE {tbl} ADD COLUMNS ({col} {translate_mysql_type(typ)})"))
            continue
        m = _DROP_RE.match(s)
        if m:
            tbl, col = m.groups()
            out.append(TranslatedDDL(f"ALTER TABLE {tbl} DROP COLUMN {col}"))
            continue
        m = _CHANGE_RE.match(s)
        if m:
            tbl, old, new, typ = m.groups()
            typ = _ATTR_STRIP.sub("", typ).strip()
            spark_type = translate_mysql_type(typ)
            if old.lower() == new.lower():
                out.append(TranslatedDDL(f"ALTER TABLE {tbl} ALTER COLUMN {old} TYPE {spark_type}"))
            else:
                out.append(TranslatedDDL(f"ALTER TABLE {tbl} RENAME COLUMN {old} TO {new}"))
            continue
        m = _MODIFY_RE.match(s)
        if m:
            tbl, col, typ = m.groups()
            typ = _ATTR_STRIP.sub("", typ).strip()
            out.append(TranslatedDDL(f"ALTER TABLE {tbl} ALTER COLUMN {col} TYPE {translate_mysql_type(typ)}"))
            continue
        out.append(TranslatedDDL(None, reason=f"unsupported DDL form: {s[:80]}"))
    return out


def ddl_pipeline(
    df: DataFrame,
    tables: list[str],
    replace_all: bool,
    reclaim: bool,
    db_name_col: str = "database_name",
    table_col: str = "source_table",
    ddl_col: str = "ddl",
) -> DataFrame:
    """P4 → P3 → P6-split → P5 → C7 filter chain over a DDL-event DataFrame
    (reference order: main.go:390-415). Adds ``is_error`` for empty-DDL rows
    (dead-letter candidates) and ``ddl_clean`` with the db qualifier
    stripped. Blocklisted DDL is dropped silently, like the reference."""
    out = drop_instance_events(df, db_name_col)
    out = table_whitelist(out, tables, replace_all, table_col)
    out = out.withColumn("is_error", is_empty_ddl(ddl_col))
    keep = drop_blocked_ddl(out.filter(~F.col("is_error")), reclaim, ddl_col)
    errors = out.filter(F.col("is_error"))
    out = keep.unionByName(errors)
    return out.withColumn("ddl_clean", ddl_strip_db(F.col(ddl_col), F.col(db_name_col)))


def apply_ddl_batch(spark: SparkSession, ddl_rows: list[str]) -> list[TranslatedDDL]:
    """Execute translated DDL against the Spark catalog (driver-side, inside
    foreachBatch — serialized before DML batches per SURVEY §4). Returns the
    per-statement outcomes; skip markers are the caller's dead letters."""
    results: list[TranslatedDDL] = []
    for ddl in ddl_rows:
        for t in translate_mysql_ddl(ddl):
            if t.statement is None:
                results.append(t)
                continue
            try:
                spark.sql(t.statement)
                results.append(t)
            except Exception as exc:  # noqa: BLE001 - dead-letter, don't fail the batch
                results.append(TranslatedDDL(None, reason=f"{t.statement}: {exc}"))
    return results
