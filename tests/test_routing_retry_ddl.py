"""Routing P1-P7, retry E1-E2, and DDL pipeline/translation tests."""

from __future__ import annotations


from etl_consumer_spark.operators import (
    ddl_pipeline,
    drop_tombstones,
    is_blocked_ddl,
    next_attempt,
    passthrough_query,
    republish_gate,
    route_dml,
    route_schema,
    translate_mysql_ddl,
    with_retry_columns,
)


def test_topic_route(spark):
    df = spark.createDataFrame(
        [("srv", "ddl1"), ("srv.db.t1", "dml1"), ("srv.db.t2", "dml2")], "topic string, v string"
    )
    assert {r["v"] for r in route_schema(df, "srv").collect()} == {"ddl1"}
    assert {r["v"] for r in route_dml(df, "srv").collect()} == {"dml1", "dml2"}


def test_drop_tombstones(spark):
    df = spark.createDataFrame([("a",), ("",), (None,)], "value string")
    assert drop_tombstones(df).count() == 1


def test_blocklist_matches_reference(spark):
    # strings.Contains semantics (utils/clean.go:124-140): substring, case-sensitive.
    rows = [
        ("CREATE DATABASE foo", False, True),
        ("USE foo", False, True),
        ("DROP DATABASE foo", False, True),
        ("DROP TABLE t1", False, True),     # blocked unless reclaim
        ("DROP TABLE t1", True, False),
        ("ALTER TABLE t1 ADD COLUMN c INT", False, False),
        ("create database lower", False, False),  # case-sensitive like the Go code
        ("SELECT 'USE'", False, True),      # substring semantics quirk, faithfully kept
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "ddl string")
    got_norec = [r[0] for r in df.select(is_blocked_ddl("ddl", False)).collect()]
    got_rec = [r[0] for r in df.select(is_blocked_ddl("ddl", True)).collect()]
    for (ddl, reclaim, expect), gn, gr in zip(rows, got_norec, got_rec):
        assert (gr if reclaim else gn) == expect, ddl


def test_passthrough_query(spark):
    df = spark.createDataFrame([("SELECT 1+1",), ("abc",), (None,)], "q string")
    out = [r[0] for r in df.select(passthrough_query("q")).collect()]
    assert out == ["SELECT 1+1", None, None]


def test_retry_gates(spark):
    # headers: array<struct<key string, value binary>>
    df = spark.createDataFrame(
        [
            ([("loop", bytearray(b"2"))],),
            ([("loop", bytearray(b"abc"))],),  # non-numeric -> default attempt 1
            ([],),
            (None,),
        ],
        "headers array<struct<key:string,value:binary>>",
    )
    out = with_retry_columns(df, limit=3).collect()
    assert [r["next_attempt"] for r in out] == [3, 1, 1, 1]
    assert [r["republish"] for r in out] == [False, True, True, True]


def test_republish_gate_defaults(spark):
    df = spark.createDataFrame([(None,), (1,), (2,), (5,)], "lc int")
    out = [r[0] for r in df.select(republish_gate("lc", 3)).collect()]
    # counts become 1,2,3,6 -> gate <3
    assert out == [True, True, False, False]
    na = [r[0] for r in df.select(next_attempt("lc")).collect()]
    assert na == [1, 2, 3, 6]


def test_ddl_pipeline_chain(spark):
    df = spark.createDataFrame(
        [
            ("", "t1", "ALTER TABLE `db1`.`t1` ADD COLUMN c INT"),          # P4 drop (instance)
            ("db1", "zz", "ALTER TABLE `db1`.`zz` ADD COLUMN c INT"),       # P3 drop (whitelist)
            ("db1", "t1", "DROP TABLE `db1`.`t1`"),                          # P5 drop (no reclaim)
            ("db1", "t1", ""),                                               # P6 error
            ("db1", "t1", "ALTER TABLE `db1`.`t1` CHANGE COLUMN a b INT"),  # passes, stripped
        ],
        "database_name string, source_table string, ddl string",
    )
    out = ddl_pipeline(df, tables=["t1"], replace_all=False, reclaim=False).collect()
    by_ddl = {r["ddl"]: r for r in out}
    assert len(out) == 2
    assert by_ddl[""]["is_error"] is True
    good = by_ddl["ALTER TABLE `db1`.`t1` CHANGE COLUMN a b INT"]
    assert good["ddl_clean"] == "ALTER TABLE `t1` CHANGE COLUMN a b INT"


def test_translate_mysql_ddl():
    t = translate_mysql_ddl("ALTER TABLE t1 ADD COLUMN c VARCHAR(255) NOT NULL DEFAULT 'x'")
    assert t[0].statement == "ALTER TABLE t1 ADD COLUMNS (c STRING)"
    t = translate_mysql_ddl("ALTER TABLE t1 CHANGE COLUMN old_c new_c BIGINT")
    assert t[0].statement == "ALTER TABLE t1 RENAME COLUMN old_c TO new_c"
    t = translate_mysql_ddl("ALTER TABLE t1 CHANGE COLUMN c c DECIMAL(10,2)")
    assert t[0].statement == "ALTER TABLE t1 ALTER COLUMN c TYPE DECIMAL(10,2)"
    t = translate_mysql_ddl("ALTER TABLE t1 DROP COLUMN c")
    assert t[0].statement == "ALTER TABLE t1 DROP COLUMN c"
    t = translate_mysql_ddl("ALTER TABLE t1 MODIFY COLUMN c TINYINT(1)")
    assert t[0].statement == "ALTER TABLE t1 ALTER COLUMN c TYPE BOOLEAN"
    t = translate_mysql_ddl("TRUNCATE TABLE t1")
    assert t[0].statement is None and "unsupported" in t[0].reason
