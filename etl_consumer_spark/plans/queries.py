"""Driver-facing query registry.

Every implemented operator from SURVEY §2 appears here as a named query:
a Spark DataFrame builder ``fn(spark, sf_dir)`` exercising the *engine's*
implementation, paired with an independent ANSI-SQL oracle that DuckDB runs
over the same parquet tables. Inputs the reference would receive from Kafka
(base64 decimals, epoch numbers, DDL strings, retry headers...) are derived
deterministically from the driver tables with identical arithmetic on both
sides, so the oracle validates the engine's decode/apply logic, not the
derivation.

Hash-stability rules used throughout:
- double aggregation is done in DECIMAL (exact, order-insensitive) — raw
  double sums differ across engines by summation order;
- floats compared only through deterministic orderings with integer
  tie-breaks, or rounded;
- every computed column is aliased identically in Spark and SQL.
"""

from __future__ import annotations

from contextlib import contextmanager as _contextmanager
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_consumer_spark import functions as EF
from etl_consumer_spark.operators import apply as A
from etl_consumer_spark.operators import retry as R
from etl_consumer_spark.operators import routing as P
from etl_consumer_spark.sources.tables import load_table


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible, rows-only check
    doc: str = ""
    # False marks plans that are quadratic under skew (uncapped self-joins) —
    # a user picking queries at 100 TB should select the capped twin instead
    scale_safe: bool = True


def _pin_batch_order(path: str, seen: set[str], batch_no: int) -> None:
    """Stamp the files a multi-batch harness just appended with a strictly
    increasing mtime, so FileStreamSource's modification-time ordering
    replays batches in WRITE order even on filesystems with coarse or tied
    timestamps (ADVICE r6: the watermark-dependent oracles are only correct
    if batch order is explicit, not an mtime accident). Files from earlier
    batches (tracked in ``seen``) keep their earlier stamp."""
    import os as _os

    epoch = 1_700_000_000 + 60 * batch_no
    for name in sorted(_os.listdir(path)):
        p = _os.path.join(path, name)
        if name not in seen and _os.path.isfile(p):
            _os.utime(p, (epoch, epoch))
            seen.add(name)


QUERIES: dict[str, QueryDef] = {}
# Correctness baselines NOT exposed through queries()/oracle_sql(): the
# deliberately-naive formulations (uncapped self-joins) kept solely to
# cross-check their capped production twins. tests/test_dedup_baselines.py
# asserts twin equivalence with a non-binding cap, and check_oracle.py
# --baselines runs their DuckDB oracles; they are not part of the operator
# surface a user would run at scale.
BASELINES: dict[str, QueryDef] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    scale_safe: bool = True,
    baseline_only: bool = False,
):
    def deco(fn):
        target = BASELINES if baseline_only else QUERIES
        # a duplicate name would silently REPLACE an already-verified query
        # (and its correctness history) — fail at import instead
        assert name not in QUERIES and name not in BASELINES, (
            f"duplicate query registration: {name}"
        )
        target[name] = QueryDef(fn, oracle, doc, scale_safe)
        return fn

    return deco


def queries_dict() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: QUERIES[name].fn for name in _ordered_names()}


def oracle_sql_dict() -> dict[str, str]:
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }


def query_info() -> dict[str, dict]:
    """Metadata surface: per-query doc string and scale-safety flag (the
    registry's operator inventory, machine-readable)."""
    return {
        name: {
            "doc": QUERIES[name].doc,
            "scale_safe": QUERIES[name].scale_safe,
            "has_oracle": QUERIES[name].oracle is not None,
        }
        for name in _ordered_names()
    }


# ---------------------------------------------------------------------------
# F1 — decimal decode (reference main.go:224-258)
# ---------------------------------------------------------------------------

@register(
    "f1_decimal_roundtrip",
    """
    SELECT event_id,
           CAST(floor((value - 50) * 1000) AS BIGINT) AS unscaled
    FROM events
    """,
    doc="F1: base64 two's-complement decimal decode (encode->decode round trip)",
)
def f1_decimal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    unscaled = F.floor((F.col("value") - 50) * 1000).cast("long")
    wire = ev.select("event_id", EF.decimal_encode_b64(unscaled).alias("b64"))
    return wire.select(
        "event_id",
        EF.decimal_unscaled("b64").cast("long").alias("unscaled"),
    )


# ---------------------------------------------------------------------------
# F2 — epoch days -> date (reference main.go:259-264)
# ---------------------------------------------------------------------------

@register(
    "f2_epoch_day",
    """
    SELECT event_id,
           strftime(DATE '1970-01-01' + CAST(event_id % 40000 - 10000 AS INTEGER),
                    '%Y-%m-%d') AS d
    FROM events
    """,
    doc="F2: days-since-epoch decode incl. pre-1970 negatives "
        "(ISO-string output: Spark DateType and DuckDB DATE pandas-ize differently)",
)
def f2_epoch_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = (F.col("event_id") % 40000 - 10000).cast("int")
    return ev.select("event_id", F.date_format(EF.epoch_day_to_date(days), "yyyy-MM-dd").alias("d"))


# ---------------------------------------------------------------------------
# F3 — epoch ms -> timestamp, optional -7h (reference main.go:265-276)
# ---------------------------------------------------------------------------

@register(
    "f3_epoch_ms",
    """
    SELECT event_id,
           epoch_ms(epoch_ns(ts) // 1000000) AS t,
           epoch_ms(epoch_ns(ts) // 1000000) - INTERVAL 7 HOUR AS t_tz
    FROM events
    """,
    doc="F3: ms-since-epoch decode with reference's -7h WithTimezone variant",
)
def f3_epoch_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    return ev.select(
        "event_id",
        EF.epoch_ms_to_timestamp(ms).alias("t"),
        EF.epoch_ms_to_timestamp(ms, with_timezone=True).alias("t_tz"),
    )


# ---------------------------------------------------------------------------
# F4 — micros-since-midnight -> unpadded H:M:S (reference main.go:277-287)
# ---------------------------------------------------------------------------

@register(
    "f4_micro_time",
    """
    WITH m AS (SELECT event_id, (event_id * 7919823) % 86400000000 AS micros FROM events),
    s AS (SELECT event_id, micros // 1000000 AS sec FROM m)
    SELECT event_id,
           CAST(sec // 3600 AS VARCHAR) || ':' ||
           CAST((sec // 60) % 60 AS VARCHAR) || ':' ||
           CAST(sec % 60 AS VARCHAR) AS hms
    FROM s
    """,
    doc="F4: unpadded %d:%d:%d time format, faithful to the reference",
)
def f4_micro_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    micros = (F.col("event_id") * 7919823) % 86_400_000_000
    return ev.select("event_id", EF.micros_to_time(micros).alias("hms"))


# ---------------------------------------------------------------------------
# F5 — zoned timestamp normalize (+7h) (reference main.go:289-297)
# ---------------------------------------------------------------------------

@register(
    "f5_zoned_ts",
    """
    SELECT event_id,
           strptime(
             replace(replace(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ'), 'T', ' '), 'Z', ''),
             '%Y-%m-%d %H:%M:%S') + INTERVAL 7 HOUR AS zts
    FROM events
    """,
    doc="F5: ISO-8601 T/Z strip behind regex gate, parse, +7h shift",
)
def f5_zoned_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return ev.select("event_id", EF.zoned_ts_normalize(iso).alias("zts"))


# ---------------------------------------------------------------------------
# F6/F7 — bool->int, quote strip (reference main.go:301-308, 336)
# ---------------------------------------------------------------------------

@register(
    "f6_f7_bool_quote",
    """
    SELECT event_id,
           CASE WHEN value > 50 THEN 1 ELSE 0 END AS bi,
           replace('it''s ' || event_type, '''', '') AS qs
    FROM events
    """,
    doc="F6 bool->1/0; F7 single-quote strip",
)
def f6_f7_bool_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        EF.bool_to_int(F.col("value") > 50).alias("bi"),
        EF.quote_strip(F.concat(F.lit("it's "), F.col("event_type"))).alias("qs"),
    )


# ---------------------------------------------------------------------------
# F8 — CleanText (reference utils/clean.go:9-102)
# ---------------------------------------------------------------------------

@register(
    "f8_clean_text",
    """
    SELECT doc_id,
           CASE WHEN length(text) < 5 THEN ''
                WHEN length(text) > 80 THEN substr(text, 1, 77) || '...'
                ELSE text END AS cleaned
    FROM documents
    """,
    doc="F8: CleanText over ASCII corpus (short-drop + truncate paths; full char-map in tests)",
)
def f8_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", EF.clean_text("text", 80).alias("cleaned"))


# ---------------------------------------------------------------------------
# F9/F10 — CleanString, sanitize (reference utils/clean.go:105-111)
# ---------------------------------------------------------------------------

@register(
    "f9_f10_clean_sanitize",
    """
    SELECT doc_id,
           regexp_replace(substr(text, 1, 40), '[^a-zA-Z0-9]+', '', 'g') AS cs,
           regexp_replace('err: ' || substr(text, 1, 20), '[^a-zA-Z0-9-]+', '-', 'g') AS sb
    FROM documents
    """,
    doc="F9 alphanumeric-only; F10 dead-letter error sanitizer",
)
def f9_f10_clean_sanitize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        EF.clean_string(F.substring("text", 1, 40)).alias("cs"),
        EF.sanitize_basename(F.concat(F.lit("err: "), F.substring("text", 1, 20))).alias("sb"),
    )


# ---------------------------------------------------------------------------
# F11/F12 — topic name, DDL db-qualifier strip (reference main.go:52,87)
# ---------------------------------------------------------------------------

@register(
    "f11_f12_topic_ddlstrip",
    """
    SELECT event_id,
           'srv.db0.' || event_type AS topic,
           replace('ALTER TABLE `db0`.`' || event_type || '` ADD COLUMN c INT',
                   '`db0`.', '') AS ddl_clean
    FROM events
    """,
    doc="F11 topic construction; F12 literal db-qualifier strip",
)
def f11_f12_topic_ddlstrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ddl = F.concat(F.lit("ALTER TABLE `db0`.`"), F.col("event_type"), F.lit("` ADD COLUMN c INT"))
    return ev.select(
        "event_id",
        EF.topic_name(F.lit("srv"), F.lit("db0"), F.col("event_type")).alias("topic"),
        EF.ddl_strip_db(ddl, F.lit("db0")).alias("ddl_clean"),
    )


# ---------------------------------------------------------------------------
# P1 + S7 — topic routing and tombstone filter (reference main.go:70-71,124-126)
# ---------------------------------------------------------------------------

@register(
    "p1_s7_route_tombstones",
    """
    WITH msgs AS (
      SELECT event_id,
             CASE WHEN event_id % 20 = 0 THEN 'srv' ELSE 'srv.db0.' || event_type END AS topic,
             CASE WHEN event_id % 15 = 0 THEN '' ELSE props END AS value
      FROM events
    )
    SELECT 'schema' AS branch, count(*) AS n FROM msgs WHERE topic = 'srv'
    UNION ALL
    SELECT 'dml' AS branch, count(*) AS n
    FROM msgs WHERE topic <> 'srv' AND length(value) > 0
    """,
    doc="P1 topic dispatch + S7 empty-value (tombstone) filter",
)
def p1_s7_route_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    msgs = ev.select(
        "event_id",
        F.when(F.col("event_id") % 20 == 0, F.lit("srv"))
        .otherwise(F.concat(F.lit("srv.db0."), F.col("event_type")))
        .alias("topic"),
        F.when(F.col("event_id") % 15 == 0, F.lit("")).otherwise(F.col("props")).alias("value"),
    )
    schema_n = P.route_schema(msgs, "srv").agg(F.count("*").alias("n")).select(
        F.lit("schema").alias("branch"), "n"
    )
    dml_n = (
        P.drop_tombstones(P.route_dml(msgs, "srv"))
        .agg(F.count("*").alias("n"))
        .select(F.lit("dml").alias("branch"), "n")
    )
    return schema_n.unionByName(dml_n)


# ---------------------------------------------------------------------------
# P3/P4 — whitelist + instance-event filters (reference main.go:390-407)
# ---------------------------------------------------------------------------

@register(
    "p3_p4_schema_filters",
    """
    WITH sch AS (
      SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN '' ELSE 'db0' END AS database_name,
             event_type AS source_table
      FROM events
    )
    SELECT event_id, source_table FROM sch
    WHERE length(database_name) > 0 AND source_table IN ('click', 'view')
    """,
    doc="P4 instance-event drop then P3 table whitelist",
)
def p3_p4_schema_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sch = ev.select(
        "event_id",
        F.when(F.col("event_id") % 7 == 0, F.lit("")).otherwise(F.lit("db0")).alias("database_name"),
        F.col("event_type").alias("source_table"),
    )
    out = P.drop_instance_events(sch)
    out = P.table_whitelist(out, ["click", "view"], replace_all=False, table_col="source_table")
    return out.select("event_id", "source_table")


# ---------------------------------------------------------------------------
# P5/P6 — DDL blocklist + empty guard (reference utils/clean.go:113-140)
# ---------------------------------------------------------------------------

_DDL_CASE_SQL = """
      CASE event_id % 6
        WHEN 0 THEN 'CREATE DATABASE x'
        WHEN 1 THEN 'USE x'
        WHEN 2 THEN 'DROP DATABASE x'
        WHEN 3 THEN 'DROP TABLE `db0`.`t`'
        WHEN 4 THEN ''
        ELSE 'ALTER TABLE `db0`.`t` ADD COLUMN c INT'
      END
"""


def _ddl_case_spark(ev: DataFrame) -> F.Column:
    k = F.col("event_id") % 6
    return (
        F.when(k == 0, F.lit("CREATE DATABASE x"))
        .when(k == 1, F.lit("USE x"))
        .when(k == 2, F.lit("DROP DATABASE x"))
        .when(k == 3, F.lit("DROP TABLE `db0`.`t`"))
        .when(k == 4, F.lit(""))
        .otherwise(F.lit("ALTER TABLE `db0`.`t` ADD COLUMN c INT"))
    )


@register(
    "p5_p6_ddl_guards",
    f"""
    WITH d AS (SELECT event_id, {_DDL_CASE_SQL} AS ddl FROM events)
    SELECT event_id, ddl,
           (contains(ddl, 'CREATE DATABASE') OR contains(ddl, 'USE')
            OR contains(ddl, 'DROP DATABASE') OR contains(ddl, 'DROP TABLE')) AS blocked,
           (contains(ddl, 'CREATE DATABASE') OR contains(ddl, 'USE')
            OR contains(ddl, 'DROP DATABASE')) AS blocked_reclaim,
           (length(ddl) = 0) AS is_error
    FROM d
    """,
    doc="P5 substring blocklist (reclaim variant) + P6 empty-DDL guard",
)
def p5_p6_ddl_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = ev.select("event_id", _ddl_case_spark(ev).alias("ddl"))
    return d.select(
        "event_id",
        "ddl",
        P.is_blocked_ddl("ddl", reclaim=False).alias("blocked"),
        P.is_blocked_ddl("ddl", reclaim=True).alias("blocked_reclaim"),
        P.is_empty_ddl("ddl").alias("is_error"),
    )


# ---------------------------------------------------------------------------
# P7 — passthrough query detect (reference main.go:357-359)
# ---------------------------------------------------------------------------

@register(
    "p7_passthrough",
    """
    WITH q AS (
      SELECT event_id,
             CASE WHEN event_id % 4 = 0 THEN 'SELECT 1 FROM ' || event_type
                  WHEN event_id % 4 = 1 THEN 'abc'
                  ELSE NULL END AS src_query
      FROM events
    )
    SELECT event_id,
           CASE WHEN length(src_query) > 5 THEN src_query ELSE NULL END AS passthrough
    FROM q
    """,
    doc="P7: source.query length>5 passthrough gate",
)
def p7_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.col("event_id") % 4
    q = ev.select(
        "event_id",
        F.when(k == 0, F.concat(F.lit("SELECT 1 FROM "), F.col("event_type")))
        .when(k == 1, F.lit("abc"))
        .otherwise(F.lit(None).cast("string"))
        .alias("src_query"),
    )
    return q.select("event_id", P.passthrough_query("src_query").alias("passthrough"))


# ---------------------------------------------------------------------------
# E1/E2 — retry header parse + republish gate (reference main.go:98-115)
# ---------------------------------------------------------------------------

@register(
    "e1_e2_retry_gate",
    """
    WITH h AS (
      SELECT event_id,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  WHEN event_id % 5 = 4 THEN NULL   -- non-numeric header -> parse failure
                  ELSE CAST(event_id % 5 AS INTEGER) END AS loop_count
      FROM events
    )
    SELECT event_id,
           COALESCE(loop_count + 1, 1) AS next_attempt,
           COALESCE(loop_count + 1, 1) < 3 AS republish
    FROM h
    """,
    doc="E1 loop-header parse (with Atoi-failure default) + E2 limit gate",
)
def e1_e2_retry_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.col("event_id") % 5
    # build real Kafka-style headers incl. a non-numeric value to exercise the
    # reference's strconv.Atoi failure path (main.go:104-108)
    headers = (
        F.when(k == 0, F.lit(None).cast("array<struct<key:string,value:binary>>"))
        .when(k == 4, F.array(F.struct(F.lit("loop").alias("key"), F.lit("abc").cast("binary").alias("value"))))
        .otherwise(
            F.array(
                F.struct(
                    F.lit("loop").alias("key"),
                    k.cast("string").cast("binary").alias("value"),
                )
            )
        )
    )
    h = ev.select("event_id", headers.alias("headers"))
    lc = R.loop_count_from_headers("headers")
    return h.select(
        "event_id",
        R.next_attempt(lc).alias("next_attempt"),
        R.republish_gate(lc, 3).alias("republish"),
    )


# ---------------------------------------------------------------------------
# C1-C3 — nullness classification (reference main.go:365-377)
# ---------------------------------------------------------------------------

@register(
    "c1_c3_classify",
    """
    WITH ev AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 < 6 THEN 'insert'
                  WHEN o_orderkey % 10 < 9 THEN 'update'
                  ELSE 'delete' END AS cdc_op
      FROM orders
    )
    SELECT cdc_op, count(*) AS n FROM ev GROUP BY cdc_op
    """,
    doc="C1-C3: before/after nullness classification counts (op field ignored)",
)
def c1_c3_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey") % 10
    img = F.struct(F.col("o_orderkey"), F.col("o_totalprice"))
    ev = orders.select(
        F.when(k < 6, F.lit(None).cast("struct<o_orderkey:long,o_totalprice:double>"))
        .otherwise(img)
        .alias("before"),
        F.when(k >= 9, F.lit(None).cast("struct<o_orderkey:long,o_totalprice:double>"))
        .otherwise(img)
        .alias("after"),
    )
    return (
        ev.select(A.classify_op(F.col("before"), F.col("after")).alias("cdc_op"))
        .groupBy("cdc_op")
        .agg(F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# CDC apply — the flagship operator (C1-C6 + LWW, reference main.go:348-380)
# ---------------------------------------------------------------------------

_CDC_APPLY_ORACLE = """
    WITH state AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 4 <> 3
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 1000 ELSE o_totalprice END AS o_totalprice
    FROM state
    WHERE o_orderkey % 4 <> 1          -- deletes drop
    UNION ALL
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders WHERE o_orderkey % 4 = 3   -- inserts (were excluded from state)
"""


@register(
    "cdc_apply_orders",
    _CDC_APPLY_ORACLE,
    doc="Full CDC apply: insert/update/delete + within-batch replay dedupe over orders-derived events",
)
def cdc_apply_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    state = orders.filter(F.col("o_orderkey") % 4 != 3)
    k = F.col("o_orderkey") % 4
    img_t = "struct<o_orderkey:long,o_custkey:long,o_orderstatus:string,o_totalprice:double>"
    row_img = F.struct("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    upd_img = F.struct(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    events = orders.filter(k != 2).select(
        F.when(k == 3, F.lit(None).cast(img_t)).otherwise(row_img).alias("before"),
        F.when(k == 1, F.lit(None).cast(img_t))
        .when(k == 0, upd_img)
        .otherwise(row_img)
        .alias("after"),
        F.col("o_orderkey").alias("pos"),
        F.lit(0).cast("long").alias("ts_ms"),
    )
    # at-least-once delivery: replay the whole batch twice; engine must dedupe
    events = events.unionByName(events)
    return A.apply_cdc(state, events, ["o_orderkey"])


# ---------------------------------------------------------------------------
# LWW ordering window (SURVEY §2.4 ordering note)
# ---------------------------------------------------------------------------

@register(
    "cdc_lww_window",
    """
    WITH ev AS (
      SELECT o_orderkey AS k, o_totalprice + 100 AS v, 1 AS pos, 0 AS ts_ms FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice + 200, 2, 0 FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_totalprice, 1, 0 FROM orders WHERE o_orderkey % 2 = 1
    ),
    r AS (
      SELECT k, v, row_number() OVER (PARTITION BY k ORDER BY pos DESC, ts_ms DESC) AS rn
      FROM ev
    )
    SELECT k, v FROM r WHERE rn = 1
    """,
    doc="last-writer-wins per key by (source.pos, ts_ms)",
)
def cdc_lww_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    even = orders.filter(F.col("o_orderkey") % 2 == 0)
    odd = orders.filter(F.col("o_orderkey") % 2 == 1)
    ev = (
        even.select(F.col("o_orderkey").alias("k"), (F.col("o_totalprice") + 100).alias("v"),
                    F.lit(1).alias("pos"), F.lit(0).alias("ts_ms"))
        .unionByName(
            even.select(F.col("o_orderkey").alias("k"), (F.col("o_totalprice") + 200).alias("v"),
                        F.lit(2).alias("pos"), F.lit(0).alias("ts_ms")))
        .unionByName(
            odd.select(F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("v"),
                       F.lit(1).alias("pos"), F.lit(0).alias("ts_ms")))
    )
    return A.last_writer_wins(ev, ["k"], "pos", "ts_ms").select("k", "v")


# ---------------------------------------------------------------------------
# Full-row predicate apply (SURVEY §7 hard-part 2, reference main.go:372,376)
# ---------------------------------------------------------------------------

_FULL_ROW_ORACLE = """
    WITH state AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 8 < 4
    )
    -- update applies only when the full before-image matches; stale images
    -- (o_orderkey % 8 = 1 events carry price+999) match nothing
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 8 = 0 THEN o_totalprice + 7 ELSE o_totalprice END AS o_totalprice
    FROM state
    WHERE o_orderkey % 8 <> 2       -- exact-match deletes drop
    UNION ALL
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders WHERE o_orderkey % 8 = 5   -- inserts of rows not in state
"""


@register(
    "cdc_full_row_apply",
    _FULL_ROW_ORACLE,
    doc="UPDATE/DELETE matched on ALL before-image columns (not PK)",
)
def cdc_full_row_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    state = orders.filter(F.col("o_orderkey") % 8 < 4)
    k = F.col("o_orderkey") % 8
    img_t = "struct<o_orderkey:long,o_custkey:long,o_totalprice:double>"
    exact = F.struct("o_orderkey", "o_custkey", "o_totalprice")
    stale = F.struct(
        F.col("o_orderkey"), F.col("o_custkey"), (F.col("o_totalprice") + 999).alias("o_totalprice")
    )
    upd = F.struct(
        F.col("o_orderkey"), F.col("o_custkey"), (F.col("o_totalprice") + 7).alias("o_totalprice")
    )
    events = orders.filter(k.isin(0, 1, 2, 5)).select(
        F.when(k == 0, exact).when(k == 1, stale).when(k == 2, exact)
        .otherwise(F.lit(None).cast(img_t)).alias("before"),
        F.when(k == 0, upd).when(k == 1, upd).when(k == 5, exact)
        .otherwise(F.lit(None).cast(img_t)).alias("after"),
        F.col("o_orderkey").alias("pos"),
        F.lit(0).cast("long").alias("ts_ms"),
    )
    return A.apply_cdc_full_row(state, events)


# ---------------------------------------------------------------------------
# Observability aggregate (SURVEY §2.8: per-table/op event counts)
# ---------------------------------------------------------------------------

@register(
    "event_counts",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
    doc="hash-agg observability counts (decimal sums for order-insensitive "
        "exactness, surfaced as double for uniform pandas dtype)",
)
def event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# OLAP core (SURVEY §2.8: engine ships hash-agg/join/window/top-k/sort even
# though the reference has none — they're the observability & harness layer,
# and the scale-path building blocks).
# ---------------------------------------------------------------------------

@register(
    "olap_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(round(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
           sum(CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))) / 10000.0 AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary. Money columns carry 2 decimal "
        "digits, so the exact aggregation is integer-cents long arithmetic "
        "(sum of cents, one double division at the end) — same values as the "
        "DECIMAL(18,2) chain but ~2x faster (stays in codegen'd long "
        "hash-agg instead of Decimal128 partials; BENCH_r04 drift "
        "root-cause). Per-row product bounded by 1e9, so the long sum holds "
        "to ~1e9 rows per group x 1e9 — no overflow at 100 TB group sizes.",
)
def olap_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty_c = F.round(F.col("l_quantity") * 100).cast("long")
    price_c = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc_c = F.round(F.col("l_discount") * 100).cast("long")
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c) / F.lit(100.0)).alias("sum_qty"),
            (F.sum(price_c) / F.lit(100.0)).alias("sum_base_price"),
            (F.sum(price_c * (F.lit(100) - disc_c)) / F.lit(10000.0)).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "olap_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="two-hop join + agg; dims broadcast (nation always, customer when small)",
)
def olap_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@register(
    "olap_topk_orders_per_customer",
    """
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    )
    SELECT o_custkey, o_orderkey, o_totalprice, rn FROM r WHERE rn <= 3
    """,
    doc="top-k per group via ranking window (deterministic integer tie-break)",
)
def olap_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@register(
    "olap_running_revenue",
    """
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_revenue
    FROM orders
    """,
    doc="running-sum window (decimal accumulation, deterministic frame order)",
)
def olap_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_revenue"),
    )


@register(
    "olap_distinct_setops",
    """
    SELECT count(*) AS n FROM (
      SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 100000
      EXCEPT
      SELECT c_custkey FROM customer WHERE c_nationkey < 5
    )
    """,
    doc="distinct + set difference (EXCEPT) over join keys",
)
def olap_distinct_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = orders.filter(F.col("o_totalprice") > 100000).select(F.col("o_custkey").alias("k")).distinct()
    south = customer.filter(F.col("c_nationkey") < 5).select(F.col("c_custkey").alias("k"))
    return big.exceptAll(south.distinct()).agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# Extensions: dedup / similarity / text analysis / multimodal
# (SURVEY §7 Phase 5 — training-data pipeline operators)
# ---------------------------------------------------------------------------

_SHINGLE_CTE = """
    w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents),
    sh AS (SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
           FROM w, UNNEST(generate_series(1, len(ws)-2)) AS t(i))
"""

SIG_SQL = f"""
    WITH {_SHINGLE_CTE},
    h AS (SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT % 1000000007 AS h FROM sh),
    sig AS (
      SELECT doc_id,
             min((769406093*h + 329170049) % 1000000007) AS mh0,
             min((297281389*h + 851730013) % 1000000007) AS mh1,
             min((613599841*h + 104938207) % 1000000007) AS mh2,
             min((936024263*h + 734102389) % 1000000007) AS mh3,
             min((83102273*h + 611920481) % 1000000007) AS mh4,
             min((521470367*h + 271828183) % 1000000007) AS mh5,
             min((402360139*h + 946073821) % 1000000007) AS mh6,
             min((158700989*h + 39916801) % 1000000007) AS mh7
      FROM h GROUP BY doc_id
    )
"""


@register(
    "dedup_exact",
    """
    WITH d2 AS (
      SELECT d1.doc_id,
             CASE WHEN d1.doc_id % 5 = 4 THEN prev.text ELSE d1.text END AS text
      FROM documents d1 LEFT JOIN documents prev ON prev.doc_id = d1.doc_id - 1
    )
    SELECT md5(text) AS content_hash, min(doc_id) AS keeper_id, count(*) AS n_copies
    FROM d2 GROUP BY md5(text)
    """,
    doc="exact dedup via content-hash groupBy (synthetic dups: every 5th doc repeats its predecessor)",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    prev = docs.select((F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("prev_text"))
    with_dups = (
        docs.join(prev, "doc_id", "left")
        .select(
            "doc_id",
            F.when((F.col("doc_id") % 5 == 4) & F.col("prev_text").isNotNull(), F.col("prev_text"))
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return D.exact_dedup(with_dups)


@register(
    "dedup_minhash_signatures",
    f"""{SIG_SQL}
    SELECT doc_id, mh0, mh1, mh2, mh3, mh4, mh5, mh6, mh7 FROM sig
    """,
    doc="MinHash signatures: universal hash family over one md5 per shingle",
)
def dedup_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_signatures(D.exploded_shingles(docs), num_hashes=8)


@register(
    "dedup_lsh_candidates",
    f"""{SIG_SQL},
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM buckets l JOIN buckets r ON l.band = r.band AND l.bucket = r.bucket
      WHERE l.doc_id < r.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS n_common
      FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY sa.doc_id, sb.doc_id
    )
    SELECT c.a, c.b,
           i.n_common / (za.sz + zb.sz - i.n_common) AS jaccard
    FROM cand c
    JOIN inter i ON i.a = c.a AND i.b = c.b
    JOIN sizes za ON za.doc_id = c.a
    JOIN sizes zb ON zb.doc_id = c.b
    """,
    doc="MinHash-LSH near-dup candidates (8 bands x 1 row) verified with exact "
        "shingle Jaccard — CORRECTNESS BASELINE ONLY: the uncapped bucket "
        "self-join is quadratic on hot buckets; the scale path is "
        "dedup_lsh_candidates_capped (max_bucket_size)",
    scale_safe=False,
    baseline_only=True,
)
def dedup_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sh = D.exploded_shingles(docs)
    sigs = D.minhash_signatures(sh, num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    pairs = D.candidate_pairs(buckets)
    return D.jaccard_pairs(sh, pairs)


@register(
    "dedup_simhash",
    f"""
    WITH {_SHINGLE_CTE},
    bits AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 4))::BIGINT AS h
      FROM sh
    ),
    sums AS (
      SELECT doc_id,
             {', '.join(f"sum(CASE WHEN (h // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS s{i}" for i in range(16))}
      FROM bits GROUP BY doc_id
    )
    SELECT doc_id,
           ({' + '.join(f"CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(16))})::BIGINT AS simhash
    FROM sums
    """,
    doc="16-bit SimHash fingerprints from shingle md5 nibbles",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.simhash16(D.exploded_shingles(docs))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLE_CTE},
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS n_common
      FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY sa.doc_id, sb.doc_id
    )
    SELECT i.a, i.b, i.n_common / (za.sz + zb.sz - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.a
    JOIN sizes zb ON zb.doc_id = i.b
    WHERE i.n_common / (za.sz + zb.sz - i.n_common) >= 0.05
    """,
    doc="n-gram Jaccard similarity pairs (shingle self-join, threshold 0.05) — "
        "CORRECTNESS BASELINE ONLY: the uncapped self-join is quadratic on hot "
        "shingles; the scale path is dedup_ngram_jaccard_capped (max_doc_freq)",
    scale_safe=False,
    baseline_only=True,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    return D.jaccard_pairs(D.exploded_shingles(docs), threshold=0.05)


_DOT_SQL = """list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(1, len({a})),
                              i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), (x,y) -> x+y)"""


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_DOT_SQL.format(a=a, b=b)}) / "
        f"(sqrt({_DOT_SQL.format(a=a, b=a)}) * sqrt({_DOT_SQL.format(a=b, b=b)}))"
    )


@register(
    "sim_knn_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 100),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_cos_sql('q.qvec', 'c.embedding')} AS cos_sim
      FROM q, embeddings c
      WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 3
    """,
    doc="brute-force cosine top-3 for a FIXED 100-vector query set (identical "
        "left-to-right double accumulation both engines). The query side is "
        "bounded by construction — vec_id < 100, not a corpus fraction — so "
        "the broadcast is 100 vectors and total cost is O(corpus), one linear "
        "scan: the exact ground-truth pass ANN indexes are evaluated against",
)
def sim_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 100)
    return S.knn_bruteforce(queries, emb, k=3)


@register(
    "sim_ivf_clusters",
    f"""
    WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16),
    scored AS (
      SELECT e.vec_id, c.cid,
             {_cos_sql('e.embedding', 'c.cvec')} AS csim
      FROM embeddings e, cents c
    ),
    assigned AS (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
      FROM scored
    )
    SELECT cid, count(*) AS n FROM assigned WHERE rn = 1 GROUP BY cid
    """,
    doc="IVF cluster assignment histogram (deterministic centroids = first 16 vectors)",
)
def sim_ivf_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.deterministic_centroids(emb, 16)
    assigned = S.assign_clusters(emb, cents)
    return assigned.groupBy("cid").agg(F.count("*").alias("n"))


@register(
    "sim_embedding_norms",
    f"""
    SELECT vec_id, label,
           sqrt({_DOT_SQL.format(a='embedding', b='embedding')}) AS l2_norm
    FROM embeddings
    """,
    doc="per-vector L2 norm (no cross-row float aggregation -> exact)",
)
def sim_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select("vec_id", "label", S.l2_norm(F.col("embedding")).alias("l2_norm"))


@register(
    "text_token_stats",
    """
    SELECT doc_id,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint,
           list_reduce(list_prepend(0::BIGINT,
             list_transform(generate_series(1, length(text)),
                            i -> ascii(substr(text, i, 1))::BIGINT)),
             (a,b) -> (a*31+b) % 1000000007) AS rhash
    FROM documents
    """,
    doc="token counting (whitespace + BPE-ish), md5 fingerprint, polynomial rolling hash",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return docs.select(
        "doc_id",
        TA.token_count(F.col("text")).alias("n_tokens"),
        TA.bpe_ish_token_count(F.col("text")).alias("n_bpe"),
        TA.doc_fingerprint(F.col("text")).alias("fingerprint"),
        TA.rolling_hash(F.col("text")).alias("rhash"),
    )


_RATIO_SQL = """(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                  t -> list_contains({words}, t)))
                 / len(string_split_regex(trim(lower(text)), '\\s+')))"""

_LANG_WORDS = {
    "en": "['the','and','of','to','a','in','is','it']",
    "de": "['der','die','das','und','ist','nicht','ein']",
    "fr": "['le','la','les','et','est','un','une']",
    "es": "['el','la','los','y','es','un','una']",
}


@register(
    "text_quality_langid",
    f"""
    WITH r AS (
      SELECT doc_id, lang,
             {_RATIO_SQL.format(words=_LANG_WORDS['en'])} AS r_en,
             {_RATIO_SQL.format(words=_LANG_WORDS['de'])} AS r_de,
             {_RATIO_SQL.format(words=_LANG_WORDS['fr'])} AS r_fr,
             {_RATIO_SQL.format(words=_LANG_WORDS['es'])} AS r_es,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok,
             length(replace(text, ' ', '')) AS n_char_nospace
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN greatest(r_en, r_de, r_fr, r_es) <= 0.03 THEN 'und'
                WHEN r_en >= r_de AND r_en >= r_fr AND r_en >= r_es THEN 'en'
                WHEN r_de >= r_fr AND r_de >= r_es THEN 'de'
                WHEN r_fr >= r_es THEN 'fr'
                ELSE 'es' END AS lang_guess,
           (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END
            + CASE WHEN n_char_nospace / n_tok BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
            + CASE WHEN r_en > 0.05 THEN 0.3 ELSE 0.0 END) AS quality
    FROM r
    """,
    doc="language-ID by stopword-ratio argmax + composite quality score",
)
def text_quality_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    return docs.select(
        "doc_id",
        "lang",
        TA.lang_id(F.col("text")).alias("lang_guess"),
        TA.quality_score(F.col("text")).alias("quality"),
    )


# The synthesized media table is a REAL binary-PPM corpus built from Spark
# expressions (extensions.multimodal.synthesize_media_table): width =
# 8 + length(text) % 8, height = 4, raster = first w*12 bytes of
# repeat(md5(text), 6). The kernels parse the actual PPM header + raster, so
# a DuckDB oracle that re-derives the construction checks the decoder
# value-for-value.
_MM_RASTER_CTE = """r AS (
      SELECT doc_id,
             (8 + length(text) % 8) AS w,
             substr(repeat(md5(text), 6), 1, (8 + length(text) % 8) * 12) AS ras
      FROM documents
    )"""


@register(
    "mm_image_features",
    f"""
    WITH {_MM_RASTER_CTE},
    px AS (
      SELECT doc_id, w, ascii(substr(ras, u.i, 1)) AS v, length(ras) AS n
      FROM r, unnest(generate_series(1, length(ras))) AS u(i)
    )
    SELECT doc_id AS media_id,
           sum(v) / n AS mean_px,
           sqrt(sum(v * v) / n - (sum(v) / n) * (sum(v) / n)) AS std_px,
           (max(w) * 4)::BIGINT AS n_px
    FROM px GROUP BY doc_id, n
    """,
    doc="multimodal: Arrow-batched feature extraction through a REAL pure-Python "
        "PPM decode (header parse + raster stats), value-checked by the oracle",
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    return M.extract_image_features(media)


@register(
    "mm_frame_sample",
    f"""
    WITH {_MM_RASTER_CTE},
    f AS (SELECT doc_id, ras, unnest([0, 1, 2, 3, 4]) AS i FROM r)
    SELECT doc_id AS media_id, i::INT AS frame_idx,
           md5(substr(ras, length(ras) - i * 10 + 1)
               || substr(ras, 1, length(ras) - i * 10)) AS frame_hash
    FROM f
    """,
    doc="multimodal: frame sampling (rolled-raster frames, md5-hashed) through the "
        "real PPM decode — frame hashes oracle-checked exactly",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    return M.sample_frames(media)


@register(
    "mm_metadata",
    """
    SELECT doc_id AS media_id,
           'ppm' AS format,
           (8 + length(text) % 8)::INT AS width,
           4::INT AS height,
           ((8 + length(text) % 8) * 12)::BIGINT AS n_raster
    FROM documents
    """,
    doc="multimodal: header-only metadata parse from blob bytes (format sniff, "
        "width/height/raster size) — proves the codec reads the header, not the meta column",
)
def mm_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    return M.extract_metadata(media)


# ---------------------------------------------------------------------------
# Full-stack streaming CDC (Phase 4 through the oracle gate): the same event
# set as cdc_apply_orders, but serialized to Debezium JSON envelopes, ridden
# through the file transport -> Structured Streaming (availableNow) ->
# foreachBatch pipeline -> parquet state store, then read back.
# ---------------------------------------------------------------------------

# Phase timings of the most recent _stream_cdc_run, for bench.py: the
# harness phases (envelope synthesis + transport write, store seeding) are
# test-data generation, not pipeline cost — BENCH JSON reports them
# separately so the stream metric grades the pipeline (VERDICT r5 #6).
STREAM_PHASES: dict[str, float] = {}

# Per-microbatch observability of the most recent stream_cdc_transactional
# run, populated ONLY under SPARK_GRAFT_STREAM_PROBE=1 (tools/stream_probe.py):
# each entry records batch size, surviving pending rows, and the pending
# rewrite seconds — the evidence that the rewrite scales with pending size.
TX_STREAM_BATCHES: list[dict] = []


def _stream_cdc_run(spark: SparkSession, sf_dir: str, store=None) -> DataFrame:
    """Shared harness: serialize CDC events as Debezium envelopes, ride the
    file transport through the foreachBatch pipeline into ``store`` (None →
    the pipeline's default, the bucket-partitioned partial-rewrite store),
    read the final state back."""
    import tempfile
    import time as _time

    from etl_consumer_spark.config import Config
    from etl_consumer_spark.sources.envelope import WireField
    from etl_consumer_spark.sources.kafka import file_envelope_stream
    from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey") % 4
    row_img = F.struct("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    upd_img = F.struct(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )
    img_t = "struct<o_orderkey:long,o_custkey:long,o_orderstatus:string,o_totalprice:double>"
    envelopes = orders.filter(k != 2).select(
        F.lit("srv.db0.orders").alias("topic"),
        F.to_json(
            F.struct(
                F.struct(
                    F.when(k == 3, F.lit(None).cast(img_t)).otherwise(row_img).alias("before"),
                    F.when(k == 1, F.lit(None).cast(img_t))
                    .when(k == 0, upd_img)
                    .otherwise(row_img)
                    .alias("after"),
                    F.struct(
                        F.lit("srv").alias("name"),
                        F.lit("db0").alias("db"),
                        F.lit("orders").alias("table"),
                        F.col("o_orderkey").alias("pos"),
                        F.lit(0).alias("row"),
                    ).alias("source"),
                    F.lit("c").alias("op"),
                    F.lit(0).cast("long").alias("ts_ms"),
                ).alias("payload")
            )
        ).cast("binary").alias("value"),
        F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    )
    _t0 = _time.time()
    base = tempfile.mkdtemp(prefix="stream_cdc_")
    envelopes.write.mode("overwrite").parquet(f"{base}/transport")
    _t1 = _time.time()

    cfg = Config()
    cfg.server, cfg.db_name, cfg.tables = "srv", "db0", ["orders"]
    fields = [
        WireField("o_orderkey", "int64"),
        WireField("o_custkey", "int64"),
        WireField("o_orderstatus", "string"),
        WireField("o_totalprice", "float64"),
    ]
    pipe = CDCPipeline(
        spark, cfg, [TableSpec("orders", fields, ["o_orderkey"])],
        store, state_path=f"{base}/state",
    )
    store = pipe.store
    store.init("orders", orders.filter(k != 3), ["o_orderkey"]) if hasattr(
        store, "_pk_cols"
    ) else store.init("orders", orders.filter(k != 3))
    _t2 = _time.time()
    q = pipe.start(
        file_envelope_stream(spark, f"{base}/transport"),
        checkpoint_dir=f"{base}/ckpt",
        trigger_available_now=True,
    )
    q.awaitTermination(300)
    _t3 = _time.time()
    STREAM_PHASES.clear()
    STREAM_PHASES.update(
        {
            "transport_write_s": round(_t1 - _t0, 3),
            "store_seed_s": round(_t2 - _t1, 3),
            "stream_run_s": round(_t3 - _t2, 3),
        }
    )
    return store.read("orders")


@register(
    "stream_cdc_full_stack",
    _CDC_APPLY_ORACLE.replace("o_totalprice + 1000", "o_totalprice + 1000.0"),
    doc="end-to-end Structured Streaming CDC apply (pipeline-default bucket-partitioned "
        "state store, partial-rewrite upserts) vs the same SQL oracle as the batch path",
)
def stream_cdc_full_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _stream_cdc_run(spark, sf_dir, store=None)


@register(
    "stream_cdc_multi_table",
    """
    WITH state AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders WHERE o_orderkey % 4 <> 3
    ),
    ord AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 4 = 0 THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice
      FROM state WHERE o_orderkey % 4 <> 1
      UNION ALL
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 3
    ),
    cst AS (SELECT c_custkey FROM customer WHERE c_custkey % 4 <> 1)
    SELECT 'orders' AS table_name, count(*) AS n,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS val_sum
    FROM ord
    UNION ALL
    SELECT 'custs', count(*), CAST(sum(c_custkey) AS BIGINT), 0.0 FROM cst
    """,
    doc="two tables through ONE availableNow stream: per-topic routing (P1), "
        "independent decode specs and per-table state applies in a single "
        "micro-batch pipeline, verified via per-table aggregate checksums",
)
def stream_cdc_multi_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_consumer_spark.config import Config
    from etl_consumer_spark.sources.envelope import WireField
    from etl_consumer_spark.sources.kafka import file_envelope_stream
    from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey") % 4
    row_img = F.struct("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    upd_img = F.struct(
        F.col("o_orderkey"), F.col("o_custkey"), F.col("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )
    img_t = "struct<o_orderkey:long,o_custkey:long,o_orderstatus:string,o_totalprice:double>"

    def env(topic, table, before, after, pos):
        return F.to_json(
            F.struct(
                F.struct(
                    before.alias("before"),
                    after.alias("after"),
                    F.struct(
                        F.lit("srv").alias("name"), F.lit("db0").alias("db"),
                        F.lit(table).alias("table"), pos.alias("pos"),
                        F.lit(0).alias("row"),
                    ).alias("source"),
                    F.lit("c").alias("op"), F.lit(0).cast("long").alias("ts_ms"),
                ).alias("payload")
            )
        ).cast("binary")

    ord_env = orders.filter(k != 2).select(
        F.lit("srv.db0.orders").alias("topic"),
        env(
            "srv.db0.orders", "orders",
            F.when(k == 3, F.lit(None).cast(img_t)).otherwise(row_img),
            F.when(k == 1, F.lit(None).cast(img_t)).when(k == 0, upd_img).otherwise(row_img),
            F.col("o_orderkey"),
        ).alias("value"),
        F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    c_img = "struct<c_custkey:long,c_name:string>"
    c_row = F.struct("c_custkey", "c_name")
    ins = cust.select(
        F.lit("srv.db0.custs").alias("topic"),
        env("srv.db0.custs", "custs", F.lit(None).cast(c_img), c_row, F.col("c_custkey")).alias("value"),
        F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    )
    dels = cust.filter(F.col("c_custkey") % 4 == 1).select(
        F.lit("srv.db0.custs").alias("topic"),
        env("srv.db0.custs", "custs", c_row, F.lit(None).cast(c_img),
            F.col("c_custkey") + 10_000_000).alias("value"),
        F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    )
    base = tempfile.mkdtemp(prefix="stream_multi_")
    ord_env.unionByName(ins).unionByName(dels).write.mode("overwrite").parquet(f"{base}/transport")

    cfg = Config()
    cfg.server, cfg.db_name, cfg.tables = "srv", "db0", ["orders", "custs"]
    specs = [
        TableSpec("orders", [
            WireField("o_orderkey", "int64"), WireField("o_custkey", "int64"),
            WireField("o_orderstatus", "string"), WireField("o_totalprice", "float64"),
        ], ["o_orderkey"]),
        TableSpec("custs", [
            WireField("c_custkey", "int64"), WireField("c_name", "string"),
        ], ["c_custkey"]),
    ]
    pipe = CDCPipeline(spark, cfg, specs, state_path=f"{base}/state")
    pipe.store.init("orders", orders.filter(k != 3), ["o_orderkey"])
    pipe.store.init(
        "custs", spark.createDataFrame([], "c_custkey long, c_name string"), ["c_custkey"]
    )
    q = pipe.start(
        file_envelope_stream(spark, f"{base}/transport"),
        checkpoint_dir=f"{base}/ckpt", trigger_available_now=True,
    )
    q.awaitTermination(300)
    ord_state = pipe.store.read("orders")
    cst_state = pipe.store.read("custs")
    ord_agg = ord_state.agg(
        F.lit("orders").alias("table_name"),
        F.count("*").alias("n"),
        F.sum("o_orderkey").cast("long").alias("key_sum"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("val_sum"),
    )
    cst_agg = cst_state.agg(
        F.lit("custs").alias("table_name"),
        F.count("*").alias("n"),
        F.sum("c_custkey").cast("long").alias("key_sum"),
        F.lit(0.0).alias("val_sum"),
    )
    return ord_agg.unionByName(cst_agg)


@register(
    "stream_cdc_partitioned",
    _CDC_APPLY_ORACLE.replace("o_totalprice + 1000", "o_totalprice + 1000.0"),
    doc="same stream through a range-bucketed partial-rewrite store — sharing the "
        "versioned-path oracle proves partitioned-upsert ≡ versioned-upsert",
)
def stream_cdc_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore

    base = tempfile.mkdtemp(prefix="stream_cdc_range_")
    store = PartitionedParquetStateStore(
        spark, f"{base}/state", bucket_mode="range", range_size=4096
    )
    return _stream_cdc_run(spark, sf_dir, store=store)


# ---------------------------------------------------------------------------
# K2 — dead-letter shaping (reference main.go:76,92,143; FIXTURES.md §5)
# ---------------------------------------------------------------------------

@register(
    "k2_dead_letter_shape",
    """
    SELECT props AS data,
           regexp_replace('Error 1062: Duplicate entry ''' || event_type || '''',
                          '[^a-zA-Z0-9-]+', '-', 'g') AS error,
           'orders' AS table_name,
           'db0' AS db_name
    FROM events
    """,
    doc="dead-letter row shaping with sanitize.BaseName-style error text",
)
def k2_dead_letter_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.sinks.dead_letter import dead_letter_rows

    ev = load_table(spark, sf_dir, "events")
    shaped = ev.select(
        F.col("props").alias("value"),
        F.concat(F.lit("Error 1062: Duplicate entry '"), F.col("event_type"), F.lit("'")).alias("err"),
    )
    return dead_letter_rows(shaped, "err", "orders", "db0")


# ---------------------------------------------------------------------------
# As-of join + sessionization (analytic operators; SURVEY §2.8)
# ---------------------------------------------------------------------------

@register(
    "analytic_asof_join",
    """
    WITH r AS (  -- unique right rows per (key, ts): keep max orderkey
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
             max_by(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           r.o_orderkey AS last_orderkey, r.o_totalprice AS last_totalprice
    FROM (SELECT event_id, user_id, epoch_ms(epoch_ns(ts) // 1000000) AS ts FROM events) e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
    """,
    doc="as-of (backward) join: latest order at-or-before each event, union+carry-forward plan",
)
def analytic_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.analytic import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", F.col("user_id").alias("k"), "ts")
    orders = load_table(spark, sf_dir, "orders")
    r = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
        .select(F.col("o_custkey").alias("k"), "o_orderdate", "o_orderkey", "o_totalprice")
    )
    out = asof_join(
        ev, r, key="k", left_ts="ts", right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
    )
    return out.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.col("o_totalprice").alias("last_totalprice"),
    )


@register(
    "analytic_asof_join_forward",
    """
    WITH r AS (
      SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
             max_by(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate
    )
    SELECT e.event_id, e.user_id,
           r.o_orderkey AS next_orderkey, r.o_totalprice AS next_totalprice
    FROM (SELECT event_id, user_id, epoch_ms(epoch_ns(ts) // 1000000) AS ts FROM events) e
    ASOF LEFT JOIN r ON e.user_id = r.o_custkey AND e.ts <= r.o_orderdate
    """,
    doc="as-of (forward) join: earliest order at-or-after each event — the "
        "carry-backward mirror of the backward plan (first-over-following window)",
)
def analytic_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.analytic import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", F.col("user_id").alias("k"), "ts")
    orders = load_table(spark, sf_dir, "orders")
    r = (
        orders.groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
        .select(F.col("o_custkey").alias("k"), "o_orderdate", "o_orderkey", "o_totalprice")
    )
    out = asof_join(
        ev, r, key="k", left_ts="ts", right_ts="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"], direction="forward",
    )
    return out.select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("o_orderkey").alias("next_orderkey"),
        F.col("o_totalprice").alias("next_totalprice"),
    )


@register(
    "analytic_range_join",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             epoch_ns(ts) // 1000000000 AS es
      FROM events
    )
    SELECT err.event_id AS error_id, err.user_id,
           clk.event_id AS click_id,
           CAST(clk.es - err.es AS BIGINT) AS gap_s
    FROM e err JOIN e clk
      ON err.user_id = clk.user_id
     AND err.event_type = 'error' AND clk.event_type = 'click'
     AND clk.es BETWEEN err.es - 3600 AND err.es + 3600
    """,
    doc="banded range join: clicks within 1 hour of each error per user (funnel "
        "attribution) — left rows replicate into overlapped coarse buckets, "
        "equi-join on (key, bucket), exact range filter after; no per-key cross product",
)
def analytic_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.analytic import range_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", F.col("ts").cast("long").alias("es")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), F.col("user_id"), F.col("es")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("user_id"), F.col("es").alias("ces")
    )
    out = range_join(
        errors, clicks, key="user_id", left_point="es", right_point="ces",
        lower=-3600, upper=3600,
    )
    return out.select(
        "error_id", "user_id", "click_id", (F.col("ces") - F.col("es")).alias("gap_s")
    )


@register(
    "stream_stateful_running_counts",
    """
    SELECT user_id,
           count(*) AS running_count,
           CAST(sum(CAST(floor(value) AS BIGINT)) AS DOUBLE) AS running_sum
    FROM events GROUP BY user_id
    """,
    doc="custom stateful streaming (applyInPandasWithState): per-key running "
        "(count, sum) across micro-batches; final state equals the batch aggregate "
        "(integer-valued sums keep accumulation order-independent)",
)
def stream_stateful_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    from etl_consumer_spark.streaming.stateful import streaming_running_counts

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.floor("value").cast("double").alias("fv")
    )
    base = tempfile.mkdtemp(prefix="stream_state_")
    ev.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/in")
    counts = streaming_running_counts(stream, key_col="user_id", value_col="fv")
    sink = f"rc_{uuid.uuid4().hex[:8]}"
    q = (
        counts.writeStream.outputMode("update")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # running counters are monotone; the final value per key is the max
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(F.max("running_count").alias("running_count"), F.max("running_sum").alias("running_sum"))
    )


@register(
    "analytic_sessionize",
    """
    WITH e AS (
      SELECT event_id, user_id, epoch_ms(epoch_ns(ts) // 1000000) AS ts FROM events
    ),
    g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    )
    SELECT event_id, user_id,
           CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS session_id
    FROM g
    """,
    doc="sessionization: 30-min-gap session ids via lag + running sum",
)
def analytic_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.analytic import sessionize

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    return sessionize(ev, "user_id", "ts", gap_minutes=30).select(
        "event_id", "user_id", "session_id"
    )


@register(
    "analytic_session_stats",
    """
    WITH e AS (
      SELECT event_id, user_id, epoch_ms(epoch_ns(ts) // 1000000) AS ts FROM events
    ),
    g AS (
      SELECT event_id, user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    s AS (
      SELECT event_id, user_id, ts,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM g
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           -- floor each endpoint separately: Spark's unix_timestamp floors
           -- to seconds per value (and DuckDB CAST(double AS BIGINT) rounds)
           CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS duration_s
    FROM s GROUP BY user_id, session_id
    """,
    doc="session-level rollup on top of sessionization: events per session and "
        "session duration (two stacked windows + one aggregate, single shuffle key)",
)
def analytic_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.analytic import sessionize

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30)
    return s.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("duration_s"),
    )


@register(
    "olap_q2_min_cost_supplier",
    """
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             min(CAST(l_extendedprice AS DECIMAL(18,2))) AS supp_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    best AS (SELECT l_partkey, min(supp_cost) AS min_cost FROM cost GROUP BY l_partkey)
    SELECT p.p_partkey, p.p_brand,
           CAST(c.supp_cost AS DOUBLE) AS supp_cost,
           min(c.l_suppkey) AS best_suppkey
    FROM part p
    JOIN cost c ON c.l_partkey = p.p_partkey
    JOIN best b ON b.l_partkey = c.l_partkey AND c.supp_cost = b.min_cost
    WHERE p.p_size <= 5
    GROUP BY p.p_partkey, p.p_brand, c.supp_cost
    """,
    doc="TPC-H Q2 shape: correlated MIN subquery (cheapest supplier per part) "
        "decorrelated to a pre-aggregated self-join; exact decimal min so the "
        "equality predicate is engine-stable",
)
def olap_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice").cast("decimal(18,2)")).alias("supp_cost")
    )
    best = cost.groupBy("l_partkey").agg(F.min("supp_cost").alias("min_cost"))
    small = part.filter(F.col("p_size") <= 5).select("p_partkey", "p_brand")
    out = (
        cost.join(best, "l_partkey")
        .filter(F.col("supp_cost") == F.col("min_cost"))
        .join(F.broadcast(small), cost.l_partkey == small.p_partkey)
    )
    return out.groupBy("p_partkey", "p_brand", "supp_cost").agg(
        F.min("l_suppkey").alias("best_suppkey")
    ).select(
        "p_partkey", "p_brand", F.col("supp_cost").cast("double").alias("supp_cost"),
        "best_suppkey",
    )


@register(
    "olap_not_in_null_semantics",
    """
    WITH sub AS (
      SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL ELSE o_custkey END AS k
      FROM orders
    )
    SELECT
      (SELECT count(*) FROM customer WHERE c_custkey NOT IN (SELECT k FROM sub)) AS n_not_in,
      (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM sub WHERE sub.k = c.c_custkey)) AS n_not_exists
    """,
    doc="three-valued NOT IN vs NOT EXISTS: one NULL in the subquery makes NOT IN "
        "empty while NOT EXISTS keeps matching — the classic SQL-semantics trap, "
        "expressed as a null-aware anti join vs a plain anti join",
)
def olap_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders")
    sub = o.select(
        F.when(F.col("o_orderkey") % 100 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("k")
    )
    # NOT IN is null-aware (three-valued): one NULL in the subquery makes
    # the predicate UNKNOWN for every non-member, so no row ever qualifies
    has_null = sub.agg(F.max(F.col("k").isNull()).alias("hn"))
    not_in = (
        c.join(sub.filter(F.col("k").isNotNull()).distinct(),
               c.c_custkey == F.col("k"), "left_anti")
        .crossJoin(F.broadcast(has_null))
        .filter(~F.col("hn"))  # a NULL in sub -> zero rows qualify
    )
    not_exists = c.join(
        sub.filter(F.col("k").isNotNull()).distinct(), c.c_custkey == F.col("k"), "left_anti"
    )
    return not_in.agg(F.count("*").alias("n_not_in")).crossJoin(
        not_exists.agg(F.count("*").alias("n_not_exists"))
    )


# ---------------------------------------------------------------------------
# Grouping sets / pivot / percentiles (agg-family coverage)
# ---------------------------------------------------------------------------

@register(
    "olap_rollup",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (subtotal + grand-total rows)",
)
def olap_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "olap_pivot",
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
           CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="pivot on linestatus (conditional-agg equivalent in the oracle)",
)
def olap_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double"))
    )


@register(
    "olap_percentiles",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="exact continuous percentiles (linear interpolation both engines, rounded)",
)
def olap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_extendedprice", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("l_extendedprice", F.lit(0.99)), 6).alias("p99"),
    )


# ---------------------------------------------------------------------------
# Streaming windowed aggregation with watermark (Structured Streaming
# surface: tumbling windows + late-data handling), verified against a
# date_trunc oracle — window start == hour truncation for 1h tumbling.
# ---------------------------------------------------------------------------

@register(
    "stream_windowed_agg",
    """
    SELECT date_trunc('hour', epoch_ms(epoch_ns(ts) // 1000000)) AS window_start,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling 1h windowed agg with 10min watermark through readStream/availableNow",
)
def stream_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="stream_win_")
    ev.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/in")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,3)")).cast("double").alias("total_value"),
        )
    )
    sink = f"out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    )


@register(
    "stream_dedup_watermark",
    """
    SELECT event_id, user_id, event_type,
           date_trunc('hour', epoch_ms(epoch_ns(ts) // 1000000)) AS ts_hour
    FROM events
    """,
    doc="streaming exactly-once dedup: 3x-duplicated input through "
        "withWatermark + dropDuplicates (stateful streaming dedup operator), "
        "one surviving row per event_id",
)
def stream_dedup_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    tripled = ev.withColumn("_i", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3)))).drop("_i")
    base = tempfile.mkdtemp(prefix="stream_dedup_")
    tripled.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(tripled.schema).parquet(f"{base}/in")
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicates(["event_id"])
    sink = f"dedup_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).select(
        "event_id", "user_id", "event_type",
        F.date_trunc("hour", F.col("ts")).alias("ts_hour"),
    )


# ---------------------------------------------------------------------------
# F8 unicode char-map parity: inject the reference charMap specials into the
# ASCII corpus so the translate/replace chain is oracle-verified, not just
# the length/truncate paths.
# ---------------------------------------------------------------------------

@register(
    "f8_clean_text_unicode",
    """
    WITH d AS (
      SELECT doc_id,
             'rock & roll … ' || chr(8216) || 'q' || chr(8217) || ' ' ||
             chr(8220) || 'w' || chr(8221) || ' – x — ' || chr(10004) ||
             substr(text, 1, 40) AS t
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN length(t) < 5 THEN ''
                WHEN length(replaced) > 70 THEN substr(replaced, 1, 67) || '...'
                ELSE replaced END AS cleaned
    FROM (
      SELECT doc_id, t,
             replace(replace(replace(replace(replace(replace(replace(replace(
               t, '&', 'and'), '…', '...'),
               chr(8216), ''), chr(8217), ''),
               chr(8220), '"'), chr(8221), '"'),
               '–', '-'), '—', '-') AS replaced
      FROM d
    )
    """,
    doc="F8 char-map parity: ampersand/ellipsis/curly-quotes/dashes through the translate chain",
)
def f8_clean_text_unicode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.lit("rock & roll … ‘q’ “w” – x — ✔"),
        F.substring("text", 1, 40),
    )
    return docs.select("doc_id", EF.clean_text(injected, 70).alias("cleaned"))


# ---------------------------------------------------------------------------
# Exact sequential per-key fold (cogrouped applyInPandas) — same event set
# as cdc_apply_orders; single-event-per-key batches make sequential ==
# compacted, so the same oracle gates the Python fold path too.
# ---------------------------------------------------------------------------

@register(
    "cdc_apply_sequential",
    _CDC_APPLY_ORACLE,
    doc="exact sequential per-key fold (cogrouped applyInPandas) vs the batch oracle",
)
def cdc_apply_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    state = orders.filter(F.col("o_orderkey") % 4 != 3)
    k = F.col("o_orderkey") % 4
    img_t = "struct<o_orderkey:long,o_custkey:long,o_orderstatus:string,o_totalprice:double>"
    row_img = F.struct("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    upd_img = F.struct(
        F.col("o_orderkey"),
        F.col("o_custkey"),
        F.col("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    events = orders.filter(k != 2).select(
        F.when(k == 3, F.lit(None).cast(img_t)).otherwise(row_img).alias("before"),
        F.when(k == 1, F.lit(None).cast(img_t))
        .when(k == 0, upd_img)
        .otherwise(row_img)
        .alias("after"),
        F.col("o_orderkey").alias("pos"),
        F.lit(0).cast("long").alias("ts_ms"),
    )
    return A.apply_cdc_sequential(state, events, ["o_orderkey"])


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup pairs, IVF-bucketed (dedup family, embeddings
# table). Oracle reproduces the same cluster-bucketed search — candidate
# scope is the cluster, matching the operator's documented recall trade.
# ---------------------------------------------------------------------------

@register(
    "dedup_embedding_neardups",
    f"""
    WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16),
    scored AS (
      SELECT e.vec_id, e.embedding, c.cid,
             {_cos_sql('e.embedding', 'c.cvec')} AS csim
      FROM embeddings e, cents c
    ),
    assigned AS (
      SELECT vec_id, embedding, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
      FROM scored
    ),
    mine AS (SELECT vec_id, embedding, cid FROM assigned WHERE rn = 1)
    SELECT a.vec_id AS a, b.vec_id AS b,
           round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM mine a JOIN mine b ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.4
    """,
    doc="embedding-cosine near-dup pairs within IVF clusters (threshold 0.4)",
)
def dedup_embedding_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.dedup import embedding_near_dups

    emb = load_table(spark, sf_dir, "embeddings")
    out = embedding_near_dups(emb, threshold=0.4, n_clusters=16)
    return out.select("a", "b", F.round("cos_sim", 6).alias("cos_sim"))


# ---------------------------------------------------------------------------
# Frequency-capped n-gram Jaccard — the scale-path variant: shingles present
# in more than max_doc_freq documents are dropped before the self-join
# (boilerplate text otherwise makes the candidate join quadratic). The
# oracle applies the identical cap.
# ---------------------------------------------------------------------------

@register(
    "dedup_ngram_jaccard_capped",
    f"""
    WITH {_SHINGLE_CTE},
    freq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
    kept AS (
      SELECT sh.doc_id, sh.shingle FROM sh JOIN freq USING (shingle) WHERE freq.df <= 4
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS n_common
      FROM kept sa JOIN kept sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY sa.doc_id, sb.doc_id
    )
    SELECT i.a, i.b, i.n_common / (za.sz + zb.sz - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes za ON za.doc_id = i.a
    JOIN sizes zb ON zb.doc_id = i.b
    WHERE i.n_common / (za.sz + zb.sz - i.n_common) >= 0.05
    """,
    doc="n-gram Jaccard with stop-shingle cap (doc freq <= 4) — the bounded-join scale path",
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    # grouped-pair formulation: one explode, pairs expanded map-side from
    # per-shingle id arrays (bounded by the cap) — vs the self-join + freq
    # anti-join shape, it halves the shingle hashing and drops one shuffle
    return D.jaccard_pairs_grouped(D.exploded_shingles(docs), threshold=0.05, max_doc_freq=4)


# ---------------------------------------------------------------------------
# Portable HyperLogLog registers (custom sketch as a composition of
# built-ins — engine-agnostic, unlike approx_count_distinct's opaque HLL++).
# Registers are exactly comparable across engines; the estimate is
# deterministic driver-side arithmetic over them.
# ---------------------------------------------------------------------------

@register(
    "sketch_hll_registers",
    """
    WITH h AS (
      SELECT md5(CAST(o_custkey AS VARCHAR)) AS hx FROM orders
    ),
    parts AS (
      SELECT ('0x' || substr(hx, 1, 2))::INTEGER AS bucket,
             substr(hx, 3, 13) AS payload
      FROM h
    ),
    ranks AS (
      SELECT bucket,
             CASE WHEN regexp_replace(payload, '^0+', '') = '' THEN 53
                  ELSE (length(payload) - length(regexp_replace(payload, '^0+', ''))) * 4
                       + CASE substr(regexp_replace(payload, '^0+', ''), 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                       + 1 END AS rank
      FROM parts
    )
    SELECT bucket, CAST(max(rank) AS INTEGER) AS r FROM ranks GROUP BY bucket
    """,
    doc="portable HLL-256 registers over orders.o_custkey (md5 bucketing, string-arithmetic ranks)",
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import hll_registers

    orders = load_table(spark, sf_dir, "orders")
    return hll_registers(orders, F.col("o_custkey"))


# ---------------------------------------------------------------------------
# Deterministic sampling / splits (training-data pipeline primitives):
# hash-derived assignment is reproducible across engines, runs, and
# repartitioning — unlike rand(seed).
# ---------------------------------------------------------------------------

_HASH_FRac_SQL = "(('0x' || substr(md5('{salt}' || CAST({key} AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)"


@register(
    "cdc_backfill_full_outer",
    _CDC_APPLY_ORACLE,
    doc="the SAME CDC apply through the backfill path (full-outer sort-merge, no "
        "broadcast) — the branch the stores auto-select for snapshot-sized batches; "
        "sharing cdc_apply_orders' oracle proves branch equivalence",
)
def cdc_backfill_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.apply import apply_cdc

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey") % 4
    state = orders.filter(k != 3)
    row_img = F.struct("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    upd_img = F.struct(
        F.col("o_orderkey"), F.col("o_custkey"), F.col("o_orderstatus"),
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
    )
    img_t = "struct<o_orderkey:long,o_custkey:long,o_orderstatus:string,o_totalprice:double>"
    events = orders.filter(k != 2).select(
        F.when(k == 3, F.lit(None).cast(img_t)).otherwise(row_img).alias("before"),
        F.when(k == 1, F.lit(None).cast(img_t)).when(k == 0, upd_img)
        .otherwise(row_img).alias("after"),
        F.col("o_orderkey").alias("pos"),
        F.lit(0).cast("long").alias("ts_ms"),
    )
    return apply_cdc(state, events, ["o_orderkey"], broadcast_batch=False)


@register(
    "olap_grouping_sets",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="explicit GROUPING SETS (beyond rollup/cube): independent subtotal "
        "dimensions plus the grand total in one pass",
)
def olap_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "sample_weighted_by_source",
    f"""
    WITH sz AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source)
    SELECT d.doc_id, d.source
    FROM documents d JOIN sz ON d.source = sz.source
    WHERE {_HASH_FRac_SQL.format(salt='downsample', key='d.doc_id')}
          < least(1.0, 20.0 / sz.cnt)
    """,
    doc="hot-source downsampling: keep ~quota docs per source by hashed-key "
        "fraction (stable under repartitioning and corpus growth — rand() is not)",
)
def sample_weighted_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    docs = load_table(spark, sf_dir, "documents")
    sz = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    return (
        docs.join(F.broadcast(sz), "source")
        .filter(
            hash_fraction(F.col("doc_id"), "downsample")
            < F.least(F.lit(1.0), F.lit(20.0) / F.col("cnt"))
        )
        .select("doc_id", "source")
    )


_MORTON_SQL = " + ".join(
    f"((((o_custkey >> {i}) & 1) << {2 * i}) + (((o_orderkey >> {i}) & 1) << {2 * i + 1}))"
    for i in range(16)
)


@register(
    "layout_zorder_key",
    f"""
    SELECT o_orderkey, o_custkey,
           CAST({_MORTON_SQL} AS BIGINT) AS zkey
    FROM orders
    """,
    doc="Z-order (Morton) key over (custkey, orderkey): bit interleave as pure "
        "integer expressions — sort files by zkey and range predicates on EITHER "
        "column prune row groups (the OPTIMIZE ZORDER BY layout primitive)",
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.layout import morton_key

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_custkey",
        morton_key(F.col("o_custkey"), F.col("o_orderkey"), bits=16).alias("zkey"),
    )


@register(
    "sample_deterministic_split",
    f"""
    SELECT doc_id,
           CASE WHEN {_HASH_FRac_SQL.format(salt='split', key='doc_id')} < 0.8 THEN 'train'
                WHEN {_HASH_FRac_SQL.format(salt='split', key='doc_id')} < 0.9 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="stable train/val/test assignment by hashed key (80/10/10)",
)
def sample_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    return deterministic_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


@register(
    "sample_per_source_quota",
    """
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM documents
    )
    SELECT doc_id, source FROM r WHERE rn <= 10
    """,
    doc="per-source document quota (top-10 by length) — corpus curation cap",
)
def sample_per_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import per_group_quota

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "_ord", -F.col("n_chars") + F.col("doc_id") / 1e12
    )
    out = per_group_quota(docs, "source", quota=10, order_col="_ord")
    return out.select("doc_id", "source")


# ---------------------------------------------------------------------------
# Deeper OLAP coverage: multi-join analytics in TPC-H shapes (Q3/Q5-like),
# semi/anti-join predicates — the query surface a reference user's analytics
# would migrate onto.
# ---------------------------------------------------------------------------

@register(
    "olap_q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue,
           strftime(CAST(o.o_orderdate AS DATE), '%Y-%m-%d') AS orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_nationkey < 12
      AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    """,
    doc="TPC-H Q3 shape: 3-way join, date-range pushdown. Revenue in "
        "integer-cents long arithmetic (the olap_q1 precedent: money carries "
        "2 decimal digits, so sum-of-cents x (100-disc) is exact and stays "
        "in codegen'd long hash-agg instead of Decimal128 partials)",
)
def olap_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_nationkey") < 12)
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1995-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date") > F.lit("1995-03-15")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            (F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ) / F.lit(10000.0)).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format(F.col("o_orderdate"), "yyyy-MM-dd").alias("orderdate"),
        )
    )


@register(
    "olap_q5_local_suppliers",
    """
    SELECT n.n_name,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way join with same-nation predicate, region "
        "filter; revenue in integer-cents long arithmetic (olap_q1 precedent)",
)
def olap_q5_local_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            (F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ) / F.lit(10000.0)).alias("revenue")
        )
    )


@register(
    "olap_semi_anti_joins",
    """
    SELECT
      (SELECT count(*) FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)) AS n_big_customers,
      (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS n_orderless
    """,
    doc="EXISTS / NOT EXISTS as left_semi / left_anti joins",
)
def olap_semi_anti_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One plan, one job: pre-aggregate orders per customer (map-side partials
    # into one shuffle), left-join, and fold both EXISTS counts in a single
    # final aggregate — the round-1 version ran two driver-side .count()
    # actions plus a createDataFrame (two full jobs for one bounded row).
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.max("o_totalprice").alias("_maxp"))
    j = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
    return j.agg(
        F.count(F.when(F.col("_maxp") > 200000, F.lit(1))).alias("n_big_customers"),
        F.count(F.when(F.col("o_custkey").isNull(), F.lit(1))).alias("n_orderless"),
    )


# ---------------------------------------------------------------------------
# F8 newline-join parity: the reference's accumulate-lines-until-max loop
# (utils/clean.go:14-24) as a fold, oracle-verified with injected newlines
# (the corpus itself has none).
# ---------------------------------------------------------------------------

@register(
    "f8_clean_text_newlines",
    """
    WITH d AS (
      SELECT doc_id,
             substr(text, 1, 30) || chr(10) || substr(text, 31, 30) || chr(10) ||
             substr(text, 61, 30) || chr(10) || substr(text, 91, 30) AS t
      FROM documents
    ),
    j AS (
      SELECT doc_id, t,
             list_reduce(string_split(t, chr(10)),
                         (acc, s) -> CASE WHEN length(acc) < 50
                                          THEN acc || ' ' || s ELSE acc END) AS joined
      FROM d
    )
    SELECT doc_id,
           CASE WHEN length(t) < 5 THEN ''
                WHEN length(joined) > 50 THEN substr(joined, 1, 47) || '...'
                ELSE joined END AS cleaned
    FROM j
    """,
    doc="F8 newline handling: first line + append-while-short fold, then truncate",
)
def f8_clean_text_newlines(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.substring("text", 1, 30), F.lit("\n"),
        F.substring("text", 31, 30), F.lit("\n"),
        F.substring("text", 61, 30), F.lit("\n"),
        F.substring("text", 91, 30),
    )
    return docs.select("doc_id", EF.clean_text(injected, 50).alias("cleaned"))


# ---------------------------------------------------------------------------
# F8 FULL char-map parity (VERDICT r6 #7): every entry of the reference's
# 54-entry charMap (utils/clean.go:26-81) — both multi-char targets
# (& -> and, ellipsis -> ...), all 1:1 substitutions, and all deletions —
# pushed through clean_text and oracle-verified. Input literal AND oracle
# replace chain are generated from functions/text.py's map at import, so
# the query cannot drift from the implementation it checks. Replace-chain
# order (multi -> deletions -> substitutions) mirrors translate()'s
# single-pass semantics: substitution OUTPUTS (ascii ' " . / , > - e u)
# must never be re-deleted, and no substitution source is ascii, so the
# sequential chain is exactly equivalent for arbitrary input.
# ---------------------------------------------------------------------------

def _f8_full_charmap_parts(base: str = "joined") -> tuple[str, str]:
    """(input literal covering the whole map, DuckDB replace-chain over
    ``base``)."""
    from etl_consumer_spark.functions.text import (
        _DELETIONS, _MULTI_REPLACEMENTS, _SUBSTITUTIONS,
    )

    def sq(s: str) -> str:
        return s.replace("'", "''")

    lit = "".join(
        f"{src}x" for src, _ in _MULTI_REPLACEMENTS + _SUBSTITUTIONS
    ) + "".join(f"{c}x" for c in _DELETIONS)
    expr = base
    for src, dst in _MULTI_REPLACEMENTS:
        expr = f"replace({expr}, '{sq(src)}', '{sq(dst)}')"
    for ch in _DELETIONS:
        expr = f"replace({expr}, '{sq(ch)}', '')"
    for src, dst in _SUBSTITUTIONS:
        expr = f"replace({expr}, '{sq(src)}', '{sq(dst)}')"
    return lit, expr


_F8_FULL_LIT, _F8_FULL_CHAIN = _f8_full_charmap_parts("joined")

@register(
    "f8_clean_text_charmap_full",
    f"""
    WITH d AS (
      SELECT doc_id,
             '{_F8_FULL_LIT.replace("'", "''")}' || chr(10) ||
             substr(text, 1, 60) AS t
      FROM documents
    ),
    j AS (
      -- fold over RAW lines (length check sees unmapped text), THEN map:
      -- clean_text applies the char map after the newline join
      SELECT doc_id, t,
             list_reduce(string_split(t, chr(10)),
                         (acc, s) -> CASE WHEN length(acc) < 100
                                          THEN acc || ' ' || s ELSE acc END) AS joined
      FROM d
    ),
    m AS (
      SELECT doc_id, t, {_F8_FULL_CHAIN} AS mapped
      FROM j
    )
    SELECT doc_id,
           CASE WHEN length(t) < 5 THEN ''
                WHEN length(mapped) > 100 THEN substr(mapped, 1, 97) || '...'
                ELSE mapped END AS cleaned
    FROM m
    """,
    doc="F8 full 54-entry char-map parity: the whole reference charMap "
        "(multi-char, substitutions, deletions) generated from the "
        "implementation's own table, through the newline fold and truncate "
        "paths (utils/clean.go:9-102)",
)
def f8_clean_text_charmap_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.lit(_F8_FULL_LIT), F.lit("\n"), F.substring("text", 1, 60)
    )
    return docs.select("doc_id", EF.clean_text(injected, 100).alias("cleaned"))


# ---------------------------------------------------------------------------
# Random-hyperplane LSH buckets for ANN (the LSH-bucketed variant alongside
# IVF): deterministic md5-derived planes, bucket-exact oracle.
# ---------------------------------------------------------------------------

_PLANE_SQL = "((('0x' || substr(md5({j} || '_' || i), 1, 8))::BIGINT % 1000) - 500)"


def _lsh_bits_sql(n_planes: int, vec: str = "embedding") -> str:
    return " || ".join(
        f"""(CASE WHEN list_reduce(list_prepend(0.0::DOUBLE,
               list_transform(generate_series(1, 64),
                              i -> {vec}[i]::DOUBLE * {_PLANE_SQL.format(j=j)}::DOUBLE)),
               (x,y) -> x+y) >= 0 THEN '1' ELSE '0' END)"""
        for j in range(n_planes)
    )


_LSH_BITS_SQL = _lsh_bits_sql(8)


@register(
    "sim_hyperplane_lsh",
    f"""
    SELECT vec_id, {_LSH_BITS_SQL} AS bucket
    FROM embeddings
    """,
    doc="random-hyperplane LSH buckets (8 planes, md5-derived, bucket-exact across engines)",
)
def sim_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.similarity import hyperplane_lsh_buckets

    emb = load_table(spark, sf_dir, "embeddings")
    return hyperplane_lsh_buckets(emb, n_planes=8, dim=64)


@register(
    "dedup_embedding_neardups_lsh",
    f"""
    WITH bk AS (
      SELECT vec_id, embedding, {_lsh_bits_sql(4)} AS bucket FROM embeddings
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.4
    """,
    doc="embedding near-dup pairs via hyperplane-LSH buckets — data-independent bucket "
        "count (2^planes), candidate search is an equi-join on the bucket key",
)
def dedup_embedding_neardups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.dedup import embedding_near_dups_lsh

    emb = load_table(spark, sf_dir, "embeddings")
    out = embedding_near_dups_lsh(emb, threshold=0.4, n_planes=4, dim=64)
    return out.select("a", "b", F.round("cos_sim", 6).alias("cos_sim"))


@register(
    "dedup_lsh_candidates_capped",
    f"""{SIG_SQL},
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    bsize AS (SELECT band, bucket, count(*) AS n FROM buckets GROUP BY band, bucket),
    kept AS (
      SELECT b.doc_id, b.band, b.bucket
      FROM buckets b JOIN bsize s ON b.band = s.band AND b.bucket = s.bucket
      WHERE s.n <= 3
    )
    SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
    FROM kept l JOIN kept r ON l.band = r.band AND l.bucket = r.bucket
    WHERE l.doc_id < r.doc_id
    """,
    doc="LSH candidate pairs with hot-bucket cap (size <= 3) — bounds the self-join "
        "against skewed buckets, the bucket-level twin of the stop-shingle cap",
)
def dedup_lsh_candidates_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.exploded_shingles(docs), num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    return D.candidate_pairs(buckets, max_bucket_size=3)


@register(
    "dedup_connected_components",
    SIG_SQL.replace("WITH ", "WITH RECURSIVE ", 1) + """,
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM buckets l JOIN buckets r ON l.band = r.band AND l.bucket = r.bucket
      WHERE l.doc_id < r.doc_id
    ),
    edges AS (SELECT a AS u, b AS v FROM cand UNION SELECT b, a FROM cand),
    reach AS (
      SELECT doc_id AS node, doc_id AS root FROM documents
      UNION
      SELECT e.v AS node, r.root AS root FROM reach r JOIN edges e ON e.u = r.node
    )
    SELECT node AS doc_id, min(root) AS component FROM reach GROUP BY node
    """,
    doc="near-dup clustering: connected components over LSH candidate pairs via "
        "iterative min-label propagation (component = min doc_id); oracle is a "
        "recursive-CTE reachability closure",
)
def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.exploded_shingles(docs), num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    pairs = D.candidate_pairs(buckets)
    return D.connected_components(pairs, docs, id_col="doc_id")


@register(
    "dedup_keep_list",
    SIG_SQL.replace("WITH ", "WITH RECURSIVE ", 1) + """,
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM buckets l JOIN buckets r ON l.band = r.band AND l.bucket = r.bucket
      WHERE l.doc_id < r.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS n_common
      FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY sa.doc_id, sb.doc_id
    ),
    jac AS (
      SELECT c.a, c.b
      FROM cand c
      JOIN inter i ON i.a = c.a AND i.b = c.b
      JOIN sizes za ON za.doc_id = c.a
      JOIN sizes zb ON zb.doc_id = c.b
      WHERE i.n_common / (za.sz + zb.sz - i.n_common) >= 0.5
    ),
    edges AS (SELECT a AS u, b AS v FROM jac UNION SELECT b, a FROM jac),
    reach AS (
      SELECT doc_id AS node, doc_id AS root FROM documents
      UNION
      SELECT e.v, r.root FROM reach r JOIN edges e ON e.u = r.node
    )
    SELECT node AS doc_id, min(root) AS component,
           node = min(root) AS is_keeper
    FROM reach GROUP BY node
    """,
    doc="END-TO-END near-dup dedup pipeline: MinHash -> LSH candidates -> exact "
        "Jaccard >= 0.5 verify -> connected components -> keep-list (keeper = min "
        "doc_id per component) — the full corpus-curation composition in one query",
)
def dedup_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sh = D.exploded_shingles(docs)
    sigs = D.minhash_signatures(sh, num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    cand = D.candidate_pairs(buckets)
    verified = D.jaccard_pairs(sh, cand, threshold=0.5).select("a", "b")
    cc = D.connected_components(verified, docs, id_col="doc_id")
    return cc.select(
        "doc_id", "component", (F.col("doc_id") == F.col("component")).alias("is_keeper")
    )


@register(
    "f_json_extract",
    """
    SELECT event_id,
           CAST(props->>'k' AS BIGINT) AS k_path,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_typed,
           (json_extract(props, '$.k') IS NOT NULL) AS has_k
    FROM events
    """,
    doc="JSON column functions over the events.props payload: path extraction "
        "(get_json_object), typed parse (from_json struct), existence probe",
)
def f_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    typed = F.from_json(F.col("props"), "k long")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_path"),
        typed.getField("k").alias("k_typed"),
        F.get_json_object("props", "$.k").isNotNull().alias("has_k"),
    )


@register(
    "corpus_curation_pipeline",
    f"""
    WITH r AS (
      SELECT doc_id, source, text,
             {_RATIO_SQL.format(words="['the','and','of','to','a','in','is','it']")} AS r_en,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok,
             length(replace(text, ' ', '')) AS n_char_nospace
      FROM documents
    ),
    q AS (
      SELECT doc_id, source, text,
             (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END
              + CASE WHEN n_char_nospace / n_tok BETWEEN 2.0 AND 12.0 THEN 0.3 ELSE 0.0 END
              + CASE WHEN r_en > 0.05 THEN 0.3 ELSE 0.0 END) AS quality
      FROM r
    ),
    f AS (SELECT * FROM q WHERE quality >= 0.7),
    k AS (SELECT md5(text) AS h, min(doc_id) AS keeper FROM f GROUP BY 1),
    kept AS (
      SELECT f.doc_id, f.source, f.quality
      FROM f JOIN k ON md5(f.text) = k.h AND f.doc_id = k.keeper
    ),
    ranked AS (
      SELECT doc_id, source, quality,
             row_number() OVER (PARTITION BY source ORDER BY doc_id ASC) AS rnk
      FROM kept
    )
    SELECT doc_id, source, quality FROM ranked WHERE rnk <= 50
    """,
    doc="END-TO-END corpus curation: quality gate (>= 0.7) -> exact-dedup keeper "
        "-> per-source quota (50) — the selection pass a pretraining pipeline runs "
        "before tokenization, composed from the engine's text/dedup/sampling ops",
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import per_group_quota
    from etl_consumer_spark.extensions.text_analysis import quality_score

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    scored = docs.select(
        "doc_id", "source", "text", quality_score(F.col("text")).alias("quality")
    )
    good = scored.filter(F.col("quality") >= 0.7)
    keepers = good.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    kept = good.join(keepers.select("doc_id"), "doc_id", "left_semi")
    out = per_group_quota(kept, "source", quota=50, order_col="doc_id")
    return out.select("doc_id", "source", "quality")


@register(
    "text_pii_scrub",
    r"""
    WITH injected AS (
      SELECT doc_id,
             text || ' reach me: u' || doc_id || '@mail.example.org, ip 10.1.2.'
                  || (doc_id % 256) || ', tel +62 812 3456 78' || (doc_id % 10) AS t
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
             '\+?\d[\d -]{7,}\d', '<PHONE>', 'g') AS scrubbed
    FROM injected
    """,
    doc="PII scrub (emails, IPv4, phone-like digit runs) over deterministically "
        "injected contact strings — the standard pre-training redaction pass",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    injected = F.concat(
        F.col("text"),
        F.lit(" reach me: u"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.org, ip 10.1.2."), (F.col("doc_id") % 256).cast("string"),
        F.lit(", tel +62 812 3456 78"), (F.col("doc_id") % 10).cast("string"),
    )
    return docs.select("doc_id", TA.pii_scrub(injected).alias("scrubbed"))


# ---------------------------------------------------------------------------
# CUBE grouping sets and lag/lead analytics (agg/window family completion)
# ---------------------------------------------------------------------------

@register(
    "olap_cube",
    """
    SELECT l_returnflag, l_linestatus, count(*) AS n
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="CUBE grouping sets (all subtotal combinations)",
)
def olap_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(F.count("*").alias("n"))


@register(
    "skew_salted_agg_join",
    """
    WITH agg AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value
      FROM events GROUP BY event_type
    ),
    dim AS (SELECT DISTINCT event_type, md5(event_type) AS tag FROM events),
    j AS (
      SELECT e.event_type, d.tag, count(*) AS n_joined
      FROM events e JOIN dim d ON e.event_type = d.event_type
      GROUP BY e.event_type, d.tag
    )
    SELECT a.event_type, a.n, a.sum_floor_value, j.tag, j.n_joined
    FROM agg a JOIN j ON a.event_type = j.event_type
    """,
    doc="skew operators preserve semantics: salted two-phase aggregation and "
        "salt-replicated join produce exactly the plain groupBy/join results "
        "(hot event_type keys spread across n_salts reducers)",
)
def skew_salted_agg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.skew import salted_agg, salted_join

    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    agg = salted_agg(
        ev,
        ["event_type"],
        [
            ("n", F.count("*"), F.sum("n")),
            ("sum_floor_value", F.sum(F.floor("value").cast("long")), F.sum("sum_floor_value")),
        ],
    )
    dim = ev.select("event_type").distinct().withColumn("tag", F.md5("event_type"))
    joined = (
        salted_join(ev, dim, ["event_type"])
        .groupBy("event_type", "tag")
        .agg(F.count("*").alias("n_joined"))
    )
    return agg.join(joined, "event_type").select(
        "event_type", "n", "sum_floor_value", "tag", "n_joined"
    )


@register(
    "olap_window_family",
    """
    SELECT o_orderkey, o_custkey,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS pr,
           cume_dist() OVER w AS cd,
           first_value(o_orderkey) OVER w AS first_k,
           last_value(o_orderkey)
             OVER (PARTITION BY o_custkey ORDER BY o_orderkey ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k,
           nth_value(o_orderkey, 2) OVER w AS second_k
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC)
    """,
    doc="ranking/distribution window family: ntile, percent_rank, cume_dist, "
        "first/last/nth_value with explicit frames",
)
def olap_window_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderkey").asc())
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("o_orderkey").over(w).alias("first_k"),
        F.last("o_orderkey").over(w_full).alias("last_k"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_k"),
    )


@register(
    "sketch_bloom_filter",
    """
    WITH pos AS (
      SELECT DISTINCT
             (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1 + 8*j.j, 8))::BIGINT
              % 1024) AS p
      FROM orders, unnest([0, 1, 2, 3]) AS j(j)
    )
    SELECT CAST(p // 32 AS INT) AS word_idx,
           CAST(bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS BIGINT) AS bits
    FROM pos GROUP BY 1
    """,
    doc="portable Bloom filter (1024 bits as 32-bit words, k=4 md5-derived hashes) — "
        "register-exact across engines like the HLL sketch; bitmaps merge with "
        "bit_or so per-partition partials combine map-side",
)
def sketch_bloom_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import bloom_bits

    orders = load_table(spark, sf_dir, "orders")
    return bloom_bits(orders.select(F.col("o_custkey").cast("string").alias("key")))


@register(
    "text_tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (n.n_docs::DOUBLE / df.df) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, score,
             row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, term, score, rnk FROM ranked WHERE rnk <= 3
    """,
    doc="TF-IDF-style top-3 terms per document (rational idf N/df instead of "
        "log so the score is bit-identical cross-engine; ties broken by term)",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    par = spark.sparkContext.defaultParallelism
    tok = (
        docs.repartition(par, "doc_id")
        .select("doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"))
    )
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    n_docs = docs.count()
    scored = tf.join(df_, "term").select(
        "doc_id",
        "term",
        (F.col("tf") * (F.lit(float(n_docs)) / F.col("df"))).alias("score"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "score", "rnk")
    )


@register(
    "rollup_incremental_merge",
    """
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="incremental rollup maintenance: aggregate an 80% 'history' slice and a "
        "20% 'new batch' slice separately, merge the mergeable partials — equals "
        "the full rescan (the continuous-aggregate pattern, O(batch) per refresh)",
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.rollup import merge_partial_rollups

    ev = load_table(spark, sf_dir, "events")
    aggs = [
        F.count("*").alias("n"),
        F.sum(F.floor("value").cast("long")).alias("sum_floor_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]
    history = ev.filter(F.col("event_id") % 5 < 4).groupBy("event_type").agg(*aggs)
    batch = ev.filter(F.col("event_id") % 5 == 4).groupBy("event_type").agg(*aggs)
    return merge_partial_rollups(
        [history, batch],
        ["event_type"],
        {"n": "count", "sum_floor_value": "sum", "min_value": "min", "max_value": "max"},
    )


@register(
    "sim_embedding_quantize",
    """
    WITH m AS (
      SELECT vec_id, embedding,
             list_aggregate(list_transform(embedding, x -> abs(x::DOUBLE)), 'max') AS mx
      FROM embeddings
    )
    SELECT vec_id, u.i AS dim,
           CAST(floor(embedding[u.i]::DOUBLE * 127 / mx + 0.5) AS INT) AS q
    FROM m, unnest(generate_series(1, len(embedding))) AS u(i)
    WHERE mx > 0
    """,
    doc="int8 scalar quantization of embeddings (per-vector max-abs scale, "
        "explicit floor(x+0.5) rounding so both engines agree) — the memory-4x "
        "compression step before large-scale ANN",
)
def sim_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    mx = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
    exploded = (
        emb.withColumn("_mx", mx)
        .filter(F.col("_mx") > 0)
        .select("vec_id", "_mx", F.posexplode("embedding").alias("pos", "x"))
    )
    return exploded.select(
        "vec_id",
        (F.col("pos") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 127 / F.col("_mx") + 0.5).cast("int").alias("q"),
    )


@register(
    "olap_q4_order_priority",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS with a non-equi conjunct, decorrelated "
        "to a left-semi join before the aggregate",
)
def olap_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("o.o_orderkey") == F.col("l.l_orderkey")) & (
        F.col("l.l_shipdate") > F.col("o.o_orderdate")
    )
    return (
        o.alias("o")
        .join(li.alias("l"), cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "olap_q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: left-outer join + two-level aggregate (orders-per-customer "
        "histogram, zero-order customers included)",
)
def olap_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "olap_q17_small_qty_avg",
    """
    WITH lim AS (
      SELECT l_partkey,
             0.2 * (sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE / count(*)) AS qty_lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT (sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE / 7.0) AS avg_yearly
    FROM lineitem l
    JOIN lim ON lim.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size <= 3 AND l.l_quantity < lim.qty_lim
    """,
    doc="TPC-H Q17 shape: correlated scalar avg subquery decorrelated to a pre-agg "
        "join (exact decimal sums so the threshold is bit-identical cross-engine)",
)
def olap_q17_small_qty_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    lim = li.groupBy("l_partkey").agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("*"))
        ).alias("qty_lim")
    )
    small_parts = part.filter(F.col("p_size") <= 3).select("p_partkey")
    out = (
        li.join(lim, "l_partkey")
        .join(F.broadcast(small_parts), li.l_partkey == small_parts.p_partkey)
        .filter(F.col("l_quantity") < F.col("qty_lim"))
    )
    return out.agg(
        (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0)).alias(
            "avg_yearly"
        )
    )


@register(
    "analytic_time_buckets",
    """
    SELECT epoch(date_trunc('hour', ts))::BIGINT AS bucket_hour,
           event_type,
           count(*) AS n,
           CAST(sum(CAST(floor(value) AS BIGINT)) AS BIGINT) AS sum_floor_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="hypertable-style continuous aggregate: 1-hour time buckets per event type "
        "(the timescale rollup pattern; bucket key = truncated epoch so dtypes match "
        "cross-engine)",
)
def analytic_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("bucket_hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor("value").cast("long")).alias("sum_floor_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "olap_lag_lead",
    """
    SELECT o_custkey, o_orderkey,
           lag(o_orderkey) OVER w AS prev_orderkey,
           lead(o_orderkey) OVER w AS next_orderkey,
           CAST(epoch(CAST(o_orderdate AS TIMESTAMP))
                - epoch(CAST(lag(o_orderdate) OVER w AS TIMESTAMP)) AS BIGINT)
             AS secs_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    doc="lag/lead offset windows with inter-order gap seconds",
)
def olap_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        (F.unix_timestamp("o_orderdate") - F.unix_timestamp(F.lag("o_orderdate").over(w)))
        .cast("long")
        .alias("secs_since_prev"),
    )


@register(
    "sim_ivf_rerank",
    f"""
    WITH cents AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16),
    q0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
    qp_scored AS (
      SELECT q.vec_id, c.cid, {_cos_sql('q.embedding', 'c.cvec')} AS csim FROM q0 q, cents c
    ),
    qprobe AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        FROM qp_scored) WHERE rn <= 4
    ),
    ca_scored AS (
      SELECT e.vec_id, e.embedding, c.cid, {_cos_sql('e.embedding', 'c.cvec')} AS csim
      FROM embeddings e, cents c
    ),
    cassign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        FROM ca_scored) WHERE rn = 1
    ),
    scored AS (
      SELECT qp.vec_id AS query_id, ca.vec_id AS neighbor_id,
             {_cos_sql('qe.embedding', 'ca.embedding')} AS cos_sim
      FROM qprobe qp
      JOIN cassign ca ON ca.cid = qp.cid AND ca.vec_id <> qp.vec_id
      JOIN q0 qe ON qe.vec_id = qp.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 3
    """,
    doc="two-stage ANN: IVF probe of the 4 nearest clusters (of 16) gathers "
        "candidates, exact cosine rerank picks top-3. The oracle replays the "
        "full probe+rerank pipeline in SQL (value-exact). NOTE: the driver's "
        "synthetic embeddings are isotropic random (measured intra-label cosine "
        "~0.005), so NO pruned ANN can match brute force here — equality with "
        "sim_knn_bruteforce at n_probe=n_clusters and monotone recall in n_probe "
        "are pinned in tests/test_similarity_rerank.py instead",
)
def sim_ivf_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 100)
    return S.knn_ivf_rerank(queries, emb, n_clusters=16, n_probe=4, k=3)


@register(
    "mm_png_features",
    f"""
    WITH {_MM_RASTER_CTE},
    px AS (
      SELECT doc_id, w, ascii(substr(ras, u.i, 1)) AS v, length(ras) AS n
      FROM r, unnest(generate_series(1, length(ras))) AS u(i)
    )
    SELECT doc_id AS media_id,
           sum(v) / n AS mean_px,
           sqrt(sum(v * v) / n - (sum(v) / n) * (sum(v) / n)) AS std_px,
           (max(w) * 4)::BIGINT AS n_px
    FROM px GROUP BY doc_id, n
    """,
    doc="multimodal: feature extraction through the REAL stdlib-zlib PNG decode "
        "(chunk CRCs verified, all five scanline filters exercised via id % 5) — "
        "same deterministic raster as mm_image_features, so the same SQL oracle "
        "value-checks the DEFLATE + unfilter path end-to-end",
)
def mm_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_png_media_table(docs, "doc_id", "text")
    return M.extract_image_features(media)


@register(
    "dedup_connected_components_star",
    QUERIES["dedup_connected_components"].oracle,
    doc="near-dup clustering via the alternating large-star/small-star algorithm "
        "(Kiveris et al., SoCC 2014) — identical labels to the min-label-propagation "
        "query but O(log^2 n) rounds instead of O(diameter), the scale path for "
        "giant components; verified against the same recursive-CTE oracle",
)
def dedup_connected_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.exploded_shingles(docs), num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    pairs = D.candidate_pairs(buckets)
    return D.connected_components_star(pairs, docs, id_col="doc_id")


@register(
    "text_repetition_gopher",
    """
    WITH base AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                         x -> length(x) > 0) AS ls,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+') END AS toks,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS n_sym
      FROM documents
    ),
    grams AS (
      SELECT doc_id, ls, toks, n_sym,
             list_transform(generate_series(1, greatest(len(toks) - 1, 0)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS g2,
             list_transform(generate_series(1, greatest(len(toks) - 2, 0)),
                            i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS g3
      FROM base
    ),
    sig AS (
      SELECT doc_id,
             CASE WHEN len(ls) > 0
                  THEN (len(ls) - len(list_distinct(ls))) / len(ls) ELSE 0.0 END AS dup_line_frac,
             CASE WHEN len(g2) > 0
                  THEN (len(g2) - len(list_distinct(g2))) / len(g2) ELSE 0.0 END AS dup_2gram_frac,
             CASE WHEN len(g3) > 0
                  THEN (len(g3) - len(list_distinct(g3))) / len(g3) ELSE 0.0 END AS dup_3gram_frac,
             CASE WHEN len(toks) > 0 THEN n_sym / len(toks) ELSE 0.0 END AS symbol_word_ratio,
             CASE WHEN len(toks) > 0
                  THEN len(list_filter(toks, t -> regexp_matches(t, '[A-Za-z]'))) / len(toks)
                  ELSE 0.0 END AS alpha_word_frac,
             CASE WHEN len(ls) > 0
                  THEN len(list_filter(ls, x -> x LIKE '%...')) / len(ls) ELSE 0.0 END AS ellipsis_line_frac
      FROM grams
    )
    SELECT doc_id, dup_line_frac, dup_2gram_frac, dup_3gram_frac,
           symbol_word_ratio, alpha_word_frac, ellipsis_line_frac,
           (dup_line_frac < 0.30 AND dup_2gram_frac < 0.20 AND symbol_word_ratio < 0.50
            AND alpha_word_frac > 0.60 AND ellipsis_line_frac < 0.30) AS keep
    FROM sig
    """,
    doc="Gopher/C4-style repetition and shape quality signals (duplicate line/"
        "2-gram/3-gram fractions, symbol-to-word ratio, alpha-word fraction, "
        "ellipsis lines) plus the composite keep decision — expression-only, "
        "one pass, value-checked by the oracle",
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import text_analysis as TA

    docs = load_table(spark, sf_dir, "documents")
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    sigs = TA.gopher_repetition_signals(F.col("text"))
    return docs.select(
        "doc_id",
        *[c.alias(name) for name, c in sigs],
        TA.passes_gopher_filters(F.col("text")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Round-3 OLAP breadth: remaining TPC-H plan shapes expressible on the
# driver tables (no partsupp/shipmode/phone columns — shapes adapted where
# a column is absent, the physical-plan pattern is what's exercised).
# ---------------------------------------------------------------------------

@register(
    "olap_q6_forecast_revenue",
    """
    SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: pure filter+aggregate — the canonical predicate-pushdown "
        "benchmark (all three predicates reach the parquet scan; verify "
        "PushedFilters in .explain)",
)
def olap_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,4)"))
            .cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "olap_q7_volume_shipping",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 shape: 6-way join with the nation dimension joined TWICE under "
        "different roles and a disjunctive cross-pair predicate; both nation "
        "aliases broadcast",
)
def olap_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double").alias("revenue")
        )
    )


@register(
    "olap_q10_returned_items",
    """
    WITH agg AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 10000.0
               AS revenue
      FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY revenue DESC, c_custkey ASC) AS rn FROM agg
    )
    SELECT c_custkey, c_name, n_name, revenue FROM ranked WHERE rn <= 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue per customer, global top-20 by "
        "revenue (deterministic key tie-break); returnflag filter pushed below the "
        "3-way join",
)
def olap_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    agg = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            (F.sum(
                F.round(F.col("l_extendedprice") * 100).cast("long")
                * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
            ) / F.lit(10000.0)).alias("revenue")
        )
    )
    # global top-20 via orderBy+limit => TakeOrderedAndProject (distributed
    # per-partition partial top-k), NOT a row_number window over an
    # unpartitioned frame (single-partition shuffle of the whole aggregate)
    return (
        agg.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", "c_name", "n_name", "revenue")
    )


@register(
    "olap_q14_promo_revenue",
    """
    SELECT CAST(100.0 * sum(CASE WHEN p.p_type = 'PROMO'
                                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                                 ELSE 0 END)
                / sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= DATE '1997-01-01' AND l.l_shipdate < DATE '1997-07-01'
    """,
    doc="TPC-H Q14 shape: conditional-aggregate share over a fact-dim join "
        "(promo revenue fraction); both sums in one pass, part broadcast",
)
def olap_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            (F.lit(100.0) * F.sum(promo) / F.sum(rev)).cast("double")
            .alias("promo_revenue_pct")
        )
    )


@register(
    "olap_q18_large_orders",
    """
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="TPC-H Q18 shape: IN-subquery on a grouped HAVING (large-volume orders) "
        "planned as a left-semi join against the pre-aggregate",
)
def olap_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "big_key"),
              F.col("o_orderkey") == F.col("big_key"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("total_qty"))
    )


@register(
    "olap_q19_disjunctive_pred",
    """
    SELECT CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue,
           count(*) AS n_rows
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 1 AND 15)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 11 AND 25 AND l.l_quantity BETWEEN 10 AND 25)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 26 AND 40 AND l.l_quantity BETWEEN 20 AND 35)
    """,
    doc="TPC-H Q19 shape: OR-of-ANDs join predicates mixing both sides — tests "
        "CNF extraction (the common p_partkey equi-condition must still drive a "
        "hash join, not a cartesian filter)",
)
def olap_q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    arm = lambda brand, s0, s1, q0, q1: (
        (F.col("p_brand") == brand)
        & F.col("p_size").between(s0, s1)
        & F.col("l_quantity").between(q0, q1)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(arm("Brand#1", 1, 10, 1, 15) | arm("Brand#2", 11, 25, 10, 25)
                | arm("Brand#3", 26, 40, 20, 35))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "stream_session_windows",
    """
    WITH e AS (
      -- microsecond precision: Spark's rebuilt ts keeps micros, so the
      -- oracle must not truncate to ms
      SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts FROM events
    ),
    g AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS brk
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
    ),
    s AS (
      SELECT user_id, ts,
             CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
      FROM g
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events
    FROM s GROUP BY user_id, session_id
    """,
    doc="native Structured Streaming session windows (session_window, 30-min gap) "
        "through readStream/availableNow — the engine's stateful session operator "
        "verified against the batch gap-islands formulation (start = min ts, "
        "end = max ts + gap)",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    base = tempfile.mkdtemp(prefix="stream_sess_")
    ev.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/in")
    agg = (
        stream.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
    )
    sink = f"out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).select(
        "user_id",
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        "n_events",
    )


@register(
    "stream_static_enrich",
    """
    SELECT e.event_id, e.event_type, c.c_name, n.n_name,
           CAST(e.value AS DOUBLE) AS value
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    doc="stream-static enrichment join: a streaming fact (events via readStream/"
        "availableNow) joined per micro-batch to static broadcast dimensions "
        "(customer -> nation) — the standard streaming-ETL enrich pattern; no "
        "state store involved, each batch plans a broadcast hash join",
)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = tempfile.mkdtemp(prefix="stream_enrich_")
    ev.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/in")
    enriched = (
        stream.join(F.broadcast(cust), stream.user_id == cust.c_custkey)
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("event_id", "event_type", "c_name", "n_name", F.col("value").cast("double"))
    )
    sink = f"out_{uuid.uuid4().hex[:8]}"
    q = (
        enriched.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink)


@register(
    "mm_jpeg_features",
    """
    WITH d AS (SELECT doc_id, md5(text) AS hx FROM documents),
    b AS (
      SELECT doc_id, ascii(substr(hx, u.i, 1)) AS v
      FROM d, unnest(generate_series(1, 8)) AS u(i)
    )
    SELECT doc_id AS media_id,
           sum(v) / 8 AS mean_px,
           sqrt(sum(v * v) / 8 - (sum(v) / 8) * (sum(v) / 8)) AS std_px,
           512::BIGINT AS n_px
    FROM b GROUP BY doc_id
    """,
    doc="multimodal: feature extraction through the REAL pure-Python baseline "
        "JPEG codec (T.81 markers, Annex-K Huffman, DCT+quant, byte stuffing) — "
        "constant-per-block rasters round-trip exactly under the DC-quant-8 "
        "design, so the oracle value-checks the full entropy-decode + IDCT path",
)
def mm_jpeg_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_jpeg_media_table(docs, "doc_id", "text")
    return M.extract_image_features(media)


@register(
    "mm_audio_features",
    """
    WITH d AS (SELECT doc_id, md5(text) AS hx FROM documents),
    s AS (
      SELECT doc_id, u.i AS i, ascii(substr(hx, u.i, 1)) - 77 AS v
      FROM d, unnest(generate_series(1, 32)) AS u(i)
    ),
    x AS (
      SELECT doc_id, v,
             CASE WHEN (v >= 0) <> (lag(v) OVER (PARTITION BY doc_id ORDER BY i) >= 0)
                  THEN 1 ELSE 0 END AS zc
      FROM s
    )
    SELECT doc_id AS media_id,
           16000::INT AS sample_rate,
           32::BIGINT AS n_samples,
           2::BIGINT AS duration_ms,
           sqrt(sum(v * v) / 32) AS rms,
           max(abs(v))::BIGINT AS peak,
           sum(zc)::BIGINT AS zero_crossings
    FROM x GROUP BY doc_id
    """,
    doc="multimodal audio: real RIFF/WAVE PCM encode in a mapInPandas kernel, "
        "then chunk-walking decode + sample statistics (duration/RMS/peak/"
        "zero crossings); PCM is lossless so the oracle recomputes every "
        "feature from the md5-derived signal exactly",
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_wav_media_table(docs, "doc_id", "text")
    return M.extract_audio_features(media)


# ---------------------------------------------------------------------------
# Audio downsampling through the real WAV decode: integer 2-tap box-filter
# decimation (block sums WITHOUT the divide — no rounding policy to
# diverge), the sample-rate-normalization pass of a speech pipeline; the
# decimated sequence md5-verified bit-for-bit.
# ---------------------------------------------------------------------------

@register(
    "mm_audio_downsample",
    """
    WITH d AS (SELECT doc_id, md5(text) AS hx FROM documents),
    s AS (
      SELECT doc_id, u.i AS i, ascii(substr(hx, u.i, 1)) - 77 AS v
      FROM d, unnest(generate_series(1, 32)) AS u(i)
    ),
    b AS (
      SELECT doc_id, (i - 1) // 2 AS k, sum(v)::BIGINT AS bv
      FROM s GROUP BY doc_id, (i - 1) // 2
    )
    SELECT doc_id AS media_id, 8000::INT AS out_rate,
           count(*)::BIGINT AS n_out,
           sum(abs(bv))::BIGINT AS sum_abs,
           max(abs(bv))::BIGINT AS peak,
           md5(string_agg(bv::VARCHAR, ',' ORDER BY k)) AS ds_md5
    FROM b GROUP BY doc_id
    """,
    doc="audio downsampling (16 kHz -> 8 kHz) through the real RIFF/WAVE "
        "decode: exact integer 2-tap block sums as the anti-alias "
        "decimation, stats + decimated-sequence md5 oracle-verified "
        "bit-for-bit — map-only at any scale",
)
def mm_audio_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_wav_media_table(docs, "doc_id", "text")
    return M.downsample_audio(media, factor=2)


# ---------------------------------------------------------------------------
# DSIR importance RESAMPLING — the second half of Xie et al. NeurIPS'23:
# the registered importance scores become Efraimidis-Spirakis A-Res
# weights (w = exp(score)), selecting a without-replacement sample tilted
# toward the target domain. Composed from text_dsir_importance on BOTH
# sides, so the pair cannot drift; zero RNG, TakeOrdered top-64.
# ---------------------------------------------------------------------------

@register(
    "sample_dsir_resample",
    r"""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    f AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(word), 1, 8))::BIGINT % 256 AS b
      FROM (SELECT doc_id, lang, unnest(w) AS word FROM tok)
    ),
    ct AS (SELECT b, count(*) AS c FROM f WHERE lang = 'en' GROUP BY b),
    cr AS (SELECT b, count(*) AS c FROM f GROUP BY b),
    tt AS (SELECT count(*) AS t FROM f WHERE lang = 'en'),
    tr AS (SELECT count(*) AS r FROM f),
    scored AS (
      SELECT f.doc_id,
             ln((coalesce(ct.c, 0) + 1)::DOUBLE / (tt.t + 256)) -
             ln((cr.c + 1)::DOUBLE / (tr.r + 256)) AS lw
      FROM f LEFT JOIN ct USING (b) JOIN cr USING (b)
      CROSS JOIN tt CROSS JOIN tr
    ),
    imp AS (
      SELECT doc_id, round(avg(lw), 6) AS avg_importance
      FROM scored GROUP BY doc_id
    ),
    keyed AS (
      SELECT doc_id, avg_importance,
             ln((('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1)
                / 281474976710657.0) / exp(avg_importance * 200.0) AS akey
      FROM imp
    )
    SELECT doc_id, avg_importance, round(akey, 9) AS akey
    FROM keyed ORDER BY akey DESC, doc_id LIMIT 64
    """,
    doc="DSIR importance resampling (Xie et al. NeurIPS'23, selection "
        "step): A-Res weighted sampling without replacement with weight "
        "exp(importance / T), temperature T = 0.005 matching the synthetic "
        "score spread so the tilt is material — u from md5('dsir'||doc_id), "
        "rank ln(u)/w, "
        "top-64 — tilts the kept corpus toward the target domain, zero "
        "RNG, TakeOrdered; composed from the registered "
        "text_dsir_importance on both sides so score and sampler cannot "
        "drift",
)
def sample_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    imp = QUERIES["text_dsir_importance"].fn(spark, sf_dir).select(
        "doc_id", "avg_importance"
    )
    u = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsir"), F.col("doc_id").cast("string"))), 1, 12),
            16, 10,
        ).cast("long") + 1
    ) / F.lit(281474976710657.0)
    akey = F.log(u) / F.exp(F.col("avg_importance") * 200.0)
    return (
        imp.withColumn("akey", F.round(akey, 9))
        .orderBy(F.desc("akey"), "doc_id")
        .limit(64)
        .select("doc_id", "avg_importance", "akey")
    )


# ---------------------------------------------------------------------------
# Round 4: the nine TPC-H plan shapes not yet covered (Q8, Q9, Q11, Q12,
# Q15, Q16, Q20, Q21, Q22) — with them, all 22 TPC-H query shapes exist in
# the registry. The driver testdata has no partsupp table and no
# l_shipmode/l_commitdate/l_receiptdate columns, so those inputs are DERIVED
# from keys with identical arithmetic on both sides (the convention already
# used by q2/q13/q19): the oracle then validates the plan shape and the
# engine's join/agg semantics, not the derivation.
# ---------------------------------------------------------------------------

@register(
    "olap_q8_market_share",
    """
    WITH flat AS (
      SELECT year(o.o_orderdate) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)) AS volume,
             sn.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      JOIN region r ON cn.n_regionkey = r.r_regionkey
      JOIN part p ON l.l_partkey = p.p_partkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation sn ON s.s_nationkey = sn.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate < TIMESTAMP '1997-01-01'
    )
    SELECT CAST(o_year AS INT) AS o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year
    """,
    doc="TPC-H Q8 shape: 8-way snowflake join (nation twice, region prune) with "
        "a conditional-share aggregate; ratio of two exact decimal sums taken "
        "in one double division for engine-stable values",
)
def olap_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = load_table(spark, sf_dir, "supplier")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)")
    flat = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return flat.groupBy(F.col("o_year").cast("int").alias("o_year")).agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        ).alias("mkt_share")
    )


@register(
    "olap_q9_product_type_profit",
    """
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
               - CAST(round(p.p_retailprice * 100) AS BIGINT)
                 * CAST(round(l.l_quantity) AS BIGINT) * 10) / 10000.0 AS sum_profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_type LIKE 'PROMO%'
    GROUP BY n.n_name, year(o.o_orderdate)
    """,
    doc="TPC-H Q9 shape: profit per nation-year over a 5-way join; the missing "
        "partsupp.ps_supplycost is derived as 10% of p_retailprice with exact "
        "decimal arithmetic on both sides",
)
def olap_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type").like("PROMO%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    # integer 1e-4 units (olap_q1 precedent): price_cents x (100-disc_cents)
    # is revenue in 1e-4; retail_cents x qty x 10 is the 10%-of-retail cost
    # in 1e-4 — one long sum, one double division at the end
    profit = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * (F.lit(100) - F.round(F.col("l_discount") * 100).cast("long"))
        - F.round(F.col("p_retailprice") * 100).cast("long")
        * F.round(F.col("l_quantity")).cast("long") * F.lit(10)
    )
    return (
        li.join(F.broadcast(p.select("p_partkey", "p_retailprice")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg((F.sum(profit) / F.lit(10000.0)).alias("sum_profit"))
    )


@register(
    "olap_q11_important_stock",
    """
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    v AS (
      SELECT l_partkey,
             ((l_partkey * 31 + l_suppkey * 7) % 1000 + 1)
               * ((l_partkey * 13 + l_suppkey) % 500 + 1) AS value
      FROM ps
    ),
    tot AS (SELECT sum(value) AS total FROM v)
    SELECT l_partkey AS ps_partkey, sum(value)::BIGINT AS part_value
    FROM v, tot
    GROUP BY l_partkey, tot.total
    HAVING sum(value) > total * 0.001
    """,
    doc="TPC-H Q11 shape: group-sum with a HAVING threshold against a global "
        "scalar subquery; pseudo-partsupp (availqty*supplycost) derived from "
        "keys in exact integer arithmetic — broadcast 1-row total, no collect",
)
def olap_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    value = (
        ((F.col("l_partkey") * 31 + F.col("l_suppkey") * 7) % 1000 + 1)
        * ((F.col("l_partkey") * 13 + F.col("l_suppkey")) % 500 + 1)
    ).alias("value")
    v = ps.select("l_partkey", value)
    tot = v.agg(F.sum("value").alias("total"))
    return (
        v.groupBy("l_partkey")
        .agg(F.sum("value").alias("part_value"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > F.col("total") * 0.001)
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("part_value").cast("long").alias("part_value"),
        )
    )


@register(
    "olap_q12_shipmode_priority",
    """
    WITH l AS (
      SELECT l_orderkey,
             CASE (l_orderkey + l_linenumber) % 3
               WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP' ELSE 'AIR' END AS shipmode,
             (l_orderkey * 7 + l_linenumber) % 5 = 0 AS late
      FROM lineitem
    )
    SELECT shipmode,
           sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.shipmode IN ('MAIL', 'SHIP') AND l.late
    GROUP BY shipmode
    """,
    doc="TPC-H Q12 shape: join + dual conditional counts by priority class; "
        "shipmode and the late-delivery flag (no such columns in the driver "
        "tables) derived from keys with identical arithmetic on both sides",
)
def olap_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    mode = (
        F.when((F.col("l_orderkey") + F.col("l_linenumber")) % 3 == 0, "MAIL")
        .when((F.col("l_orderkey") + F.col("l_linenumber")) % 3 == 1, "SHIP")
        .otherwise("AIR")
    )
    late = (F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 5 == 0
    l = li.select("l_orderkey", mode.alias("shipmode"), late.alias("late"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(F.col("shipmode").isin("MAIL", "SHIP") & F.col("late"))
        .join(o.select("o_orderkey", "o_orderpriority"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("shipmode")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


@register(
    "olap_q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 shape: revenue view + scalar-max subquery equality (ties "
        "kept); exact decimal revenue makes the equality engine-stable",
)
def olap_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


@register(
    "olap_q16_parts_supplier",
    """
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT ps.l_suppkey)::BIGINT AS supplier_cnt
    FROM ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1' AND p.p_type NOT LIKE 'PROMO%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape: distinct-supplier counts per part attribute triple "
        "with a NOT-IN supplier exclusion (negative balance stands in for the "
        "complaints predicate) — anti join + count distinct",
)
def olap_q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    keep_part = p.filter(
        (F.col("p_brand") != "Brand#1")
        & ~F.col("p_type").like("PROMO%")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad_supp = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(F.broadcast(bad_supp), ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(keep_part), ps.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


@register(
    "olap_q20_potential_promotion",
    """
    WITH ps AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    avail AS (
      SELECT l_partkey, l_suppkey,
             (l_partkey * 31 + l_suppkey * 7) % 1000 + 1 AS availqty
      FROM ps
    ),
    shipped AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM avail a
    JOIN shipped sh ON a.l_partkey = sh.l_partkey AND a.l_suppkey = sh.l_suppkey
    JOIN part p ON a.l_partkey = p.p_partkey
    JOIN supplier s ON a.l_suppkey = s.s_suppkey
    WHERE p.p_size <= 3 AND a.availqty > 0.5 * sh.qty
    """,
    doc="TPC-H Q20 shape: nested semi-join chain (parts of interest -> "
        "availability vs half of shipped quantity -> qualifying suppliers); "
        "availqty derived from keys, quantities integer-exact",
)
def olap_q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    avail = (
        li.select("l_partkey", "l_suppkey")
        .distinct()
        .withColumn("availqty", (F.col("l_partkey") * 31 + F.col("l_suppkey") * 7) % 1000 + 1)
    )
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_partkey").alias("sp"), F.col("l_suppkey").alias("ss"))
        .agg(F.sum("l_quantity").alias("qty"))
    )
    small = p.filter(F.col("p_size") <= 3).select("p_partkey")
    return (
        avail.join(shipped, (avail.l_partkey == F.col("sp")) & (avail.l_suppkey == F.col("ss")))
        .filter(F.col("availqty") > 0.5 * F.col("qty"))
        .join(F.broadcast(small), avail.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), avail.l_suppkey == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .distinct()
    )


@register(
    "olap_q21_waiting_suppliers",
    """
    WITH l AS (
      SELECT l_orderkey, l_suppkey,
             (l_orderkey * 7 + l_linenumber) % 5 = 0 AS late
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
    ),
    ord AS (
      SELECT l_orderkey,
             count(DISTINCT l_suppkey) AS n_supp,
             count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM l GROUP BY l_orderkey
    )
    SELECT s.s_name, count(DISTINCT l.l_orderkey)::BIGINT AS numwait
    FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM l WHERE late) l
    JOIN ord ON l.l_orderkey = ord.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE ord.n_supp > 1 AND ord.n_late = 1
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 shape: the EXISTS/NOT-EXISTS pair (another supplier on the "
        "order; no OTHER late supplier) decorrelated into order-level distinct "
        "counts — one groupBy instead of two correlated subqueries; the late "
        "flag is key-derived (no l_receiptdate/l_commitdate in the data)",
)
def olap_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    l = (
        li.join(o.select("o_orderkey"), li.l_orderkey == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_suppkey",
            ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 5 == 0).alias("late"),
        )
    )
    ord_stats = l.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    late_pairs = l.filter("late").select("l_orderkey", "l_suppkey").distinct()
    return (
        late_pairs.join(ord_stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
        .join(F.broadcast(s.select("s_suppkey", "s_name")), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count_distinct("l_orderkey").cast("long").alias("numwait"))
    )


@register(
    "olap_q22_global_sales_opportunity",
    """
    WITH cust AS (
      SELECT c_custkey, c_acctbal, c_custkey % 7 AS cntrycode
      FROM customer WHERE c_custkey % 7 IN (0, 1, 2)
    ),
    thr AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
      FROM cust WHERE c_acctbal > 0.0
    )
    SELECT cntrycode::BIGINT AS cntrycode, count(*)::BIGINT AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM cust, thr
    WHERE c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY cntrycode
    """,
    doc="TPC-H Q22 shape: scalar-average threshold + anti join against orders; "
        "country code derived from c_custkey (no phone column), and the anti "
        "join keys on customers without RECENT orders (every customer in the "
        "driver data has some order, which would make the spec predicate "
        "vacuous); the average is an exact decimal sum divided once in double, "
        "so the > comparison is engine-stable",
)
def olap_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cust = c.filter((F.col("c_custkey") % 7).isin(0, 1, 2)).select(
        "c_custkey", "c_acctbal", (F.col("c_custkey") % 7).alias("cntrycode")
    )
    thr = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_bal")
    )
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("cntrycode").cast("long").alias("cntrycode"))
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Round 4: training-data pipeline additions — benchmark decontamination and
# BM25 retrieval. Decontamination is the standard eval-leakage guard (remove
# corpus docs sharing word n-grams with a held-out benchmark); BM25 is the
# classic sparse-retrieval scorer. Both keep every float computation in an
# identical fixed expression shape on the Spark and DuckDB sides so value
# hashes compare exactly (per-term contributions added in fixed rank order,
# never via an unordered SUM over doubles).
# ---------------------------------------------------------------------------

@register(
    "text_decontaminate",
    """
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS ts
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             concat_ws(' ', ts[u.i], ts[u.i+1], ts[u.i+2], ts[u.i+3], ts[u.i+4]) AS gram
      FROM tok, unnest(generate_series(1, greatest(len(ts) - 4, 0))) AS u(i)
    ),
    bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 20 = 0),
    hits AS (
      SELECT g.doc_id, count(*) AS n_shared
      FROM grams g JOIN bench b USING (gram)
      WHERE g.doc_id % 20 <> 0
      GROUP BY g.doc_id
    )
    SELECT d.doc_id, coalesce(h.n_shared, 0)::BIGINT AS n_shared,
           coalesce(h.n_shared, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    doc="training-data decontamination: flag corpus docs sharing any distinct "
        "word 5-gram with a held-out benchmark slice (doc_id % 20 = 0). The "
        "benchmark n-gram set is small by construction (eval suites are), so "
        "it broadcasts; the corpus side is one explode + semi-style join + "
        "groupBy — no quadratic pair expansion at any scale",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.text_analysis import word_ngrams

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams(F.lower(F.col("text")), 5))).alias("gram"),
    )
    bench = grams.filter(F.col("doc_id") % 20 == 0).select("gram").distinct()
    hits = (
        grams.filter(F.col("doc_id") % 20 != 0)
        .join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
    )
    corpus = docs.filter(F.col("doc_id") % 20 != 0).select("doc_id")
    return corpus.join(hits, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
        (F.coalesce(F.col("n_shared"), F.lit(0)) > 0).alias("contaminated"),
    )


@register(
    "text_bm25_topk",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS n_docs,
             CAST((SELECT count(*) FROM tok) AS DOUBLE)
               / (SELECT count(*) FROM documents) AS avgdl
    ),
    df AS (SELECT term, count(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    top3 AS (
      SELECT term, df, row_number() OVER (ORDER BY df DESC, term ASC) AS rnk
      FROM df QUALIFY rnk <= 3
    ),
    tf AS (
      SELECT t.doc_id, q.rnk, count(*) AS tf, max(q.df) AS df
      FROM tok t JOIN top3 q ON t.term = q.term
      GROUP BY t.doc_id, q.rnk
    ),
    contrib AS (
      SELECT tf.doc_id, tf.rnk,
             (((s.n_docs - tf.df) + 0.5) / (tf.df + 0.5))
               * ((tf.tf * 2.2) / (tf.tf + 1.2 * (0.25 + 0.75 * (dl.dl / s.avgdl)))) AS c
      FROM tf JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats s
    ),
    scored AS (
      SELECT doc_id,
             coalesce(max(CASE WHEN rnk = 1 THEN c END), 0.0)
             + coalesce(max(CASE WHEN rnk = 2 THEN c END), 0.0)
             + coalesce(max(CASE WHEN rnk = 3 THEN c END), 0.0) AS score
      FROM contrib GROUP BY doc_id
    )
    SELECT doc_id, score,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rnk
    FROM scored QUALIFY rnk <= 20
    """,
    doc="BM25 top-20 retrieval (k1=1.2, b=0.75) for the 3 highest-df terms; "
        "rational idf (N-df+0.5)/(df+0.5) and per-term contributions added in "
        "fixed rank order so doubles are bit-identical cross-engine; ranking "
        "tie-broken by doc_id",
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    # corpus stats as a broadcast 1-row frame — no driver-side count() action
    # (same discipline as the plan-bound broadcast decision elsewhere)
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    dfc = tok.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    # TakeOrdered limit(3) BEFORE the ranking window: the window then sees a
    # 3-row frame, not the whole vocabulary in one partition (at corpus
    # scale the vocab is huge; a global single-partition sort of it is the
    # exact anti-pattern this engine avoids)
    w_top = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    top3 = (
        dfc.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(3)
        .withColumn("rnk", F.row_number().over(w_top))
    )
    tf = (
        tok.join(F.broadcast(top3), "term")
        .groupBy("doc_id", "rnk")
        .agg(F.count("*").alias("tf"), F.max("df").alias("df"))
    )
    # fixed expression shape mirrored in the oracle: ((N - df) + 0.5)/(df + 0.5)
    # * (tf*2.2)/(tf + 1.2*(0.25 + 0.75*(dl/avgdl))) — one double op tree
    c = (
        ((F.col("n_docs") - F.col("df")) + 0.5) / (F.col("df") + 0.5)
    ) * (
        (F.col("tf") * 2.2)
        / (F.col("tf") + 1.2 * (0.25 + 0.75 * (F.col("dl") / F.col("avgdl"))))
    )
    contrib = (
        tf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "rnk", c.alias("c"))
    )
    scored = contrib.groupBy("doc_id").agg(
        (
            F.coalesce(F.max(F.when(F.col("rnk") == 1, F.col("c"))), F.lit(0.0))
            + F.coalesce(F.max(F.when(F.col("rnk") == 2, F.col("c"))), F.lit(0.0))
            + F.coalesce(F.max(F.when(F.col("rnk") == 3, F.col("c"))), F.lit(0.0))
        ).alias("score")
    )
    # TakeOrdered top-20 first; the global ranking window then runs on 20
    # rows instead of single-partitioning every scored document
    w_rank = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(20)
        .withColumn("rnk", F.row_number().over(w_rank))
        .select("doc_id", "score", "rnk")
    )


@register(
    "stream_dedup_within_watermark",
    """
    SELECT event_id, user_id, event_type FROM events
    """,
    doc="streaming dedup via dropDuplicatesWithinWatermark: unlike plain "
        "dropDuplicates (state grows forever), state for a key is EVICTED "
        "once the watermark passes its event time + delay — the operator "
        "that makes streaming dedup viable on unbounded streams; "
        "3x-duplicated input collapses to one row per event_id",
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    tripled = ev.withColumn("_i", F.explode(F.array(F.lit(1), F.lit(2), F.lit(3)))).drop("_i")
    base = tempfile.mkdtemp(prefix="stream_dedup_wm_")
    tripled.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(tripled.schema).parquet(f"{base}/in")
    deduped = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    sink = f"dedup_wm_{uuid.uuid4().hex[:8]}"
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).select("event_id", "user_id", "event_type")


@register(
    "agg_mode_per_group",
    """
    WITH c AS (
      SELECT user_id, event_type, count(*) AS n FROM events
      GROUP BY user_id, event_type
    ),
    r AS (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type ASC) AS rnk
      FROM c
    )
    SELECT user_id, event_type AS modal_type, n::BIGINT AS n
    FROM r WHERE rnk = 1
    """,
    doc="per-group mode (most frequent value) via count + partitioned "
        "rank with an explicit lexicographic tie-break — engines disagree "
        "on native mode() tie-breaking, so the deterministic formulation is "
        "the only oracle-safe one",
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(
        F.col("n").desc(), F.col("event_type").asc()
    )
    return (
        c.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("modal_type"),
            F.col("n").cast("long").alias("n"),
        )
    )


@register(
    "analytic_zscore_outliers",
    """
    WITH s AS (
      SELECT event_type,
             count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sv,
             CAST(sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS DOUBLE) AS svv
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - s.sv / s.n)
               / sqrt(s.svv / s.n - (s.sv / s.n) * (s.sv / s.n)) AS zscore
      FROM events e JOIN s ON e.event_type = s.event_type
    )
    SELECT event_id, event_type, value, zscore
    FROM z WHERE zscore > 2.5 OR zscore < -2.5
    """,
    doc="per-group z-score anomaly detection: group mean/std from EXACT "
        "decimal sums (order-insensitive) divided once in double, so the "
        "z-scores and the |z| > 2.5 cut are bit-stable across engines — "
        "one agg plus one broadcast-friendly join, no window over the facts",
)
def analytic_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    s = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("sv"),
        F.sum(dec * dec).cast("double").alias("svv"),
    )
    mean = F.col("sv") / F.col("n")
    z = (F.col("value") - mean) / F.sqrt(
        F.col("svv") / F.col("n") - mean * mean
    )
    return (
        ev.join(F.broadcast(s), "event_type")
        .select("event_id", "event_type", "value", z.alias("zscore"))
        .filter((F.col("zscore") > 2.5) | (F.col("zscore") < -2.5))
    )


@register(
    "sim_matryoshka_prefix_norms",
    """
    SELECT vec_id,
           sqrt(list_sum(list_transform(embedding[1:16],
                x -> x::DOUBLE * x::DOUBLE))) AS norm16,
           sqrt(list_sum(list_transform(embedding[1:32],
                x -> x::DOUBLE * x::DOUBLE))) AS norm32,
           sqrt(list_sum(list_transform(embedding[1:64],
                x -> x::DOUBLE * x::DOUBLE))) AS norm64,
           CAST(list_sum(list_transform(embedding[1:16], x -> x::DOUBLE * x::DOUBLE))
                / list_sum(list_transform(embedding[1:64], x -> x::DOUBLE * x::DOUBLE))
             AS DOUBLE) AS energy16_frac
    FROM embeddings
    """,
    doc="Matryoshka-style prefix-dimension diagnostics: L2 norms of the "
        "16/32/64-dim prefixes and the energy fraction the 16-dim prefix "
        "retains — the evaluation that decides how far truncated embeddings "
        "can serve cheap first-stage retrieval; in-order float folds keep "
        "the doubles engine-stable",
)
def sim_matryoshka_prefix_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def ssq(n):
        return F.aggregate(
            F.slice("embedding", 1, n),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )

    return emb.select(
        "vec_id",
        F.sqrt(ssq(16)).alias("norm16"),
        F.sqrt(ssq(32)).alias("norm32"),
        F.sqrt(ssq(64)).alias("norm64"),
        (ssq(16) / ssq(64)).cast("double").alias("energy16_frac"),
    )


@register(
    "dedup_exact_substring",
    """
    WITH w AS (
      SELECT doc_id, md5(substr(text, u.i, 64)) AS h
      FROM documents,
           unnest(generate_series(1, greatest(length(text) - 63, 0), 32)) AS u(i)
    ),
    dup AS (
      SELECT h, count(DISTINCT doc_id) AS n_docs,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM w GROUP BY h HAVING count(DISTINCT doc_id) > 1
    )
    SELECT h, n_docs::BIGINT AS n_docs, first_doc, last_doc FROM dup
    """,
    doc="exact-substring duplication detector (the Lee et al. exact-dedup "
        "family, strided-window approximation of the suffix-array method): "
        "64-char windows at stride 32 guarantee any shared run >= 95 chars "
        "produces a window-aligned collision; one explode + one groupBy on "
        "the window hash — no pairwise comparison at any scale",
)
def dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    last_start = F.length("text") - 63
    hashes = F.transform(
        F.sequence(F.lit(1), last_start, F.lit(32)),
        lambda i: F.md5(F.col("text").substr(i, F.lit(64))),
    )
    # sequence(1, n, 32) traps when n < 1 — short docs contribute no windows
    w = docs.select(
        "doc_id",
        F.explode(
            F.when(last_start >= 1, hashes).otherwise(F.array().cast("array<string>"))
        ).alias("h"),
    )
    return (
        w.groupBy("h")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .filter(F.col("n_docs") > 1)
    )


@register(
    "text_url_normalize",
    """
    WITH u AS (
      SELECT doc_id,
             'HTTPS://WWW.Example' || (doc_id % 7) || '.COM:443/Path' || doc_id
               || '/?q=1#frag' AS raw
      FROM documents
    ),
    steps AS (
      SELECT doc_id, raw,
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(raw, '#.*$', ''),
                     '^([A-Za-z]+)://', lower(regexp_extract(raw, '^([A-Za-z]+)://', 1)) || '://'),
                   '://WWW\\.', '://www.'),
                 '://www\\.([^/:]+)', '://www.' || lower(regexp_extract(raw, '://WWW\\.([^/:]+)', 1))),
               ':443/', '/') AS norm0
      FROM u
    )
    SELECT doc_id, raw,
           regexp_replace(norm0, '/\\?', '?') AS normalized
    FROM steps
    """,
    doc="URL canonicalization (crawl-dedup prerequisite): lowercase scheme "
        "and host, strip fragment, drop the default :443 port, collapse the "
        "empty-path '/?' — regex steps chosen to behave identically under "
        "Java regex and RE2 (no lookaround, no backrefs in patterns)",
)
def text_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("HTTPS://WWW.Example"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:443/Path"),
        F.col("doc_id").cast("string"),
        F.lit("/?q=1#frag"),
    )
    u = docs.select("doc_id", raw.alias("raw"))
    no_frag = F.regexp_replace(F.col("raw"), r"#.*$", "")
    scheme_lc = F.regexp_replace(
        no_frag,
        r"^([A-Za-z]+)://",
        F.concat(F.lower(F.regexp_extract(F.col("raw"), r"^([A-Za-z]+)://", 1)), F.lit("://")),
    )
    www_lc = F.regexp_replace(scheme_lc, r"://WWW\.", "://www.")
    host_lc = F.regexp_replace(
        www_lc,
        r"://www\.([^/:]+)",
        F.concat(
            F.lit("://www."),
            F.lower(F.regexp_extract(F.col("raw"), r"://WWW\.([^/:]+)", 1)),
        ),
    )
    no_port = F.regexp_replace(host_lc, r":443/", "/")
    normalized = F.regexp_replace(no_port, r"/\?", "?")
    return u.select("doc_id", "raw", normalized.alias("normalized"))


@register(
    "olap_histogram",
    """
    WITH ext AS (
      SELECT min(l_extendedprice) AS lo, max(l_extendedprice) AS hi FROM lineitem
    ),
    b AS (
      SELECT CASE WHEN l_extendedprice >= hi THEN 15
                  ELSE CAST(floor((l_extendedprice - lo) / ((hi - lo) / 16)) AS INT)
             END AS bucket
      FROM lineitem, ext
    )
    SELECT bucket, count(*)::BIGINT AS n
    FROM b GROUP BY bucket
    """,
    doc="equi-width 16-bucket histogram with data-derived bounds from a "
        "broadcast 1-row extent aggregate; the max value clamps into the "
        "last bucket; identical double bucket arithmetic on both engines, "
        "integer counts",
)
def olap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ext = li.agg(
        F.min("l_extendedprice").alias("lo"), F.max("l_extendedprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / 16
    bucket = (
        F.when(F.col("l_extendedprice") >= F.col("hi"), F.lit(15))
        .otherwise(F.floor((F.col("l_extendedprice") - F.col("lo")) / width).cast("int"))
    )
    return (
        li.crossJoin(F.broadcast(ext))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )


@register(
    "sample_stratified_per_group",
    """
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC,
                                         doc_id ASC) AS rn
      FROM documents
    )
    SELECT source, doc_id, rn::INT AS rn FROM r WHERE rn <= 3
    """,
    doc="stratified sample: exactly 3 docs per source by smallest md5 row "
        "hash — a deterministic per-stratum reservoir that is identical "
        "across engines, runs, and partitionings; one partitioned window, "
        "no global sort",
)
def sample_stratified_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "doc_id", F.col("rn").cast("int").alias("rn"))
    )


@register(
    "dedup_incremental_probe",
    f"""{SIG_SQL},
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    ex AS (SELECT * FROM buckets WHERE doc_id % 10 <> 0),
    exsize AS (SELECT band, bucket, count(*) AS n FROM ex GROUP BY band, bucket),
    index_kept AS (
      SELECT e.doc_id, e.band, e.bucket
      FROM ex e JOIN exsize s ON e.band = s.band AND e.bucket = s.bucket
      WHERE s.n <= 5
    ),
    newb AS (SELECT * FROM buckets WHERE doc_id % 10 = 0)
    SELECT DISTINCT n.doc_id AS new_id, i.doc_id AS existing_id
    FROM newb n JOIN index_kept i ON n.band = i.band AND n.bucket = i.bucket
    """,
    doc="incremental dedup probe — the production shape: a NEW batch "
        "(doc_id % 10 = 0) probes the EXISTING corpus's LSH band index "
        "instead of re-running the all-corpus self-join; per-batch cost is "
        "O(batch x bucket hits), independent of corpus size, and the index "
        "side drops hot buckets (> 5) exactly like the capped self-join",
)
def dedup_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.exploded_shingles(docs), num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    ex = buckets.filter(F.col("doc_id") % 10 != 0)
    ex_kept = (
        ex.join(
            ex.groupBy("band", "bucket").agg(F.count("*").alias("n")),
            ["band", "bucket"],
        )
        .filter(F.col("n") <= 5)
        .select("doc_id", "band", "bucket")
    )
    new = buckets.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("new_id"), "band", "bucket"
    )
    return (
        new.join(ex_kept, ["band", "bucket"])
        .select("new_id", F.col("doc_id").alias("existing_id"))
        .distinct()
    )


@register(
    "text_vocab_coverage",
    """
    WITH tok AS (
      SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    tc AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
    tot AS (SELECT count(*) AS total FROM tok),
    top AS (
      SELECT term, cnt FROM tc ORDER BY cnt DESC, term ASC LIMIT 50
    ),
    ranked AS (
      SELECT term, cnt,
             row_number() OVER (ORDER BY cnt DESC, term ASC) AS rnk,
             sum(cnt) OVER (ORDER BY cnt DESC, term ASC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM top
    )
    SELECT rnk::INT AS rnk, term, cnt::BIGINT AS cnt,
           CAST(cum AS DOUBLE) / total AS coverage
    FROM ranked, tot
    """,
    doc="vocabulary coverage curve (tokenizer design aid): top-50 terms by "
        "frequency with cumulative corpus-coverage fraction — how much of "
        "the token stream a vocab prefix explains. TakeOrdered bounds the "
        "ranking window to 50 rows; exact integer cumsum, one final double "
        "division",
)
def text_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"))
    tc = tok.groupBy("term").agg(F.count("*").alias("cnt"))
    tot = tok.agg(F.count("*").alias("total"))
    top = tc.orderBy(F.col("cnt").desc(), F.col("term").asc()).limit(50)
    # un-partitioned window is BOUNDED: it runs on the 50-row TakeOrdered
    # result above, never on the full vocabulary — the WindowExec
    # single-partition warning is benign here
    w = Window.orderBy(F.col("cnt").desc(), F.col("term").asc())
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .withColumn("cum", F.sum("cnt").over(wc))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("rnk").cast("int").alias("rnk"),
            "term",
            F.col("cnt").cast("long").alias("cnt"),
            (F.col("cum").cast("double") / F.col("total")).alias("coverage"),
        )
    )


@register(
    "analytic_cohort_retention",
    """
    WITH f AS (
      SELECT user_id,
             date_trunc('week', epoch_ms(epoch_ns(min(ts)) // 1000000))::DATE AS cw
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id,
             date_trunc('week', epoch_ms(epoch_ns(ts) // 1000000))::DATE AS aw
      FROM events
    )
    SELECT strftime(f.cw, '%Y-%m-%d') AS cohort_week,
           ((a.aw - f.cw) // 7)::INT AS offset_w,
           count(DISTINCT a.user_id)::BIGINT AS n_active
    FROM f JOIN a ON f.user_id = a.user_id
    WHERE (a.aw - f.cw) // 7 BETWEEN 0 AND 3
    GROUP BY f.cw, (a.aw - f.cw) // 7
    """,
    doc="cohort retention matrix: users grouped by first-activity week, "
        "distinct-active counts at week offsets 0-3 — the standard growth "
        "analytics triangle; week-aligned integer day arithmetic keeps the "
        "offsets engine-exact",
)
def analytic_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cw")
    )
    a = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("aw")
    ).distinct()
    off = F.floor(F.datediff(F.col("aw"), F.col("cw")) / 7)
    return (
        a.join(f, "user_id")
        .filter((off >= 0) & (off <= 3))
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            off.cast("int").alias("offset_w"),
        )
        .agg(F.count_distinct("user_id").cast("long").alias("n_active"))
    )


@register(
    "dedup_edit_distance1",
    """
    WITH names AS (SELECT c_custkey, c_name FROM customer),
    variants AS (
      SELECT c_custkey, c_name,
             substr(c_name, 1, u.i - 1) || substr(c_name, u.i + 1) AS v
      FROM names, unnest(generate_series(1, length(c_name))) AS u(i)
      UNION ALL
      SELECT c_custkey, c_name, c_name AS v FROM names
    ),
    cand AS (
      SELECT DISTINCT a.c_custkey AS a_key, b.c_custkey AS b_key,
             a.c_name AS a_name, b.c_name AS b_name
      FROM variants a JOIN variants b ON a.v = b.v AND a.c_custkey < b.c_custkey
    )
    SELECT a_key, b_key, levenshtein(a_name, b_name)::INT AS dist
    FROM cand WHERE levenshtein(a_name, b_name) <= 1
    """,
    doc="edit-distance-1 fuzzy matching via deletion-neighborhood blocking "
        "(two strings within edit distance 1 always share a single-deletion "
        "variant): len+1 variants per row bound the expansion linearly, the "
        "variant equi-join replaces the quadratic all-pairs comparison, and "
        "an exact levenshtein verifies candidates — the entity-resolution "
        "primitive at corpus scale",
)
def dedup_edit_distance1(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    n = F.length("c_name")
    del_variants = cust.select(
        "c_custkey", "c_name",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n),
                lambda i: F.concat(
                    F.col("c_name").substr(F.lit(1), i - 1),
                    F.col("c_name").substr(i + 1, n),
                ),
            )
        ).alias("v"),
    )
    self_variant = cust.select("c_custkey", "c_name", F.col("c_name").alias("v"))
    variants = del_variants.unionByName(self_variant)
    a = variants.select(
        F.col("c_custkey").alias("a_key"), F.col("c_name").alias("a_name"), "v"
    )
    b = variants.select(
        F.col("c_custkey").alias("b_key"), F.col("c_name").alias("b_name"), "v"
    )
    cand = (
        a.join(b, "v")
        .filter(F.col("a_key") < F.col("b_key"))
        .select("a_key", "b_key", "a_name", "b_name")
        .distinct()
    )
    dist = F.levenshtein("a_name", "b_name")
    return cand.filter(dist <= 1).select(
        "a_key", "b_key", dist.cast("int").alias("dist")
    )


@register(
    "text_unicode_normalize",
    """
    WITH aug AS (
      SELECT doc_id,
             substr(text, 1, 40) || ' cafe' || chr(769) || ' no' || chr(776) || 'el '
               || chr(65) || chr(768) AS raw
      FROM documents
    )
    SELECT doc_id,
           length(raw)::BIGINT AS raw_len,
           length(nfc_normalize(raw))::BIGINT AS norm_len,
           md5(nfc_normalize(raw)) AS norm_md5
    FROM aug
    """,
    doc="unicode NFC normalization (corpus hygiene: decomposed accents must "
        "fold to composed forms before dedup/tokenization or visually "
        "identical strings hash apart) — Spark has no normalize builtin, so "
        "this is a legitimate Arrow-batched Pandas UDF (unicodedata.NFC), "
        "verified byte-for-byte against DuckDB's nfc_normalize",
)
def text_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.text_analysis import nfc_normalize_udf

    docs = load_table(spark, sf_dir, "documents")
    aug = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit(" cafe\u0301 no\u0308el A\u0300"),
        ).alias("raw"),
    )
    nfc = nfc_normalize_udf()
    return aug.select(
        "doc_id",
        F.length("raw").cast("long").alias("raw_len"),
        F.length(nfc(F.col("raw"))).cast("long").alias("norm_len"),
        F.md5(nfc(F.col("raw")).cast("binary")).alias("norm_md5"),
    )


@register(
    "mm_video_frame_features",
    """
    WITH d AS (SELECT doc_id, md5(text) AS hx FROM documents),
    fr AS (SELECT unnest([0, 1]) AS f),
    b AS (
      SELECT doc_id, fr.f,
             ascii(substr(hx, fr.f * 8 + u.i, 1)) AS v
      FROM d, fr, unnest(generate_series(1, 8)) AS u(i)
    )
    SELECT doc_id AS media_id, f::INT AS frame_idx,
           32::INT AS width, 16::INT AS height,
           sum(v) / 8 AS mean_px,
           512::BIGINT AS n_px
    FROM b GROUP BY doc_id, f
    """,
    doc="multimodal video: REAL MJPEG-in-AVI path — RIFF container walk "
        "(LIST/hdrl/movi tree), per-frame '00dc' extraction, baseline JPEG "
        "entropy decode — per-frame stats value-checked by the oracle via "
        "the codec's exact constant-block roundtrip class",
)
def mm_video_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_avi_media_table(docs, "doc_id", "text")
    return M.extract_video_frame_features(media)


@register(
    "cdc_state_diff",
    """
    WITH v1 AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 5 <> 4
    ),
    v2 AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 5 = 2 THEN o_totalprice + 500 ELSE o_totalprice END
               AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 0
    )
    SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS op,
           coalesce(v2.o_orderkey, v1.o_orderkey) AS o_orderkey,
           v1.o_custkey AS old_o_custkey, v2.o_custkey AS new_o_custkey,
           v1.o_totalprice AS old_o_totalprice, v2.o_totalprice AS new_o_totalprice
    FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.o_custkey IS DISTINCT FROM v2.o_custkey
       OR v1.o_totalprice IS DISTINCT FROM v2.o_totalprice
    """,
    doc="change-data-feed between two state snapshots (the inverse of the "
        "CDC apply): full-outer key join classifies insert/delete/update "
        "with null-safe value comparison, unchanged keys emit nothing — "
        "what downstream consumers need to subscribe to a maintained table",
)
def cdc_state_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    v1 = orders.filter(F.col("o_orderkey") % 5 != 4)
    v2 = orders.filter(F.col("o_orderkey") % 5 != 0).select(
        "o_orderkey", "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 2, F.col("o_totalprice") + 500)
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return A.state_diff(v1, v2, ["o_orderkey"])


@register(
    "sketch_count_min",
    """
    WITH src AS (SELECT CAST(o_custkey AS VARCHAR) AS v FROM orders),
    d AS (SELECT unnest([0, 1, 2, 3]) AS j),
    h AS (
      SELECT d.j,
             ('0x' || substr(md5(d.j || ':' || src.v), 1, 4))::BIGINT % 64 AS bucket
      FROM src, d
    )
    SELECT j::INT AS depth, bucket, count(*)::BIGINT AS cnt
    FROM h GROUP BY j, bucket
    """,
    doc="portable count-min sketch (4x64 integer counters, salted-md5 row "
        "hashes) over orders.o_custkey — the mergeable heavy-hitter "
        "structure: merge = elementwise sum, estimate = min over depth; "
        "exact integer registers so any engine agrees bit-for-bit",
)
def sketch_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import cm_registers

    orders = load_table(spark, sf_dir, "orders")
    return cm_registers(orders, F.col("o_custkey")).select(
        F.col("depth").cast("int").alias("depth"), "bucket",
        F.col("cnt").cast("long").alias("cnt"),
    )


@register(
    "sketch_bottomk_quantiles",
    """
    WITH h AS (
      SELECT l_extendedprice AS val,
             md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)) AS hx
      FROM lineitem
    ),
    bk AS (SELECT val FROM h ORDER BY hx LIMIT 100),
    r AS (SELECT val, row_number() OVER (ORDER BY val ASC, rowid) AS rn
          FROM (SELECT val, row_number() OVER (ORDER BY val) AS rowid FROM bk))
    SELECT rn::INT AS rn, val FROM r WHERE rn IN (25, 50, 75, 100)
    """,
    doc="bottom-k quantile sketch: the 100 rows with the smallest md5 row "
        "hashes form a deterministic uniform sample (same sample on every "
        "engine/run/partitioning, unlike rand()); sorted sample ranks 25/50/"
        "75/100 estimate the quartiles. TakeOrdered bottom-k is "
        "per-partition-heap + merge — no global sort of the data",
)
def sketch_bottomk_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    h = li.select(
        F.col("l_extendedprice").alias("val"),
        F.md5((F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("string")).alias("hx"),
    )
    bk = h.orderBy("hx").limit(100).select("val")
    # un-partitioned window is BOUNDED: the frame is the 100-row bottom-k
    # sample above (TakeOrdered), so the WindowExec single-partition warning
    # is benign here
    w = Window.orderBy(F.col("val").asc())
    return (
        bk.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn").isin(25, 50, 75, 100))
        .select(F.col("rn").cast("int").alias("rn"), "val")
    )


@register(
    "analytic_gap_fill",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', epoch_ms(epoch_ns(ts) // 1000000)) AS h,
             count(*) AS n_events, max(value) AS max_value
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
      FROM span
    ),
    joined AS (
      SELECT g.user_id, g.h,
             coalesce(hy.n_events, 0)::BIGINT AS n_events,
             hy.max_value
      FROM grid g LEFT JOIN hourly hy ON g.user_id = hy.user_id AND g.h = hy.h
    )
    SELECT user_id, h AS bucket, n_events,
           last_value(max_value IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM joined
    """,
    doc="time-series gap fill (hypertable densification): per-user hourly "
        "grid from sequence(min,max), zero-filled counts, and carry-forward "
        "interpolation via last_value IGNORE NULLS; max_value is an "
        "order-insensitive double so the fill is engine-exact",
)
def analytic_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
    span = hourly.groupBy("user_id").agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = span.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left").select(
        "user_id", "h",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        "max_value",
    )
    w = Window.partitionBy("user_id").orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "user_id", F.col("h").alias("bucket"), "n_events",
        F.last("max_value", ignorenulls=True).over(w).alias("filled_value"),
    )


@register(
    "analytic_funnel",
    """
    WITH s AS (
      SELECT user_id, min(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    p AS (
      SELECT e.user_id
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'purchase'
        AND e.ts >= s.s_ts AND e.ts <= s.s_ts + INTERVAL 24 HOUR
      GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s)::BIGINT AS n_signup,
           (SELECT count(*) FROM p)::BIGINT AS n_converted
    """,
    doc="two-step funnel (signup -> purchase within 24h of FIRST signup): "
        "per-user min-ts anchor, interval-bounded join, distinct conversion "
        "count — the standard product-analytics sequence query as one "
        "broadcast-friendly plan",
)
def analytic_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(s), "user_id")
        .filter(
            (F.col("ts") >= F.col("s_ts"))
            & (F.col("ts") <= F.col("s_ts") + F.expr("INTERVAL 24 HOURS"))
        )
        .select("user_id")
        .distinct()
    )
    n_s = s.agg(F.count("*").cast("long").alias("n_signup"))
    n_p = p.agg(F.count("*").cast("long").alias("n_converted"))
    return n_s.crossJoin(n_p)


@register(
    "source_jsonl_roundtrip",
    """
    SELECT doc_id, source, lang,
           length(text)::BIGINT AS text_len,
           md5(text) AS text_md5
    FROM documents
    """,
    doc="JSONL source coverage: the documents table is written as JSON Lines "
        "(the lingua franca of training-corpus distribution) and read back "
        "through spark.read.schema(...).json — explicit schema, no sampling "
        "inference pass, which is the only scan-once-safe pattern at 100 TB; "
        "the oracle checks content survives the roundtrip byte-for-byte",
)
def source_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="src_jsonl_")
    docs.write.mode("overwrite").json(f"{base}/docs")
    back = spark.read.schema(docs.schema).json(f"{base}/docs")
    return back.select(
        "doc_id", "source", "lang",
        F.length("text").cast("long").alias("text_len"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


@register(
    "source_csv_roundtrip",
    """
    SELECT doc_id, source, lang,
           length(text)::BIGINT AS text_len,
           md5(text) AS text_md5
    FROM documents
    """,
    doc="CSV source coverage: documents written as quoted/escaped CSV with "
        "header and read back with an explicit schema (quote+escape handle "
        "embedded delimiters, multiLine handles embedded newlines inside "
        "quoted fields; no inference pass); same roundtrip oracle as the "
        "JSONL twin. multiLine forgoes newline-based file splitting, so at "
        "scale CSV inputs should be many files (they are — one per task "
        "partition here); parquet/JSONL remain the splittable fast path.",
)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="src_csv_")
    (
        docs.write.mode("overwrite")
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        # write-side defaults TRIM leading/trailing whitespace (incl. a
        # trailing '\n' inside a quoted field) — disable for fidelity
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(f"{base}/docs")
    )
    back = (
        spark.read.schema(docs.schema)
        .option("header", "true")
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", "true")
        .csv(f"{base}/docs")
    )
    return back.select(
        "doc_id", "source", "lang",
        F.length("text").cast("long").alias("text_len"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


@register(
    "stream_stream_interval_join",
    """
    SELECT a.event_id AS imp_id, b.event_id AS clk_id, a.user_id,
           CAST(epoch_ns(b.ts) // 1000000000 - epoch_ns(a.ts) // 1000000000 AS BIGINT)
             AS delta_s
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND a.event_id % 2 = 0 AND b.event_id % 2 = 1
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
    """,
    doc="stream-stream interval join (impressions x clicks attribution): two "
        "watermarked streams joined on user_id within a 60-minute event-time "
        "band — the Structured Streaming operator whose state is bounded by "
        "the interval condition (rows age out once the watermark passes "
        "their join window); oracle is the equivalent batch self-join",
)
def stream_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    base = tempfile.mkdtemp(prefix="stream_ssj_")
    ev.write.mode("overwrite").parquet(f"{base}/in")
    imp = (
        spark.readStream.schema(ev.schema).parquet(f"{base}/in")
        .filter(F.col("event_id") % 2 == 0)
        .select(
            F.col("event_id").alias("imp_id"),
            F.col("user_id").alias("imp_user"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", "2 hours")
    )
    clk = (
        spark.readStream.schema(ev.schema).parquet(f"{base}/in")
        .filter(F.col("event_id") % 2 == 1)
        .select(
            F.col("event_id").alias("clk_id"),
            F.col("user_id").alias("clk_user"),
            F.col("ts").alias("clk_ts"),
        )
        .withWatermark("clk_ts", "2 hours")
    )
    joined = imp.join(
        clk,
        F.expr(
            "imp_user = clk_user AND clk_ts >= imp_ts "
            "AND clk_ts <= imp_ts + INTERVAL 60 MINUTES"
        ),
    )
    sink = f"ssj_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, 8):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.table(sink).select(
        "imp_id",
        "clk_id",
        F.col("imp_user").alias("user_id"),
        (F.unix_timestamp("clk_ts") - F.unix_timestamp("imp_ts")).cast("long").alias("delta_s"),
    )


@register(
    "sim_pq_encode",
    """
    WITH c AS (
      SELECT vec_id AS cid, embedding AS cemb
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    sp AS (SELECT unnest([0, 1, 2, 3]) AS s),
    sub AS (
      SELECT vec_id, sp.s AS subspace,
             embedding[(sp.s * 16 + 1):(sp.s * 16 + 16)] AS v
      FROM embeddings, sp
    ),
    csub AS (
      SELECT cid, sp.s AS subspace,
             cemb[(sp.s * 16 + 1):(sp.s * 16 + 16)] AS cv
      FROM c, sp
    ),
    d AS (
      SELECT sub.vec_id, sub.subspace, csub.cid,
             list_sum(list_transform(generate_series(1, 16),
               i -> (sub.v[i]::DOUBLE - csub.cv[i]::DOUBLE)
                    * (sub.v[i]::DOUBLE - csub.cv[i]::DOUBLE))) AS dist2
      FROM sub JOIN csub ON sub.subspace = csub.subspace
    ),
    ranked AS (
      SELECT vec_id, subspace, cid,
             row_number() OVER (PARTITION BY vec_id, subspace
                                ORDER BY dist2 ASC, cid ASC) AS rnk
      FROM d
    )
    SELECT vec_id, subspace, cid AS code FROM ranked WHERE rnk = 1
    """,
    doc="product quantization encode (m=4 subspaces x 16 dims, k=8 "
        "deterministic codebook entries): each vector compresses to 4 codes "
        "via nearest-centroid per subspace — the IVF-PQ memory-compression "
        "step for billion-vector ANN; in-order float sums + centroid-id "
        "tie-break keep the argmin engine-stable, codes are integers so the "
        "hash compares exactly",
)
def sim_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    return S.pq_encode(emb, n_sub=4, sub_dim=16, k=8)


@register(
    "sim_pq_adc_topk",
    """
    WITH c AS (
      SELECT vec_id AS cid, embedding AS cemb
      FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    sp AS (SELECT unnest([0, 1, 2, 3]) AS s),
    sub AS (
      SELECT vec_id, sp.s AS subspace,
             embedding[(sp.s * 16 + 1):(sp.s * 16 + 16)] AS v
      FROM embeddings, sp
    ),
    csub AS (
      SELECT cid, sp.s AS subspace,
             cemb[(sp.s * 16 + 1):(sp.s * 16 + 16)] AS cv
      FROM c, sp
    ),
    enc AS (
      SELECT sub.vec_id, sub.subspace, csub.cid,
             list_sum(list_transform(generate_series(1, 16),
               i -> (sub.v[i]::DOUBLE - csub.cv[i]::DOUBLE)
                    * (sub.v[i]::DOUBLE - csub.cv[i]::DOUBLE))) AS dist2
      FROM sub JOIN csub ON sub.subspace = csub.subspace
    ),
    codes AS (
      SELECT vec_id, subspace, cid AS code FROM (
        SELECT vec_id, subspace, cid,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY dist2 ASC, cid ASC) AS rnk
        FROM enc
      ) WHERE rnk = 1
    ),
    q AS (
      SELECT vec_id AS q_id, embedding AS qemb
      FROM embeddings ORDER BY vec_id LIMIT 3
    ),
    qsub AS (
      SELECT q_id, sp.s AS subspace,
             qemb[(sp.s * 16 + 1):(sp.s * 16 + 16)] AS qv
      FROM q, sp
    ),
    dtable AS (
      SELECT qsub.q_id, qsub.subspace, csub.cid,
             list_sum(list_transform(generate_series(1, 16),
               i -> (qsub.qv[i]::DOUBLE - csub.cv[i]::DOUBLE)
                    * (qsub.qv[i]::DOUBLE - csub.cv[i]::DOUBLE))) AS qd
      FROM qsub JOIN csub ON qsub.subspace = csub.subspace
    ),
    per AS (
      SELECT codes.vec_id, dtable.q_id, codes.subspace AS s, dtable.qd
      FROM codes JOIN dtable
        ON codes.subspace = dtable.subspace AND codes.code = dtable.cid
    ),
    adc AS (
      SELECT q_id, vec_id,
             coalesce(max(CASE WHEN s = 0 THEN qd END), 0.0)
           + coalesce(max(CASE WHEN s = 1 THEN qd END), 0.0)
           + coalesce(max(CASE WHEN s = 2 THEN qd END), 0.0)
           + coalesce(max(CASE WHEN s = 3 THEN qd END), 0.0) AS adc_dist2
      FROM per GROUP BY q_id, vec_id
    )
    SELECT q_id, vec_id, adc_dist2, rnk FROM (
      SELECT q_id, vec_id, adc_dist2,
             row_number() OVER (PARTITION BY q_id
                                ORDER BY adc_dist2 ASC, vec_id ASC) AS rnk
      FROM adc
    ) WHERE rnk <= 10
    """,
    doc="PQ asymmetric-distance top-10: per-query distance tables against the "
        "codebook (96 rows, broadcast), corpus distances are 4 table lookups "
        "added in fixed subspace order — after encode, search never touches a "
        "raw corpus vector, which is what makes IVF-PQ viable at billions of "
        "vectors; doubles engine-stable via in-order folds + fixed-order sums",
)
def sim_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(3)
    return S.pq_adc_topk(queries, emb, n_sub=4, sub_dim=16, k_codebook=8, topk=10)


@register(
    "graph_pagerank",
    """
    WITH e AS (
      SELECT DISTINCT l_suppkey AS src, l_partkey % 100 AS dst FROM lineitem
    ),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst AS node FROM e),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    n AS (SELECT count(*) AS n FROM nodes),
    r0 AS (SELECT node, 1000000000000 // n.n AS r FROM nodes, n),
    c1 AS (SELECT e.dst, sum(r0.r // d.deg) AS s
           FROM e JOIN r0 ON e.src = r0.node JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
    r1 AS (SELECT nodes.node,
                  (15 * (1000000000000 // n.n)) // 100 + (85 * coalesce(c1.s, 0)) // 100 AS r
           FROM nodes CROSS JOIN n LEFT JOIN c1 ON nodes.node = c1.dst),
    c2 AS (SELECT e.dst, sum(r1.r // d.deg) AS s
           FROM e JOIN r1 ON e.src = r1.node JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
    r2 AS (SELECT nodes.node,
                  (15 * (1000000000000 // n.n)) // 100 + (85 * coalesce(c2.s, 0)) // 100 AS r
           FROM nodes CROSS JOIN n LEFT JOIN c2 ON nodes.node = c2.dst),
    c3 AS (SELECT e.dst, sum(r2.r // d.deg) AS s
           FROM e JOIN r2 ON e.src = r2.node JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
    r3 AS (SELECT nodes.node,
                  (15 * (1000000000000 // n.n)) // 100 + (85 * coalesce(c3.s, 0)) // 100 AS r
           FROM nodes CROSS JOIN n LEFT JOIN c3 ON nodes.node = c3.dst)
    SELECT node, r::BIGINT AS pagerank FROM r3
    """,
    doc="fixed-point integer PageRank (3 iterations, damping 85/100) over a "
        "key-derived supplier graph — the web-corpus quality-prior algorithm "
        "in an order-insensitive integer form, so the iterative loop is "
        "value-oracle-exact via unrolled CTE stages; each iteration is one "
        "edges-x-ranks join plus one groupBy(dst), the textbook distributed "
        "shape",
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.graph import pagerank_fixed_point

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") % 100).alias("dst"),
    ).distinct()
    return pagerank_fixed_point(edges, iterations=3)


@register(
    "mm_gif_features",
    f"""
    WITH {_MM_RASTER_CTE},
    px AS (
      SELECT doc_id, w, ascii(substr(ras, u.i, 1)) AS v, length(ras) AS n
      FROM r, unnest(generate_series(1, length(ras))) AS u(i)
    )
    SELECT doc_id AS media_id,
           sum(v) / n AS mean_px,
           sqrt(sum(v * v) / n - (sum(v) / n) * (sum(v) / n)) AS std_px,
           (max(w) * 12)::BIGINT AS n_px
    FROM px GROUP BY doc_id, n
    """,
    doc="multimodal: feature extraction through the REAL pure-Python GIF87a "
        "decode (variable-width LZW, identity grayscale palette) — same "
        "deterministic raster bytes as the PPM/PNG twins laid out as one "
        "gray pixel per byte, so the shared SQL oracle value-checks the LZW "
        "decompress + palette-map path end-to-end (n_px = w*12 gray pixels "
        "here vs w*4 RGB pixels in the RGB twins)",
)
def mm_gif_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_gif_media_table(docs, "doc_id", "text")
    return M.extract_image_features(media)


@register(
    "mm_resize_features",
    f"""
    WITH {_MM_RASTER_CTE},
    sel AS (
      SELECT doc_id, w,
             flatten(list_transform(generate_series(0, 1), ty ->
               list_transform(generate_series(0, 7), tx ->
                 substr(ras,
                        (least(ty * 2, 3) * w + least((tx * w) // 8, w - 1)) * 3 + 1,
                        1)))) AS px
      FROM r
    )
    SELECT doc_id AS media_id,
           8 AS width, 2 AS height,
           md5(array_to_string(px, '')) AS resized_md5
    FROM sel
    """,
    doc="multimodal resize plumbing verified byte-for-byte: nearest-neighbor "
        "downsample of the decoded grayscale plane to 8x2 through the real "
        "PPM decode + mapInPandas resize kernel; the oracle recomputes the "
        "EXACT resized byte string from the synthesis rule (index "
        "arithmetic (ty*h//th, tx*w//tw) in SQL) and compares md5 — a "
        "value-exact check of decode, channel extraction, index clipping, "
        "and byte layout, not just statistics",
)
def mm_resize_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    resized = M.resize_images(media, target_w=8, target_h=2)
    return resized.select(
        "media_id",
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.md5("resized").alias("resized_md5"),
    )


# Hash range for KMV estimates: EXACTLY the range of the hash function in
# use (12 hex digits of md5 = 48 bits). The estimator (k-1)*M/h_k assumes
# h uniform on [0, M); an M larger than the true hash range inflates every
# estimate by M/range — caught by tests/test_sketches.py's closeness bound.
_KMV_M = 1 << 48


@register(
    "sketch_kmv_setops",
    f"""
    WITH ha AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT
                      % {_KMV_M} AS h
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    hb AS (
      SELECT DISTINCT ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))::BIGINT
                      % {_KMV_M} AS h
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    ka AS (SELECT h FROM ha ORDER BY h LIMIT 64),
    kb AS (SELECT h FROM hb ORDER BY h LIMIT 64),
    ku AS (SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) ORDER BY h LIMIT 64)
    SELECT
      63 * {_KMV_M}.0 / (SELECT max(h) FROM ka) AS est_a,
      63 * {_KMV_M}.0 / (SELECT max(h) FROM kb) AS est_b,
      63 * {_KMV_M}.0 / (SELECT max(h) FROM ku) AS est_union,
      63 * {_KMV_M}.0 / (SELECT max(h) FROM ka)
        + 63 * {_KMV_M}.0 / (SELECT max(h) FROM kb)
        - 63 * {_KMV_M}.0 / (SELECT max(h) FROM ku) AS est_intersect,
      (SELECT count(DISTINCT o_custkey) FROM orders WHERE o_orderkey % 2 = 0) AS exact_a,
      (SELECT count(DISTINCT o_custkey) FROM orders WHERE o_orderkey % 2 = 1) AS exact_b
    """,
    doc="KMV (bottom-k minimum values) distinct sketches with SET OPERATIONS "
        "(Beyer et al., SIGMOD '07): per-set bottom-64 md5 hashes estimate "
        "cardinality as (k-1)*M/h_k; the union sketch is the bottom-k of "
        "the merged sketches (mergeability = map-side combinable at 100 TB), "
        "intersection by inclusion-exclusion. Exact counts alongside show "
        "the estimation error. Bottom-k plans as TakeOrdered — "
        "per-partition heap + merge, no global sort",
)
def sketch_kmv_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = F.lit(float(_KMV_M))

    def kmv(side: DataFrame) -> DataFrame:
        h = (
            F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 12), 16, 10)
            .cast("long") % _KMV_M
        )
        return side.select(h.alias("h")).distinct().orderBy("h").limit(64)

    ka = kmv(orders.filter(F.col("o_orderkey") % 2 == 0))
    kb = kmv(orders.filter(F.col("o_orderkey") % 2 == 1))
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(64)
    est_a = ka.agg((F.lit(63) * m / F.max("h")).alias("est_a"))
    est_b = kb.agg((F.lit(63) * m / F.max("h")).alias("est_b"))
    est_u = ku.agg((F.lit(63) * m / F.max("h")).alias("est_union"))
    ex_a = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .agg(F.count_distinct("o_custkey").alias("exact_a"))
    )
    ex_b = (
        orders.filter(F.col("o_orderkey") % 2 == 1)
        .agg(F.count_distinct("o_custkey").alias("exact_b"))
    )
    return (
        est_a.crossJoin(est_b).crossJoin(est_u).crossJoin(ex_a).crossJoin(ex_b)
        .select(
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias("est_intersect"),
            "exact_a",
            "exact_b",
        )
    )


@_contextmanager
def _state_partitions(spark: SparkSession, n: int = 8):
    """Scope the shuffle-partition count around a STATEFUL streaming query.

    Stream-stream joins create several state stores PER shuffle partition
    and pay snapshot/commit I/O for each one every micro-batch, so the
    partition count must be sized to the STATE volume, not the core count:
    at 100k rows, 32 partitions is pure per-store overhead (measured 6.8 s
    → 2.9 s by dropping to 8 at sf0.1), while at 100 TB you would raise it
    (and switch spark.sql.streaming.stateStore.providerClass to RocksDB).
    The override is restored even on failure; it binds at stream start, so
    scoping the start/awaitTermination pair is sufficient."""
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n))
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


_SIMHASH_FP_CTE = f"""
    WITH {_SHINGLE_CTE},
    bits AS (
      SELECT doc_id, ('0x' || substr(md5(shingle), 1, 4))::BIGINT AS h
      FROM sh
    ),
    sums AS (
      SELECT doc_id,
             {', '.join(f"sum(CASE WHEN (h // {1 << i}) % 2 = 1 THEN 1 ELSE -1 END) AS s{i}" for i in range(16))}
      FROM bits GROUP BY doc_id
    ),
    fp AS (
      SELECT doc_id,
             ({' + '.join(f"CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(16))})::BIGINT AS simhash
      FROM sums
    )
"""


@register(
    "dedup_simhash_hamming",
    _SIMHASH_FP_CTE + """,
    blocks AS (
      SELECT doc_id, simhash, t.i AS blk,
             (simhash // power(2, t.i * 4)::BIGINT) % 16 AS val
      FROM fp, UNNEST([0, 1, 2, 3]) AS t(i)
    ),
    bsize AS (SELECT blk, val, count(*) AS n FROM blocks GROUP BY blk, val),
    kept AS (
      SELECT b.doc_id, b.simhash, b.blk, b.val
      FROM blocks b JOIN bsize s ON b.blk = s.blk AND b.val = s.val
      WHERE s.n <= 256
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
             l.simhash AS fa, r.simhash AS fb
      FROM kept l JOIN kept r ON l.blk = r.blk AND l.val = r.val
      WHERE l.doc_id < r.doc_id
    )
    SELECT a, b, CAST(bit_count(xor(fa, fb)) AS INTEGER) AS hamming
    FROM cand WHERE bit_count(xor(fa, fb)) <= 3
    """,
    doc="SimHash near-dup pairs within Hamming distance 3 via bit-block LSH "
        "(Manku et al. '07): 4 disjoint 4-bit blocks — pigeonhole guarantees "
        "any pair within distance 3 shares a block, so candidates come from "
        "an equi-join on (block, value) with a hot-bucket cap, never an "
        "all-pairs scan; exact popcount filter on the candidates",
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.simhash16(D.exploded_shingles(docs))
    return D.simhash_hamming_pairs(sigs, max_distance=3, n_blocks=4)


@register(
    "dedup_minhash_containment",
    SIG_SQL + """,
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    bsize AS (SELECT band, bucket, count(*) AS n FROM buckets GROUP BY band, bucket),
    kept AS (
      SELECT b.doc_id, b.band, b.bucket
      FROM buckets b JOIN bsize s ON b.band = s.band AND b.bucket = s.bucket
      WHERE s.n <= 3
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM kept l JOIN kept r ON l.band = r.band AND l.bucket = r.bucket
      WHERE l.doc_id < r.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT sa.doc_id AS a, sb.doc_id AS b, count(*) AS n_common
      FROM sh sa JOIN sh sb ON sa.shingle = sb.shingle AND sa.doc_id < sb.doc_id
      GROUP BY sa.doc_id, sb.doc_id
    )
    SELECT c.a, c.b,
           i.n_common / za.sz AS containment_a,
           i.n_common / zb.sz AS containment_b
    FROM cand c
    JOIN inter i ON i.a = c.a AND i.b = c.b
    JOIN sizes za ON za.doc_id = c.a
    JOIN sizes zb ON zb.doc_id = c.b
    """,
    doc="asymmetric containment scores |A∩B|/|A| and |A∩B|/|B| (Broder '97) "
        "on capped-LSH candidate pairs — catches subset/quoted duplicates "
        "that Jaccard under-scores; same bounded candidate join as the "
        "capped LSH path, one extra shingle-intersection aggregation",
)
def dedup_minhash_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sh = D.exploded_shingles(docs)
    sigs = D.minhash_signatures(sh, num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    cand = D.candidate_pairs(buckets, max_bucket_size=3)
    return D.containment_pairs(sh, cand)


@register(
    "olap_range_frame_window",
    """
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    )
    SELECT o_orderkey, o_custkey,
           sum(cents) OVER (PARTITION BY o_custkey ORDER BY d
                            RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) / 100.0
             AS rev_30d,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY d
                               RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS n_30d
    FROM o
    """,
    doc="RANGE-frame window: trailing 30-day revenue per customer, ordered "
        "by epoch-day so the frame is a true value range (all peer rows of "
        "equal date included — deterministic under ties, unlike ROWS "
        "frames); integer-cents accumulation for exactness. Completes the "
        "window-frame surface: ROWS (olap_running_revenue), "
        "RANGE (here), ranking/distribution (olap_window_family)",
)
def olap_range_frame_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        "o_orderkey",
        "o_custkey",
        F.unix_date(F.col("o_orderdate").cast("date")).alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("o_custkey").orderBy("d").rangeBetween(-30, 0)
    return o.select(
        "o_orderkey",
        "o_custkey",
        (F.sum("cents").over(w) / F.lit(100.0)).alias("rev_30d"),
        F.count("*").over(w).cast("long").alias("n_30d"),
    )


@register(
    "stream_outer_interval_join",
    """
    SELECT a.event_id AS imp_id, b.event_id AS clk_id, a.user_id,
           CAST(epoch_ns(b.ts) // 1000000000 - epoch_ns(a.ts) // 1000000000 AS BIGINT)
             AS delta_s
    FROM (SELECT * FROM events WHERE event_id % 2 = 0) a
    LEFT JOIN (SELECT * FROM events WHERE event_id % 2 = 1) b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
    """,
    doc="stream-stream LEFT OUTER interval join (impressions with or without "
        "a click inside 60 min): unmatched left rows are held in state and "
        "emitted only once the watermark passes their join window, so the "
        "harness appends a far-future sentinel event to both streams to "
        "drive the final watermark past all real data (then filters it out) "
        "— the availableNow analog of production's continuously-advancing "
        "watermark; oracle is the equivalent batch left join",
)
def stream_outer_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinel = ev.sparkSession.createDataFrame(
        [(-2, -1), (-1, -1)], "event_id long, user_id long"
    ).select(
        "event_id",
        "user_id",
        F.lit(max_ts).cast("timestamp").alias("ts"),
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 HOURS"))
    base = tempfile.mkdtemp(prefix="stream_loj_")
    ev.unionByName(sentinel).write.mode("overwrite").parquet(f"{base}/in")
    src = spark.readStream.schema(ev.schema).parquet(f"{base}/in")
    imp = (
        src.filter(F.col("event_id") % 2 == 0)
        .select(
            F.col("event_id").alias("imp_id"),
            F.col("user_id").alias("imp_user"),
            F.col("ts").alias("imp_ts"),
        )
        .withWatermark("imp_ts", "2 hours")
    )
    clk = (
        src.filter((F.col("event_id") % 2 == 1) | (F.col("event_id") == -1))
        .select(
            F.col("event_id").alias("clk_id"),
            F.col("user_id").alias("clk_user"),
            F.col("ts").alias("clk_ts"),
        )
        .withWatermark("clk_ts", "2 hours")
    )
    joined = imp.join(
        clk,
        (F.col("imp_user") == F.col("clk_user"))
        & (F.col("clk_ts") >= F.col("imp_ts"))
        & (F.col("clk_ts") <= F.col("imp_ts") + F.expr("INTERVAL 60 MINUTES")),
        "leftOuter",
    )
    sink = f"out_{uuid.uuid4().hex[:8]}"
    with _state_partitions(spark, 8):
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName(sink)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return (
        spark.table(sink)
        .filter(F.col("imp_user") >= 0)  # drop the watermark-driver sentinel
        .select(
            "imp_id",
            "clk_id",
            F.col("imp_user").alias("user_id"),
            (
                F.unix_timestamp("clk_ts") - F.unix_timestamp("imp_ts")
            ).cast("long").alias("delta_s"),
        )
    )


@register(
    "text_chunk_split",
    """
    WITH t AS (
      SELECT doc_id, source,
             CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
                  ELSE string_split_regex(trim(text), '\\s+') END AS toks
      FROM documents
    ),
    n AS (
      SELECT doc_id, source, toks, len(toks) AS nt,
             1 + (greatest(len(toks) - 64, 0) + 47) // 48 AS n_chunks
      FROM t
    )
    SELECT doc_id, source,
           CAST(i.i AS INTEGER) AS chunk_idx,
           array_to_string(toks[i.i * 48 + 1 : i.i * 48 + 64], ' ') AS chunk_text,
           CAST(least(64, nt - i.i * 48) AS INTEGER) AS n_tokens
    FROM n, unnest(generate_series(0, n_chunks - 1)) AS i(i)
    """,
    doc="document chunking for context-window training: 64-token sliding "
        "windows with 16-token overlap (stride 48), final partial window "
        "kept — the splitter that turns a long-document corpus into "
        "training examples. One explode, no shuffle, no Python; at 100 TB "
        "this is a map-only pass whose output partitioning follows the "
        "input",
)
def text_chunk_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.text_analysis import chunk_spans

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "source",
        F.explode(chunk_spans(F.col("text"), chunk_tokens=64, overlap=16)).alias("c"),
    ).select(
        "doc_id",
        "source",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.chunk_text").alias("chunk_text"),
        F.col("c.n_tokens").alias("n_tokens"),
    )


@register(
    "sample_upsample_mix",
    """
    WITH c AS (
      SELECT doc_id, source,
             CASE source WHEN 'web' THEN 2 WHEN 'books' THEN 1
                         WHEN 'code' THEN 0 ELSE 1 END
             + CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000
                         < CASE source WHEN 'web' THEN 5000 WHEN 'books' THEN 2500
                                       WHEN 'code' THEN 3000 ELSE 0 END
                    THEN 1 ELSE 0 END AS n_rep
      FROM documents
    )
    SELECT doc_id, source, CAST(r.r AS INTEGER) AS rep_idx
    FROM c, unnest(generate_series(1, n_rep)) AS r(r)
    """,
    doc="deterministic data-mixing upsampler (domain reweighting): per-source "
        "target weights (web 2.5x, books 1.25x, code 0.3x, default 1x) become "
        "exact integer repeat counts — floor(w) copies plus one more for an "
        "md5-selected frac(w) subset — so expected multiplicity equals the "
        "weight with ZERO RNG: reproducible across engines, partitionings, "
        "and reruns, the run-to-run-parity property a training-mix step "
        "needs. Map-only explode; no shuffle",
)
def sample_upsample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.text_analysis import upsample_counts

    docs = load_table(spark, sf_dir, "documents")
    cnt = upsample_counts(
        F.col("doc_id"), F.col("source"), {"web": 2.5, "books": 1.25, "code": 0.3}
    )
    reps = F.when(cnt > 0, F.sequence(F.lit(1), cnt)).otherwise(
        F.array().cast("array<int>")
    )
    return docs.select("doc_id", "source", F.explode(reps).alias("rep_idx"))


# ---------------------------------------------------------------------------
# Storage-layer surface (round 5): columnar-format fidelity, partition
# pruning, and bucketed (pre-shuffled) joins — the three storage levers a
# 100 TB deployment actually pulls. Each is verified by VALUE (the oracle
# reads the original table directly, so any write/read corruption or
# mispruning shows up as a hash mismatch), and the plan-level claims
# (PartitionFilters reach the scan; no Exchange on a bucketed join) are
# pinned in tests/test_plan_shapes.py.
# ---------------------------------------------------------------------------

@register(
    "source_orc_roundtrip",
    """
    SELECT doc_id, source, lang,
           length(text)::BIGINT AS text_len,
           md5(text) AS text_md5
    FROM documents
    """,
    doc="ORC write→read round trip of the documents table (Spark's built-in "
        "ORC source, zlib): the oracle reads the ORIGINAL parquet, so the "
        "md5-per-row comparison proves byte-for-byte fidelity through the "
        "second columnar format; complements the CSV and JSONL round trips",
)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="src_orc_")
    docs.write.mode("overwrite").orc(f"{base}/docs")
    back = spark.read.schema(docs.schema).orc(f"{base}/docs")
    return back.select(
        "doc_id", "source", "lang",
        F.length("text").cast("long").alias("text_len"),
        F.md5(F.col("text").cast("binary")).alias("text_md5"),
    )


@register(
    "source_partitioned_pruning",
    """
    SELECT o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
    doc="Hive-style partitioned layout with partition pruning: orders is "
        "written partitionBy(o_orderpriority) and read back with a filter on "
        "the partition column, so the scan touches only 2 of 5 directories — "
        "at 100 TB this is the difference between reading 40% and 100% of "
        "the table. The oracle aggregates the ORIGINAL table, catching both "
        "over-pruning (missing rows) and under-pruning-with-misassignment; "
        "tests/test_plan_shapes.py asserts the PartitionFilters actually "
        "reach the FileSourceScan",
)
def source_partitioned_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="src_part_")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
        f"{base}/orders"
    )
    back = spark.read.parquet(f"{base}/orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        back.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).cast("long").alias("total_cents"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


def write_bucketed_pair(spark: SparkSession, sf_dir: str, buckets: int = 8):
    """Save orders and customer as bucketed tables (bucketBy o_custkey /
    c_custkey, matching bucket counts) under a temp path, returning the two
    catalog names. Bucketing pre-shuffles the data at WRITE time so every
    subsequent join/agg on the bucket key is exchange-free — the classic
    amortization for a fact table joined daily at 100 TB. The catalog entry
    is in-memory (session-scoped); the files live under /tmp via the path
    option, so nothing touches the repo tree."""
    import tempfile
    import uuid

    tag = uuid.uuid4().hex[:8]
    base = tempfile.mkdtemp(prefix="bucketed_")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    ot, ct = f"orders_b_{tag}", f"customer_b_{tag}"
    (
        orders.write.mode("overwrite")
        .bucketBy(buckets, "o_custkey")
        .sortBy("o_custkey")
        .option("path", f"{base}/{ot}")
        .saveAsTable(ot)
    )
    (
        cust.write.mode("overwrite")
        .bucketBy(buckets, "c_custkey")
        .sortBy("c_custkey")
        .option("path", f"{base}/{ct}")
        .saveAsTable(ct)
    )
    return ot, ct


@register(
    "layout_bucketed_join",
    """
    SELECT c.c_mktsegment,
           count(*) AS n_orders,
           count(DISTINCT o.o_custkey) AS n_customers,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="bucketed-table join: orders and customer are saved bucketBy(8, "
        "custkey) with matching bucket counts, then joined on the bucket key "
        "— the join plans as SortMergeJoin with ZERO Exchange (asserted in "
        "tests/test_plan_shapes.py), because co-location was paid once at "
        "write time. The per-segment aggregate then shuffles only the tiny "
        "post-join groups. Oracle joins the original un-bucketed tables",
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ot, ct = write_bucketed_pair(spark, sf_dir, buckets=8)
    o = spark.table(ot)
    c = spark.table(ct)
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.sum(cents).cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Web-corpus text preparation (round 5): HTML boilerplate stripping,
# readability scoring, and n-gram LM scoring — the filter stack a web-scrape
# training pipeline runs before dedup. Documents.text is synthetic word soup,
# so the HTML query first INJECTS deterministic markup (same rule in the
# oracle), exactly like the media queries synthesize rasters: the operator
# under test is the strip/score chain, which is verified by value.
# ---------------------------------------------------------------------------

@register(
    "text_html_strip",
    """
    WITH html AS (
      SELECT doc_id,
             '<html><body><h1>doc ' || doc_id || '</h1><p>' ||
             replace(replace(text, 'table', '<b>table</b>'),
                     'row', '<i>row</i>') ||
             '</p><br/>&amp; &lt;tail&gt;&nbsp;end</body></html>' AS markup
      FROM documents
    ),
    stripped AS (
      SELECT doc_id,
             trim(regexp_replace(
               replace(replace(replace(replace(replace(
                 regexp_replace(markup, '<[^>]*>', ' ', 'g'),
                 '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
                 '&nbsp;', ' '), '&#39;', ''''),
               '\\s+', ' ', 'g')) AS clean
      FROM html
    )
    SELECT doc_id,
           length(clean)::BIGINT AS clean_len,
           md5(clean) AS clean_md5
    FROM stripped
    """,
    doc="HTML boilerplate strip: tag removal + entity decode + whitespace "
        "collapse as one JVM-side regexp_replace chain (no Python in the hot "
        "path; map-only, no shuffle at any scale). Markup is injected "
        "deterministically so the oracle can verify the stripped text "
        "byte-for-byte via md5, not just statistically",
)
def text_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    markup = F.concat(
        F.lit("<html><body><h1>doc "), F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.regexp_replace(
            F.regexp_replace("text", "table", "<b>table</b>"),
            "row", "<i>row</i>",
        ),
        F.lit("</p><br/>&amp; &lt;tail&gt;&nbsp;end</body></html>"),
    )
    clean = F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_replace(
                            F.regexp_replace(
                                F.regexp_replace(markup, "<[^>]*>", " "),
                                "&amp;", "&"),
                            "&lt;", "<"),
                        "&gt;", ">"),
                    "&nbsp;", " "),
                "&#39;", "'"),
            r"\s+", " ")
    )
    return docs.select(
        "doc_id",
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean.cast("binary")).alias("clean_md5"),
    )


@register(
    "text_readability",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             count(*)::BIGINT AS n_words,
             sum(greatest(1, len(regexp_extract_all(w, '[aeiouy]+'))))::BIGINT
               AS n_syllables,
             CAST(ceil(count(*) / 8.0) AS BIGINT) AS n_sentences
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n_words, n_syllables, n_sentences,
           round(0.39 * (n_words::DOUBLE / n_sentences)
                 + 11.8 * (n_syllables::DOUBLE / n_words) - 15.59, 6) AS fk_grade
    FROM m
    """,
    doc="Flesch-Kincaid readability grade with a deterministic vowel-group "
        "syllable heuristic (runs of [aeiouy] per word, min 1) — a standard "
        "quality-filter feature. Sentence boundaries are synthesized as "
        "8-word units (the corpus has no punctuation). Pure array "
        "expressions inside codegen: transform + aggregate over the token "
        "array, zero shuffles, map-only at 100 TB",
)
def text_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim("text")), r"\s+")
    syll = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.lit(1), F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0)))
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_words = F.size(words).cast("long")
    n_sent = F.ceil(n_words / F.lit(8.0)).cast("long")
    m = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        syll.alias("n_syllables"),
        n_sent.alias("n_sentences"),
    )
    return m.select(
        "doc_id", "n_words", "n_syllables", "n_sentences",
        F.round(
            F.lit(0.39) * (F.col("n_words").cast("double") / F.col("n_sentences"))
            + F.lit(11.8) * (F.col("n_syllables").cast("double") / F.col("n_words"))
            - F.lit(15.59),
            6,
        ).alias("fk_grade"),
    )


@register(
    "text_bigram_lm",
    """
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM tok
    ),
    c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
           FROM bg GROUP BY 1),
    v AS (SELECT count(DISTINCT u) AS v
          FROM (SELECT unnest(w) AS u FROM tok)),
    scored AS (
      SELECT bg.doc_id,
             ln((c2.c2 + 1)::DOUBLE / (c1.c1 + v.v)) AS lp
      FROM bg
      JOIN c2 USING (bigram)
      JOIN c1 ON c1.w1 = split_part(bg.bigram, ' ', 1)
      CROSS JOIN v
    )
    SELECT doc_id,
           count(*) AS n_bigrams,
           round(avg(lp), 6) AS avg_logprob
    FROM scored
    GROUP BY doc_id
    """,
    doc="bigram language-model scoring (add-one smoothed): train corpus "
        "bigram/unigram-start counts, then score every document's mean "
        "log-probability — the classic KenLM-style quality signal for "
        "training-data filtering. The count tables are vocabulary-bounded "
        "(independent of corpus size), so at 100 TB they broadcast and the "
        "scoring pass is one map-side join + one groupBy(doc_id); ln of a "
        "single integer ratio is bit-identical cross-engine",
)
def text_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w"))
    bg = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                # zip_with(slice, slice): sequence(0, size-2) yields the
                # DESCENDING [0,-1] for 1-token docs and w[-1] throws under
                # Spark-4 ANSI; slices degrade to empty arrays instead
                "zip_with(slice(w, 1, greatest(size(w) - 1, 0)),"
                " slice(w, 2, greatest(size(w) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram"),
    )
    c2 = bg.groupBy("bigram").agg(F.count("*").alias("c2"))
    c1 = (
        bg.select(F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    v = tok.select(F.explode("w").alias("u")).agg(
        F.count_distinct("u").alias("v")
    )
    scored = (
        bg.join(broadcast(c2), "bigram")
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(broadcast(c1), "w1")
        .crossJoin(broadcast(v))
        .select(
            "doc_id",
            F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v"))).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


# ---------------------------------------------------------------------------
# MinHash estimator quality: for every capped-LSH candidate pair, the
# 8-component signature agreement (the MinHash Jaccard estimate, Broder
# '97 Thm 1: P[mh_j(A)=mh_j(B)] = J(A,B)) next to the EXACT shingle-set
# Jaccard — the dedup analog of sim_ann_recall_eval: the engine measures
# its own estimator's error instead of asserting it.
# ---------------------------------------------------------------------------

@register(
    "dedup_minhash_accuracy_eval",
    f"""{SIG_SQL},
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    bsize AS (SELECT band, bucket, count(*) AS n FROM buckets GROUP BY band, bucket),
    kept AS (
      SELECT b.doc_id, b.band, b.bucket
      FROM buckets b JOIN bsize s ON b.band = s.band AND b.bucket = s.bucket
      WHERE s.n <= 3
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM kept l JOIN kept r ON l.band = r.band AND l.bucket = r.bucket
      WHERE l.doc_id < r.doc_id
    ),
    est AS (
      SELECT c.a, c.b,
             ((sa.mh0 = sb.mh0)::INT + (sa.mh1 = sb.mh1)::INT
              + (sa.mh2 = sb.mh2)::INT + (sa.mh3 = sb.mh3)::INT
              + (sa.mh4 = sb.mh4)::INT + (sa.mh5 = sb.mh5)::INT
              + (sa.mh6 = sb.mh6)::INT + (sa.mh7 = sb.mh7)::INT) / 8.0 AS est_j
      FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_common
      FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    ),
    exact AS (
      SELECT c.a, c.b,
             coalesce(i.n_common, 0)::DOUBLE
               / (za.sz + zb.sz - coalesce(i.n_common, 0)) AS exact_j
      FROM cand c
      LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
      JOIN sizes za ON za.doc_id = c.a
      JOIN sizes zb ON zb.doc_id = c.b
    )
    SELECT est.a, est.b,
           round(est.est_j, 6) AS est_jaccard,
           round(exact.exact_j, 6) AS exact_jaccard,
           round(abs(est.est_j - exact.exact_j), 6) AS abs_err
    FROM est JOIN exact ON est.a = exact.a AND est.b = exact.b
    """,
    doc="MinHash estimator error audit: per capped-LSH candidate pair, the "
        "8-component signature-agreement estimate of Jaccard next to the "
        "exact shingle-set Jaccard and the absolute error — the engine "
        "measures its own sketch's accuracy (Broder '97). Candidates and "
        "signatures are the same bounded pipelines as the dedup queries; "
        "the exact side joins shingles only for candidate pairs",
)
def dedup_minhash_accuracy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    shingles = D.exploded_shingles(docs)
    sigs = D.minhash_signatures(shingles, num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    cand = D.candidate_pairs(buckets, max_bucket_size=3)
    agree = sum(
        (F.col(f"sa.mh{j}") == F.col(f"sb.mh{j}")).cast("int") for j in range(8)
    )
    est = (
        cand.join(sigs.alias("sa"), F.col("sa.doc_id") == cand.a)
        .join(sigs.alias("sb"), F.col("sb.doc_id") == cand.b)
        .select("a", "b", (agree / F.lit(8.0)).alias("est_j"))
    )
    # Restrict the exact side to documents that actually appear in a
    # candidate pair BEFORE the shingle self-join: values are unchanged
    # (a doc keeps all its shingles), but the join's both sides shrink
    # from corpus-sized to candidate-sized — at 100 TB candidates are a
    # vanishing fraction of the corpus, and this is the difference
    # between auditing the sketch and re-running the quadratic baseline.
    cand_docs = (
        cand.select(F.col("a").alias("doc_id"))
        .unionByName(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sh_cand = shingles.join(cand_docs, "doc_id", "left_semi")
    exact = D.jaccard_pairs(sh_cand, cand).select(
        "a", "b", F.col("jaccard").alias("exact_j")
    )
    # left join: a candidate pair with NO common shingle (possible via a
    # min-value hash collision) must appear with exact_j = 0, as in the
    # oracle's LEFT JOIN — an inner join would silently drop it
    joined = est.join(exact, ["a", "b"], "left").withColumn(
        "exact_j", F.coalesce(F.col("exact_j"), F.lit(0.0))
    )
    return joined.select(
        "a", "b",
        F.round("est_j", 6).alias("est_jaccard"),
        F.round("exact_j", 6).alias("exact_jaccard"),
        F.round(F.abs(F.col("est_j") - F.col("exact_j")), 6).alias("abs_err"),
    )


# ---------------------------------------------------------------------------
# ANN quality evaluation: recall@3 of the IVF-probe path against the exact
# brute-force top-3, per query — the metric an ANN index is tuned by. Both
# sides are existing registered queries, so the eval composes their fns
# (Spark) and their oracle SQL (DuckDB) — one definition, no drift.
# ---------------------------------------------------------------------------


def _ann_recall_oracle() -> str:
    return f"""
    WITH bf AS ({QUERIES['sim_knn_bruteforce'].oracle}),
    iv AS ({QUERIES['sim_ivf_rerank'].oracle}),
    hits AS (
      SELECT bf.query_id,
             count(iv.neighbor_id)::BIGINT AS n_hit
      FROM bf LEFT JOIN iv
        ON bf.query_id = iv.query_id AND bf.neighbor_id = iv.neighbor_id
      GROUP BY bf.query_id
    )
    SELECT query_id, n_hit, round(n_hit / 3.0, 6) AS recall_at_3 FROM hits
    """


@register(
    "sim_ann_recall_eval",
    None,  # oracle assigned post-registration (needs both sibling oracles)
    doc="ANN index evaluation: per-query recall@3 of the 4-probe IVF path "
        "vs exact brute force — composed from the two registered queries "
        "(sim_knn_bruteforce, sim_ivf_rerank) on both the Spark and the "
        "oracle side, so the eval can never drift from the operators it "
        "measures. The join is on (query_id, neighbor_id): tiny ranked "
        "sets, broadcast at any scale. On the isotropic synthetic "
        "embeddings recall is low by construction (see sim_ivf_rerank doc); "
        "the eval MEASURING that honestly is the point",
)
def sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = QUERIES["sim_knn_bruteforce"].fn(spark, sf_dir)
    iv = QUERIES["sim_ivf_rerank"].fn(spark, sf_dir)
    hits = (
        bf.alias("bf")
        .join(
            iv.alias("iv"),
            (F.col("bf.query_id") == F.col("iv.query_id"))
            & (F.col("bf.neighbor_id") == F.col("iv.neighbor_id")),
            "left",
        )
        .groupBy(F.col("bf.query_id").alias("query_id"))
        .agg(F.count(F.col("iv.neighbor_id")).cast("long").alias("n_hit"))
    )
    return hits.select(
        "query_id", "n_hit", F.round(F.col("n_hit") / 3.0, 6).alias("recall_at_3")
    )


QUERIES["sim_ann_recall_eval"].oracle = _ann_recall_oracle()


# ---------------------------------------------------------------------------
# Sweep-line concurrency: max simultaneously-open 30-minute event windows
# per event type — the classic interval-overlap aggregation (concurrent
# sessions / connections / jobs). Each interval becomes a +1 at its start
# and a -1 at its end; a running sum in sweep order is the concurrency.
# Tie rule: at equal timestamps ends close BEFORE starts open (delta
# ascending), so touching intervals do not overlap — made total by a final
# event_id tiebreak, which is what keeps the running sum engine-portable.
# ---------------------------------------------------------------------------

@register(
    "analytic_concurrency_sweep",
    """
    WITH iv AS (
      SELECT event_id, event_type,
             epoch_us(ts) AS t0,
             epoch_us(ts) + 30 * 60 * 1000000 AS t1
      FROM events
    ),
    pts AS (
      SELECT event_type, t0 AS t, 1 AS delta, event_id FROM iv
      UNION ALL
      SELECT event_type, t1 AS t, -1 AS delta, event_id FROM iv
    ),
    run AS (
      SELECT event_type,
             sum(delta) OVER (
               PARTITION BY event_type
               ORDER BY t ASC, delta ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS conc
      FROM pts
    )
    SELECT event_type,
           CAST(max(conc) AS BIGINT) AS max_concurrency,
           CAST(count(*) / 2 AS BIGINT) AS n_events
    FROM run GROUP BY event_type
    """,
    doc="sweep-line interval-overlap maximum: 30-minute event windows per "
        "type become +1/-1 endpoints, a partitioned running sum in total "
        "sweep order (time, delta, id — ends close before starts at ties) "
        "gives instantaneous concurrency, max per type. The window is "
        "partitioned by event_type, never global; at 100 TB you sweep per "
        "shard key exactly like this",
)
def analytic_concurrency_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t0"),
        (F.unix_micros("ts") + F.lit(30 * 60 * 1_000_000)).alias("t1"),
    )
    pts = iv.select(
        "event_type", F.col("t0").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        iv.select(
            "event_type", F.col("t1").alias("t"), F.lit(-1).alias("delta"), "event_id"
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("t").asc(), F.col("delta").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("event_type", F.sum("delta").over(w).alias("conc"))
    return run.groupBy("event_type").agg(
        F.max("conc").cast("long").alias("max_concurrency"),
        (F.count("*") / 2).cast("long").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Dynamic partition pruning: the partition filter is NOT known at plan time
# — it arrives at runtime from the dimension side of a join. Spark inserts
# a dynamicpruning subquery into the fact scan's PartitionFilters, so only
# the partitions matching the dim filter are read. At 100 TB this is the
# star-schema workhorse: a date-dim filter prunes a fact table partitioned
# by day without the query ever naming the days.
# ---------------------------------------------------------------------------

@register(
    "source_dynamic_partition_pruning",
    """
    WITH dim AS (
      SELECT DISTINCT o_orderpriority AS prio,
             CASE WHEN o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
                  THEN 'hot' ELSE 'cold' END AS tier
      FROM orders
    )
    SELECT d.tier,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders o JOIN dim d ON o.o_orderpriority = d.prio
    WHERE d.tier = 'hot'
    GROUP BY d.tier
    """,
    doc="dynamic partition pruning: orders written partitionBy(priority) is "
        "joined to a priority dimension filtered AT RUNTIME (tier = 'hot') "
        "— the fact scan's PartitionFilters carry a dynamicpruning subquery "
        "instead of a literal, so 3 of 5 directories are never read even "
        "though the query names no priority. Plan pinned in "
        "tests/test_plan_shapes.py; oracle re-derives the same join from "
        "the ORIGINAL table, catching over- and under-pruning by value",
)
def source_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="src_dpp_")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(
        f"{base}/orders"
    )
    fact = spark.read.parquet(f"{base}/orders")
    dim = (
        orders.select(F.col("o_orderpriority").alias("prio"))
        .distinct()
        .withColumn(
            "tier",
            F.when(
                F.col("prio").startswith("1-") | F.col("prio").startswith("2-"),
                F.lit("hot"),
            ).otherwise(F.lit("cold")),
        )
    )
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        fact.join(
            F.broadcast(dim.filter(F.col("tier") == "hot")),
            fact.o_orderpriority == F.col("prio"),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(cents).cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Temperature-based domain resampling (the mC4 / XLM-R mixing rule,
# Conneau et al. '19 §3): sample sources proportionally to p_s^alpha so
# low-resource domains are upsampled relative to their natural share.
# Deterministic: per-source target counts are derived in-plan from exact
# integer sizes, and the kept subset is the bottom-t_s docs by salted md5
# within each source — reproducible across engines, runs, partitionings.
# ---------------------------------------------------------------------------

@register(
    "sample_temperature_mix",
    """
    WITH sz AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
    tot AS (SELECT sum(cnt) AS n FROM sz),
    q AS (
      SELECT source, cnt, power(cnt::DOUBLE / tot.n, 0.3) AS qs
      FROM sz CROSS JOIN tot
    ),
    t AS (
      SELECT source, cnt,
             CAST(floor(qs / (SELECT sum(qs) FROM q) * 1000 + 0.5) AS BIGINT)
               AS target
      FROM q
    ),
    ranked AS (
      SELECT d.doc_id, d.source, t.target,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5('temp' || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rn
      FROM documents d JOIN t USING (source)
    )
    SELECT doc_id, source, target
    FROM ranked WHERE rn <= target
    """,
    doc="temperature resampling (alpha = 0.3, mC4/XLM-R): per-source share "
        "p_s^alpha renormalized to a 1000-doc budget, each source keeping "
        "its bottom-target docs by salted md5 — low-resource domains "
        "upsampled, hot domains cut, zero RNG. The source-size table is "
        "group-cardinality-bounded (broadcast); the per-source ranking "
        "window is partitioned, never global",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sz = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    tot = sz.agg(F.sum("cnt").alias("n"))
    q = sz.crossJoin(F.broadcast(tot)).select(
        "source", "cnt",
        F.pow(F.col("cnt").cast("double") / F.col("n"), F.lit(0.3)).alias("qs"),
    )
    qsum = q.agg(F.sum("qs").alias("qsum"))
    t = q.crossJoin(F.broadcast(qsum)).select(
        "source",
        F.floor(F.col("qs") / F.col("qsum") * 1000 + F.lit(0.5))
        .cast("long")
        .alias("target"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat(F.lit("temp"), F.col("doc_id").cast("string"))), F.col("doc_id")
    )
    return (
        docs.join(F.broadcast(t), "source")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= F.col("target"))
        .select("doc_id", "source", "target")
    )


# ---------------------------------------------------------------------------
# Embedding-space near-dup clusters: hyperplane-LSH candidate pairs above a
# cosine threshold, closed into components with the large-star/small-star
# algorithm — the semantic-dedup composition (SemDeDup-style pipeline
# shape: ANN candidates -> similarity cut -> cluster -> keep one per
# cluster), all bucketed/linear, no all-pairs stage.
# ---------------------------------------------------------------------------

@register(
    "dedup_embedding_clusters",
    f"""
    WITH RECURSIVE bk AS (
      SELECT vec_id, embedding, {_lsh_bits_sql(4)} AS bucket FROM embeddings
    ),
    cand AS (
      SELECT a.vec_id AS a, b.vec_id AS b
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.4
    ),
    edges AS (SELECT a AS u, b AS v FROM cand UNION SELECT b, a FROM cand),
    reach AS (
      SELECT vec_id AS node, vec_id AS root FROM embeddings
      UNION
      SELECT e.v AS node, r.root AS root FROM reach r JOIN edges e ON e.u = r.node
    )
    SELECT node AS vec_id, min(root) AS component FROM reach GROUP BY node
    """,
    doc="semantic near-dup clusters over embeddings: hyperplane-LSH buckets "
        "(data-independent count) -> cosine >= 0.4 verify -> large-star/"
        "small-star connected components (O(log^2 n) rounds) — the SemDeDup "
        "pipeline shape with every stage bucketed or equi-keyed; component "
        "labels verified against a recursive-CTE reachability closure",
)
def dedup_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = D.embedding_near_dups_lsh(emb, threshold=0.4, n_planes=4, dim=64).select(
        "a", "b"
    )
    labels = D.connected_components_star(
        pairs, emb.select("vec_id"), id_col="vec_id"
    )
    return labels.select(F.col("vec_id"), F.col("component"))


# ---------------------------------------------------------------------------
# Per-group HLL distinct estimation, estimate computed IN-PLAN: the 100 TB
# replacement for groupBy().agg(count_distinct(...)), whose exact form must
# shuffle every distinct (group, value) pair. Registers are max-mergeable,
# so partials combine map-side and the estimate is one more projection.
# ---------------------------------------------------------------------------

_HLL_ALPHA_M2 = 0.7213 / (1 + 1.079 / 256) * 256 * 256


@register(
    "sketch_hll_per_group",
    f"""
    WITH h AS (
      SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events
    ),
    parts AS (
      SELECT event_type,
             ('0x' || substr(hx, 1, 2))::INTEGER AS bucket,
             substr(hx, 3, 13) AS payload
      FROM h
    ),
    ranks AS (
      SELECT event_type, bucket,
             CASE WHEN regexp_replace(payload, '^0+', '') = '' THEN 53
                  ELSE (length(payload) - length(regexp_replace(payload, '^0+', ''))) * 4
                       + CASE substr(regexp_replace(payload, '^0+', ''), 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                       + 1 END AS rank
      FROM parts
    ),
    regs AS (
      SELECT event_type, bucket, max(rank) AS r
      FROM ranks GROUP BY event_type, bucket
    ),
    agg AS (
      SELECT event_type,
             count(*)::BIGINT AS n_registers,
             sum(power(2.0, -r)) AS sum_pow
      FROM regs GROUP BY event_type
    ),
    ex AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT agg.event_type, agg.n_registers,
           round(CASE WHEN {_HLL_ALPHA_M2!r} / (sum_pow + 256 - n_registers)
                           <= 640 AND n_registers < 256
                      THEN 256 * ln(256.0 / (256 - n_registers))
                      ELSE {_HLL_ALPHA_M2!r} / (sum_pow + 256 - n_registers)
                 END, 6) AS est_distinct,
           ex.exact_distinct
    FROM agg JOIN ex USING (event_type)
    """,
    doc="per-group HLL-256 distinct-user estimation with the estimate "
        "computed in-plan (alpha_256 + linear-counting correction as one "
        "projection over per-group register aggregates, no driver collect) "
        "— the mergeable replacement for groupBy+count_distinct at 100 TB: "
        "max-combinable registers move <= 256 rows per group instead of "
        "every distinct value. Exact counts alongside expose the error",
)
def sketch_hll_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import (
        hll_estimate_col,
        hll_registers_grouped,
    )

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers_grouped(ev, ["event_type"], F.col("user_id"))
    agg = regs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_registers"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("sum_pow"),
    )
    est = agg.select(
        "event_type",
        "n_registers",
        F.round(
            hll_estimate_col(F.col("n_registers"), F.col("sum_pow")), 6
        ).alias("est_distinct"),
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    return est.join(exact, "event_type")


# ---------------------------------------------------------------------------
# Corpus-level line dedup (CCNet / RefinedWeb style): a line that recurs
# across >= 3 distinct documents is boilerplate (headers, nav bars, license
# blurbs) and is dropped from every document. The corpus has no newlines, so
# lines are synthesized as fixed 10-word units — same rule in the oracle;
# the operator under test is the explode → line-frequency → filter →
# order-preserving rebuild chain, verified byte-for-byte via md5.
# ---------------------------------------------------------------------------

@register(
    "text_line_dedup",
    """
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    ln AS (
      SELECT doc_id, s.pos AS pos, s.line AS line
      FROM (
        SELECT doc_id,
               unnest(list_transform(
                 generate_series(0, CAST(ceil(len(w) / 10.0) AS INT) - 1),
                 i -> {'pos': i, 'line': array_to_string(w[i*10+1 : i*10+10], ' ')}))
               AS s
        FROM tok
      )
    ),
    freq AS (SELECT line, count(DISTINCT doc_id) AS df FROM ln GROUP BY line)
    SELECT ln.doc_id,
           count(*)::BIGINT AS n_lines,
           coalesce(sum(CASE WHEN freq.df < 3 THEN 1 END), 0)::BIGINT AS n_kept,
           md5(coalesce(
             string_agg(ln.line, chr(10) ORDER BY ln.pos)
               FILTER (WHERE freq.df < 3),
             '')) AS kept_md5
    FROM ln JOIN freq USING (line)
    GROUP BY ln.doc_id
    """,
    doc="corpus-level duplicated-line removal (CCNet-style boilerplate "
        "filter): explode documents into lines, count distinct-document "
        "frequency per line, drop lines seen in >= 3 docs, rebuild each "
        "document in original line order. One explode + one groupBy(line) + "
        "one join + one groupBy(doc): all equi-key shuffles, no window over "
        "the corpus; the line-frequency table is boilerplate-bounded. "
        "Rebuild md5 proves order-preserving reconstruction exactly",
)
def text_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.lower(F.trim("text")), r"\s+")
    lines = F.transform(
        F.sequence(F.lit(0), F.ceil(F.size(w) / F.lit(10.0)).cast("int") - 1),
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.array_join(F.slice(w, i * 10 + 1, 10), " ").alias("line"),
        ),
    )
    ln = docs.select("doc_id", F.explode(lines).alias("s")).select(
        "doc_id", F.col("s.pos").alias("pos"), F.col("s.line").alias("line")
    )
    freq = ln.groupBy("line").agg(F.count_distinct("doc_id").alias("df"))
    tagged = ln.join(freq, "line")
    kept_sorted = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("df") < 3, F.struct(F.col("pos"), F.col("line")))
            )
        ),
        lambda x: x["line"],
    )
    return tagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.coalesce(F.sum(F.when(F.col("df") < 3, 1)), F.lit(0)).alias("n_kept"),
        F.md5(F.array_join(kept_sorted, "\n").cast("binary")).alias("kept_md5"),
    )


# ---------------------------------------------------------------------------
# Subword tokenization (WordPiece-style greedy inference) — the oracle
# replays the identical greedy longest-prefix segmentation in pure SQL: an
# unrolled 8-step CASE chain (corpus words are <= 8 chars, so 8 single-char
# fallback steps always terminate), applied to DISTINCT words then joined
# back positionally. Both engines therefore derive the same token stream
# from the same static vocabulary, and the md5 comparison is value-exact.
# ---------------------------------------------------------------------------

def _subword_oracle_sql() -> str:
    from etl_consumer_spark.extensions.text_analysis import SUBWORD_VOCAB

    by_len: dict[int, list[str]] = {}
    for v in SUBWORD_VOCAB:
        by_len.setdefault(len(v), []).append(v)

    def case(rest: str) -> str:
        whens = "".join(
            f" WHEN substr({rest}, 1, {n}) IN ({', '.join(repr(v) for v in sorted(vs))})"
            f" THEN substr({rest}, 1, {n})"
            for n, vs in sorted(by_len.items(), reverse=True)
        )
        return f"CASE{whens} ELSE substr({rest}, 1, 1) END"

    # MATERIALIZED: each step references its predecessor twice; DuckDB
    # inlines plain CTEs, which would re-evaluate the whole chain 2^8 times.
    steps = ["t0 AS MATERIALIZED (SELECT word, word AS rest, ''::VARCHAR AS toks FROM ws)"]
    for i in range(8):
        steps.append(f"""
    t{i + 1} AS MATERIALIZED (
      SELECT word, substr(rest, length(tk) + 1) AS rest,
             CASE WHEN toks = '' THEN tk ELSE toks || '|' || tk END AS toks
      FROM (SELECT word, rest, toks, {case('rest')} AS tk
            FROM t{i} WHERE rest <> '')
      UNION ALL
      SELECT word, rest, toks FROM t{i} WHERE rest = ''
    )""")
    return f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    ws AS (SELECT DISTINCT unnest(w) AS word FROM tok),
    {', '.join(steps)},
    seg AS (SELECT word, toks FROM t8 WHERE rest = ''),
    docw AS (
      SELECT doc_id, s.pos AS pos, s.word AS word
      FROM (
        SELECT doc_id,
               unnest(list_transform(generate_series(1, len(w)),
                                     i -> {{'pos': i, 'word': w[i]}})) AS s
        FROM tok
      )
    )
    SELECT docw.doc_id,
           sum(length(seg.toks) - length(replace(seg.toks, '|', '')) + 1)::BIGINT
             AS n_subwords,
           md5(string_agg(seg.toks, '|' ORDER BY docw.pos)) AS subword_md5
    FROM docw JOIN seg USING (word)
    GROUP BY docw.doc_id
    """


@register(
    "text_subword_tokenize",
    _subword_oracle_sql(),
    doc="greedy longest-prefix subword tokenization (WordPiece inference, "
        "Wu et al. '16) against a fixed fragment vocabulary, with 1-char "
        "fallback — the per-row half of a learned tokenizer. Spark side is "
        "an Arrow-batched mapInPandas with per-batch word memoization "
        "(cost ~ distinct words, not tokens); map-only, no shuffle, linear "
        "at 100 TB. Verified token-stream-exact (md5 over every subword in "
        "order) against an unrolled pure-SQL replay of the same greedy walk",
)
def text_subword_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.text_analysis import subword_tokenize

    docs = load_table(spark, sf_dir, "documents")
    return subword_tokenize(docs, "doc_id", "text")


# ---------------------------------------------------------------------------
# SCD Type-2 history (warehouse-side companion to the destructive CDC apply:
# reference main.go:348-380 keeps only the latest image; this keeps every
# version with a validity interval so point-in-time joins stay answerable)
# ---------------------------------------------------------------------------

@register(
    "cdc_scd2_history",
    """
    WITH ev AS (
      SELECT o_orderkey, o_totalprice,
             unnest(generate_series(0, o_orderkey % 3)) AS version
      FROM orders
    ),
    v AS (
      SELECT o_orderkey,
             CAST(version AS BIGINT) AS version,
             o_totalprice + 100 * version AS price,
             CAST((version + 1) * 1000 AS BIGINT) AS ts_ms
      FROM ev
    )
    SELECT o_orderkey, version, price,
           ts_ms AS valid_from,
           lead(ts_ms) OVER w AS valid_to,
           lead(ts_ms) OVER w IS NULL AS is_current
    FROM v
    WINDOW w AS (PARTITION BY o_orderkey ORDER BY ts_ms)
    """,
    doc="SCD Type-2 dimension build from a CDC change log (Kimball Type 2): "
        "every change event opens a version at its commit timestamp, the "
        "prior version closes at exactly that timestamp (half-open "
        "intervals, no gaps/overlaps), newest version per key is_current. "
        "One shuffle on the business key + a single lead() per row — no "
        "self-join; the minimal distributed interval-construction shape",
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.scd import scd2_history

    orders = load_table(spark, sf_dir, "orders")
    versions = F.sequence(F.lit(0), (F.col("o_orderkey") % 3).cast("int"))
    ev = orders.select(
        "o_orderkey", "o_totalprice", F.explode(versions).alias("version")
    ).select(
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
        (F.col("o_totalprice") + 100 * F.col("version")).alias("price"),
        ((F.col("version") + 1) * 1000).cast("long").alias("ts_ms"),
    )
    hist = scd2_history(ev, ["o_orderkey"], "ts_ms")
    return hist.select(
        "o_orderkey", "version", "price", "valid_from", "valid_to", "is_current"
    )


# ---------------------------------------------------------------------------
# Unpivot (wide -> long melt, the inverse of olap_pivot; Spark's
# DataFrame.unpivot lowers to a single generator Expand — map-only)
# ---------------------------------------------------------------------------

@register(
    "olap_unpivot",
    """
    WITH w AS (
      SELECT n_name,
             CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O'
                               THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS rev_O,
             CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F'
                               THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS rev_F,
             CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P'
                               THEN CAST(round(o_totalprice * 100) AS BIGINT) END), 0) AS BIGINT) AS rev_P
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
    )
    SELECT n_name, 'O' AS o_orderstatus, rev_O AS revenue_cents FROM w
    UNION ALL
    SELECT n_name, 'F' AS o_orderstatus, rev_F AS revenue_cents FROM w
    UNION ALL
    SELECT n_name, 'P' AS o_orderstatus, rev_P AS revenue_cents FROM w
    """,
    doc="unpivot (melt): per-nation order-status revenue computed wide "
        "(conditional aggregates) then melted back to long form with "
        "DataFrame.unpivot — the inverse of olap_pivot, completing the "
        "reshape surface. Unpivot lowers to one generator Expand node "
        "(map-only, no shuffle); integer-cents for exactness",
)
def olap_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    wide = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("o_orderstatus") == s, cents)), F.lit(0)
                ).alias(f"rev_{s}")
                for s in ("O", "F", "P")
            ]
        )
    )
    long = wide.unpivot(
        ["n_name"], ["rev_O", "rev_F", "rev_P"], "status_col", "revenue_cents"
    )
    return long.select(
        "n_name",
        F.substring("status_col", 5, 1).alias("o_orderstatus"),
        "revenue_cents",
    )


# ---------------------------------------------------------------------------
# Schema evolution across parquet batches (a 100 TB corpus is written over
# months; later batches add columns. mergeSchema unifies the footers at
# planning time — old files surface NULL for new columns, no rewrite)
# ---------------------------------------------------------------------------

@register(
    "source_schema_evolution",
    """
    WITH m AS (
      SELECT o_orderkey, o_custkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey % 2 = 1
    )
    SELECT coalesce(o_orderstatus, '<missing>') AS status,
           count(*) AS n,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
    FROM m GROUP BY coalesce(o_orderstatus, '<missing>')
    """,
    doc="parquet schema evolution: batch 1 written without o_orderstatus, "
        "batch 2 written with it (the column added mid-corpus), read back "
        "as ONE dataset via mergeSchema=true — footer-level schema union at "
        "planning time, old files yield NULL for the new column, zero data "
        "rewrite. Aggregate proves the merged read is value-exact. At "
        "100 TB this is how a column lands in a live corpus without a "
        "backfill pass",
)
def source_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    base = tempfile.mkdtemp(prefix="schema_evo_")
    orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    ).write.mode("overwrite").parquet(base + "/b1")
    orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    ).write.mode("overwrite").parquet(base + "/b2")
    merged = spark.read.option("mergeSchema", "true").parquet(
        base + "/b1", base + "/b2"
    )
    return merged.groupBy(
        F.coalesce("o_orderstatus", F.lit("<missing>")).alias("status")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents"),
    )


# ---------------------------------------------------------------------------
# Graph: triangle counting (degree-ordered orientation) and multi-source BFS
# — link-graph structure metrics for web-corpus curation (clustering
# coefficient numerators; crawl-frontier reachability)
# ---------------------------------------------------------------------------

@register(
    "graph_triangle_count",
    """
    WITH raw AS (
      SELECT DISTINCT least(o_custkey % 400, o_orderkey % 400) AS a,
             greatest(o_custkey % 400, o_orderkey % 400) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 400 <> o_orderkey % 400
    ),
    tri AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM raw e1
      JOIN raw e2 ON e2.a = e1.b
      JOIN raw e3 ON e3.a = e1.a AND e3.b = e2.b
    ),
    m AS (
      SELECT x AS node FROM tri
      UNION ALL SELECT y FROM tri
      UNION ALL SELECT z FROM tri
    )
    SELECT node, count(*)::BIGINT AS n_triangles FROM m GROUP BY node
    """,
    doc="per-node triangle counts over a key-derived undirected graph. "
        "Engine orients each edge from its lower-(degree, id) endpoint "
        "(Suri & Vassilvitskii WWW'11), bounding every node's out-degree by "
        "O(sqrt(m)) so the wedge join never explodes on hubs — the "
        "curse-of-the-last-reducer fix that makes triangle counting viable "
        "on power-law web graphs. Orientation changes intermediate sizes, "
        "never results, so the plain a<b<c SQL oracle validates it exactly",
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.graph import triangle_counts

    orders = load_table(spark, sf_dir, "orders")
    edges = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_custkey") % 400).alias("src"),
        (F.col("o_orderkey") % 400).alias("dst"),
    )
    return triangle_counts(edges)


@register(
    "graph_bfs_reachability",
    """
    WITH RECURSIVE e AS (
      SELECT DISTINCT l_suppkey AS src, l_partkey % 100 AS dst FROM lineitem
    ),
    nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
    walk(node, dist) AS (
      SELECT node, CAST(0 AS BIGINT) AS dist FROM nodes WHERE node % 25 = 0
      UNION
      SELECT e.dst, w.dist + 1 FROM walk w JOIN e ON e.src = w.node
      WHERE w.dist < 4
    )
    SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM walk GROUP BY node
    """,
    doc="multi-source BFS hop distances (crawl-frontier reachability) over "
        "the supplier->part graph, seeds = nodes % 25 == 0, 4 hops. Engine "
        "runs the frontier iteration: per round one edges-join of ONLY the "
        "newly-discovered frontier plus one anti-join against the known "
        "set, with localCheckpoint truncating lineage so round N's plan "
        "does not re-expand rounds 1..N-1. All-integer; the oracle replays "
        "it as a recursive CTE and min(dist) per node must match exactly",
)
def graph_bfs_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.graph import bfs_hops

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") % 100).alias("dst"),
    ).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    sources = nodes.filter(F.col("node") % 25 == 0)
    return bfs_hops(edges, sources, max_hops=4)


# ---------------------------------------------------------------------------
# Quantized k-means (Lloyd) — the oracle replays the ENTIRE iterative loop
# unrolled: integer quantization makes every distance and centroid update
# order-free and bit-reproducible, so the "k-means is not SQL-checkable"
# limitation (deterministic_centroids docstring) falls away.
# ---------------------------------------------------------------------------

def _kmeans_centroid_ctes(k: int = 8, dim: int = 64, iterations: int = 2):
    """CTE chain replaying the quantized Lloyd loop; returns (parts, final)
    where ``final`` is the name of the last centroid-dims CTE (cl, pos,
    cval) — reused by the IVF-with-kmeans oracle."""
    parts = [
        """q AS MATERIALIZED (
      SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qv
      FROM embeddings
    )""",
        f"""qdim AS MATERIALIZED (
      SELECT id, u.pos AS pos, qv[u.pos] AS val
      FROM q, unnest(generate_series(1, {dim})) AS u(pos)
    )""",
        f"c0dim AS (SELECT id AS cl, pos, val AS cval FROM qdim WHERE id < {k})",
    ]
    for i in range(iterations):
        parts.append(f"""d{i} AS (
      SELECT q.id, c.cl, sum((q.val - c.cval) * (q.val - c.cval)) AS d2
      FROM qdim q JOIN c{i}dim c USING (pos) GROUP BY q.id, c.cl
    )""")
        parts.append(f"""a{i} AS MATERIALIZED (
      SELECT id, cl FROM (
        SELECT id, cl, row_number() OVER (PARTITION BY id ORDER BY d2, cl) AS rn
        FROM d{i}) t
      WHERE rn = 1
    )""")
        parts.append(f"""u{i} AS (
      SELECT a.cl, q.pos,
             CAST(floor(CAST(sum(q.val) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      FROM a{i} a JOIN qdim q USING (id) GROUP BY a.cl, q.pos
    )""")
        parts.append(f"""c{i + 1}dim AS MATERIALIZED (
      SELECT p.cl, p.pos, coalesce(u.cval, p.cval) AS cval
      FROM c{i}dim p LEFT JOIN u{i} u ON u.cl = p.cl AND u.pos = p.pos
    )""")
    return parts, f"c{iterations}dim"


def _kmeans_oracle_sql(k: int = 8, dim: int = 64, iterations: int = 2) -> str:
    parts, final = _kmeans_centroid_ctes(k, dim, iterations)
    parts = list(parts)
    parts.append(f"""dfin AS (
      SELECT q.id, c.cl, sum((q.val - c.cval) * (q.val - c.cval)) AS d2
      FROM qdim q JOIN {final} c USING (pos) GROUP BY q.id, c.cl
    )""")
    parts.append("""afin AS (
      SELECT id, cl, d2 FROM (
        SELECT id, cl, d2, row_number() OVER (PARTITION BY id ORDER BY d2, cl) AS rn
        FROM dfin) t
      WHERE rn = 1
    )""")
    return f"""
    WITH {', '.join(parts)}
    SELECT cl, count(*)::BIGINT AS n_members, CAST(sum(d2) AS BIGINT) AS inertia,
           CAST(min(id) AS BIGINT) AS min_member_id
    FROM afin GROUP BY cl
    """


@register(
    "sim_kmeans_lloyd",
    _kmeans_oracle_sql(),
    doc="deterministic quantized k-means (2 Lloyd iterations, k=8) over the "
        "embedding corpus: vectors quantized to integers, distances exact "
        "integer sums, centroid update floor(sum/count) per dim — every "
        "iteration bit-reproducible, so the SQL oracle replays the whole "
        "unrolled loop and value-matches per-cluster sizes AND inertia. "
        "The semantic-clustering step SemDeDup-style curation and IVF "
        "coarse quantizers (Jegou PAMI'11) need. Per iteration: centroids "
        "broadcast as literals (k*d ints), map-only argmin assignment, one "
        "posexplode+groupBy(cl,pos) update with map-side combine — driver "
        "traffic bounded at k*d regardless of corpus size",
)
def sim_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.similarity import kmeans_lloyd_quantized

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = kmeans_lloyd_quantized(emb, k=8, iterations=2, scale=1000)
    return assigned.groupBy("cl").agg(
        F.count("*").cast("long").alias("n_members"),
        F.sum("d2").cast("long").alias("inertia"),
        F.min("id").cast("long").alias("min_member_id"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03 — MOSS)
# ---------------------------------------------------------------------------

@register(
    "text_winnow_fingerprint",
    r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS wds
      FROM documents
    ),
    kg AS (
      SELECT doc_id, u.i AS pos,
             ('0x' || substr(md5(array_to_string(wds[u.i : u.i + 3], ' ')), 1, 12))::BIGINT AS h
      FROM tok, unnest(generate_series(1, len(wds) - 3)) AS u(i)
      WHERE len(wds) >= 4
    ),
    win AS (
      SELECT a.doc_id, b.pos AS p, b.h,
             row_number() OVER (PARTITION BY a.doc_id, a.pos
                                ORDER BY b.h, b.pos DESC) AS rn
      FROM kg a JOIN kg b
        ON b.doc_id = a.doc_id AND b.pos BETWEEN a.pos AND a.pos + 4
    ),
    sel AS (SELECT DISTINCT doc_id, p AS pos, h FROM win WHERE rn = 1)
    SELECT doc_id AS id, count(*)::BIGINT AS n_fingerprints,
           md5(string_agg(CAST(h AS VARCHAR), ',' ORDER BY pos)) AS fp_md5
    FROM sel GROUP BY doc_id
    """,
    doc="winnowing fingerprints (Schleimer et al. SIGMOD'03, the MOSS "
        "scheme): hash 4-word grams, slide a 5-gram window, keep the "
        "rightmost minimal hash per window — guaranteed shared fingerprint "
        "for any sufficiently long shared run at ~2/(w+1) density. Engine "
        "does ONE window-frame pass per doc (min over (hash,-pos) structs, "
        "O(n) per doc); the oracle replays the selection with the "
        "quadratic join formulation — same set by construction, verified "
        "md5-exact over the position-ordered fingerprint sequence",
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.text_analysis import winnow_fingerprints

    docs = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(docs, "doc_id", "text", k=4, w=5)


# ---------------------------------------------------------------------------
# Sequence packing (concat-then-chunk GPT-style pretraining contexts)
# ---------------------------------------------------------------------------

@register(
    "sample_pack_contexts",
    r"""
    WITH t AS (
      SELECT doc_id AS id,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\s+')) END AS n
      FROM documents
    ),
    g AS (
      SELECT id, n,
             CAST(sum(n) OVER (ORDER BY id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM t WHERE n > 0
    ),
    s AS (SELECT id, n, cum - n AS strt, cum AS en FROM g),
    sp AS (
      SELECT id, strt, en,
             unnest(generate_series(strt // 512, (en - 1) // 512)) AS ctx_id
      FROM s
    )
    SELECT ctx_id, count(*)::BIGINT AS n_docs,
           CAST(sum(least((ctx_id + 1) * 512, en) - greatest(ctx_id * 512, strt))
                AS BIGINT) AS n_tokens
    FROM sp GROUP BY ctx_id
    """,
    doc="sequence packing: concatenate documents in id order, split the "
        "token stream into fixed 512-token training contexts (the "
        "concat-then-chunk packing GPT-style pretraining uses — zero "
        "padding waste, docs span boundaries). The global prefix sum is "
        "built WITHOUT a global window: range-bucket by id, cumsum within "
        "each bucket partition, broadcast the n_buckets bucket offsets — "
        "the two-level distributed prefix-sum shape; the oracle uses the "
        "single-threaded running sum and must match exactly",
)
def sample_pack_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import pack_contexts

    docs = load_table(spark, sf_dir, "documents")
    return pack_contexts(docs, "doc_id", "text", ctx_tokens=512, n_buckets=32)


# ---------------------------------------------------------------------------
# DSIR importance weights (Xie et al. '23: hashed-feature log-likelihood
# ratio target vs raw — data selection for language models)
# ---------------------------------------------------------------------------

@register(
    "text_dsir_importance",
    r"""
    WITH tok AS (
      SELECT doc_id, lang, string_split_regex(lower(trim(text)), '\s+') AS w
      FROM documents
    ),
    f AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(word), 1, 8))::BIGINT % 256 AS b
      FROM (SELECT doc_id, lang, unnest(w) AS word FROM tok)
    ),
    ct AS (SELECT b, count(*) AS c FROM f WHERE lang = 'en' GROUP BY b),
    cr AS (SELECT b, count(*) AS c FROM f GROUP BY b),
    tt AS (SELECT count(*) AS t FROM f WHERE lang = 'en'),
    tr AS (SELECT count(*) AS r FROM f),
    scored AS (
      SELECT f.doc_id,
             ln((coalesce(ct.c, 0) + 1)::DOUBLE / (tt.t + 256)) -
             ln((cr.c + 1)::DOUBLE / (tr.r + 256)) AS lw
      FROM f LEFT JOIN ct USING (b) JOIN cr USING (b)
      CROSS JOIN tt CROSS JOIN tr
    )
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           round(avg(lw), 6) AS avg_importance
    FROM scored GROUP BY doc_id
    """,
    doc="DSIR importance weights (Xie et al. NeurIPS'23): per-token hashed "
        "unigram features (md5 mod 256), importance = mean log-likelihood "
        "ratio of the add-one-smoothed target distribution (lang='en' "
        "slice) vs the raw corpus — the data-selection score used to "
        "resample raw crawls toward a target domain. Both count tables are "
        "bucket-bounded (256 rows, corpus-size-independent) so they "
        "broadcast; scoring is one map-side join + one groupBy(doc). Same "
        "round(avg,6) determinism contract as text_bigram_lm",
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    )
    f = tok.select(
        "doc_id", "lang", F.explode("w").alias("word")
    ).select(
        "doc_id",
        "lang",
        (F.conv(F.substring(F.md5("word"), 1, 8), 16, 10).cast("long") % 256).alias("b"),
    )
    ct = f.filter(F.col("lang") == "en").groupBy("b").agg(F.count("*").alias("c_t"))
    cr = f.groupBy("b").agg(F.count("*").alias("c_r"))
    tt = f.filter(F.col("lang") == "en").agg(F.count("*").alias("t"))
    tr = f.agg(F.count("*").alias("r"))
    scored = (
        f.join(F.broadcast(ct), "b", "left")
        .join(F.broadcast(cr), "b")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select(
            "doc_id",
            (
                F.log((F.coalesce(F.col("c_t"), F.lit(0)) + 1).cast("double") / (F.col("t") + 256))
                - F.log((F.col("c_r") + 1).cast("double") / (F.col("r") + 256))
            ).alias("lw"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg("lw"), 6).alias("avg_importance"),
    )


# ---------------------------------------------------------------------------
# Streaming SCD2: incremental Type-2 history maintenance across micro-batches
# ---------------------------------------------------------------------------

@register(
    "stream_scd2_history",
    """
    WITH ev AS (
      SELECT o_orderkey, o_totalprice,
             unnest(generate_series(0, o_orderkey % 3)) AS version
      FROM orders
    ),
    v AS (
      SELECT o_orderkey,
             CAST(version AS BIGINT) AS version,
             o_totalprice + 100 * version AS price,
             CAST((version + 1) * 1000 AS BIGINT) AS ts_ms
      FROM ev
    )
    SELECT o_orderkey, version, price,
           ts_ms AS valid_from,
           lead(ts_ms) OVER w AS valid_to,
           lead(ts_ms) OVER w IS NULL AS is_current
    FROM v
    WINDOW w AS (PARTITION BY o_orderkey ORDER BY ts_ms)
    """,
    doc="INCREMENTAL SCD Type-2: the same history table cdc_scd2_history "
        "builds in one batch pass, maintained across TWO micro-batches in "
        "a Structured Streaming foreachBatch (streaming/scd2.py) — batch 2 "
        "must CLOSE the current versions batch 1 committed. History store "
        "is range-bucketed on the business key, so cross-batch closing "
        "reads each touched key's version chain from one pruned bucket "
        "(read_leading_range) and the staged upsert rewrites only touched "
        "buckets: per-batch cost ~ batch, not history. Same oracle as the "
        "batch query — the incremental path must converge to it exactly",
)
def stream_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore
    from etl_consumer_spark.streaming.scd2 import SCD2StreamMaintainer

    orders = load_table(spark, sf_dir, "orders")
    versions = F.sequence(F.lit(0), (F.col("o_orderkey") % 3).cast("int"))
    ev = orders.select(
        "o_orderkey", "o_totalprice", F.explode(versions).alias("version")
    ).select(
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
        (F.col("o_totalprice") + 100 * F.col("version")).alias("price"),
        ((F.col("version") + 1) * 1000).cast("long").alias("ts_ms"),
    )
    base = tempfile.mkdtemp(prefix="stream_scd2_")
    # two appends -> two files -> two sequential micro-batches: batch 2
    # carries the later versions that must close batch 1's current rows
    seen: set[str] = set()
    ev.filter(F.col("version") == 0).coalesce(1).write.mode("append").parquet(
        f"{base}/events"
    )
    _pin_batch_order(f"{base}/events", seen, 1)
    ev.filter(F.col("version") >= 1).coalesce(1).write.mode("append").parquet(
        f"{base}/events"
    )
    _pin_batch_order(f"{base}/events", seen, 2)
    store = PartitionedParquetStateStore(spark, f"{base}/state")
    m = SCD2StreamMaintainer(
        store, "orders_hist", "o_orderkey", "ts_ms",
        payload_cols=["version", "price"], key_range_size=2048,
    )
    m.seed(ev)
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", "1"
    ).parquet(f"{base}/events")
    q = (
        stream.writeStream.foreachBatch(m.foreach_batch())
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    hist = store.read("orders_hist")
    return hist.select(
        "o_orderkey", "version", "price", "valid_from", "valid_to", "is_current"
    )


# ---------------------------------------------------------------------------
# BOM explosion (weighted transitive closure) — level-wise sum-of-products
# ---------------------------------------------------------------------------

@register(
    "graph_bom_explosion",
    """
    WITH RECURSIVE e AS (
      SELECT least(a, b) AS parent, greatest(a, b) AS child,
             CAST(max(q) AS BIGINT) AS qty
      FROM (
        SELECT l_partkey % 600 AS a, l_orderkey % 600 AS b, l_linenumber AS q
        FROM lineitem WHERE (l_partkey + l_orderkey) % 29 = 0
      ) t
      WHERE a <> b GROUP BY least(a, b), greatest(a, b)
    ),
    walk(node, q, d) AS (
      SELECT CAST(r AS BIGINT) AS node, CAST(1 AS BIGINT) AS q, 0 AS d
      FROM (SELECT unnest(generate_series(0, 4)) AS r) roots
      UNION ALL
      SELECT e.child, w.q * e.qty, w.d + 1
      FROM walk w JOIN e ON e.parent = w.node
      WHERE w.d < 3
    )
    SELECT node, CAST(sum(q) AS BIGINT) AS total_qty FROM walk GROUP BY node
    """,
    doc="BOM explosion / weighted transitive closure over a key-derived "
        "DAG (edges oriented low->high = acyclic by construction): total "
        "requirement per node = sum over root paths of the product of "
        "edge quantities, depth <= 3. Engine aggregates LEVEL-WISE — "
        "sum-of-products distributes over path concatenation, so each "
        "round collapses to <= |nodes| rows before the next join, while "
        "path counts grow combinatorially. The oracle deliberately "
        "ENUMERATES every path with a recursive CTE, validating the "
        "algebraic collapse against the definition. All-integer, exact",
)
def graph_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.graph import weighted_path_aggregate

    li = load_table(spark, sf_dir, "lineitem")
    raw = li.filter((F.col("l_partkey") + F.col("l_orderkey")) % 29 == 0).select(
        (F.col("l_partkey") % 600).alias("a"),
        (F.col("l_orderkey") % 600).alias("b"),
        F.col("l_linenumber").alias("q"),
    )
    edges = (
        raw.filter(F.col("a") != F.col("b"))
        .groupBy(
            F.least("a", "b").alias("parent"), F.greatest("a", "b").alias("child")
        )
        .agg(F.max("q").cast("long").alias("qty"))
    )
    roots = spark.range(5).select(F.col("id").alias("node"))
    return weighted_path_aggregate(edges, roots, max_depth=3)


# ---------------------------------------------------------------------------
# TIFF 6.0 strip decode (multimodal breadth: the uncompressed-strip +
# IFD-walk container family, alongside PPM/BMP/PNG/JPEG/GIF/WAV/AVI)
# ---------------------------------------------------------------------------

@register(
    "mm_tiff_features",
    f"""
    WITH {_MM_RASTER_CTE},
    px AS (
      SELECT doc_id, w, ascii(substr(ras, u.i, 1)) AS v, length(ras) AS n
      FROM r, unnest(generate_series(1, length(ras))) AS u(i)
    )
    SELECT doc_id AS media_id,
           sum(v) / n AS mean_px,
           sqrt(sum(v * v) / n - (sum(v) / n) * (sum(v) / n)) AS std_px,
           (max(w) * 12)::BIGINT AS n_px
    FROM px GROUP BY doc_id, n
    """,
    doc="multimodal: feature extraction through a REAL pure-Python TIFF "
        "6.0 decode (little-endian IFD walk, bounds-checked tag arrays, "
        "MULTI-strip reassembly with RowsPerStrip=2) — same deterministic "
        "raster as the GIF twin laid out one gray pixel per byte, so the "
        "shared SQL oracle value-checks the strip path end-to-end. "
        "Uncompressed strips are lossless; public Adobe TIFF 6.0 spec",
)
def mm_tiff_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_tiff_media_table(docs, "doc_id", "text")
    return M.extract_image_features(media)


# ---------------------------------------------------------------------------
# Winnowing overlap pairs — the MOSS use case: shared fingerprints -> pairs
# ---------------------------------------------------------------------------

@register(
    "dedup_winnow_pairs",
    r"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS wds
      FROM documents
    ),
    kg AS (
      SELECT doc_id, u.i AS pos,
             ('0x' || substr(md5(array_to_string(wds[u.i : u.i + 3], ' ')), 1, 12))::BIGINT AS h
      FROM tok, unnest(generate_series(1, len(wds) - 3)) AS u(i)
      WHERE len(wds) >= 4
    ),
    win AS (
      SELECT a.doc_id, b.pos AS p, b.h,
             row_number() OVER (PARTITION BY a.doc_id, a.pos
                                ORDER BY b.h, b.pos DESC) AS rn
      FROM kg a JOIN kg b
        ON b.doc_id = a.doc_id AND b.pos BETWEEN a.pos AND a.pos + 4
    ),
    sel AS (SELECT DISTINCT doc_id, h FROM win WHERE rn = 1),
    hcnt AS (SELECT h, count(*) AS df FROM sel GROUP BY h),
    cand AS (SELECT h FROM hcnt WHERE df BETWEEN 2 AND 16)
    SELECT s1.doc_id AS doc_a, s2.doc_id AS doc_b,
           count(*)::BIGINT AS shared_fps
    FROM sel s1
    JOIN cand USING (h)
    JOIN sel s2 USING (h)
    WHERE s1.doc_id < s2.doc_id
    GROUP BY s1.doc_id, s2.doc_id
    HAVING count(*) >= 2
    """,
    doc="winnowing overlap detection (the MOSS workflow): documents "
        "sharing >= 2 selected fingerprints are overlap candidates — the "
        "SIGMOD'03 guarantee makes this catch every shared run of >= "
        "w+k-1 words while storing only ~2/(w+1) of the gram hashes. "
        "Hot-fingerprint cap (df <= 16) before the self-join bounds the "
        "pair expansion exactly like the capped-LSH dedup paths — "
        "boilerplate fingerprints shared by everything never explode the "
        "join. One groupBy(h) + one bounded equi-join + one groupBy(pair)",
)
def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.text_analysis import winnow_selections

    docs = load_table(spark, sf_dir, "documents")
    # materialize once: three consumers (frequency count + both join sides)
    # would each re-run the whole winnowing pipeline — no cross-branch CSE
    sel = (
        winnow_selections(docs, "doc_id", "text", k=4, w=5)
        .select("id", "h")
        .distinct()
        .localCheckpoint(eager=True)
    )
    hcnt = sel.groupBy("h").agg(F.count("*").alias("df"))
    cand = hcnt.filter((F.col("df") >= 2) & (F.col("df") <= 16)).select("h")
    s1 = sel.join(cand, "h").select(F.col("h"), F.col("id").alias("doc_a"))
    s2 = sel.join(cand, "h").select(F.col("h"), F.col("id").alias("doc_b"))
    return (
        s1.join(s2, "h")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("shared_fps"))
        .filter(F.col("shared_fps") >= 2)
    )


# ---------------------------------------------------------------------------
# Trained IVF: k-means centroids as the coarse quantizer (the IVF-PQ
# composition — Jegou PAMI'11 trains exactly this)
# ---------------------------------------------------------------------------

def _ivf_kmeans_oracle_sql() -> str:
    parts, final = _kmeans_centroid_ctes(k=8, dim=64, iterations=2)
    parts = list(parts)
    parts.append(f"""ckm AS (
      SELECT cl AS cid,
             list_transform(list(cval ORDER BY pos), v -> v / 1000.0) AS cvec
      FROM {final} GROUP BY cl
    )""")
    parts.append("q0 AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100)")
    parts.append(f"""qp_scored AS (
      SELECT q.vec_id, c.cid, {_cos_sql('q.embedding', 'c.cvec')} AS csim
      FROM q0 q, ckm c
    )""")
    parts.append("""qprobe AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        FROM qp_scored) t WHERE rn <= 3
    )""")
    parts.append(f"""ca_scored AS (
      SELECT e.vec_id, e.embedding, c.cid, {_cos_sql('e.embedding', 'c.cvec')} AS csim
      FROM embeddings e, ckm c
    )""")
    parts.append("""cassign AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT vec_id, embedding, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        FROM ca_scored) t WHERE rn = 1
    )""")
    parts.append(f"""scored AS (
      SELECT qp.vec_id AS query_id, ca.vec_id AS neighbor_id,
             {_cos_sql('qe.embedding', 'ca.embedding')} AS cos_sim
      FROM qprobe qp
      JOIN cassign ca ON ca.cid = qp.cid AND ca.vec_id <> qp.vec_id
      JOIN q0 qe ON qe.vec_id = qp.vec_id
    )""")
    return f"""
    WITH {', '.join(parts)},
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 3
    """


@register(
    "sim_ivf_kmeans_rerank",
    _ivf_kmeans_oracle_sql(),
    doc="TRAINED IVF: the quantized-k-means centroids (sim_kmeans_lloyd, "
        "dequantized) replace the first-n coarse quantizer of "
        "sim_ivf_rerank — the composition IVF-PQ systems actually train "
        "(Jegou PAMI'11). Probe the 3 nearest trained clusters (of 8), "
        "exact cosine rerank for top-3. The oracle replays the ENTIRE "
        "stack: the unrolled Lloyd loop, centroid dequantization, cosine "
        "cluster assignment, multi-probe, and rerank — value-exact "
        "end-to-end. Same scale shape as sim_ivf_rerank (centroids "
        "broadcast, candidate pool bounded by n_probe/n_clusters)",
)
def sim_ivf_kmeans_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    cents = S.kmeans_centroids(emb, k=8, iterations=2, scale=1000)
    cents_df = spark.createDataFrame(
        [(j, [v / 1000.0 for v in c]) for j, c in enumerate(cents)],
        "cid long, cvec array<double>",
    )
    queries = emb.filter(F.col("vec_id") < 100)
    return S.knn_ivf_rerank(
        queries, emb, n_probe=3, k=3, centroids=F.broadcast(cents_df)
    )


# ---------------------------------------------------------------------------
# Point-in-time join against SCD2 history ("what did this row look like at
# time T?" — the question the history table exists to answer)
# ---------------------------------------------------------------------------

@register(
    "analytic_pit_join",
    """
    WITH ev AS (
      SELECT o_orderkey, o_totalprice,
             unnest(generate_series(0, o_orderkey % 3)) AS version
      FROM orders
    ),
    v AS (
      SELECT o_orderkey,
             CAST(version AS BIGINT) AS version,
             o_totalprice + 100 * version AS price,
             CAST((version + 1) * 1000 AS BIGINT) AS ts_ms
      FROM ev
    ),
    h AS (
      SELECT o_orderkey, version, price,
             ts_ms AS valid_from,
             lead(ts_ms) OVER w AS valid_to
      FROM v
      WINDOW w AS (PARTITION BY o_orderkey ORDER BY ts_ms)
    ),
    p AS (
      SELECT o_orderkey,
             CAST(((o_orderkey % 4) + 1) * 1000 + 500 AS BIGINT) AS probe_ts
      FROM orders
    )
    SELECT p.o_orderkey, p.probe_ts, h.version, h.price
    FROM p JOIN h ON h.o_orderkey = p.o_orderkey
      AND h.valid_from <= p.probe_ts
      AND (h.valid_to IS NULL OR p.probe_ts < h.valid_to)
    """,
    doc="point-in-time join: each probe timestamp resolves to the SCD2 "
        "version valid at that instant — the query the history table "
        "exists to answer (reproducible training snapshots, 'as of' "
        "feature lookups). Engine composes scd2_history with the as-of "
        "join operator (union+carry-forward, one key shuffle — no range "
        "self-join); the oracle uses the interval-predicate formulation. "
        "Half-open intervals make every probe match exactly one version",
)
def analytic_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.analytic import asof_join
    from etl_consumer_spark.operators.scd import scd2_history

    orders = load_table(spark, sf_dir, "orders")
    versions = F.sequence(F.lit(0), (F.col("o_orderkey") % 3).cast("int"))
    ev = orders.select(
        "o_orderkey", "o_totalprice", F.explode(versions).alias("version")
    ).select(
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
        (F.col("o_totalprice") + 100 * F.col("version")).alias("price"),
        ((F.col("version") + 1) * 1000).cast("long").alias("ts_ms"),
    )
    hist = scd2_history(ev, ["o_orderkey"], "ts_ms").select(
        F.col("o_orderkey").alias("k"), "version", "price",
        F.col("valid_from").alias("vf"),
    )
    probes = orders.select(
        F.col("o_orderkey").alias("k"),
        (((F.col("o_orderkey") % 4) + 1) * 1000 + 500).cast("long").alias("probe_ts"),
    )
    out = asof_join(
        probes, hist, key="k", left_ts="probe_ts", right_ts="vf",
        payload_cols=["version", "price"],
    )
    return out.select(
        F.col("k").alias("o_orderkey"), "probe_ts", "version", "price"
    )


# ---------------------------------------------------------------------------
# Deployable streaming SCD2: the ENVELOPE pipeline (parse -> route ->
# decode -> apply) with scd2_tables enabled, history read back — the
# registry record for the SCD2_TABLES runner feature
# ---------------------------------------------------------------------------

@register(
    "stream_cdc_scd2",
    """
    SELECT o_orderkey,
           o_totalprice AS o_totalprice,
           CAST(1 AS BIGINT) AS valid_from,
           CASE WHEN o_orderkey % 3 IN (0, 1) THEN CAST(2 AS BIGINT) END AS valid_to,
           o_orderkey % 3 = 2 AS is_current
    FROM orders
    UNION ALL
    SELECT o_orderkey, o_totalprice + 1000.0, CAST(2 AS BIGINT), NULL, true
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="the DEPLOYABLE streaming-SCD2 path end-to-end: Debezium JSON "
        "envelopes ride the file transport through the full pipeline "
        "(parse -> route -> decode -> apply) with scd2_tables enabled, "
        "TWO micro-batches (inserts, then updates+deletes) — batch 2 "
        "closes batch 1's versions, deletes close without reopening, and "
        "the history table read back must match the oracle exactly. This "
        "is the registry record for the runner's SCD2_TABLES feature",
)
def stream_cdc_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_consumer_spark.config import Config
    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore
    from etl_consumer_spark.sources.envelope import WireField
    from etl_consumer_spark.sources.kafka import file_envelope_stream
    from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    img_t = "struct<o_orderkey:long,o_totalprice:double>"
    row_img = F.struct("o_orderkey", "o_totalprice")
    upd_img = F.struct(
        F.col("o_orderkey"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )

    def env(before, after, pos):
        return F.to_json(
            F.struct(
                F.struct(
                    before.alias("before"),
                    after.alias("after"),
                    F.struct(
                        F.lit("srv").alias("name"),
                        F.lit("db0").alias("db"),
                        F.lit("orders").alias("table"),
                        pos.alias("pos"),
                        F.lit(0).alias("row"),
                    ).alias("source"),
                    F.lit("c").alias("op"),
                    F.lit(0).cast("long").alias("ts_ms"),
                ).alias("payload")
            )
        )

    def transport_rows(value_col):
        return F.struct(
            F.lit("srv.db0.orders").alias("topic"),
            value_col.cast("binary").alias("value"),
            F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
            F.lit(None).cast("timestamp").alias("timestamp"),
        )

    null_img = F.lit(None).cast(img_t)
    b1 = orders.select(
        transport_rows(env(null_img, row_img, F.lit(1))).alias("r")
    ).select("r.*")
    k3 = F.col("o_orderkey") % 3
    b2 = orders.filter(k3 < 2).select(
        transport_rows(
            F.when(k3 == 0, env(row_img, upd_img, F.lit(2))).otherwise(
                env(row_img, null_img, F.lit(2))  # delete
            )
        ).alias("r")
    ).select("r.*")
    base = tempfile.mkdtemp(prefix="stream_scd2_pipe_")
    seen: set[str] = set()
    b1.coalesce(1).write.mode("append").parquet(f"{base}/transport")
    _pin_batch_order(f"{base}/transport", seen, 1)
    b2.coalesce(1).write.mode("append").parquet(f"{base}/transport")
    _pin_batch_order(f"{base}/transport", seen, 2)

    cfg = Config()
    cfg.server, cfg.db_name, cfg.tables = "srv", "db0", ["orders"]
    fields = [WireField("o_orderkey", "int64"), WireField("o_totalprice", "float64")]
    store = PartitionedParquetStateStore(spark, f"{base}/state")
    store.init("orders", orders.limit(0), ["o_orderkey"])
    pipe = CDCPipeline(
        spark, cfg, [TableSpec("orders", fields, ["o_orderkey"])], store,
        scd2_tables={"orders"},
    )
    q = pipe.start(
        file_envelope_stream(spark, f"{base}/transport", max_files_per_trigger=1),
        checkpoint_dir=f"{base}/ckpt",
        trigger_available_now=True,
    )
    q.awaitTermination(300)
    hist = store.read("orders__history")
    return hist.select(
        "o_orderkey", "o_totalprice",
        F.col("valid_from").cast("long").alias("valid_from"),
        F.col("valid_to").cast("long").alias("valid_to"),
        "is_current",
    )


# ---------------------------------------------------------------------------
# OLAP: CUBE with the GROUPING-id bitmask. olap_cube/olap_rollup/
# olap_grouping_sets cover the lattice SHAPES; what was missing is the
# GROUPING id — the bitmask that tells a consumer WHICH grouping set a row
# belongs to (NULL-as-value vs NULL-as-subtotal is ambiguous without it).
# Both engines put the FIRST grouping column in the most significant bit
# (verified value-exact), so the id is portable; integer-cents keeps the
# lattice totals exact. Plan: one Expand into a single hash aggregate.
# ---------------------------------------------------------------------------

@register(
    "olap_cube_grouping_id",
    """
    SELECT o_orderstatus, o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS total_cents
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over (status, priority) with grouping_id: all 4 grouping sets "
        "in ONE Expand + hash aggregate (single shuffle, map-side partials "
        "over the expanded rows) — at 100 TB this replaces 4 separate scans; "
        "integer-cents sums keep the lattice totals exact",
)
def olap_cube_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum(cents).cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# One-pass mergeable moments: raw power sums S1..S4 are plain integer
# aggregates (map-side combinable, mergeable across partitions/days — the
# streaming-friendly property HLL/KMV have for distincts, applied to
# distribution shape), and mean/variance/skewness/kurtosis are derived from
# them in ONE shared float expression per statistic. Both engines aggregate
# exact integers first and run the identical expression tree after, so the
# doubles are bit-comparable. The shared formula strings below are used
# verbatim by the Spark side (F.expr) and the oracle (CTE) — one source of
# truth, zero drift. Long power sums hold to ~2^63: |x| <= 490 here, so S4
# fits up to ~1.6e8 rows per group; beyond that the same plan carries
# DECIMAL(38,0) sums.
# ---------------------------------------------------------------------------

_MOMENT_EXPRS: tuple[tuple[str, str], ...] = (
    ("mean", "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"),
    ("m2", "CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - mean * mean"),
    ("m3",
     "CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
     " - 3 * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
     " + 2 * mean * mean * mean"),
    ("m4",
     "CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
     " - 4 * mean * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
     " + 6 * mean * mean * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
     " - 3 * mean * mean * mean * mean"),
)


@register(
    "sketch_moments",
    f"""
    WITH v AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS x FROM events),
    s AS (SELECT event_type, count(*) AS n,
                 sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
          FROM v GROUP BY event_type),
    m AS (SELECT *, {_MOMENT_EXPRS[0][1]} AS mean FROM s),
    mm AS (SELECT *, {_MOMENT_EXPRS[1][1]} AS m2, {_MOMENT_EXPRS[2][1]} AS m3,
                     {_MOMENT_EXPRS[3][1]} AS m4 FROM m)
    SELECT event_type, n, mean, m2 AS variance,
           m3 / (sqrt(m2) * m2) AS skewness,
           m4 / (m2 * m2) AS kurtosis
    FROM mm
    """,
    doc="one-pass mergeable distribution moments per group: integer power "
        "sums S1..S4 (map-side combinable; mergeable across partitions and "
        "batches like HLL registers), mean/variance/skewness/kurtosis "
        "derived afterward in a shared float expression — distribution-drift "
        "monitoring over 100 TB in a single aggregate pass, no sort, no "
        "second scan",
)
def sketch_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value")).cast("long")
    s = (
        events.select("event_type", x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("s1"),
            F.sum(F.expr("x*x")).alias("s2"),
            F.sum(F.expr("x*x*x")).alias("s3"),
            F.sum(F.expr("x*x*x*x")).alias("s4"),
        )
    )
    for name, expr in _MOMENT_EXPRS:
        s = s.withColumn(name, F.expr(expr))
    return s.select(
        "event_type",
        "n",
        "mean",
        F.expr("m2").alias("variance"),
        F.expr("m3 / (sqrt(m2) * m2)").alias("skewness"),
        F.expr("m4 / (m2 * m2)").alias("kurtosis"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction: the steady-state maintenance job every streaming
# ingest needs — micro-batches leave thousands of small files per day, and
# scan throughput at 100 TB dies on file-open overhead (and on a file:task
# ratio that starves executors). The engine writes a deliberately fragmented
# copy (16 round-robin files), compacts it with an explicit repartition(2)
# rewrite (AQE never coalesces a user repartition, so the output count is
# pinned), and proves CONTENT preservation with an order-insensitive
# bit_xor fingerprint over per-row md5s that the oracle recomputes from the
# original table — any lost, duplicated, or mutated row flips the XOR.
# File counts are asserted from the actual directory listing, not assumed.
# ---------------------------------------------------------------------------

@register(
    "layout_compaction",
    """
    SELECT CAST(16 AS BIGINT) AS n_files_small,
           CAST(2 AS BIGINT) AS n_files_compacted,
           count(*) AS n_rows,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 12))::BIGINT)
             AS content_fp
    FROM documents
    """,
    doc="small-file compaction (streaming-ingest maintenance): 16 fragment "
        "files rewritten to 2 via explicit repartition (pinned — AQE does "
        "not coalesce user repartitions); content preservation proved by an "
        "order-insensitive per-row md5 XOR fingerprint the oracle recomputes "
        "from the ORIGINAL table, so any lost/duplicated/mutated row flips "
        "the hash; file counts come from the real directory listing",
)
def layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="compact_")
    docs.repartition(16).write.mode("overwrite").parquet(f"{base}/small")
    n_small = len([f for f in os.listdir(f"{base}/small") if f.endswith(".parquet")])
    (
        spark.read.parquet(f"{base}/small")
        .repartition(2)
        .write.mode("overwrite")
        .parquet(f"{base}/compacted")
    )
    n_comp = len([f for f in os.listdir(f"{base}/compacted") if f.endswith(".parquet")])
    back = spark.read.parquet(f"{base}/compacted")
    h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"), F.lit(":"), F.col("text")
                    ).cast("binary")
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
    )
    return back.select(h.alias("fp")).agg(
        F.lit(n_small).cast("long").alias("n_files_small"),
        F.lit(n_comp).cast("long").alias("n_files_compacted"),
        F.count("*").alias("n_rows"),
        F.expr("bit_xor(fp)").alias("content_fp"),
    )


# ---------------------------------------------------------------------------
# Image-level dedup via perceptual average-hash (aHash): the image twin of
# content-hash text dedup — decode (real PPM codec), nearest-neighbor 8x8
# downsample, one bit per cell (>= grid mean, EXACT integer threshold), then
# a plain JVM-side groupBy on the 64-bit hash string. Identical images
# always collide regardless of byte-level container differences; the
# synthetic every-5th-doc duplication (same rule as dedup_exact) guarantees
# real clusters. The oracle replays decode + downsample + threshold from the
# synthesis rule entirely in SQL, so the hash is verified bit-for-bit.
# ---------------------------------------------------------------------------

@register(
    "mm_image_ahash",
    """
    WITH d2 AS (
      SELECT d1.doc_id,
             CASE WHEN d1.doc_id % 5 = 4 AND prev.text IS NOT NULL
                  THEN prev.text ELSE d1.text END AS text
      FROM documents d1 LEFT JOIN documents prev ON prev.doc_id = d1.doc_id - 1
    ),
    r AS (
      SELECT doc_id, (8 + length(text) % 8) AS w,
             substr(repeat(md5(text), 6), 1, (8 + length(text) % 8) * 12) AS ras
      FROM d2
    ),
    cell AS (
      SELECT doc_id, u.i AS i,
             ascii(substr(ras, (((u.i // 8) // 2) * w + ((u.i % 8) * w) // 8) * 3 + 1, 1)) AS v
      FROM r, unnest(generate_series(0, 63)) AS u(i)
    ),
    tot AS (SELECT doc_id, sum(v) AS s FROM cell GROUP BY doc_id),
    bits AS (
      SELECT c.doc_id,
             string_agg(CASE WHEN c.v * 64 >= t.s THEN '1' ELSE '0' END, '' ORDER BY c.i) AS ahash
      FROM cell c JOIN tot t USING (doc_id) GROUP BY c.doc_id
    )
    SELECT ahash, count(*) AS n_images, min(doc_id) AS keeper_id
    FROM bits GROUP BY ahash
    """,
    doc="image dedup via perceptual average-hash: real PPM decode -> "
        "nearest-neighbor 8x8 -> per-cell bit (exact integer threshold "
        "v*64 >= sum) -> JVM groupBy on the 64-bit hash; identical images "
        "collide whatever their container bytes, clusters carry "
        "(count, keeper); Arrow-batched kernel only decodes+hashes — the "
        "shuffle key is 8 bytes/image at 100 TB, never pixels",
)
def mm_image_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    prev = docs.select((F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("prev_text"))
    with_dups = (
        docs.join(prev, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 5 == 4) & F.col("prev_text").isNotNull(),
                F.col("prev_text"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    media = M.synthesize_media_table(with_dups, "doc_id", "text")
    return (
        M.ahash_images(media)
        .groupBy("ahash")
        .agg(F.count("*").alias("n_images"), F.min("media_id").alias("keeper_id"))
    )


# ---------------------------------------------------------------------------
# Exact per-group percentiles: Spark's `percentile` and DuckDB's
# `quantile_cont` share the textbook definition (index p*(n-1), linear
# interpolation between floor/ceil neighbors), so on integer-cast inputs the
# doubles agree bit-for-bit. This is the EXACT complement of the
# sketch-based paths (bottom-k / t-digest territory): one sort-based
# aggregate per group — fine when groups fit an executor, replaced by
# sketch_bottomk_quantiles when they don't.
# ---------------------------------------------------------------------------

@register(
    "olap_percentiles_exact",
    """
    WITH v AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS x FROM events)
    SELECT event_type,
           quantile_cont(x, 0.5) AS p50,
           quantile_cont(x, 0.9) AS p90,
           quantile_cont(x, 0.99) AS p99,
           count(*) AS n
    FROM v GROUP BY event_type
    """,
    doc="exact p50/p90/p99 per group (linear-interpolation definition shared "
        "by both engines, bit-identical on integer inputs): the in-group "
        "sort aggregate for groups that fit one executor; its sketch twin "
        "(sketch_bottomk_quantiles) is the path when a group does not",
)
def olap_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    x = F.floor(F.col("value")).cast("long")
    return (
        events.select("event_type", x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.expr("percentile(x, 0.5)").alias("p50"),
            F.expr("percentile(x, 0.9)").alias("p90"),
            F.expr("percentile(x, 0.99)").alias("p99"),
            F.count("*").alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Entropy / mutual information between two categorical columns — the
# feature-vs-label dependence diagnostic a curation pipeline runs before
# training on a slice (is `source` informative about `lang`? is a cohort
# leaking the label?). Exact integer contingency counts (one shuffle),
# marginals broadcast back, H and MI derived in one shared float expression;
# the n_total literal is bound at plan time (a count(*) scalar — at 100 TB
# a pre-aggregated stat, not a per-row value).
# ---------------------------------------------------------------------------

_MI_TERM = (
    "CAST(nxy AS DOUBLE) / {n} * ln(CAST(nxy AS DOUBLE) * {n} "
    "/ (CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE)))"
)
_HX_TERM = "CAST(nx AS DOUBLE) / {n} * ln(CAST(nx AS DOUBLE) / {n})"
_HY_TERM = "CAST(ny AS DOUBLE) / {n} * ln(CAST(ny AS DOUBLE) / {n})"


@register(
    "analytic_entropy_mi",
    f"""
    WITH e AS (SELECT event_type, user_id % 8 AS cohort FROM events),
    n_t AS (SELECT count(*) AS n FROM e),
    jo AS (SELECT event_type, cohort, count(*) AS nxy FROM e GROUP BY 1, 2),
    nx AS (SELECT event_type, count(*) AS nx FROM e GROUP BY 1),
    ny AS (SELECT cohort, count(*) AS ny FROM e GROUP BY 1),
    mi AS (
      SELECT sum({_MI_TERM.format(n='(SELECT n FROM n_t)')}) AS mi
      FROM jo JOIN nx USING (event_type) JOIN ny USING (cohort)
    ),
    hx AS (SELECT -sum({_HX_TERM.format(n='(SELECT n FROM n_t)')}) AS h_event_type FROM nx),
    hy AS (SELECT -sum({_HY_TERM.format(n='(SELECT n FROM n_t)')}) AS h_cohort FROM ny)
    SELECT h_event_type, h_cohort, mi, mi / least(h_event_type, h_cohort) AS nmi
    FROM mi, hx, hy
    """,
    doc="Shannon entropy + mutual information between event_type and a "
        "user cohort: exact integer contingency counts (one shuffle), "
        "broadcast marginals, shared float expression for H/MI/NMI — the "
        "label-leakage / feature-dependence diagnostic, one aggregation "
        "pass at any scale",
)
def analytic_entropy_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ev = events.select("event_type", (F.col("user_id") % 8).alias("cohort"))
    n = ev.count()
    jo = ev.groupBy("event_type", "cohort").agg(F.count("*").alias("nxy"))
    nx = ev.groupBy("event_type").agg(F.count("*").alias("nx"))
    ny = ev.groupBy("cohort").agg(F.count("*").alias("ny"))
    joined = jo.join(F.broadcast(nx), "event_type").join(F.broadcast(ny), "cohort")
    mi = joined.agg(F.sum(F.expr(_MI_TERM.format(n=n))).alias("mi"))
    hx = nx.agg((-F.sum(F.expr(_HX_TERM.format(n=n)))).alias("h_event_type"))
    hy = ny.agg((-F.sum(F.expr(_HY_TERM.format(n=n)))).alias("h_cohort"))
    return (
        mi.crossJoin(hx)
        .crossJoin(hy)
        .select(
            "h_event_type",
            "h_cohort",
            "mi",
            F.expr("mi / least(h_event_type, h_cohort)").alias("nmi"),
        )
    )


# ---------------------------------------------------------------------------
# RAKE keyword extraction (Rose et al. 2010): candidate phrases are maximal
# stopword-free runs (gaps-and-islands via one running sum per doc), word
# score = degree/frequency over candidate words, phrase score = sum of its
# word scores. Scores are integer MILLIONTHS (degree*1e6 DIV freq) so the
# phrase-score sum is order-insensitive — summing doubles across a shuffle
# would be partition-order-dependent and unhashable. All linear: explode,
# per-doc window, two groupBys, broadcast word-score join, TakeOrdered 20.
# ---------------------------------------------------------------------------

@register(
    "text_rake_keywords",
    """
    WITH words AS (
      SELECT doc_id, u.i - 1 AS pos, parts[u.i] AS word
      FROM (SELECT doc_id, string_split(text, ' ') AS parts FROM documents) t,
           unnest(generate_series(1, len(parts))) AS u(i)
    ),
    marked AS (
      SELECT doc_id, pos, word, word IN ('a', 'the') AS is_stop,
             sum(CASE WHEN word IN ('a', 'the') THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id
      FROM words
    ),
    cand AS (SELECT doc_id, pos, word, phrase_id FROM marked WHERE NOT is_stop),
    plen AS (
      SELECT doc_id, phrase_id, count(*) AS phrase_len
      FROM cand GROUP BY doc_id, phrase_id
    ),
    pw AS (
      SELECT c.*, p.phrase_len FROM cand c JOIN plen p USING (doc_id, phrase_id)
      WHERE p.phrase_len <= 4
    ),
    stats AS (
      SELECT word, count(*) AS freq, sum(phrase_len) AS degree FROM pw GROUP BY word
    ),
    scored AS (SELECT word, degree * 1000000 // freq AS score_ppm FROM stats),
    phrases AS (
      SELECT pw.doc_id, pw.phrase_id,
             string_agg(pw.word, ' ' ORDER BY pw.pos) AS phrase,
             sum(s.score_ppm) AS score_ppm
      FROM pw JOIN scored s USING (word)
      GROUP BY pw.doc_id, pw.phrase_id
    )
    SELECT phrase, CAST(max(score_ppm) AS BIGINT) AS score_ppm, count(*) AS n_occurrences
    FROM phrases GROUP BY phrase
    ORDER BY score_ppm DESC, phrase LIMIT 20
    """,
    doc="RAKE keyword extraction: stopword-delimited candidate phrases "
        "(gaps-and-islands, one per-doc window), word score = degree/freq "
        "in integer millionths (order-insensitive phrase sums), global "
        "top-20 phrases via TakeOrdered — linear passes + one broadcast "
        "join, no driver-side text handling",
)
def text_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "word"))
    marked = words.withColumn("is_stop", F.col("word").isin("a", "the"))
    running = F.sum(F.col("is_stop").cast("int")).over(
        Window.partitionBy("doc_id").orderBy("pos")
    )
    cand = marked.withColumn("phrase_id", running).filter(~F.col("is_stop"))
    plen = cand.groupBy("doc_id", "phrase_id").agg(F.count("*").alias("phrase_len"))
    pw = cand.join(plen, ["doc_id", "phrase_id"]).filter(F.col("phrase_len") <= 4)
    scored = (
        pw.groupBy("word")
        .agg(F.count("*").alias("freq"), F.sum("phrase_len").alias("degree"))
        .withColumn("score_ppm", F.expr("degree * 1000000 DIV freq"))
    )
    phrases = (
        pw.join(F.broadcast(scored.select("word", "score_ppm")), "word")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "word"))),
                    lambda s: s["word"],
                ),
            ).alias("phrase"),
            F.sum("score_ppm").alias("score_ppm"),
        )
    )
    return (
        phrases.groupBy("phrase")
        .agg(F.max("score_ppm").alias("score_ppm"), F.count("*").alias("n_occurrences"))
        .orderBy(F.desc("score_ppm"), "phrase")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Greedy k-center coreset (Gonzalez '85 farthest-point traversal): the
# geometric diversity selector for training-data curation — pick the k most
# mutually-distant examples, not k random ones. Deterministic by the same
# contract as sim_kmeans_lloyd (integer quantization, exact integer
# distances, lowest-id ties), so the oracle replays the ENTIRE unrolled
# k-round selection. The extra final row is the would-be (k+1)th pick,
# whose distance is the exact coverage radius² of the chosen set.
# ---------------------------------------------------------------------------

def _kcenter_oracle_sql(k: int = 8, dim: int = 64, scale: int = 1000) -> str:
    parts = [
        f"""q AS MATERIALIZED (
      SELECT vec_id AS id,
             list_transform(embedding, x -> CAST(round(x * {scale}) AS BIGINT)) AS qv
      FROM embeddings
    )""",
        f"""qdim AS MATERIALIZED (
      SELECT id, u.pos AS pos, qv[u.pos] AS val
      FROM q, unnest(generate_series(1, {dim})) AS u(pos)
    )""",
        "sel0 AS (SELECT id AS sid, 0 AS rnd, 0::BIGINT AS d2 FROM q ORDER BY id LIMIT 1)",
    ]
    prev = "sel0"
    for r in range(1, k + 1):
        parts.append(f"""d{r} AS (
      SELECT a.id, b.id AS sid, sum((a.val - b.val) * (a.val - b.val)) AS d2
      FROM qdim a JOIN qdim b
        ON b.pos = a.pos AND b.id IN (SELECT sid FROM {prev})
      GROUP BY a.id, b.id
    )""")
        parts.append(f"m{r} AS (SELECT id, min(d2) AS d2 FROM d{r} GROUP BY id)")
        parts.append(
            f"p{r} AS (SELECT id AS sid, {r} AS rnd, d2 FROM m{r} ORDER BY d2 DESC, id LIMIT 1)"
        )
        # MATERIALIZED is load-bearing: sel{r} references sel{r-1} twice
        # (directly and through p{r}); inlining would re-evaluate the whole
        # selection chain 2^k times (same DuckDB pitfall the subword
        # tokenizer oracle documents)
        parts.append(
            f"sel{r} AS MATERIALIZED (SELECT * FROM {prev} UNION ALL SELECT * FROM p{r})"
        )
        prev = f"sel{r}"
    return f"""
    WITH {', '.join(parts)}
    SELECT rnd, sid AS center_id, CAST(d2 AS BIGINT) AS d2 FROM {prev}
    """


@register(
    "sample_kcenter_coreset",
    _kcenter_oracle_sql(),
    doc="greedy k-center coreset (Gonzalez '85): 8 farthest-point rounds "
        "over integer-quantized embeddings — the diversity-maximizing "
        "subset selector for curation, with the exact coverage radius "
        "shipped as the final row. Per round: selected centers broadcast "
        "as literals, min-distance is a map-only array fold, argmax is "
        "TakeOrdered(1); k linear passes, k rows of driver traffic. The "
        "oracle replays the whole unrolled selection value-exact",
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.similarity import kcenter_greedy

    emb = load_table(spark, sf_dir, "embeddings")
    rows = kcenter_greedy(emb, k=8, scale=1000)
    return spark.createDataFrame(rows, "rnd int, center_id long, d2 long")


# ---------------------------------------------------------------------------
# First-order Markov transition matrix over per-user event sequences: the
# sequence-mining primitive (next-event prediction, anomaly scoring, funnel
# discovery). One lag() window per user — partitioned by user_id, so the
# sort is per-user-slice, never global — then a global pair count; the
# transition probability divides two exact integer counts in a shared
# expression. Ordering ties broken by event_id so both engines see the
# identical sequence.
# ---------------------------------------------------------------------------

@register(
    "analytic_markov_transitions",
    """
    WITH e AS (
      SELECT user_id, event_type, event_id,
             epoch_ms(epoch_ns(ts) // 1000000) AS ts
      FROM events
    ),
    seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type
      FROM e
    ),
    pair AS (
      SELECT prev_type, event_type AS cur_type, count(*) AS n_transitions
      FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
    ),
    tot AS (SELECT prev_type, sum(n_transitions) AS n_from FROM pair GROUP BY prev_type)
    SELECT p.prev_type, p.cur_type,
           CAST(p.n_transitions AS BIGINT) AS n_transitions,
           CAST(p.n_transitions AS DOUBLE) / CAST(t.n_from AS DOUBLE) AS prob
    FROM pair p JOIN tot t USING (prev_type)
    """,
    doc="first-order Markov transition matrix over per-user event "
        "sequences: one per-user lag() window (partitioned — no global "
        "sort), exact integer pair counts, row-normalized probabilities "
        "from a shared division. The next-event / anomaly-scoring "
        "primitive; |types|^2-bounded output at any corpus size",
)
def analytic_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    seq = events.select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    pair = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("cur_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
    tot = pair.groupBy("prev_type").agg(F.sum("n_transitions").alias("n_from"))
    return (
        pair.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "cur_type",
            F.col("n_transitions").cast("long").alias("n_transitions"),
            F.expr(
                "CAST(n_transitions AS DOUBLE) / CAST(n_from AS DOUBLE)"
            ).alias("prob"),
        )
    )


# ---------------------------------------------------------------------------
# Zipf-slope fit: OLS regression of ln(freq) on ln(rank) over the top-100
# words — the classic corpus-health diagnostic (natural language ~ -1;
# boilerplate or synthetic soup drifts off). Determinism discipline: the
# regression sums are computed by an ORDERED array fold over the
# rank-sorted top-100 (ln terms summed rank-ascending in BOTH engines), not
# a SQL SUM whose accumulation order is partition-dependent — summing 100
# doubles in different orders can flip the 9th decimal the value-hash
# compares. The fold input is 100 elements, driver-safe by construction.
# ---------------------------------------------------------------------------

@register(
    "text_zipf_fit",
    """
    WITH wc AS (
      SELECT w AS word, count(*) AS cnt
      FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY w
    ),
    ranked AS (
      SELECT ln(CAST(row_number() OVER (ORDER BY cnt DESC, word) AS DOUBLE)) AS x,
             ln(CAST(cnt AS DOUBLE)) AS y,
             row_number() OVER (ORDER BY cnt DESC, word) AS rank
      FROM wc QUALIFY rank <= 100
    ),
    arr AS (
      -- list_reduce folds SEQUENTIALLY over the rank-ordered list: the
      -- double accumulation order is pinned, matching the engine's
      -- aggregate() fold term for term
      SELECT list(x ORDER BY rank) AS xs, list(y ORDER BY rank) AS ys,
             list(x * y ORDER BY rank) AS xys, list(x * x ORDER BY rank) AS xxs
      FROM ranked
    ),
    s AS (
      SELECT CAST(len(xs) AS DOUBLE) AS n,
             list_reduce(xs, (acc, v) -> acc + v) AS sx,
             list_reduce(ys, (acc, v) -> acc + v) AS sy,
             list_reduce(xys, (acc, v) -> acc + v) AS sxy,
             list_reduce(xxs, (acc, v) -> acc + v) AS sxx
      FROM arr
    )
    SELECT 100 AS n_words,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
    FROM s
    """,
    doc="Zipf-slope diagnostic: OLS of ln(freq) on ln(rank) over the "
        "top-100 words (natural text ~ -1). Rank via TakeOrdered-100; "
        "regression sums via an ORDERED fold over the rank-sorted array so "
        "double accumulation order is identical in both engines — a plain "
        "SUM over a shuffle is partition-order-dependent at the ulp level",
)
def text_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = (
        wc.orderBy(F.desc("cnt"), "word")
        .limit(100)
        .select(
            F.row_number().over(Window.orderBy(F.desc("cnt"), "word")).alias("rank"),
            "cnt",
        )
    )
    arr = ranked.agg(
        F.expr("array_sort(collect_list(struct(rank, ln(CAST(rank AS DOUBLE)) AS x, "
               "ln(CAST(cnt AS DOUBLE)) AS y)))").alias("pts")
    )
    s = arr.select(
        F.expr("CAST(size(pts) AS DOUBLE)").alias("n"),
        F.expr("aggregate(pts, CAST(0 AS DOUBLE), (acc, p) -> acc + p.x)").alias("sx"),
        F.expr("aggregate(pts, CAST(0 AS DOUBLE), (acc, p) -> acc + p.y)").alias("sy"),
        F.expr("aggregate(pts, CAST(0 AS DOUBLE), (acc, p) -> acc + p.x * p.y)").alias("sxy"),
        F.expr("aggregate(pts, CAST(0 AS DOUBLE), (acc, p) -> acc + p.x * p.x)").alias("sxx"),
    )
    return s.select(
        F.lit(100).cast("int").alias("n_words"),
        F.expr("(n * sxy - sx * sy) / (n * sxx - sx * sx)").alias("slope"),
        F.expr("(sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n").alias("intercept"),
    )


# ---------------------------------------------------------------------------
# Per-document word entropy — the vocabulary-diversity quality signal the
# Gopher repetition metrics don't capture (a doc repeating 3 words has low
# entropy but may pass duplicate-line checks). H = ln(n) - (1/n)·Σ c·ln(c)
# from exact integer token counts: one explode + two groupBys, all linear;
# the float expression is shared verbatim between the engines.
# ---------------------------------------------------------------------------

@register(
    "text_entropy_per_doc",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    wc AS (SELECT doc_id, word, count(*) AS c FROM tok GROUP BY doc_id, word),
    agg AS (
      SELECT doc_id, sum(c) AS n, sum(c * ln(CAST(c AS DOUBLE))) AS sclnc,
             count(*) AS n_unique
      FROM wc GROUP BY doc_id
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
           CAST(n_unique AS BIGINT) AS n_unique,
           ln(CAST(n AS DOUBLE)) - sclnc / CAST(n AS DOUBLE) AS word_entropy
    FROM agg
    """,
    doc="per-document word entropy H = ln(n) - (1/n)*sum(c*ln(c)) from "
        "exact integer counts — the vocabulary-diversity quality signal "
        "(low-entropy docs are template/boilerplate even when line-dedup "
        "passes); one explode + two linear groupBys",
)
def text_entropy_per_doc(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n"),
        F.sum(F.expr("c * ln(CAST(c AS DOUBLE))")).alias("sclnc"),
        F.count("*").alias("n_unique"),
    )
    return agg.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tokens"),
        F.col("n_unique").cast("long").alias("n_unique"),
        F.expr("ln(CAST(n AS DOUBLE)) - sclnc / CAST(n AS DOUBLE)").alias("word_entropy"),
    )


# ---------------------------------------------------------------------------
# Streaming proof of the moments-mergeability claim: the SAME power-sum
# aggregation as sketch_moments, but fed through Structured Streaming in 4
# forced micro-batches (maxFilesPerTrigger=1) — the state store MERGES the
# integer partial sums batch-by-batch, and the final complete-mode output
# must equal the one-shot batch aggregation bit-for-bit. This is the
# incremental-statistics shape a 100 TB daily pipeline runs: per-day sums
# merged into running distribution moments without re-scanning history.
# ---------------------------------------------------------------------------

@register(
    "stream_mergeable_moments",
    f"""
    WITH v AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS x FROM events),
    s AS (SELECT event_type, count(*) AS n,
                 sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3, sum(x*x*x*x) AS s4
          FROM v GROUP BY event_type),
    m AS (SELECT *, {_MOMENT_EXPRS[0][1]} AS mean FROM s),
    mm AS (SELECT *, {_MOMENT_EXPRS[1][1]} AS m2, {_MOMENT_EXPRS[2][1]} AS m3,
                     {_MOMENT_EXPRS[3][1]} AS m4 FROM m)
    SELECT event_type, n, mean, m2 AS variance,
           m3 / (sqrt(m2) * m2) AS skewness,
           m4 / (m2 * m2) AS kurtosis
    FROM mm
    """,
    doc="mergeable moments under streaming: the sketch_moments power sums "
        "aggregated across 4 FORCED micro-batches (maxFilesPerTrigger=1) — "
        "the state store merges integer partials per batch, and the final "
        "output equals the one-shot batch aggregation bit-for-bit (same "
        "oracle). The incremental-statistics shape: merge day sums into "
        "running moments, never re-scan history",
)
def stream_mergeable_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="stream_mom_")
    ev.repartition(4).write.mode("overwrite").parquet(f"{base}/in")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    x = F.floor(F.col("value")).cast("long")
    sums = (
        stream.select("event_type", x.alias("x"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("s1"),
            F.sum(F.expr("x*x")).alias("s2"),
            F.sum(F.expr("x*x*x")).alias("s3"),
            F.sum(F.expr("x*x*x*x")).alias("s4"),
        )
    )
    sink = f"mom_{uuid.uuid4().hex[:8]}"
    q = (
        sums.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    s = spark.table(sink)
    for name, expr in _MOMENT_EXPRS:
        s = s.withColumn(name, F.expr(expr))
    return s.select(
        "event_type",
        "n",
        "mean",
        F.expr("m2").alias("variance"),
        F.expr("m3 / (sqrt(m2) * m2)").alias("skewness"),
        F.expr("m4 / (m2 * m2)").alias("kurtosis"),
    )


# ---------------------------------------------------------------------------
# Sliding-window DISTINCT count — the classic "hard window" (no native
# streaming-friendly form: distinct is not subtractable, so engines either
# support DISTINCT window aggregates natively (DuckDB) or compose it from
# collect_set (Spark)). Trailing-7-day distinct event types per user: the
# engagement-breadth metric. RANGE frame ⇒ peer rows included on both
# engines, so equal-timestamp rows get identical values. Partitioned by
# user — per-user slices sort locally, nothing global.
# ---------------------------------------------------------------------------

@register(
    "olap_window_distinct_count",
    """
    WITH e AS (
      SELECT event_id, user_id, event_type,
             epoch_ns(ts) // 1000000000 AS es
      FROM events
    )
    SELECT event_id, user_id, CAST(es AS BIGINT) AS es,
           CAST(count(DISTINCT event_type) OVER (
             PARTITION BY user_id ORDER BY es
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_distinct_7d
    FROM e
    """,
    doc="trailing-7-day DISTINCT event-type count per user (engagement "
        "breadth): the non-subtractable window aggregate — DuckDB runs a "
        "native DISTINCT window, Spark composes size(collect_set) over the "
        "same RANGE frame; peer rows included on both engines so ties are "
        "deterministic. Per-user partitioned window, no global sort",
)
def olap_window_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "event_id", "user_id", "event_type", F.col("ts").cast("long").alias("es")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(-604800, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.col("es").cast("long").alias("es"),
        F.size(F.collect_set("event_type").over(w)).cast("long").alias("n_distinct_7d"),
    )


# ---------------------------------------------------------------------------
# Perceptual-hash robustness — the property that makes aHash a NEAR-dup
# detector rather than a checksum: a one-byte raster perturbation (one gray
# pixel ±1) must leave the hash (nearly) unchanged, because each bit
# thresholds an 8x8 cell against the global mean. For every document we
# build the original PPM and a twin whose FIRST raster byte is incremented,
# decode both through the real codec, and measure the Hamming distance
# distribution. The oracle replays raster construction + perturbation +
# hash + Hamming entirely in SQL. At scale this is the re-encode /
# recompress dedup case exact content hashing misses.
# ---------------------------------------------------------------------------

@register(
    "mm_ahash_robustness",
    """
    WITH d AS (
      SELECT doc_id, (8 + length(text) % 8) AS w,
             substr(repeat(md5(text), 6), 1, (8 + length(text) % 8) * 12) AS ras
      FROM documents
    ),
    pairviews AS (
      SELECT doc_id, w, ras, 0 AS variant FROM d
      UNION ALL
      SELECT doc_id, w, chr(ascii(substr(ras, 1, 1)) + 1) || substr(ras, 2), 1 FROM d
    ),
    cell AS (
      SELECT doc_id, variant, u.i AS i,
             ascii(substr(ras, (((u.i // 8) // 2) * w + ((u.i % 8) * w) // 8) * 3 + 1, 1)) AS v
      FROM pairviews, unnest(generate_series(0, 63)) AS u(i)
    ),
    tot AS (SELECT doc_id, variant, sum(v) AS s FROM cell GROUP BY doc_id, variant),
    bits AS (
      SELECT c.doc_id, c.variant,
             string_agg(CASE WHEN c.v * 64 >= t.s THEN '1' ELSE '0' END, '' ORDER BY c.i) AS ahash
      FROM cell c JOIN tot t USING (doc_id, variant) GROUP BY c.doc_id, c.variant
    ),
    pairs AS (
      SELECT a.doc_id,
             (SELECT count(*) FROM unnest(generate_series(1, 64)) AS u(i)
              WHERE substr(a.ahash, u.i, 1) <> substr(b.ahash, u.i, 1)) AS hamming
      FROM bits a JOIN bits b ON a.doc_id = b.doc_id AND a.variant = 0 AND b.variant = 1
    )
    SELECT count(*) AS n_pairs,
           CAST(sum(CASE WHEN hamming = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_identical,
           CAST(sum(CASE WHEN hamming <= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_3,
           CAST(max(hamming) AS BIGINT) AS max_hamming
    FROM pairs
    """,
    doc="perceptual-hash robustness audit: every image vs a one-byte-"
        "perturbed twin (one gray pixel +1) through the REAL decode + aHash "
        "path — Hamming distribution shows near-invariance (the property "
        "that catches re-encoded/recompressed duplicates exact hashing "
        "misses). Linear: one decode per variant, a per-doc equi-join on "
        "doc_id, 64-char comparisons JVM-side",
)
def mm_ahash_robustness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    w = (F.length("text") % 8 + 8).cast("int")
    raster = F.repeat(F.md5(F.col("text").cast("binary")), 6).substr(F.lit(1), w * 12)
    perturbed = F.concat(
        F.expr("char(ascii(substr(ras, 1, 1)) + 1)"), F.expr("substr(ras, 2)")
    )
    base = docs.select("doc_id", w.alias("w"), raster.alias("ras"))
    variants = base.select("doc_id", "w", F.col("ras").alias("r2"), F.lit(0).alias("variant")).unionByName(
        base.select("doc_id", "w", perturbed.alias("r2"), F.lit(1).alias("variant"))
    )
    header = F.concat(F.lit("P6\n"), F.col("w").cast("string"), F.lit(" 4\n255\n"))
    media = variants.select(
        # media_id encodes (doc, variant) so the decode kernel stays unchanged
        (F.col("doc_id") * 2 + F.col("variant")).alias("media_id"),
        F.concat(header, F.col("r2")).cast("binary").alias("blob"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("ppm").alias("format"),
            F.col("w").alias("width"),
            F.lit(4).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )
    hashes = M.ahash_images(media).select(
        (F.col("media_id") / 2).cast("long").alias("doc_id"),
        (F.col("media_id") % 2).alias("variant"),
        "ahash",
    )
    orig = hashes.filter(F.col("variant") == 0).select("doc_id", F.col("ahash").alias("h0"))
    pert = hashes.filter(F.col("variant") == 1).select("doc_id", F.col("ahash").alias("h1"))
    hamming = F.expr(
        "aggregate(sequence(1, 64), 0, (acc, i) -> "
        "acc + IF(substring(h0, i, 1) = substring(h1, i, 1), 0, 1))"
    )
    pairs = orig.join(pert, "doc_id").select(hamming.alias("hamming"))
    return pairs.agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0)).cast("long").alias("n_identical"),
        F.sum(F.when(F.col("hamming") <= 3, 1).otherwise(0)).cast("long").alias("n_within_3"),
        F.max("hamming").cast("long").alias("max_hamming"),
    )


# ---------------------------------------------------------------------------
# PERMISSIVE CSV ingestion with corrupt-record capture — the operational
# reality of 100 TB crawl ingest: some fraction of lines are malformed and
# the pipeline must COUNT and QUARANTINE them without failing the job
# (the batch analog of the streaming dead-letter path). Every 7th doc's
# n_chars field is written as a non-numeric token; the typed read sends
# exactly those rows to _corrupt_record and yields NULL fields.
# ---------------------------------------------------------------------------

@register(
    "source_csv_corrupt_records",
    """
    SELECT CAST(sum(CASE WHEN doc_id % 7 <> 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           CAST(sum(CASE WHEN doc_id % 7 = 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN doc_id % 7 <> 6 THEN n_chars ELSE 0 END) AS BIGINT)
             AS good_chars
    FROM documents
    """,
    doc="PERMISSIVE CSV read with corrupt-record quarantine: every 7th "
        "line carries a non-numeric field, the typed read captures exactly "
        "those lines in _corrupt_record (nulls elsewhere) and the good "
        "rows aggregate to the oracle's totals — the batch dead-letter "
        "path; malformed data is counted and kept, never crashes the scan",
)
def source_csv_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    line = F.concat_ws(
        ",",
        F.col("doc_id").cast("string"),
        F.col("lang"),
        F.col("source"),
        F.when(F.col("doc_id") % 7 == 6, F.lit("notanumber")).otherwise(
            F.col("n_chars").cast("string")
        ),
    )
    base = tempfile.mkdtemp(prefix="src_corrupt_")
    docs.select(line.alias("value")).write.mode("overwrite").text(f"{base}/in")
    back = (
        spark.read.schema(
            "doc_id long, lang string, source string, n_chars long, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(f"{base}/in")
    )
    return back.agg(
        F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0)).cast("long").alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("n_chars")).otherwise(0)).cast("long").alias("good_chars"),
    )


# ---------------------------------------------------------------------------
# JSONL quarantine twin of the CSV corrupt-record path: every 7th line is
# truncated mid-object; the PERMISSIVE typed read captures exactly those
# in _corrupt_record and the good rows aggregate to the oracle's totals —
# the malformed-crawl-shard reality of corpus ingest, never a crash.
# ---------------------------------------------------------------------------

@register(
    "source_jsonl_corrupt_records",
    """
    SELECT CAST(sum(CASE WHEN doc_id % 7 <> 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
           CAST(sum(CASE WHEN doc_id % 7 = 6 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
           CAST(sum(CASE WHEN doc_id % 7 <> 6 THEN n_chars ELSE 0 END) AS BIGINT)
             AS good_chars
    FROM documents
    """,
    doc="PERMISSIVE JSONL read with corrupt-record quarantine: every 7th "
        "line truncated mid-object, captured in _corrupt_record, good "
        "rows aggregate exactly — completes the quarantine story across "
        "ingest formats (csv twin: source_csv_corrupt_records)",
)
def source_jsonl_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    good = F.to_json(F.struct("doc_id", "lang", "source", "n_chars"))
    broken = F.concat(
        F.lit('{"doc_id": '), F.col("doc_id").cast("string"), F.lit(', "lang": "')
    )
    line = F.when(F.col("doc_id") % 7 == 6, broken).otherwise(good)
    base = tempfile.mkdtemp(prefix="src_jsonl_corrupt_")
    docs.select(line.alias("value")).write.mode("overwrite").text(f"{base}/in")
    back = (
        spark.read.schema(
            "doc_id long, lang string, source string, n_chars long, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(f"{base}/in")
    )
    return back.agg(
        F.sum(F.when(F.col("_corrupt").isNull(), 1).otherwise(0)).cast("long").alias("n_good"),
        F.sum(F.when(F.col("_corrupt").isNotNull(), 1).otherwise(0)).cast("long").alias("n_corrupt"),
        F.sum(F.when(F.col("_corrupt").isNull(), F.col("n_chars")).otherwise(0)).cast("long").alias("good_chars"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity (Newman 2002): Pearson correlation of endpoint
# degrees over the directed edge list — do hubs attach to hubs? The
# structural prior that decides whether degree-capped dedup/linkpred
# heuristics are safe on this graph. Exact integer sums; the coefficient
# from one shared float expression.
# ---------------------------------------------------------------------------

_ASSORT_R = (
    "(CAST(mm AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sx) / "
    "(CAST(mm AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
)


@register(
    "graph_assortativity",
    f"""
    WITH und AS (
      SELECT DISTINCT
             least(o_custkey % 2000, o_orderkey % 2000) AS a,
             greatest(o_custkey % 2000, o_orderkey % 2000) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0
        AND least(o_custkey % 2000, o_orderkey % 2000)
            <> greatest(o_custkey % 2000, o_orderkey % 2000)
    ),
    dir AS (
      SELECT a AS s, b AS t FROM und UNION ALL SELECT b, a FROM und
    ),
    deg AS (SELECT s AS n, count(*)::BIGINT AS deg FROM dir GROUP BY s),
    j AS (
      SELECT da.deg AS x, db.deg AS y
      FROM dir JOIN deg da ON dir.s = da.n JOIN deg db ON dir.t = db.n
    ),
    sums AS (
      SELECT count(*)::BIGINT AS mm,
             sum(x)::BIGINT AS sx,
             sum(x * x)::BIGINT AS sxx,
             sum(x * y)::BIGINT AS sxy
      FROM j
    )
    SELECT mm AS n_directed_edges, sx AS sum_deg, sxx AS sum_deg_sq,
           sxy AS sum_deg_prod, {_ASSORT_R} AS assortativity
    FROM sums
    """,
    doc="degree assortativity (Newman 2002) of the undirected orders "
        "graph: Pearson r of endpoint degrees over the symmetrized edge "
        "list — exact integer power sums (symmetry makes the x and y "
        "marginals identical), coefficient from one shared float "
        "expression; the hub-mixing prior for degree-capped heuristics",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    und = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.least(F.col("o_custkey") % 2000, F.col("o_orderkey") % 2000).alias("a"),
            F.greatest(F.col("o_custkey") % 2000, F.col("o_orderkey") % 2000).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    dirs = und.select(F.col("a").alias("s"), F.col("b").alias("t")).unionAll(
        und.select(F.col("b").alias("s"), F.col("a").alias("t"))
    )
    deg = dirs.groupBy(F.col("s").alias("n")).agg(F.count("*").cast("long").alias("deg"))
    j = (
        dirs.join(deg.select(F.col("n").alias("s"), F.col("deg").alias("x")), "s")
        .join(deg.select(F.col("n").alias("t"), F.col("deg").alias("y")), "t")
    )
    sums = j.agg(
        F.count("*").cast("long").alias("mm"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
    )
    md = F.col("mm").cast("double")
    sxd = F.col("sx").cast("double")
    return sums.select(
        F.col("mm").alias("n_directed_edges"),
        F.col("sx").alias("sum_deg"),
        F.col("sxx").alias("sum_deg_sq"),
        F.col("sxy").alias("sum_deg_prod"),
        ((md * F.col("sxy") - sxd * F.col("sx")) / (md * F.col("sxx") - sxd * F.col("sx"))).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# SLIDING (overlapping) streaming windows — the tumbling/session surface
# exists; this is the third window kind: 2h windows sliding every 1h, so
# every event lands in exactly TWO windows. The oracle materializes the
# same assignment as a 2-way UNION of hour-truncations. State size is
# windows×groups, eviction by watermark — the standard overlapping-window
# monitoring shape.
# ---------------------------------------------------------------------------

@register(
    "stream_sliding_windowed_agg",
    """
    WITH e AS (
      SELECT event_type, epoch_ms(epoch_ns(ts) // 1000000) AS t,
             CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    assigned AS (
      SELECT date_trunc('hour', t) AS window_start, event_type, v FROM e
      UNION ALL
      SELECT date_trunc('hour', t) - INTERVAL 1 HOUR, event_type, v FROM e
    )
    SELECT window_start, event_type, count(*) AS n,
           CAST(sum(v) AS BIGINT) AS sum_floor_value
    FROM assigned GROUP BY window_start, event_type
    """,
    doc="sliding 2h/1h streaming windows (overlapping — every event in "
        "exactly 2 windows) with a 10min watermark through availableNow; "
        "completes the tumbling/sliding/session window surface. Oracle "
        "assigns each event to both its windows via a 2-way union of hour "
        "truncations",
)
def stream_sliding_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="stream_slide_")
    ev.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/in")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.floor("value").cast("long")).cast("long").alias("sum_floor_value"),
        )
    )
    sink = f"slide_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(sink).select(
        F.col("w.start").alias("window_start"), "event_type", "n", "sum_floor_value"
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator over user lifetimes with right-censoring
# — the churn/retention analysis in its statistically honest form (naive
# retention curves ignore censoring; the synthetic corpus keeps every
# user active ~the whole 29-day span, so the horizon is 6h). Lifetimes
# and at-risk counts are
# exact integers; the survival product is an ORDERED fold over the
# limit-bounded death-time table (earliest 64), so no global window
# exists anywhere in the plan: at-risk counts come from a broadcast
# non-equi join of the 64-row table against users (linear), and the
# prefix products from one in-row aggregate fold.
# ---------------------------------------------------------------------------

@register(
    "analytic_kaplan_meier",
    """
    WITH ev AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS secs FROM events
    ),
    g AS (SELECT max(secs) AS gmax FROM ev),
    u AS (
      SELECT user_id,
             (max(secs) - min(secs)) // 3600 AS dur,
             CASE WHEN max(secs) <= (SELECT gmax FROM g) - 6 * 3600
                  THEN 1 ELSE 0 END AS churned
      FROM ev GROUP BY user_id
    ),
    dt AS (
      SELECT dur AS t, count(*)::BIGINT AS d FROM u
      WHERE churned = 1 GROUP BY dur ORDER BY t LIMIT 64
    ),
    risk AS (
      SELECT dt.t, count(*)::BIGINT AS n
      FROM dt JOIN u ON u.dur >= dt.t GROUP BY dt.t
    ),
    l AS (
      SELECT list({'t': dt.t, 'd': dt.d, 'n': risk.n} ORDER BY dt.t) AS a
      FROM dt JOIN risk ON dt.t = risk.t
    ),
    r AS (
      -- generate_series as a LIST expression: the table-function form
      -- cannot take lateral column parameters in DuckDB 1.0.0
      SELECT unnest(list_transform(generate_series(1, len(a)), i -> {
        't': a[i].t, 'n_risk': a[i].n, 'n_deaths': a[i].d,
        'km_survival': list_reduce(
          list_transform(a[1:i],
            y -> 1.0 - CAST(y.d AS DOUBLE) / CAST(y.n AS DOUBLE)),
          (p, q) -> p * q)
      })) AS s
      FROM l
    )
    SELECT s.t AS t, s.n_risk AS n_risk, s.n_deaths AS n_deaths,
           s.km_survival AS km_survival
    FROM r
    """,
    doc="Kaplan-Meier survival over user lifetimes (hours active) with "
        "right-censoring at 6h before corpus end: S(t) = prod(1 - d/n) "
        "over the earliest 64 death times — exact integer d/n, at-risk "
        "via broadcast non-equi join, survival via one ordered in-row "
        "fold; zero global windows",
)
def analytic_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / 1_000_000).cast("long").alias("secs")
    )
    g = ev.agg(F.max("secs").alias("gmax"))
    u = (
        ev.groupBy("user_id")
        .agg(F.min("secs").alias("lo"), F.max("secs").alias("hi"))
        .crossJoin(F.broadcast(g))
        .select(
            "user_id",
            ((F.col("hi") - F.col("lo")) / 3600).cast("long").alias("dur"),
            F.when(F.col("hi") <= F.col("gmax") - 6 * 3600, 1)
            .otherwise(0)
            .alias("churned"),
        )
    )
    dt = (
        u.filter(F.col("churned") == 1)
        .groupBy(F.col("dur").alias("t"))
        .agg(F.count("*").cast("long").alias("d"))
        .orderBy("t")
        .limit(64)
    )
    risk = (
        u.join(F.broadcast(dt), u.dur >= dt.t)
        .groupBy("t")
        .agg(F.count("*").cast("long").alias("n"))
    )
    rows = dt.join(risk, "t")
    l = rows.agg(
        F.array_sort(F.collect_list(F.struct("t", "d", "n"))).alias("a")
    )
    return l.select(
        F.explode(
            F.expr(
                "transform(a, (x, i) -> struct("
                "x.t AS t, x.n AS n_risk, x.d AS n_deaths, "
                "aggregate(slice(a, 1, i + 1), 1.0D, "
                "(acc, y) -> acc * (1.0D - CAST(y.d AS DOUBLE) / "
                "CAST(y.n AS DOUBLE))) AS km_survival))"
            )
        ).alias("r")
    ).select("r.t", "r.n_risk", "r.n_deaths", "r.km_survival")


# ---------------------------------------------------------------------------
# Modularity audit of a community assignment (Newman-Girvan Q): given a
# labeling, how much denser within communities than a random graph with
# the same degree sequence — the quality gate any community-detection or
# dedup-cluster output should pass through. All counts exact integers;
# the per-community contribution from ONE shared float expression.
# ---------------------------------------------------------------------------

@register(
    "graph_modularity",
    """
    WITH und AS (
      SELECT DISTINCT
             least(o_custkey % 2000, o_orderkey % 2000) AS a,
             greatest(o_custkey % 2000, o_orderkey % 2000) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0
        AND least(o_custkey % 2000, o_orderkey % 2000)
            <> greatest(o_custkey % 2000, o_orderkey % 2000)
    ),
    m AS (SELECT count(*)::BIGINT AS m FROM und),
    deg AS (
      SELECT n, count(*)::BIGINT AS deg FROM (
        SELECT a AS n FROM und UNION ALL SELECT b FROM und
      ) GROUP BY n
    ),
    comm AS (
      SELECT n % 8 AS c, count(*)::BIGINT AS n_nodes, sum(deg)::BIGINT AS dsum
      FROM deg GROUP BY n % 8
    ),
    intra AS (
      SELECT a % 8 AS c, count(*)::BIGINT AS intra FROM und
      WHERE a % 8 = b % 8 GROUP BY a % 8
    )
    SELECT comm.c AS community, n_nodes,
           COALESCE(intra.intra, 0)::BIGINT AS intra_edges,
           dsum AS degree_sum,
           CAST(COALESCE(intra.intra, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
             - (CAST(dsum AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
               * (CAST(dsum AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))) AS q_contrib
    FROM comm CROSS JOIN m LEFT JOIN intra ON comm.c = intra.c
    """,
    doc="Newman-Girvan modularity per community of a given labeling "
        "(node %% 8) on the undirected orders graph: Q_c = L_c/m - "
        "(D_c/2m)^2 — exact integer edge/degree counts, one shared float "
        "expression; the audit for dedup-cluster / community outputs",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    und = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.least(F.col("o_custkey") % 2000, F.col("o_orderkey") % 2000).alias("a"),
            F.greatest(F.col("o_custkey") % 2000, F.col("o_orderkey") % 2000).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    m = und.agg(F.count("*").cast("long").alias("m"))
    deg = (
        und.select(F.col("a").alias("n"))
        .unionAll(und.select(F.col("b").alias("n")))
        .groupBy("n")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    comm = deg.groupBy((F.col("n") % 8).alias("c")).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("deg").cast("long").alias("dsum"),
    )
    intra = (
        und.filter(F.col("a") % 8 == F.col("b") % 8)
        .groupBy((F.col("a") % 8).alias("c"))
        .agg(F.count("*").cast("long").alias("intra"))
    )
    j = (
        comm.crossJoin(F.broadcast(m))
        .join(F.broadcast(intra), "c", "left")
        .withColumn("intra", F.coalesce(F.col("intra"), F.lit(0)).cast("long"))
    )
    md = F.col("m").cast("double")
    dsd = F.col("dsum").cast("double")
    return j.select(
        F.col("c").alias("community"),
        "n_nodes",
        F.col("intra").alias("intra_edges"),
        F.col("dsum").alias("degree_sum"),
        (F.col("intra").cast("double") / md - (dsd / (2.0 * md)) * (dsd / (2.0 * md))).alias("q_contrib"),
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (STL-lite): daily series = day-of-week seasonal
# mean + residual — the first-pass structure/anomaly split of time-series
# QA. Integer daily totals; the seasonal mean and residual from shared
# float expressions; the dow table is 7 rows, broadcast.
# ---------------------------------------------------------------------------

@register(
    "analytic_seasonal_decompose",
    """
    WITH d AS (
      SELECT CAST(date_trunc('day', epoch_ms(epoch_ns(ts) // 1000000)) AS DATE) AS day,
             CAST(floor(value) AS BIGINT) AS v
      FROM events
    ),
    daily AS (
      SELECT day, sum(v)::BIGINT AS total FROM d GROUP BY day
    ),
    season AS (
      SELECT isodow(day) - 1 AS dow,
             sum(total)::BIGINT AS s, count(*)::BIGINT AS c
      FROM daily GROUP BY isodow(day) - 1
    )
    SELECT strftime(daily.day, '%Y-%m-%d') AS day, daily.total,
           CAST(isodow(daily.day) - 1 AS BIGINT) AS dow,
           CAST(season.s AS DOUBLE) / season.c AS seasonal,
           daily.total - CAST(season.s AS DOUBLE) / season.c AS residual
    FROM daily JOIN season ON isodow(daily.day) - 1 = season.dow
    """,
    doc="seasonal decomposition of the daily event-value series: "
        "day-of-week seasonal means (exact integer sums/counts, 7-row "
        "broadcast) + residuals — the structure/anomaly split before "
        "alerting on a periodic series",
)
def analytic_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.floor("value").cast("long").alias("v"),
        )
        .groupBy("day")
        .agg(F.sum("v").cast("long").alias("total"))
    )
    season = daily.groupBy(F.weekday("day").alias("dow")).agg(
        F.sum("total").cast("long").alias("s"),
        F.count("*").cast("long").alias("c"),
    )
    seasonal = F.col("s").cast("double") / F.col("c")
    return (
        daily.withColumn("dow", F.weekday("day"))
        .join(F.broadcast(season), "dow")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "total", F.col("dow").cast("long").alias("dow"),
            seasonal.alias("seasonal"),
            (F.col("total") - seasonal).alias("residual"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming top-k heavy hitters: tumbling-hour per-user counts maintained
# by Structured Streaming (watermark + availableNow), then the top-3
# hitters per window ranked on the materialized aggregate — the standard
# split for a rank-over-stream (rank is not incrementally maintainable in
# append mode; the streamed state is the mergeable count table, the rank
# is a cheap partitioned window over it).
# ---------------------------------------------------------------------------

@register(
    "stream_topk_heavy_hitters",
    """
    WITH e AS (
      SELECT user_id, date_trunc('hour', epoch_ms(epoch_ns(ts) // 1000000)) AS w
      FROM events
    ),
    c AS (SELECT w AS window_start, user_id, count(*)::BIGINT AS n
          FROM e GROUP BY w, user_id),
    r AS (
      SELECT window_start, user_id, n,
             row_number() OVER (
               PARTITION BY window_start ORDER BY n DESC, user_id
             ) AS rank
      FROM c
    )
    SELECT window_start, user_id, n, CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3
    """,
    doc="streaming top-k heavy hitters: tumbling 1h per-user counts "
        "through Structured Streaming (10min watermark, availableNow), "
        "top-3 per window ranked on the materialized aggregate with a "
        "window-partitioned row_number (ties by user_id) — per-window "
        "group cardinality bounds the rank partition",
)
def stream_topk_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events")
    base = tempfile.mkdtemp(prefix="stream_topk_")
    ev.write.mode("overwrite").parquet(f"{base}/in")
    stream = spark.readStream.schema(ev.schema).parquet(f"{base}/in")
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n"))
    )
    sink = f"topk_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    counts = spark.table(sink).select(
        F.col("w.start").alias("window_start"), "user_id", "n"
    )
    rw = Window.partitionBy("window_start").orderBy(F.desc("n"), F.col("user_id"))
    return (
        counts.withColumn("rank", F.row_number().over(rw).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("window_start", "user_id", "n", "rank")
    )


# ---------------------------------------------------------------------------
# Size-balanced shard assignment — the training-data packaging step: docs
# ranked by size (ties by id) are dealt round-robin across 8 shards, so
# shard totals differ by at most a few large-item sizes and every engine
# reproduces the identical assignment. The global rank is computed by the
# two-level bucket prefix sum (extensions/sampling.two_level_order — the
# same device sample_pack_contexts uses): range-bucket on n_chars,
# partitioned within-bucket row_number, broadcast bucket offsets. NO
# single-partition window over the corpus; identical ranks.
# ---------------------------------------------------------------------------

@register(
    "sample_shard_assignment",
    """
    WITH ranked AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    )
    SELECT CAST((rk - 1) % 8 AS BIGINT) AS shard,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM ranked GROUP BY (rk - 1) % 8
    """,
    doc="size-balanced shard assignment: docs ranked by size dealt "
        "round-robin across 8 shards — deterministic, reproducible "
        "training-shard packaging with imbalance bounded by item sizes; "
        "per-shard totals verified exactly",
)
def sample_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    docs = load_table(spark, sf_dir, "documents")
    ranked = two_level_order(
        docs.select("doc_id", "n_chars"), key_col="n_chars", tie_col="doc_id"
    )
    return (
        ranked.select(
            ((F.col("rk") - 1) % 8).cast("long").alias("shard"),
            "doc_id",
            "n_chars",
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("first_doc"),
        )
    )


# ---------------------------------------------------------------------------
# Robust outlier detection via median absolute deviation — the robust twin
# of analytic_zscore_outliers: mean/stddev are dragged by the outliers they
# are supposed to find; median/MAD are not (50% breakdown point). Two
# median passes (the exact-percentile definition both engines share
# bit-for-bit on integer-derived inputs), group stats broadcast back,
# flag |x - med| > 5*MAD. At 100 TB each pass is one aggregation; for
# groups beyond executor memory the same shape runs on the bottom-k
# quantile sketch instead.
# ---------------------------------------------------------------------------

@register(
    "analytic_anomaly_mad",
    """
    WITH v AS (SELECT event_type, CAST(floor(value) AS BIGINT) AS x FROM events),
    med AS (SELECT event_type, quantile_cont(x, 0.5) AS med FROM v GROUP BY event_type),
    dev AS (
      SELECT v.event_type, v.x, m.med, abs(CAST(v.x AS DOUBLE) - m.med) AS adev
      FROM v JOIN med m USING (event_type)
    ),
    mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY event_type)
    SELECT d.event_type, count(*) AS n,
           max(d.med) AS med, max(m.mad) AS mad,
           CAST(sum(CASE WHEN d.adev > 5 * m.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
    doc="robust outliers via median absolute deviation: two exact-median "
        "passes (shared interpolation definition — bit-identical on "
        "integer inputs), group stats broadcast back, flag |x-med| > "
        "5*MAD. The 50%-breakdown twin of the z-score detector: one "
        "extreme value cannot mask itself by inflating the spread",
)
def analytic_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = events.select("event_type", F.floor("value").cast("long").alias("x"))
    med = v.groupBy("event_type").agg(F.expr("percentile(x, 0.5)").alias("med"))
    dev = v.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.expr("abs(CAST(x AS DOUBLE) - med)")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("med").alias("med"),
            F.max("mad").alias("mad"),
            F.sum(F.when(F.expr("adev > 5 * mad"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Mid-stream schema evolution e2e — the CDC-completeness record: batch 1
# inserts rows on the OLD schema; batch 2 opens with a Debezium schema-
# change envelope (ALTER TABLE ... ADD COLUMN, applied FIRST within the
# batch, as the reference pauses the connector to do synchronously —
# main.go:70-121) and then streams DML that CARRIES the new column. The
# pipeline must evolve the state store (old rows -> NULL), re-bind the
# decode field list (C5 is build-time bound, so a stale binding would
# FIELD_NOT_FOUND the whole slice), and land the new column's values —
# all verified value-exact against a pure-SQL oracle.
# ---------------------------------------------------------------------------

@register(
    "stream_cdc_add_column",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 2 = 0
                THEN o_totalprice + 1000.0 ELSE o_totalprice END AS o_totalprice,
           CASE WHEN o_orderkey % 3 = 1 OR (o_orderkey % 3 = 0 AND o_orderkey % 2 = 0)
                THEN 'n' || CAST(o_orderkey AS VARCHAR) END AS o_note
    FROM orders WHERE o_orderkey % 3 IN (0, 1)
    """,
    doc="mid-stream ADD COLUMN e2e: old-schema inserts (batch 1), then a "
        "schema-change envelope + DML carrying the new column (batch 2) "
        "through the full pipeline — state store evolved (old rows NULL), "
        "wire-field binding refreshed, new values landed; the streaming "
        "analog of reference main.go's pause->exec(ddl)->resume",
)
def stream_cdc_add_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import tempfile

    from etl_consumer_spark.config import Config
    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore
    from etl_consumer_spark.sources.envelope import WireField
    from etl_consumer_spark.sources.kafka import file_envelope_stream
    from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    old_t = "struct<o_orderkey:long,o_totalprice:double>"
    new_t = "struct<o_orderkey:long,o_totalprice:double,o_note:string>"
    note = F.concat(F.lit("n"), k.cast("string"))

    def env(before, after, pos):
        return F.to_json(
            F.struct(
                F.struct(
                    before.alias("before"),
                    after.alias("after"),
                    F.struct(
                        F.lit("srv").alias("name"),
                        F.lit("db0").alias("db"),
                        F.lit("orders").alias("table"),
                        pos.alias("pos"),
                        F.lit(0).alias("row"),
                    ).alias("source"),
                    F.lit("c").alias("op"),
                    F.lit(0).cast("long").alias("ts_ms"),
                ).alias("payload")
            )
        )

    def transport(topic, value):
        return F.struct(
            topic.alias("topic"),
            value.cast("binary").alias("value"),
            F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
            F.lit(None).cast("timestamp").alias("timestamp"),
        )

    old_row = F.struct("o_orderkey", "o_totalprice")
    new_ins = F.struct(F.col("o_orderkey"), F.col("o_totalprice"), note.alias("o_note"))
    new_upd = F.struct(
        F.col("o_orderkey"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
        note.alias("o_note"),
    )
    # batch 1: inserts on the OLD schema
    b1 = orders.filter(k % 3 == 0).select(
        transport(
            F.lit("srv.db0.orders"), env(F.lit(None).cast(old_t), old_row, F.lit(1))
        ).alias("r")
    ).select("r.*")
    # batch 2: the schema-change envelope FIRST, then DML carrying o_note
    ddl_json = json.dumps(
        {
            "payload": {
                "source": {"name": "srv", "db": "db0", "table": "orders"},
                "databaseName": "db0",
                "ddl": "ALTER TABLE `db0`.`orders` ADD COLUMN o_note VARCHAR(32)",
            }
        }
    )
    ddl_row = spark.range(1).select(
        transport(F.lit("srv"), F.lit(ddl_json)).alias("r")
    ).select("r.*")
    ins2 = orders.filter(k % 3 == 1).select(
        transport(
            F.lit("srv.db0.orders"), env(F.lit(None).cast(new_t), new_ins, F.lit(2))
        ).alias("r")
    ).select("r.*")
    old_row_as_new = F.struct(
        F.col("o_orderkey"),
        F.col("o_totalprice"),
        F.lit(None).cast("string").alias("o_note"),
    )
    upd2 = orders.filter((k % 3 == 0) & (k % 2 == 0)).select(
        transport(
            F.lit("srv.db0.orders"),
            env(old_row_as_new, new_upd, F.lit(2)),
        ).alias("r")
    ).select("r.*")
    base = tempfile.mkdtemp(prefix="stream_addcol_")
    seen: set[str] = set()
    b1.coalesce(1).write.mode("append").parquet(f"{base}/transport")
    _pin_batch_order(f"{base}/transport", seen, 1)
    ddl_row.unionByName(ins2).unionByName(upd2).coalesce(1).write.mode("append").parquet(
        f"{base}/transport"
    )
    _pin_batch_order(f"{base}/transport", seen, 2)

    cfg = Config()
    cfg.server, cfg.db_name, cfg.tables = "srv", "db0", ["orders"]
    fields = [WireField("o_orderkey", "int64"), WireField("o_totalprice", "float64")]
    store = PartitionedParquetStateStore(spark, f"{base}/state")
    store.init("orders", orders.limit(0), ["o_orderkey"])
    pipe = CDCPipeline(spark, cfg, [TableSpec("orders", fields, ["o_orderkey"])], store)
    q = pipe.start(
        file_envelope_stream(spark, f"{base}/transport", max_files_per_trigger=1),
        checkpoint_dir=f"{base}/ckpt",
        trigger_available_now=True,
    )
    q.awaitTermination(300)
    return store.read("orders").select("o_orderkey", "o_totalprice", "o_note")


# ---------------------------------------------------------------------------
# Full IVF-PQ search (Jegou et al., PAMI'11): coarse quantizer prunes to
# n_probe clusters, PQ asymmetric distances shortlist WITHOUT touching raw
# candidate vectors, exact cosine reranks the survivors. The oracle replays
# the ENTIRE stack in SQL (coarse assign -> probes -> PQ encode -> ADC
# shortlist -> rerank), value-exact — the same unrolled-oracle pattern as
# sim_ivf_kmeans_rerank.
# ---------------------------------------------------------------------------

_IVFPQ_QSET = "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20"


def _ivfpq_oracle_sql() -> str:
    sub16 = "{src}[(sp.s * 16 + 1):(sp.s * 16 + 16)]"
    d2_16 = (
        "list_sum(list_transform(generate_series(1, 16), "
        "i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE)))"
    )
    return f"""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec FROM embeddings ORDER BY vec_id LIMIT 16
    ),
    q0 AS ({_IVFPQ_QSET}),
    qp_scored AS (
      SELECT q.vec_id, c.cid, {_cos_sql('q.embedding', 'c.cvec')} AS csim FROM q0 q, cents c
    ),
    qprobe AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        FROM qp_scored) t WHERE rn <= 4
    ),
    ca_scored AS (
      SELECT e.vec_id, c.cid, {_cos_sql('e.embedding', 'c.cvec')} AS csim
      FROM embeddings e, cents c
    ),
    cassign AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS rn
        FROM ca_scored) t WHERE rn = 1
    ),
    cand AS (
      SELECT qp.vec_id AS q_id, ca.vec_id
      FROM qprobe qp JOIN cassign ca ON ca.cid = qp.cid AND ca.vec_id <> qp.vec_id
    ),
    sp AS (SELECT unnest([0, 1, 2, 3]) AS s),
    cb AS (
      SELECT vec_id AS cbid, embedding AS cemb FROM embeddings ORDER BY vec_id LIMIT 8
    ),
    csub AS (
      SELECT cbid, sp.s AS subspace, {sub16.format(src='cemb')} AS cv FROM cb, sp
    ),
    sub AS (
      SELECT vec_id, sp.s AS subspace, {sub16.format(src='embedding')} AS v
      FROM embeddings, sp
    ),
    enc AS (
      SELECT sub.vec_id, sub.subspace, csub.cbid,
             {d2_16.format(a='sub.v', b='csub.cv')} AS dist2
      FROM sub JOIN csub ON sub.subspace = csub.subspace
    ),
    codes AS (
      SELECT vec_id, subspace, cbid AS code FROM (
        SELECT vec_id, subspace, cbid,
               row_number() OVER (PARTITION BY vec_id, subspace
                                  ORDER BY dist2 ASC, cbid ASC) AS rnk
        FROM enc) t WHERE rnk = 1
    ),
    qsub AS (
      SELECT q0.vec_id AS q_id, sp.s AS subspace,
             {sub16.format(src='q0.embedding')} AS qv
      FROM q0, sp
    ),
    dtable AS (
      SELECT qsub.q_id, qsub.subspace, csub.cbid,
             {d2_16.format(a='qsub.qv', b='csub.cv')} AS qd
      FROM qsub JOIN csub ON qsub.subspace = csub.subspace
    ),
    per AS (
      SELECT cand.q_id, cand.vec_id, codes.subspace AS s, dtable.qd
      FROM cand
      JOIN codes ON codes.vec_id = cand.vec_id
      JOIN dtable ON dtable.subspace = codes.subspace
                 AND dtable.cbid = codes.code
                 AND dtable.q_id = cand.q_id
    ),
    adc AS (
      SELECT q_id, vec_id,
             coalesce(max(CASE WHEN s = 0 THEN qd END), 0.0)
           + coalesce(max(CASE WHEN s = 1 THEN qd END), 0.0)
           + coalesce(max(CASE WHEN s = 2 THEN qd END), 0.0)
           + coalesce(max(CASE WHEN s = 3 THEN qd END), 0.0) AS adc_dist2
      FROM per GROUP BY q_id, vec_id
    ),
    short AS (
      SELECT q_id, vec_id FROM (
        SELECT q_id, vec_id,
               row_number() OVER (PARTITION BY q_id
                                  ORDER BY adc_dist2 ASC, vec_id ASC) AS rnk
        FROM adc) t WHERE rnk <= 10
    ),
    rr AS (
      SELECT s.q_id AS query_id, s.vec_id AS neighbor_id,
             {_cos_sql('qe.embedding', 'ce.embedding')} AS cos_sim
      FROM short s
      JOIN q0 qe ON qe.vec_id = s.q_id
      JOIN embeddings ce ON ce.vec_id = s.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM rr
    )
    SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= 3
    """


@register(
    "sim_ivfpq_search",
    _ivfpq_oracle_sql(),
    doc="full IVF-PQ search (Jegou PAMI'11, the billion-vector ANN stack): "
        "coarse 4-of-16 probe prunes the corpus, PQ codes (4 subspaces x 16 "
        "dims, 8-entry codebooks) give an asymmetric-distance top-10 "
        "shortlist WITHOUT touching raw candidate vectors, exact cosine "
        "reranks to top-3. Fixed 20-vector query set. Scale shape: after "
        "encode, per-query work is an equi-join on cluster id against the "
        "code table (n_sub bytes/vector in flight) plus 10 raw-vector reads; "
        "the oracle replays the entire stack value-exact",
)
def sim_ivfpq_search_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return S.ivfpq_search(
        queries, emb, n_clusters=16, n_probe=4, n_sub=4, sub_dim=16,
        k_codebook=8, shortlist=10, k=3,
    )


# ---------------------------------------------------------------------------
# E4/E5 as a value-checked oracle query (VERDICT r5 #7): parse-error rows
# are dropped (E4), empty-DDL schema rows dead-letter (E5), good rows parse
# and decode — counts and a decoded-key checksum per route, all through the
# REAL routing/parsing operators the pipeline composes.
# ---------------------------------------------------------------------------

@register(
    "e4_e5_error_routing",
    """
    WITH o AS (SELECT o_orderkey AS k FROM orders)
    SELECT 'parsed' AS route, count(*)::BIGINT AS n, sum(k)::BIGINT AS key_sum
      FROM o WHERE k % 10 <> 7 AND k % 10 <> 3
    UNION ALL
    SELECT 'parse_error_dropped', count(*)::BIGINT, NULL::BIGINT
      FROM o WHERE k % 10 = 7
    UNION ALL
    SELECT 'ddl_dead_letter', count(*)::BIGINT, NULL::BIGINT
      FROM o WHERE k % 10 = 3
    """,
    doc="E4 (parse-error skip) + E5 (schema-error dead-letter) value-checked: "
        "a synthesized wire batch (10% malformed JSON, 10% empty-DDL schema "
        "envelopes, 80% valid DML) flows through route_dml/route_schema + "
        "from_json envelope parsing; malformed rows surface as NULL payloads "
        "and are dropped (reference main.go:130-134 logs-and-continues), "
        "empty DDL dead-letters (main.go:92-99), and the parsed route's "
        "decoded-key checksum proves the good rows actually decode. "
        "Map-only routing + 3 scalar aggregates — no shuffle grows with data",
)
def e4_e5_error_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.routing import (
        drop_tombstones,
        is_empty_ddl,
        route_dml,
        route_schema,
    )
    from etl_consumer_spark.sources.envelope import (
        parse_ddl_envelope,
        parse_dml_envelope,
    )

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    k = F.col("o_orderkey")
    dml_json = F.to_json(
        F.struct(
            F.struct(
                F.lit(None).cast("struct<id:bigint>").alias("before"),
                F.struct(k.alias("id")).alias("after"),
                F.struct(
                    F.lit("srv").alias("name"),
                    F.lit("db0").alias("db"),
                    F.lit("orders").alias("table"),
                    k.alias("pos"),
                    F.lit(0).alias("row"),
                ).alias("source"),
                F.lit("c").alias("op"),
                F.lit(0).cast("long").alias("ts_ms"),
            ).alias("payload")
        )
    )
    empty_ddl_json = F.to_json(
        F.struct(
            F.struct(
                F.struct(
                    F.lit("srv").alias("name"),
                    F.lit("db0").alias("db"),
                    F.lit("orders").alias("table"),
                ).alias("source"),
                F.lit("db0").alias("databaseName"),
                F.lit("").alias("ddl"),
            ).alias("payload")
        )
    )
    topic = F.when(k % 10 == 3, F.lit("srv")).otherwise(F.lit("srv.db0.orders"))
    value = (
        F.when(k % 10 == 7, F.concat(F.lit("{not json "), k.cast("string")))
        .when(k % 10 == 3, empty_ddl_json)
        .otherwise(dml_json)
    )
    batch = o.select(topic.alias("topic"), value.alias("value"))
    dml = parse_dml_envelope(drop_tombstones(route_dml(batch, "srv")))
    parsed = dml.filter(F.col("envelope.payload").isNotNull()).agg(
        F.lit("parsed").alias("route"),
        F.count("*").alias("n"),
        F.sum(F.col("envelope.payload.after.id")).alias("key_sum"),
    )
    perr = dml.filter(F.col("envelope.payload").isNull()).agg(
        F.lit("parse_error_dropped").alias("route"),
        F.count("*").alias("n"),
        F.lit(None).cast("long").alias("key_sum"),
    )
    ddl = parse_ddl_envelope(route_schema(batch, "srv"))
    dead = ddl.filter(is_empty_ddl(F.col("ddl_envelope.payload.ddl"))).agg(
        F.lit("ddl_dead_letter").alias("route"),
        F.count("*").alias("n"),
        F.lit(None).cast("long").alias("key_sum"),
    )
    return parsed.unionByName(perr).unionByName(dead)


# ---------------------------------------------------------------------------
# timezone_hours beyond the default (VERDICT r5 #8): the reference hardcodes
# ±7 h (main.go:271, 296); the engine parameterizes it (config.py
# timezone_hours) — prove the flag actually threads through bind_decoder by
# decoding at 0 and −5.
# ---------------------------------------------------------------------------

@register(
    "f_decode_tz_offsets",
    """
    SELECT event_id,
           epoch_ms(epoch_ns(ts) // 1000000) + INTERVAL 5 HOUR AS t_tz_m5,
           epoch_ms(epoch_ns(ts) // 1000000) AS t_tz_0,
           strptime(
             replace(replace(strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%dT%H:%M:%SZ'), 'T', ' '), 'Z', ''),
             '%Y-%m-%d %H:%M:%S') - INTERVAL 5 HOUR AS z_tz_m5
    FROM events
    """,
    doc="F3/F5 decode chain at NON-default timezone offsets through "
        "bind_decoder (not the raw functions): tz_hours=-5 and 0. F3's "
        "WithTimezone READS back by tz_hours (reference main.go:271 "
        "subtracts), so -5 adds 5h; F5 WRITES forward (main.go:296 adds), "
        "so -5 subtracts 5h — the asymmetry is the reference's own",
)
def f_decode_tz_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.sources.envelope import (
        TIMESTAMP as WT_TIMESTAMP,
        ZONEDTS as WT_ZONEDTS,
        WireField,
        bind_decoder,
    )

    ev = load_table(spark, sf_dir, "events")
    f_ts = WireField("t", "int64", logical=WT_TIMESTAMP)
    f_z = WireField("z", "string", logical=WT_ZONEDTS)
    ms_raw = F.unix_millis("ts").cast("string")
    iso = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    return ev.select(
        "event_id",
        bind_decoder(f_ts, ms_raw, with_timezone=True, tz_hours=-5).alias("t_tz_m5"),
        bind_decoder(f_ts, ms_raw, with_timezone=True, tz_hours=0).alias("t_tz_0"),
        bind_decoder(f_z, iso, tz_hours=-5).alias("z_tz_m5"),
    )


# ---------------------------------------------------------------------------
# BPE merge learning (Sennrich ACL'16): the tokenizer-TRAINING half of the
# subword stack (text_subword_tokenize is inference). Deterministic by
# construction (exact integer pair counts, lexicographic tie-break), so the
# oracle replays the entire unrolled merge loop — the kmeans/k-center
# unrolled-oracle pattern applied to tokenizer training.
# ---------------------------------------------------------------------------

def _bpe_oracle_sql(n_merges: int = 4) -> str:
    parts = [
        r"""w0 AS MATERIALIZED (
      SELECT word, count(*)::BIGINT AS freq,
             ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS seq
      FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
            FROM documents) t
      WHERE length(word) >= 2 GROUP BY word
    )"""
    ]
    selects = []
    for i in range(1, n_merges + 1):
        prev = f"w{i-1}"
        parts.append(f"""p{i} AS MATERIALIZED (
      SELECT pr['l'] AS l, pr['r'] AS r, sum(freq)::BIGINT AS cnt FROM (
        SELECT unnest(list_transform(generate_series(1, len(syms)-1),
                      j -> {{'l': syms[j], 'r': syms[j+1]}})) AS pr, freq
        FROM (SELECT string_split(trim(seq), ' ') AS syms, freq FROM {prev}) s
      ) x GROUP BY 1, 2
    )""")
        parts.append(
            f"b{i} AS MATERIALIZED (SELECT l, r, cnt FROM p{i} "
            f"ORDER BY cnt DESC, l ASC, r ASC LIMIT 1)"
        )
        if i < n_merges:
            # greedy left-to-right merge fold (NOT a literal replace:
            # consecutive matches share their delimiting space, so runs
            # like 'a a a a' would merge only every other pair)
            parts.append(f"""w{i} AS MATERIALIZED (
      SELECT word, freq,
             list_reduce(list_prepend(' ', string_split(trim(seq), ' ')),
               (acc, s) -> CASE
                 WHEN s = b.r AND ends_with(acc, ' ' || b.l || ' ')
                 THEN substr(acc, 1, len(acc) - len(b.l) - 1) || b.l || b.r || ' '
                 ELSE acc || s || ' ' END) AS seq
      FROM {prev}, b{i} b
    )""")
        selects.append(
            f"SELECT {i} AS merge_rank, l AS merge_left, r AS merge_right, "
            f"l || r AS merged, cnt AS pair_count FROM b{i}"
        )
    return "WITH " + ",\n    ".join(parts) + "\n    " + "\n    UNION ALL\n    ".join(selects)


@register(
    "text_bpe_learn",
    _bpe_oracle_sql(4),
    doc="distributed BPE merge learning (Sennrich ACL'16), 4 merges over the "
        "documents corpus: word-frequency table (vocabulary-bounded, Heaps' "
        "law), per-round overlap-counted adjacent-pair counts with map-side "
        "combine, lexicographic tie-break, literal-replace merge rewrite. "
        "Bit-reproducible, so the oracle replays the ENTIRE unrolled loop "
        "(MATERIALIZED CTE chain). Driver traffic: exactly one row per "
        "merge (TakeOrdered(1) — the kmeans-centroid contract)",
)
def text_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.text_analysis import bpe_learn

    docs = load_table(spark, sf_dir, "documents")
    return bpe_learn(docs, n_merges=4)


# ---------------------------------------------------------------------------
# Parquet compression codecs (the 100 TB storage decision): the same corpus
# written under snappy/gzip/zstd/lz4 must read back bit-identical — content
# preservation proved per codec by the order-insensitive md5-XOR fingerprint
# (the layout_compaction device), recomputed by the oracle from the ORIGINAL
# table. Codec choice changes bytes on disk, never values.
# ---------------------------------------------------------------------------

_CODECS = ("snappy", "gzip", "zstd", "lz4")

@register(
    "source_compression_codecs",
    "\n    UNION ALL\n".join(
        f"""
    SELECT '{c}' AS codec, count(*) AS n_rows,
           bit_xor(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text), 1, 12))::BIGINT)
             AS content_fp
    FROM documents"""
        for c in _CODECS
    ),
    doc="parquet codec roundtrip (snappy/gzip/zstd/lz4 — the 100 TB "
        "storage-footprint decision): per codec, the corpus is written, "
        "re-read, and fingerprinted with the order-insensitive per-row "
        "md5-XOR; the oracle recomputes the fingerprint from the ORIGINAL "
        "table, so any codec that lost/mutated/duplicated a row flips the "
        "hash. Compressed sizes are logged as files, not oracle-compared "
        "(they are codec-version-dependent); values never are",
)
def source_compression_codecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    base = tempfile.mkdtemp(prefix="codecs_")
    outs = []
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("doc_id").cast("string"), F.lit(":"), F.col("text")
                ).cast("binary")
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    for codec in _CODECS:
        path = f"{base}/{codec}"
        docs.write.mode("overwrite").option("compression", codec).parquet(path)
        back = spark.read.parquet(path)
        outs.append(
            back.select(h.alias("fp")).agg(
                F.lit(codec).alias("codec"),
                F.count("*").alias("n_rows"),
                F.expr("bit_xor(fp)").alias("content_fp"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), outs)


# ---------------------------------------------------------------------------
# Deterministic training-epoch shuffle: every epoch reshuffles the corpus
# into a different order with ZERO RNG (hash of epoch:doc_id), so data
# loading is reproducible run-to-run and resumable mid-epoch — the
# dataloader contract of a multi-epoch LLM training run. Shard-partitioned
# windows only (no global sort).
# ---------------------------------------------------------------------------

@register(
    "sample_epoch_shuffle",
    """
    WITH e AS (SELECT unnest([0, 1, 2]) AS epoch),
    x AS (
      SELECT e.epoch, d.doc_id,
             md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS hkey
      FROM documents d, e
    ),
    s AS (
      SELECT epoch, doc_id, hkey,
             ('0x' || substr(hkey, 1, 12))::BIGINT % 8 AS shard
      FROM x
    )
    SELECT epoch, shard, doc_id,
           CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY hkey) AS INT) AS pos
    FROM s
    """,
    doc="deterministic epoch-wise training shuffle (3 epochs x 8 shards): "
        "shard and in-shard position both derive from md5(epoch:doc_id), so "
        "each epoch is a DIFFERENT pseudo-random permutation, reproducible "
        "with zero RNG and resumable at any (epoch, shard, pos). Windows "
        "are (epoch, shard)-partitioned — each is 1/8 of one epoch, never a "
        "global sort; md5 keys are unique so ordering has no ties",
)
def sample_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = spark.range(3).select(F.col("id").cast("int").alias("epoch"))
    hkey = F.md5(
        F.concat(
            F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")
        ).cast("binary")
    )
    x = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch", "doc_id", hkey.alias("hkey")
    )
    shard = (F.conv(F.substring("hkey", 1, 12), 16, 10).cast("long") % 8).alias("shard")
    w = Window.partitionBy("epoch", "shard").orderBy("hkey")
    return (
        x.select("epoch", "doc_id", "hkey", shard)
        .withColumn("pos", F.row_number().over(w))
        .select("epoch", "shard", "doc_id", "pos")
    )


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test between two event groups (the A/B-test /
# data-drift significance primitive): exact integer-quantized power sums in
# ONE conditional-aggregate pass, every derived float from a SHARED
# expression string (the sketch_moments device) so both engines run the
# identical tree — one source of truth, zero drift.
# ---------------------------------------------------------------------------

_TTEST_EXPRS: tuple[tuple[str, str], ...] = (
    ("mean_a", "CAST(s1a AS DOUBLE) / 1000.0 / CAST(na AS DOUBLE)"),
    ("mean_b", "CAST(s1b AS DOUBLE) / 1000.0 / CAST(nb AS DOUBLE)"),
    ("var_a",
     "(CAST(s2a AS DOUBLE) / 1000000.0 - CAST(na AS DOUBLE) * mean_a * mean_a)"
     " / (CAST(na AS DOUBLE) - 1)"),
    ("var_b",
     "(CAST(s2b AS DOUBLE) / 1000000.0 - CAST(nb AS DOUBLE) * mean_b * mean_b)"
     " / (CAST(nb AS DOUBLE) - 1)"),
    ("se2", "var_a / CAST(na AS DOUBLE) + var_b / CAST(nb AS DOUBLE)"),
    ("t_stat", "(mean_a - mean_b) / sqrt(se2)"),
    ("welch_df",
     "se2 * se2 / ("
     "(var_a / CAST(na AS DOUBLE)) * (var_a / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1)"
     " + (var_b / CAST(nb AS DOUBLE)) * (var_b / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1))"),
)


@register(
    "analytic_welch_ttest",
    f"""
    WITH v AS (
      SELECT event_type, CAST(round(value * 1000) AS BIGINT) AS x
      FROM events WHERE event_type IN ('purchase', 'error')
    ),
    s AS (
      SELECT
        sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS na,
        sum(CASE WHEN event_type = 'purchase' THEN x ELSE 0 END)::BIGINT AS s1a,
        sum(CASE WHEN event_type = 'purchase' THEN x * x ELSE 0 END)::BIGINT AS s2a,
        sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS nb,
        sum(CASE WHEN event_type = 'error' THEN x ELSE 0 END)::BIGINT AS s1b,
        sum(CASE WHEN event_type = 'error' THEN x * x ELSE 0 END)::BIGINT AS s2b
      FROM v
    ),
    m AS (SELECT *, {_TTEST_EXPRS[0][1]} AS mean_a, {_TTEST_EXPRS[1][1]} AS mean_b FROM s),
    vv AS (SELECT *, {_TTEST_EXPRS[2][1]} AS var_a, {_TTEST_EXPRS[3][1]} AS var_b FROM m),
    se AS (SELECT *, {_TTEST_EXPRS[4][1]} AS se2 FROM vv)
    SELECT na AS n_a, nb AS n_b, mean_a, mean_b,
           {_TTEST_EXPRS[5][1]} AS t_stat,
           {_TTEST_EXPRS[6][1]} AS welch_df
    FROM se
    """,
    doc="Welch's unequal-variance t-test (purchase vs error event values): "
        "the A/B-test / distribution-drift significance primitive. ONE "
        "conditional-aggregate pass produces exact integer-quantized power "
        "sums (map-side combinable, mergeable across batches); mean/var/"
        "t/df derive from shared expression strings both engines run "
        "verbatim (the sketch_moments device), so doubles are bit-identical."
        " Welch-Satterthwaite df; sample (n-1) variances",
)
def analytic_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 1000).cast("long")
    is_a = F.col("event_type") == "purchase"
    is_b = F.col("event_type") == "error"
    s = (
        events.filter(F.col("event_type").isin("purchase", "error"))
        .select("event_type", x.alias("x"))
        .agg(
            F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("na"),
            F.sum(F.when(is_a, F.col("x")).otherwise(0)).cast("long").alias("s1a"),
            F.sum(F.when(is_a, F.expr("x * x")).otherwise(0)).cast("long").alias("s2a"),
            F.sum(F.when(is_b, 1).otherwise(0)).cast("long").alias("nb"),
            F.sum(F.when(is_b, F.col("x")).otherwise(0)).cast("long").alias("s1b"),
            F.sum(F.when(is_b, F.expr("x * x")).otherwise(0)).cast("long").alias("s2b"),
        )
    )
    for name, expr in _TTEST_EXPRS:
        s = s.withColumn(name, F.expr(expr))
    return s.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        "mean_a",
        "mean_b",
        "t_stat",
        "welch_df",
    )


# ---------------------------------------------------------------------------
# Jaccard link prediction (Liben-Nowell & Kleinberg CIKM'03) over the same
# key-derived graph as graph_triangle_count: the related-item/"you may know"
# primitive, with the wedge expansion degree-capped (the capped-LSH
# discipline) so hub nodes can never explode sum(degree^2).
# ---------------------------------------------------------------------------

@register(
    "graph_jaccard_linkpred",
    """
    WITH und AS (
      SELECT DISTINCT least(o_custkey % 400, o_orderkey % 400) AS a,
             greatest(o_custkey % 400, o_orderkey % 400) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 400 <> o_orderkey % 400
    ),
    adj AS (SELECT a AS n, b AS m FROM und UNION ALL SELECT b, a FROM und),
    deg AS (SELECT n, count(*) AS deg FROM adj GROUP BY n),
    keep AS (SELECT n FROM deg WHERE deg <= 100),
    capped AS (
      SELECT adj.n, adj.m FROM adj
      JOIN keep k1 ON k1.n = adj.n
      JOIN keep k2 ON k2.n = adj.m
    ),
    cdeg AS (SELECT n, count(*) AS deg FROM capped GROUP BY n),
    common AS (
      SELECT l.m AS node_a, r.m AS node_b, count(*)::BIGINT AS n_common
      FROM capped l JOIN capped r ON l.n = r.n AND l.m < r.m
      GROUP BY l.m, r.m HAVING count(*) >= 2
    ),
    cand AS (
      SELECT c.* FROM common c
      LEFT JOIN und ON und.a = c.node_a AND und.b = c.node_b
      WHERE und.a IS NULL
    )
    SELECT c.node_a, c.node_b, c.n_common,
           c.n_common / (da.deg + db.deg - c.n_common) AS jaccard
    FROM cand c
    JOIN cdeg da ON da.n = c.node_a
    JOIN cdeg db ON db.n = c.node_b
    """,
    doc="Jaccard link prediction over the key-derived graph: non-adjacent "
        "pairs scored by |N(a) n N(b)| / |N(a) u N(b)| (>= 2 common "
        "neighbors). Wedge expansion is degree-capped at 100 (hubs removed "
        "from the subgraph BEFORE expansion, degrees recomputed on the "
        "capped world so denominators stay consistent) — sum(degree^2) is "
        "bounded at any scale, the same discipline as the capped-LSH dedup "
        "paths",
)
def graph_jaccard_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.graph import jaccard_link_prediction

    orders = load_table(spark, sf_dir, "orders")
    edges = orders.filter(F.col("o_orderkey") % 3 == 0).select(
        (F.col("o_custkey") % 400).alias("src"),
        (F.col("o_orderkey") % 400).alias("dst"),
    )
    return jaccard_link_prediction(edges, max_degree=100, min_common=2)


# ---------------------------------------------------------------------------
# Watermark late-data semantics, value-checked: append-mode tumbling windows
# finalize when the watermark passes their end; a replay that arrives AFTER
# finalization must be dropped, not double-counted. Batch 1 (forced via
# maxFilesPerTrigger=1) advances the watermark; batch 2 replays half the
# corpus with event times BELOW it (dropped) plus an on-time slice and a
# far-future sentinel that flushes every real window before availableNow
# terminates (the stream_outer_interval_join device). The oracle counts
# exactly the surviving rows — if the engine failed to drop the late
# replays, the h1 window would double-count and hash-mismatch.
# ---------------------------------------------------------------------------

@register(
    "stream_late_data_metrics",
    """
    WITH b1 AS (SELECT event_id % 4 AS h, event_type FROM events),
    b2_ontime AS (SELECT 5 AS h, event_type FROM events WHERE event_id % 2 = 1),
    survived AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2_ontime)
    SELECT TIMESTAMP '2024-01-01 00:00:00' + INTERVAL 1 HOUR * h AS window_start,
           event_type, count(*) AS n
    FROM survived GROUP BY 1, 2
    """,
    doc="append-mode watermark late-data accounting: batch 1 places every "
        "event at T0+(id%4)h (watermark advances to T0+2.5h with a 30min "
        "delay); batch 2 sends odd ids on time at T0+5h (and gives the "
        "lagged watermark a batch to take effect — Spark's late-row filter "
        "in batch N uses the watermark computed from batches <= N-2, "
        "measured on 4.1.2 via numRowsDroppedByWatermark); batch 3 replays "
        "all even ids LATE at T0+1h — their window [1h,2h) is finalized, so "
        "they are DROPPED — plus a far-future sentinel that flushes every "
        "real window before availableNow terminates. The oracle counts only "
        "the survivors: any double-count of the 5000-row late replay flips "
        "the h1 window. This is the exactly-once-per-window contract a "
        "100 TB streaming aggregation runs on",
)
def stream_late_data_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile
    import uuid

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    t0 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    base = tempfile.mkdtemp(prefix="stream_late_")
    b1 = ev.select(
        "event_id",
        "event_type",
        (t0 + F.make_interval(hours=(F.col("event_id") % 4).cast("int"))).alias("ts"),
    )
    seen: set[str] = set()
    b1.coalesce(1).write.mode("append").parquet(f"{base}/in")
    _pin_batch_order(f"{base}/in", seen, 1)
    ontime = ev.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "event_type", (t0 + F.make_interval(hours=F.lit(5))).alias("ts")
    )
    ontime.coalesce(1).write.mode("append").parquet(f"{base}/in")
    _pin_batch_order(f"{base}/in", seen, 2)
    late = ev.filter(F.col("event_id") % 2 == 0).select(
        "event_id", "event_type", (t0 + F.make_interval(hours=F.lit(1))).alias("ts")
    )
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.lit("zz_sentinel").alias("event_type"),
        (t0 + F.make_interval(hours=F.lit(1000))).alias("ts"),
    )
    late.unionByName(sentinel).coalesce(1).write.mode("append").parquet(f"{base}/in")
    _pin_batch_order(f"{base}/in", seen, 3)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    sink = f"late_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return (
        spark.table(sink)
        .filter(F.col("event_type") != "zz_sentinel")
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


# ---------------------------------------------------------------------------
# Video scene-cut detection: the shot-boundary pass of a video-curation
# pipeline (sample frames per shot, not per file). Python only for the real
# RIFF/MJPEG decode (Arrow kernel); the detection itself is a JVM-side lag
# window over per-frame means — cut when consecutive means jump > threshold.
# ---------------------------------------------------------------------------

@register(
    "mm_video_scene_cuts",
    """
    WITH d AS (SELECT doc_id, md5(text) AS hx FROM documents),
    fr AS (SELECT unnest([0, 1, 2, 3]) AS f),
    m AS (
      SELECT doc_id, fr.f,
             sum(ascii(substr(hx, fr.f * 8 + u.i, 1))) / 8.0 AS mean_px
      FROM d, fr, unnest(generate_series(1, 8)) AS u(i)
      GROUP BY doc_id, fr.f
    ),
    dd AS (
      SELECT doc_id, f,
             abs(mean_px - lag(mean_px) OVER (PARTITION BY doc_id ORDER BY f)) AS jump
      FROM m
    )
    SELECT doc_id AS media_id, count(*)::INT AS n_frames,
           sum(CASE WHEN jump > 8.0 THEN 1 ELSE 0 END)::INT AS n_cuts,
           CAST(coalesce(min(CASE WHEN jump > 8.0 THEN f END), -1) AS INT) AS first_cut_idx
    FROM dd GROUP BY doc_id
    """,
    doc="video scene-cut detection through the REAL container+codec path "
        "(RIFF walk -> 4 MJPEG frames -> baseline JPEG decode): per-frame "
        "brightness means from the Arrow kernel, then a JVM-side "
        "media-partitioned lag window flags frame-to-frame jumps > 8 gray "
        "levels — shot boundaries for per-shot frame sampling. Means are "
        "integer-sums/8 (exact eighths), so the threshold compare is "
        "bit-identical in both engines; window is per-media, never global",
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_avi_media_table(docs, "doc_id", "text", n_frames=4)
    feats = M.extract_video_frame_features(media)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    jump = F.abs(F.col("mean_px") - F.lag("mean_px").over(w))
    return (
        feats.withColumn("jump", jump)
        .groupBy("media_id")
        .agg(
            F.count("*").cast("int").alias("n_frames"),
            F.sum(F.when(F.col("jump") > 8.0, 1).otherwise(0))
            .cast("int")
            .alias("n_cuts"),
            F.coalesce(
                F.min(F.when(F.col("jump") > 8.0, F.col("frame_idx"))), F.lit(-1)
            ).cast("int").alias("first_cut_idx"),
        )
    )


# ---------------------------------------------------------------------------
# Audio VAD segmentation: the speech-curation pass (keep voiced segments,
# drop silence/noise) — frame energies through the real WAV decode, then a
# JVM-side energy gate + gaps-and-islands segmentation. PCM is lossless and
# energies are exact integer sums, so the oracle replays the whole chain.
# ---------------------------------------------------------------------------

@register(
    "mm_audio_vad",
    """
    WITH d AS (SELECT doc_id, md5(text) AS hx FROM documents),
    fr AS (SELECT unnest([0, 1, 2, 3]) AS f),
    e AS (
      SELECT doc_id, fr.f,
             sum((ascii(substr(hx, fr.f * 8 + u.i, 1)) - 77)
                 * (ascii(substr(hx, fr.f * 8 + u.i, 1)) - 77)) AS energy
      FROM d, fr, unnest(generate_series(1, 8)) AS u(i)
      GROUP BY doc_id, fr.f
    ),
    act AS (SELECT doc_id, f FROM e WHERE energy > 4400),
    isl AS (
      SELECT doc_id, f,
             f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
      FROM act
    ),
    runs AS (SELECT doc_id, grp, count(*) AS run_len FROM isl GROUP BY doc_id, grp)
    SELECT d.doc_id AS media_id, 4::INT AS n_frames,
           coalesce(sum(r.run_len), 0)::INT AS n_active,
           count(r.grp)::INT AS n_segments,
           coalesce(max(r.run_len), 0)::INT AS longest_run
    FROM d LEFT JOIN runs r ON r.doc_id = d.doc_id
    GROUP BY d.doc_id
    """,
    doc="audio VAD segmentation through the REAL RIFF/WAVE decode: per-frame "
        "EXACT integer energy sums (8-sample frames) from the Arrow kernel, "
        "then a JVM-side energy gate (> 4400) and gaps-and-islands "
        "segmentation (media-partitioned windows) — voiced-segment counts "
        "and longest run per clip, the keep/drop pass of a speech-data "
        "pipeline. Python touches bytes only inside the decode kernel",
)
def mm_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_wav_media_table(docs, "doc_id", "text")
    frames = M.extract_audio_frames(media, frame_size=8)
    act = frames.filter(F.col("energy_sum") > 4400)
    w = Window.partitionBy("media_id").orderBy("frame_idx")
    runs = (
        act.withColumn("grp", F.col("frame_idx") - F.row_number().over(w))
        .groupBy("media_id", "grp")
        .agg(F.count("*").alias("run_len"))
    )
    base = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    per = runs.groupBy("media_id").agg(
        F.sum("run_len").cast("int").alias("n_active"),
        F.count("*").cast("int").alias("n_segments"),
        F.max("run_len").cast("int").alias("longest_run"),
    )
    return base.join(per, "media_id", "left").select(
        "media_id",
        F.lit(4).cast("int").alias("n_frames"),
        F.coalesce("n_active", F.lit(0)).cast("int").alias("n_active"),
        F.coalesce("n_segments", F.lit(0)).cast("int").alias("n_segments"),
        F.coalesce("longest_run", F.lit(0)).cast("int").alias("longest_run"),
    )


# ---------------------------------------------------------------------------
# Snapshot bootstrap -> incremental switch: Debezium's initial-snapshot
# phase emits op='r' read events (before NULL, after = row, snapshot=true)
# before the binlog stream begins. The pipeline classifies by before/after
# nullness exactly like the reference (main.go:139-168 — op is never
# consulted), so the SAME code path bootstraps an EMPTY store from the
# snapshot and then applies the incremental tail — no separate backfill job.
# ---------------------------------------------------------------------------

@register(
    "stream_cdc_snapshot_bootstrap",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 500.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 3 <> 1
    """,
    doc="Debezium initial-snapshot bootstrap e2e: batch 1 streams op='r' "
        "snapshot envelopes (snapshot=true) into an EMPTY partitioned store "
        "— no seeding, the snapshot IS the seed; batch 2 streams the "
        "incremental binlog tail (updates %3==0, deletes %3==1) through the "
        "same pipeline. Final state value-checked. Classification is by "
        "before/after nullness (the reference ignores op, main.go:139-168), "
        "so snapshot reads apply as inserts with zero special-casing",
)
def stream_cdc_snapshot_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from etl_consumer_spark.config import Config
    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore
    from etl_consumer_spark.sources.envelope import WireField
    from etl_consumer_spark.sources.kafka import file_envelope_stream
    from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    img_t = "struct<o_orderkey:long,o_totalprice:double>"
    row_img = F.struct("o_orderkey", "o_totalprice")
    upd_img = F.struct(
        F.col("o_orderkey"), (F.col("o_totalprice") + 500.0).alias("o_totalprice")
    )

    def env(before, after, op, pos, snapshot):
        return F.to_json(
            F.struct(
                F.struct(
                    before.alias("before"),
                    after.alias("after"),
                    F.struct(
                        F.lit("srv").alias("name"),
                        F.lit("db0").alias("db"),
                        F.lit("orders").alias("table"),
                        pos.alias("pos"),
                        F.lit(0).alias("row"),
                        F.lit(snapshot).alias("snapshot"),
                    ).alias("source"),
                    F.lit(op).alias("op"),
                    F.lit(0).cast("long").alias("ts_ms"),
                ).alias("payload")
            )
        )

    def transport(value):
        return F.struct(
            F.lit("srv.db0.orders").alias("topic"),
            value.cast("binary").alias("value"),
            F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
            F.lit(None).cast("timestamp").alias("timestamp"),
        )

    import time as _time

    _t0 = _time.time()
    base = tempfile.mkdtemp(prefix="stream_snap_")
    # batch 1: the initial snapshot — op='r', before NULL, every row
    snap = orders.select(
        transport(
            env(F.lit(None).cast(img_t), row_img, "r", F.lit(0), "true")
        ).alias("r")
    ).select("r.*")
    seen: set[str] = set()
    snap.coalesce(1).write.mode("append").parquet(f"{base}/transport")
    _pin_batch_order(f"{base}/transport", seen, 1)
    # batch 2: the incremental tail — updates and deletes
    upd = orders.filter(k % 3 == 0).select(
        transport(env(row_img, upd_img, "u", k, "false")).alias("r")
    ).select("r.*")
    dele = orders.filter(k % 3 == 1).select(
        transport(env(row_img, F.lit(None).cast(img_t), "d", k, "false")).alias("r")
    ).select("r.*")
    upd.unionByName(dele).coalesce(1).write.mode("append").parquet(f"{base}/transport")
    _pin_batch_order(f"{base}/transport", seen, 2)
    _t1 = _time.time()

    cfg = Config()
    cfg.server, cfg.db_name, cfg.tables = "srv", "db0", ["orders"]
    fields = [
        WireField("o_orderkey", "int64"),
        WireField("o_totalprice", "float64"),
    ]
    store = PartitionedParquetStateStore(spark, f"{base}/state")
    # EMPTY init: schema only — the snapshot itself is the bootstrap
    store.init("orders", orders.limit(0), ["o_orderkey"])
    _t2 = _time.time()
    pipe = CDCPipeline(spark, cfg, [TableSpec("orders", fields, ["o_orderkey"])], store)
    q = pipe.start(
        file_envelope_stream(spark, f"{base}/transport", max_files_per_trigger=1),
        checkpoint_dir=f"{base}/ckpt",
        trigger_available_now=True,
    )
    q.awaitTermination(300)
    STREAM_PHASES.clear()
    STREAM_PHASES.update(
        {
            # transport_write here includes the coalesce(1) JSON envelope
            # synthesis of EVERY order row (the snapshot) — test-data
            # generation, not pipeline cost; bench reports the split
            "transport_write_s": round(_t1 - _t0, 3),
            "store_seed_s": round(_t2 - _t1, 3),
            "stream_run_s": round(_time.time() - _t2, 3),
        }
    )
    return store.read("orders").select("o_orderkey", "o_totalprice")


# ---------------------------------------------------------------------------
# EWMA per series via ORDERED folds: exponential smoothing is inherently
# sequential (s_i = a*v_i + (1-a)*s_{i-1}), so both engines run the
# IDENTICAL left fold over the identically-ordered per-user series — Spark
# aggregate() seeded with the first element, DuckDB list_reduce (which
# seeds with the first element by definition). alpha = 0.25 is an exact
# binary fraction, so the only float ops are identically-ordered mul/add.
# ---------------------------------------------------------------------------

@register(
    "analytic_ewma_smoothing",
    """
    WITH s AS (
      SELECT user_id, count(*) AS n_events,
             list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           list_reduce(vs, (acc, v) -> 0.25 * v + 0.75 * acc) AS ewma_final
    FROM s
    """,
    doc="per-user EWMA (alpha=0.25) over the event-value series: the "
        "sequential smoothing recurrence as an ORDERED in-memory fold per "
        "series — one shuffle on user_id, series sorted by (ts, event_id) "
        "for a total order, fold runs inside the executor. The "
        "trend-following smoother of monitoring/forecasting pipelines; at "
        "100 TB the per-series state is one double, mergeable by "
        "re-folding window tails",
)
def analytic_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").alias("v"),
            )
        )
    )
    g = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"), arr.alias("a")
    )
    return (
        g.withColumn("vs", F.expr("transform(a, x -> x.v)"))
        .select(
            "user_id",
            "n_events",
            F.expr(
                "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1), "
                "(acc, v) -> 0.25D * v + 0.75D * acc)"
            ).alias("ewma_final"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection per series (Page 1954): the sequential
# drift-alarm of monitoring pipelines. ALL-INTEGER arithmetic (values in
# milli-units, integer reference mean, k=500) so the clamped recursion is
# bit-exact on any engine: the engine runs ONE O(n) fold per series with a
# (level, running-max) struct accumulator; the oracle — whose list_reduce
# accumulator must match the element type — deliberately replays the
# O(n^2) prefix formulation (max over i of the fold of the first i
# elements), validating the single-pass recursion against the definition.
# ---------------------------------------------------------------------------

@register(
    "analytic_cusum_changepoint",
    """
    WITH q AS (
      SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS x, ts, event_id
      FROM events
    ),
    s AS (
      SELECT user_id, count(*) AS n_events,
             list(x ORDER BY ts, event_id) AS vs,
             CAST(floor(sum(x) / CAST(count(*) AS DOUBLE)) AS BIGINT) AS mu
      FROM q GROUP BY user_id
    )
    SELECT user_id, n_events, mu,
           list_max(list_transform(generate_series(1, len(vs)),
             i -> list_reduce(list_prepend(0::BIGINT, vs[1:i]),
                  (a, b) -> greatest(0, a + b - mu - 500)))) AS max_cusum,
           list_max(list_transform(generate_series(1, len(vs)),
             i -> list_reduce(list_prepend(0::BIGINT, vs[1:i]),
                  (a, b) -> greatest(0, a + b - mu - 500)))) > 5000 AS alarmed
    FROM s
    """,
    doc="one-sided CUSUM change-point statistic per user series (Page '54): "
        "S_i = max(0, S_{i-1} + x_i - mu - k) over milli-unit integers, "
        "reference mean from the series' own exact integer sum, k=500, "
        "alarm at 5000. One shuffle on user_id, one O(n) in-executor fold "
        "per series with a (level, max) struct accumulator; the oracle "
        "replays the O(n^2) prefix definition. Integer throughout — "
        "bit-exact, mergeable by re-folding from the last checkpoint level",
)
def analytic_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 1000).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                x.alias("v"),
            )
        )
    )
    g = ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        arr.alias("a"),
        F.floor(F.sum(x) / F.count("*").cast("double")).cast("long").alias("mu"),
    )
    fold = (
        "aggregate(vs, struct(0L AS s, 0L AS m), "
        "(acc, x) -> struct(greatest(0L, acc.s + x - mu - 500L), "
        "greatest(acc.m, greatest(0L, acc.s + x - mu - 500L))), acc -> acc.m)"
    )
    return (
        g.withColumn("vs", F.expr("transform(a, p -> p.v)"))
        .select(
            "user_id",
            "n_events",
            "mu",
            F.expr(fold).alias("max_cusum"),
            (F.expr(fold) > 5000).alias("alarmed"),
        )
    )


# ---------------------------------------------------------------------------
# LSH band-configuration sweep: the index-tuning query. The same 8 MinHash
# signatures banded as (b=2,r=4), (b=4,r=2), (b=8,r=1) — measured capped
# candidate counts next to the theoretical s-curve capture probability at
# s=0.8, making the recall/cost tradeoff a query instead of a guess.
# ---------------------------------------------------------------------------

def _band_sweep_oracle_sql() -> str:
    parts, selects = [], []
    for bands in (2, 4, 8):
        r = 8 // bands
        sel = []
        for b in range(bands):
            cols = " || '|' || ".join(f"mh{b * r + i}::VARCHAR" for i in range(r))
            sel.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS bucket FROM sig")
        parts.append(f"bk{bands} AS ({' UNION ALL '.join(sel)})")
        parts.append(
            f"bs{bands} AS (SELECT band, bucket, count(*) AS n FROM bk{bands} "
            f"GROUP BY band, bucket)"
        )
        parts.append(
            f"kp{bands} AS (SELECT k.doc_id, k.band, k.bucket FROM bk{bands} k "
            f"JOIN bs{bands} s ON k.band = s.band AND k.bucket = s.bucket "
            f"WHERE s.n <= 3)"
        )
        parts.append(
            f"cd{bands} AS (SELECT count(*) AS n FROM ("
            f"SELECT DISTINCT l.doc_id AS a, r.doc_id AS b FROM kp{bands} l "
            f"JOIN kp{bands} r ON l.band = r.band AND l.bucket = r.bucket "
            f"WHERE l.doc_id < r.doc_id) t)"
        )
        selects.append(
            f"SELECT {bands} AS bands, {r} AS rows_per_band, "
            f"(SELECT n FROM cd{bands})::BIGINT AS n_candidates, "
            f"1.0 - power(1.0 - power(0.8, {r}), {bands}) AS p_capture_at_08"
        )
    return SIG_SQL + ",\n    " + ",\n    ".join(parts) + "\n    " + "\n    UNION ALL\n    ".join(selects)


@register(
    "dedup_lsh_band_sweep",
    _band_sweep_oracle_sql(),
    doc="LSH band-configuration sweep over the SAME 8 MinHash signatures: "
        "(b=2,r=4) high-precision, (b=4,r=2), (b=8,r=1) high-recall — "
        "measured hot-bucket-capped candidate counts per config beside the "
        "theoretical capture probability 1-(1-s^r)^b at s=0.8. The "
        "signature build runs ONCE (localCheckpoint) and each banding is a "
        "map + one capped equi-join; this is how b/r gets chosen at 100 TB "
        "— from the data, not a guess",
)
def dedup_lsh_band_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    import functools

    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.exploded_shingles(docs), num_hashes=8)
    sigs = sigs.localCheckpoint(eager=True)  # one signature build, 3 bandings
    outs = []
    for bands in (2, 4, 8):
        r = 8 // bands
        buckets = D.lsh_buckets(sigs, num_hashes=8, bands=bands)
        cand = D.candidate_pairs(buckets, max_bucket_size=3)
        outs.append(
            cand.agg(
                F.lit(bands).alias("bands"),
                F.lit(r).alias("rows_per_band"),
                F.count("*").alias("n_candidates"),
                F.expr(
                    f"1.0D - power(1.0D - power(0.8D, {r}), {bands})"
                ).alias("p_capture_at_08"),
            )
        )
    return functools.reduce(lambda a, b: a.unionByName(b), outs)


# ---------------------------------------------------------------------------
# Sentence segmentation: the chunking precursor (RAG and context-window
# splitters want sentence boundaries, not token offsets). Regex kept to the
# RE2-safe subset (no lookbehind — DuckDB's engine lacks it), identical
# pattern both engines, map-only.
# ---------------------------------------------------------------------------

@register(
    "text_sentence_split",
    r"""
    WITH p AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '[.!?]+\s+'),
                         x -> len(trim(x)) > 0) AS sents
      FROM documents
    ),
    w AS (
      SELECT doc_id, sents,
             list_transform(sents,
                            s -> len(string_split_regex(trim(s), '\s+'))) AS wc
      FROM p
    )
    SELECT doc_id, len(sents)::INT AS n_sentences,
           list_sum(wc)::BIGINT AS total_words,
           list_max(wc)::INT AS max_sentence_words,
           list_sum(wc) * 1.0 / len(sents) AS mean_sentence_words
    FROM w WHERE len(sents) > 0
    """,
    doc="sentence segmentation stats per document: split on [.!?]+ runs "
        "followed by whitespace (RE2-safe — no lookbehind, so the pattern "
        "is portable to both engines verbatim), empty pieces dropped; "
        "sentence count, word totals, longest sentence, mean length. "
        "Map-only array expressions — the boundary pass a RAG chunker or "
        "curriculum scorer runs before splitting",
)
def text_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sents = F.expr(r"filter(split(text, '[.!?]+\\s+'), x -> length(trim(x)) > 0)")
    out = docs.select("doc_id", sents.alias("sents")).filter(F.size("sents") > 0)
    wc = F.expr(r"transform(sents, s -> size(split(trim(s), '\\s+')))")
    return out.withColumn("wc", wc).select(
        "doc_id",
        F.size("sents").cast("int").alias("n_sentences"),
        F.expr("aggregate(wc, 0L, (a, x) -> a + x)").alias("total_words"),
        F.expr("array_max(wc)").cast("int").alias("max_sentence_words"),
        (
            F.expr("aggregate(wc, 0L, (a, x) -> a + x)") * 1.0 / F.size("sents")
        ).alias("mean_sentence_words"),
    )


# ---------------------------------------------------------------------------
# Histogram equalization through the real PPM decode: the contrast
# normalization every vision-data pipeline runs before feature extraction.
# The mapping is the exact integer form (floor division, no floats), so the
# oracle replays remap + per-pixel sequence md5 bit-for-bit.
# ---------------------------------------------------------------------------

@register(
    "mm_image_hist_equalize",
    f"""
    WITH {_MM_RASTER_CTE},
    px AS (
      SELECT doc_id, u.i AS i, ascii(substr(ras, u.i, 1)) AS v,
             length(ras) AS n
      FROM r, unnest(generate_series(1, length(ras))) AS u(i)
    ),
    hist AS (SELECT doc_id, v, n, count(*) AS cnt FROM px GROUP BY doc_id, v, n),
    cdf AS (
      SELECT doc_id, v, n,
             sum(cnt) OVER (PARTITION BY doc_id ORDER BY v) AS cdf_v
      FROM hist
    ),
    cm AS (
      SELECT doc_id, min(cdf_v) AS cdf_min, count(*) AS n_levels FROM cdf
      GROUP BY doc_id
    ),
    remap AS (
      SELECT c.doc_id, c.v, c.n,
             CASE WHEN c.n = m.cdf_min THEN 0
                  ELSE (c.cdf_v - m.cdf_min) * 255 // (c.n - m.cdf_min)
             END AS eq,
             m.n_levels
      FROM cdf c JOIN cm m ON c.doc_id = m.doc_id
    ),
    seq AS (
      SELECT p.doc_id, p.n, r2.n_levels, r2.eq, p.i
      FROM px p JOIN remap r2 ON r2.doc_id = p.doc_id AND r2.v = p.v
    )
    SELECT doc_id AS media_id, CAST(max(n) AS BIGINT) AS n_px,
           CAST(max(n_levels) AS INT) AS n_levels,
           CAST(sum(eq) AS BIGINT) AS sum_eq,
           md5(string_agg(eq::VARCHAR, ',' ORDER BY i)) AS eq_md5
    FROM seq GROUP BY doc_id
    """,
    doc="histogram equalization through the REAL PPM decode: per-image "
        "integer CDF remap h(v) = (cdf(v)-cdf_min)*255 // (n-cdf_min) — "
        "floor division, no floats — applied in the Arrow kernel; the "
        "equalized pixel sum AND an md5 over the remapped sequence in pixel "
        "order are oracle-verified bit-for-bit. The contrast-normalization "
        "pass of a vision-data pipeline; per-image work only, map-only at "
        "any scale",
)
def mm_image_hist_equalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    return M.equalize_images(media)


# ---------------------------------------------------------------------------
# Sobel edge energy through the REAL PPM decode: integer |Gx|+|Gy| over
# the 3x3-valid interior of the grayscale plane — the edge/blur QA
# feature of a vision-data pipeline. The oracle replays the convolution
# in SQL with 12 generated neighbor taps per pixel; gradient sum AND an
# md5 over the row-major gradient sequence are verified bit-for-bit.
# ---------------------------------------------------------------------------

def _sobel_tap(dr: int, dc: int) -> str:
    return f"ascii(substr(ras, ((rr.r + {dr}) * w + cc.c + {dc}) * 3 + 1, 1))"


_SOBEL_GX = (
    f"(-{_sobel_tap(-1, -1)} + {_sobel_tap(-1, 1)}"
    f" - 2 * {_sobel_tap(0, -1)} + 2 * {_sobel_tap(0, 1)}"
    f" - {_sobel_tap(1, -1)} + {_sobel_tap(1, 1)})"
)
_SOBEL_GY = (
    f"(-{_sobel_tap(-1, -1)} - 2 * {_sobel_tap(-1, 0)} - {_sobel_tap(-1, 1)}"
    f" + {_sobel_tap(1, -1)} + 2 * {_sobel_tap(1, 0)} + {_sobel_tap(1, 1)})"
)


@register(
    "mm_image_sobel_edges",
    f"""
    WITH {_MM_RASTER_CTE},
    grad AS (
      SELECT doc_id, rr.r, cc.c,
             abs({_SOBEL_GX}) + abs({_SOBEL_GY}) AS mag
      FROM r, (VALUES (1), (2)) rr(r),
           unnest(generate_series(1, w - 2)) AS cc(c)
    )
    SELECT doc_id AS media_id,
           count(*)::BIGINT AS n_interior,
           sum(mag)::BIGINT AS grad_sum,
           md5(string_agg(mag::VARCHAR, ',' ORDER BY r, c)) AS grad_md5
    FROM grad GROUP BY doc_id
    """,
    doc="Sobel edge energy through the real PPM decode: exact integer "
        "|Gx|+|Gy| over the 3x3-valid interior (rows 1-2, cols 1..w-2 of "
        "the w x 4 gray plane), Arrow mapInPandas kernel; oracle replays "
        "the convolution with 12 neighbor taps per pixel and checks the "
        "gradient sum + row-major sequence md5 bit-for-bit. Map-only at "
        "any scale",
)
def mm_image_sobel_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    return M.sobel_edges(media)


# ---------------------------------------------------------------------------
# Weighted sampling without replacement, zero RNG (Efraimidis & Spirakis
# 2006, A-Res): each item draws u from its OWN md5 hash and ranks by
# ln(u)/w — the top-k under that key is a weighted sample without
# replacement. Deterministic, mergeable (top-k of unioned keyed sets), and
# reproducible across engines because u derives from the data.
# ---------------------------------------------------------------------------

@register(
    "sample_weighted_reservoir",
    """
    WITH u AS (
      SELECT doc_id, n_chars,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT + 1)
               / 281474976710657.0 AS uu
      FROM documents
    ),
    k AS (SELECT doc_id, n_chars, ln(uu) / n_chars AS akey FROM u)
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight, round(akey, 9) AS akey
    FROM k ORDER BY akey DESC, doc_id LIMIT 32
    """,
    doc="weighted sampling WITHOUT replacement, zero RNG (Efraimidis-"
        "Spirakis A-Res): u ~ U(0,1) derived from md5(doc_id), rank key "
        "ln(u)/weight (weight = n_chars), top-32 — inclusion probability "
        "proportional to weight, deterministic and engine-reproducible. "
        "Plans as TakeOrdered (per-partition partial top-k, never a global "
        "sort); mergeable across shards/batches by re-ranking unioned keys "
        "— the curation sampler that favors long documents reproducibly",
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 12), 16, 10)
        .cast("long") + 1
    ) / F.lit(281474976710657.0)
    akey = F.log(u) / F.col("n_chars")
    return (
        docs.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.round(akey, 9).alias("akey"),
        )
        .orderBy(F.col("akey").desc(), F.col("doc_id"))
        .limit(32)
    )


# ---------------------------------------------------------------------------
# Bounded k-core peeling (3 rounds toward the 3-core): the graph-density
# filter of web-graph curation — low-degree fringe removed iteratively.
# Each round is deterministic (degree threshold), so the oracle replays the
# IDENTICAL unrolled rounds; the engine's loop is the same join pipeline
# with lineage truncation.
# ---------------------------------------------------------------------------

@register(
    "graph_kcore_peel",
    """
    WITH und AS (
      SELECT DISTINCT least(o_custkey % 2000, o_orderkey % 2000) AS a,
             greatest(o_custkey % 2000, o_orderkey % 2000) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 2000 <> o_orderkey % 2000
    ),
    e0 AS (SELECT a AS n, b AS m FROM und UNION ALL SELECT b, a FROM und),
    d0 AS (SELECT n, count(*) AS deg FROM e0 GROUP BY n),
    k0 AS (SELECT n FROM d0 WHERE deg >= 4),
    e1 AS (
      SELECT e.n, e.m FROM e0 e
      JOIN k0 x ON x.n = e.n JOIN k0 y ON y.n = e.m
    ),
    d1 AS (SELECT n, count(*) AS deg FROM e1 GROUP BY n),
    k1 AS (SELECT n FROM d1 WHERE deg >= 4),
    e2 AS (
      SELECT e.n, e.m FROM e1 e
      JOIN k1 x ON x.n = e.n JOIN k1 y ON y.n = e.m
    ),
    d2 AS (SELECT n, count(*) AS deg FROM e2 GROUP BY n),
    k2 AS (SELECT n FROM d2 WHERE deg >= 4),
    e3 AS (
      SELECT e.n, e.m FROM e2 e
      JOIN k2 x ON x.n = e.n JOIN k2 y ON y.n = e.m
    )
    SELECT n AS node, count(*)::BIGINT AS degree
    FROM e3 GROUP BY n
    """,
    doc="bounded k-core peeling (3 rounds toward the 4-core) over the "
        "key-derived graph: each round drops nodes with degree < 4 and "
        "re-derives the induced subgraph — the density filter that strips "
        "crawl-graph fringe before community/centrality analysis. Engine "
        "runs the loop with localCheckpoint lineage truncation per round; "
        "the oracle replays the identical unrolled rounds. Per round: one "
        "degree aggregation + two semi-joins — no pair expansion anywhere",
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    und = (
        orders.filter(F.col("o_orderkey") % 3 == 0)
        .select(
            F.least(F.col("o_custkey") % 2000, F.col("o_orderkey") % 2000).alias("a"),
            F.greatest(F.col("o_custkey") % 2000, F.col("o_orderkey") % 2000).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    edges = und.select(F.col("a").alias("n"), F.col("b").alias("m")).unionAll(
        und.select(F.col("b").alias("n"), F.col("a").alias("m"))
    ).localCheckpoint(eager=True)
    for _ in range(3):
        deg = edges.groupBy("n").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= 4).select("n")
        edges = (
            edges.join(keep, "n", "left_semi")
            .join(keep.select(F.col("n").alias("m")), "m", "left_semi")
            .localCheckpoint(eager=True)
        )
    return edges.groupBy(F.col("n").alias("node")).agg(
        F.count("*").cast("long").alias("degree")
    )


# ---------------------------------------------------------------------------
# CDC log compaction (the Kafka compacted-topic view): latest record per
# key INCLUDING tombstones — unlike the state apply (which materializes
# current rows and drops deletes), compaction preserves the delete marker
# so downstream consumers bootstrapping from the compacted log see it.
# ---------------------------------------------------------------------------

@register(
    "cdc_log_compaction",
    """
    WITH log AS (
      SELECT o_orderkey AS k, o_orderkey * 2 AS pos, 'upsert' AS op,
             o_totalprice AS v
      FROM orders WHERE o_orderkey % 4 <> 3
      UNION ALL
      SELECT o_orderkey, o_orderkey * 2 + 1, 'delete', NULL
      FROM orders WHERE o_orderkey % 2 = 1
      UNION ALL
      SELECT o_orderkey, o_orderkey * 2 + 2, 'upsert', o_totalprice + 77.0
      FROM orders WHERE o_orderkey % 8 = 1
    ),
    r AS (
      SELECT k, pos, op, v,
             row_number() OVER (PARTITION BY k ORDER BY pos DESC) AS rn
      FROM log
    )
    SELECT k AS o_orderkey, op AS last_op, v AS o_totalprice
    FROM r WHERE rn = 1
    """,
    doc="CDC log compaction (Kafka compacted-topic semantics): latest "
        "record per key by log position, TOMBSTONES PRESERVED — the "
        "bootstrap view downstream consumers read, distinct from the state "
        "apply which materializes current rows and drops deletes. One "
        "key-partitioned ranking window; at 100 TB this is the periodic "
        "log-maintenance job that bounds topic size by keyspace, not time",
)
def cdc_log_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    log = (
        orders.filter(k % 4 != 3)
        .select(
            k.alias("k"), (k * 2).alias("pos"), F.lit("upsert").alias("op"),
            F.col("o_totalprice").alias("v"),
        )
        .unionByName(
            orders.filter(k % 2 == 1).select(
                k.alias("k"), (k * 2 + 1).alias("pos"), F.lit("delete").alias("op"),
                F.lit(None).cast("double").alias("v"),
            )
        )
        .unionByName(
            orders.filter(k % 8 == 1).select(
                k.alias("k"), (k * 2 + 2).alias("pos"), F.lit("upsert").alias("op"),
                (F.col("o_totalprice") + 77.0).alias("v"),
            )
        )
    )
    w = Window.partitionBy("k").orderBy(F.col("pos").desc())
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("k").alias("o_orderkey"),
            F.col("op").alias("last_op"),
            F.col("v").alias("o_totalprice"),
        )
    )


# ---------------------------------------------------------------------------
# DDL-completeness e2e records (complementing stream_cdc_add_column): DROP
# COLUMN and CHANGE/RENAME COLUMN mid-stream through the full pipeline —
# the remaining C7 shapes, each verifying state evolution + wire-field
# re-binding + post-DDL DML landing, value-exact.
# ---------------------------------------------------------------------------

def _cdc_ddl_e2e(spark, sf_dir, ddl_sql, fields2_type, b2_after_builder, select_cols):
    """Shared harness for mid-stream-DDL e2e records: batch 1 inserts on the
    OLD 3-column schema (o_orderkey, o_totalprice, o_note); batch 2 opens
    with ``ddl_sql`` (applied first within the batch, the reference's
    pause->exec->resume) and then streams updates shaped by
    ``b2_after_builder`` on the NEW schema for keys %3==0 and %2==0."""
    import json
    import tempfile
    import time as _time

    from etl_consumer_spark.config import Config
    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore
    from etl_consumer_spark.sources.envelope import WireField
    from etl_consumer_spark.sources.kafka import file_envelope_stream
    from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec

    _t0 = _time.time()
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    old_t = "struct<o_orderkey:long,o_totalprice:double,o_note:string>"
    note = F.concat(F.lit("n"), k.cast("string"))
    old_row = F.struct(F.col("o_orderkey"), F.col("o_totalprice"), note.alias("o_note"))

    def env(before, after, pos):
        return F.to_json(
            F.struct(
                F.struct(
                    before.alias("before"),
                    after.alias("after"),
                    F.struct(
                        F.lit("srv").alias("name"), F.lit("db0").alias("db"),
                        F.lit("orders").alias("table"), pos.alias("pos"),
                        F.lit(0).alias("row"),
                    ).alias("source"),
                    F.lit("c").alias("op"), F.lit(0).cast("long").alias("ts_ms"),
                ).alias("payload")
            )
        )

    def transport(topic, value):
        return F.struct(
            topic.alias("topic"),
            value.cast("binary").alias("value"),
            F.lit(None).cast("array<struct<key:string,value:binary>>").alias("headers"),
            F.lit(None).cast("timestamp").alias("timestamp"),
        )

    base = tempfile.mkdtemp(prefix="stream_ddl_e2e_")
    b1 = orders.filter(k % 3 == 0).select(
        transport(F.lit("srv.db0.orders"), env(F.lit(None).cast(old_t), old_row, F.lit(1))).alias("r")
    ).select("r.*")
    seen: set[str] = set()
    b1.coalesce(1).write.mode("append").parquet(f"{base}/transport")
    _pin_batch_order(f"{base}/transport", seen, 1)
    ddl_json = json.dumps(
        {
            "payload": {
                "source": {"name": "srv", "db": "db0", "table": "orders"},
                "databaseName": "db0",
                "ddl": ddl_sql,
            }
        }
    )
    ddl_row = spark.range(1).select(
        transport(F.lit("srv"), F.lit(ddl_json)).alias("r")
    ).select("r.*")
    new_before, new_after = b2_after_builder(k, note)
    upd2 = orders.filter((k % 3 == 0) & (k % 2 == 0)).select(
        transport(F.lit("srv.db0.orders"), env(new_before, new_after, F.lit(2))).alias("r")
    ).select("r.*")
    ddl_row.unionByName(upd2).coalesce(1).write.mode("append").parquet(f"{base}/transport")
    _pin_batch_order(f"{base}/transport", seen, 2)

    _t1 = _time.time()
    cfg = Config()
    cfg.server, cfg.db_name, cfg.tables = "srv", "db0", ["orders"]
    fields = [
        WireField("o_orderkey", "int64"),
        WireField("o_totalprice", "float64"),
        WireField("o_note", "string"),
    ]
    store = PartitionedParquetStateStore(spark, f"{base}/state")
    store.init(
        "orders",
        spark.createDataFrame([], "o_orderkey long, o_totalprice double, o_note string"),
        ["o_orderkey"],
    )
    _t2 = _time.time()
    pipe = CDCPipeline(spark, cfg, [TableSpec("orders", fields, ["o_orderkey"])], store)
    q = pipe.start(
        file_envelope_stream(spark, f"{base}/transport", max_files_per_trigger=1),
        checkpoint_dir=f"{base}/ckpt",
        trigger_available_now=True,
    )
    q.awaitTermination(300)
    STREAM_PHASES.clear()
    STREAM_PHASES.update(
        {
            # envelope synthesis (coalesce(1) JSON encode, batch pinning) is
            # test-data generation, not pipeline cost — bench splits it out
            "transport_write_s": round(_t1 - _t0, 3),
            "store_seed_s": round(_t2 - _t1, 3),
            "stream_run_s": round(_time.time() - _t2, 3),
        }
    )
    return store.read("orders").select(*select_cols)


@register(
    "stream_cdc_drop_column",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS o_totalprice
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="mid-stream DROP COLUMN e2e: batch 1 inserts on the 3-column "
        "schema; batch 2 opens with ALTER TABLE DROP COLUMN o_note (applied "
        "first, the reference's pause->exec->resume) and streams updates on "
        "the NARROWED schema — state rewritten without the column, "
        "wire-field binding re-bound (a stale binding would decode a "
        "now-absent field), post-DDL DML lands value-exact",
)
def stream_cdc_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    def b2(k, note):
        t = "struct<o_orderkey:long,o_totalprice:double>"
        before = F.struct(F.col("o_orderkey"), F.col("o_totalprice")).cast(t)
        after = F.struct(
            F.col("o_orderkey"), (F.col("o_totalprice") + 1000.0).alias("o_totalprice")
        ).cast(t)
        return before, after

    return _cdc_ddl_e2e(
        spark, sf_dir,
        "ALTER TABLE `db0`.`orders` DROP COLUMN o_note",
        None, b2, ["o_orderkey", "o_totalprice"],
    )


@register(
    "stream_cdc_rename_column",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0 THEN o_totalprice + 1000.0
                ELSE o_totalprice END AS o_amount,
           'n' || CAST(o_orderkey AS VARCHAR) AS o_note
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="mid-stream CHANGE/RENAME COLUMN e2e: batch 2 opens with MySQL "
        "ALTER TABLE CHANGE COLUMN o_totalprice o_amount DOUBLE (translated "
        "to RENAME COLUMN — same-name CHANGE would be a type alter) and "
        "streams updates carrying the NEW field name — state column "
        "renamed, wire binding follows the rename, post-DDL DML lands",
)
def stream_cdc_rename_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    def b2(k, note):
        t = "struct<o_orderkey:long,o_amount:double,o_note:string>"
        before = F.struct(
            F.col("o_orderkey"), F.col("o_totalprice").alias("o_amount"), note.alias("o_note")
        ).cast(t)
        after = F.struct(
            F.col("o_orderkey"),
            (F.col("o_totalprice") + 1000.0).alias("o_amount"),
            note.alias("o_note"),
        ).cast(t)
        return before, after

    return _cdc_ddl_e2e(
        spark, sf_dir,
        "ALTER TABLE `db0`.`orders` CHANGE COLUMN o_totalprice o_amount DOUBLE",
        None, b2, ["o_orderkey", "o_amount", "o_note"],
    )


@register(
    "stream_cdc_type_change",
    """
    SELECT o_orderkey,
           CASE WHEN o_orderkey % 2 = 0
                THEN CAST(floor(o_totalprice) AS BIGINT) + 1000
                ELSE CAST(floor(o_totalprice) AS BIGINT) END AS o_totalprice,
           'n' || CAST(o_orderkey AS VARCHAR) AS o_note
    FROM orders WHERE o_orderkey % 3 = 0
    """,
    doc="mid-stream MODIFY COLUMN (type change) e2e — completes the "
        "reference DDL matrix (ADD/DROP/CHANGE/MODIFY, main.go:382-424) as "
        "driver-verifiable entries: batch 2 opens with MySQL ALTER TABLE "
        "MODIFY COLUMN o_totalprice BIGINT (translated to ALTER COLUMN "
        "TYPE); existing DOUBLE state is cast in place (truncation toward "
        "zero, positive domain so floor==trunc), the wire binding re-binds "
        "to int64, and post-DDL updates deliver exact longs",
)
def stream_cdc_type_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    def b2(k, note):
        t = "struct<o_orderkey:long,o_totalprice:long,o_note:string>"
        old_long = F.floor("o_totalprice").cast("long")
        before = F.struct(
            F.col("o_orderkey"), old_long.alias("o_totalprice"), note.alias("o_note")
        ).cast(t)
        after = F.struct(
            F.col("o_orderkey"),
            (old_long + 1000).alias("o_totalprice"),
            note.alias("o_note"),
        ).cast(t)
        return before, after

    return _cdc_ddl_e2e(
        spark, sf_dir,
        "ALTER TABLE `db0`.`orders` MODIFY COLUMN `o_totalprice` BIGINT",
        None, b2, ["o_orderkey", "o_totalprice", "o_note"],
    )


# ---------------------------------------------------------------------------
# Binary-embedding Hamming search: sign-binarize each vector into two
# 32-bit codes (one long fold each), then exhaustive popcount Hamming
# top-k for a fixed query set — the memory end-point of embedding
# compression (64 dims -> 8 bytes), where exhaustive search is CHEAP
# enough that no index is needed until extreme scale.
# ---------------------------------------------------------------------------

_BINCODE_SQL = (
    "CAST(list_reduce(list_prepend(CAST(0 AS DOUBLE), "
    "list_transform(embedding[{a}:{b}], x -> CAST(x AS DOUBLE))), "
    "(acc, v) -> acc * 2 + CASE WHEN v >= 0 THEN 1 ELSE 0 END) AS BIGINT)"
)


@register(
    "sim_binary_hamming_topk",
    f"""
    WITH c AS (
      SELECT vec_id, {_BINCODE_SQL.format(a=1, b=32)} AS hi,
             {_BINCODE_SQL.format(a=33, b=64)} AS lo
      FROM embeddings
    ),
    q AS (SELECT vec_id AS q_id, hi AS qhi, lo AS qlo FROM c WHERE vec_id < 10),
    scored AS (
      SELECT q.q_id, c.vec_id,
             bit_count(xor(c.hi, q.qhi)) + bit_count(xor(c.lo, q.qlo)) AS hd
      FROM c, q WHERE c.vec_id <> q.q_id
    ),
    ranked AS (
      SELECT q_id, vec_id, hd,
             row_number() OVER (PARTITION BY q_id ORDER BY hd ASC, vec_id ASC) AS rnk
      FROM scored
    )
    SELECT q_id AS query_id, vec_id AS neighbor_id, CAST(hd AS INT) AS hamming, rnk AS rank
    FROM ranked WHERE rnk <= 3
    """,
    doc="binary-embedding search: sign-binarize 64 dims into two 32-bit "
        "codes (in-order acc*2+bit folds — every intermediate exact), then "
        "exhaustive Hamming top-3 via XOR+popcount for a fixed 10-query "
        "set. 8 bytes/vector in flight: at 1e9 vectors the whole code table "
        "is 8 GB — scan-search with NO index is the point of binary "
        "embeddings; ties break on neighbor id",
)
def sim_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def half(start: int):
        return F.expr(
            f"aggregate(slice(embedding, {start}, 32), 0L, "
            "(acc, v) -> acc * 2L + IF(v >= 0, 1L, 0L))"
        )

    codes = emb.select(
        "vec_id", half(1).alias("hi"), half(33).alias("lo")
    )
    q = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("hi").alias("qhi"), F.col("lo").alias("qlo")
    )
    scored = (
        codes.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            (
                F.bit_count(F.col("hi").bitwiseXOR(F.col("qhi")))
                + F.bit_count(F.col("lo").bitwiseXOR(F.col("qlo")))
            ).alias("hd"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("hd").asc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.col("q_id").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            F.col("hd").cast("int").alias("hamming"),
            F.col("rnk").alias("rank"),
        )
    )


# ---------------------------------------------------------------------------
# Language-ID evaluation: the confusion matrix of the registered heuristic
# against the corpus labels — composed from the registered query on BOTH
# sides (the sim_ann_recall_eval device), so the eval can never drift from
# the classifier it measures. On synthetic shuffled-vocabulary text the
# accuracy is near-chance; the eval MEASURING that honestly is the point.
# ---------------------------------------------------------------------------

@register(
    "text_langid_confusion",
    None,  # assigned post-registration from the sibling oracle
    doc="language-ID confusion matrix + per-cell counts: the registered "
        "stopword-argmax classifier (text_quality_langid) evaluated against "
        "the corpus lang labels — composed from the registered query on "
        "both the Spark and oracle side, drift-proof by construction. The "
        "QA record of a corpus-curation classifier",
)
def text_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = QUERIES["text_quality_langid"].fn(spark, sf_dir)
    return (
        g.groupBy(
            F.col("lang").alias("true_lang"), F.col("lang_guess").alias("pred_lang")
        )
        .agg(F.count("*").alias("n"))
    )


QUERIES["text_langid_confusion"].oracle = f"""
    WITH g AS ({QUERIES['text_quality_langid'].oracle})
    SELECT lang AS true_lang, lang_guess AS pred_lang, count(*) AS n
    FROM g GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Train/test split leakage check: near-dup candidate pairs that CROSS the
# deterministic split boundary — the QA gate run before training (a test
# document with a train-side near-duplicate inflates eval scores). Composed
# from the registered split rule and the capped-LSH candidate machinery.
# ---------------------------------------------------------------------------

@register(
    "sample_split_leakage_check",
    f"""{SIG_SQL},
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    bsize AS (SELECT band, bucket, count(*) AS n FROM buckets GROUP BY band, bucket),
    kept AS (
      SELECT b.doc_id, b.band, b.bucket
      FROM buckets b JOIN bsize s ON b.band = s.band AND b.bucket = s.bucket
      WHERE s.n <= 3
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM kept l JOIN kept r ON l.band = r.band AND l.bucket = r.bucket
      WHERE l.doc_id < r.doc_id
    ),
    spl AS (
      SELECT doc_id,
             CASE WHEN {_HASH_FRac_SQL.format(salt='split', key='doc_id')} < 0.8 THEN 'train'
                  WHEN {_HASH_FRac_SQL.format(salt='split', key='doc_id')} < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT least(sa.split, sb.split) AS split_a,
           greatest(sa.split, sb.split) AS split_b,
           count(*)::BIGINT AS n_candidate_pairs,
           sum(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END)::BIGINT AS n_leaks
    FROM cand c
    JOIN spl sa ON sa.doc_id = c.a
    JOIN spl sb ON sb.doc_id = c.b
    GROUP BY 1, 2
    """,
    doc="train/test split leakage QA: capped-LSH near-dup candidate pairs "
        "grouped by the split pair they land in — pairs crossing the "
        "boundary (train,test / train,val / val,test) are evaluation "
        "leakage a curation pipeline must resolve (move or drop) before "
        "training. Composed from the registered deterministic split rule "
        "and the capped-LSH machinery; same scale shape as the dedup paths",
)
def sample_split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D
    from etl_consumer_spark.extensions.sampling import deterministic_split

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures(D.exploded_shingles(docs), num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    cand = D.candidate_pairs(buckets, max_bucket_size=3)
    spl = deterministic_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")
    sa = spl.select(F.col("doc_id").alias("a"), F.col("split").alias("split_of_a"))
    sb = spl.select(F.col("doc_id").alias("b"), F.col("split").alias("split_of_b"))
    return (
        cand.join(sa, "a")
        .join(sb, "b")
        .groupBy(
            F.least("split_of_a", "split_of_b").alias("split_a"),
            F.greatest("split_of_a", "split_of_b").alias("split_b"),
        )
        .agg(
            F.count("*").alias("n_candidate_pairs"),
            F.sum(
                F.when(F.col("split_of_a") != F.col("split_of_b"), 1).otherwise(0)
            ).cast("long").alias("n_leaks"),
        )
    )


# ---------------------------------------------------------------------------
# BPE vocabulary export: the deliverable of tokenizer training — base
# character symbols (by corpus frequency) plus the learned merges with
# their ranks, one table a tokenizer runtime loads. Composed from the
# registered text_bpe_learn on BOTH sides (drift-proof).
# ---------------------------------------------------------------------------

@register(
    "text_bpe_vocab",
    None,  # assigned post-registration (composes the sibling oracle)
    doc="BPE vocabulary table: base character symbols (corpus frequency, "
        "merge_rank 0) + the 4 learned merges ranked — what a tokenizer "
        "runtime loads. Composed from text_bpe_learn on both the Spark and "
        "oracle side, so the vocab can never drift from the merges it "
        "serializes",
)
def text_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chars = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
        )
        .filter(F.length("word") >= 2)
        .select(F.explode(F.split("word", "")).alias("sym"))
        .filter(F.length("sym") > 0)
        .groupBy("sym")
        .agg(F.count("*").cast("long").alias("freq"))
        .select("sym", F.lit(0).alias("merge_rank"), "freq")
    )
    merges = QUERIES["text_bpe_learn"].fn(spark, sf_dir).select(
        F.col("merged").alias("sym"), F.col("merge_rank"), F.col("pair_count").alias("freq")
    )
    return chars.unionByName(merges)


QUERIES["text_bpe_vocab"].oracle = f"""
    WITH m AS ({QUERIES['text_bpe_learn'].oracle}
    ),
    chars AS (
      SELECT sym, 0 AS merge_rank, count(*)::BIGINT AS freq FROM (
        SELECT unnest(list_transform(generate_series(1, length(word)),
                      i -> word[i])) AS sym
        FROM (SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
              FROM documents) t
        WHERE length(word) >= 2
      ) c GROUP BY sym
    )
    SELECT sym, merge_rank, freq FROM chars
    UNION ALL
    SELECT merged AS sym, merge_rank, pair_count AS freq FROM m
    """


# ---------------------------------------------------------------------------
# Lag-k autocorrelation per series: the seasonality/persistence diagnostic.
# All cross-sums are EXACT integers over the identically-ordered series;
# the mean-adjusted estimator derives from one shared float expression per
# lag — the sketch_moments device applied to time-series structure.
# ---------------------------------------------------------------------------

_ACF_NUM = (
    "(CAST(c{k} AS DOUBLE) - (CAST(s AS DOUBLE) / n) * (CAST(sh{k} AS DOUBLE) "
    "+ CAST(st{k} AS DOUBLE)) + (n - {k}) * (CAST(s AS DOUBLE) / n) "
    "* (CAST(s AS DOUBLE) / n))"
)
_ACF_DEN = "(CAST(s2 AS DOUBLE) - n * (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))"


@register(
    "analytic_autocorrelation",
    f"""
    WITH q AS (
      SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS x, ts, event_id
      FROM events
    ),
    a AS (
      SELECT user_id, count(*) AS n, list(x ORDER BY ts, event_id) AS vs
      FROM q GROUP BY user_id
    ),
    sums AS (
      SELECT user_id, n,
             list_sum(vs) AS s,
             list_sum(list_transform(vs, v -> v * v)) AS s2,
             list_sum(list_transform(generate_series(1, len(vs)-1), i -> vs[i] * vs[i+1])) AS c1,
             list_sum(list_transform(generate_series(1, len(vs)-1), i -> vs[i])) AS sh1,
             list_sum(list_transform(generate_series(2, len(vs)), i -> vs[i])) AS st1,
             list_sum(list_transform(generate_series(1, len(vs)-2), i -> vs[i] * vs[i+2])) AS c2,
             list_sum(list_transform(generate_series(1, len(vs)-2), i -> vs[i])) AS sh2,
             list_sum(list_transform(generate_series(3, len(vs)), i -> vs[i])) AS st2
      FROM a WHERE n > 2
    )
    SELECT user_id, n::BIGINT AS n_events,
           {_ACF_NUM.format(k=1)} / {_ACF_DEN} AS acf_lag1,
           {_ACF_NUM.format(k=2)} / {_ACF_DEN} AS acf_lag2
    FROM sums
    """,
    doc="lag-1/lag-2 autocorrelation per user series (persistence/"
        "seasonality diagnostic): EXACT integer cross-sums over the "
        "identically-ordered series, mean-adjusted estimator from one "
        "shared float expression per lag (the sketch_moments device). One "
        "shuffle on user_id; per-series work linear, in-executor",
)
def analytic_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 1000).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                x.alias("v"),
            )
        )
    )
    g = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), arr.alias("a"))
        .filter(F.col("n") > 2)
        .withColumn("vs", F.expr("transform(a, p -> p.v)"))
    )
    sums = g.select(
        "user_id",
        "n",
        F.expr("aggregate(vs, 0L, (acc, v) -> acc + v)").alias("s"),
        F.expr("aggregate(vs, 0L, (acc, v) -> acc + v * v)").alias("s2"),
        F.expr(
            "aggregate(zip_with(slice(vs, 1, size(vs)-1), slice(vs, 2, size(vs)-1),"
            " (a, b) -> a * b), 0L, (acc, v) -> acc + v)"
        ).alias("c1"),
        F.expr("aggregate(slice(vs, 1, size(vs)-1), 0L, (acc, v) -> acc + v)").alias("sh1"),
        F.expr("aggregate(slice(vs, 2, size(vs)-1), 0L, (acc, v) -> acc + v)").alias("st1"),
        F.expr(
            "aggregate(zip_with(slice(vs, 1, size(vs)-2), slice(vs, 3, size(vs)-2),"
            " (a, b) -> a * b), 0L, (acc, v) -> acc + v)"
        ).alias("c2"),
        F.expr("aggregate(slice(vs, 1, size(vs)-2), 0L, (acc, v) -> acc + v)").alias("sh2"),
        F.expr("aggregate(slice(vs, 3, size(vs)-2), 0L, (acc, v) -> acc + v)").alias("st2"),
    )
    return sums.select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        (F.expr(_ACF_NUM.format(k=1)) / F.expr(_ACF_DEN)).alias("acf_lag1"),
        (F.expr(_ACF_NUM.format(k=2)) / F.expr(_ACF_DEN)).alias("acf_lag2"),
    )


# ---------------------------------------------------------------------------
# PMI collocations: adjacent-bigram pointwise mutual information — the
# collocation extractor of corpus analysis (and the association measure
# behind phrase-vocabulary induction). Exact integer counts; PMI from one
# shared float expression; TakeOrdered top-20.
# ---------------------------------------------------------------------------

_PMI_EXPR = (
    "ln(CAST(n_pairs AS DOUBLE) * CAST(c_ab AS DOUBLE) "
    "/ (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)))"
)


@register(
    "text_pmi_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[^a-z]+') AS ws
      FROM documents
    ),
    pairs AS (
      SELECT ws[i] AS a, ws[i + 1] AS b
      FROM toks, unnest(generate_series(1, len(ws) - 1)) AS u(i)
      WHERE length(ws[i]) >= 2 AND length(ws[i + 1]) >= 2
    ),
    pc AS (SELECT a, b, count(*)::BIGINT AS c_ab FROM pairs GROUP BY a, b),
    tot AS (SELECT count(*)::BIGINT AS n_pairs FROM pairs),
    ua AS (SELECT a, count(*)::BIGINT AS c_a FROM pairs GROUP BY a),
    ub AS (SELECT b, count(*)::BIGINT AS c_b FROM pairs GROUP BY b),
    scored AS (
      SELECT pc.a, pc.b, pc.c_ab, {_PMI_EXPR} AS pmi
      FROM pc JOIN ua ON ua.a = pc.a JOIN ub ON ub.b = pc.b, tot
      WHERE pc.c_ab >= 5
    )
    SELECT a, b, c_ab, round(pmi, 9) AS pmi
    FROM scored ORDER BY pmi DESC, a, b LIMIT 20
    """,
    doc="adjacent-bigram PMI collocations (min pair count 5, top-20): "
        "exact integer pair/unigram counts (vocabulary-bounded tables), "
        "PMI from one shared float expression, global top via TakeOrdered. "
        "The collocation/phrase-induction measure of corpus analysis; "
        "counts are map-side-combined groupBys, never a self-join",
)
def text_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.trim(F.lower(F.col("text"))), "[^a-z]+").alias("ws")
    )
    pairs = (
        toks.select(
            F.explode(
                F.expr(
                    # slices degrade to empty for 1-token docs, where
                    # sequence(0,-1) = [0,-1] would index ws[-1] (ANSI throw)
                    "filter(zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)), "
                    "slice(ws, 2, greatest(size(ws) - 1, 0)), "
                    "(a, b) -> struct(a, b)), "
                    "p -> length(p.a) >= 2 AND length(p.b) >= 2)"
                )
            ).alias("p")
        )
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    )
    pairs = pairs.localCheckpoint(eager=True)  # three consumers, no CSE
    pc = pairs.groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
    tot = pairs.agg(F.count("*").cast("long").alias("n_pairs"))
    ua = pairs.groupBy("a").agg(F.count("*").cast("long").alias("c_a"))
    ub = pairs.groupBy("b").agg(F.count("*").cast("long").alias("c_b"))
    scored = (
        pc.filter(F.col("c_ab") >= 5)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(tot))
        .withColumn("pmi", F.expr(_PMI_EXPR))
    )
    return (
        scored.select("a", "b", "c_ab", F.round("pmi", 9).alias("pmi"))
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Benford's-law first-digit diagnostic: the fraud/synthetic-data smell test
# — observed leading-digit distribution of order totals vs the Benford
# expectation log10(1+1/d), with the chi-square statistic. Exact integer
# counts; expectation and chi-square from shared float expressions.
# ---------------------------------------------------------------------------

@register(
    "analytic_benford_digits",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (SELECT digit, count(*)::BIGINT AS n FROM d GROUP BY digit),
    t AS (SELECT sum(n)::BIGINT AS total FROM c)
    SELECT c.digit, c.n,
           CAST(c.n AS DOUBLE) / t.total AS observed_p,
           log10(1.0 + 1.0 / c.digit) AS benford_p,
           (CAST(c.n AS DOUBLE) / t.total - log10(1.0 + 1.0 / c.digit))
             * (CAST(c.n AS DOUBLE) / t.total - log10(1.0 + 1.0 / c.digit))
             / log10(1.0 + 1.0 / c.digit) * t.total AS chi2_term
    FROM c, t
    """,
    doc="Benford's-law first-digit audit of order totals: observed "
        "leading-digit frequencies vs log10(1+1/d) with per-digit "
        "chi-square terms — the data-quality/fraud smell test (synthetic "
        "uniform data fails it loudly, which the synthetic corpus here "
        "demonstrates honestly). One groupBy + one broadcast scalar",
)
def analytic_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("int")
    c = orders.select(digit.alias("digit")).groupBy("digit").agg(
        F.count("*").cast("long").alias("n")
    )
    t = c.agg(F.sum("n").cast("long").alias("total"))
    obs = F.col("n").cast("double") / F.col("total")
    ben = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return (
        c.crossJoin(F.broadcast(t))
        .select(
            "digit",
            "n",
            obs.alias("observed_p"),
            ben.alias("benford_p"),
            ((obs - ben) * (obs - ben) / ben * F.col("total")).alias("chi2_term"),
        )
    )


# ---------------------------------------------------------------------------
# Class-balanced downsampling: every class capped at the MINORITY class
# count, members chosen deterministically (bottom-k by md5) — the
# class-imbalance fix for classifier training data, zero RNG.
# ---------------------------------------------------------------------------

@register(
    "sample_balanced_classes",
    """
    WITH m AS (
      SELECT min(cnt)::BIGINT AS k FROM (
        SELECT lang, count(*) AS cnt FROM documents GROUP BY lang
      ) c
    ),
    r AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5('bal' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT r.doc_id, r.lang FROM r, m WHERE r.rn <= m.k
    """,
    doc="class-balanced downsampling: every lang class capped at the "
        "minority-class count, members the bottom-k by salted md5 — "
        "deterministic, reproducible class rebalancing (zero RNG). "
        "Per-class windows partitioned on the label; the cap is one "
        "broadcast scalar",
)
def sample_balanced_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    k = (
        docs.groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .agg(F.min("cnt").cast("long").alias("k"))
    )
    h = F.md5(F.concat(F.lit("bal"), F.col("doc_id").cast("string")).cast("binary"))
    w = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(k))
        .filter(F.col("rn") <= F.col("k"))
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# Jensen-Shannon divergence between per-source word distributions: the
# domain-shift diagnostic of data-mixture design (which sources differ, by
# how much — symmetric, bounded by ln 2). Exact integer counts; the
# per-word term from one shared expression; the per-pair sum via ORDERED
# folds (the text_zipf_fit discipline: a plain SUM of doubles accumulates
# in partition order and can flip the value hash's 9th decimal).
# ---------------------------------------------------------------------------

_JSD_TERM = (
    "0.5 * (CASE WHEN p > 0 THEN p * ln(2.0 * p / (p + q)) ELSE 0.0 END"
    " + CASE WHEN q > 0 THEN q * ln(2.0 * q / (p + q)) ELSE 0.0 END)"
)


@register(
    "text_js_divergence_domains",
    f"""
    WITH w AS (
      SELECT source, unnest(string_split_regex(lower(text), '[^a-z]+')) AS word
      FROM documents
    ),
    c AS (
      SELECT source, word, count(*)::BIGINT AS n FROM w
      WHERE length(word) >= 2 GROUP BY source, word
    ),
    t AS (SELECT source, sum(n)::BIGINT AS tot FROM c GROUP BY source),
    p AS (
      SELECT c.source, c.word, CAST(c.n AS DOUBLE) / t.tot AS p
      FROM c JOIN t ON t.source = c.source
    ),
    srcs AS (SELECT DISTINCT source FROM documents),
    pairs AS (
      SELECT a.source AS s1, b.source AS s2
      FROM srcs a JOIN srcs b ON a.source < b.source
    ),
    terms AS (
      SELECT pr.s1, pr.s2, x.word,
             coalesce(max(CASE WHEN x.source = pr.s1 THEN x.p END), 0.0) AS p,
             coalesce(max(CASE WHEN x.source = pr.s2 THEN x.p END), 0.0) AS q
      FROM pairs pr JOIN p x ON x.source = pr.s1 OR x.source = pr.s2
      GROUP BY pr.s1, pr.s2, x.word
    ),
    scored AS (SELECT s1, s2, word, {_JSD_TERM} AS term FROM terms)
    SELECT s1 AS source_a, s2 AS source_b, count(*)::BIGINT AS n_words,
           round(list_reduce(list_prepend(0.0, list(term ORDER BY word)),
                             (acc, v) -> acc + v), 9) AS jsd
    FROM scored GROUP BY s1, s2
    """,
    doc="Jensen-Shannon divergence between every pair of per-source word "
        "distributions (domain-shift / mixture-design diagnostic; "
        "symmetric, bounded by ln 2): exact vocabulary-bounded counts, "
        "per-word term from a shared expression, per-pair sum via an "
        "ORDERED word-sorted fold so doubles are bit-identical across "
        "engines. Source count is bounded, so the pair expansion is tiny; "
        "counts are map-side-combined groupBys",
)
def text_js_divergence_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "source", F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("word")
    ).filter(F.length("word") >= 2)
    c = w.groupBy("source", "word").agg(F.count("*").cast("long").alias("n"))
    t = c.groupBy("source").agg(F.sum("n").cast("long").alias("tot"))
    p = c.join(t, "source").select(
        "source", "word", (F.col("n").cast("double") / F.col("tot")).alias("p")
    )
    srcs = docs.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("s1"))
        .join(srcs.select(F.col("source").alias("s2")))
        .filter(F.col("s1") < F.col("s2"))
    )
    terms = (
        F.broadcast(pairs)
        .join(p, (p.source == F.col("s1")) | (p.source == F.col("s2")))
        .groupBy("s1", "s2", "word")
        .agg(
            F.coalesce(
                F.max(F.when(F.col("source") == F.col("s1"), F.col("p"))), F.lit(0.0)
            ).alias("p"),
            F.coalesce(
                F.max(F.when(F.col("source") == F.col("s2"), F.col("p"))), F.lit(0.0)
            ).alias("q"),
        )
    )
    scored = terms.withColumn("term", F.expr(_JSD_TERM))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("word"), F.col("term")))),
        lambda s: s["term"],
    )
    return scored.groupBy(
        F.col("s1").alias("source_a"), F.col("s2").alias("source_b")
    ).agg(
        F.count("*").cast("long").alias("n_words"),
        F.round(
            F.aggregate(ordered, F.lit(0.0), lambda acc, v: acc + v), 9
        ).alias("jsd"),
    )


# ---------------------------------------------------------------------------
# Pareto / ABC classification: cumulative revenue share per customer
# (A < 50%, B < 80%, C rest) — the 80/20 analysis of inventory/customer
# management. Integer-cents exact revenue; the cumulative sum runs through
# the two-level bucket prefix sum (extensions/sampling.two_level_order) —
# partitioned within-bucket windows + broadcast bucket offsets, never a
# single-partition global window over the customer dimension.
# ---------------------------------------------------------------------------

@register(
    "analytic_pareto_abc",
    """
    WITH r AS (
      SELECT o_custkey,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    t AS (SELECT sum(cents)::BIGINT AS total FROM r),
    c AS (
      SELECT o_custkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, o_custkey) AS cum,
             t.total
      FROM r, t
    ),
    cls AS (
      SELECT o_custkey, cents,
             CASE WHEN CAST(cum AS DOUBLE) / total <= 0.5 THEN 'A'
                  WHEN CAST(cum AS DOUBLE) / total <= 0.8 THEN 'B'
                  ELSE 'C' END AS abc
      FROM c
    )
    SELECT abc, count(*)::BIGINT AS n_customers,
           sum(cents)::BIGINT AS revenue_cents
    FROM cls GROUP BY abc
    """,
    doc="Pareto/ABC classification of customers by cumulative revenue "
        "share (A: first 50%, B: to 80%, C: tail) — the 80/20 analysis. "
        "Revenue in exact integer cents; deterministic total order "
        "(cents desc, custkey). The cumulative sum is the two-level "
        "bucket prefix sum (two_level_order): per-bucket partitioned "
        "windows + a bounded n_buckets-row offset table — no global "
        "single-partition sort at any scale",
)
def analytic_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    orders = load_table(spark, sf_dir, "orders")
    r = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    t = r.agg(F.sum("cents").cast("long").alias("total"))
    ranked = two_level_order(r, key_col="cents", tie_col="o_custkey", val_col="cents")
    c = ranked.crossJoin(F.broadcast(t))
    share = F.col("cum").cast("double") / F.col("total")
    cls = c.withColumn(
        "abc",
        F.when(share <= 0.5, "A").when(share <= 0.8, "B").otherwise("C"),
    )
    return cls.groupBy("abc").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Mixture solver: largest corpus achievable at EXACT target language
# proportions without upsampling — T = min over classes floor(n_l / p_l),
# then each class keeps floor(w_l * T / W) members (bottom-k by salted
# md5). The companion to temperature/upsample mixes: those approximate a
# smoothed mix, this solves the feasibility LP for a hard target (the
# "how much data can we train on at this mix" question). All-integer
# arithmetic; the class-size table is group-cardinality-bounded
# (broadcast); ranking windows partitioned on the label, never global.
# ---------------------------------------------------------------------------

_MIX_WEIGHTS = [("en", 4), ("zh", 2), ("de", 2), ("fr", 1), ("es", 1)]  # /10


@register(
    "sample_mixture_solver",
    f"""
    WITH w(lang, wt) AS (VALUES {", ".join(f"('{l}', {w})" for l, w in _MIX_WEIGHTS)}),
    sz AS (SELECT lang, count(*)::BIGINT AS cnt FROM documents GROUP BY lang),
    t AS (
      SELECT CAST(min(floor(cnt * 10.0 / wt)) AS BIGINT) AS total
      FROM sz JOIN w USING (lang)
    ),
    keep AS (
      SELECT sz.lang, CAST(floor(w.wt * t.total / 10.0) AS BIGINT) AS k
      FROM sz JOIN w USING (lang) CROSS JOIN t
    ),
    r AS (
      SELECT d.doc_id, d.lang,
             row_number() OVER (
               PARTITION BY d.lang
               ORDER BY md5('mix' || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS rn
      FROM documents d
    )
    SELECT r.doc_id, r.lang, keep.k AS lang_quota
    FROM r JOIN keep USING (lang) WHERE r.rn <= keep.k
    """,
    doc="mixture feasibility solver: the largest corpus at EXACT target "
        "lang proportions (en:zh:de:fr:es = 4:2:2:1:1) with downsampling "
        "only — T = min_l floor(10 n_l / w_l), class l keeps "
        "floor(w_l T / 10) members, bottom-k by salted md5 (zero RNG). "
        "Integer-exact on both engines; weights broadcast; per-class "
        "windows partitioned on the label",
)
def sample_mixture_solver(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = spark.createDataFrame(_MIX_WEIGHTS, "lang string, wt long")
    sz = docs.groupBy("lang").agg(F.count("*").cast("long").alias("cnt"))
    t = (
        sz.join(w, "lang")
        .select(F.floor(F.col("cnt") * 10.0 / F.col("wt")).cast("long").alias("q"))
        .agg(F.min("q").alias("total"))
    )
    keep = (
        sz.join(w, "lang")
        .crossJoin(F.broadcast(t))
        .select("lang", F.floor(F.col("wt") * F.col("total") / 10.0).cast("long").alias("k"))
    )
    h = F.md5(F.concat(F.lit("mix"), F.col("doc_id").cast("string")))
    rw = Window.partitionBy("lang").orderBy(h, F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(rw))
        .join(F.broadcast(keep), "lang")
        .filter(F.col("rn") <= F.col("k"))
        .select("doc_id", "lang", F.col("k").alias("lang_quota"))
    )


# ---------------------------------------------------------------------------
# Holt's linear-trend smoothing per series (double exponential smoothing):
# the (level, trend) recurrence as ONE ordered fold with a two-field
# struct accumulator — the next step up from EWMA for drifting series.
# alpha = beta = 0.5 (exact binary fractions) and identical expression
# shapes on both engines keep the IEEE arithmetic bit-deterministic; the
# oracle folds the same struct recurrence via list_prepend (the engine's
# aggregate() initial-value form has no DuckDB twin).
# ---------------------------------------------------------------------------

@register(
    "analytic_holt_winters",
    """
    WITH s AS (
      SELECT user_id, count(*)::BIGINT AS n_events,
             list(value ORDER BY ts, event_id) AS vs
      FROM events GROUP BY user_id HAVING count(*) >= 2
    ),
    r AS (
      SELECT user_id, n_events,
             -- LIST accumulator, not struct: DuckDB 1.0.0 list_reduce
             -- mutates struct accumulator fields sequentially (field 2
             -- sees field 1's NEW value); and bare float literals in
             -- struct/list constructors are DECIMAL, so CAST everything
             list_reduce(
               list_prepend(
                 [CAST(vs[1] AS DOUBLE), CAST(vs[2] - vs[1] AS DOUBLE)],
                 list_transform(vs[3:], v -> [CAST(v AS DOUBLE), CAST(0.0 AS DOUBLE)])
               ),
               (acc, e) -> [0.5 * e[1] + 0.5 * acc[1] + 0.5 * acc[2],
                            0.25 * e[1] - 0.25 * acc[1] + 0.75 * acc[2]]
             ) AS hb
      FROM s
    )
    SELECT user_id, n_events,
           hb[1] AS level_final, hb[2] AS trend_final,
           hb[1] + hb[2] AS forecast_next
    FROM r
    """,
    doc="Holt double exponential smoothing (alpha=beta=0.5) per user "
        "series: level+trend recurrence as one ordered in-executor fold "
        "with a struct accumulator — one shuffle on the series key, O(1) "
        "state per series, mergeable by re-folding tails at 100 TB",
)
def analytic_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                F.col("value").alias("v"),
            )
        )
    )
    g = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_events"), arr.alias("a"))
        .where(F.col("n_events") >= 2)
        .withColumn("vs", F.expr("transform(a, x -> x.v)"))
    )
    # linear form of the recurrence (nl = a*v + a*l + a*b; nb expands
    # through nl) with the SAME left-to-right op order as the oracle so
    # the IEEE double arithmetic is bit-identical on both engines
    fold = (
        "aggregate(slice(vs, 3, greatest(size(vs) - 2, 0)), "
        "named_struct('l', element_at(vs, 1), "
        "'b', element_at(vs, 2) - element_at(vs, 1)), "
        "(acc, v) -> named_struct("
        "'l', 0.5D * v + 0.5D * acc.l + 0.5D * acc.b, "
        "'b', 0.25D * v - 0.25D * acc.l + 0.75D * acc.b))"
    )
    return g.select(
        "user_id", "n_events",
        F.expr(f"{fold}.l").alias("level_final"),
        F.expr(f"{fold}.b").alias("trend_final"),
        F.expr(f"({fold}.l + {fold}.b)").alias("forecast_next"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted dataset interleaving (the `interleave_datasets`
# training-mix op): each source s gets an integer weight w_s; one "cycle"
# takes w_s consecutive items from each source in lexicographic source
# order, repeated for C = min_s floor(n_s / w_s) cycles. The j-th item of
# source s therefore lands at the CLOSED-FORM global position
# ((j-1) div w_s) * W + offset_s + ((j-1) mod w_s) + 1 — no global window,
# no sort: per-source ordering is a source-partitioned row_number, the
# offset table is #sources rows computed by a tiny self-join. This is the
# "produce the epoch's read order for a weighted source mix" step a
# dataloader shards on; positions are a bijection onto 1..W*C by
# construction.
# ---------------------------------------------------------------------------

@register(
    "sample_interleave_datasets",
    """
    WITH w AS (
      SELECT source, count(*)::BIGINT AS cnt,
             (CAST(substr(source, 4) AS BIGINT) % 3) + 1 AS wt
      FROM documents GROUP BY source
    ),
    c AS (SELECT min(cnt // wt) AS cycles, sum(wt) AS big_w FROM w),
    off AS (
      SELECT a.source, a.wt, coalesce(sum(b.wt), 0)::BIGINT AS off
      FROM w a LEFT JOIN w b ON b.source < a.source
      GROUP BY a.source, a.wt
    ),
    r AS (
      SELECT d.doc_id, d.source,
             row_number() OVER (
               PARTITION BY d.source
               ORDER BY md5('il' || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) - 1 AS j0
      FROM documents d
    )
    SELECT r.doc_id, r.source,
           CAST((r.j0 // off.wt) * c.big_w + off.off + (r.j0 % off.wt) + 1
                AS BIGINT) AS global_pos
    FROM r JOIN off USING (source) CROSS JOIN c
    WHERE r.j0 < off.wt * c.cycles
    """,
    doc="deterministic weighted round-robin dataset interleaving (the "
        "interleave_datasets training-mix op): weight w_s from the source "
        "name, C = min_s floor(n_s/w_s) full cycles, global position in "
        "closed form (j-1 div w)*W + offset + (j-1 mod w) + 1 — a bijection "
        "onto 1..W*C with zero global windows; per-source row_number is "
        "source-partitioned, the offset table is #sources rows (broadcast)",
)
def sample_interleave_datasets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wt = (F.substring("source", 4, 10).cast("long") % 3 + 1).alias("wt")
    w = docs.groupBy("source").agg(F.count("*").cast("long").alias("cnt")).select(
        "source", "cnt", wt
    )
    c = w.agg(
        F.min(F.expr("cnt div wt")).alias("cycles"),
        F.sum("wt").alias("big_w"),
    )
    a = w.select(F.col("source").alias("s_a"), F.col("wt").alias("wt_a"))
    b = w.select(F.col("source").alias("s_b"), F.col("wt").alias("wt_b"))
    off = (
        a.join(F.broadcast(b), F.col("s_b") < F.col("s_a"), "left")
        .groupBy("s_a", "wt_a")
        .agg(F.coalesce(F.sum("wt_b"), F.lit(0)).cast("long").alias("off"))
        .select(F.col("s_a").alias("source"), F.col("wt_a").alias("wt"), "off")
    )
    h = F.md5(F.concat(F.lit("il"), F.col("doc_id").cast("string")))
    rw = Window.partitionBy("source").orderBy(h, F.col("doc_id"))
    return (
        docs.withColumn("j0", F.row_number().over(rw) - 1)
        .join(F.broadcast(off), "source")
        .crossJoin(F.broadcast(c))
        .filter(F.col("j0") < F.col("wt") * F.col("cycles"))
        .select(
            "doc_id",
            "source",
            (
                F.expr("j0 div wt") * F.col("big_w")
                + F.col("off")
                + F.col("j0") % F.col("wt")
                + F.lit(1)
            ).alias("global_pos"),
        )
    )


# ---------------------------------------------------------------------------
# Inter-document n-gram novelty: for each doc, the fraction of its DISTINCT
# word 3-grams whose corpus-wide first occurrence (min doc_id) is this doc.
# The corpus-QA signal behind "how much of this crawl slice is boilerplate
# we already have" — near-zero novelty flags syndication/mirrors that
# pairwise near-dup misses when the copying is many-to-one. Plan: distinct
# grams per doc (one shuffle), min(doc_id) per gram (second shuffle,
# map-side combinable), join back on the gram and re-aggregate per doc —
# all linear in corpus gram mass, no windows at all.
# ---------------------------------------------------------------------------

@register(
    "text_ngram_novelty",
    """
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id,
             g.gram
      FROM toks, unnest(list_transform(
             generate_series(1, len(t) - 2),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g(gram)
      WHERE len(t) >= 3
    ),
    firsts AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram)
    SELECT g.doc_id,
           count(*)::BIGINT AS n_grams,
           sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)::BIGINT
             AS n_novel,
           CAST((sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END)
                 * 1000000) // count(*) AS BIGINT) AS novelty_ppm
    FROM grams g JOIN firsts f USING (gram)
    GROUP BY g.doc_id
    """,
    doc="inter-document n-gram novelty: per doc, the share of its distinct "
        "word 3-grams first seen (min doc_id) in this doc — the "
        "boilerplate/syndication corpus-QA signal; two linear shuffles "
        "(distinct grams, min-per-gram with map-side combine) + a join "
        "back, integer ppm ratio, zero windows",
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.split(F.trim(F.lower("text")), r"\s+").alias("t")
    ).where(F.size("t") >= 3)
    grams = (
        toks.select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 2), i -> "
                    "concat_ws(' ', element_at(t, i), element_at(t, i + 1), "
                    "element_at(t, i + 2)))"
                )
            ).alias("gram"),
        )
        .distinct()
    )
    firsts = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(
        F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    ).cast("long")
    return (
        grams.join(firsts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_novel",
            F.expr("(n_novel * 1000000) div n_grams").alias("novelty_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-feature OLS by exact normal equations: regress event value (cents)
# on hour-of-day and a purchase indicator. Every X'X / X'y entry is an
# EXACT integer sum (one aggregation, map-side combinable — the 100 TB
# plan is a single reduce of 9 longs); the 3x3 solve is Cramer's rule as
# a SHARED float expression over those integers, evaluated with the same
# textual formula on both engines so the IEEE doubles are bit-identical.
# The trend/feature-attribution primitive behind "does quality correlate
# with time-of-day / doc source" corpus questions.
# ---------------------------------------------------------------------------

# shared Cramer expressions over the double-cast sums (nd, a1, a2 = first
# row/col; c11, c12, c22 = X'X body; b0, b1, b2 = X'y) — identical text on
# both engines keeps the float arithmetic bit-deterministic
_OLS_DET = "(nd*(c11*c22 - c12*c12) - a1*(a1*c22 - c12*a2) + a2*(a1*c12 - c11*a2))"
_OLS_DET0 = "(b0*(c11*c22 - c12*c12) - a1*(b1*c22 - c12*b2) + a2*(b1*c12 - c11*b2))"
_OLS_DET1 = "(nd*(b1*c22 - c12*b2) - b0*(a1*c22 - c12*a2) + a2*(a1*b2 - b1*a2))"
_OLS_DET2 = "(nd*(c11*b2 - b1*c12) - a1*(a1*b2 - b1*a2) + b0*(a1*c12 - c11*a2))"


@register(
    "analytic_ols_regression",
    f"""
    WITH x AS (
      SELECT hour(ts)::BIGINT AS x1,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END::BIGINT AS x2,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT count(*)::BIGINT AS n, sum(x1)::BIGINT AS sx1,
             sum(x2)::BIGINT AS sx2, sum(x1*x1)::BIGINT AS s11,
             sum(x1*x2)::BIGINT AS s12, sum(x2*x2)::BIGINT AS s22,
             sum(y)::BIGINT AS sy, sum(x1*y)::BIGINT AS s1y,
             sum(x2*y)::BIGINT AS s2y
      FROM x
    ),
    d AS (
      SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx1 AS DOUBLE) AS a1,
             CAST(sx2 AS DOUBLE) AS a2, CAST(s11 AS DOUBLE) AS c11,
             CAST(s12 AS DOUBLE) AS c12, CAST(s22 AS DOUBLE) AS c22,
             CAST(sy AS DOUBLE) AS b0, CAST(s1y AS DOUBLE) AS b1,
             CAST(s2y AS DOUBLE) AS b2
      FROM s
    )
    SELECT n AS n_rows,
           {_OLS_DET0} / {_OLS_DET} AS beta0_cents,
           {_OLS_DET1} / {_OLS_DET} AS beta1_cents,
           {_OLS_DET2} / {_OLS_DET} AS beta2_cents
    FROM d
    """,
    doc="multi-feature OLS via exact integer normal equations: value-cents "
        "on (hour-of-day, purchase indicator) — X'X and X'y are 9 exact "
        "long sums in ONE map-side-combinable aggregation, the 3x3 Cramer "
        "solve is a shared float expression over them (bit-identical on "
        "both engines); numpy-lstsq differential in tests",
)
def analytic_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x1 = F.hour("ts").cast("long")
    x2 = F.when(F.col("event_type") == "purchase", 1).otherwise(0).cast("long")
    y = F.round(F.col("value") * 100).cast("long")
    s = ev.select(x1.alias("x1"), x2.alias("x2"), y.alias("y")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x1").cast("long").alias("sx1"),
        F.sum("x2").cast("long").alias("sx2"),
        F.sum(F.col("x1") * F.col("x1")).cast("long").alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).cast("long").alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).cast("long").alias("s22"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).cast("long").alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).cast("long").alias("s2y"),
    )
    d = s.select(
        "n",
        F.col("n").cast("double").alias("nd"),
        F.col("sx1").cast("double").alias("a1"),
        F.col("sx2").cast("double").alias("a2"),
        F.col("s11").cast("double").alias("c11"),
        F.col("s12").cast("double").alias("c12"),
        F.col("s22").cast("double").alias("c22"),
        F.col("sy").cast("double").alias("b0"),
        F.col("s1y").cast("double").alias("b1"),
        F.col("s2y").cast("double").alias("b2"),
    )
    return d.select(
        F.col("n").alias("n_rows"),
        F.expr(f"{_OLS_DET0} / {_OLS_DET}").alias("beta0_cents"),
        F.expr(f"{_OLS_DET1} / {_OLS_DET}").alias("beta1_cents"),
        F.expr(f"{_OLS_DET2} / {_OLS_DET}").alias("beta2_cents"),
    )


# ---------------------------------------------------------------------------
# Hilbert-curve clustering key: the locality-preserving upgrade of
# layout_zorder_key. Every unit step along the Hilbert index moves exactly
# one grid cell (Morton jumps across the plane at power-of-two seams), so
# sorting files by hkey gives tighter (A, B) rectangles per file and
# better min/max pruning for range predicates on either column — the
# reason newer table formats ship Hilbert clustering beside Z-order. The
# public iterative xy2d algorithm (quadrant digit + reflect/swap per
# level) runs as ONE aggregate fold with an (x, y, d) accumulator: pure
# integer arithmetic, linear expression size, no UDF; the oracle replays
# the identical fold via list_reduce with a LIST accumulator (the DuckDB
# struct-accumulator pitfall documented at analytic_holt_winters).
# ---------------------------------------------------------------------------

_HILBERT_STEP_SQL = """[
      CASE WHEN (acc[2] & e[1]) > 0 THEN acc[1]
           ELSE CASE WHEN (acc[1] & e[1]) > 0 THEN 32767 - acc[2] ELSE acc[2] END END,
      CASE WHEN (acc[2] & e[1]) > 0 THEN acc[2]
           ELSE CASE WHEN (acc[1] & e[1]) > 0 THEN 32767 - acc[1] ELSE acc[1] END END,
      acc[3] + e[1] * e[1] *
        (3 * (CASE WHEN (acc[1] & e[1]) > 0 THEN 1 ELSE 0 END)
         + (CASE WHEN (acc[2] & e[1]) > 0 THEN 1 ELSE 0 END)
           * (1 - 2 * (CASE WHEN (acc[1] & e[1]) > 0 THEN 1 ELSE 0 END)))
    ]"""


@register(
    "layout_hilbert_key",
    f"""
    SELECT o_orderkey, o_custkey,
           list_reduce(
             list_prepend(
               [CAST(o_custkey % 32768 AS BIGINT),
                CAST(o_orderkey % 32768 AS BIGINT), 0::BIGINT],
               list_transform(generate_series(1, 15),
                              i -> [CAST(1::BIGINT << (15 - i) AS BIGINT),
                                    0::BIGINT, 0::BIGINT])),
             (acc, e) -> {_HILBERT_STEP_SQL}
           )[3] AS hkey
    FROM orders
    """,
    doc="Hilbert-curve clustering key over (custkey, orderkey): the public "
        "xy2d fold (quadrant digit + reflect/swap rotation per level) as "
        "one aggregate() with an (x,y,d) integer accumulator — strictly "
        "better locality than the Morton twin layout_zorder_key (every "
        "unit d-step is one grid cell), so files sorted by hkey prune "
        "tighter on range predicates over either column; zero UDFs, "
        "adjacency property + independent Python replay in tests",
)
def layout_hilbert_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.operators.layout import hilbert_key

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey", "o_custkey",
        hilbert_key(F.col("o_custkey"), F.col("o_orderkey"), bits=15).alias("hkey"),
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg JACM'99) on the supplier->part-class
# graph — the second classic link-analysis prior beside PageRank, and the
# one that separates "links to many good things" (hub) from "linked by
# many good things" (authority); crawl frontier scoring uses both. Integer
# fixed point with max-normalization back to HITS_SCALE (multiply +
# floor-divide only), so the 2-round iteration is order-insensitive and
# the oracle replays it as unrolled CTEs, value-exact.
# ---------------------------------------------------------------------------

@register(
    "graph_hits",
    """
    WITH e AS (
      SELECT DISTINCT l_suppkey AS src, l_partkey % 100 AS dst FROM lineitem
    ),
    a1r AS (SELECT dst, count(*)::BIGINT * 1000000 AS raw FROM e GROUP BY dst),
    a1 AS (SELECT dst AS node,
                  CAST(raw * 1000000 // (SELECT max(raw) FROM a1r) AS BIGINT) AS score
           FROM a1r),
    h1r AS (SELECT e.src, sum(a1.score)::BIGINT AS raw
            FROM e JOIN a1 ON e.dst = a1.node GROUP BY e.src),
    h1 AS (SELECT src AS node,
                  CAST(raw * 1000000 // (SELECT max(raw) FROM h1r) AS BIGINT) AS score
           FROM h1r),
    a2r AS (SELECT e.dst, sum(h1.score)::BIGINT AS raw
            FROM e JOIN h1 ON e.src = h1.node GROUP BY e.dst),
    a2 AS (SELECT dst AS node,
                  CAST(raw * 1000000 // (SELECT max(raw) FROM a2r) AS BIGINT) AS score
           FROM a2r),
    h2r AS (SELECT e.src, sum(a2.score)::BIGINT AS raw
            FROM e JOIN a2 ON e.dst = a2.node GROUP BY e.src),
    h2 AS (SELECT src AS node,
                  CAST(raw * 1000000 // (SELECT max(raw) FROM h2r) AS BIGINT) AS score
           FROM h2r)
    SELECT coalesce(h2.node, a2.node) AS node,
           coalesce(h2.score, 0)::BIGINT AS hub_score,
           coalesce(a2.score, 0)::BIGINT AS auth_score
    FROM h2 FULL OUTER JOIN a2 ON h2.node = a2.node
    """,
    doc="HITS hubs & authorities (Kleinberg JACM'99), 2 rounds of integer "
        "fixed point with max-normalization to 1e6 (multiply + floor-div "
        "only, order-insensitive): each half-step is one edge-key join + "
        "one map-side-combinable groupBy, the max a broadcast scalar — "
        "the link-quality prior pair crawl scoring uses beside PageRank; "
        "oracle replays the unrolled rounds value-exact",
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.graph import hits_fixed_point

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.col("l_partkey") % 100).alias("dst"),
    ).distinct()
    return hits_fixed_point(edges, iterations=2)


# ---------------------------------------------------------------------------
# Feature hashing (the hashing trick, Weinberger et al. ICML'09): hashed
# signed bag-of-words into 64 buckets — the fixed-width, vocabulary-free
# featurizer for shallow quality/topic classifiers over a corpus whose
# vocabulary would not fit a dictionary. Sign bit debiases collisions
# (E[collision contribution] = 0). Sparse (doc, bucket, weight) output;
# the plan is explode -> map-side-combinable groupBy — one linear shuffle,
# no vocabulary table, no windows.
# ---------------------------------------------------------------------------

@register(
    "text_hash_features",
    """
    WITH tok AS (
      SELECT doc_id, u.t AS t
      FROM documents,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS u(t)
    ),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5('fh' || t), 1, 8))::BIGINT AS hv
      FROM tok WHERE t <> ''
    )
    SELECT doc_id, CAST(hv % 64 AS BIGINT) AS bucket,
           CAST(sum(1 - 2 * ((hv // 64) % 2)) AS BIGINT) AS weight
    FROM h GROUP BY doc_id, CAST(hv % 64 AS BIGINT)
    """,
    doc="feature hashing (Weinberger ICML'09): signed hashed bag-of-words "
        "into 64 buckets, sparse (doc, bucket, weight) rows — the "
        "vocabulary-free featurizer for corpus-scale shallow classifiers; "
        "one explode + one map-side-combinable groupBy, zero windows, "
        "zero vocabulary state",
)
def text_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"),
    ).where(F.col("t") != "")
    hv = F.conv(
        F.substring(F.md5(F.concat(F.lit("fh"), F.col("t"))), 1, 8), 16, 10
    ).cast("long")
    return (
        tok.select("doc_id", hv.alias("hv"))
        .groupBy("doc_id", F.expr("CAST(hv % 64 AS BIGINT)").alias("bucket"))
        .agg(
            F.sum(F.expr("1 - 2 * ((hv div 64) % 2)")).cast("long").alias("weight")
        )
    )


# ---------------------------------------------------------------------------
# Deterministic Poisson bootstrap CI (the distributed bootstrap: each
# resample gives every row an independent Poisson(1) multiplicity, so no
# resample ever needs a global n-with-replacement draw). Multiplicities
# come from the salted-md5 uniform via the exact Poisson(1) inverse CDF
# (thresholds as shared literals) — zero RNG, replayable on both engines.
# B=32 resample means are exact-integer sums with ONE double division
# each; the CI is the 2nd/31st order statistic of those 32 doubles (a
# bounded 32-element sort in an array, never a global window).
# ---------------------------------------------------------------------------

_POIS_W_SQL = """(CASE WHEN {u} < 0.36787944117144233 THEN 0
          WHEN {u} < 0.7357588823428847 THEN 1
          WHEN {u} < 0.9196986029286058 THEN 2
          WHEN {u} < 0.9810118431238462 THEN 3
          ELSE 4 END)"""


@register(
    "analytic_bootstrap_ci",
    f"""
    WITH x AS (
      SELECT event_id, CAST(round(value * 100) AS BIGINT) AS y FROM events
    ),
    r AS (
      SELECT b.b, x.y,
             {_POIS_W_SQL.format(u="(('0x' || substr(md5('boot' || CAST(b.b AS VARCHAR) || ':' || CAST(x.event_id AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)")} AS w
      FROM x CROSS JOIN generate_series(1, 32) AS b(b)
    ),
    m AS (
      SELECT b, CAST(sum(w * y) AS DOUBLE) / CAST(sum(w) AS DOUBLE) AS mean_b
      FROM r GROUP BY b
    ),
    s AS (SELECT list(mean_b ORDER BY mean_b) AS l FROM m),
    t AS (
      SELECT CAST(sum(y) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_c FROM x
    )
    SELECT 32::BIGINT AS n_resamples, t.mean_c AS mean_cents,
           s.l[2] AS ci_lo_cents, s.l[31] AS ci_hi_cents
    FROM s CROSS JOIN t
    """,
    doc="deterministic Poisson bootstrap CI for mean event value: B=32 "
        "resamples give each row a Poisson(1) multiplicity from the "
        "salted-md5 uniform via the exact inverse CDF (zero RNG, shared "
        "literals) — the distributed bootstrap that never materializes an "
        "n-with-replacement draw; resample means are exact integer sums + "
        "one double division, CI = 2nd/31st order statistic of 32 doubles "
        "(bounded in-array sort, no global window)",
)
def analytic_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        "event_id", F.round(F.col("value") * 100).cast("long").alias("y")
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    w = (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428847, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .otherwise(4)
    )
    r = x.select(
        "event_id", "y", F.explode(F.sequence(F.lit(1), F.lit(32))).alias("b")
    ).select("b", "y", w.alias("w"))
    m = r.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("y")).cast("double")
            / F.sum("w").cast("double")
        ).alias("mean_b")
    )
    s = m.agg(F.array_sort(F.collect_list("mean_b")).alias("l"))
    t = x.agg(
        (F.sum("y").cast("double") / F.count("*").cast("double")).alias("mean_c")
    )
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            F.lit(32).cast("long").alias("n_resamples"),
            F.col("mean_c").alias("mean_cents"),
            F.element_at("l", 2).alias("ci_lo_cents"),
            F.element_at("l", 31).alias("ci_hi_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom prefilter for INCREMENTAL dedup: probing a new crawl batch against
# an existing corpus without joining the corpus. The corpus's normalized-
# text fingerprints build the portable 1024-bit Bloom (same k=4 md5 scheme
# as sketch_bloom_filter — register-exact, bit_or-mergeable, so the
# production filter is maintained incrementally batch over batch); the new
# batch (doc_id % 5 == 0 here) probes the BROADCAST filter — per-batch
# cost independent of corpus size, which is the whole point at 100 TB
# (the exact-join twin rescans the corpus every batch). maybe_dup has no
# false negatives; the exact flag beside it measures the FP rate honestly
# (m=1024 is demo-sized; production m scales with corpus cardinality).
# ---------------------------------------------------------------------------

@register(
    "dedup_bloom_prefilter",
    """
    WITH fp AS (
      SELECT doc_id,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS f,
             doc_id % 5 = 0 AS is_new
      FROM documents
    ),
    corpus AS (SELECT f FROM fp WHERE NOT is_new),
    pos AS (
      SELECT DISTINCT
             (('0x' || substr(md5(f), 1 + 8*j.j, 8))::BIGINT % 1024) AS p
      FROM corpus, unnest([0, 1, 2, 3]) AS j(j)
    ),
    words AS (
      SELECT CAST(p // 32 AS INT) AS word_idx,
             CAST(bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS BIGINT) AS bits
      FROM pos GROUP BY 1
    ),
    probe AS (
      SELECT fp.doc_id, fp.f,
             (('0x' || substr(md5(fp.f), 1 + 8*j.j, 8))::BIGINT % 1024) AS p
      FROM fp, unnest([0, 1, 2, 3]) AS j(j) WHERE fp.is_new
    ),
    hit AS (
      SELECT probe.doc_id, probe.f,
             min(CASE WHEN ((coalesce(w.bits, 0) >> CAST(probe.p % 32 AS INT)) & 1) = 1
                      THEN 1 ELSE 0 END) AS all_set
      FROM probe LEFT JOIN words w ON w.word_idx = CAST(probe.p // 32 AS INT)
      GROUP BY probe.doc_id, probe.f
    )
    SELECT h.doc_id, CAST(h.all_set AS BIGINT) AS maybe_dup,
           CAST(CASE WHEN c.f IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_dup
    FROM hit h
    LEFT JOIN (SELECT DISTINCT f FROM corpus) c ON h.f = c.f
    """,
    doc="incremental-dedup Bloom prefilter: corpus fingerprints build the "
        "portable 1024-bit k=4 Bloom (bit_or-mergeable, maintained batch "
        "over batch), the new batch probes the BROADCAST filter — "
        "per-batch cost independent of corpus size; no false negatives by "
        "construction, FP rate measured honestly by the exact flag beside "
        "the probe",
)
def dedup_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import bloom_bits, bloom_positions

    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("f"),
        (F.col("doc_id") % 5 == 0).alias("is_new"),
    )
    corpus = fp.filter(~F.col("is_new")).select("f")
    words = bloom_bits(corpus.select(F.col("f").alias("key")))
    probe = fp.filter("is_new").select(
        "doc_id", "f", F.explode(bloom_positions(F.col("f"))).alias("p")
    )
    hit = (
        probe.join(
            F.broadcast(words),
            F.expr("cast(p div 32 as int)") == F.col("word_idx"),
            "left",
        )
        .select(
            "doc_id",
            "f",
            F.expr(
                "CASE WHEN ((coalesce(bits, 0L) >> cast(p % 32 as int)) & 1) = 1 "
                "THEN 1 ELSE 0 END"
            ).alias("set_"),
        )
        .groupBy("doc_id", "f")
        .agg(F.min("set_").alias("all_set"))
    )
    return (
        hit.join(corpus.distinct().withColumnRenamed("f", "cf"),
                 F.col("f") == F.col("cf"), "left")
        .select(
            "doc_id",
            F.col("all_set").cast("long").alias("maybe_dup"),
            F.when(F.col("cf").isNotNull(), 1).otherwise(0).cast("long").alias("is_dup"),
        )
    )


# ---------------------------------------------------------------------------
# Sample-ratio-mismatch chi-square guard: the first QA gate on any hashed
# A/B assignment (and on this repo's own md5 split device). Per stratum,
# the 50/50 chi-square statistic collapses to (n_a - n_b)^2 / n — exact
# integer counts, one shared float expression, flag at the 3.841 critical
# value (chi^2_1, alpha=0.05). One map-side-combinable aggregation.
# ---------------------------------------------------------------------------

_CHI2_SQL = "(CAST((n_a - n_b) * (n_a - n_b) AS DOUBLE) / CAST(n AS DOUBLE))"


@register(
    "analytic_srm_chi2",
    f"""
    WITH a AS (
      SELECT event_type,
             CASE WHEN (('0x' || substr(md5('ab' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5
                  THEN 1 ELSE 0 END AS in_a
      FROM events
    ),
    c AS (
      SELECT event_type, count(*)::BIGINT AS n, sum(in_a)::BIGINT AS n_a,
             (count(*) - sum(in_a))::BIGINT AS n_b
      FROM a GROUP BY event_type
    )
    SELECT event_type, n, n_a, n_b,
           {_CHI2_SQL} AS chi2,
           CAST(CASE WHEN {_CHI2_SQL} > 3.841 THEN 1 ELSE 0 END AS BIGINT) AS srm_flag
    FROM c
    """,
    doc="sample-ratio-mismatch guard per stratum: hashed 50/50 assignment, "
        "chi-square = (n_a - n_b)^2 / n from exact integer counts (shared "
        "float expression), flagged at the 3.841 critical value — the QA "
        "gate run before trusting any experiment readout or hashed split; "
        "one map-side-combinable aggregation",
)
def analytic_srm_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    in_a = F.when(hash_fraction(F.col("event_id"), "ab") < 0.5, 1).otherwise(0)
    c = (
        ev.select("event_type", in_a.alias("in_a"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("in_a").cast("long").alias("n_a"),
            (F.count("*") - F.sum("in_a")).cast("long").alias("n_b"),
        )
    )
    return c.select(
        "event_type", "n", "n_a", "n_b",
        F.expr(_CHI2_SQL).alias("chi2"),
        F.expr(f"CAST(CASE WHEN {_CHI2_SQL} > 3.841 THEN 1 ELSE 0 END AS BIGINT)").alias("srm_flag"),
    )


# ---------------------------------------------------------------------------
# Zone-map file skipping as data: per-"file" min/max stats (files simulated
# as orderkey div 1000 row groups) and the prune/scan accounting a scan
# planner would do for a date-range predicate — the observability behind
# every layout decision in this repo (zorder/hilbert/partitioning): how
# many files does the predicate actually skip, and how many rows does the
# survivor set over-scan. Date strings keep min/max portable; everything
# else is exact integer counts.
# ---------------------------------------------------------------------------

@register(
    "layout_file_skipping_stats",
    """
    WITH f AS (
      SELECT o_orderkey // 1000 AS file_id,
             strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS d
      FROM orders
    ),
    z AS (
      SELECT file_id, count(*)::BIGINT AS n_rows, min(d) AS min_d, max(d) AS max_d
      FROM f GROUP BY file_id
    ),
    p AS (
      SELECT n_rows,
             CASE WHEN max_d < '1994-01-01' OR min_d > '1994-12-31'
                  THEN 1 ELSE 0 END AS pruned
      FROM z
    )
    SELECT count(*)::BIGINT AS n_files,
           sum(pruned)::BIGINT AS n_pruned,
           sum(CASE WHEN pruned = 0 THEN n_rows ELSE 0 END)::BIGINT AS rows_scanned,
           (SELECT count(*)::BIGINT FROM f
            WHERE d BETWEEN '1994-01-01' AND '1994-12-31') AS rows_matching
    FROM p
    """,
    doc="zone-map file-skipping accounting: per-file (orderkey div 1000) "
        "min/max date stats, then the scan planner's arithmetic for a "
        "1994 date-range predicate — files pruned, rows scanned by the "
        "survivors, rows actually matching; the measurement that justifies "
        "(or indicts) a clustering choice before rewriting 100 TB",
)
def layout_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    f = orders.select(
        F.expr("o_orderkey div 1000").alias("file_id"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias("d"),
    )
    z = f.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
    )
    p = z.select(
        "n_rows",
        F.when(
            (F.col("max_d") < "1994-01-01") | (F.col("min_d") > "1994-12-31"), 1
        ).otherwise(0).alias("pruned"),
    )
    matching = f.filter(F.col("d").between("1994-01-01", "1994-12-31")).agg(
        F.count("*").cast("long").alias("rows_matching")
    )
    summary = p.agg(
        F.count("*").cast("long").alias("n_files"),
        F.sum("pruned").cast("long").alias("n_pruned"),
        F.sum(F.when(F.col("pruned") == 0, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
    )
    return summary.crossJoin(F.broadcast(matching)).select(
        "n_files", "n_pruned", "rows_scanned", "rows_matching"
    )


# ---------------------------------------------------------------------------
# Perceptual DCT-hash (pHash) image dedup: the frequency-domain upgrade of
# mm_image_ahash. The 8x8 cell grid (same real-decode + nearest-neighbor
# path) goes through a 2-D FIXED-POINT DCT-II — integer tap table
# C[u][i] = round(cos((2i+1)u*pi/16)*1e4), imported from the kernel module
# so oracle and engine cannot drift — and each of the 15 low-frequency
# coefficients (u,v < 4, DC excluded) becomes one bit against their exact
# 8th-smallest threshold. Median-of-coefficients thresholding makes the
# hash invariant to the uniform brightness/contrast shifts that flip
# aHash bits. All-integer end to end, so the oracle replays transform +
# threshold value-exactly from the synthesis rule.
# ---------------------------------------------------------------------------

from etl_consumer_spark.extensions.multimodal import PHASH_DCT as _PHASH_DCT

_PHASH_C_VALUES = ", ".join(
    f"({u}, {i}, {_PHASH_DCT[u][i]})" for u in range(4) for i in range(8)
)


@register(
    "mm_image_phash",
    f"""
    WITH d2 AS (
      SELECT d1.doc_id,
             CASE WHEN d1.doc_id % 5 = 4 AND prev.text IS NOT NULL
                  THEN prev.text ELSE d1.text END AS text
      FROM documents d1 LEFT JOIN documents prev ON prev.doc_id = d1.doc_id - 1
    ),
    r AS (
      SELECT doc_id, (8 + length(text) % 8) AS w,
             substr(repeat(md5(text), 6), 1, (8 + length(text) % 8) * 12) AS ras
      FROM d2
    ),
    cell AS (
      SELECT doc_id, u.k AS k,
             ascii(substr(ras, (((u.k // 8) // 2) * w + ((u.k % 8) * w) // 8) * 3 + 1, 1)) AS v
      FROM r, unnest(generate_series(0, 63)) AS u(k)
    ),
    c AS (SELECT u, i, CAST(cc AS BIGINT) AS cc
          FROM (VALUES {_PHASH_C_VALUES}) t(u, i, cc)),
    f AS (
      SELECT cell.doc_id, cu.u AS fu, cv.u AS fv,
             sum(cell.v * cu.cc * cv.cc)::BIGINT AS coef
      FROM cell
      JOIN c cu ON cu.i = cell.k // 8
      JOIN c cv ON cv.i = cell.k % 8
      WHERE NOT (cu.u = 0 AND cv.u = 0)
      GROUP BY cell.doc_id, cu.u, cv.u
    ),
    med AS (
      SELECT doc_id, (list(coef ORDER BY coef))[8] AS m FROM f GROUP BY doc_id
    ),
    bits AS (
      SELECT f.doc_id,
             string_agg(CASE WHEN f.coef > med.m THEN '1' ELSE '0' END,
                        '' ORDER BY f.fu, f.fv) AS phash
      FROM f JOIN med USING (doc_id) GROUP BY f.doc_id
    )
    SELECT phash, count(*) AS n_images, min(doc_id) AS keeper_id
    FROM bits GROUP BY phash
    """,
    doc="image dedup via perceptual DCT-hash (pHash): real decode -> 8x8 "
        "cells -> fixed-point 2-D DCT-II (integer taps round(cos*1e4), "
        "one table shared by kernel and oracle) -> 15 low-frequency bits "
        "against their exact median — invariant to the uniform "
        "brightness/contrast shifts that flip aHash bits; the Arrow "
        "kernel only decodes+transforms, the shuffle key is the 15-bit "
        "hash string; numpy-DCT differential in tests",
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    prev = docs.select((F.col("doc_id") + 1).alias("doc_id"), F.col("text").alias("prev_text"))
    with_dups = (
        docs.join(prev, "doc_id", "left")
        .select(
            "doc_id",
            F.when(
                (F.col("doc_id") % 5 == 4) & F.col("prev_text").isNotNull(),
                F.col("prev_text"),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    media = M.synthesize_media_table(with_dups, "doc_id", "text")
    return (
        M.phash_images(media)
        .groupBy("phash")
        .agg(F.count("*").alias("n_images"), F.min("media_id").alias("keeper_id"))
    )


# ---------------------------------------------------------------------------
# Synchronous label propagation (Raghavan et al. 2007) — community
# detection for corpus/link clustering where connected components
# over-merge (everything touching is one component) and modularity needs a
# labeling to score. Deterministic: adopt the most frequent neighbor
# label, ties to the SMALLEST; the argmax is packed into one integer key
# (count * 1e9 - label) so each round is just combinable aggregates — no
# windows anywhere — and the unpack is exact integer arithmetic on any
# engine. 2 synchronous rounds, replayed unrolled by the oracle.
# ---------------------------------------------------------------------------

@register(
    "graph_label_propagation",
    """
    WITH eu AS (
      SELECT DISTINCT least(l_suppkey, 1000 + l_partkey % 100) AS a,
                      greatest(l_suppkey, 1000 + l_partkey % 100) AS b
      FROM lineitem WHERE l_suppkey <> 1000 + l_partkey % 100
    ),
    sym AS (SELECT a, b FROM eu UNION ALL SELECT b AS a, a AS b FROM eu),
    l0 AS (SELECT DISTINCT a AS node, a::BIGINT AS l FROM sym),
    c1 AS (SELECT s.a AS node, l0.l AS l, count(*)::BIGINT AS c
           FROM sym s JOIN l0 ON s.b = l0.node GROUP BY s.a, l0.l),
    p1 AS (SELECT node, max(c * 1000000000 - l) AS k FROM c1 GROUP BY node),
    l1 AS (SELECT node,
                  CAST(((k + 999999999) // 1000000000) * 1000000000 - k AS BIGINT) AS l
           FROM p1),
    c2 AS (SELECT s.a AS node, l1.l AS l, count(*)::BIGINT AS c
           FROM sym s JOIN l1 ON s.b = l1.node GROUP BY s.a, l1.l),
    p2 AS (SELECT node, max(c * 1000000000 - l) AS k FROM c2 GROUP BY node),
    l2 AS (SELECT node,
                  CAST(((k + 999999999) // 1000000000) * 1000000000 - k AS BIGINT) AS l
           FROM p2)
    SELECT node, l AS community FROM l2
    """,
    doc="synchronous label propagation (Raghavan 2007), 2 rounds, most "
        "frequent neighbor label with smallest-label ties: the "
        "argmax-with-tiebreak packs into one integer key max(c*1e9 - l), "
        "so every round is one edge join + two map-side-combinable "
        "groupBys, zero windows; deterministic, oracle replays unrolled "
        "rounds value-exact — the community layer between connected "
        "components (over-merges) and modularity (needs a labeling)",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.graph import label_propagation

    li = load_table(spark, sf_dir, "lineitem")
    edges = li.select(
        F.col("l_suppkey").alias("src"),
        (F.lit(1000) + F.col("l_partkey") % 100).alias("dst"),
    )
    return label_propagation(edges, rounds=2)


# ---------------------------------------------------------------------------
# Difference-in-differences: the causal-effect readout on a hashed
# treatment assignment with a fixed period boundary — the analysis an
# experimentation pipeline runs after analytic_srm_chi2 clears the split.
# All four cell aggregates are exact integer (count, cents-sum) in ONE
# map-side-combinable aggregation; the four means and the DiD contrast
# are shared float expressions over them, bit-identical across engines.
# ---------------------------------------------------------------------------

_DID_MEAN = "(CAST(s_{g} AS DOUBLE) / CAST(n_{g} AS DOUBLE))"
_DID_EXPR = (
    f"(({_DID_MEAN.format(g='t_post')} - {_DID_MEAN.format(g='t_pre')})"
    f" - ({_DID_MEAN.format(g='c_post')} - {_DID_MEAN.format(g='c_pre')}))"
)


@register(
    "analytic_did",
    f"""
    WITH x AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS y,
             CASE WHEN (('0x' || substr(md5('did' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5
                  THEN 1 ELSE 0 END AS treated,
             CASE WHEN strftime(ts, '%Y-%m-%d') >= '2024-01-16' THEN 1 ELSE 0 END AS post
      FROM events
    ),
    g AS (
      SELECT sum(CASE WHEN treated = 1 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t_post,
             sum(CASE WHEN treated = 1 AND post = 1 THEN y ELSE 0 END)::BIGINT AS s_t_post,
             sum(CASE WHEN treated = 1 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS n_t_pre,
             sum(CASE WHEN treated = 1 AND post = 0 THEN y ELSE 0 END)::BIGINT AS s_t_pre,
             sum(CASE WHEN treated = 0 AND post = 1 THEN 1 ELSE 0 END)::BIGINT AS n_c_post,
             sum(CASE WHEN treated = 0 AND post = 1 THEN y ELSE 0 END)::BIGINT AS s_c_post,
             sum(CASE WHEN treated = 0 AND post = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c_pre,
             sum(CASE WHEN treated = 0 AND post = 0 THEN y ELSE 0 END)::BIGINT AS s_c_pre
      FROM x
    )
    SELECT n_t_post, n_t_pre, n_c_post, n_c_pre,
           {_DID_MEAN.format(g='t_post')} AS mean_t_post_cents,
           {_DID_MEAN.format(g='t_pre')} AS mean_t_pre_cents,
           {_DID_MEAN.format(g='c_post')} AS mean_c_post_cents,
           {_DID_MEAN.format(g='c_pre')} AS mean_c_pre_cents,
           {_DID_EXPR} AS did_cents
    FROM g
    """,
    doc="difference-in-differences on the hashed user-level treatment "
        "split with a fixed period boundary: four exact integer "
        "(count, cents-sum) cells in ONE combinable aggregation, means "
        "and the DiD contrast as shared float expressions — the causal "
        "readout run after the SRM gate clears the assignment",
)
def analytic_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    x = ev.select(
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.when(hash_fraction(F.col("user_id"), "did") < 0.5, 1).otherwise(0).alias("treated"),
        F.when(F.date_format("ts", "yyyy-MM-dd") >= "2024-01-16", 1).otherwise(0).alias("post"),
    )

    def cell(t, p, col, name):
        return F.sum(
            F.when((F.col("treated") == t) & (F.col("post") == p), col).otherwise(0)
        ).cast("long").alias(name)

    g = x.agg(
        cell(1, 1, F.lit(1), "n_t_post"), cell(1, 1, F.col("y"), "s_t_post"),
        cell(1, 0, F.lit(1), "n_t_pre"), cell(1, 0, F.col("y"), "s_t_pre"),
        cell(0, 1, F.lit(1), "n_c_post"), cell(0, 1, F.col("y"), "s_c_post"),
        cell(0, 0, F.lit(1), "n_c_pre"), cell(0, 0, F.col("y"), "s_c_pre"),
    )
    return g.select(
        "n_t_post", "n_t_pre", "n_c_post", "n_c_pre",
        F.expr(_DID_MEAN.format(g="t_post")).alias("mean_t_post_cents"),
        F.expr(_DID_MEAN.format(g="t_pre")).alias("mean_t_pre_cents"),
        F.expr(_DID_MEAN.format(g="c_post")).alias("mean_c_post_cents"),
        F.expr(_DID_MEAN.format(g="c_pre")).alias("mean_c_pre_cents"),
        F.expr(_DID_EXPR).alias("did_cents"),
    )


# ---------------------------------------------------------------------------
# HLL set algebra: the property that makes HLL the 100 TB distinct-count
# device is that registers MERGE — union is a per-bucket max, so sketches
# built per partition / per day / per source combine without re-reading
# data, and inclusion-exclusion on the merged estimate gives the overlap.
# Two event slices (purchase vs signup users) each build the register-
# exact HLL-256; the union merges registers; the intersection estimate is
# est_a + est_b - est_union. Exact counts alongside expose the error.
# ---------------------------------------------------------------------------

_HLL_RANKS_SQL = """
      SELECT ('0x' || substr(hx, 1, 2))::INTEGER AS bucket,
             CASE WHEN regexp_replace(substr(hx, 3, 13), '^0+', '') = '' THEN 53
                  ELSE (length(substr(hx, 3, 13))
                        - length(regexp_replace(substr(hx, 3, 13), '^0+', ''))) * 4
                       + CASE substr(regexp_replace(substr(hx, 3, 13), '^0+', ''), 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                       + 1 END AS rank
      FROM (SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events
            WHERE event_type = '{etype}')"""

_HLL_EST_SQL = (
    f"round(CASE WHEN {_HLL_ALPHA_M2!r} / (sum_pow_{{s}} + 256 - n_{{s}}) <= 640"
    f"                AND n_{{s}} < 256"
    f"           THEN 256 * ln(256.0 / (256 - n_{{s}}))"
    f"           ELSE {_HLL_ALPHA_M2!r} / (sum_pow_{{s}} + 256 - n_{{s}}) END, 6)"
)


@register(
    "sketch_hll_union",
    f"""
    WITH ra AS (SELECT bucket, max(rank) AS r FROM ({_HLL_RANKS_SQL.format(etype='purchase')}) GROUP BY bucket),
    rb AS (SELECT bucket, max(rank) AS r FROM ({_HLL_RANKS_SQL.format(etype='signup')}) GROUP BY bucket),
    ru AS (SELECT bucket, max(r) AS r
           FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY bucket),
    agg AS (
      SELECT (SELECT count(*)::BIGINT FROM ra) AS n_a,
             (SELECT sum(power(2.0, -r)) FROM ra) AS sum_pow_a,
             (SELECT count(*)::BIGINT FROM rb) AS n_b,
             (SELECT sum(power(2.0, -r)) FROM rb) AS sum_pow_b,
             (SELECT count(*)::BIGINT FROM ru) AS n_u,
             (SELECT sum(power(2.0, -r)) FROM ru) AS sum_pow_u
    ),
    ex AS (
      SELECT count(DISTINCT user_id)::BIGINT AS exact_union
      FROM events WHERE event_type IN ('purchase', 'signup')
    )
    SELECT {_HLL_EST_SQL.format(s='a')} AS est_a,
           {_HLL_EST_SQL.format(s='b')} AS est_b,
           {_HLL_EST_SQL.format(s='u')} AS est_union,
           round({_HLL_EST_SQL.format(s='a')} + {_HLL_EST_SQL.format(s='b')}
                 - {_HLL_EST_SQL.format(s='u')}, 6) AS est_intersection,
           ex.exact_union
    FROM agg CROSS JOIN ex
    """,
    doc="HLL set algebra: purchase-user and signup-user HLL-256 sketches "
        "merged by per-bucket register max (the mergeability that makes "
        "HLL the 100 TB distinct-count device — per-partition sketches "
        "combine without re-reading data), overlap by inclusion-exclusion "
        "est_a + est_b - est_union; register-exact on both engines, exact "
        "union count alongside exposes the error",
)
def sketch_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import hll_estimate_col, hll_registers

    ev = load_table(spark, sf_dir, "events")
    ra = hll_registers(ev.filter(F.col("event_type") == "purchase"), F.col("user_id"))
    rb = hll_registers(ev.filter(F.col("event_type") == "signup"), F.col("user_id"))
    ru = ra.union(rb).groupBy("bucket").agg(F.max("r").alias("r"))

    def agg1(df, s):
        return df.agg(
            F.count("*").cast("long").alias(f"n_{s}"),
            F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias(f"sum_pow_{s}"),
        )

    a, b, u = agg1(ra, "a"), agg1(rb, "b"), agg1(ru, "u")
    ests = (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(u))
        .select(
            F.round(hll_estimate_col(F.col("n_a"), F.col("sum_pow_a")), 6).alias("est_a"),
            F.round(hll_estimate_col(F.col("n_b"), F.col("sum_pow_b")), 6).alias("est_b"),
            F.round(hll_estimate_col(F.col("n_u"), F.col("sum_pow_u")), 6).alias("est_union"),
            F.round(
                F.round(hll_estimate_col(F.col("n_a"), F.col("sum_pow_a")), 6)
                + F.round(hll_estimate_col(F.col("n_b"), F.col("sum_pow_b")), 6)
                - F.round(hll_estimate_col(F.col("n_u"), F.col("sum_pow_u")), 6),
                6,
            ).alias("est_intersection"),
        )
    )
    exact = ev.filter(F.col("event_type").isin("purchase", "signup")).agg(
        F.count_distinct("user_id").cast("long").alias("exact_union")
    )
    return ests.crossJoin(F.broadcast(exact))


# ---------------------------------------------------------------------------
# Group-integrity k-fold assignment: cross-validation folds where ALL
# documents of a group (here: source) land in the same fold — the split
# that prevents the train/eval leakage a per-document split causes when
# near-duplicates cluster within groups (the GroupKFold contract). Fold =
# salted md5 of the GROUP key, so the assignment is stable under corpus
# growth and repartitioning; map-only, zero shuffles beyond the scan.
# ---------------------------------------------------------------------------

@register(
    "sample_group_kfold",
    """
    SELECT doc_id, source,
           CAST(('0x' || substr(md5('kf' || source), 1, 8))::BIGINT % 5 AS BIGINT) AS fold
    FROM documents
    """,
    doc="group-integrity k-fold (the GroupKFold contract): fold = salted "
        "md5 of the GROUP key (source) % 5, so every doc of a group "
        "shares a fold and within-group near-dups can never straddle "
        "train/eval; stable under corpus growth, map-only",
)
def sample_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.concat(F.lit("kf"), F.col("source"))), 1, 8), 16, 10)
        .cast("long")
        % 5
    )
    return docs.select("doc_id", "source", fold.cast("long").alias("fold"))


# ---------------------------------------------------------------------------
# CUPED variance reduction (Deng et al. WSDM'13) — the industry-standard
# experiment readout that uses each unit's PRE-period metric as a control
# covariate: theta = cov(X,Y)/var(X) from exact integer power sums, then
# the treatment effect on Y - theta*X. Completes the experimentation
# trio: analytic_srm_chi2 gates the split, analytic_did reads the naive
# contrast, CUPED reads the variance-reduced one on the SAME hashed
# assignment (salt 'did'). One groupBy(user) + one global combinable
# aggregate; every input to the float expressions is an exact long.
# ---------------------------------------------------------------------------

_CUPED_THETA = (
    "((CAST(n_u AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
    " / (CAST(n_u AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
)
_CUPED_RAW = (
    "(CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
    " - CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE))"
)
_CUPED_ADJ = (
    f"((CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE) - {_CUPED_THETA} * (CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)))"
    f" - (CAST(sy_c AS DOUBLE) / CAST(n_c AS DOUBLE) - {_CUPED_THETA} * (CAST(sx_c AS DOUBLE) / CAST(n_c AS DOUBLE))))"
)


@register(
    "analytic_cuped",
    f"""
    WITH u AS (
      SELECT user_id,
             sum(CASE WHEN strftime(ts, '%Y-%m-%d') < '2024-01-16'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS x,
             sum(CASE WHEN strftime(ts, '%Y-%m-%d') >= '2024-01-16'
                      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)::BIGINT AS y,
             CASE WHEN (('0x' || substr(md5('did' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5
                  THEN 1 ELSE 0 END AS treated
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT count(*)::BIGINT AS n_u, sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * y)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx,
             sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t,
             sum(CASE WHEN treated = 1 THEN x ELSE 0 END)::BIGINT AS sx_t,
             sum(CASE WHEN treated = 1 THEN y ELSE 0 END)::BIGINT AS sy_t,
             sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c,
             sum(CASE WHEN treated = 0 THEN x ELSE 0 END)::BIGINT AS sx_c,
             sum(CASE WHEN treated = 0 THEN y ELSE 0 END)::BIGINT AS sy_c
      FROM u
    )
    SELECT n_u, n_t, n_c,
           {_CUPED_THETA} AS theta,
           {_CUPED_RAW} AS effect_raw_cents,
           {_CUPED_ADJ} AS effect_cuped_cents
    FROM s
    """,
    doc="CUPED variance-reduced treatment effect (Deng WSDM'13): per-user "
        "pre/post cents totals, theta = cov(X,Y)/var(X) from exact long "
        "power sums, adjusted contrast on Y - theta*X — same hashed "
        "assignment as analytic_did (salt 'did'), completing the "
        "SRM -> DiD -> CUPED experimentation trio; one groupBy(user) + "
        "one combinable global aggregate, shared float expressions",
)
def analytic_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    pre = F.when(F.date_format("ts", "yyyy-MM-dd") < "2024-01-16", cents).otherwise(0)
    post = F.when(F.date_format("ts", "yyyy-MM-dd") >= "2024-01-16", cents).otherwise(0)
    u = ev.groupBy("user_id").agg(
        F.sum(pre).cast("long").alias("x"),
        F.sum(post).cast("long").alias("y"),
    ).select(
        "x", "y",
        F.when(hash_fraction(F.col("user_id"), "did") < 0.5, 1).otherwise(0).alias("treated"),
    )
    s = u.agg(
        F.count("*").cast("long").alias("n_u"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("x")).otherwise(0)).cast("long").alias("sx_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0)).cast("long").alias("sy_t"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("x")).otherwise(0)).cast("long").alias("sx_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0)).cast("long").alias("sy_c"),
    )
    return s.select(
        "n_u", "n_t", "n_c",
        F.expr(_CUPED_THETA).alias("theta"),
        F.expr(_CUPED_RAW).alias("effect_raw_cents"),
        F.expr(_CUPED_ADJ).alias("effect_cuped_cents"),
    )


# ---------------------------------------------------------------------------
# CCNet perplexity buckets (Wenzek et al. LREC'20): score every document
# with the corpus bigram LM, then split the corpus into head/middle/tail
# terciles of LM quality — the binning Common Crawl curation actually
# ships. Per-bigram log-probs are floored to integer MICRO-units before
# the per-doc sum, so the per-doc score is an exact long (order-
# insensitive) and the tercile thresholds come from the shared
# linear-interpolation percentile over longs (bit-identical cross-engine,
# the olap_percentiles_exact device). The global percentile is one
# sort-based aggregate over one row per document — same caveat and same
# sketch twin (sketch_bottomk_quantiles) as olap_percentiles_exact.
# ---------------------------------------------------------------------------

@register(
    "text_ccnet_buckets",
    """
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM tok
    ),
    c2 AS (SELECT bigram, count(*) AS c2 FROM bg GROUP BY bigram),
    c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, count(*) AS c1
           FROM bg GROUP BY 1),
    v AS (SELECT count(DISTINCT u) AS v
          FROM (SELECT unnest(w) AS u FROM tok)),
    scored AS (
      SELECT bg.doc_id,
             CAST(floor(ln((c2.c2 + 1)::DOUBLE / (c1.c1 + v.v)) * 1000000) AS BIGINT) AS lpm
      FROM bg
      JOIN c2 USING (bigram)
      JOIN c1 ON c1.w1 = split_part(bg.bigram, ' ', 1)
      CROSS JOIN v
    ),
    doc AS (
      SELECT doc_id, CAST(sum(lpm) // count(*) AS BIGINT) AS avg_lp_micro
      FROM scored GROUP BY doc_id
    ),
    thr AS (
      SELECT quantile_cont(avg_lp_micro, 1.0/3) AS t1,
             quantile_cont(avg_lp_micro, 2.0/3) AS t2
      FROM doc
    )
    SELECT doc.doc_id, doc.avg_lp_micro,
           CASE WHEN doc.avg_lp_micro >= thr.t2 THEN 'head'
                WHEN doc.avg_lp_micro >= thr.t1 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM doc CROSS JOIN thr
    """,
    doc="CCNet perplexity buckets (Wenzek LREC'20): bigram-LM doc scores "
        "as exact integer micro-units (per-bigram floor before the "
        "order-insensitive long sum), head/middle/tail terciles from the "
        "shared linear-interpolation percentile over longs — the LM "
        "quality binning Common Crawl curation ships; count tables "
        "vocabulary-bounded and broadcast, one global percentile "
        "aggregate over one row per doc (sketch twin: "
        "sketch_bottomk_quantiles)",
)
def text_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w"))
    bg = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                # zip_with(slice, slice): sequence(0, size-2) yields the
                # DESCENDING [0,-1] for 1-token docs and w[-1] throws under
                # Spark-4 ANSI; slices degrade to empty arrays instead
                "zip_with(slice(w, 1, greatest(size(w) - 1, 0)),"
                " slice(w, 2, greatest(size(w) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram"),
    )
    c2 = bg.groupBy("bigram").agg(F.count("*").alias("c2"))
    c1 = (
        bg.select(F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").alias("c1"))
    )
    v = tok.select(F.explode("w").alias("u")).agg(F.count_distinct("u").alias("v"))
    scored = (
        bg.join(F.broadcast(c2), "bigram")
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(F.broadcast(c1), "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            F.floor(
                F.log((F.col("c2") + 1).cast("double") / (F.col("c1") + F.col("v")))
                * 1000000
            ).cast("long").alias("lpm"),
        )
    )
    doc = scored.groupBy("doc_id").agg(
        F.expr("CAST(sum(lpm) div count(*) AS BIGINT)").alias("avg_lp_micro")
    )
    thr = doc.agg(
        F.expr("percentile(avg_lp_micro, 1.0/3)").alias("t1"),
        F.expr("percentile(avg_lp_micro, 2.0/3)").alias("t2"),
    )
    return doc.crossJoin(F.broadcast(thr)).select(
        "doc_id",
        "avg_lp_micro",
        F.when(F.col("avg_lp_micro") >= F.col("t2"), "head")
        .when(F.col("avg_lp_micro") >= F.col("t1"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


# ---------------------------------------------------------------------------
# b-bit MinHash (Li & Koenig, CACM'11): store only the lowest b=2 bits of
# each MinHash component — 4x less sketch storage — and recover Jaccard
# with the collision correction s = (m - C) / (1 - C), C = 2^-b. The
# audit mirrors dedup_minhash_accuracy_eval: per capped-LSH candidate
# pair, the 2-bit estimate beside the full-width estimate and the exact
# shingle Jaccard, so the storage/accuracy trade is measured, not
# assumed. Same bounded candidate pipeline; exact side joins shingles
# only for candidate docs.
# ---------------------------------------------------------------------------

@register(
    "dedup_minhash_b_bit",
    f"""{SIG_SQL},
    buckets AS (
      SELECT doc_id, 0 AS band, md5(mh0::VARCHAR) AS bucket FROM sig UNION ALL
      SELECT doc_id, 1, md5(mh1::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 2, md5(mh2::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 3, md5(mh3::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 4, md5(mh4::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 5, md5(mh5::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 6, md5(mh6::VARCHAR) FROM sig UNION ALL
      SELECT doc_id, 7, md5(mh7::VARCHAR) FROM sig
    ),
    bsize AS (SELECT band, bucket, count(*) AS n FROM buckets GROUP BY band, bucket),
    kept AS (
      SELECT b.doc_id, b.band, b.bucket
      FROM buckets b JOIN bsize s ON b.band = s.band AND b.bucket = s.bucket
      WHERE s.n <= 3
    ),
    cand AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM kept l JOIN kept r ON l.band = r.band AND l.bucket = r.bucket
      WHERE l.doc_id < r.doc_id
    ),
    est AS (
      SELECT c.a, c.b,
             ((sa.mh0 = sb.mh0)::INT + (sa.mh1 = sb.mh1)::INT
              + (sa.mh2 = sb.mh2)::INT + (sa.mh3 = sb.mh3)::INT
              + (sa.mh4 = sb.mh4)::INT + (sa.mh5 = sb.mh5)::INT
              + (sa.mh6 = sb.mh6)::INT + (sa.mh7 = sb.mh7)::INT) / 8.0 AS est_full,
             ((sa.mh0 % 4 = sb.mh0 % 4)::INT + (sa.mh1 % 4 = sb.mh1 % 4)::INT
              + (sa.mh2 % 4 = sb.mh2 % 4)::INT + (sa.mh3 % 4 = sb.mh3 % 4)::INT
              + (sa.mh4 % 4 = sb.mh4 % 4)::INT + (sa.mh5 % 4 = sb.mh5 % 4)::INT
              + (sa.mh6 % 4 = sb.mh6 % 4)::INT + (sa.mh7 % 4 = sb.mh7 % 4)::INT) / 8.0 AS m_bbit
      FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b
    ),
    sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
      SELECT l.doc_id AS a, r.doc_id AS b, count(*) AS n_common
      FROM sh l JOIN sh r ON l.shingle = r.shingle AND l.doc_id < r.doc_id
      GROUP BY l.doc_id, r.doc_id
    ),
    exact AS (
      SELECT c.a, c.b,
             coalesce(i.n_common, 0)::DOUBLE
               / (za.sz + zb.sz - coalesce(i.n_common, 0)) AS exact_j
      FROM cand c
      LEFT JOIN inter i ON i.a = c.a AND i.b = c.b
      JOIN sizes za ON za.doc_id = c.a
      JOIN sizes zb ON zb.doc_id = c.b
    )
    SELECT est.a, est.b,
           round((est.m_bbit - 0.25) / 0.75, 6) AS est_bbit,
           round(est.est_full, 6) AS est_full,
           round(exact.exact_j, 6) AS exact_jaccard,
           round(abs((est.m_bbit - 0.25) / 0.75 - exact.exact_j), 6) AS abs_err_bbit
    FROM est JOIN exact ON est.a = exact.a AND est.b = exact.b
    """,
    doc="b-bit MinHash audit (Li & Koenig CACM'11, b=2): per capped-LSH "
        "candidate pair, the collision-corrected 2-bit estimate "
        "(m - 1/4)/(3/4) beside the full-width estimate and the exact "
        "shingle Jaccard — 4x sketch-storage saving measured, not "
        "assumed; same bounded candidate pipeline as the dedup family, "
        "exact side joins shingles only for candidate docs",
)
def dedup_minhash_b_bit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import dedup as D

    docs = load_table(spark, sf_dir, "documents")
    shingles = D.exploded_shingles(docs)
    sigs = D.minhash_signatures(shingles, num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    cand = D.candidate_pairs(buckets, max_bucket_size=3)
    agree_full = sum(
        (F.col(f"sa.mh{j}") == F.col(f"sb.mh{j}")).cast("int") for j in range(8)
    )
    agree_bbit = sum(
        (F.col(f"sa.mh{j}") % 4 == F.col(f"sb.mh{j}") % 4).cast("int") for j in range(8)
    )
    est = (
        cand.join(sigs.alias("sa"), F.col("sa.doc_id") == cand.a)
        .join(sigs.alias("sb"), F.col("sb.doc_id") == cand.b)
        .select(
            "a", "b",
            (agree_full / F.lit(8.0)).alias("est_full_raw"),
            (agree_bbit / F.lit(8.0)).alias("m_bbit"),
        )
    )
    cand_docs = cand.select(F.col("a").alias("doc_id")).union(
        cand.select(F.col("b").alias("doc_id"))
    ).distinct()
    sh_c = shingles.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    exact = D.jaccard_pairs(sh_c, pairs=cand)
    return (
        est.join(exact.select("a", "b", F.col("jaccard").alias("exact_j")), ["a", "b"], "left")
        .select(
            "a", "b",
            F.round((F.col("m_bbit") - 0.25) / 0.75, 6).alias("est_bbit"),
            F.round("est_full_raw", 6).alias("est_full"),
            F.round(F.coalesce("exact_j", F.lit(0.0)), 6).alias("exact_jaccard"),
            F.round(
                F.abs((F.col("m_bbit") - 0.25) / 0.75 - F.coalesce("exact_j", F.lit(0.0))), 6
            ).alias("abs_err_bbit"),
        )
    )


# ---------------------------------------------------------------------------
# Variance-of-Laplacian blur detection (Pech-Pacheco et al., ICPR'00)
# through the REAL PPM decode: the 4-neighbour Laplacian response over the
# 3x3-valid interior as exact integers (signed sum + squared sum), the
# variance as ONE shared float expression over those two longs, and the
# blur flag at a fixed threshold — the image-QA filter every vision-data
# curation pass runs before training. The oracle replays the 5-tap
# convolution and checks the response sequence md5 bit-for-bit.
# ---------------------------------------------------------------------------

_LAP_VAR = (
    "(CAST(lap_sq_sum AS DOUBLE) / n_interior"
    " - (CAST(lap_sum AS DOUBLE) / n_interior)"
    " * (CAST(lap_sum AS DOUBLE) / n_interior))"
)

_LAP_EXPR = (
    f"({_sobel_tap(-1, 0)} + {_sobel_tap(1, 0)}"
    f" + {_sobel_tap(0, -1)} + {_sobel_tap(0, 1)}"
    f" - 4 * {_sobel_tap(0, 0)})"
)


@register(
    "mm_image_blur_laplacian",
    f"""
    WITH {_MM_RASTER_CTE},
    lap AS (
      SELECT doc_id, rr.r, cc.c, {_LAP_EXPR} AS lp
      FROM r, (VALUES (1), (2)) rr(r),
           unnest(generate_series(1, w - 2)) AS cc(c)
    ),
    st AS (
      SELECT doc_id AS media_id,
             count(*)::BIGINT AS n_interior,
             sum(lp)::BIGINT AS lap_sum,
             sum(lp * lp)::BIGINT AS lap_sq_sum,
             md5(string_agg(lp::VARCHAR, ',' ORDER BY r, c)) AS lap_md5
      FROM lap GROUP BY doc_id
    )
    SELECT media_id, n_interior, lap_sum, lap_sq_sum, lap_md5,
           round({_LAP_VAR}, 6) AS lap_var,
           CASE WHEN {_LAP_VAR} < 10000.0 THEN 1 ELSE 0 END AS is_blurry
    FROM st
    """,
    doc="variance-of-Laplacian blur detection (Pech-Pacheco ICPR'00) "
        "through the real PPM decode: exact integer 4-neighbour Laplacian "
        "response over the 3x3-valid interior (Arrow mapInPandas kernel), "
        "variance as one shared float expression over the two exact longs, "
        "blur flag at variance < 10000 — the pre-training image-QA filter; "
        "oracle replays the 5-tap convolution and value-checks the "
        "response-sequence md5. Map-only at any scale",
)
def mm_image_blur_laplacian(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    st = M.laplacian_stats(media)
    return st.select(
        "media_id", "n_interior", "lap_sum", "lap_sq_sum", "lap_md5",
        F.round(F.expr(_LAP_VAR), 6).alias("lap_var"),
        F.when(F.expr(_LAP_VAR) < 10000.0, 1).otherwise(0).alias("is_blurry"),
    )


# ---------------------------------------------------------------------------
# k-anonymity audit (Sweeney, IJUFKS'02): group sizes over the
# quasi-identifier combination (nation, market segment, account-balance
# bucket) with the at-risk flag at k=5 — the privacy QA gate a
# training-data pipeline runs before releasing user-derived tables.
# One map-side-combinable groupBy; the balance bucket floors an exact
# cents long through one shared double division.
# ---------------------------------------------------------------------------

@register(
    "analytic_k_anonymity",
    """
    WITH qi AS (
      SELECT c_nationkey AS nationkey, c_mktsegment AS mktsegment,
             CAST(floor(CAST(round(c_acctbal * 100) AS BIGINT) / 200000.0)
                  AS BIGINT) AS bal_bucket
      FROM customer
    )
    SELECT nationkey, mktsegment, bal_bucket,
           count(*)::BIGINT AS group_n,
           CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS at_risk
    FROM qi GROUP BY nationkey, mktsegment, bal_bucket
    """,
    doc="k-anonymity audit (Sweeney IJUFKS'02): quasi-identifier group "
        "sizes over (nation, segment, $2000 balance bucket) with the "
        "at-risk flag at k=5 — the re-identification QA gate before "
        "releasing user-derived tables; one map-side-combinable groupBy, "
        "bucket = floor of an exact cents long over one shared double "
        "division",
)
def analytic_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    bucket = F.floor(
        F.round(F.col("c_acctbal") * 100).cast("long") / F.lit(200000.0)
    ).cast("long")
    return (
        cust.select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_mktsegment").alias("mktsegment"),
            bucket.alias("bal_bucket"),
        )
        .groupBy("nationkey", "mktsegment", "bal_bucket")
        .agg(
            F.count("*").cast("long").alias("group_n"),
            F.when(F.count("*") < 5, 1).otherwise(0).alias("at_risk"),
        )
    )


# ---------------------------------------------------------------------------
# Experiment power / minimum detectable effect: pooled per-user variance
# from exact long power sums on the SAME hashed 50/50 assignment as
# analytic_did/analytic_cuped (salt 'did'), MDE at alpha=.05 two-sided,
# power=.80 — (z_.975 + z_.80) = 2.801585. Completes the experimentation
# quartet: SRM gates the split, DiD/CUPED read the effect, MDE says what
# effect the split could even see. One groupBy(user) + one combinable
# global aggregate; every float input an exact long.
# ---------------------------------------------------------------------------

_POW_VP = (
    "(((CAST(ss_t AS DOUBLE) - CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE))"
    " + (CAST(ss_c AS DOUBLE) - CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)))"
    " / (CAST(n_t AS DOUBLE) + CAST(n_c AS DOUBLE) - 2.0))"
)
_POW_MDE = (
    f"(2.801585 * sqrt({_POW_VP}"
    " * (1.0 / CAST(n_t AS DOUBLE) + 1.0 / CAST(n_c AS DOUBLE))))"
)


@register(
    "analytic_power_mde",
    f"""
    WITH u AS (
      SELECT user_id,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS m,
             CASE WHEN (('0x' || substr(md5('did' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5
                  THEN 1 ELSE 0 END AS treated
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t,
             sum(CASE WHEN treated = 1 THEN m ELSE 0 END)::BIGINT AS s_t,
             sum(CASE WHEN treated = 1 THEN m * m ELSE 0 END)::BIGINT AS ss_t,
             sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c,
             sum(CASE WHEN treated = 0 THEN m ELSE 0 END)::BIGINT AS s_c,
             sum(CASE WHEN treated = 0 THEN m * m ELSE 0 END)::BIGINT AS ss_c
      FROM u
    )
    SELECT n_t, n_c,
           {_POW_VP} AS var_pooled,
           (CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)) AS mean_c_cents,
           {_POW_MDE} AS mde_cents
    FROM s
    """,
    doc="experiment power / minimum detectable effect: pooled per-user "
        "cents variance from exact long power sums on the hashed 'did' "
        "50/50 split, MDE = 2.801585 * sqrt(var * (1/n_t + 1/n_c)) "
        "(alpha=.05 two-sided, power=.80) — completes the SRM -> DiD -> "
        "CUPED -> MDE experimentation quartet; one groupBy(user) + one "
        "combinable global aggregate, shared float expressions",
)
def analytic_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("m"),
    ).select(
        "m",
        F.when(hash_fraction(F.col("user_id"), "did") < 0.5, 1)
        .otherwise(0).alias("treated"),
    )
    s = u.agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("m")).otherwise(0)).cast("long").alias("s_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("m") * F.col("m")).otherwise(0))
        .cast("long").alias("ss_t"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("m")).otherwise(0)).cast("long").alias("s_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("m") * F.col("m")).otherwise(0))
        .cast("long").alias("ss_c"),
    )
    return s.select(
        "n_t", "n_c",
        F.expr(_POW_VP).alias("var_pooled"),
        F.expr("CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)").alias("mean_c_cents"),
        F.expr(_POW_MDE).alias("mde_cents"),
    )


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al., arXiv:2303.09540) — semantic dedup by k-means
# cluster + within-cluster cosine against more-central members. The
# oracle replays the full unrolled quantized Lloyd loop (the
# sim_kmeans_lloyd CTE chain), the centrality rank, and every pair's
# exact-integer cosine.
# ---------------------------------------------------------------------------

def _semdedup_oracle_sql(tau: float = 0.35, max_rank: int = 128) -> str:
    parts, final = _kmeans_centroid_ctes()
    parts = list(parts)
    parts.append(f"""dfin AS (
      SELECT q.id, c.cl, sum((q.val - c.cval) * (q.val - c.cval)) AS d2
      FROM qdim q JOIN {final} c USING (pos) GROUP BY q.id, c.cl
    )""")
    parts.append("""afin AS MATERIALIZED (
      SELECT id, cl, d2 FROM (
        SELECT id, cl, d2, row_number() OVER (PARTITION BY id ORDER BY d2, cl) AS rn
        FROM dfin) t
      WHERE rn = 1
    )""")
    parts.append("""rnk AS MATERIALIZED (
      SELECT id, cl, row_number() OVER (PARTITION BY cl ORDER BY d2, id) AS rnk
      FROM afin
    )""")
    parts.append("""nrm AS MATERIALIZED (
      SELECT id, sum(val * val) AS nrm FROM qdim GROUP BY id
    )""")
    parts.append(f"""pd0 AS (
      SELECT a.id AS aid, b.id AS bid, sum(qa.val * qb.val) AS dot
      FROM rnk a JOIN rnk b ON a.cl = b.cl AND a.rnk < b.rnk
      JOIN qdim qa ON qa.id = a.id
      JOIN qdim qb ON qb.id = b.id AND qb.pos = qa.pos
      WHERE a.rnk <= {max_rank}
      GROUP BY a.id, b.id
    )""")
    parts.append("""cosm AS (
      SELECT p.bid AS id,
             max(CAST(p.dot AS DOUBLE) / (sqrt(na.nrm) * sqrt(nb.nrm))) AS mx
      FROM pd0 p
      JOIN nrm na ON na.id = p.aid
      JOIN nrm nb ON nb.id = p.bid
      GROUP BY p.bid
    )""")
    return f"""
    WITH {', '.join(parts)}
    SELECT r.id, r.cl, CAST(r.rnk AS BIGINT) AS rnk,
           round(coalesce(c.mx, -1.0), 6) AS max_cos_earlier,
           CASE WHEN coalesce(c.mx, -1.0) >= {tau} THEN 1 ELSE 0 END AS is_dup
    FROM rnk r LEFT JOIN cosm c USING (id)
    """


@register(
    "dedup_semdedup",
    _semdedup_oracle_sql(),
    doc="SemDeDup (Abbas arXiv:2303.09540): quantized-Lloyd clusters "
        "(k=8, 2 iterations — the sim_kmeans_lloyd loop), members ranked "
        "by centrality (d2, id), a member flagged duplicate when cosine "
        "to ANY more-central member reaches 0.35; cosine = "
        "CAST(dot AS DOUBLE)/(sqrt(na)*sqrt(nb)) over exact integer "
        "dot/norms so every comparison is bit-reproducible. Pair mass "
        "capped at the 128 most-central earlier members per cluster — "
        "O(cap * m) per cluster (linear in m), the capped-LSH device; "
        "the cap binds only when a cluster outgrows it. Rank is a "
        "cluster-partitioned window, argmax a combinable groupBy(max). "
        "Oracle replays the whole unrolled loop + every capped pair "
        "cosine",
)
def dedup_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.dedup import semdedup_flags

    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_flags(emb, k=8, iterations=2, scale=1000, tau=0.35, max_rank=128)


# ---------------------------------------------------------------------------
# Gini coefficient / revenue concentration: G = 2*S/(n*T) - (n+1)/n with
# S = sum(rank_asc * x) over exact longs. The ascending rank is the
# two-level bucket prefix sum (extensions.sampling.two_level_order on the
# negated cents key) — NO single-partition window anywhere; the oracle
# replays the identical total order with a plain window.
# ---------------------------------------------------------------------------

_GINI_EXPR = (
    "(2.0 * CAST(s_rx AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(tot AS DOUBLE))"
    " - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE))"
)


@register(
    "analytic_gini_lorenz",
    f"""
    WITH v AS (
      SELECT o_custkey, sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS c
      FROM orders GROUP BY o_custkey
    ),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c, o_custkey) AS rk FROM v
    ),
    s AS (
      SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS tot,
             sum(rk * c)::BIGINT AS s_rx
      FROM r
    )
    SELECT n, tot, s_rx, {_GINI_EXPR} AS gini
    FROM s
    """,
    doc="Gini coefficient of per-customer revenue concentration: "
        "G = 2*sum(rank*x)/(n*total) - (n+1)/n from exact long cents, "
        "ascending rank (cents, custkey) via the two-level bucket prefix "
        "sum (two_level_order) — no single-partition window; the "
        "inequality readout that decides skew mitigation before a 100 TB "
        "shuffle; oracle replays the identical total order with a plain "
        "window",
)
def analytic_gini_lorenz(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    orders = load_table(spark, sf_dir, "orders")
    v = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long").alias("c"),
    ).withColumn("neg_c", -F.col("c"))
    # two_level_order ranks (key DESC, tie ASC): key = -c gives the
    # ascending-by-cents total order with custkey tie-break
    ranked = two_level_order(v, "neg_c", "o_custkey")
    s = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("tot"),
        F.sum(F.col("rk") * F.col("c")).cast("long").alias("s_rx"),
    )
    return s.select("n", "tot", "s_rx", F.expr(_GINI_EXPR).alias("gini"))


# ---------------------------------------------------------------------------
# Length-bucketing padding-waste accounting: the measurement that
# justifies length-bucketed batching before a training run. Fixed batch
# size 32, two deterministic schemes — arrival order (doc_id) vs
# length-bucketed order (n_tokens, doc_id) — each ranked with the
# two-level prefix-sum device; per-batch padding = cnt*max - sum as exact
# longs, global readout one combinable aggregate per scheme.
# ---------------------------------------------------------------------------

_PACK_NTOK_SQL = (
    "CASE WHEN trim(text) = '' THEN 0"
    " ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END"
)


def _length_bucket_scheme_sql(scheme: str, order_by: str) -> str:
    return f"""
      SELECT '{scheme}' AS scheme,
             count(*)::BIGINT AS n_batches,
             sum(cnt)::BIGINT AS n_docs,
             sum(s)::BIGINT AS total_tokens,
             sum(cnt * mx - s)::BIGINT AS padded_tokens,
             (CAST(sum(cnt * mx - s) AS DOUBLE)
              / CAST(sum(cnt * mx) AS DOUBLE)) AS waste_ratio
      FROM (
        SELECT (rk - 1) // 32 AS batch,
               count(*) AS cnt, max(n) AS mx, sum(n) AS s
        FROM (SELECT n, row_number() OVER (ORDER BY {order_by}) AS rk FROM t)
        GROUP BY 1
      )
    """


@register(
    "sample_length_bucketing",
    f"""
    WITH t AS (
      SELECT doc_id, CAST({_PACK_NTOK_SQL} AS BIGINT) AS n FROM documents
    )
    {_length_bucket_scheme_sql('arrival', 'doc_id')}
    UNION ALL
    {_length_bucket_scheme_sql('length_bucketed', 'n, doc_id')}
    """,
    doc="length-bucketing padding-waste accounting: batch size 32, "
        "arrival-order (doc_id) vs length-bucketed (n_tokens, doc_id) "
        "batching, per-batch padding = cnt*max - sum as exact longs — the "
        "measurement justifying bucketed batching before a training run; "
        "global ranks via the two-level bucket prefix sum (no "
        "single-partition window), readout one combinable aggregate per "
        "scheme",
)
def sample_length_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    docs = load_table(spark, sf_dir, "documents")
    n = (
        F.when(F.trim("text") == "", 0)
        .otherwise(F.size(F.split(F.lower(F.trim("text")), r"\s+")))
        .cast("long")
    )
    t = docs.select("doc_id", n.alias("n"))

    def scheme(df: DataFrame, name: str) -> DataFrame:
        batched = df.withColumn("batch", F.expr("(rk - 1) div 32"))
        per = batched.groupBy("batch").agg(
            F.count("*").alias("cnt"), F.max("n").alias("mx"), F.sum("n").alias("s"),
        )
        return per.agg(
            F.lit(name).alias("scheme"),
            F.count("*").cast("long").alias("n_batches"),
            F.sum("cnt").cast("long").alias("n_docs"),
            F.sum("s").cast("long").alias("total_tokens"),
            F.sum(F.col("cnt") * F.col("mx") - F.col("s")).cast("long")
            .alias("padded_tokens"),
            (
                F.sum(F.col("cnt") * F.col("mx") - F.col("s")).cast("double")
                / F.sum(F.col("cnt") * F.col("mx")).cast("double")
            ).alias("waste_ratio"),
        )

    arrival = two_level_order(
        t.withColumn("neg_id", -F.col("doc_id")), "neg_id", "doc_id"
    )
    bucketed = two_level_order(
        t.withColumn("neg_n", -F.col("n")), "neg_n", "doc_id"
    )
    return scheme(arrival, "arrival").unionAll(
        scheme(bucketed, "length_bucketed")
    )


# ---------------------------------------------------------------------------
# Winsorized statistics: clip event cents at the exact p1/p99
# linear-interpolation percentiles (the olap_percentiles_exact /
# text_ccnet_buckets shared device), report clip counts and the
# winsorized mean from EXACT longs — the outlier guard before any
# mean-based metric. The only global piece is the percentile aggregate
# over one long per row (sketch twin: sketch_bottomk_quantiles).
# ---------------------------------------------------------------------------

@register(
    "analytic_winsorize",
    """
    WITH v AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events
    ),
    thr AS (
      SELECT quantile_cont(c, 0.01) AS lo, quantile_cont(c, 0.99) AS hi FROM v
    ),
    s AS (
      SELECT count(*)::BIGINT AS n,
             sum(c)::BIGINT AS s_all,
             sum(CASE WHEN c < lo THEN 1 ELSE 0 END)::BIGINT AS n_lo,
             sum(CASE WHEN c > hi THEN 1 ELSE 0 END)::BIGINT AS n_hi,
             sum(CASE WHEN c >= lo AND c <= hi THEN c ELSE 0 END)::BIGINT AS s_mid,
             max(lo) AS lo, max(hi) AS hi
      FROM v CROSS JOIN thr
    )
    SELECT n, n_lo, n_hi,
           round(lo, 6) AS lo_cents, round(hi, 6) AS hi_cents,
           (CAST(s_all AS DOUBLE) / CAST(n AS DOUBLE)) AS mean_raw_cents,
           ((CAST(s_mid AS DOUBLE) + CAST(n_lo AS DOUBLE) * lo
             + CAST(n_hi AS DOUBLE) * hi) / CAST(n AS DOUBLE)) AS mean_winsorized_cents
    FROM s
    """,
    doc="winsorized statistics: clip event cents at the exact p1/p99 "
        "linear-interpolation percentiles, clip counts + winsorized mean "
        "assembled from exact longs (mid-mass sum) plus the two double "
        "thresholds — the outlier guard before mean-based metrics; one "
        "global percentile aggregate over one long per row (sketch twin: "
        "sketch_bottomk_quantiles), everything else map-side combinable",
)
def analytic_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(F.round(F.col("value") * 100).cast("long").alias("c"))
    thr = v.agg(
        F.expr("percentile(c, 0.01)").alias("lo"),
        F.expr("percentile(c, 0.99)").alias("hi"),
    )
    s = v.crossJoin(F.broadcast(thr)).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s_all"),
        F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0)).cast("long").alias("n_lo"),
        F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0)).cast("long").alias("n_hi"),
        F.sum(
            F.when((F.col("c") >= F.col("lo")) & (F.col("c") <= F.col("hi")), F.col("c"))
            .otherwise(0)
        ).cast("long").alias("s_mid"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
    )
    return s.select(
        "n", "n_lo", "n_hi",
        F.round("lo", 6).alias("lo_cents"),
        F.round("hi", 6).alias("hi_cents"),
        F.expr("CAST(s_all AS DOUBLE) / CAST(n AS DOUBLE)").alias("mean_raw_cents"),
        F.expr(
            "(CAST(s_mid AS DOUBLE) + CAST(n_lo AS DOUBLE) * lo"
            " + CAST(n_hi AS DOUBLE) * hi) / CAST(n AS DOUBLE)"
        ).alias("mean_winsorized_cents"),
    )


# ---------------------------------------------------------------------------
# Marketing attribution (last-touch + linear) over the event stream: for
# every purchase, credit the click/view touches of the SAME user in the
# 7-day lookback — last-touch by (ts, event_id) max, linear as an equal
# integer micro-cents split (floor(cents*1e6/n), identical integer math
# on both engines). The per-purchase interval join is user-keyed (no
# global window); both credit readouts are combinable aggregations.
# ---------------------------------------------------------------------------

@register(
    "analytic_attribution",
    """
    WITH p AS (
      SELECT event_id AS pid, user_id, epoch_us(ts) AS pts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    t AS (
      SELECT event_id AS tid, user_id, epoch_us(ts) AS tts, event_type AS ttype
      FROM events WHERE event_type IN ('click', 'view')
    ),
    j AS (
      SELECT p.pid, p.cents, t.tid, t.tts, t.ttype
      FROM p JOIN t ON t.user_id = p.user_id
       AND t.tts < p.pts AND t.tts >= p.pts - 604800000000
    ),
    per AS (
      SELECT pid, max(cents) AS cents, count(*) AS n,
             max(struct_pack(tts := tts, tid := tid, ttype := ttype)) AS last_t
      FROM j GROUP BY pid
    ),
    last_touch AS (
      SELECT last_t.ttype AS touch_type,
             count(*)::BIGINT AS n_last_touch,
             sum(cents)::BIGINT AS cents_last_touch
      FROM per GROUP BY 1
    ),
    linear_credit AS (
      SELECT j.ttype AS touch_type,
             count(*)::BIGINT AS n_touch_credits,
             -- explicit double-floor: DuckDB // floors, Spark div truncates,
             -- and purchase cents can be negative — share the float path
             sum(CAST(floor(CAST(per.cents AS DOUBLE) * 1000000.0 / per.n)
                      AS BIGINT))::BIGINT AS linear_credit_micro
      FROM j JOIN per USING (pid) GROUP BY 1
    )
    SELECT l.touch_type, l.n_touch_credits, l.linear_credit_micro,
           coalesce(lt.n_last_touch, 0)::BIGINT AS n_last_touch,
           coalesce(lt.cents_last_touch, 0)::BIGINT AS cents_last_touch
    FROM linear_credit l LEFT JOIN last_touch lt USING (touch_type)
    """,
    doc="marketing attribution over the event stream: per purchase, "
        "click/view touches of the same user in the 7-day lookback; "
        "last-touch by max(ts, event_id), linear credit as "
        "floor(cents*1e6/n) exact integer splits — user-keyed interval "
        "join (no global window), both readouts combinable aggregations",
)
def analytic_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.unix_micros("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    t = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.unix_micros("ts").alias("tts"),
        F.col("event_type").alias("ttype"),
    )
    j = p.join(t, "user_id").where(
        (F.col("tts") < F.col("pts"))
        & (F.col("tts") >= F.col("pts") - F.lit(604800000000))
    ).select("pid", "cents", "tid", "tts", "ttype")
    # ONE pass over the interval join: pre-aggregate to (pid, ttype) so the
    # expensive join is computed once and its exchange reused by both the
    # per-purchase rollup and the linear-credit readout
    g1 = j.groupBy("pid", "ttype").agg(
        F.count("*").alias("cnt"),
        F.max("cents").alias("cents"),
        F.max(F.struct("tts", "tid", "ttype")).alias("lt"),
    )
    per = g1.groupBy("pid").agg(
        F.max("cents").alias("pc"),
        F.sum("cnt").alias("n"),
        F.max("lt").alias("last_t"),
    )
    last_touch = per.groupBy(
        F.col("last_t.ttype").alias("touch_type")
    ).agg(
        F.count("*").cast("long").alias("n_last_touch"),
        F.sum("pc").cast("long").alias("cents_last_touch"),
    )
    linear = (
        g1.join(per.select("pid", "pc", "n"), "pid")
        .groupBy(F.col("ttype").alias("touch_type"))
        .agg(
            F.sum("cnt").cast("long").alias("n_touch_credits"),
            F.sum(
                F.col("cnt")
                * F.floor(F.col("pc").cast("double") * 1000000.0 / F.col("n"))
                .cast("long")
            ).cast("long").alias("linear_credit_micro"),
        )
    )
    return linear.join(last_touch, "touch_type", "left").select(
        "touch_type", "n_touch_credits", "linear_credit_micro",
        F.coalesce("n_last_touch", F.lit(0)).cast("long").alias("n_last_touch"),
        F.coalesce("cents_last_touch", F.lit(0)).cast("long")
        .alias("cents_last_touch"),
    )


# ---------------------------------------------------------------------------
# CDC offset-gap audit: the consumer-ops QA that detects dropped wire
# messages per (topic-)partition BEFORE they become silent data loss —
# a missing seq is a seq s present whose successor s+1 is absent while
# below the partition max. Anti-join formulation, everything keyed by
# partition; the synthesized stream drops o_orderkey % 97 = 13 to plant
# real gaps.
# ---------------------------------------------------------------------------

@register(
    "cdc_gap_audit",
    """
    WITH msg AS (
      SELECT o_orderkey % 4 AS part, o_orderkey // 4 AS seq
      FROM orders WHERE o_orderkey % 97 <> 13
    ),
    mx AS (SELECT part, max(seq) AS mx FROM msg GROUP BY part)
    SELECT m.part, m.seq + 1 AS gap_start
    FROM msg m
    JOIN mx ON mx.part = m.part
    LEFT JOIN msg nxt ON nxt.part = m.part AND nxt.seq = m.seq + 1
    WHERE nxt.seq IS NULL AND m.seq < mx.mx
    """,
    doc="CDC offset-gap audit: per-partition detection of dropped wire "
        "messages — seq s whose successor s+1 is missing below the "
        "partition max; anti-join formulation keyed by partition (linear, "
        "map-side-combinable max), the ops gate run before trusting an "
        "offset range as fully applied. Synthesized stream plants gaps at "
        "o_orderkey % 97 = 13",
)
def cdc_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    msg = orders.filter(F.col("o_orderkey") % 97 != 13).select(
        (F.col("o_orderkey") % 4).alias("part"),
        F.expr("o_orderkey div 4").alias("seq"),
    )
    mx = msg.groupBy("part").agg(F.max("seq").alias("mx"))
    nxt = msg.select(F.col("part").alias("npart"), F.col("seq").alias("nseq"))
    return (
        msg.join(mx, "part")
        .join(
            nxt,
            (F.col("npart") == F.col("part"))
            & (F.col("nseq") == F.col("seq") + 1),
            "left_anti",
        )
        .where(F.col("seq") < F.col("mx"))
        .select("part", (F.col("seq") + 1).alias("gap_start"))
    )


# ---------------------------------------------------------------------------
# Deterministic random-walk neighborhood sampling (the DeepWalk/node2vec
# ingestion step, zero RNG): from each seed, 3 steps, each step moving to
# the neighbor minimizing md5(cur || '|' || step || '|' || u) — a
# data-derived uniform choice reproducible on any engine (the salted-md5
# device every sampler in this repo uses). Each step is one edges join +
# one min_by aggregation; no windows.
# ---------------------------------------------------------------------------

_WALK_STEP_SQL = """w{i} AS (
      SELECT w.start, min_by(e.dst, md5(CAST(w.n{j} AS VARCHAR) || '|{i}|' || CAST(e.dst AS VARCHAR))) AS n{i}
      FROM w{j} w JOIN e ON e.src = w.n{j}
      GROUP BY w.start
    )"""


@register(
    "graph_random_walk",
    f"""
    WITH und AS (
      SELECT DISTINCT least(o_custkey % 2000, o_orderkey % 2000) AS a,
             greatest(o_custkey % 2000, o_orderkey % 2000) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 2000 <> o_orderkey % 2000
    ),
    e AS (SELECT a AS src, b AS dst FROM und UNION ALL SELECT b, a FROM und),
    w0 AS (
      SELECT DISTINCT src AS start, src AS n0 FROM e WHERE src % 50 = 0
    ),
    {_WALK_STEP_SQL.format(i=1, j=0)},
    {_WALK_STEP_SQL.format(i=2, j=1)},
    {_WALK_STEP_SQL.format(i=3, j=2)}
    SELECT w3.start, w1.n1, w2.n2, w3.n3,
           md5(CAST(w3.start AS VARCHAR) || ',' || CAST(w1.n1 AS VARCHAR)
               || ',' || CAST(w2.n2 AS VARCHAR) || ',' || CAST(w3.n3 AS VARCHAR)) AS path_md5
    FROM w3 JOIN w2 USING (start) JOIN w1 USING (start)
    """,
    doc="deterministic random-walk sampling (DeepWalk KDD'14 ingestion, "
        "zero RNG): 3 steps from each seed (node % 50 = 0) on the "
        "undirected orders graph, each step to the neighbor minimizing "
        "md5(cur||step||u) — data-derived uniform choice, reproducible on "
        "any engine; one edges join + one min_by aggregation per step, no "
        "windows; walks extend by re-joining only the frontier",
)
def graph_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.col("o_custkey") % 2000
    b = F.col("o_orderkey") % 2000
    und = (
        orders.filter((F.col("o_orderkey") % 3 == 0) & (a != b))
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    e = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    w = (
        e.filter(F.col("src") % 50 == 0)
        .select(F.col("src").alias("start"), F.col("src").alias("n0"))
        .distinct()
    )
    steps = {}
    for i in range(1, 4):
        h = F.md5(
            F.concat(
                F.col(f"n{i-1}").cast("string"),
                F.lit(f"|{i}|"),
                F.col("dst").cast("string"),
            ).cast("binary")
        )
        w = (
            w.join(e, F.col(f"n{i-1}") == F.col("src"))
            .groupBy("start")
            .agg(F.min_by("dst", h).alias(f"n{i}"))
        )
        steps[i] = w
        if i < 3:
            w = steps[i]
    out = (
        steps[3]
        .join(steps[2], "start")
        .join(steps[1], "start")
    )
    return out.select(
        "start", "n1", "n2", "n3",
        F.md5(
            F.concat_ws(
                ",",
                F.col("start").cast("string"),
                F.col("n1").cast("string"),
                F.col("n2").cast("string"),
                F.col("n3").cast("string"),
            ).cast("binary")
        ).alias("path_md5"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation: per-user Recency/Frequency/Monetary quintile scores
# on the purchase stream — the standard customer/data-value segmentation.
# Quintile thresholds are the exact linear-interpolation percentiles over
# one long per user (the winsorize/ccnet device); scores are threshold
# comparisons shared verbatim by both engines, segment = R*100+F*10+M.
# ---------------------------------------------------------------------------

def _rfm_score(col: str, invert: bool = False) -> str:
    ups = " + ".join(
        f"(CASE WHEN {col} > {col}_p{q} THEN 1 ELSE 0 END)" for q in (20, 40, 60, 80)
    )
    return f"(6 - (1 + {ups}))" if invert else f"(1 + {ups})"


@register(
    "analytic_rfm_segmentation",
    f"""
    WITH p AS (
      SELECT user_id, epoch_us(ts) AS us, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    mx AS (SELECT max(us) AS mx_us FROM p),
    u AS (
      SELECT user_id,
             CAST((mx.mx_us - max(p.us)) // 86400000000 AS BIGINT) AS r_days,
             count(*)::BIGINT AS f_cnt,
             sum(cents)::BIGINT AS m_cents
      FROM p CROSS JOIN mx GROUP BY user_id, mx.mx_us
    ),
    thr AS (
      SELECT quantile_cont(r_days, 0.2) AS r_days_p20, quantile_cont(r_days, 0.4) AS r_days_p40,
             quantile_cont(r_days, 0.6) AS r_days_p60, quantile_cont(r_days, 0.8) AS r_days_p80,
             quantile_cont(f_cnt, 0.2) AS f_cnt_p20, quantile_cont(f_cnt, 0.4) AS f_cnt_p40,
             quantile_cont(f_cnt, 0.6) AS f_cnt_p60, quantile_cont(f_cnt, 0.8) AS f_cnt_p80,
             quantile_cont(m_cents, 0.2) AS m_cents_p20, quantile_cont(m_cents, 0.4) AS m_cents_p40,
             quantile_cont(m_cents, 0.6) AS m_cents_p60, quantile_cont(m_cents, 0.8) AS m_cents_p80
      FROM u
    )
    SELECT user_id, r_days, f_cnt, m_cents,
           {_rfm_score('r_days', invert=True)} AS r_score,
           {_rfm_score('f_cnt')} AS f_score,
           {_rfm_score('m_cents')} AS m_score,
           ({_rfm_score('r_days', invert=True)} * 100
            + {_rfm_score('f_cnt')} * 10 + {_rfm_score('m_cents')}) AS segment
    FROM u CROSS JOIN thr
    """,
    doc="RFM segmentation: per-user recency (days since last purchase, "
        "integer floor of the micros gap), frequency, monetary cents; "
        "quintile scores from exact linear-interpolation percentiles over "
        "one long per user (recency inverted: recent = 5), segment = "
        "R*100+F*10+M — the standard customer-value segmentation; one "
        "groupBy(user) + one bounded percentile aggregate, thresholds "
        "broadcast back",
)
def analytic_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    mx = p.agg(F.max("us").alias("mx_us"))
    u = (
        p.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "mx_us")
        .agg(
            F.expr("CAST((mx_us - max(us)) div 86400000000 AS BIGINT)").alias("r_days"),
            F.count("*").cast("long").alias("f_cnt"),
            F.sum("cents").cast("long").alias("m_cents"),
        )
        .drop("mx_us")
    )
    thr = u.agg(
        *[
            F.expr(f"percentile({c}, {q / 100})").alias(f"{c}_p{q}")
            for c in ("r_days", "f_cnt", "m_cents")
            for q in (20, 40, 60, 80)
        ]
    )
    out = u.crossJoin(F.broadcast(thr))
    return out.select(
        "user_id", "r_days", "f_cnt", "m_cents",
        F.expr(_rfm_score("r_days", invert=True)).alias("r_score"),
        F.expr(_rfm_score("f_cnt")).alias("f_score"),
        F.expr(_rfm_score("m_cents")).alias("m_score"),
        F.expr(
            f"({_rfm_score('r_days', invert=True)} * 100"
            f" + {_rfm_score('f_cnt')} * 10 + {_rfm_score('m_cents')})"
        ).alias("segment"),
    )


# ---------------------------------------------------------------------------
# Market-basket association (support/confidence/lift): part-pair
# co-occurrence within orders. Pair mass is bounded by order size (TPC-H
# orders hold <= 7 lineitems), so the self-join on l_orderkey is LINEAR
# in lineitems — the one association-mining shape that scales without an
# FP-tree. Exact integer counts; ratios shared float expressions.
# ---------------------------------------------------------------------------

@register(
    "analytic_market_basket",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    n AS (SELECT count(DISTINCT ok)::BIGINT AS n_orders FROM items),
    cnt AS (SELECT pk, count(*)::BIGINT AS c FROM items GROUP BY pk),
    pairs AS (
      SELECT a.pk AS part_a, b.pk AS part_b, count(*)::BIGINT AS pair_cnt
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      GROUP BY a.pk, b.pk
    )
    SELECT p.part_a, p.part_b, p.pair_cnt,
           (CAST(p.pair_cnt AS DOUBLE) / CAST(n.n_orders AS DOUBLE)) AS support,
           (CAST(p.pair_cnt AS DOUBLE) / CAST(ca.c AS DOUBLE)) AS confidence_a_to_b,
           (CAST(p.pair_cnt AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
            / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE))) AS lift
    FROM pairs p
    JOIN cnt ca ON ca.pk = p.part_a
    JOIN cnt cb ON cb.pk = p.part_b
    CROSS JOIN n
    WHERE p.pair_cnt >= 2
    """,
    doc="market-basket association rules: part-pair co-occurrence within "
        "orders with exact integer support counts, confidence and lift as "
        "shared float expressions; the self-join on l_orderkey is bounded "
        "by order size (<= 7 items) so pair mass is LINEAR in lineitems; "
        "min pair support 2 bounds the output",
)
def analytic_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    items = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    n = items.agg(F.count_distinct("ok").cast("long").alias("n_orders"))
    cnt = items.groupBy("pk").agg(F.count("*").cast("long").alias("c"))
    a = items.select(F.col("ok"), F.col("pk").alias("part_a"))
    b = items.select(F.col("ok").alias("ok2"), F.col("pk").alias("part_b"))
    pairs = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("pair_cnt"))
        .where(F.col("pair_cnt") >= 2)
    )
    return (
        pairs.join(cnt.select(F.col("pk").alias("part_a"), F.col("c").alias("ca")), "part_a")
        .join(cnt.select(F.col("pk").alias("part_b"), F.col("c").alias("cb")), "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a", "part_b", "pair_cnt",
            (F.col("pair_cnt").cast("double") / F.col("n_orders").cast("double"))
            .alias("support"),
            (F.col("pair_cnt").cast("double") / F.col("ca").cast("double"))
            .alias("confidence_a_to_b"),
            (
                F.col("pair_cnt").cast("double") * F.col("n_orders").cast("double")
                / (F.col("ca").cast("double") * F.col("cb").cast("double"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Hard-negative mining (contrastive/retrieval training): per anchor, the
# top-k most-similar corpus vectors with a DIFFERENT label — the
# negatives that actually move an InfoNCE/triplet loss. Brute-force over
# a bounded anchor set (the knn baseline shape); the IVF family is the
# candidate-generation scale path.
# ---------------------------------------------------------------------------

@register(
    "sim_hard_negatives",
    f"""
    WITH a AS (
      SELECT vec_id AS anchor_id, embedding AS avec, label AS alabel
      FROM embeddings WHERE vec_id < 50
    ),
    scored AS (
      SELECT a.anchor_id, c.vec_id AS negative_id,
             {_cos_sql('a.avec', 'c.embedding')} AS cos_sim
      FROM a JOIN embeddings c ON c.label <> a.alabel
    ),
    r AS (
      SELECT anchor_id, negative_id, cos_sim,
             row_number() OVER (PARTITION BY anchor_id
                                ORDER BY cos_sim DESC, negative_id ASC) AS rank
      FROM scored
    )
    SELECT anchor_id, negative_id, rank, round(cos_sim, 6) AS cos_sim
    FROM r WHERE rank <= 3
    """,
    doc="hard-negative mining for contrastive training: per anchor "
        "(vec_id < 50), top-3 cosine-nearest corpus vectors with a "
        "DIFFERENT label — anchors broadcast, norms precomputed per side, "
        "anchor-partitioned top-k window (never global); IVF is the "
        "candidate scale path when anchors are unbounded",
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.similarity import hard_negatives

    emb = load_table(spark, sf_dir, "embeddings")
    anchors = emb.filter(F.col("vec_id") < 50)
    return hard_negatives(anchors, emb, k=3)


# ---------------------------------------------------------------------------
# ViT-style patch extraction through the real decode: non-overlapping 2x2
# patches of the grayscale plane (remainders cropped — the standard
# patchify), each summarized by its exact integer pixel sum; oracle
# replays the index arithmetic and checks the patch-sum sequence md5.
# ---------------------------------------------------------------------------

@register(
    "mm_image_tiles",
    f"""
    WITH {_MM_RASTER_CTE},
    t AS (
      SELECT doc_id, tr.v AS tr, tc.c AS tc,
             (  ascii(substr(ras, ((tr.v * 2) * w + tc.c * 2) * 3 + 1, 1))
              + ascii(substr(ras, ((tr.v * 2) * w + tc.c * 2 + 1) * 3 + 1, 1))
              + ascii(substr(ras, ((tr.v * 2 + 1) * w + tc.c * 2) * 3 + 1, 1))
              + ascii(substr(ras, ((tr.v * 2 + 1) * w + tc.c * 2 + 1) * 3 + 1, 1))
             ) AS s
      FROM r, (VALUES (0), (1)) tr(v),
           unnest(generate_series(0, w // 2 - 1)) AS tc(c)
    )
    SELECT doc_id AS media_id,
           count(*)::BIGINT AS n_tiles,
           sum(s)::BIGINT AS tile_sum_total,
           max(s)::BIGINT AS max_tile_sum,
           min(s)::BIGINT AS min_tile_sum,
           md5(string_agg(s::VARCHAR, ',' ORDER BY tr, tc)) AS tiles_md5
    FROM t GROUP BY doc_id
    """,
    doc="ViT-style patchification through the real PPM decode: "
        "non-overlapping 2x2 patches of the gray plane (remainder cols "
        "cropped), exact integer patch sums in an Arrow mapInPandas "
        "kernel; oracle replays the index arithmetic and value-checks the "
        "row-major patch-sum sequence md5. Map-only at any scale — the "
        "patch-embedding prep of a vision-training pipeline",
)
def mm_image_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    return M.patch_tiles(media, patch=2)


# ---------------------------------------------------------------------------
# Tokenizer fertility per language — the tokenizer-design readout
# (subwords per word, chars per subword): composed from the REGISTERED
# text_subword_tokenize on both sides (the sim_ann_recall_eval device),
# so the metric can never drift from the tokenizer it measures.
# ---------------------------------------------------------------------------

@register(
    "text_tokenizer_fertility",
    None,  # assigned post-registration from the sibling oracle
    doc="tokenizer fertility per language: subwords/word and "
        "chars/subword from exact long sums — composed from the "
        "registered text_subword_tokenize on both engine and oracle side "
        "(drift-proof); the metric that decides whether a vocabulary "
        "serves a language before committing a 100 TB tokenization run; "
        "one join on doc_id + one combinable per-lang aggregate",
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    sub = QUERIES["text_subword_tokenize"].fn(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "lang",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.when(F.trim("text") == "", 0)
        .otherwise(F.size(F.split(F.lower(F.trim("text")), r"\s+")))
        .cast("long").alias("n_words"),
    )
    j = d.join(sub.select("doc_id", "n_subwords"), "doc_id")
    g = j.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_words").cast("long").alias("sum_words"),
        F.sum("n_subwords").cast("long").alias("sum_subwords"),
        F.sum("n_chars").cast("long").alias("sum_chars"),
    )
    return g.select(
        "lang", "n_docs", "sum_words", "sum_subwords", "sum_chars",
        F.expr("CAST(sum_subwords AS DOUBLE) / CAST(sum_words AS DOUBLE)")
        .alias("fertility"),
        F.expr("CAST(sum_chars AS DOUBLE) / CAST(sum_subwords AS DOUBLE)")
        .alias("chars_per_subword"),
    )


QUERIES["text_tokenizer_fertility"].oracle = f"""
    WITH sub AS ({_subword_oracle_sql()}),
    d AS (
      SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\\s+')) END
                  AS BIGINT) AS n_words
      FROM documents
    ),
    g AS (
      SELECT d.lang, count(*)::BIGINT AS n_docs,
             sum(d.n_words)::BIGINT AS sum_words,
             sum(sub.n_subwords)::BIGINT AS sum_subwords,
             sum(d.n_chars)::BIGINT AS sum_chars
      FROM d JOIN sub ON sub.doc_id = d.doc_id
      GROUP BY d.lang
    )
    SELECT lang, n_docs, sum_words, sum_subwords, sum_chars,
           CAST(sum_subwords AS DOUBLE) / CAST(sum_words AS DOUBLE) AS fertility,
           CAST(sum_chars AS DOUBLE) / CAST(sum_subwords AS DOUBLE) AS chars_per_subword
    FROM g
    """


# ---------------------------------------------------------------------------
# Quantile treatment effects: the DISTRIBUTIONAL experiment readout —
# per-arm p25/p50/p75 of the per-user cents metric on the hashed 'did'
# split (exact linear-interpolation percentiles over longs), QTE = the
# per-quantile contrast. Means (DiD/CUPED) miss effects that move the
# tails; this is the readout that sees them.
# ---------------------------------------------------------------------------

@register(
    "analytic_qte",
    """
    WITH u AS (
      SELECT user_id,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS m,
             CASE WHEN (('0x' || substr(md5('did' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5
                  THEN 1 ELSE 0 END AS treated
      FROM events GROUP BY user_id
    )
    SELECT
      sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t,
      sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c,
      quantile_cont(CASE WHEN treated = 1 THEN m END, 0.25)
        - quantile_cont(CASE WHEN treated = 0 THEN m END, 0.25) AS qte_p25,
      quantile_cont(CASE WHEN treated = 1 THEN m END, 0.50)
        - quantile_cont(CASE WHEN treated = 0 THEN m END, 0.50) AS qte_p50,
      quantile_cont(CASE WHEN treated = 1 THEN m END, 0.75)
        - quantile_cont(CASE WHEN treated = 0 THEN m END, 0.75) AS qte_p75
    FROM u
    """,
    doc="quantile treatment effects on the hashed 'did' split: per-arm "
        "p25/p50/p75 of per-user cents (exact linear-interpolation "
        "percentiles over longs, the shared device), QTE = per-quantile "
        "contrast — the distributional readout mean-based DiD/CUPED miss; "
        "one groupBy(user) + one bounded percentile aggregate",
)
def analytic_qte(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("m"),
    ).select(
        "m",
        F.when(hash_fraction(F.col("user_id"), "did") < 0.5, 1)
        .otherwise(0).alias("treated"),
    )
    return u.agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        *[
            (
                F.expr(f"percentile(CASE WHEN treated = 1 THEN m END, {q})")
                - F.expr(f"percentile(CASE WHEN treated = 0 THEN m END, {q})")
            ).alias(f"qte_p{int(q * 100)}")
            for q in (0.25, 0.50, 0.75)
        ],
    )


# ---------------------------------------------------------------------------
# Sketch-accuracy eval for the bottom-k quantile sketch: the registered
# sketch's quartile estimates beside the EXACT percentiles (integer-cents
# device), per-rank absolute/relative error — the engine audits its own
# sketch (the minhash_accuracy_eval / ann_recall_eval pattern), composed
# from the registered query on both sides so it cannot drift.
# ---------------------------------------------------------------------------

@register(
    "sketch_quantile_accuracy_eval",
    None,  # assigned post-registration from the sibling oracle
    doc="bottom-k quantile sketch accuracy: the registered "
        "sketch_bottomk_quantiles estimates beside exact percentiles over "
        "integer cents (shared linear-interpolation device), per-rank "
        "abs/relative error — the sketch audited against ground truth, "
        "composed from the registered query on both sides (drift-proof); "
        "exact side is one percentile aggregate over one long per row",
)
def sketch_quantile_accuracy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    sk = QUERIES["sketch_bottomk_quantiles"].fn(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    c = li.select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("c"))
    # ONE percentile buffer for all four ranks (array form) — four separate
    # percentile() expressions each keep their own copy of the column on
    # the single reducer (measured 8.5 s -> 4.9 s at sf0.1)
    ex = c.agg(
        F.expr("percentile(c, array(0.25, 0.5, 0.75, 1.0))").alias("ps")
    ).select(
        *[(F.col("ps")[i] / 100.0).alias(f"p{rn}")
          for i, rn in enumerate((25, 50, 75, 100))]
    )
    tall = ex.selectExpr(
        "stack(4, 25, p25, 50, p50, 75, p75, 100, p100) AS (rn, exact_val)"
    )
    return (
        sk.join(tall, "rn")
        .select(
            "rn",
            F.col("val").alias("sketch_val"),
            "exact_val",
            F.round(F.abs(F.col("val") - F.col("exact_val")), 6).alias("abs_err"),
            F.round(
                F.abs(F.col("val") - F.col("exact_val")) / F.col("exact_val"), 6
            ).alias("rel_err"),
        )
    )


QUERIES["sketch_quantile_accuracy_eval"].oracle = f"""
    WITH s AS ({QUERIES['sketch_bottomk_quantiles'].oracle}),
    cts AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem),
    exl AS (SELECT quantile_cont(c, [0.25, 0.5, 0.75, 1.0]) AS ps FROM cts),
    ex AS (
      SELECT ps[1] / 100.0 AS p25, ps[2] / 100.0 AS p50,
             ps[3] / 100.0 AS p75, ps[4] / 100.0 AS p100
      FROM exl
    ),
    tall AS (
      SELECT 25 AS rn, p25 AS exact_val FROM ex UNION ALL
      SELECT 50, p50 FROM ex UNION ALL
      SELECT 75, p75 FROM ex UNION ALL
      SELECT 100, p100 FROM ex
    )
    SELECT s.rn, s.val AS sketch_val, tall.exact_val,
           round(abs(s.val - tall.exact_val), 6) AS abs_err,
           round(abs(s.val - tall.exact_val) / tall.exact_val, 6) AS rel_err
    FROM s JOIN tall USING (rn)
    """


# ---------------------------------------------------------------------------
# CDC consumer-lag metrics: per-partition produced vs applied watermark +
# pending backlog — the monitoring readout paired with cdc_gap_audit
# (gaps say what was LOST, lag says what is BEHIND). The applied
# watermark is synthesized per partition (trailing (part+1)*7 sequences
# unapplied) so every metric is deterministic.
# ---------------------------------------------------------------------------

@register(
    "cdc_consumer_lag",
    """
    WITH msg AS (
      SELECT o_orderkey % 4 AS part, o_orderkey // 4 AS seq FROM orders
    ),
    prod AS (SELECT part, max(seq) AS produced_max, count(*) AS n_msgs
             FROM msg GROUP BY part),
    appl AS (
      SELECT m.part, max(m.seq) AS applied_max
      FROM msg m JOIN prod p ON p.part = m.part
      WHERE m.seq <= p.produced_max - (m.part + 1) * 7
      GROUP BY m.part
    )
    SELECT p.part, p.produced_max, a.applied_max,
           (p.produced_max - a.applied_max)::BIGINT AS lag,
           (SELECT count(*) FROM msg m2
            WHERE m2.part = p.part AND m2.seq > a.applied_max)::BIGINT AS n_pending,
           p.n_msgs::BIGINT AS n_msgs
    FROM prod p JOIN appl a ON a.part = p.part
    """,
    doc="CDC consumer-lag metrics: per-partition produced vs applied "
        "watermark, lag and pending backlog — the ops monitoring readout "
        "beside cdc_gap_audit (gaps = lost, lag = behind); synthesized "
        "applied watermark trails by (part+1)*7 sequences; two combinable "
        "aggregations + one partition-keyed join, linear",
)
def cdc_consumer_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    msg = orders.select(
        (F.col("o_orderkey") % 4).alias("part"),
        F.expr("o_orderkey div 4").alias("seq"),
    )
    prod = msg.groupBy("part").agg(
        F.max("seq").alias("produced_max"), F.count("*").alias("n_msgs")
    )
    appl = (
        msg.join(prod.select("part", "produced_max"), "part")
        .where(F.col("seq") <= F.col("produced_max") - (F.col("part") + 1) * 7)
        .groupBy("part")
        .agg(F.max("seq").alias("applied_max"))
    )
    pending = (
        msg.join(appl, "part")
        .where(F.col("seq") > F.col("applied_max"))
        .groupBy("part")
        .agg(F.count("*").alias("n_pending"))
    )
    return (
        prod.join(appl, "part")
        .join(pending, "part")
        .select(
            "part", "produced_max", "applied_max",
            (F.col("produced_max") - F.col("applied_max")).cast("long").alias("lag"),
            F.col("n_pending").cast("long").alias("n_pending"),
            F.col("n_msgs").cast("long").alias("n_msgs"),
        )
    )


# ---------------------------------------------------------------------------
# Local clustering coefficient: cc(v) = 2*T(v) / (deg(v)*(deg(v)-1)) —
# composed from the REGISTERED graph_triangle_count on both sides (the
# drift-proof eval device), degrees from the identical undirected edge
# construction. The transitivity readout that separates community
# structure from hub spokes.
# ---------------------------------------------------------------------------

@register(
    "graph_clustering_coefficient",
    None,  # assigned post-registration from the sibling oracle
    doc="local clustering coefficient per node (deg >= 2): "
        "cc = 2*T/(deg*(deg-1)) with T from the registered "
        "graph_triangle_count (degree-ordered oriented wedge join — "
        "composed on both sides, drift-proof) and exact integer degrees "
        "from the same undirected edge set; one combinable degree "
        "aggregate + one broadcast-size join, shared float expression",
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    tri = QUERIES["graph_triangle_count"].fn(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    a = F.col("o_custkey") % 400
    b = F.col("o_orderkey") % 400
    und = (
        orders.filter((F.col("o_orderkey") % 3 == 0) & (a != b))
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("degree"))
    )
    return (
        deg.where(F.col("degree") >= 2)
        .join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "2.0 * CAST(coalesce(n_triangles, 0) AS DOUBLE)"
                " / (CAST(degree AS DOUBLE) * (CAST(degree AS DOUBLE) - 1.0))"
            ).alias("clustering_coefficient"),
        )
    )


QUERIES["graph_clustering_coefficient"].oracle = f"""
    WITH t AS ({QUERIES['graph_triangle_count'].oracle}),
    raw AS (
      SELECT DISTINCT least(o_custkey % 400, o_orderkey % 400) AS a,
             greatest(o_custkey % 400, o_orderkey % 400) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 400 <> o_orderkey % 400
    ),
    deg AS (
      SELECT node, count(*)::BIGINT AS degree
      FROM (SELECT a AS node FROM raw UNION ALL SELECT b FROM raw)
      GROUP BY node
    )
    SELECT d.node, d.degree,
           coalesce(t.n_triangles, 0)::BIGINT AS n_triangles,
           2.0 * CAST(coalesce(t.n_triangles, 0) AS DOUBLE)
             / (CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE) - 1.0))
             AS clustering_coefficient
    FROM deg d LEFT JOIN t ON t.node = d.node
    WHERE d.degree >= 2
    """


# ---------------------------------------------------------------------------
# Count-min accuracy eval: the registered sketch's estimates for the
# exact top-10 heavy hitters — CM estimate = min over depths of the
# probed counter; the one-sided error (estimate >= exact, never under)
# measured honestly per key. Same drift-proof composition device.
# ---------------------------------------------------------------------------

@register(
    "sketch_cm_accuracy_eval",
    None,  # assigned post-registration from the sibling oracle
    doc="count-min sketch accuracy: per exact top-10 o_custkey heavy "
        "hitter, the registered sketch_count_min estimate (min over the 4 "
        "probed counters) beside the exact count and the one-sided "
        "overestimate — composed from the registered query on both sides "
        "(drift-proof); probes are a 10-row broadcast against the 4x64 "
        "register table, exact side one combinable groupBy + TakeOrdered",
)
def sketch_cm_accuracy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import CM_DEPTH, CM_WIDTH

    regs = QUERIES["sketch_count_min"].fn(spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders")
    top = (
        orders.groupBy(F.col("o_custkey").alias("key"))
        .agg(F.count("*").cast("long").alias("exact_cnt"))
        .orderBy(F.col("exact_cnt").desc(), F.col("key").asc())
        .limit(10)
    )
    probes = top.select(
        "key", "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("depth"),
                        (
                            F.conv(
                                F.substring(
                                    F.md5(F.concat(F.lit(f"{j}:"), F.col("key").cast("string"))),
                                    1, 4,
                                ),
                                16, 10,
                            ).cast("long") % CM_WIDTH
                        ).alias("bucket"),
                    )
                    for j in range(CM_DEPTH)
                ]
            )
        ).alias("p"),
    ).select("key", "exact_cnt", F.col("p.depth").cast("int").alias("depth"), "p.bucket")
    est = (
        probes.join(regs, ["depth", "bucket"])
        .groupBy("key", "exact_cnt")
        .agg(F.min("cnt").cast("long").alias("cm_estimate"))
    )
    return est.select(
        "key", "exact_cnt", "cm_estimate",
        (F.col("cm_estimate") - F.col("exact_cnt")).cast("long").alias("overestimate"),
    )


QUERIES["sketch_cm_accuracy_eval"].oracle = f"""
    WITH r AS ({QUERIES['sketch_count_min'].oracle}),
    top AS (
      SELECT o_custkey AS key, count(*)::BIGINT AS exact_cnt
      FROM orders GROUP BY o_custkey
      ORDER BY exact_cnt DESC, key ASC LIMIT 10
    ),
    probes AS (
      SELECT t.key, t.exact_cnt, d.j AS depth,
             ('0x' || substr(md5(d.j || ':' || CAST(t.key AS VARCHAR)), 1, 4))::BIGINT % 64 AS bucket
      FROM top t, (SELECT unnest([0, 1, 2, 3]) AS j) d
    )
    SELECT p.key, p.exact_cnt,
           min(r.cnt)::BIGINT AS cm_estimate,
           (min(r.cnt) - p.exact_cnt)::BIGINT AS overestimate
    FROM probes p JOIN r ON r.depth = p.depth AND r.bucket = p.bucket
    GROUP BY p.key, p.exact_cnt
    """


# ---------------------------------------------------------------------------
# Temporal train/eval split with embargo: train strictly before the
# boundary, eval strictly after boundary + embargo, the embargo day
# DROPPED — the leakage-aware split for time-correlated data (the purged
# split of financial ML). The audit columns prove the contract: the gap
# between the latest train event and the earliest eval event must cover
# the embargo.
# ---------------------------------------------------------------------------

@register(
    "sample_temporal_split_embargo",
    """
    WITH ev AS (
      SELECT event_type, epoch_us(ts) AS us,
             CASE WHEN strftime(ts, '%Y-%m-%d') < '2024-01-22' THEN 'train'
                  WHEN strftime(ts, '%Y-%m-%d') >= '2024-01-23' THEN 'eval'
                  ELSE 'embargo' END AS split
      FROM events
    ),
    b AS (
      SELECT max(CASE WHEN split = 'train' THEN us END) AS max_train_us,
             min(CASE WHEN split = 'eval' THEN us END) AS min_eval_us
      FROM ev
    )
    SELECT ev.split, ev.event_type, count(*)::BIGINT AS n,
           min(ev.us) AS min_us, max(ev.us) AS max_us,
           CASE WHEN b.min_eval_us - b.max_train_us >= 86400000000
                THEN 1 ELSE 0 END AS embargo_ok
    FROM ev CROSS JOIN b
    GROUP BY ev.split, ev.event_type, b.min_eval_us, b.max_train_us
    """,
    doc="temporal train/eval split with a 1-day embargo (the purged split "
        "of leakage-aware ML on time-correlated data): train < 2024-01-22, "
        "eval >= 2024-01-23, the embargo day dropped; per-(split, type) "
        "counts + the audit column proving the train->eval gap covers the "
        "embargo; one combinable aggregate + a 1-row broadcast boundary",
)
def sample_temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev0 = load_table(spark, sf_dir, "events")
    d = F.date_format("ts", "yyyy-MM-dd")
    ev = ev0.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.when(d < "2024-01-22", "train")
        .when(d >= "2024-01-23", "eval")
        .otherwise("embargo")
        .alias("split"),
    )
    b = ev.agg(
        F.max(F.when(F.col("split") == "train", F.col("us"))).alias("max_train_us"),
        F.min(F.when(F.col("split") == "eval", F.col("us"))).alias("min_eval_us"),
    )
    return (
        ev.crossJoin(F.broadcast(b))
        .groupBy("split", "event_type", "min_eval_us", "max_train_us")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("us").alias("min_us"),
            F.max("us").alias("max_us"),
        )
        .select(
            "split", "event_type", "n", "min_us", "max_us",
            F.when(
                F.col("min_eval_us") - F.col("max_train_us") >= 86400000000, 1
            ).otherwise(0).alias("embargo_ok"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed AUC-ROC via the tie-corrected Mann-Whitney rank sum — the
# model-eval readout every training pipeline needs and the one naive Spark
# ports get wrong twice over: a global orderBy single-partitions the score
# column, and ignoring ties biases AUC whenever scores repeat. Ranks come
# from the two-level bucket prefix sum over DISTINCT scores (grouped first,
# so the ranked frame is |distinct scores|, not |rows|), average ranks for
# ties carried as EXACT integers by working in doubled ranks:
# 2*avg_rank(s) = 2*cum_below(s) + cnt(s) + 1. AUC = (2*R_pos -
# n_pos*(n_pos+1)) / (2*n_pos*n_neg) — one float division at the end.
# ---------------------------------------------------------------------------

@register(
    "analytic_auc_roc",
    """
    WITH s AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    g AS (
      SELECT cents, count(*)::BIGINT AS cnt, sum(pos)::BIGINT AS pos
      FROM s GROUP BY cents
    ),
    c AS (
      SELECT cnt, pos,
             (sum(cnt) OVER (ORDER BY cents))::BIGINT AS cum
      FROM g
    ),
    t AS (
      SELECT sum(pos)::BIGINT AS n_pos,
             (sum(cnt) - sum(pos))::BIGINT AS n_neg,
             sum(pos * (2 * (cum - cnt) + cnt + 1))::BIGINT AS r2_pos
      FROM c
    )
    SELECT n_pos, n_neg, r2_pos,
           CAST(r2_pos - n_pos * (n_pos + 1) AS DOUBLE)
             / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
    FROM t
    """,
    doc="exact tie-corrected AUC-ROC (Mann-Whitney U): label = order "
        "priority URGENT/HIGH, score = integer total-price cents; average "
        "ranks over distinct scores via the two-level bucket prefix sum "
        "(no single-partition sort of the score column), doubled ranks "
        "keep tie averaging in exact integers, one float division at the "
        "end — bit-identical across engines",
)
def analytic_auc_roc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("pos"),
    )
    g = s.groupBy("cents").agg(
        F.count("*").cast("long").alias("cnt"),
        F.sum("pos").cast("long").alias("pos"),
    )
    # two_level_order ranks on key DESC; negate so cum runs ASCENDING in
    # score — cum is then the inclusive count of rows at-or-below each score
    ranked = two_level_order(
        g.withColumn("neg_cents", -F.col("cents")),
        key_col="neg_cents",
        tie_col="cents",
        val_col="cnt",
    )
    t = ranked.agg(
        F.sum("pos").cast("long").alias("n_pos"),
        (F.sum("cnt") - F.sum("pos")).cast("long").alias("n_neg"),
        F.sum(
            F.col("pos")
            * (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1)
        ).cast("long").alias("r2_pos"),
    )
    return t.select(
        "n_pos", "n_neg", "r2_pos",
        (
            (F.col("r2_pos") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg")).cast("double")
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Calibration / reliability diagram + expected calibration error. The gap
# and ECE stay EXACT until one final division: with pred = (cents-lo)/denom,
# n_b*|mean_pred_b - frac_pos_b| reduces to |sum_num_b - pos_b*denom|/denom
# — an integer numerator — so ECE needs no cross-bin float sum (the usual
# nondeterminism trap) and no per-bin float subtraction feeds the total.
# ---------------------------------------------------------------------------

@register(
    "analytic_calibration_ece",
    """
    WITH s AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    b AS (SELECT min(cents) AS lo, max(cents) - min(cents) + 1 AS denom FROM s),
    binned AS (
      SELECT ((s.cents - b.lo) * 10) // b.denom AS bin,
             s.cents - b.lo AS num, s.pos, b.denom
      FROM s CROSS JOIN b
    ),
    per_bin AS (
      SELECT bin, denom, count(*)::BIGINT AS n, sum(pos)::BIGINT AS pos_cnt,
             sum(num)::BIGINT AS sum_num,
             abs(sum(num) - sum(pos) * denom)::BIGINT AS abs_num
      FROM binned GROUP BY bin, denom
    ),
    tot AS (SELECT sum(n)::BIGINT AS n_tot, sum(abs_num)::BIGINT AS abs_tot FROM per_bin)
    SELECT p.bin, p.n, p.pos_cnt,
           CAST(p.sum_num AS DOUBLE) / CAST(p.n * p.denom AS DOUBLE) AS mean_pred,
           CAST(p.pos_cnt AS DOUBLE) / CAST(p.n AS DOUBLE) AS frac_pos,
           CAST(p.abs_num AS DOUBLE) / CAST(p.n * p.denom AS DOUBLE) AS gap,
           CAST(t.abs_tot AS DOUBLE) / CAST(p.denom AS DOUBLE)
             / CAST(t.n_tot AS DOUBLE) AS ece
    FROM per_bin p CROSS JOIN tot t
    """,
    doc="reliability diagram + expected calibration error: predictor = "
        "min-max-normalized total-price cents, label = priority "
        "URGENT/HIGH, 10 equal-width bins; per-bin mean prediction vs "
        "positive fraction with the |gap| numerator kept as an exact "
        "integer (n_b*gap_b telescopes to |sum_num - pos*denom|/denom), so "
        "ECE is an integer sum with two final divisions — no cross-bin "
        "float accumulation; one combinable aggregate + two 1-row "
        "broadcasts",
)
def analytic_calibration_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("pos"),
    )
    b = s.agg(
        F.min("cents").alias("lo"),
        (F.max("cents") - F.min("cents") + 1).alias("denom"),
    )
    binned = s.crossJoin(F.broadcast(b)).select(
        F.expr("((cents - lo) * 10) div denom").alias("bin"),
        (F.col("cents") - F.col("lo")).alias("num"),
        "pos",
        "denom",
    )
    per_bin = binned.groupBy("bin", "denom").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("pos").cast("long").alias("pos_cnt"),
        F.sum("num").cast("long").alias("sum_num"),
    ).withColumn(
        "abs_num",
        F.abs(F.col("sum_num") - F.col("pos_cnt") * F.col("denom")).cast("long"),
    )
    tot = per_bin.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("abs_num").cast("long").alias("abs_tot"),
    )
    return per_bin.crossJoin(F.broadcast(tot)).select(
        "bin", "n", "pos_cnt",
        (F.col("sum_num").cast("double") / (F.col("n") * F.col("denom")).cast("double")).alias("mean_pred"),
        (F.col("pos_cnt").cast("double") / F.col("n").cast("double")).alias("frac_pos"),
        (F.col("abs_num").cast("double") / (F.col("n") * F.col("denom")).cast("double")).alias("gap"),
        (
            F.col("abs_tot").cast("double")
            / F.col("denom").cast("double")
            / F.col("n_tot").cast("double")
        ).alias("ece"),
    )


# ---------------------------------------------------------------------------
# Population stability index — the score-drift monitor between a reference
# and a current cohort (the standard model-monitoring gate: PSI < 0.1 stable,
# > 0.25 retrain). Counts and bin edges are exact integers; Laplace +1
# smoothing keeps empty bins finite; each contribution (p-q)*ln(p/q) is
# sign-definite (both factors share sign), so psi_total >= 0 by construction.
# ---------------------------------------------------------------------------

@register(
    "analytic_psi_drift",
    """
    WITH s AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderdate < DATE '1995-06-17' THEN 1 ELSE 0 END AS is_ref
      FROM orders
    ),
    b AS (SELECT min(cents) AS lo, max(cents) - min(cents) + 1 AS denom FROM s),
    per_bin AS (
      SELECT ((s.cents - b.lo) * 10) // b.denom AS bin,
             sum(s.is_ref)::BIGINT AS ref_cnt,
             sum(1 - s.is_ref)::BIGINT AS cur_cnt
      FROM s CROSS JOIN b GROUP BY 1
    ),
    tot AS (SELECT sum(ref_cnt)::BIGINT AS ref_tot, sum(cur_cnt)::BIGINT AS cur_tot FROM per_bin),
    pq AS (
      SELECT p.bin, p.ref_cnt, p.cur_cnt,
             CAST(p.ref_cnt + 1 AS DOUBLE) / CAST(t.ref_tot + 10 AS DOUBLE) AS p_ref,
             CAST(p.cur_cnt + 1 AS DOUBLE) / CAST(t.cur_tot + 10 AS DOUBLE) AS p_cur
      FROM per_bin p CROSS JOIN tot t
    ),
    contrib AS (
      SELECT bin, ref_cnt, cur_cnt, p_ref, p_cur,
             (p_ref - p_cur) * ln(p_ref / p_cur) AS psi_contrib
      FROM pq
    )
    SELECT c.bin, c.ref_cnt, c.cur_cnt, c.p_ref, c.p_cur, c.psi_contrib,
           t2.psi_total
    FROM contrib c
    CROSS JOIN (SELECT sum(psi_contrib) AS psi_total FROM contrib) t2
    """,
    doc="population stability index between the pre/post-1995-06-17 order "
        "cohorts over 10 equal-width total-price bins: exact integer "
        "counts, Laplace +1 smoothing, per-bin (p-q)*ln(p/q) contribution "
        "(sign-definite, so the total is >= 0 by construction) plus the "
        "scalar PSI broadcast onto every row; two combinable aggregates + "
        "two 1-row broadcasts — no windows, no shuffle beyond the 10-bin "
        "groupBy",
)
def analytic_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderdate") < F.lit("1995-06-17").cast("date"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    b = s.agg(
        F.min("cents").alias("lo"),
        (F.max("cents") - F.min("cents") + 1).alias("denom"),
    )
    per_bin = (
        s.crossJoin(F.broadcast(b))
        .select(F.expr("((cents - lo) * 10) div denom").alias("bin"), "is_ref")
        .groupBy("bin")
        .agg(
            F.sum("is_ref").cast("long").alias("ref_cnt"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("cur_cnt"),
        )
    )
    tot = per_bin.agg(
        F.sum("ref_cnt").cast("long").alias("ref_tot"),
        F.sum("cur_cnt").cast("long").alias("cur_tot"),
    )
    pq = per_bin.crossJoin(F.broadcast(tot)).select(
        "bin", "ref_cnt", "cur_cnt",
        ((F.col("ref_cnt") + 1).cast("double") / (F.col("ref_tot") + 10).cast("double")).alias("p_ref"),
        ((F.col("cur_cnt") + 1).cast("double") / (F.col("cur_tot") + 10).cast("double")).alias("p_cur"),
    )
    contrib = pq.select(
        "bin", "ref_cnt", "cur_cnt", "p_ref", "p_cur",
        ((F.col("p_ref") - F.col("p_cur")) * F.log(F.col("p_ref") / F.col("p_cur"))).alias("psi_contrib"),
    )
    total = contrib.agg(F.sum("psi_contrib").alias("psi_total"))
    return contrib.crossJoin(F.broadcast(total))


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov on a fixed 256-bin grid — the
# distribution-shift gate that complements PSI (PSI reads density ratios,
# KS reads the max CDF gap; a shift PSI smooths over can still trip KS).
# Exact integer bin counts; the bounded cumulative sum is a triangular
# broadcast join over the <=256-row bin table (NO unpartitioned window, no
# whitelist entry); per-bin CDFs are single divisions of exact integers so
# the max over identically-computed doubles is order-insensitive and
# engine-stable.
# ---------------------------------------------------------------------------

@register(
    "analytic_ks_test",
    """
    WITH s AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderdate < DATE '1995-06-17' THEN 1 ELSE 0 END AS is_ref
      FROM orders
    ),
    b AS (SELECT min(cents) AS lo, max(cents) - min(cents) + 1 AS denom FROM s),
    per_bin AS (
      SELECT ((s.cents - b.lo) * 256) // b.denom AS bin,
             sum(s.is_ref)::BIGINT AS ref_cnt,
             sum(1 - s.is_ref)::BIGINT AS cur_cnt
      FROM s CROSS JOIN b GROUP BY 1
    ),
    tot AS (SELECT sum(ref_cnt)::BIGINT AS ref_tot, sum(cur_cnt)::BIGINT AS cur_tot FROM per_bin),
    cum AS (
      SELECT k1.bin,
             sum(k2.ref_cnt)::BIGINT AS cum_ref,
             sum(k2.cur_cnt)::BIGINT AS cum_cur
      FROM per_bin k1 JOIN per_bin k2 ON k2.bin <= k1.bin
      GROUP BY k1.bin
    ),
    diffs AS (
      SELECT abs(CAST(c.cum_ref AS DOUBLE) / CAST(t.ref_tot AS DOUBLE)
               - CAST(c.cum_cur AS DOUBLE) / CAST(t.cur_tot AS DOUBLE)) AS abs_diff,
             t.ref_tot, t.cur_tot
      FROM cum c CROSS JOIN tot t
    )
    SELECT ref_tot, cur_tot, max(abs_diff) AS d_stat,
           max(abs_diff) * sqrt(CAST(ref_tot * cur_tot AS DOUBLE)
                                / CAST(ref_tot + cur_tot AS DOUBLE)) AS ks_lambda
    FROM diffs GROUP BY ref_tot, cur_tot
    """,
    doc="two-sample Kolmogorov-Smirnov between the pre/post-1995-06-17 "
        "order cohorts on a fixed 256-bin total-price grid: exact integer "
        "bin counts, CDFs via a triangular broadcast join over the bounded "
        "bin table (no unpartitioned window), D = max |CDF gap| over "
        "identically-computed single-division doubles (order-insensitive "
        "max), plus the KS lambda = D*sqrt(n_eff) readout for the "
        "significance lookup",
)
def analytic_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.when(F.col("o_orderdate") < F.lit("1995-06-17").cast("date"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    b = s.agg(
        F.min("cents").alias("lo"),
        (F.max("cents") - F.min("cents") + 1).alias("denom"),
    )
    per_bin = (
        s.crossJoin(F.broadcast(b))
        .select(F.expr("((cents - lo) * 256) div denom").alias("bin"), "is_ref")
        .groupBy("bin")
        .agg(
            F.sum("is_ref").cast("long").alias("ref_cnt"),
            F.sum(1 - F.col("is_ref")).cast("long").alias("cur_cnt"),
        )
    )
    tot = per_bin.agg(
        F.sum("ref_cnt").cast("long").alias("ref_tot"),
        F.sum("cur_cnt").cast("long").alias("cur_tot"),
    )
    k2 = per_bin.select(
        F.col("bin").alias("bin2"),
        F.col("ref_cnt").alias("rc2"),
        F.col("cur_cnt").alias("cc2"),
    )
    cum = (
        per_bin.join(F.broadcast(k2), F.col("bin2") <= F.col("bin"))
        .groupBy("bin")
        .agg(
            F.sum("rc2").cast("long").alias("cum_ref"),
            F.sum("cc2").cast("long").alias("cum_cur"),
        )
    )
    diffs = cum.crossJoin(F.broadcast(tot)).select(
        F.abs(
            F.col("cum_ref").cast("double") / F.col("ref_tot").cast("double")
            - F.col("cum_cur").cast("double") / F.col("cur_tot").cast("double")
        ).alias("abs_diff"),
        "ref_tot",
        "cur_tot",
    )
    return diffs.groupBy("ref_tot", "cur_tot").agg(
        F.max("abs_diff").alias("d_stat"),
        (
            F.max("abs_diff")
            * F.sqrt(
                (F.col("ref_tot") * F.col("cur_tot")).cast("double")
                / (F.col("ref_tot") + F.col("cur_tot")).cast("double")
            )
        ).alias("ks_lambda"),
    )


# ---------------------------------------------------------------------------
# Log-linear histogram quantile sketch (the HdrHistogram bucket scheme —
# Gil Tene — with the relative-error contract DDSketch formalizes: Masson,
# Rim & Lee, VLDB'19). Bucket = (floor(log2 x), 4-bit linear sub-bucket),
# all INTEGER arithmetic (floor log2 via length(bin(x))-1 — no float log
# whose last-ulp could flip a boundary across engines), <= 16*64 buckets
# for any int64 input, mergeable by bucket-count addition. Midpoint
# estimate p*(33+2*sub)/32 is within 1/(2*(16+sub)) <= 3.125% relative
# error of any value in the bucket — asserted against exact percentiles
# in the accuracy test.
# ---------------------------------------------------------------------------

@register(
    "sketch_loglinear_quantiles",
    """
    WITH x AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v FROM lineitem
    ),
    k AS (
      SELECT (length(bin(v)) - 1) * 16
             + ((v - (1::BIGINT << (length(bin(v)) - 1))) * 16)
               // (1::BIGINT << (length(bin(v)) - 1)) AS bucket,
             count(*)::BIGINT AS cnt
      FROM x GROUP BY 1
    ),
    c AS (
      SELECT k1.bucket, sum(k2.cnt)::BIGINT AS cum
      FROM k k1 JOIN k k2 ON k2.bucket <= k1.bucket GROUP BY k1.bucket
    ),
    n AS (SELECT sum(cnt)::BIGINT AS n_rows FROM k),
    q AS (
      SELECT t.qname, ((t.num * n.n_rows + t.den - 1) // t.den)::BIGINT AS rnk
      FROM (VALUES ('p50', 1, 2), ('p90', 9, 10), ('p99', 99, 100)) t(qname, num, den)
      CROSS JOIN n
    ),
    sel AS (
      SELECT q.qname, q.rnk, min(c.bucket)::BIGINT AS bucket
      FROM q JOIN c ON c.cum >= q.rnk GROUP BY q.qname, q.rnk
    )
    SELECT qname, rnk, bucket,
           CAST((1::BIGINT << (bucket // 16)) * (33 + 2 * (bucket % 16)) AS DOUBLE)
             / 32.0 AS est
    FROM sel
    """,
    doc="log-linear histogram quantile sketch (HdrHistogram buckets; the "
        "DDSketch relative-error contract): bucket = 16*floor(log2 v) + "
        "4-bit linear sub-bucket, floor log2 as length(bin(v))-1 so every "
        "boundary is exact integer arithmetic (no cross-engine float-log "
        "ulp flips); one combinable groupBy into <=16*64 mergeable "
        "counters, cumulative ranks via a triangular broadcast join over "
        "the bounded bucket table, p50/p90/p99 bucket-midpoint estimates "
        "within 3.125% relative error by construction",
)
def sketch_loglinear_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"))
    k = (
        x.select(
            F.expr(
                "(length(bin(v)) - 1) * 16"
                " + ((v - shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 1)) * 16)"
                "   div shiftleft(CAST(1 AS BIGINT), length(bin(v)) - 1)"
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    k2 = k.select(F.col("bucket").alias("bucket2"), F.col("cnt").alias("cnt2"))
    c = (
        k.join(F.broadcast(k2), F.col("bucket2") <= F.col("bucket"))
        .groupBy("bucket")
        .agg(F.sum("cnt2").cast("long").alias("cum"))
    )
    n = k.agg(F.sum("cnt").cast("long").alias("n_rows"))
    grid = spark.createDataFrame(
        [("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)], "qname string, num int, den int"
    )
    q = grid.crossJoin(F.broadcast(n)).select(
        "qname",
        F.expr("(num * n_rows + den - 1) div den").cast("long").alias("rnk"),
    )
    sel = (
        q.join(F.broadcast(c), F.col("cum") >= F.col("rnk"))
        .groupBy("qname", "rnk")
        .agg(F.min("bucket").cast("long").alias("bucket"))
    )
    return sel.select(
        "qname", "rnk", "bucket",
        (
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(bucket div 16 AS INT))"
                " * (33 + 2 * (bucket % 16))"
            ).cast("double")
            / 32.0
        ).alias("est"),
    )


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss random projection (64 -> 16 dims) with a distortion
# audit. The sign matrix is the deterministic +/-1 Achlioptas variant
# (md5-parity entries — no RNG, reproducible across runs and engines),
# materialized as literals on BOTH sides so the oracle replays the exact
# projection. Distance folds are left-to-right double accumulation (the
# repo's cross-engine float contract), distortion ratio = ||Sx-Sy||^2 /
# (k * ||x-y||^2) — E[ratio] = 1 under the JL lemma.
# ---------------------------------------------------------------------------

def _jl_signs(k: int = 16, d: int = 64) -> list[list[int]]:
    import hashlib as _hashlib

    return [
        [
            1
            if int(_hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16) % 2 == 0
            else -1
            for i in range(d)
        ]
        for j in range(k)
    ]


_JL_SIGNS = _jl_signs()

_JL_PROJ_SQL = ", ".join(
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, 64), "
    f"i -> {{v}}[i]::DOUBLE * ([{', '.join(str(s) for s in row)}][i])::DOUBLE)), "
    "(x, y) -> x + y)"
    for row in _JL_SIGNS
)

_D2_SQL = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, {n}), "
    "i -> ({a}[i]::DOUBLE - {b}[i]::DOUBLE) * ({a}[i]::DOUBLE - {b}[i]::DOUBLE))), "
    "(x, y) -> x + y)"
)


@register(
    "sim_jl_projection",
    f"""
    WITH p AS (
      SELECT vec_id, embedding,
             [{_JL_PROJ_SQL.format(v='embedding')}] AS proj
      FROM embeddings WHERE vec_id < 20
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           {_D2_SQL.format(n=64, a='a.embedding', b='b.embedding')} AS orig_d2,
           {_D2_SQL.format(n=16, a='a.proj', b='b.proj')} AS proj_d2,
           {_D2_SQL.format(n=16, a='a.proj', b='b.proj')} / 16.0
             / ({_D2_SQL.format(n=64, a='a.embedding', b='b.embedding')}) AS ratio
    FROM p a JOIN p b ON a.vec_id < b.vec_id
    """,
    doc="Johnson-Lindenstrauss 64->16 random projection with pairwise "
        "distortion audit on a fixed 20-vector set: deterministic +/-1 "
        "md5-parity sign matrix embedded as literals on both sides, "
        "left-to-right double folds for projections and distances, ratio "
        "= proj_d2/(k*orig_d2) whose concentration around 1 IS the JL "
        "lemma; at corpus scale the projection is one map-side fold per "
        "row (16 fused folds, no shuffle) and the audit side stays a "
        "bounded broadcast",
)
def sim_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")

    def proj_j(row: list[int]):
        return F.aggregate(
            F.zip_with(
                F.col("embedding"),
                F.array(*[F.lit(s) for s in row]),
                lambda x, s: x.cast("double") * s.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    p = emb.filter(F.col("vec_id") < 20).select(
        "vec_id", "embedding", F.array(*[proj_j(r) for r in _JL_SIGNS]).alias("proj")
    )

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double"))
                       * (x.cast("double") - y.cast("double"))),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    pa = p.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("ea"),
        F.col("proj").alias("pa"),
    )
    pb = p.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("eb"),
        F.col("proj").alias("pb"),
    )
    pairs = pa.join(F.broadcast(pb), F.col("a") < F.col("b"))
    orig = d2(F.col("ea"), F.col("eb"))
    proj = d2(F.col("pa"), F.col("pb"))
    return pairs.select(
        "a", "b",
        orig.alias("orig_d2"),
        proj.alias("proj_d2"),
        (proj / 16.0 / orig).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# Maximum-inner-product top-k via the norm-augmentation reduction to cosine
# NN (Bachrach et al., RecSys'14; the asymmetric-LSH trick of Shrivastava &
# Li, NIPS'14): append sqrt(M^2 - ||c||^2) to every corpus vector (M = max
# corpus norm) and 0 to every query — all augmented corpus norms equal M,
# so cosine order in the lifted space IS inner-product order. The engine
# runs the reduction through the UNCHANGED cosine knn machinery; the oracle
# ranks by raw inner product — so the driver gate independently certifies
# the reduction itself, not a re-implementation of it.
# ---------------------------------------------------------------------------

@register(
    "sim_mips_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id < 100),
    scored AS (
      SELECT q.query_id, c.vec_id AS neighbor_id,
             {_DOT_SQL.format(a='q.qvec', b='c.embedding')} AS ip
      FROM q, embeddings c WHERE c.vec_id <> q.query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, ip,
             row_number() OVER (PARTITION BY query_id ORDER BY ip DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, rank, ip FROM ranked WHERE rank <= 3
    """,
    doc="maximum-inner-product top-3 for the fixed 100-query set via the "
        "norm-augmentation reduction (append sqrt(M^2-||c||^2) to corpus "
        "vectors, 0 to queries; cosine in the lifted space orders by inner "
        "product) run through the unchanged cosine knn path; the oracle "
        "ranks by RAW inner product, certifying the reduction end-to-end; "
        "reported ip recomputed with the shared ordered dot fold on the "
        "3-per-query result pairs only",
)
def sim_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    c = emb.select("vec_id", dbl.alias("vec"), S.l2_norm(F.col("embedding")).alias("cnorm"))
    m = c.agg(F.max("cnorm").alias("max_norm"))
    corpus_aug = c.crossJoin(F.broadcast(m)).select(
        "vec_id",
        F.concat(
            "vec",
            F.array(
                F.sqrt(
                    F.col("max_norm") * F.col("max_norm")
                    - F.col("cnorm") * F.col("cnorm")
                )
            ),
        ).alias("embedding"),
    )
    queries_aug = c.filter(F.col("vec_id") < 100).select(
        "vec_id", F.concat("vec", F.array(F.lit(0.0))).alias("embedding")
    )
    top = S.knn_bruteforce(queries_aug, corpus_aug, k=3)
    # report the raw inner product for the 3-per-query winners with the
    # same ordered fold the oracle uses (not cos*norms — that would
    # double-round)
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    cv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cvec"))
    return (
        top.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id", "neighbor_id", "rank",
            S.dot(F.col("qvec"), F.col("cvec")).alias("ip"),
        )
    )


# ---------------------------------------------------------------------------
# Cohen's kappa — inter-rater agreement corrected for chance, the standard
# readout when two LLM judges (or a judge and a heuristic) label the same
# corpus. Raters here are two deterministic classifiers over orders: rater
# B agrees with rater A except on a fixed md5-selected 10% slice where it
# shifts one class — so the expected kappa is high but not 1. Everything
# is exact integers until one division: kappa = (po-pe)/(1-pe) clears
# denominators to (n*agree - sum_i r_i*c_i) / (n^2 - sum_i r_i*c_i).
# ---------------------------------------------------------------------------

@register(
    "analytic_cohens_kappa",
    """
    WITH r AS (
      SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0
                  WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 2 END AS a,
             ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 4))::BIGINT % 10 AS flip
      FROM orders
    ),
    lab AS (
      SELECT a, CASE WHEN flip = 0 THEN (a + 1) % 3 ELSE a END AS b FROM r
    ),
    cont AS (SELECT a, b, count(*)::BIGINT AS cnt FROM lab GROUP BY a, b),
    ra AS (SELECT a AS cls, sum(cnt)::BIGINT AS r_cnt FROM cont GROUP BY a),
    cb AS (SELECT b AS cls, sum(cnt)::BIGINT AS c_cnt FROM cont GROUP BY b),
    chance AS (
      SELECT sum(ra.r_cnt * cb.c_cnt)::BIGINT AS chance_num
      FROM ra JOIN cb ON ra.cls = cb.cls
    ),
    tot AS (
      SELECT sum(cnt)::BIGINT AS n,
             sum(CASE WHEN a = b THEN cnt ELSE 0 END)::BIGINT AS agree
      FROM cont
    )
    SELECT t.n, t.agree, c.chance_num,
           CAST(t.n * t.agree - c.chance_num AS DOUBLE)
             / CAST(t.n * t.n - c.chance_num AS DOUBLE) AS kappa
    FROM tot t CROSS JOIN chance c
    """,
    doc="Cohen's kappa between two deterministic 3-class raters (rater B = "
        "rater A shifted on a fixed md5-selected 10% slice): exact integer "
        "contingency and marginals, kappa with cleared denominators "
        "(n*agree - sum r_i*c_i)/(n^2 - sum r_i*c_i) — one float division; "
        "one combinable groupBy + bounded 9-row side tables. The n^2 "
        "integer form holds to ~3e9 rows; past that switch to the "
        "po/pe ratio form",
)
def analytic_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
        .when(F.col("o_orderpriority") == "3-MEDIUM", 1)
        .otherwise(2)
    )
    flip = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 4), 16, 10)
        .cast("long") % 10
    )
    lab = orders.select(
        a.alias("a"),
        F.when(flip == 0, (a + 1) % 3).otherwise(a).alias("b"),
    )
    cont = lab.groupBy("a", "b").agg(F.count("*").cast("long").alias("cnt"))
    ra = cont.groupBy(F.col("a").alias("cls")).agg(F.sum("cnt").cast("long").alias("r_cnt"))
    cb = cont.groupBy(F.col("b").alias("cls")).agg(F.sum("cnt").cast("long").alias("c_cnt"))
    chance = (
        ra.join(F.broadcast(cb), "cls")
        .agg(F.sum(F.col("r_cnt") * F.col("c_cnt")).cast("long").alias("chance_num"))
    )
    tot = cont.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("cnt")).otherwise(0))
        .cast("long")
        .alias("agree"),
    )
    return tot.crossJoin(F.broadcast(chance)).select(
        "n", "agree", "chance_num",
        (
            (F.col("n") * F.col("agree") - F.col("chance_num")).cast("double")
            / (F.col("n") * F.col("n") - F.col("chance_num")).cast("double")
        ).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Decile lift / gains table — the model readout marketing and ranking
# pipelines act on: sort by score, cut into 10 equal-population deciles,
# read positives captured per decile vs the base rate. Per-ROW global
# ranks via the two-level bucket prefix sum (the decile boundary must be
# allowed to split a tied score group — rank-space deciles, not value
# bins, which is exactly what analytic_calibration_ece is not); bounded
# cumulative capture via the 10-row triangular broadcast join.
# ---------------------------------------------------------------------------

@register(
    "analytic_lift_deciles",
    """
    WITH s AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS pos
      FROM orders
    ),
    ranked AS (
      SELECT pos, row_number() OVER (ORDER BY cents DESC, o_orderkey ASC) AS rk,
             count(*) OVER () AS n
      FROM s
    ),
    dec AS (
      SELECT ((rk - 1) * 10) // n AS decile, count(*)::BIGINT AS n_d,
             sum(pos)::BIGINT AS pos_d
      FROM ranked GROUP BY 1
    ),
    tot AS (SELECT sum(n_d)::BIGINT AS n, sum(pos_d)::BIGINT AS pos_tot FROM dec),
    cum AS (
      SELECT d1.decile, sum(d2.pos_d)::BIGINT AS cum_pos
      FROM dec d1 JOIN dec d2 ON d2.decile <= d1.decile GROUP BY d1.decile
    )
    SELECT d.decile, d.n_d, d.pos_d,
           CAST(d.pos_d AS DOUBLE) / CAST(d.n_d AS DOUBLE) AS pos_rate,
           CAST(d.pos_d * t.n AS DOUBLE) / CAST(d.n_d * t.pos_tot AS DOUBLE) AS lift,
           c.cum_pos,
           CAST(c.cum_pos AS DOUBLE) / CAST(t.pos_tot AS DOUBLE) AS cum_capture
    FROM dec d JOIN cum c ON c.decile = d.decile CROSS JOIN tot t
    """,
    doc="decile lift / gains table on the price-score, priority-label pair: "
        "per-row global ranks from the two-level bucket prefix sum (no "
        "single-partition sort; rank-space deciles may split tied scores), "
        "exact integer decile counts, lift = (pos_d*n)/(n_d*pos_tot) and "
        "cumulative capture as single divisions of exact integers; the "
        "10-row cumulative side is a triangular broadcast join",
)
def analytic_lift_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    orders = load_table(spark, sf_dir, "orders")
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
        F.when(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
        ).otherwise(0).alias("pos"),
    )
    ranked = two_level_order(s, key_col="cents", tie_col="o_orderkey")
    n1 = s.agg(F.count("*").cast("long").alias("n"))
    dec = (
        ranked.crossJoin(F.broadcast(n1))
        .select(F.expr("((rk - 1) * 10) div n").alias("decile"), "pos")
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_d"),
            F.sum("pos").cast("long").alias("pos_d"),
        )
    )
    tot = dec.agg(
        F.sum("n_d").cast("long").alias("n"),
        F.sum("pos_d").cast("long").alias("pos_tot"),
    )
    d2 = dec.select(F.col("decile").alias("decile2"), F.col("pos_d").alias("pos_d2"))
    cum = (
        dec.join(F.broadcast(d2), F.col("decile2") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("pos_d2").cast("long").alias("cum_pos"))
    )
    return (
        dec.join(F.broadcast(cum), "decile")
        .crossJoin(F.broadcast(tot))
        .select(
            "decile", "n_d", "pos_d",
            (F.col("pos_d").cast("double") / F.col("n_d").cast("double")).alias("pos_rate"),
            (
                (F.col("pos_d") * F.col("n")).cast("double")
                / (F.col("n_d") * F.col("pos_tot")).cast("double")
            ).alias("lift"),
            "cum_pos",
            (F.col("cum_pos").cast("double") / F.col("pos_tot").cast("double")).alias("cum_capture"),
        )
    )


# ---------------------------------------------------------------------------
# URL-canonical dedup clusters — the FIRST pass of web-corpus dedup: group
# crawled docs by canonicalized URL (case-folded scheme/host, fragment and
# tracking params stripped, default port dropped) before any content
# hashing. Synthesized URL variants (case, :80, #fragment, utm param) per
# doc collide onto lcm(7,10,2)=70 canonical targets, so the clusters are real.
# Map-only canonicalization + ONE combinable groupBy — at 100 TB this is
# the cheapest dedup wave and runs first for exactly that reason.
# ---------------------------------------------------------------------------

@register(
    "dedup_url_canonical",
    """
    WITH u AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 2 = 0 THEN 'http' ELSE 'HTTP' END) || '://' ||
             (CASE WHEN doc_id % 3 = 0 THEN 'Site' ELSE 'site' END) ||
             CAST(doc_id % 7 AS VARCHAR) || '.example.COM' ||
             (CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END) ||
             '/page' || CAST(doc_id % 10 AS VARCHAR) ||
             '?utm_source=feed&ref=' || CAST(doc_id % 2 AS VARCHAR) ||
             '#sec' || CAST(doc_id % 3 AS VARCHAR) AS raw
      FROM documents
    ),
    canon AS (
      SELECT doc_id,
             lower(split_part(replace(replace(regexp_replace(raw, '#.*$', ''),
                                              'utm_source=feed&', ''),
                                      ':80/', '/'),
                              '/page', 1))
             || '/page'
             || split_part(replace(replace(regexp_replace(raw, '#.*$', ''),
                                           'utm_source=feed&', ''),
                                   ':80/', '/'),
                           '/page', 2) AS canonical
      FROM u
    )
    SELECT canonical, count(*)::BIGINT AS n_docs,
           min(doc_id)::BIGINT AS keeper,
           (count(*) - 1)::BIGINT AS n_dupes
    FROM canon GROUP BY canonical
    HAVING count(*) >= 2
    """,
    doc="URL-canonical dedup clusters (crawl dedup pass 0): fragment "
        "stripped, utm tracking param removed, default :80 port dropped, "
        "scheme+host case-folded (path case preserved); per canonical URL "
        "the doc count, min-doc_id keeper, and dupe count for clusters of "
        ">= 2 — map-only normalization, one combinable groupBy, no joins; "
        "regex steps RE2-safe (no lookaround/backrefs)",
)
def dedup_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("http")).otherwise(F.lit("HTTP")),
        F.lit("://"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("Site")).otherwise(F.lit("site")),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.COM"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/page"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("?utm_source=feed&ref="),
        (F.col("doc_id") % 2).cast("string"),
        F.lit("#sec"),
        (F.col("doc_id") % 3).cast("string"),
    )
    stripped = F.replace(
        F.replace(
            F.regexp_replace(raw, r"#.*$", ""),
            F.lit("utm_source=feed&"),
            F.lit(""),
        ),
        F.lit(":80/"),
        F.lit("/"),
    )
    canon = docs.select("doc_id", stripped.alias("stripped")).select(
        "doc_id",
        F.concat(
            F.lower(F.expr("split_part(stripped, '/page', 1)")),
            F.lit("/page"),
            F.expr("split_part(stripped, '/page', 2)"),
        ).alias("canonical"),
    )
    return (
        canon.groupBy("canonical")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keeper"),
            (F.count("*") - 1).cast("long").alias("n_dupes"),
        )
        .filter(F.col("n_docs") >= 2)
    )


# ---------------------------------------------------------------------------
# 2-D skyline (Pareto-optimal set; Borzsonyi, Kossmann & Stocker, ICDE'01)
# — the multi-criteria "best offers" operator: orders not dominated on
# (total price, order recency). The classic single-node algorithm is a
# sort + running max; the distributed version here is the two-level
# bucket device extended with a STRICT-prefix running max (sampling.
# two_level_order max_col) — per-bucket exclusive max + broadcast prefix
# of bucket maxima — so no single-partition sort touches the fact table.
# ---------------------------------------------------------------------------

@register(
    "olap_skyline_2d",
    """
    WITH g AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             max(date_diff('day', DATE '1970-01-01', o_orderdate))::BIGINT AS day
      FROM orders GROUP BY 1
    ),
    w AS (
      SELECT cents, day,
             max(day) OVER (ORDER BY cents DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM g
    )
    SELECT cents, day FROM w WHERE prev_max IS NULL OR day > prev_max
    """,
    doc="2-D skyline / Pareto frontier over (price cents DESC, order "
        "epoch-day DESC): per distinct price the max day (combinable "
        "groupBy), then keep points whose day strictly exceeds the "
        "running max over all strictly-higher prices — computed with the "
        "two-level bucket strict-prefix max, no single-partition window; "
        "ties collapse correctly because equal prices pre-aggregate to "
        "their max day",
)
def olap_skyline_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    orders = load_table(spark, sf_dir, "orders")
    g = (
        orders.select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day"),
        )
        .groupBy("cents")
        .agg(F.max("day").alias("day"))
    )
    ranked = two_level_order(g, key_col="cents", tie_col="cents", max_col="day")
    return ranked.filter(
        F.col("run_max_excl").isNull() | (F.col("day") > F.col("run_max_excl"))
    ).select("cents", "day")


# ---------------------------------------------------------------------------
# Transaction-boundary CDC apply — the Debezium transaction-metadata
# contract (event envelopes carry a transaction id and the expected event
# count): a consumer honoring atomicity applies a transaction only when
# ALL of its events have arrived, and holds the rest back rather than
# exposing a half-applied transaction. Synthesized in-flight loss (one
# event in 17 withheld) leaves those transactions incomplete; every key
# reports whether its transaction's update was applied.
# ---------------------------------------------------------------------------

@register(
    "cdc_transactional_apply",
    """
    WITH ev AS (
      SELECT o_orderkey AS k, o_orderkey // 10 AS tx_id
      FROM orders WHERE o_orderkey % 17 <> 5
    ),
    expected AS (
      SELECT o_orderkey // 10 AS tx_id, count(*)::BIGINT AS n_expected
      FROM orders GROUP BY 1
    ),
    arrived AS (SELECT tx_id, count(*)::BIGINT AS n_arrived FROM ev GROUP BY tx_id),
    complete AS (
      SELECT e.tx_id FROM expected e JOIN arrived a USING (tx_id)
      WHERE a.n_arrived = e.n_expected
    )
    SELECT o.o_orderkey AS k,
           CASE WHEN c.tx_id IS NOT NULL THEN o.o_totalprice + 500
                ELSE o.o_totalprice END AS v,
           CASE WHEN c.tx_id IS NOT NULL THEN 1 ELSE 0 END AS applied
    FROM orders o LEFT JOIN complete c ON c.tx_id = o.o_orderkey // 10
    """,
    doc="transaction-boundary CDC apply (the Debezium transaction-metadata "
        "contract: BEGIN/END markers carry the expected per-tx event "
        "count): updates apply only for transactions whose arrived count "
        "equals the expected count — one event in 17 is withheld, so those "
        "transactions hold back atomically instead of exposing a "
        "half-applied state; two combinable tx-keyed aggregates + one "
        "tx-keyed join, no windows",
)
def cdc_transactional_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    tx = F.expr("o_orderkey div 10")
    ev = orders.filter(F.col("o_orderkey") % 17 != 5).select(tx.alias("tx_id"))
    expected = orders.groupBy(tx.alias("tx_id")).agg(
        F.count("*").cast("long").alias("n_expected")
    )
    arrived = ev.groupBy("tx_id").agg(F.count("*").cast("long").alias("n_arrived"))
    complete = (
        expected.join(arrived, "tx_id")
        .filter(F.col("n_arrived") == F.col("n_expected"))
        .select("tx_id", F.lit(1).alias("_complete"))
    )
    return (
        orders.select("o_orderkey", "o_totalprice", tx.alias("tx_id"))
        .join(complete, "tx_id", "left")
        .select(
            F.col("o_orderkey").alias("k"),
            F.when(F.col("_complete") == 1, F.col("o_totalprice") + 500)
            .otherwise(F.col("o_totalprice"))
            .alias("v"),
            F.when(F.col("_complete") == 1, 1).otherwise(0).alias("applied"),
        )
    )


# ---------------------------------------------------------------------------
# Cramer's V — chi-square association strength between two categoricals,
# normalized to [0,1]; the effect-size companion to analytic_entropy_mi
# (MI measures shared information, V measures departure from
# independence on the chi-square scale). Exact integer contingency and
# marginals; per-cell terms from one shared float expression; the
# cross-cell sum is an ORDERED (a,b)-sorted fold so doubles are
# bit-identical across engines (the JSD device).
# ---------------------------------------------------------------------------

@register(
    "analytic_cramers_v",
    """
    WITH cont AS (
      SELECT o_orderpriority AS a, o_orderstatus AS b, count(*)::BIGINT AS o
      FROM orders GROUP BY a, b
    ),
    ra AS (SELECT a, sum(o)::BIGINT AS r FROM cont GROUP BY a),
    cb AS (SELECT b, sum(o)::BIGINT AS c FROM cont GROUP BY b),
    tot AS (
      SELECT sum(o)::BIGINT AS n,
             (count(DISTINCT a))::BIGINT AS n_rows_dim,
             (count(DISTINCT b))::BIGINT AS n_cols_dim
      FROM cont
    ),
    cells AS (
      SELECT cont.a, cont.b, cont.o, t.n, t.n_rows_dim, t.n_cols_dim,
             (CAST(cont.o AS DOUBLE)
              - CAST(ra.r * cb.c AS DOUBLE) / CAST(t.n AS DOUBLE))
             * (CAST(cont.o AS DOUBLE)
                - CAST(ra.r * cb.c AS DOUBLE) / CAST(t.n AS DOUBLE))
             / (CAST(ra.r * cb.c AS DOUBLE) / CAST(t.n AS DOUBLE)) AS term
      FROM cont JOIN ra USING (a) JOIN cb USING (b) CROSS JOIN tot t
    )
    SELECT max(n)::BIGINT AS n, count(*)::BIGINT AS n_cells,
           list_reduce(list_prepend(0.0, list(term ORDER BY a, b)),
                       (acc, v) -> acc + v) AS chi2,
           sqrt(list_reduce(list_prepend(0.0, list(term ORDER BY a, b)),
                            (acc, v) -> acc + v)
                / CAST(max(n) * least(max(n_rows_dim) - 1, max(n_cols_dim) - 1)
                       AS DOUBLE)) AS cramers_v
    FROM cells
    """,
    doc="Cramer's V between order priority (5 classes) and order status "
        "(3 classes): exact integer contingency + marginals (bounded "
        "broadcast sides), per-cell chi-square term from one shared float "
        "expression, chi2 via an ORDERED cell-sorted fold (bit-identical "
        "across engines), V = sqrt(chi2/(n*min(r-1,c-1)))",
)
def analytic_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cont = orders.groupBy(
        F.col("o_orderpriority").alias("a"), F.col("o_orderstatus").alias("b")
    ).agg(F.count("*").cast("long").alias("o"))
    ra = cont.groupBy("a").agg(F.sum("o").cast("long").alias("r"))
    cb = cont.groupBy("b").agg(F.sum("o").cast("long").alias("c"))
    tot = cont.agg(
        F.sum("o").cast("long").alias("n"),
        F.countDistinct("a").cast("long").alias("n_rows_dim"),
        F.countDistinct("b").cast("long").alias("n_cols_dim"),
    )
    e = F.expr("CAST(r * c AS DOUBLE) / CAST(n AS DOUBLE)")
    cells = (
        cont.join(F.broadcast(ra), "a")
        .join(F.broadcast(cb), "b")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "term",
            (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e,
        )
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("a"), F.col("b"), F.col("term")))),
        lambda s: s["term"],
    )
    chi2 = F.aggregate(ordered, F.lit(0.0), lambda acc, v: acc + v)
    return cells.agg(
        F.max("n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_cells"),
        chi2.alias("chi2"),
        F.sqrt(
            chi2
            / (
                F.max("n")
                * F.least(F.max("n_rows_dim") - 1, F.max("n_cols_dim") - 1)
            ).cast("double")
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# Coarsened exact matching ATT (Iacus, King & Porro, Political Analysis
# 2012) — the matching estimator beside the regression-style quartet
# (SRM -> DiD -> CUPED -> MDE): units are matched EXACTLY within coarsened
# covariate strata (event type x 6-hour band), unmatched strata are
# pruned, ATT = treated-share-weighted mean of within-stratum contrasts.
# Exact integer cell sums; per-stratum contrast and weight from shared
# float expressions; the cross-strata sum is an ordered fold.
# ---------------------------------------------------------------------------

@register(
    "analytic_cem_att",
    """
    WITH x AS (
      SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) // 6 AS hband,
             CAST(round(value * 100) AS BIGINT) AS y,
             CASE WHEN (('0x' || substr(md5('cem' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5
                  THEN 1 ELSE 0 END AS treated
      FROM events
    ),
    s AS (
      SELECT event_type, hband,
             sum(treated)::BIGINT AS n_t,
             sum(CASE WHEN treated = 1 THEN y ELSE 0 END)::BIGINT AS s_t,
             sum(1 - treated)::BIGINT AS n_c,
             sum(CASE WHEN treated = 0 THEN y ELSE 0 END)::BIGINT AS s_c
      FROM x GROUP BY event_type, hband
    ),
    m AS (SELECT * FROM s WHERE n_t > 0 AND n_c > 0),
    tot AS (SELECT sum(n_t)::BIGINT AS nt_matched FROM m),
    terms AS (
      SELECT m.event_type, m.hband, m.n_t, m.n_c, t.nt_matched,
             CAST(m.s_t AS DOUBLE) / CAST(m.n_t AS DOUBLE)
               - CAST(m.s_c AS DOUBLE) / CAST(m.n_c AS DOUBLE) AS diff_cents,
             (CAST(m.n_t AS DOUBLE) / CAST(t.nt_matched AS DOUBLE))
               * (CAST(m.s_t AS DOUBLE) / CAST(m.n_t AS DOUBLE)
                  - CAST(m.s_c AS DOUBLE) / CAST(m.n_c AS DOUBLE)) AS term
      FROM m CROSS JOIN tot t
    )
    SELECT terms.event_type, terms.hband, terms.n_t, terms.n_c,
           terms.diff_cents, terms.term, a.att_cents
    FROM terms
    CROSS JOIN (
      SELECT list_reduce(list_prepend(0.0, list(term ORDER BY event_type, hband)),
                         (acc, v) -> acc + v) AS att_cents
      FROM terms
    ) a
    """,
    doc="coarsened exact matching ATT on the hashed user-level treatment "
        "split: strata = event type x 6-hour band, strata missing either "
        "arm are pruned, per-stratum contrast from exact integer cents "
        "sums, ATT = treated-share-weighted ordered fold across matched "
        "strata (bit-identical doubles); the matching estimator beside "
        "DiD/CUPED — no model, no windows, two combinable aggregates",
)
def analytic_cem_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    treated = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("cem"), F.col("user_id").cast("string"))), 1, 8), 16, 10)
        .cast("long") / F.lit(4294967296.0)
        < 0.5,
        1,
    ).otherwise(0)
    x = events.select(
        "event_type",
        F.expr("CAST(extract(hour FROM ts) AS BIGINT) div 6").alias("hband"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
        treated.alias("treated"),
    )
    s = x.groupBy("event_type", "hband").agg(
        F.sum("treated").cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0)).cast("long").alias("s_t"),
        F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0)).cast("long").alias("s_c"),
    )
    m = s.filter((F.col("n_t") > 0) & (F.col("n_c") > 0))
    tot = m.agg(F.sum("n_t").cast("long").alias("nt_matched"))
    diff = F.expr(
        "CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
        " - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE)"
    )
    terms = m.crossJoin(F.broadcast(tot)).select(
        "event_type", "hband", "n_t", "n_c", "nt_matched",
        diff.alias("diff_cents"),
        (
            (F.col("n_t").cast("double") / F.col("nt_matched").cast("double")) * diff
        ).alias("term"),
    )
    ordered = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col("event_type"), F.col("hband"), F.col("term")))
        ),
        lambda st: st["term"],
    )
    att = terms.agg(
        F.aggregate(ordered, F.lit(0.0), lambda acc, v: acc + v).alias("att_cents")
    )
    return terms.crossJoin(F.broadcast(att)).select(
        "event_type", "hband", "n_t", "n_c", "diff_cents", "term", "att_cents"
    )


# ---------------------------------------------------------------------------
# Neyman optimal allocation (Neyman 1934) — how many samples to draw per
# stratum when building an eval set under a fixed labeling budget:
# n_h proportional to N_h * S_h beats proportional allocation whenever
# within-stratum spreads differ. Power sums are exact longs in ONE
# combinable pass; S_h and the weights are shared float expressions; the
# cross-strata weight total is an ordered fold (strata are bounded).
# ---------------------------------------------------------------------------

@register(
    "sample_neyman_allocation",
    """
    WITH s AS (
      SELECT event_type, count(*)::BIGINT AS n_h,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS s1,
             sum(CAST(round(value * 100) AS BIGINT)
                 * CAST(round(value * 100) AS BIGINT))::BIGINT AS s2
      FROM events GROUP BY event_type
    ),
    w AS (
      SELECT event_type, n_h, s1, s2,
             CAST(n_h AS DOUBLE)
               * sqrt(CAST(n_h * s2 - s1 * s1 AS DOUBLE)
                      / CAST(n_h * (n_h - 1) AS DOUBLE)) AS w_h
      FROM s
    ),
    tot AS (
      SELECT sum(n_h)::BIGINT AS n_total,
             list_reduce(list_prepend(0.0, list(w_h ORDER BY event_type)),
                         (acc, v) -> acc + v) AS w_total
      FROM w
    )
    SELECT w.event_type, w.n_h,
           sqrt(CAST(w.n_h * w.s2 - w.s1 * w.s1 AS DOUBLE)
                / CAST(w.n_h * (w.n_h - 1) AS DOUBLE)) AS s_h,
           CAST(floor(1000.0 * w.w_h / t.w_total) AS BIGINT) AS neyman_alloc,
           CAST((1000 * w.n_h) // t.n_total AS BIGINT) AS prop_alloc
    FROM w CROSS JOIN tot t
    """,
    doc="Neyman optimal allocation of a 1000-sample labeling budget across "
        "event-type strata: n_h ~ N_h*S_h with the stratum spread from "
        "exact long power sums in one combinable pass (the n*s2-s1^2 "
        "integer form holds to ~3e9-row strata), weight total via an "
        "ordered fold over the bounded strata, proportional allocation "
        "beside it for the comparison the method exists to win",
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    y = F.round(F.col("value") * 100).cast("long")
    s = events.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum(y).cast("long").alias("s1"),
        F.sum(y * y).cast("long").alias("s2"),
    )
    s_h = F.sqrt(
        (F.col("n_h") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
        / (F.col("n_h") * (F.col("n_h") - 1)).cast("double")
    )
    w = s.withColumn("w_h", F.col("n_h").cast("double") * s_h)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("event_type"), F.col("w_h")))),
        lambda st: st["w_h"],
    )
    tot = w.agg(
        F.sum("n_h").cast("long").alias("n_total"),
        F.aggregate(ordered, F.lit(0.0), lambda acc, v: acc + v).alias("w_total"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "event_type", "n_h",
        s_h.alias("s_h"),
        F.floor(F.lit(1000.0) * F.col("w_h") / F.col("w_total"))
        .cast("long")
        .alias("neyman_alloc"),
        F.expr("(1000 * n_h) div n_total").cast("long").alias("prop_alloc"),
    )


# ---------------------------------------------------------------------------
# Table-format transaction-log replay — the Delta/Iceberg-shaped
# "snapshot at version V" primitive: a log of add/remove file actions is
# replayed to the live file set as of a checkpoint version. A path's
# state is decided by its LATEST action at-or-before V; with at most one
# action per (path, version) the argmax packs into one integer
# max(version*10 + is_add) — a single combinable aggregate, no windows,
# no joins back.
# ---------------------------------------------------------------------------

@register(
    "layout_log_replay_snapshot",
    """
    WITH files AS (SELECT DISTINCT o_orderkey % 500 AS fid FROM orders),
    log AS (
      SELECT 'part-' || CAST(fid AS VARCHAR) AS path, fid % 50 AS version, 1 AS is_add
      FROM files
      UNION ALL
      SELECT 'part-' || CAST(fid AS VARCHAR), fid % 50 + 25, 0
      FROM files WHERE fid % 3 = 0
      UNION ALL
      SELECT 'part-' || CAST(fid AS VARCHAR), fid % 50 + 40, 1
      FROM files WHERE fid % 6 = 0
    ),
    latest AS (
      SELECT path,
             max(version * 10 + is_add)::BIGINT AS packed,
             count(*)::BIGINT AS n_actions
      FROM log WHERE version <= 60 GROUP BY path
    )
    SELECT path, (packed // 10)::BIGINT AS last_version,
           (packed % 10)::BIGINT AS live, n_actions
    FROM latest
    """,
    doc="transaction-log snapshot replay (the Delta/Iceberg table-format "
        "primitive): add/remove file actions replayed to the live set at "
        "checkpoint version 60 — per path the latest at-or-before action "
        "decides liveness, computed as ONE packed-integer argmax "
        "max(version*10+is_add) in a single combinable aggregate (at most "
        "one action per (path, version) by construction); no windows, no "
        "self-joins — the shape that replays a billion-action log in one "
        "shuffle",
)
def layout_log_replay_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    files = orders.select((F.col("o_orderkey") % 500).alias("fid")).distinct()
    path = F.concat(F.lit("part-"), F.col("fid").cast("string"))
    log = (
        files.select(path.alias("path"), (F.col("fid") % 50).alias("version"), F.lit(1).alias("is_add"))
        .unionByName(
            files.filter(F.col("fid") % 3 == 0).select(
                path.alias("path"),
                (F.col("fid") % 50 + 25).alias("version"),
                F.lit(0).alias("is_add"),
            )
        )
        .unionByName(
            files.filter(F.col("fid") % 6 == 0).select(
                path.alias("path"),
                (F.col("fid") % 50 + 40).alias("version"),
                F.lit(1).alias("is_add"),
            )
        )
    )
    return (
        log.filter(F.col("version") <= 60)
        .groupBy("path")
        .agg(
            F.max(F.col("version") * 10 + F.col("is_add")).cast("long").alias("packed"),
            F.count("*").cast("long").alias("n_actions"),
        )
        .select(
            "path",
            F.expr("packed div 10").cast("long").alias("last_version"),
            (F.col("packed") % 10).cast("long").alias("live"),
            "n_actions",
        )
    )


# ---------------------------------------------------------------------------
# SCD Type-3 (Kimball): the "current + previous value" dimension — the
# cheap alternative to full Type-2 history when only one step of lineage
# matters. Built from the same change-event synthesis as cdc_scd2_history
# with ZERO windows: current = arg-max by commit ts (one combinable
# max_by), previous = arg-max over the strictly-earlier events (one more
# aggregate after a broadcast-backed anti-filter on the per-key max ts).
# ---------------------------------------------------------------------------

@register(
    "cdc_scd_type3",
    """
    WITH ev AS (
      SELECT o_orderkey,
             CAST(unnest(generate_series(0, o_orderkey % 3)) AS BIGINT) AS version,
             o_totalprice
      FROM orders
    ),
    v AS (
      SELECT o_orderkey, version,
             o_totalprice + 100 * version AS price,
             (version + 1) * 1000 AS ts_ms
      FROM ev
    ),
    cur AS (
      SELECT o_orderkey, arg_max(price, ts_ms) AS current_price,
             max(ts_ms)::BIGINT AS current_ts, count(*)::BIGINT AS n_versions
      FROM v GROUP BY o_orderkey
    ),
    prev AS (
      SELECT v.o_orderkey, arg_max(v.price, v.ts_ms) AS prev_price
      FROM v JOIN cur ON cur.o_orderkey = v.o_orderkey
      WHERE v.ts_ms < cur.current_ts
      GROUP BY v.o_orderkey
    )
    SELECT c.o_orderkey, c.current_price, p.prev_price, c.current_ts, c.n_versions
    FROM cur c LEFT JOIN prev p ON p.o_orderkey = c.o_orderkey
    """,
    doc="SCD Type-3 current+previous dimension from the CDC change log "
        "(same event synthesis as cdc_scd2_history): current value by "
        "max_by(price, ts), previous by max_by over the strictly-earlier "
        "events — two combinable key-grouped aggregates and one key join, "
        "no windows; prev_price null for single-version keys",
)
def cdc_scd_type3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    versions = F.sequence(F.lit(0), (F.col("o_orderkey") % 3).cast("int"))
    v = orders.select(
        "o_orderkey", "o_totalprice", F.explode(versions).alias("version")
    ).select(
        "o_orderkey",
        (F.col("o_totalprice") + 100 * F.col("version")).alias("price"),
        ((F.col("version") + 1) * 1000).cast("long").alias("ts_ms"),
    )
    cur = v.groupBy("o_orderkey").agg(
        F.max_by("price", "ts_ms").alias("current_price"),
        F.max("ts_ms").cast("long").alias("current_ts"),
        F.count("*").cast("long").alias("n_versions"),
    )
    prev = (
        v.join(cur.select("o_orderkey", "current_ts"), "o_orderkey")
        .filter(F.col("ts_ms") < F.col("current_ts"))
        .groupBy("o_orderkey")
        .agg(F.max_by("price", "ts_ms").alias("prev_price"))
    )
    return cur.join(prev, "o_orderkey", "left").select(
        "o_orderkey", "current_price", "prev_price", "current_ts", "n_versions"
    )


# ---------------------------------------------------------------------------
# Code-vs-prose detection — the corpus-curation signal that routes
# documents to the right dedup/quality/tokenizer stack (code shingles,
# indentation-preserving cleaning) instead of the prose one. Signals:
# code-symbol density via translate() deletion counting and indented-line
# counting over a split — both exact integers, map-only. A fifth of the
# docs get a deterministic synthesized code body so both classes exist.
# ---------------------------------------------------------------------------

@register(
    "text_code_detect",
    """
    WITH c AS (
      SELECT doc_id,
             CASE WHEN doc_id % 5 = 0
                  THEN 'def f_' || CAST(doc_id AS VARCHAR) || '(x):' || chr(10) ||
                       '  y = (x + ' || CAST(doc_id % 97 AS VARCHAR) || ');' || chr(10) ||
                       '  return {y};' || chr(10) || '  # end'
                  ELSE text END AS content
      FROM documents
    ),
    m AS (
      SELECT doc_id,
             length(content)::BIGINT AS n_chars,
             (length(content) - length(translate(content, '{}();=', '')))::BIGINT AS n_sym,
             len(list_filter(string_split(content, chr(10)),
                             l -> l LIKE '  %'))::BIGINT AS n_indent
      FROM c
    )
    SELECT doc_id, n_chars, n_sym, n_indent,
           ((n_sym * 5 + n_indent * 20) * 1000 // n_chars)::BIGINT AS score_milli,
           CASE WHEN (n_sym * 5 + n_indent * 20) * 1000 // n_chars >= 200
                THEN 1 ELSE 0 END AS is_code
    FROM m
    """,
    doc="code-vs-prose detector (curation routing signal): code-symbol "
        "density by translate()-deletion counting plus indented-line "
        "count, integer milli-score (5*symbols + 20*indents per char), "
        "threshold 0.2; a deterministic code body is synthesized for "
        "doc_id % 5 = 0 so both classes exist; map-only, zero shuffles",
)
def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    code_body = F.concat(
        F.lit("def f_"), F.col("doc_id").cast("string"), F.lit("(x):\n"),
        F.lit("  y = (x + "), (F.col("doc_id") % 97).cast("string"), F.lit(");\n"),
        F.lit("  return {y};\n  # end"),
    )
    c = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, code_body).otherwise(F.col("text")).alias("content"),
    )
    m = c.select(
        "doc_id",
        F.length("content").cast("long").alias("n_chars"),
        (
            F.length("content")
            - F.length(F.translate(F.col("content"), "{}();=", ""))
        ).cast("long").alias("n_sym"),
        F.size(
            F.filter(
                F.split(F.col("content"), "\n", -1),
                lambda l: l.startswith("  "),
            )
        ).cast("long").alias("n_indent"),
    )
    score = F.expr("((n_sym * 5 + n_indent * 20) * 1000) div n_chars")
    return m.select(
        "doc_id", "n_chars", "n_sym", "n_indent",
        score.cast("long").alias("score_milli"),
        F.when(score >= 200, 1).otherwise(0).alias("is_code"),
    )


# ---------------------------------------------------------------------------
# Rolling-origin forecast backtest — the eval harness every forecasting
# deployment needs: refit the smoother on data up to cutoff C, predict
# C+1, score against the actual — repeated over a cutoff grid. The
# smoother is the registered EWMA recurrence (identical seeded fold both
# engines: first element seeds, 0.25*v + 0.75*acc); per-(series, cutoff)
# history is a bounded day array, so the whole backtest is one join to
# the cutoff grid + one combinable aggregate.
# ---------------------------------------------------------------------------

@register(
    "analytic_forecast_backtest",
    """
    WITH daily AS (
      SELECT event_type,
             date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))::BIGINT AS d,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS y
      FROM events GROUP BY 1, 2
    ),
    grid AS (SELECT unnest([10, 15, 20]) AS cutoff),
    hist AS (
      SELECT dd.event_type, g.cutoff,
             list_reduce(list_transform(list(dd.y ORDER BY dd.d),
                                        v -> CAST(v AS DOUBLE)),
                         (acc, v) -> 0.25 * v + 0.75 * acc) AS pred,
             count(*)::BIGINT AS n_days
      FROM daily dd JOIN grid g ON dd.d <= g.cutoff
      GROUP BY dd.event_type, g.cutoff
    )
    SELECT h.event_type, CAST(h.cutoff AS BIGINT) AS cutoff, h.n_days, h.pred,
           CAST(a.y AS DOUBLE) AS actual,
           abs(h.pred - CAST(a.y AS DOUBLE)) AS abs_err
    FROM hist h
    JOIN daily a ON a.event_type = h.event_type AND a.d = h.cutoff + 1
    """,
    doc="rolling-origin backtest of the EWMA smoother (alpha=0.25, the "
        "registered recurrence): per (event type, cutoff in {10,15,20}) "
        "the fold over daily cent totals up to the cutoff predicts day "
        "cutoff+1, scored as |pred - actual|; history arrays are bounded "
        "by the day span, folds are seeded identically on both engines — "
        "one grid join + one combinable aggregate, no windows",
)
def analytic_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date"))
            .cast("long")
            .alias("d"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("event_type", "d")
        .agg(F.sum("cents").cast("long").alias("y"))
    )
    grid = spark.createDataFrame([(10,), (15,), (20,)], "cutoff int")
    hist = (
        daily.join(F.broadcast(grid), F.col("d") <= F.col("cutoff"))
        .groupBy("event_type", "cutoff")
        .agg(
            F.expr(
                "aggregate("
                "  slice(transform(array_sort(collect_list(struct(d, y))), x -> CAST(x.y AS DOUBLE)),"
                "        2, size(collect_list(struct(d, y))) - 1),"
                "  element_at(transform(array_sort(collect_list(struct(d, y))), x -> CAST(x.y AS DOUBLE)), 1),"
                "  (acc, v) -> 0.25D * v + 0.75D * acc)"
            ).alias("pred"),
            F.count("*").cast("long").alias("n_days"),
        )
    )
    actual = daily.select(
        F.col("event_type").alias("et_a"),
        F.col("d").alias("d_next"),
        F.col("y").alias("y_next"),
    )
    return (
        hist.join(
            actual,
            (F.col("event_type") == F.col("et_a"))
            & (F.col("d_next") == F.col("cutoff") + 1),
        )
        .select(
            "event_type",
            F.col("cutoff").cast("long").alias("cutoff"),
            "n_days",
            "pred",
            F.col("y_next").cast("double").alias("actual"),
            F.abs(F.col("pred") - F.col("y_next").cast("double")).alias("abs_err"),
        )
    )


# ---------------------------------------------------------------------------
# Capture-recapture corpus-size estimation (Lincoln-Petersen; Chapman's
# bias-corrected form) — how big is the reachable corpus when two
# independent crawls each see a sample of it? Two deterministic hash
# samples of the documents table play the crawls; the estimators are
# read beside the true count they are trying to recover.
# ---------------------------------------------------------------------------

@register(
    "analytic_capture_recapture",
    """
    WITH s AS (
      SELECT doc_id,
             CASE WHEN (('0x' || substr(md5('c1' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.4 THEN 1 ELSE 0 END AS in1,
             CASE WHEN (('0x' || substr(md5('c2' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.4 THEN 1 ELSE 0 END AS in2
      FROM documents
    )
    SELECT sum(in1)::BIGINT AS n1, sum(in2)::BIGINT AS n2,
           sum(in1 * in2)::BIGINT AS m, count(*)::BIGINT AS n_true,
           CAST(sum(in1) * sum(in2) AS DOUBLE) / CAST(sum(in1 * in2) AS DOUBLE)
             AS lp_est,
           CAST((sum(in1) + 1) * (sum(in2) + 1) AS DOUBLE)
             / CAST(sum(in1 * in2) + 1 AS DOUBLE) - 1.0 AS chapman_est
    FROM s
    """,
    doc="capture-recapture corpus-size estimation from two independent "
        "deterministic 40% hash crawls: Lincoln-Petersen n1*n2/m and "
        "Chapman's bias-corrected (n1+1)(n2+1)/(m+1)-1 beside the true "
        "count — exact integer marks, one combinable aggregate, single "
        "float divisions",
)
def analytic_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")

    def marked(salt: str):
        return F.when(
            F.conv(
                F.substring(F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))), 1, 8),
                16, 10,
            ).cast("long")
            / F.lit(4294967296.0)
            < 0.4,
            1,
        ).otherwise(0)

    s = docs.select(marked("c1").alias("in1"), marked("c2").alias("in2"))
    return s.agg(
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("m"),
        F.count("*").cast("long").alias("n_true"),
        (
            (F.sum("in1") * F.sum("in2")).cast("double")
            / F.sum(F.col("in1") * F.col("in2")).cast("double")
        ).alias("lp_est"),
        (
            ((F.sum("in1") + 1) * (F.sum("in2") + 1)).cast("double")
            / (F.sum(F.col("in1") * F.col("in2")) + 1).cast("double")
            - 1.0
        ).alias("chapman_est"),
    )


# ---------------------------------------------------------------------------
# STREAMING transaction-boundary CDC apply — the cross-microbatch twin of
# cdc_transactional_apply: a transaction whose events straddle
# microbatches must be HELD (not half-applied) and released atomically in
# the batch where its last event arrives. Implemented with foreachBatch +
# a pending-events parquet buffer: each batch unions pending with the new
# arrivals, releases transactions whose arrived count reaches the
# wire-carried expected count (Debezium tx-metadata total_order), and
# rewrites the survivors as the next pending set. applied_batch in the
# result records WHEN each transaction released — the oracle recomputes
# it as max(arrival batch) per tx, so the driver gate checks the release
# timing, not just the final state.
# ---------------------------------------------------------------------------

@register(
    "stream_cdc_transactional",
    """
    WITH ev AS (
      SELECT o_orderkey // 10 AS tx_id,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CASE WHEN o_orderkey % 17 <> 5 THEN 1 ELSE 2 END AS b
      FROM orders
    )
    SELECT tx_id, count(*)::BIGINT AS n_events,
           max(b)::BIGINT AS applied_batch,
           sum(cents)::BIGINT AS sum_cents
    FROM ev GROUP BY tx_id
    """,
    doc="streaming transaction-boundary CDC apply: events withheld from "
        "batch 1 (orderkey % 17 = 5) arrive in batch 2; foreachBatch holds "
        "incomplete transactions in a pending parquet buffer and releases "
        "each atomically when its arrived count reaches the wire-carried "
        "expected count; applied_batch is the data-derived max(arrival "
        "batch) per tx (the batch whose arrivals completed it), which the "
        "oracle recomputes independently — a release-completeness check; "
        "the actual foreachBatch epoch is recorded separately via "
        "epoch-keyed result AND pending paths: a retried microbatch "
        "re-reads its predecessor's pending buffer (immutable from its "
        "perspective) and overwrites only its own epoch partitions, so "
        "replay can neither double-release transactions nor double-count "
        "arrivals — at-least-once idempotence for the whole harness",
)
def stream_cdc_transactional(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    tx = F.expr("o_orderkey div 10")
    totals = orders.groupBy(tx.alias("tx_id")).agg(
        F.count("*").cast("long").alias("tx_total")
    )
    ev = (
        orders.select(
            F.col("o_orderkey").alias("k"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            tx.alias("tx_id"),
            F.when(F.col("o_orderkey") % 17 != 5, 1).otherwise(2).alias("arrival_batch"),
        )
        .join(F.broadcast(totals), "tx_id")
    )
    base = tempfile.mkdtemp(prefix="stream_tx_")
    seen: set[str] = set()
    ev.filter(F.col("arrival_batch") == 1).coalesce(1).write.mode("append").parquet(f"{base}/in")
    _pin_batch_order(f"{base}/in", seen, 1)
    ev.filter(F.col("arrival_batch") == 2).coalesce(1).write.mode("append").parquet(f"{base}/in")
    _pin_batch_order(f"{base}/in", seen, 2)
    pending_dir, results_dir = f"{base}/pending", f"{base}/results"
    # pending buffers are EPOCH-KEYED like the results: process(e) reads the
    # latest pending with epoch < e and writes pending/epoch=e, so a
    # RETRIED microbatch re-reads its predecessor's buffer (immutable from
    # its perspective) and overwrites only its own outputs — true
    # at-least-once idempotence, not just for the results write. Seed with
    # a zero-row epoch so the first batch (and the final
    # partition-discovery read) never sees a missing path.
    ev.limit(0).write.parquet(f"{pending_dir}/epoch=-1")
    spark.createDataFrame(
        [], "tx_id long, n_events long, applied_batch long, sum_cents long"
    ).write.parquet(f"{results_dir}/epoch=-1")

    import os as _os

    probe = _os.environ.get("SPARK_GRAFT_STREAM_PROBE") == "1"
    TX_STREAM_BATCHES.clear()

    def process(batch_df, epoch_id):
        import os as _os
        import time as _time

        e = int(epoch_id)
        s = batch_df.sparkSession
        # read the LATEST pending buffer strictly older than this epoch —
        # on a retry of epoch e, pending/epoch=e-1 is untouched by the
        # failed attempt (it only wrote epoch=e paths), so the recompute
        # sees exactly the attempt-1 inputs
        prev = max(
            int(d.split("=", 1)[1])
            for d in _os.listdir(pending_dir)
            if d.startswith("epoch=") and int(d.split("=", 1)[1]) < e
        )
        pending = s.read.parquet(f"{pending_dir}/epoch={prev}").drop("epoch")
        allev = pending.unionByName(batch_df)
        comp = allev.groupBy("tx_id", "tx_total").agg(
            F.count("*").cast("long").alias("n_arr"),
            F.max("arrival_batch").cast("long").alias("applied_batch"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        done = comp.filter(F.col("n_arr") == F.col("tx_total"))
        # epoch-keyed overwrite = idempotent under microbatch retry: a
        # replayed epoch rewrites its own partitions (results AND pending)
        # rather than appending a second copy or consuming its own output
        done.select(
            "tx_id",
            F.col("n_arr").alias("n_events"),
            "applied_batch",
            "sum_cents",
        ).write.mode("overwrite").parquet(f"{results_dir}/epoch={e}")
        rest = allev.join(done.select("tx_id"), "tx_id", "left_anti")
        _tr0 = _time.time()
        # no localCheckpoint needed: the write targets epoch=e, never the
        # epoch=prev path the plan reads from
        rest.write.mode("overwrite").parquet(f"{pending_dir}/epoch={e}")
        if probe:
            # probe-only observability (SPARK_GRAFT_STREAM_PROBE=1): the
            # pending-buffer rewrite must scale with PENDING size, never
            # total state — the 10x probe reads these rows as evidence;
            # counts cost extra jobs, so the bench path never pays them
            TX_STREAM_BATCHES.append(
                {
                    "epoch": e,
                    "n_batch": batch_df.count(),
                    "n_pending_out": s.read.parquet(f"{pending_dir}/epoch={e}").count(),
                    "pending_rewrite_s": round(_time.time() - _tr0, 3),
                }
            )

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/in")
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", f"{base}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # partition discovery surfaces the epoch column; drop it for the oracle
    # shape (the data-derived applied_batch is the cross-engine-checkable
    # release marker; epoch is the engine-side idempotence key)
    return spark.read.parquet(results_dir).select(
        "tx_id", "n_events", "applied_batch", "sum_cents"
    )


# ---------------------------------------------------------------------------
# Embedding centroid drift — the embeddings-QA gate when a corpus or
# encoder changes: compare the per-dimension centroids of two cohorts
# (hash-split halves here; in production, old vs new crawl or encoder
# v1 vs v2). Per-dimension sums are EXACT integers (micro-quantized
# components), so the centroids are exact rationals; the cosine between
# centroids and the L2 shift are in-row ordered folds over the 64
# dimension pairs — zero cross-row float accumulation anywhere.
# ---------------------------------------------------------------------------

@register(
    "sim_centroid_drift",
    """
    WITH s AS (
      SELECT CASE WHEN (('0x' || substr(md5('drift' || CAST(vec_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5 THEN 0 ELSE 1 END AS cohort,
             embedding
      FROM embeddings
    ),
    comp AS (
      SELECT s.cohort, u.i AS pos,
             CAST(round(s.embedding[u.i]::DOUBLE * 1000000) AS BIGINT) AS q
      FROM s, (SELECT unnest(generate_series(1, 64)) AS i) u
    ),
    dims AS (
      SELECT cohort, pos, sum(q)::BIGINT AS sq, count(*)::BIGINT AS n
      FROM comp GROUP BY cohort, pos
    ),
    wide AS (
      SELECT pos,
             max(CASE WHEN cohort = 0 THEN CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) END) AS c0,
             max(CASE WHEN cohort = 1 THEN CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) END) AS c1
      FROM dims GROUP BY pos
    ),
    folds AS (
      SELECT
        list_reduce(list_prepend(0.0, list(c0 * c1 ORDER BY pos)), (a, v) -> a + v) AS dot01,
        list_reduce(list_prepend(0.0, list(c0 * c0 ORDER BY pos)), (a, v) -> a + v) AS dot00,
        list_reduce(list_prepend(0.0, list(c1 * c1 ORDER BY pos)), (a, v) -> a + v) AS dot11,
        list_reduce(list_prepend(0.0, list((c0 - c1) * (c0 - c1) ORDER BY pos)), (a, v) -> a + v) AS d2,
        count(*)::BIGINT AS n_dims
      FROM wide
    )
    SELECT n_dims, dot01 / (sqrt(dot00) * sqrt(dot11)) AS centroid_cosine,
           sqrt(d2) AS l2_shift
    FROM folds
    """,
    doc="embedding centroid drift between two deterministic hash cohorts: "
        "per-dimension sums of micro-quantized components are exact longs "
        "(one posexplode + combinable groupBy), centroids exact rationals, "
        "cosine and L2 shift via ordered dimension-sorted folds — no "
        "cross-row float accumulation; the QA gate before swapping in a "
        "new encoder or crawl",
)
def sim_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cohort = F.when(
        F.conv(
            F.substring(F.md5(F.concat(F.lit("drift"), F.col("vec_id").cast("string"))), 1, 8),
            16, 10,
        ).cast("long")
        / F.lit(4294967296.0)
        < 0.5,
        0,
    ).otherwise(1)
    comp = emb.select(cohort.alias("cohort"), F.posexplode("embedding").alias("p0", "x")).select(
        "cohort",
        (F.col("p0") + 1).alias("pos"),
        F.round(F.col("x").cast("double") * 1000000).cast("long").alias("q"),
    )
    dims = comp.groupBy("cohort", "pos").agg(
        F.sum("q").cast("long").alias("sq"), F.count("*").cast("long").alias("n")
    )
    mean = F.expr("CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)")
    wide = dims.groupBy("pos").agg(
        F.max(F.when(F.col("cohort") == 0, mean)).alias("c0"),
        F.max(F.when(F.col("cohort") == 1, mean)).alias("c1"),
    )

    def fold(expr_col):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("pos"), expr_col.alias("v")))),
                lambda s: s["v"],
            ),
            F.lit(0.0),
            lambda a, v: a + v,
        )

    folds = wide.agg(
        fold(F.col("c0") * F.col("c1")).alias("dot01"),
        fold(F.col("c0") * F.col("c0")).alias("dot00"),
        fold(F.col("c1") * F.col("c1")).alias("dot11"),
        fold((F.col("c0") - F.col("c1")) * (F.col("c0") - F.col("c1"))).alias("d2"),
        F.count("*").cast("long").alias("n_dims"),
    )
    return folds.select(
        "n_dims",
        (F.col("dot01") / (F.sqrt("dot00") * F.sqrt("dot11"))).alias("centroid_cosine"),
        F.sqrt("d2").alias("l2_shift"),
    )


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney bigram scoring (Kneser & Ney, ICASSP'95; Chen &
# Goodman '98) — the smoothing that made n-gram LMs competitive and the
# upgrade over text_bigram_lm's add-one: mass discounted from seen
# bigrams is redistributed by CONTINUATION probability (how many distinct
# contexts a word follows), not raw frequency. Every count — bigram,
# context total, distinct continuations per context, distinct histories
# per word, total bigram types — is an exact integer; the probability is
# one shared float expression; count tables are vocabulary-bounded so
# they broadcast at any corpus size.
# ---------------------------------------------------------------------------

@register(
    "text_bigram_kneser_ney",
    """
    WITH tok AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents
    ),
    bg AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(w) - 1),
                                   i -> w[i] || ' ' || w[i + 1])) AS bigram
      FROM tok
    ),
    c2 AS (SELECT bigram, count(*)::BIGINT AS c2 FROM bg GROUP BY bigram),
    byw1 AS (
      SELECT split_part(bigram, ' ', 1) AS w1,
             sum(c2)::BIGINT AS c1, count(*)::BIGINT AS n1w1
      FROM c2 GROUP BY 1
    ),
    byw2 AS (
      SELECT split_part(bigram, ' ', 2) AS w2, count(*)::BIGINT AS n1w2
      FROM c2 GROUP BY 1
    ),
    t AS (SELECT count(*)::BIGINT AS t FROM c2),
    scored AS (
      SELECT bg.doc_id,
             ln(greatest(CAST(c2.c2 AS DOUBLE) - 0.75, 0.0) / CAST(byw1.c1 AS DOUBLE)
                + (0.75 * CAST(byw1.n1w1 AS DOUBLE) / CAST(byw1.c1 AS DOUBLE))
                  * (CAST(byw2.n1w2 AS DOUBLE) / CAST(t.t AS DOUBLE))) AS lp
      FROM bg
      JOIN c2 USING (bigram)
      JOIN byw1 ON byw1.w1 = split_part(bg.bigram, ' ', 1)
      JOIN byw2 ON byw2.w2 = split_part(bg.bigram, ' ', 2)
      CROSS JOIN t
    )
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           round(avg(lp), 6) AS kn_avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="interpolated Kneser-Ney bigram scoring (d=0.75): "
        "P = max(c2-d,0)/c1 + (d*N1+(w1.)/c1) * (N1+(.w2)/T) with every "
        "count an exact integer and the probability one shared float "
        "expression; per-doc mean log-prob rounded to 6 places (the "
        "text_bigram_lm contract) — count tables are vocabulary-bounded "
        "broadcasts, scoring is one map-side join pass + one "
        "groupBy(doc_id); the continuation-probability backoff is what "
        "add-one smoothing gets wrong on Zipfian corpora",
)
def text_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w"))
    bg = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                # zip_with(slice, slice): sequence(0, size-2) yields the
                # DESCENDING [0,-1] for 1-token docs and w[-1] throws under
                # Spark-4 ANSI; slices degrade to empty arrays instead
                "zip_with(slice(w, 1, greatest(size(w) - 1, 0)),"
                " slice(w, 2, greatest(size(w) - 1, 0)),"
                " (a, b) -> concat(a, ' ', b))"
            )
        ).alias("bigram"),
    )
    c2 = bg.groupBy("bigram").agg(F.count("*").cast("long").alias("c2"))
    byw1 = (
        c2.groupBy(F.expr("split_part(bigram, ' ', 1)").alias("w1"))
        .agg(F.sum("c2").cast("long").alias("c1"), F.count("*").cast("long").alias("n1w1"))
    )
    byw2 = (
        c2.groupBy(F.expr("split_part(bigram, ' ', 2)").alias("w2"))
        .agg(F.count("*").cast("long").alias("n1w2"))
    )
    t = c2.agg(F.count("*").cast("long").alias("t"))
    scored = (
        bg.join(F.broadcast(c2), "bigram")
        .withColumn("w1", F.expr("split_part(bigram, ' ', 1)"))
        .withColumn("w2", F.expr("split_part(bigram, ' ', 2)"))
        .join(F.broadcast(byw1), "w1")
        .join(F.broadcast(byw2), "w2")
        .crossJoin(F.broadcast(t))
        .select(
            "doc_id",
            F.expr(
                "ln(greatest(CAST(c2 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE)"
                "   + (0.75 * CAST(n1w1 AS DOUBLE) / CAST(c1 AS DOUBLE))"
                "     * (CAST(n1w2 AS DOUBLE) / CAST(t AS DOUBLE)))"
            ).alias("lp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("kn_avg_logprob"),
    )


# ---------------------------------------------------------------------------
# One-way ANOVA F-statistic — the k-group generalization of the Welch
# 2-group test already in the registry: does order priority explain
# total-price variance? Per-group power sums are exact longs in ONE
# combinable pass; the between/within sums of squares derive from shared
# float expressions (group sums squared in DOUBLE to dodge the long
# overflow the integer form would hit at ~3e10-cent group sums); the
# cross-group reduction is an ordered fold.
# ---------------------------------------------------------------------------

@register(
    "analytic_anova_oneway",
    """
    WITH g AS (
      SELECT o_orderpriority AS grp, count(*)::BIGINT AS n_g,
             sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS s1,
             sum(CAST(round(o_totalprice * 100) AS BIGINT)
                 * CAST(round(o_totalprice * 100) AS BIGINT)) AS s2
      FROM orders GROUP BY 1
    ),
    terms AS (
      SELECT grp, n_g, s1, s2,
             CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE) AS gterm
      FROM g
    ),
    tot AS (
      SELECT count(*)::BIGINT AS k, sum(n_g)::BIGINT AS n,
             sum(s1)::BIGINT AS s1_tot, sum(s2) AS s2_tot,
             list_reduce(list_prepend(0.0, list(gterm ORDER BY grp)),
                         (acc, v) -> acc + v) AS gterm_sum
      FROM terms
    )
    SELECT k, n,
           gterm_sum - CAST(s1_tot AS DOUBLE) * CAST(s1_tot AS DOUBLE)
                         / CAST(n AS DOUBLE) AS ssb,
           CAST(s2_tot AS DOUBLE) - gterm_sum AS ssw,
           (gterm_sum - CAST(s1_tot AS DOUBLE) * CAST(s1_tot AS DOUBLE)
                          / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE)
             / ((CAST(s2_tot AS DOUBLE) - gterm_sum) / CAST(n - k AS DOUBLE))
             AS f_stat
    FROM tot
    """,
    doc="one-way ANOVA F over order-priority groups (k-group companion to "
        "analytic_welch_ttest): exact long power sums in one combinable "
        "pass, between/within sums of squares from shared float "
        "expressions (group sums squared in DOUBLE — the integer square "
        "would overflow at ~3e10-cent group sums), ordered fold across the "
        "bounded groups, F = (SSB/(k-1))/(SSW/(n-k))",
)
def analytic_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    # cents-squared sums overflow int64 past ~3e18; DECIMAL(38,0) on the
    # engine side mirrors DuckDB's automatic HUGEINT sum — both exact
    g = orders.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count("*").cast("long").alias("n_g"),
        F.sum(y).cast("long").alias("s1"),
        F.sum((y * y).cast("decimal(38,0)")).alias("s2"),
    )
    terms = g.withColumn(
        "gterm",
        F.expr("CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n_g AS DOUBLE)"),
    )
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("grp"), F.col("gterm")))),
        lambda s: s["gterm"],
    )
    tot = terms.agg(
        F.count("*").cast("long").alias("k"),
        F.sum("n_g").cast("long").alias("n"),
        F.sum("s1").cast("long").alias("s1_tot"),
        F.sum("s2").alias("s2_tot"),  # decimal — casting to long would overflow
        F.aggregate(ordered, F.lit(0.0), lambda acc, v: acc + v).alias("gterm_sum"),
    )
    ssb = F.expr(
        "gterm_sum - CAST(s1_tot AS DOUBLE) * CAST(s1_tot AS DOUBLE) / CAST(n AS DOUBLE)"
    )
    ssw = F.expr("CAST(s2_tot AS DOUBLE) - gterm_sum")
    return tot.select(
        "k", "n",
        ssb.alias("ssb"),
        ssw.alias("ssw"),
        (ssb / F.expr("CAST(k - 1 AS DOUBLE)") / (ssw / F.expr("CAST(n - k AS DOUBLE)"))).alias("f_stat"),
    )


# ---------------------------------------------------------------------------
# Bitemporal snapshot — valid time AND transaction time (Snodgrass; SQL:2011
# system versioning): "what did we BELIEVE the value valid at V was, as of
# transaction time T?" Late corrections change the answer for T after the
# correction commits but never rewrite what earlier snapshots reported —
# the audit property plain SCD2 (valid time only) cannot express. Same
# change-event synthesis as the SCD2 family plus a late correction wave;
# both snapshots computed with key-grouped max_by aggregates, no windows.
# ---------------------------------------------------------------------------

@register(
    "cdc_bitemporal_snapshot",
    """
    WITH base AS (
      SELECT o_orderkey,
             CAST(unnest(generate_series(0, o_orderkey % 3)) AS BIGINT) AS version,
             o_totalprice
      FROM orders
    ),
    rows_v AS (
      SELECT o_orderkey, version,
             o_totalprice + 100 * version AS price,
             (version + 1) * 1000 AS valid_from,
             (version + 1) * 1000 AS tx_from
      FROM base
      UNION ALL
      -- late correction committed at tx 5000: +7 on version 1 for a slice
      SELECT o_orderkey, 1, o_totalprice + 107, 2000, 5000
      FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 3 >= 1
    ),
    picked AS (
      SELECT o_orderkey, max(version)::BIGINT AS v
      FROM rows_v WHERE valid_from <= 2500 GROUP BY o_orderkey
    ),
    vrows AS (
      SELECT r.o_orderkey, p.v, r.price, r.tx_from
      FROM rows_v r JOIN picked p
        ON p.o_orderkey = r.o_orderkey AND r.version = p.v
    ),
    t45 AS (
      SELECT o_orderkey, arg_max(price, tx_from) AS price_t4500
      FROM vrows WHERE tx_from <= 4500 GROUP BY o_orderkey
    ),
    t60 AS (
      SELECT o_orderkey, arg_max(price, tx_from) AS price_t6000
      FROM vrows WHERE tx_from <= 6000 GROUP BY o_orderkey
    )
    SELECT a.o_orderkey, p.v AS version_picked, a.price_t4500, b.price_t6000,
           CASE WHEN b.price_t6000 <> a.price_t4500 THEN 1 ELSE 0 END AS corrected
    FROM t45 a
    JOIN t60 b ON b.o_orderkey = a.o_orderkey
    JOIN picked p ON p.o_orderkey = a.o_orderkey
    """,
    doc="bitemporal (valid time x transaction time) snapshot: the version "
        "valid at V=2500, read as of transaction times T=4500 and T=6000 — "
        "a late correction committed at tx 5000 changes the second answer "
        "but can never rewrite the first (the audit property plain SCD2 "
        "lacks); version pick and both reads are key-grouped max/max_by "
        "aggregates, zero windows",
)
def cdc_bitemporal_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    versions = F.sequence(F.lit(0), (F.col("o_orderkey") % 3).cast("int"))
    base = orders.select(
        "o_orderkey", "o_totalprice", F.explode(versions).alias("version")
    ).select(
        "o_orderkey",
        F.col("version").cast("long").alias("version"),
        (F.col("o_totalprice") + 100 * F.col("version")).alias("price"),
        ((F.col("version") + 1) * 1000).cast("long").alias("valid_from"),
        ((F.col("version") + 1) * 1000).cast("long").alias("tx_from"),
    )
    correction = orders.filter(
        (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 3 >= 1)
    ).select(
        "o_orderkey",
        F.lit(1).cast("long").alias("version"),
        (F.col("o_totalprice") + 107).alias("price"),
        F.lit(2000).cast("long").alias("valid_from"),
        F.lit(5000).cast("long").alias("tx_from"),
    )
    rows_v = base.unionByName(correction)
    picked = (
        rows_v.filter(F.col("valid_from") <= 2500)
        .groupBy("o_orderkey")
        .agg(F.max("version").cast("long").alias("v"))
    )
    pick2 = picked.select(F.col("o_orderkey").alias("pk"), "v")
    vrows = rows_v.join(
        pick2,
        (F.col("o_orderkey") == F.col("pk")) & (F.col("version") == F.col("v")),
    ).select("o_orderkey", "v", "price", "tx_from")
    t45 = (
        vrows.filter(F.col("tx_from") <= 4500)
        .groupBy("o_orderkey")
        .agg(F.max_by("price", "tx_from").alias("price_t4500"))
    )
    t60 = (
        vrows.filter(F.col("tx_from") <= 6000)
        .groupBy("o_orderkey")
        .agg(F.max_by("price", "tx_from").alias("price_t6000"))
    )
    return (
        t45.join(t60, "o_orderkey")
        .join(picked, "o_orderkey")
        .select(
            "o_orderkey",
            F.col("v").alias("version_picked"),
            "price_t4500",
            "price_t6000",
            F.when(F.col("price_t6000") != F.col("price_t4500"), 1)
            .otherwise(0)
            .alias("corrected"),
        )
    )


# ---------------------------------------------------------------------------
# Qini uplift curve — the eval for uplift/incrementality models (Radcliffe
# 2007): rank by model score, and per cumulative decile read how many
# extra responders the TREATED arm produced over the control arm scaled
# to its size. Completes the model-eval family: AUC ranks, ECE calibrates,
# lift counts responders, Qini counts CAUSED responders. Per-row ranks
# via the two-level device; cumulative arms via the 10-row triangular
# broadcast join; every count exact.
# ---------------------------------------------------------------------------

@register(
    "analytic_qini_uplift",
    """
    WITH s AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey,
             CASE WHEN (('0x' || substr(md5('qini' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5 THEN 1 ELSE 0 END AS treated,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS resp
      FROM orders
    ),
    ranked AS (
      SELECT treated, resp,
             row_number() OVER (ORDER BY cents DESC, o_orderkey ASC) AS rk,
             count(*) OVER () AS n
      FROM s
    ),
    dec AS (
      SELECT ((rk - 1) * 10) // n AS decile,
             sum(treated)::BIGINT AS n_t,
             sum(treated * resp)::BIGINT AS r_t,
             sum(1 - treated)::BIGINT AS n_c,
             sum((1 - treated) * resp)::BIGINT AS r_c
      FROM ranked GROUP BY 1
    ),
    cum AS (
      SELECT d1.decile,
             sum(d2.n_t)::BIGINT AS cum_nt, sum(d2.r_t)::BIGINT AS cum_rt,
             sum(d2.n_c)::BIGINT AS cum_nc, sum(d2.r_c)::BIGINT AS cum_rc
      FROM dec d1 JOIN dec d2 ON d2.decile <= d1.decile GROUP BY d1.decile
    )
    SELECT decile, cum_nt, cum_rt, cum_nc, cum_rc,
           CAST(cum_rt AS DOUBLE)
             - CAST(cum_rc AS DOUBLE) * (CAST(cum_nt AS DOUBLE) / CAST(cum_nc AS DOUBLE))
             AS qini
    FROM cum
    """,
    doc="Qini uplift curve on the hashed treatment split: per cumulative "
        "score decile (per-row ranks from the two-level bucket prefix sum) "
        "the treated responders minus control responders scaled to the "
        "treated arm size — the incrementality the campaign CAUSED; exact "
        "integer arm counts, 10-row triangular broadcast cumulative, one "
        "float expression per row",
)
def analytic_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    orders = load_table(spark, sf_dir, "orders")
    treated = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("qini"), F.col("o_orderkey").cast("string"))), 1, 8), 16, 10)
        .cast("long") / F.lit(4294967296.0)
        < 0.5,
        1,
    ).otherwise(0)
    s = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        "o_orderkey",
        treated.alias("treated"),
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
        .otherwise(0)
        .alias("resp"),
    )
    ranked = two_level_order(s, key_col="cents", tie_col="o_orderkey")
    n1 = s.agg(F.count("*").cast("long").alias("n"))
    dec = (
        ranked.crossJoin(F.broadcast(n1))
        .select(F.expr("((rk - 1) * 10) div n").alias("decile"), "treated", "resp")
        .groupBy("decile")
        .agg(
            F.sum("treated").cast("long").alias("n_t"),
            F.sum(F.col("treated") * F.col("resp")).cast("long").alias("r_t"),
            F.sum(1 - F.col("treated")).cast("long").alias("n_c"),
            F.sum((1 - F.col("treated")) * F.col("resp")).cast("long").alias("r_c"),
        )
    )
    d2 = dec.select(
        F.col("decile").alias("d2"),
        F.col("n_t").alias("nt2"), F.col("r_t").alias("rt2"),
        F.col("n_c").alias("nc2"), F.col("r_c").alias("rc2"),
    )
    cum = (
        dec.join(F.broadcast(d2), F.col("d2") <= F.col("decile"))
        .groupBy("decile")
        .agg(
            F.sum("nt2").cast("long").alias("cum_nt"),
            F.sum("rt2").cast("long").alias("cum_rt"),
            F.sum("nc2").cast("long").alias("cum_nc"),
            F.sum("rc2").cast("long").alias("cum_rc"),
        )
    )
    return cum.select(
        "decile", "cum_nt", "cum_rt", "cum_nc", "cum_rc",
        (
            F.col("cum_rt").cast("double")
            - F.col("cum_rc").cast("double")
            * (F.col("cum_nt").cast("double") / F.col("cum_nc").cast("double"))
        ).alias("qini"),
    )


# ---------------------------------------------------------------------------
# Resource-allocation link prediction (Zhou, Lu & Zhang, Eur. Phys. J. B
# 2009) — the degree-penalized sibling of the registered Jaccard link
# prediction: each common neighbor contributes 1/deg(z), so shared LOW-
# degree neighbors dominate (a rare mutual contact is stronger evidence
# than a hub). The weight is carried as the EXACT integer 1000000 div
# deg(z), so the per-pair sum is an ordinary long aggregation — no float
# accumulation, no cross-engine sum-order hazard. Same hub cap and
# capped-world degree discipline as graph_jaccard_linkpred.
# ---------------------------------------------------------------------------

@register(
    "graph_resource_allocation",
    """
    WITH raw AS (
      SELECT DISTINCT least(o_custkey % 400, o_orderkey % 400) AS a,
             greatest(o_custkey % 400, o_orderkey % 400) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 400 <> o_orderkey % 400
    ),
    adj AS (
      SELECT a AS n, b AS m FROM raw UNION ALL SELECT b, a FROM raw
    ),
    deg AS (SELECT n, count(*)::BIGINT AS deg FROM adj GROUP BY n),
    keep AS (SELECT n FROM deg WHERE deg <= 100),
    capped AS (
      SELECT adj.n, adj.m FROM adj
      JOIN keep k1 ON k1.n = adj.n
      JOIN keep k2 ON k2.n = adj.m
    ),
    cdeg AS (SELECT n, count(*)::BIGINT AS deg FROM capped GROUP BY n),
    wedges AS (
      SELECT l.m AS node_a, r.m AS node_b, (1000000 // d.deg)::BIGINT AS w
      FROM capped l
      JOIN capped r ON r.n = l.n AND l.m < r.m
      JOIN cdeg d ON d.n = l.n
    ),
    scored AS (
      SELECT node_a, node_b, count(*)::BIGINT AS n_common,
             sum(w)::BIGINT AS ra_micro
      FROM wedges GROUP BY node_a, node_b
      HAVING count(*) >= 2
    )
    SELECT s.node_a, s.node_b, s.n_common, s.ra_micro
    FROM scored s
    LEFT JOIN raw e ON e.a = s.node_a AND e.b = s.node_b
    WHERE e.a IS NULL
    """,
    doc="resource-allocation link prediction (Zhou-Lu-Zhang 2009): "
        "non-adjacent pairs scored by sum over common neighbors of "
        "1/deg(z), carried as the exact integer 1000000 div deg(z) so the "
        "aggregation is pure long arithmetic; hubs (deg > 100) removed "
        "before the wedge expansion and degrees recomputed on the capped "
        "world (the graph_jaccard_linkpred discipline); predicts NEW links "
        "only (adjacent pairs anti-joined away), min 2 common neighbors",
)
def graph_resource_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.col("o_custkey") % 400
    b = F.col("o_orderkey") % 400
    raw = (
        orders.filter((F.col("o_orderkey") % 3 == 0) & (a != b))
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    adj = raw.select(F.col("a").alias("n"), F.col("b").alias("m")).unionAll(
        raw.select(F.col("b").alias("n"), F.col("a").alias("m"))
    )
    deg = adj.groupBy("n").agg(F.count("*").cast("long").alias("deg"))
    keep = deg.filter(F.col("deg") <= 100).select("n")
    capped = adj.join(keep, "n", "left_semi").join(
        keep.select(F.col("n").alias("m")), "m", "left_semi"
    )
    cdeg = capped.groupBy("n").agg(F.count("*").cast("long").alias("deg"))
    l = capped.select(F.col("n").alias("c"), F.col("m").alias("x"))
    r = capped.select(F.col("n").alias("c"), F.col("m").alias("y"))
    wedges = (
        l.join(r, "c")
        .filter(F.col("x") < F.col("y"))
        .join(cdeg.select(F.col("n").alias("c"), "deg"), "c")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.expr("1000000 div deg").cast("long").alias("w"),
        )
    )
    scored = (
        wedges.groupBy("node_a", "node_b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("w").cast("long").alias("ra_micro"),
        )
        .filter(F.col("n_common") >= 2)
    )
    return scored.join(
        raw.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )


# ---------------------------------------------------------------------------
# SSIM (Wang et al., IEEE TIP 2004) between each image and its 3x3
# integer box blur — the reference-vs-degraded quality metric of every
# image-processing QA loop, here measuring exactly how much structure
# the blur destroys. The Arrow kernel ships only EXACT integer sums
# (floor-div blur, no float in the decode path); SSIM is one shared
# float expression over the six longs; the oracle replays the blur
# tap-for-tap from the same deterministic raster and value-checks the
# blurred-sequence md5.
# ---------------------------------------------------------------------------

def _ssim_box_tap_sum() -> str:
    taps = " + ".join(
        _sobel_tap(dr, dc) for dr in (-1, 0, 1) for dc in (-1, 0, 1)
    )
    return f"(({taps}) // 9)"


_SSIM_EXPR = (
    "((2.0 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    " * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) + 6.5025)"
    " * (2.0 * (CAST(sxy AS DOUBLE) / CAST(n AS DOUBLE)"
    "    - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    "      * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) + 58.5225))"
    " / (((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    "     * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    "   + (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
    "     * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) + 6.5025)"
    "  * ((CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)"
    "      - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
    "        * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)))"
    "   + (CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)"
    "      - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))"
    "        * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) + 58.5225))"
)


@register(
    "mm_image_ssim_blur",
    f"""
    WITH {_MM_RASTER_CTE},
    pix AS (
      SELECT doc_id, rr.r, cc.c,
             {_sobel_tap(0, 0)} AS x,
             {_ssim_box_tap_sum()} AS y
      FROM r, (VALUES (1), (2)) rr(r),
           unnest(generate_series(1, w - 2)) AS cc(c)
    ),
    st AS (
      SELECT doc_id AS media_id,
             count(*)::BIGINT AS n,
             sum(x)::BIGINT AS sx, sum(y)::BIGINT AS sy,
             sum(x * x)::BIGINT AS sxx, sum(y * y)::BIGINT AS syy,
             sum(x * y)::BIGINT AS sxy,
             md5(string_agg(y::VARCHAR, ',' ORDER BY r, c)) AS blur_md5
      FROM pix GROUP BY doc_id
    )
    SELECT media_id, n, sx, sy, sxx, syy, sxy, blur_md5,
           {_SSIM_EXPR} AS ssim
    FROM st
    """,
    doc="SSIM between each image and its 3x3 integer box blur (Wang TIP'04 "
        "global form, C1=6.5025 C2=58.5225) through the real PPM decode: "
        "Arrow kernel ships exact integer sums only (blur = floor-div 9), "
        "SSIM is one shared float expression over the six longs, oracle "
        "replays the 9-tap blur and value-checks the blurred-sequence md5; "
        "map-only at any scale — the quality readout that says how much "
        "structure a degradation destroyed",
)
def mm_image_ssim_blur(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    st = M.ssim_self_blur_stats(media)
    return st.select(
        "media_id", "n", "sx", "sy", "sxx", "syy", "sxy", "blur_md5",
        F.expr(_SSIM_EXPR).alias("ssim"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation — the robust monotone-association readout
# (Pearson on ranks): does order value track order size? Tie-corrected
# average ranks come from the SAME doubled-rank device as analytic_auc_roc
# (grouped distinct values -> cumulative counts -> 2*avg_rank exact
# integers, joined back per row), on BOTH variables; the Pearson
# combination runs on exact sums (squares in DECIMAL/HUGEINT — doubled
# ranks square past int64 at ~1e6 rows) with one float expression.
# ---------------------------------------------------------------------------

@register(
    "analytic_spearman_corr",
    """
    WITH pair AS (
      SELECT o.o_orderkey,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS x,
             count(*)::BIGINT AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, o.o_totalprice
    ),
    gx AS (
      SELECT x, count(*)::BIGINT AS cnt,
             (sum(count(*)) OVER (ORDER BY x))::BIGINT AS cum
      FROM pair GROUP BY x
    ),
    gy AS (
      SELECT y, count(*)::BIGINT AS cnt,
             (sum(count(*)) OVER (ORDER BY y))::BIGINT AS cum
      FROM pair GROUP BY y
    ),
    ranked AS (
      SELECT (2 * (gx.cum - gx.cnt) + gx.cnt + 1) AS a,
             (2 * (gy.cum - gy.cnt) + gy.cnt + 1) AS b
      FROM pair JOIN gx ON gx.x = pair.x JOIN gy ON gy.y = pair.y
    ),
    s AS (
      SELECT count(*)::BIGINT AS n,
             sum(a)::BIGINT AS sa, sum(b)::BIGINT AS sb,
             sum(a * a) AS saa, sum(b * b) AS sbb, sum(a * b) AS sab
      FROM ranked
    )
    SELECT n,
           (CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)
              - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)
                     - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)
                       - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS spearman_rho
    FROM s
    """,
    doc="Spearman rank correlation between order value (cents) and order "
        "size (lineitem count): tie-corrected average ranks as exact "
        "doubled integers via the grouped-distinct cumulative device on "
        "both variables (engine side uses the two-level bucket prefix sum "
        "— no single-partition sort), Pearson combination on exact sums "
        "(squared-rank sums in DECIMAL/HUGEINT), one float expression",
)
def analytic_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import two_level_order

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pair = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_totalprice")
        .agg(F.count("*").cast("long").alias("y"))
        .select(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("x"), "y"
        )
    )

    def rank2(df, col):
        g = df.groupBy(col).agg(F.count("*").cast("long").alias("cnt"))
        r = two_level_order(
            g.withColumn("neg", -F.col(col)), key_col="neg", tie_col=col, val_col="cnt"
        )
        return r.select(
            col, (2 * (F.col("cum") - F.col("cnt")) + F.col("cnt") + 1).alias(f"r2_{col}")
        )

    ranked = pair.join(F.broadcast(rank2(pair, "x")), "x").join(
        F.broadcast(rank2(pair, "y")), "y"
    )
    a, b = F.col("r2_x"), F.col("r2_y")
    s = ranked.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(a).cast("long").alias("sa"),
        F.sum(b).cast("long").alias("sb"),
        F.sum((a * a).cast("decimal(38,0)")).alias("saa"),
        F.sum((b * b).cast("decimal(38,0)")).alias("sbb"),
        F.sum((a * b).cast("decimal(38,0)")).alias("sab"),
    )
    return s.select(
        "n",
        F.expr(
            "(CAST(n AS DOUBLE) * CAST(sab AS DOUBLE)"
            "   - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))"
            " / sqrt((CAST(n AS DOUBLE) * CAST(saa AS DOUBLE)"
            "           - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))"
            "        * (CAST(n AS DOUBLE) * CAST(sbb AS DOUBLE)"
            "             - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)))"
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Schema-registry compatibility audit — the governance gate in front of
# every CDC/DDL pipeline (Avro/registry semantics): per subject, classify
# the v0 -> v1 transition by what changed. Added OPTIONAL fields and
# dropped OPTIONAL fields keep FULL compatibility; an added REQUIRED
# field breaks backward (a new reader cannot fill it from old data) but
# not forward; a dropped REQUIRED field breaks forward (an old reader
# still demands it) but not backward. Set algebra over a full-outer
# field join per subject — exact, combinable, no windows.
# ---------------------------------------------------------------------------

@register(
    "cdc_schema_compat_audit",
    """
    WITH subj AS (SELECT DISTINCT doc_id % 100 AS subject FROM documents),
    v0 AS (
      SELECT subject, f.field, f.required
      FROM subj, (VALUES ('f0', 1), ('f1', 1), ('f2', 1), ('f3', 0), ('f4', 0))
                   f(field, required)
    ),
    v1 AS (
      SELECT subject, field, required FROM v0
      WHERE NOT (subject % 3 = 2 AND field = 'f2')
      UNION ALL
      SELECT subject, 'f5', 0 FROM subj WHERE subject % 3 = 0
      UNION ALL
      SELECT subject, 'f6', 1 FROM subj WHERE subject % 3 = 1
    ),
    diff AS (
      SELECT coalesce(a.subject, b.subject) AS subject,
             sum(CASE WHEN a.field IS NULL AND b.required = 0 THEN 1 ELSE 0 END)::BIGINT AS n_added_opt,
             sum(CASE WHEN a.field IS NULL AND b.required = 1 THEN 1 ELSE 0 END)::BIGINT AS n_added_req,
             sum(CASE WHEN b.field IS NULL AND a.required = 0 THEN 1 ELSE 0 END)::BIGINT AS n_dropped_opt,
             sum(CASE WHEN b.field IS NULL AND a.required = 1 THEN 1 ELSE 0 END)::BIGINT AS n_dropped_req
      FROM v0 a FULL OUTER JOIN v1 b
        ON a.subject = b.subject AND a.field = b.field
      GROUP BY 1
    )
    SELECT subject, n_added_opt, n_added_req, n_dropped_opt, n_dropped_req,
           CASE WHEN n_added_req = 0 AND n_dropped_req = 0 THEN 'FULL'
                WHEN n_added_req > 0 AND n_dropped_req = 0 THEN 'FORWARD'
                WHEN n_added_req = 0 AND n_dropped_req > 0 THEN 'BACKWARD'
                ELSE 'NONE' END AS compat
    FROM diff
    """,
    doc="schema-registry compatibility audit (Avro semantics) per subject "
        "for the v0 -> v1 transition: added/dropped optional fields keep "
        "FULL compatibility, an added required field leaves only FORWARD, "
        "a dropped required field leaves only BACKWARD; classification by "
        "a full-outer field join + one combinable aggregate per subject — "
        "the gate a DDL-applying CDC consumer runs before accepting a new "
        "schema version",
)
def cdc_schema_compat_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    subj = docs.select((F.col("doc_id") % 100).alias("subject")).distinct()
    fields0 = spark.createDataFrame(
        [("f0", 1), ("f1", 1), ("f2", 1), ("f3", 0), ("f4", 0)],
        "field string, required int",
    )
    v0 = subj.crossJoin(F.broadcast(fields0))
    v1 = (
        v0.filter(~((F.col("subject") % 3 == 2) & (F.col("field") == "f2")))
        .unionByName(
            subj.filter(F.col("subject") % 3 == 0).select(
                "subject", F.lit("f5").alias("field"), F.lit(0).alias("required")
            )
        )
        .unionByName(
            subj.filter(F.col("subject") % 3 == 1).select(
                "subject", F.lit("f6").alias("field"), F.lit(1).alias("required")
            )
        )
    )
    a = v0.select(
        F.col("subject").alias("s_a"), F.col("field").alias("f_a"),
        F.col("required").alias("req_a"),
    )
    b = v1.select(
        F.col("subject").alias("s_b"), F.col("field").alias("f_b"),
        F.col("required").alias("req_b"),
    )
    diff = (
        a.join(b, (a.s_a == b.s_b) & (a.f_a == b.f_b), "full_outer")
        .select(
            F.coalesce("s_a", "s_b").alias("subject"),
            F.when(F.col("f_a").isNull() & (F.col("req_b") == 0), 1).otherwise(0).alias("ao"),
            F.when(F.col("f_a").isNull() & (F.col("req_b") == 1), 1).otherwise(0).alias("ar"),
            F.when(F.col("f_b").isNull() & (F.col("req_a") == 0), 1).otherwise(0).alias("do_"),
            F.when(F.col("f_b").isNull() & (F.col("req_a") == 1), 1).otherwise(0).alias("dr"),
        )
        .groupBy("subject")
        .agg(
            F.sum("ao").cast("long").alias("n_added_opt"),
            F.sum("ar").cast("long").alias("n_added_req"),
            F.sum("do_").cast("long").alias("n_dropped_opt"),
            F.sum("dr").cast("long").alias("n_dropped_req"),
        )
    )
    return diff.select(
        "subject", "n_added_opt", "n_added_req", "n_dropped_opt", "n_dropped_req",
        F.when((F.col("n_added_req") == 0) & (F.col("n_dropped_req") == 0), "FULL")
        .when((F.col("n_added_req") > 0) & (F.col("n_dropped_req") == 0), "FORWARD")
        .when((F.col("n_added_req") == 0) & (F.col("n_dropped_req") > 0), "BACKWARD")
        .otherwise("NONE")
        .alias("compat"),
    )


# ---------------------------------------------------------------------------
# Mantel-Haenszel pooled odds ratio (Mantel & Haenszel, JNCI 1959) — the
# stratified 2x2 association estimator that answers "is the exposure
# effect real once the confounder is stratified out?" (Simpson's-paradox
# insurance). Per order-year stratum the 2x2 cells are exact integers in
# one combinable pass; OR_MH = sum(a*d/n) / sum(b*c/n) with per-stratum
# terms as single divisions and the cross-strata sums as ordered folds;
# the crude (unstratified) OR sits beside it so the confounding readout
# is the comparison itself.
# ---------------------------------------------------------------------------

@register(
    "analytic_mantel_haenszel",
    """
    WITH x AS (
      SELECT CAST(extract(year FROM o_orderdate) AS BIGINT) AS stratum,
             CASE WHEN (('0x' || substr(md5('mh' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5 THEN 1 ELSE 0 END AS exposed,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS outcome
      FROM orders
    ),
    s AS (
      SELECT stratum,
             sum(exposed * outcome)::BIGINT AS a,
             sum(exposed * (1 - outcome))::BIGINT AS b,
             sum((1 - exposed) * outcome)::BIGINT AS c,
             sum((1 - exposed) * (1 - outcome))::BIGINT AS d
      FROM x GROUP BY stratum
    ),
    terms AS (
      SELECT stratum, a, b, c, d, (a + b + c + d) AS n,
             CAST(a * d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS ad_n,
             CAST(b * c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE) AS bc_n
      FROM s
    ),
    tot AS (
      SELECT count(*)::BIGINT AS n_strata,
             sum(a)::BIGINT AS a_tot, sum(b)::BIGINT AS b_tot,
             sum(c)::BIGINT AS c_tot, sum(d)::BIGINT AS d_tot,
             list_reduce(list_prepend(0.0, list(ad_n ORDER BY stratum)),
                         (acc, v) -> acc + v) AS ad_sum,
             list_reduce(list_prepend(0.0, list(bc_n ORDER BY stratum)),
                         (acc, v) -> acc + v) AS bc_sum
      FROM terms
    )
    SELECT n_strata, a_tot, b_tot, c_tot, d_tot,
           CAST(a_tot * d_tot AS DOUBLE) / CAST(b_tot * c_tot AS DOUBLE) AS or_crude,
           ad_sum / bc_sum AS or_mh
    FROM tot
    """,
    doc="Mantel-Haenszel pooled odds ratio across order-year strata "
        "(exposure = hashed split, outcome = status F): exact integer 2x2 "
        "cells in one combinable pass, OR_MH = sum(ad/n)/sum(bc/n) with "
        "ordered folds over the bounded strata, crude OR beside it — the "
        "Simpson's-paradox-proof association readout; a*d stays within "
        "int64 to ~3e9-row strata (cells are counts)",
)
def analytic_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    exposed = F.when(
        F.conv(F.substring(F.md5(F.concat(F.lit("mh"), F.col("o_orderkey").cast("string"))), 1, 8), 16, 10)
        .cast("long") / F.lit(4294967296.0)
        < 0.5,
        1,
    ).otherwise(0)
    x = orders.select(
        F.year("o_orderdate").cast("long").alias("stratum"),
        exposed.alias("exposed"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("outcome"),
    )
    s = x.groupBy("stratum").agg(
        F.sum(F.col("exposed") * F.col("outcome")).cast("long").alias("a"),
        F.sum(F.col("exposed") * (1 - F.col("outcome"))).cast("long").alias("b"),
        F.sum((1 - F.col("exposed")) * F.col("outcome")).cast("long").alias("c"),
        F.sum((1 - F.col("exposed")) * (1 - F.col("outcome"))).cast("long").alias("d"),
    )
    terms = s.select(
        "stratum", "a", "b", "c", "d",
        F.expr("CAST(a * d AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)").alias("ad_n"),
        F.expr("CAST(b * c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)").alias("bc_n"),
    )

    def fold(col):
        return F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("stratum"), F.col(col).alias("v")))),
                lambda st: st["v"],
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    tot = terms.agg(
        F.count("*").cast("long").alias("n_strata"),
        F.sum("a").cast("long").alias("a_tot"),
        F.sum("b").cast("long").alias("b_tot"),
        F.sum("c").cast("long").alias("c_tot"),
        F.sum("d").cast("long").alias("d_tot"),
        fold("ad_n").alias("ad_sum"),
        fold("bc_n").alias("bc_sum"),
    )
    return tot.select(
        "n_strata", "a_tot", "b_tot", "c_tot", "d_tot",
        F.expr("CAST(a_tot * d_tot AS DOUBLE) / CAST(b_tot * c_tot AS DOUBLE)").alias("or_crude"),
        (F.col("ad_sum") / F.col("bc_sum")).alias("or_mh"),
    )


# ---------------------------------------------------------------------------
# Local harmonic centrality (Boldi & Vigna, "Axioms for Centrality",
# Internet Math. 2014) bounded to the 3-hop neighborhood — the centrality
# with a principled treatment of disconnection (unreachable contributes
# zero, no infinite diameters), here depth-capped so per-round work is
# one frontier join. Contributions are EXACT integers (1000000 div d), so
# the per-node sum is pure long arithmetic; distances by candidate-ring
# expansion with a single min-ring aggregation (shortest-path label =
# min over ring-labeled candidate sets) — bounded rounds, no per-ring
# anti-joins.
# ---------------------------------------------------------------------------

@register(
    "graph_harmonic_centrality",
    """
    WITH raw AS (
      SELECT DISTINCT least(o_custkey % 400, o_orderkey % 400) AS a,
             greatest(o_custkey % 400, o_orderkey % 400) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 400 <> o_orderkey % 400
    ),
    adj AS (SELECT a AS n, b AS m FROM raw UNION ALL SELECT b, a FROM raw),
    d1 AS (SELECT DISTINCT n, m FROM adj),
    d2 AS (
      SELECT DISTINCT x.n, y.m
      FROM d1 x JOIN d1 y ON y.n = x.m
      WHERE y.m <> x.n
        AND NOT EXISTS (SELECT 1 FROM d1 z WHERE z.n = x.n AND z.m = y.m)
    ),
    d3 AS (
      SELECT DISTINCT x.n, y.m
      FROM d2 x JOIN d1 y ON y.n = x.m
      WHERE y.m <> x.n
        AND NOT EXISTS (SELECT 1 FROM d1 z WHERE z.n = x.n AND z.m = y.m)
        AND NOT EXISTS (SELECT 1 FROM d2 z WHERE z.n = x.n AND z.m = y.m)
    ),
    contrib AS (
      SELECT n, 1000000 AS w FROM d1
      UNION ALL SELECT n, 500000 FROM d2
      UNION ALL SELECT n, 333333 FROM d3
    )
    SELECT n AS node, count(*)::BIGINT AS n_reach3,
           sum(w)::BIGINT AS harmonic_micro
    FROM contrib GROUP BY n
    """,
    doc="3-hop-bounded harmonic centrality (Boldi-Vigna 2014): per node "
        "the sum over nodes at distance d <= 3 of 1000000 div d — exact "
        "integer contributions (1000000/500000/333333); distances by "
        "BITSET multi-source BFS (VERDICT r7 #5 follow-through): the "
        "projected node domain is 400 ids by construction, so each "
        "node's reach set packs into 7 longs; reach2 = OR of neighbors' "
        "adjacency bitmaps (one edge join + bit_or groupBy), reach3 = OR "
        "of neighbors' reach2, and the exact rings fall out of per-word "
        "bitmap algebra (ring3 = reach3 AND NOT(reach2|adj|self)) with "
        "bit_count for the tallies — the pairwise candidate EXPANSION "
        "(millions of intermediate rows in the anti-join/min-ring forms, "
        "the measured 10 s cost) never materializes; the edge list, "
        "capped at 400x399 rows at ANY input scale, joins a 400-row "
        "broadcast bitmap table twice. Scale path for unbounded domains: "
        "renumber per partition block (MS-BFS batching) or swap exact "
        "bitsets for HLL registers (HyperBall, Boldi-Vigna) — the "
        "engine's sketch_hll_registers device. DuckDB oracle keeps the "
        "independent NOT-EXISTS formulation; unreachable-by-3 "
        "contributes zero, the harmonic fix for disconnected graphs "
        "that closeness centrality lacks",
)
def graph_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.col("o_custkey") % 400
    b = F.col("o_orderkey") % 400
    raw = (
        orders.filter((F.col("o_orderkey") % 3 == 0) & (a != b))
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    d1 = (
        raw.select(F.col("a").alias("n"), F.col("b").alias("m"))
        .unionAll(raw.select(F.col("b").alias("n"), F.col("a").alias("m")))
        .distinct()
        # the edge list (<= 400x399 rows) feeds THREE consumers (adjacency
        # bitmaps + two neighbor-OR joins); a lazy localCheckpoint shares
        # one materialization instead of rescanning orders three times
        .localCheckpoint(eager=False)
    )
    n_words = 7  # ceil(400 / 64)
    # adjacency bitmaps: per node, N(n) packed into n_words longs
    bit_of_m = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(m % 64 AS INT))")
    adj = d1.groupBy("n").agg(
        *[
            F.bit_or(
                F.when(F.expr("m div 64") == w, bit_of_m).otherwise(F.lit(0).cast("long"))
            ).alias(f"w{w}")
            for w in range(n_words)
        ]
    )

    def neighbor_or(maps: DataFrame) -> DataFrame:
        # reach(n) = OR over m in N(n) of maps(m): one broadcast join of the
        # bounded edge list with the 400-row bitmap table + a bit_or groupBy
        m_maps = maps.select(
            F.col("n").alias("m"), *[F.col(f"w{w}").alias(f"mw{w}") for w in range(n_words)]
        )
        return (
            d1.join(F.broadcast(m_maps), "m")
            .groupBy("n")
            .agg(*[F.bit_or(f"mw{w}").alias(f"w{w}") for w in range(n_words)])
        )

    reach2 = neighbor_or(adj)
    reach3 = neighbor_or(reach2)
    r2 = reach2.select("n", *[F.col(f"w{w}").alias(f"r2_{w}") for w in range(n_words)])
    r3 = reach3.select("n", *[F.col(f"w{w}").alias(f"r3_{w}") for w in range(n_words)])
    joined = adj.join(F.broadcast(r2), "n").join(F.broadcast(r3), "n")
    self_w = [
        F.when(
            F.expr("n div 64") == w,
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(n % 64 AS INT))"),
        )
        .otherwise(F.lit(0).cast("long"))
        for w in range(n_words)
    ]
    ring2_w = [
        F.col(f"r2_{w}").bitwiseAND(
            F.bitwise_not(F.col(f"w{w}").bitwiseOR(self_w[w]))
        )
        for w in range(n_words)
    ]
    ring3_w = [
        F.col(f"r3_{w}").bitwiseAND(
            F.bitwise_not(
                F.col(f"r2_{w}").bitwiseOR(F.col(f"w{w}")).bitwiseOR(self_w[w])
            )
        )
        for w in range(n_words)
    ]
    pc1 = sum(F.bit_count(F.col(f"w{w}")).cast("long") for w in range(n_words))
    pc2 = sum(F.bit_count(c).cast("long") for c in ring2_w)
    pc3 = sum(F.bit_count(c).cast("long") for c in ring3_w)
    return joined.select(
        F.col("n").alias("node"),
        (pc1 + pc2 + pc3).cast("long").alias("n_reach3"),
        (1000000 * pc1 + 500000 * pc2 + 333333 * pc3).cast("long").alias("harmonic_micro"),
    )


# ---------------------------------------------------------------------------
# Dead-letter repair and replay — the ops loop behind every dead-letter
# queue: malformed events park, get repaired (the missing required field
# filled), and REPLAY through the same apply path; the contract is
# CONVERGENCE — the final state must be exactly what a clean stream would
# have produced. The oracle computes the clean-stream state directly, so
# the driver gate checks convergence itself; applied_via records which
# path each key took.
# ---------------------------------------------------------------------------

@register(
    "cdc_dead_letter_replay",
    """
    SELECT o_orderkey AS k, o_totalprice + 500 AS v,
           CASE WHEN o_orderkey % 7 = 3 THEN 'replay' ELSE 'direct' END AS applied_via
    FROM orders
    """,
    doc="dead-letter repair + replay convergence: update events missing a "
        "required field (orderkey % 7 = 3) dead-letter on first pass, are "
        "repaired by restoring the field from the envelope key, and replay "
        "through the SAME apply expression; the oracle is the clean-stream "
        "state, so the gate verifies convergence — the repaired path must "
        "be indistinguishable from the direct one except for the "
        "applied_via audit column",
)
def cdc_dead_letter_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # wire events: the required business key is NULL for the poisoned slice
    ev = orders.select(
        F.when(F.col("o_orderkey") % 7 != 3, F.col("o_orderkey")).alias("key_field"),
        F.col("o_orderkey").alias("envelope_key"),
        (F.col("o_totalprice") + 500).alias("v_new"),
    )
    good = ev.filter(F.col("key_field").isNotNull())
    dead = ev.filter(F.col("key_field").isNull())
    applied_direct = good.select(
        F.col("key_field").alias("k"), F.col("v_new").alias("v"),
        F.lit("direct").alias("applied_via"),
    )
    # repair: restore the required field from the envelope key, replay
    repaired = dead.select(
        F.col("envelope_key").alias("key_field"), "envelope_key", "v_new"
    )
    applied_replay = repaired.select(
        F.col("key_field").alias("k"), F.col("v_new").alias("v"),
        F.lit("replay").alias("applied_via"),
    )
    return applied_direct.unionByName(applied_replay)


# ===========================================================================
# Round-9 wave: scale devices (bitmap distinct, AMS F2, HyperBall HLL
# neighborhoods, zone-map overlap depth), experimentation stats
# (Mann-Whitney U, two-proportion z, BH-FDR, Theil-Sen, Page-Hinkley),
# pipeline ops (snapshot chunking, outbox relay, Poisson bootstrap, MATTR,
# RRF fusion, discount elasticity).
# ===========================================================================

# ---------------------------------------------------------------------------
# Bitmap-exact distinct counting for small integer domains: pack "which
# days of the month saw an order" into ONE 64-bit word per group with
# bit_or(1 << (day-1)) — bit_or is associative/commutative, so partials
# combine map-side and the shuffle moves 8 bytes per group instead of the
# distinct values themselves (the exact-count twin of the HLL device; at
# 100 TB a count_distinct shuffles every distinct value, this shuffles a
# word). bit_count pops the cardinality back out; the exact count_distinct
# runs alongside to PROVE bitmap == exact.
# ---------------------------------------------------------------------------

@register(
    "olap_bitmap_distinct",
    """
    SELECT o_orderpriority,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           bit_or((1::BIGINT << (day(o_orderdate) - 1)))::BIGINT AS day_word,
           bit_count(bit_or((1::BIGINT << (day(o_orderdate) - 1))))::BIGINT
             AS n_days_bitmap,
           count(DISTINCT day(o_orderdate))::BIGINT AS n_days_exact
    FROM orders
    GROUP BY o_orderpriority, year(o_orderdate)
    """,
    doc="bitmap-exact distinct for bounded integer domains: days-of-month "
        "seen per (priority, year) packed into one 64-bit word via "
        "bit_or(1 << day-1) — associative, map-side combinable, 8 bytes "
        "per group over the wire vs count_distinct's every-value shuffle; "
        "bit_count recovers the cardinality, the exact distinct runs "
        "alongside as the in-row proof",
)
def olap_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    word = F.bit_or(
        F.expr("shiftleft(CAST(1 AS BIGINT), dayofmonth(o_orderdate) - 1)")
    )
    return (
        orders.groupBy("o_orderpriority", F.year("o_orderdate").cast("long").alias("yr"))
        .agg(
            word.cast("long").alias("day_word"),
            F.bit_count(word).cast("long").alias("n_days_bitmap"),
            F.count_distinct(F.dayofmonth("o_orderdate")).cast("long").alias("n_days_exact"),
        )
    )


# ---------------------------------------------------------------------------
# Two-proportion z-test (pooled): the before/after readout for a rollout —
# did the urgent-order share change between 1995 and 1996? Counts are four
# exact longs from ONE aggregation; the z statistic is a shared-text float
# expression over them (bit-identical on both engines).
# ---------------------------------------------------------------------------

_Z2P = (
    "((x1 / n1 - x2 / n2) / "
    "sqrt(((x1 + x2) / (n1 + n2)) * (1 - (x1 + x2) / (n1 + n2)) "
    "* (1 / n1 + 1 / n2)))"
)


@register(
    "analytic_two_proportion_ztest",
    f"""
    WITH s AS (
      SELECT count(*) FILTER (year(o_orderdate) = 1995)::BIGINT AS n1_l,
             count(*) FILTER (year(o_orderdate) = 1995
                              AND o_orderpriority = '1-URGENT')::BIGINT AS x1_l,
             count(*) FILTER (year(o_orderdate) = 1996)::BIGINT AS n2_l,
             count(*) FILTER (year(o_orderdate) = 1996
                              AND o_orderpriority = '1-URGENT')::BIGINT AS x2_l
      FROM orders
    ),
    d AS (
      SELECT n1_l, x1_l, n2_l, x2_l,
             CAST(n1_l AS DOUBLE) AS n1, CAST(x1_l AS DOUBLE) AS x1,
             CAST(n2_l AS DOUBLE) AS n2, CAST(x2_l AS DOUBLE) AS x2
      FROM s
    )
    SELECT n1_l AS n_1995, x1_l AS urgent_1995, n2_l AS n_1996,
           x2_l AS urgent_1996,
           round(x1 / n1 - x2 / n2, 6) AS prop_diff,
           round({_Z2P}, 6) AS z
    FROM d
    """,
    doc="pooled two-proportion z-test (urgent-order share, 1995 vs 1996): "
        "four exact counts from one map-side-combinable aggregation; z is "
        "a shared-text float expression over the longs, so both engines "
        "compute bit-identical doubles — the A/B readout primitive for "
        "binary metrics",
)
def analytic_two_proportion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    s = orders.agg(
        F.count(F.when(y == 1995, 1)).cast("long").alias("n1_l"),
        F.count(F.when((y == 1995) & urgent, 1)).cast("long").alias("x1_l"),
        F.count(F.when(y == 1996, 1)).cast("long").alias("n2_l"),
        F.count(F.when((y == 1996) & urgent, 1)).cast("long").alias("x2_l"),
    )
    d = s.select(
        "n1_l", "x1_l", "n2_l", "x2_l",
        F.col("n1_l").cast("double").alias("n1"),
        F.col("x1_l").cast("double").alias("x1"),
        F.col("n2_l").cast("double").alias("n2"),
        F.col("x2_l").cast("double").alias("x2"),
    )
    return d.select(
        F.col("n1_l").alias("n_1995"),
        F.col("x1_l").alias("urgent_1995"),
        F.col("n2_l").alias("n_1996"),
        F.col("x2_l").alias("urgent_1996"),
        F.expr("round(x1 / n1 - x2 / n2, 6)").alias("prop_diff"),
        F.expr(f"round({_Z2P}, 6)").alias("z"),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U (Wilcoxon rank-sum) with tie correction — the
# nonparametric two-sample test that works when t-test normality doesn't
# hold. NO global rank window: the samples are integer-valued (l_quantity,
# 50 distinct values), so ranks collapse to per-value counts; cumulative
# "count below v" comes from a bounded 50x50 grouped self-join, and every
# rank-sum identity is exact long arithmetic (2R to avoid half-ranks).
# The z denominator carries the standard tie correction sum(t^3 - t).
# ---------------------------------------------------------------------------

_MWU_Z = (
    "((u2a / 2 - na * nb / 2) / "
    "sqrt(na * nb / 12.0 * ((n + 1) - s / (n * (n - 1)))))"
)


@register(
    "analytic_mann_whitney_u",
    f"""
    WITH g AS (
      SELECT CAST(l_quantity AS BIGINT) AS v,
             count(*) FILTER (l_returnflag = 'R')::BIGINT AS ca,
             count(*) FILTER (l_returnflag = 'A')::BIGINT AS cb
      FROM lineitem WHERE l_returnflag IN ('R', 'A')
      GROUP BY CAST(l_quantity AS BIGINT)
    ),
    cum AS (
      SELECT a.v, a.ca, a.cb, a.ca + a.cb AS ct,
             coalesce(sum(b.ca + b.cb), 0)::BIGINT AS cl
      FROM g a LEFT JOIN g b ON b.v < a.v
      GROUP BY a.v, a.ca, a.cb
    ),
    s AS (
      SELECT sum(ca)::BIGINT AS na_l, sum(cb)::BIGINT AS nb_l,
             sum(ca * (2 * cl + ct + 1))::BIGINT AS r2a_l,
             sum(ct * ct * ct - ct)::BIGINT AS ties_l
      FROM cum
    ),
    d AS (
      SELECT na_l, nb_l, ties_l,
             r2a_l - na_l * (na_l + 1) AS u2a_l,
             CAST(na_l AS DOUBLE) AS na, CAST(nb_l AS DOUBLE) AS nb,
             CAST(na_l + nb_l AS DOUBLE) AS n,
             CAST(r2a_l - na_l * (na_l + 1) AS DOUBLE) AS u2a,
             CAST(ties_l AS DOUBLE) AS s
      FROM s
    )
    SELECT na_l AS n_a, nb_l AS n_b, u2a_l AS u2_a,
           2 * na_l * nb_l - u2a_l AS u2_b, ties_l AS tie_s,
           round({_MWU_Z}, 6) AS z
    FROM d
    """,
    doc="Mann-Whitney U with tie correction (R-flag vs A-flag quantities): "
        "integer-valued samples collapse ranks to per-value counts, so "
        "there is NO global rank window — cum-below comes from a 50x50 "
        "grouped self-join and the rank-sum identities are exact longs "
        "(2R/2U doubling avoids half-ranks); z is a shared-text float "
        "expression with the sum(t^3-t) tie term",
)
def analytic_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    g = (
        li.filter(F.col("l_returnflag").isin("R", "A"))
        .groupBy(F.col("l_quantity").cast("long").alias("v"))
        .agg(
            F.count(F.when(F.col("l_returnflag") == "R", 1)).cast("long").alias("ca"),
            F.count(F.when(F.col("l_returnflag") == "A", 1)).cast("long").alias("cb"),
        )
    )
    a = g.select(F.col("v"), "ca", "cb", (F.col("ca") + F.col("cb")).alias("ct"))
    b = g.select(F.col("v").alias("bv"), (F.col("ca") + F.col("cb")).alias("bct"))
    cum = (
        a.join(F.broadcast(b), F.col("bv") < F.col("v"), "left")
        .groupBy("v", "ca", "cb", "ct")
        .agg(F.coalesce(F.sum("bct"), F.lit(0)).cast("long").alias("cl"))
    )
    s = cum.agg(
        F.sum("ca").cast("long").alias("na_l"),
        F.sum("cb").cast("long").alias("nb_l"),
        F.sum(F.col("ca") * (2 * F.col("cl") + F.col("ct") + 1)).cast("long").alias("r2a_l"),
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct")).cast("long").alias("ties_l"),
    )
    d = s.select(
        "na_l", "nb_l", "ties_l",
        (F.col("r2a_l") - F.col("na_l") * (F.col("na_l") + 1)).alias("u2a_l"),
        F.col("na_l").cast("double").alias("na"),
        F.col("nb_l").cast("double").alias("nb"),
        (F.col("na_l") + F.col("nb_l")).cast("double").alias("n"),
        (F.col("r2a_l") - F.col("na_l") * (F.col("na_l") + 1)).cast("double").alias("u2a"),
        F.col("ties_l").cast("double").alias("s"),
    )
    return d.select(
        F.col("na_l").alias("n_a"),
        F.col("nb_l").alias("n_b"),
        F.col("u2a_l").alias("u2_a"),
        (2 * F.col("na_l") * F.col("nb_l") - F.col("u2a_l")).alias("u2_b"),
        F.col("ties_l").alias("tie_s"),
        F.expr(f"round({_MWU_Z}, 6)").alias("z"),
    )


# ---------------------------------------------------------------------------
# Discount elasticity per brand: the demand-curve slope of quantity vs
# discount level by exact per-group OLS. x = discount in whole cents
# (11 discrete levels), y = quantity (integer) — all five normal-equation
# sums are exact longs in ONE groupBy (map-side combinable; at 100 TB the
# shuffle is 5 longs per brand), the slope/intercept solve is a
# shared-text float expression. The part join broadcasts (bounded dim).
# ---------------------------------------------------------------------------

_SLOPE = "((nd * sxy - sx * sy) / (nd * sxx - sx * sx))"
_INTERCEPT = f"((sy - {_SLOPE} * sx) / nd)"


@register(
    "analytic_price_elasticity",
    f"""
    WITH x AS (
      SELECT p.p_brand,
             CAST(round(l.l_discount * 100) AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    s AS (
      SELECT p_brand, count(*)::BIGINT AS n, sum(x)::BIGINT AS sx_l,
             sum(y)::BIGINT AS sy_l, sum(x * x)::BIGINT AS sxx_l,
             sum(x * y)::BIGINT AS sxy_l
      FROM x GROUP BY p_brand
    ),
    d AS (
      SELECT p_brand, n, CAST(n AS DOUBLE) AS nd, CAST(sx_l AS DOUBLE) AS sx,
             CAST(sy_l AS DOUBLE) AS sy, CAST(sxx_l AS DOUBLE) AS sxx,
             CAST(sxy_l AS DOUBLE) AS sxy
      FROM s
    )
    SELECT p_brand, n AS n_items,
           round({_SLOPE}, 6) AS qty_per_discount_cent,
           round({_INTERCEPT}, 6) AS qty_at_zero_discount
    FROM d
    """,
    doc="per-brand discount elasticity of demand by exact OLS: quantity on "
        "discount-cents (11 discrete levels) — five exact long sums per "
        "brand in one map-side-combinable groupBy, slope/intercept as "
        "shared-text float expressions; the part dim join broadcasts",
)
def analytic_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    x = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey")).select(
        "p_brand",
        F.round(F.col("l_discount") * 100).cast("long").alias("x"),
        F.col("l_quantity").cast("long").alias("y"),
    )
    s = x.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx_l"),
        F.sum("y").cast("long").alias("sy_l"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx_l"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy_l"),
    )
    d = s.select(
        "p_brand", "n",
        F.col("n").cast("double").alias("nd"),
        F.col("sx_l").cast("double").alias("sx"),
        F.col("sy_l").cast("double").alias("sy"),
        F.col("sxx_l").cast("double").alias("sxx"),
        F.col("sxy_l").cast("double").alias("sxy"),
    )
    return d.select(
        "p_brand",
        F.col("n").alias("n_items"),
        F.expr(f"round({_SLOPE}, 6)").alias("qty_per_discount_cent"),
        F.expr(f"round({_INTERCEPT}, 6)").alias("qty_at_zero_discount"),
    )


# ---------------------------------------------------------------------------
# AMS / Tug-of-War sketch for F2 (Alon-Matias-Szegedy, STOC'96): the
# self-join-size estimator. Each of 16 estimators keeps ONE long — the
# signed sum Z_j = sum over events of s_j(user), s_j in {-1,+1} from a
# salted md5 bit — and E[Z^2] = F2 = sum of squared frequencies. The
# streaming/distributed cost is 16 longs per partition (map-side
# combinable), vs the exact path's per-key shuffle; both run here so the
# row itself exposes the estimator error. Signs are md5-derived, so both
# engines build identical estimators.
# ---------------------------------------------------------------------------

@register(
    "sketch_ams_f2",
    """
    WITH signs AS (
      SELECT j,
             sum(CASE WHEN ('0x' || substr(md5('ams' || CAST(j AS VARCHAR)
                          || '|' || CAST(user_id AS VARCHAR)), 1, 1))::BIGINT % 2 = 0
                      THEN 1 ELSE -1 END)::BIGINT AS z
      FROM events CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS j)
      GROUP BY j
    ),
    est AS (
      SELECT count(*)::BIGINT AS n_estimators,
             sum(z * z)::BIGINT AS sum_z2,
             min(z * z)::BIGINT AS est_min,
             max(z * z)::BIGINT AS est_max
      FROM signs
    ),
    ex AS (
      SELECT sum(c * c)::BIGINT AS f2_exact
      FROM (SELECT count(*)::BIGINT AS c FROM events GROUP BY user_id)
    )
    SELECT n_estimators, round(CAST(sum_z2 AS DOUBLE) / 16, 6) AS f2_est_mean,
           est_min, est_max, f2_exact
    FROM est CROSS JOIN ex
    """,
    doc="AMS tug-of-war F2 sketch (Alon-Matias-Szegedy '96): 16 one-long "
        "estimators Z_j = signed event sum with md5-derived +-1 signs; "
        "E[Z^2] = sum of squared user frequencies (self-join size). "
        "Distributed cost is 16 longs per partition, map-side combinable "
        "— the exact per-key groupBy runs alongside to expose the error "
        "in-row; signs are md5 arithmetic identical on both engines",
)
def sketch_ams_f2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    j_ed = ev.select("user_id", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"))
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("ams"),
                        F.col("j").cast("string"),
                        F.lit("|"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                1,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        1,
    ).otherwise(-1)
    signs = j_ed.groupBy("j").agg(F.sum(sign).cast("long").alias("z"))
    est = signs.agg(
        F.count("*").cast("long").alias("n_estimators"),
        F.sum(F.col("z") * F.col("z")).cast("long").alias("sum_z2"),
        F.min(F.col("z") * F.col("z")).cast("long").alias("est_min"),
        F.max(F.col("z") * F.col("z")).cast("long").alias("est_max"),
    )
    ex = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    )
    return est.crossJoin(F.broadcast(ex)).select(
        "n_estimators",
        F.expr("round(CAST(sum_z2 AS DOUBLE) / 16, 6)").alias("f2_est_mean"),
        "est_min",
        "est_max",
        "f2_exact",
    )


# ---------------------------------------------------------------------------
# Benjamini-Hochberg FDR control (Benjamini & Hochberg, JRSS-B 1995) over
# 20 parallel goodness-of-fit tests: per customer-stratum, does order
# status deviate from uniform across the 3 cells? chi2 with 2 dof has the
# EXACT survival function p = exp(-chi2/2), so p-values need no erf/
# gamma — chi2 itself is exact integer arithmetic ((3*ss - n^2)/n). The
# BH step-up (reject all p(i) <= (i/m)q up to the largest passing i) runs
# on the 20-row hypothesis table via a bounded self-join — no window, no
# sort; the multiple-testing gate every metrics platform needs.
# ---------------------------------------------------------------------------

@register(
    "analytic_benjamini_hochberg",
    """
    WITH cells AS (
      SELECT o_custkey % 20 AS stratum, o_orderstatus, count(*)::BIGINT AS c
      FROM orders GROUP BY o_custkey % 20, o_orderstatus
    ),
    hyp AS (
      SELECT stratum, sum(c)::BIGINT AS n, sum(c * c)::BIGINT AS ss,
             CAST(3 * sum(c * c) - sum(c) * sum(c) AS DOUBLE)
               / CAST(sum(c) AS DOUBLE) AS chi2
      FROM cells GROUP BY stratum
    ),
    p AS (SELECT stratum, n, chi2, exp(-chi2 / 2) AS pval FROM hyp),
    ranked AS (
      SELECT a.stratum, a.n, a.chi2, a.pval,
             count(*) FILTER (b.pval < a.pval
                              OR (b.pval = a.pval AND b.stratum <= a.stratum))::BIGINT
               AS bh_rank
      FROM p a CROSS JOIN p b
      GROUP BY a.stratum, a.n, a.chi2, a.pval
    ),
    kstar AS (
      SELECT coalesce(max(bh_rank), 0)::BIGINT AS k
      FROM ranked WHERE pval <= bh_rank * 0.10 / 20
    )
    SELECT stratum, n, round(chi2, 6) AS chi2, round(pval, 6) AS p,
           bh_rank, bh_rank <= k AS rejected
    FROM ranked CROSS JOIN kstar
    """,
    doc="Benjamini-Hochberg step-up FDR (q=0.10) over 20 per-stratum "
        "uniformity tests: chi2 is exact integer arithmetic, its 2-dof "
        "survival function exp(-chi2/2) gives exact p-values (no erf), "
        "ranks and the step-up threshold come from a bounded 20x20 "
        "hypothesis self-join — zero windows; the multiple-testing "
        "correction behind any many-metrics experiment readout",
)
def analytic_benjamini_hochberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = orders.groupBy(
        (F.col("o_custkey") % 20).alias("stratum"), "o_orderstatus"
    ).agg(F.count("*").cast("long").alias("c"))
    hyp = cells.groupBy("stratum").agg(
        F.sum("c").cast("long").alias("n"),
        F.expr(
            "CAST(3 * sum(c * c) - sum(c) * sum(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE)"
        ).alias("chi2"),
    )
    p = hyp.select("stratum", "n", "chi2", F.expr("exp(-chi2 / 2)").alias("pval"))
    b = p.select(
        F.col("stratum").alias("b_stratum"), F.col("pval").alias("b_pval")
    )
    ranked = (
        p.join(F.broadcast(b))
        .groupBy("stratum", "n", "chi2", "pval")
        .agg(
            F.count(
                F.when(
                    (F.col("b_pval") < F.col("pval"))
                    | ((F.col("b_pval") == F.col("pval")) & (F.col("b_stratum") <= F.col("stratum"))),
                    1,
                )
            )
            .cast("long")
            .alias("bh_rank")
        )
    )
    kstar = ranked.filter(
        F.col("pval") <= F.col("bh_rank") * 0.10 / 20
    ).agg(F.coalesce(F.max("bh_rank"), F.lit(0)).cast("long").alias("k"))
    return ranked.crossJoin(F.broadcast(kstar)).select(
        "stratum", "n",
        F.round("chi2", 6).alias("chi2"),
        F.round("pval", 6).alias("p"),
        "bh_rank",
        (F.col("bh_rank") <= F.col("k")).alias("rejected"),
    )


# ---------------------------------------------------------------------------
# Theil-Sen robust trend (Theil '50 / Sen '68): per priority class, the
# median of all pairwise slopes of the monthly order-count series — the
# regression that shrugs off outlier months where OLS folds. The series
# is pre-aggregated to <= ~80 (month, count) points per group BEFORE the
# pairwise expansion, so the O(k^2) slope set is ~3k rows per group at
# ANY input scale (the aggregation absorbed the data size); the median is
# an exact two-middle-element average via a group-partitioned rank.
# ---------------------------------------------------------------------------

@register(
    "analytic_theil_sen",
    """
    WITH m AS (
      SELECT o_orderpriority AS pri,
             year(o_orderdate) * 12 + month(o_orderdate) AS x,
             count(*)::BIGINT AS y
      FROM orders GROUP BY o_orderpriority, year(o_orderdate) * 12 + month(o_orderdate)
    ),
    pairs AS (
      SELECT a.pri, a.x AS xi, b.x AS xj,
             CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
      FROM m a JOIN m b ON b.pri = a.pri AND b.x > a.x
    ),
    ranked AS (
      SELECT pri, slope,
             row_number() OVER (PARTITION BY pri ORDER BY slope, xi, xj) AS rk,
             count(*) OVER (PARTITION BY pri) AS np
      FROM pairs
    ),
    med AS (
      SELECT pri, max(np)::BIGINT AS n_pairs,
             (sum(slope) FILTER (rk = (np + 1) // 2)
              + sum(slope) FILTER (rk = (np + 2) // 2)) / 2 AS slope_med
      FROM ranked GROUP BY pri
    ),
    pts AS (SELECT pri, count(*)::BIGINT AS n_months FROM m GROUP BY pri)
    SELECT med.pri AS o_orderpriority, pts.n_months, med.n_pairs,
           round(med.slope_med, 6) AS ts_slope
    FROM med JOIN pts ON pts.pri = med.pri
    """,
    doc="Theil-Sen robust trend per priority: median pairwise slope of the "
        "monthly order-count series — the series is aggregated to ~80 "
        "points per group BEFORE the O(k^2) pair join (bounded ~3k pairs "
        "per group at any input scale); median = exact two-middle average "
        "via a group-partitioned rank with integer tie-breaks",
)
def analytic_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("x"),
    ).agg(F.count("*").cast("long").alias("y"))
    a = m.select(F.col("pri"), F.col("x").alias("xi"), F.col("y").alias("yi"))
    b = m.select(F.col("pri").alias("bpri"), F.col("x").alias("xj"), F.col("y").alias("yj"))
    pairs = a.join(
        b, (F.col("bpri") == F.col("pri")) & (F.col("xj") > F.col("xi"))
    ).select(
        "pri", "xi", "xj",
        F.expr("CAST(yj - yi AS DOUBLE) / CAST(xj - xi AS DOUBLE)").alias("slope"),
    )
    w = Window.partitionBy("pri").orderBy("slope", "xi", "xj")
    ranked = pairs.select(
        "pri", "slope",
        F.row_number().over(w).alias("rk"),
        F.count("*").over(Window.partitionBy("pri")).alias("np"),
    )
    med = ranked.groupBy("pri").agg(
        F.max("np").cast("long").alias("n_pairs"),
        (
            (
                F.sum(F.when(F.col("rk") == F.expr("(np + 1) div 2"), F.col("slope")))
                + F.sum(F.when(F.col("rk") == F.expr("(np + 2) div 2"), F.col("slope")))
            )
            / 2
        ).alias("slope_med"),
    )
    pts = m.groupBy("pri").agg(F.count("*").cast("long").alias("n_months"))
    return (
        med.join(pts, "pri")
        .select(
            F.col("pri").alias("o_orderpriority"),
            "n_months",
            "n_pairs",
            F.round("slope_med", 6).alias("ts_slope"),
        )
    )


# ---------------------------------------------------------------------------
# Page-Hinkley drift detection (Page, Biometrika 1954): the sequential
# change-point monitor over each priority's monthly order-count series.
# The cumulative statistic m_t = sum(x_i - mean_i - delta) and its running
# minimum are inherently sequential, so the recurrence runs as ONE ordered
# in-executor fold per series (the engine's holt_winters device) with a
# flat 5-double accumulator [i, sum, m, min_m, alarm_t] — one shuffle on
# the series key, O(1) state, NO global window; the oracle replays the
# identical fold via list_reduce with a LIST accumulator (struct
# accumulators mutate sequentially in DuckDB — documented pitfall).
# ---------------------------------------------------------------------------

# shared recurrence text: <M> = updated m; elements reference only the OLD
# accumulator so list-element evaluation order cannot matter. The element
# expression is a parameter because DuckDB's list_reduce needs list-typed
# elements to match the list accumulator (e arrives as [v], so e -> e[1])
# while Spark's aggregate takes the bare double; the arithmetic op order
# is identical either way.
_PH_M = "({a}[3] + ({e} - ({a}[2] + {e}) / ({a}[1] + 1) - 0.5))"


def _ph_fold(acc_ix: str, e: str = "e") -> str:
    m = _PH_M.format(a=acc_ix, e=e)
    return (
        f"[{acc_ix}[1] + 1, {acc_ix}[2] + {e}, {m}, least({acc_ix}[4], {m}), "
        f"CASE WHEN {acc_ix}[5] < 0 AND ({m} - least({acc_ix}[4], {m})) > 20.0 "
        f"THEN {acc_ix}[1] + 1 ELSE {acc_ix}[5] END]"
    )


@register(
    "analytic_page_hinkley",
    f"""
    WITH m AS (
      SELECT o_orderpriority AS pri,
             year(o_orderdate) * 12 + month(o_orderdate) AS x,
             count(*)::BIGINT AS y
      FROM orders GROUP BY o_orderpriority, year(o_orderdate) * 12 + month(o_orderdate)
    ),
    s AS (
      SELECT pri, count(*)::BIGINT AS n_points,
             list(CAST(y AS DOUBLE) ORDER BY x) AS vs
      FROM m GROUP BY pri
    ),
    r AS (
      SELECT pri, n_points,
             list_reduce(
               list_prepend(
                 [CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                  CAST(0.0 AS DOUBLE), CAST(-1.0 AS DOUBLE)],
                 list_transform(vs, v -> [v])),
               (acc, e) -> {_ph_fold('acc', 'e[1]')}
             ) AS st
      FROM s
    )
    SELECT pri AS o_orderpriority, n_points,
           round(st[3], 6) AS m_final, round(st[4], 6) AS min_m,
           round(st[3] - st[4], 6) AS ph_final,
           CAST(st[5] AS BIGINT) AS alarm_t
    FROM r
    """,
    doc="Page-Hinkley sequential drift detector per priority series "
        "(delta=0.5, lambda=20): m_t = sum(x_i - running_mean_i - delta), "
        "PH_t = m_t - min m, alarm at first crossing — the inherently "
        "sequential recurrence as ONE ordered in-executor fold with a "
        "flat 5-double accumulator, one shuffle on the series key, no "
        "global window; identical fold text on both engines",
)
def analytic_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    m = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("x"),
    ).agg(F.count("*").cast("long").alias("y"))
    s = m.groupBy("pri").agg(
        F.count("*").cast("long").alias("n_points"),
        F.expr(
            "transform(array_sort(collect_list(struct(x, y))), p -> CAST(p.y AS DOUBLE))"
        ).alias("vs"),
    )
    # build the Spark fold by textual substitution of the SHARED recurrence:
    # acc[k] -> element_at(acc, k); outer [..] -> array(..) — same op order
    # as the oracle's list_reduce lambda, so the doubles are bit-identical
    body = _ph_fold("acc")
    assert body.startswith("[") and body.endswith("]")
    spark_body = (
        "array(" + body[1:-1].replace("acc[", "element_at(acc, ").replace("]", ")") + ")"
    )
    fold = (
        "aggregate(vs, array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), "
        "CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(-1.0 AS DOUBLE)), "
        f"(acc, e) -> {spark_body})"
    )
    return s.select(
        F.col("pri").alias("o_orderpriority"),
        "n_points",
        F.expr(f"round(element_at({fold}, 3), 6)").alias("m_final"),
        F.expr(f"round(element_at({fold}, 4), 6)").alias("min_m"),
        F.expr(f"round(element_at({fold}, 3) - element_at({fold}, 4), 6)").alias("ph_final"),
        F.expr(f"CAST(element_at({fold}, 5) AS BIGINT)").alias("alarm_t"),
    )


# ---------------------------------------------------------------------------
# Poisson bootstrap (Chamandy et al., "Estimating Uncertainty for Massive
# Data Streams", Google TR 2012): the bootstrap that works in one pass on
# distributed data — resample counts are per-row Poisson(1) draws instead
# of a global n-out-of-n multinomial, so every row decides its own weight
# in every replicate with NO coordination. Draws come from the inverse
# CDF over a salted-md5 uniform (deterministic, engine-portable); 8
# replicates explode map-side and aggregate to exact integer totals.
# ---------------------------------------------------------------------------

_POIS_K = """CASE WHEN {u} < 0.36787944117144233 THEN 0
         WHEN {u} < 0.7357588823428847 THEN 1
         WHEN {u} < 0.9196986029286058 THEN 2
         WHEN {u} < 0.9810118431238463 THEN 3
         WHEN {u} < 0.9963401531726563 THEN 4
         WHEN {u} < 0.9994058151824183 THEN 5
         ELSE 6 END"""


@register(
    "sample_poisson_bootstrap",
    f"""
    WITH draws AS (
      SELECT rep, o_orderkey,
             {_POIS_K.format(u="(('0x' || substr(md5('pb' || CAST(rep AS VARCHAR) || '|' || CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT / 4294967296.0)")} AS k,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS rep)
    )
    SELECT rep, sum(k)::BIGINT AS n_eff, sum(k * cents)::BIGINT AS total_cents
    FROM draws GROUP BY rep
    """,
    doc="one-pass Poisson bootstrap (Chamandy et al. 2012): per-row "
        "Poisson(1) replicate weights from the inverse CDF over a salted "
        "md5 uniform — no global multinomial coordination, so replicates "
        "scale as a map-side explode + one exact-integer aggregation; the "
        "replicate spread of total_cents is the uncertainty estimate",
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("rep"),
    )
    u = (
        "(conv(substring(md5(concat('pb', CAST(rep AS STRING), '|', "
        "CAST(o_orderkey AS STRING))), 1, 8), 16, 10) / 4294967296.0)"
    )
    k = F.expr(_POIS_K.format(u=u))
    return (
        d.select("rep", "cents", k.alias("k"))
        .groupBy("rep")
        .agg(
            F.sum("k").cast("long").alias("n_eff"),
            F.sum(F.col("k") * F.col("cents")).cast("long").alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Incremental-snapshot chunking (DBLog, Andradaki et al. / Debezium
# incremental snapshots): a consistent snapshot of a huge table is taken
# in PK-range chunks interleaved with the live CDC stream, so chunk
# boundaries must come from the key space — not OFFSET/LIMIT scans. Chunk
# id = key div chunk_size needs no global sort or window; per-chunk
# (lo, hi, count) is one aggregation, and the oversized flag surfaces key
# ranges whose density would blow the per-chunk SELECT budget (the knob
# the watermark pacing depends on).
# ---------------------------------------------------------------------------

@register(
    "cdc_snapshot_chunking",
    """
    WITH chunks AS (
      SELECT o_orderkey // 4000 AS chunk_id,
             min(o_orderkey)::BIGINT AS lo_key, max(o_orderkey)::BIGINT AS hi_key,
             count(*)::BIGINT AS n_rows
      FROM orders GROUP BY o_orderkey // 4000
    ),
    avg_n AS (SELECT CAST(sum(n_rows) AS DOUBLE) / count(*) AS a FROM chunks)
    SELECT chunk_id, lo_key, hi_key, n_rows,
           CAST(n_rows AS DOUBLE) > 1.5 * a AS oversized
    FROM chunks CROSS JOIN avg_n
    """,
    doc="DBLog/Debezium-style incremental snapshot chunking: PK-range "
        "chunks (key div 4000) computed with zero sorts/windows — one "
        "aggregation yields each chunk's [lo, hi] watermark pair and row "
        "count; oversized flags key ranges >1.5x the mean density, the "
        "signal for adaptive chunk sizing before interleaving with the "
        "live stream",
)
def cdc_snapshot_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    chunks = orders.groupBy(F.expr("o_orderkey div 4000").alias("chunk_id")).agg(
        F.min("o_orderkey").cast("long").alias("lo_key"),
        F.max("o_orderkey").cast("long").alias("hi_key"),
        F.count("*").cast("long").alias("n_rows"),
    )
    avg_n = chunks.agg(
        F.expr("CAST(sum(n_rows) AS DOUBLE) / count(*)").alias("a")
    )
    return chunks.crossJoin(F.broadcast(avg_n)).select(
        "chunk_id", "lo_key", "hi_key", "n_rows",
        (F.col("n_rows").cast("double") > 1.5 * F.col("a")).alias("oversized"),
    )


# ---------------------------------------------------------------------------
# Transactional-outbox relay audit (the microservices outbox pattern the
# reference's Debezium deployment exists to serve): the relay reads
# outbox rows via CDC and must republish per-aggregate in commit order,
# tolerating at-least-once redelivery. Redeliveries (every 11th event
# re-arrives) collapse by message id BEFORE sequencing; the per-aggregate
# sequence is an aggregate-partitioned row_number (never global), which
# is exactly how a sharded relay scales — order only matters per key.
# ---------------------------------------------------------------------------

@register(
    "cdc_outbox_relay",
    """
    WITH deliveries AS (
      SELECT event_id, user_id, ts FROM events
      UNION ALL
      SELECT event_id, user_id, ts FROM events WHERE event_id % 11 = 0
    ),
    dedup AS (
      SELECT event_id, user_id, ts, count(*)::BIGINT AS n_deliveries
      FROM deliveries GROUP BY event_id, user_id, ts
    )
    SELECT user_id, event_id,
           row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT
             AS seq,
           n_deliveries, n_deliveries > 1 AS redelivered
    FROM dedup
    """,
    doc="transactional-outbox relay with at-least-once redelivery: "
        "duplicate deliveries (every 11th message re-arrives) collapse by "
        "message id in one groupBy, then each aggregate gets a dense "
        "commit-order sequence via an AGGREGATE-partitioned row_number — "
        "per-key ordering only, the property that lets the relay shard",
)
def cdc_outbox_relay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    deliveries = ev.unionAll(ev.filter(F.col("event_id") % 11 == 0))
    dedup = deliveries.groupBy("event_id", "user_id", "ts").agg(
        F.count("*").cast("long").alias("n_deliveries")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return dedup.select(
        "user_id", "event_id",
        F.row_number().over(w).cast("long").alias("seq"),
        "n_deliveries",
        (F.col("n_deliveries") > 1).alias("redelivered"),
    )


# ---------------------------------------------------------------------------
# MATTR lexical diversity (Covington & McFall, JQL 2010): type-token
# ratio over a sliding 20-token window, averaged — the length-invariant
# replacement for raw TTR (which decays with doc length, making cross-
# length corpus comparisons meaningless). Window membership is a bounded
# range join on (doc, position) — each token lands in <= 20 windows, so
# the expansion is 20x tokens at any scale and partitions by doc; the
# mean is exact integer ppm arithmetic (sum of per-window distinct counts
# over 20 * n_windows).
# ---------------------------------------------------------------------------

@register(
    "text_ttr_mattr",
    """
    WITH lt AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS l
      FROM documents
    ),
    tok AS (
      SELECT doc_id, len(l) AS n, unnest(generate_series(0, len(l) - 1)) AS pos, l
      FROM lt
    ),
    t AS (SELECT doc_id, n, pos, l[pos + 1] AS tk FROM tok),
    starts AS (SELECT doc_id, pos AS s FROM t WHERE pos <= n - 20),
    win AS (
      SELECT t.doc_id, s.s, t.tk
      FROM t JOIN starts s ON s.doc_id = t.doc_id
                          AND t.pos BETWEEN s.s AND s.s + 19
    ),
    wd AS (
      SELECT doc_id, s, count(DISTINCT tk)::BIGINT AS n_types
      FROM win GROUP BY doc_id, s
    )
    SELECT w.doc_id, max(t.n)::BIGINT AS n_tokens, count(*)::BIGINT AS n_windows,
           CAST((sum(w.n_types) * 1000000) // (20 * count(*)) AS BIGINT) AS mattr_ppm
    FROM wd w JOIN (SELECT DISTINCT doc_id, n FROM t) t ON t.doc_id = w.doc_id
    GROUP BY w.doc_id
    """,
    doc="MATTR lexical diversity (Covington-McFall 2010): sliding 20-token "
        "window TTR averaged per doc — the length-invariant lexical "
        "richness score raw TTR cannot give; window membership is a "
        "doc-partitioned bounded range join (each token in <= 20 windows, "
        "20x expansion at any scale), the mean is exact integer ppm",
)
def text_ttr_mattr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), "\\s+")).alias("pos", "tk"),
    )
    n = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    t = toks.join(F.broadcast(n), "doc_id")
    starts = t.filter(F.col("pos") <= F.col("n") - 20).select(
        F.col("doc_id"), F.col("pos").alias("s")
    )
    win = t.alias("t").join(
        starts.alias("s"),
        (F.col("s.doc_id") == F.col("t.doc_id"))
        & F.col("t.pos").between(F.col("s.s"), F.col("s.s") + 19),
    ).select(F.col("t.doc_id").alias("doc_id"), F.col("s.s").alias("s"), F.col("t.tk").alias("tk"))
    wd = win.groupBy("doc_id", "s").agg(F.count_distinct("tk").cast("long").alias("n_types"))
    return (
        wd.join(F.broadcast(n), "doc_id")
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_windows"),
            F.expr("(sum(n_types) * 1000000) div (20 * count(*))").alias("mattr_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Reciprocal rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009): the
# standard way to merge rankings from heterogeneous retrievers (dense +
# sparse, or two embedding models) without score calibration —
# rrf(d) = sum_r 1/(k + rank_r(d)), k = 60. Two dense rankings against
# two query vectors; each ranking is a QUERY-partitioned window over the
# broadcast-scored candidates, and the fused top-20 plans as TakeOrdered.
# Scores never cross retrievers — only integer ranks do, which is why RRF
# survives incomparable score scales.
# ---------------------------------------------------------------------------

@register(
    "sim_rank_fusion_rrf",
    f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qvec FROM embeddings WHERE vec_id IN (0, 1)),
    scored AS (
      SELECT q.query_id, c.vec_id,
             {_cos_sql('q.qvec', 'c.embedding')} AS cos_sim
      FROM q, embeddings c WHERE c.vec_id >= 2
    ),
    ranked AS (
      SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rnk
      FROM scored
    ),
    fused AS (
      SELECT vec_id,
             min(CASE WHEN query_id = 0 THEN rnk END)::BIGINT AS rank_q0,
             min(CASE WHEN query_id = 1 THEN rnk END)::BIGINT AS rank_q1
      FROM ranked GROUP BY vec_id
    )
    SELECT vec_id, rank_q0, rank_q1,
           round(CAST(1 AS DOUBLE) / (60 + rank_q0)
                 + CAST(1 AS DOUBLE) / (60 + rank_q1), 6) AS rrf
    FROM fused
    ORDER BY CAST(1 AS DOUBLE) / (60 + rank_q0)
             + CAST(1 AS DOUBLE) / (60 + rank_q1) DESC, vec_id ASC
    LIMIT 20
    """,
    doc="reciprocal rank fusion (Cormack et al. SIGIR'09, k=60) of two "
        "dense rankings: scores never cross retrievers — only integer "
        "ranks enter 1/(60+r), so incomparable score scales fuse safely; "
        "rankings are query-partitioned windows over broadcast-scored "
        "candidates, the fused top-20 plans as TakeOrdered",
)
def sim_rank_fusion_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id").isin(0, 1)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    cand = emb.filter(F.col("vec_id") >= 2)
    scored = cand.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id",
        S.cosine_sim(F.col("qvec"), F.col("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    ranked = scored.select("query_id", "vec_id", F.row_number().over(w).alias("rnk"))
    fused = ranked.groupBy("vec_id").agg(
        F.min(F.when(F.col("query_id") == 0, F.col("rnk"))).cast("long").alias("rank_q0"),
        F.min(F.when(F.col("query_id") == 1, F.col("rnk"))).cast("long").alias("rank_q1"),
    )
    rrf = F.expr(
        "CAST(1 AS DOUBLE) / (60 + rank_q0) + CAST(1 AS DOUBLE) / (60 + rank_q1)"
    )
    return (
        fused.orderBy(rrf.desc(), F.asc("vec_id"))
        .limit(20)
        .select("vec_id", "rank_q0", "rank_q1", F.round(rrf, 6).alias("rrf"))
    )


# ---------------------------------------------------------------------------
# Zone-map overlap depth: the clustering-quality metric behind OPTIMIZE
# decisions in modern table formats — for each data file's (min, max)
# range on a candidate clustering key, how many files' ranges cover its
# lower bound? depth 1 everywhere = perfectly clustered (point lookups
# touch one file); depth ~ F = unclustered (every lookup scans every
# file). Runs entirely on FILE METADATA (the stats a lakehouse log
# already stores — orders of magnitude smaller than the data): the O(F^2)
# interval self-join is over the file-stats table only; at very large F
# the engine's two-level boundary-sweep prefix device replaces it.
# ---------------------------------------------------------------------------

@register(
    "layout_zone_overlap_depth",
    """
    WITH files AS (
      SELECT o_orderkey // 1000 AS file_id,
             min(o_custkey)::BIGINT AS zmin, max(o_custkey)::BIGINT AS zmax,
             count(*)::BIGINT AS n_rows
      FROM orders GROUP BY o_orderkey // 1000
    )
    SELECT a.file_id, a.zmin, a.zmax, a.n_rows,
           (SELECT count(*) FROM files b
            WHERE b.zmin <= a.zmin AND a.zmin <= b.zmax)::BIGINT AS overlap_depth
    FROM files a
    """,
    doc="zone-map overlap depth on the clustering key (the metric behind "
        "OPTIMIZE/Z-ORDER decisions): per simulated file (1000-key range), "
        "how many files' [min,max] on o_custkey cover its lower bound — "
        "depth 1 = perfect clustering, depth ~F = every lookup scans every "
        "file; computed purely on the file-STATS table (log metadata, not "
        "data), where the bounded interval self-join is cheap",
)
def layout_zone_overlap_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    files = orders.groupBy(F.expr("o_orderkey div 1000").alias("file_id")).agg(
        F.min("o_custkey").cast("long").alias("zmin"),
        F.max("o_custkey").cast("long").alias("zmax"),
        F.count("*").cast("long").alias("n_rows"),
    )
    b = files.select(
        F.col("zmin").alias("b_zmin"), F.col("zmax").alias("b_zmax")
    )
    return (
        files.join(
            F.broadcast(b),
            (F.col("b_zmin") <= F.col("zmin")) & (F.col("zmin") <= F.col("b_zmax")),
        )
        .groupBy("file_id", "zmin", "zmax", "n_rows")
        .agg(F.count("*").cast("long").alias("overlap_depth"))
    )


# ---------------------------------------------------------------------------
# HyperBall harmonic centrality (Boldi & Vigna, WWW 2013 / "In-Core
# Computation of Geometric Centralities with HyperBall"): the UNBOUNDED-
# domain scale path the exact bitset BFS of graph_harmonic_centrality
# cannot take (its 7-long reach sets exist only because the projected
# domain is 400 ids). Here each node's r-hop neighborhood is an HLL-256
# sketch; one round of B_r(n) = merge(B_{r-1}(n), B_{r-1}(m) for m in
# N(n)) is ONE edge join + a (node, bucket) max-groupBy — per-round cost
# ~ |E| * 256 registers, independent of |V|^2, and registers merge
# map-side because max is associative. Harmonic estimate = sum over r of
# (|B_r| - |B_{r-1}|)/r from the per-node estimates. The md5 register
# arithmetic is the engine's portable HLL (sketches.py), so the DuckDB
# oracle replays the identical registers; tests/test_round9_ops.py bounds
# the estimate against the exact bitset query.
# ---------------------------------------------------------------------------

_HB_RANK_SQL = """
      SELECT n, ('0x' || substr(hx, 1, 2))::INTEGER AS bucket,
             CASE WHEN regexp_replace(substr(hx, 3, 13), '^0+', '') = '' THEN 53
                  ELSE (length(substr(hx, 3, 13))
                        - length(regexp_replace(substr(hx, 3, 13), '^0+', ''))) * 4
                       + CASE substr(regexp_replace(substr(hx, 3, 13), '^0+', ''), 1, 1)
                           WHEN '1' THEN 3
                           WHEN '2' THEN 2 WHEN '3' THEN 2
                           WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
                           ELSE 0 END
                       + 1 END AS r
      FROM (SELECT n, md5(CAST(n AS VARCHAR)) AS hx FROM nodes)"""

# per-node HLL estimate over (np, sp) with the EXACT op order of
# sketches.hll_estimate_col, so both engines produce bit-identical doubles
def _hb_est(np: str, sp: str) -> str:
    raw = f"({_HLL_ALPHA_M2!r} / ({sp} + CAST(256 - {np} AS DOUBLE)))"
    linear = f"(256.0 * ln(256.0 / CAST(256 - {np} AS DOUBLE)))"
    return (
        f"(CASE WHEN {raw} <= 640.0 AND CAST(256 - {np} AS DOUBLE) > 0 "
        f"THEN {linear} ELSE {raw} END)"
    )


@register(
    "graph_harmonic_hll",
    f"""
    WITH raw AS (
      SELECT DISTINCT least(o_custkey % 400, o_orderkey % 400) AS a,
             greatest(o_custkey % 400, o_orderkey % 400) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 400 <> o_orderkey % 400
    ),
    d1 AS (
      SELECT DISTINCT n, m FROM (
        SELECT a AS n, b AS m FROM raw UNION ALL SELECT b, a FROM raw)
    ),
    nodes AS (SELECT DISTINCT n FROM d1),
    b0 AS ({_HB_RANK_SQL}),
    b1 AS (
      SELECT n, bucket, max(r) AS r FROM (
        SELECT * FROM b0
        UNION ALL
        SELECT d1.n, b.bucket, b.r FROM d1 JOIN b0 b ON b.n = d1.m
      ) GROUP BY n, bucket
    ),
    b2 AS (
      SELECT n, bucket, max(r) AS r FROM (
        SELECT * FROM b1
        UNION ALL
        SELECT d1.n, b.bucket, b.r FROM d1 JOIN b1 b ON b.n = d1.m
      ) GROUP BY n, bucket
    ),
    b3 AS (
      SELECT n, bucket, max(r) AS r FROM (
        SELECT * FROM b2
        UNION ALL
        SELECT d1.n, b.bucket, b.r FROM d1 JOIN b2 b ON b.n = d1.m
      ) GROUP BY n, bucket
    ),
    e0 AS (SELECT n, count(*)::BIGINT AS np, sum(power(2.0, -r)) AS sp FROM b0 GROUP BY n),
    e1 AS (SELECT n, count(*)::BIGINT AS np, sum(power(2.0, -r)) AS sp FROM b1 GROUP BY n),
    e2 AS (SELECT n, count(*)::BIGINT AS np, sum(power(2.0, -r)) AS sp FROM b2 GROUP BY n),
    e3 AS (SELECT n, count(*)::BIGINT AS np, sum(power(2.0, -r)) AS sp FROM b3 GROUP BY n)
    SELECT e0.n AS node,
           round({_hb_est('e1.np', 'e1.sp')}, 6) AS est1,
           round({_hb_est('e2.np', 'e2.sp')}, 6) AS est2,
           round({_hb_est('e3.np', 'e3.sp')}, 6) AS est3,
           round(({_hb_est('e1.np', 'e1.sp')} - {_hb_est('e0.np', 'e0.sp')}) / 1
               + ({_hb_est('e2.np', 'e2.sp')} - {_hb_est('e1.np', 'e1.sp')}) / 2
               + ({_hb_est('e3.np', 'e3.sp')} - {_hb_est('e2.np', 'e2.sp')}) / 3,
               6) AS harmonic_hll
    FROM e0 JOIN e1 ON e1.n = e0.n JOIN e2 ON e2.n = e0.n JOIN e3 ON e3.n = e0.n
    """,
    doc="HyperBall harmonic centrality (Boldi-Vigna WWW'13) — the "
        "unbounded-domain scale path for graph_harmonic_centrality "
        "(VERDICT r8 #4): each node's r-hop ball is an HLL-256 register "
        "set; one radius round = one edge join + a (node,bucket) register "
        "max (associative, map-side combinable) — per-round cost ~ |E| x "
        "256, never |V|^2, and NO 400-id packing assumption; harmonic = "
        "sum_r (|B_r|-|B_(r-1)|)/r over per-node estimates; md5 register "
        "arithmetic identical on both engines, estimate-vs-exact error "
        "bounded in tests/test_round9_ops.py",
)
def graph_harmonic_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import hll_rank

    orders = load_table(spark, sf_dir, "orders")
    a = F.col("o_custkey") % 400
    b = F.col("o_orderkey") % 400
    raw = (
        orders.filter((F.col("o_orderkey") % 3 == 0) & (a != b))
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    d1 = (
        raw.select(F.col("a").alias("n"), F.col("b").alias("m"))
        .unionAll(raw.select(F.col("b").alias("n"), F.col("a").alias("m")))
        .distinct()
        # spread the edge list across the cluster BEFORE the merge rounds:
        # the register join expands each edge ~200x (sum_m |B(m)|), and AQE
        # sizes the stage from the small pre-join frame — without this the
        # whole expansion ran in 2 coalesced tasks (measured 4-5 s/round;
        # <1 s spread). Checkpointed so three rounds share one
        # materialization instead of rescanning orders.
        .repartition(spark.sparkContext.defaultParallelism, "m")
        .localCheckpoint(eager=False)
    )
    nodes = d1.select("n").distinct()
    h = F.md5(F.col("n").cast("string"))
    b0 = nodes.select(
        "n",
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bucket"),
        hll_rank(F.substring(h, 3, 13)).alias("r"),
    )

    def merge_round(prev: DataFrame) -> DataFrame:
        # B_r(n) = merge(B_{r-1}(n), B_{r-1}(m) for m in N(n)): one edge
        # join against the broadcast register table + a register max —
        # max is associative, so partials combine map-side. Each round is
        # localCheckpointed (registers are |V| x <=256 rows, tiny): the
        # downstream plan broadcasts EVERY round's estimate frame, and
        # without the cut each broadcast would recompute the whole round
        # chain from the scan — O(rounds^2) work (measured 12-28 s vs
        # ~1 s at sf0.1)
        neigh = d1.join(
            F.broadcast(prev.select(F.col("n").alias("m"), "bucket", "r")), "m"
        ).select("n", "bucket", "r")
        return (
            prev.unionByName(neigh)
            .groupBy("n", "bucket")
            .agg(F.max("r").alias("r"))
            .localCheckpoint(eager=False)
        )

    b1 = merge_round(b0)
    b2 = merge_round(b1)
    b3 = merge_round(b2)

    def est_frame(bframe: DataFrame, tag: str) -> DataFrame:
        return bframe.groupBy("n").agg(
            F.count("*").cast("long").alias(f"np{tag}"),
            F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias(f"sp{tag}"),
        )

    j = (
        est_frame(b0, "0")
        .join(F.broadcast(est_frame(b1, "1")), "n")
        .join(F.broadcast(est_frame(b2, "2")), "n")
        .join(F.broadcast(est_frame(b3, "3")), "n")
    )
    e = {k: _hb_est(f"np{k}", f"sp{k}") for k in "0123"}
    return j.select(
        F.col("n").alias("node"),
        F.expr(f"round({e['1']}, 6)").alias("est1"),
        F.expr(f"round({e['2']}, 6)").alias("est2"),
        F.expr(f"round({e['3']}, 6)").alias("est3"),
        F.expr(
            f"round(({e['1']} - {e['0']}) / 1 + ({e['2']} - {e['1']}) / 2 "
            f"+ ({e['3']} - {e['2']}) / 3, 6)"
        ).alias("harmonic_hll"),
    )


# ===========================================================================
# Round-9 wave 2: sequential testing (SPRT), exact Shapley attribution,
# empirical-Bayes shrinkage, Tukey post-hoc, Simpson diversity, k-truss,
# Bloom file skipping, personalized PageRank, IPF raking, multi-topic
# watermark alignment. Scheduled in the r10 backlog, driver-verified r10 (deliberate growth per
# VERDICT r8 #1's "freeze or resume deliberately").
# ===========================================================================

# ---------------------------------------------------------------------------
# Wald's SPRT (Wald, Ann. Math. Stat. 1945): the sequential A/B test that
# stops as soon as the evidence crosses a likelihood threshold, instead of
# waiting for a fixed n. The log-likelihood ratio for Bernoulli streams is
# LINEAR in the running counts, so the walk needs only (n, n1); the
# first-crossing decision is inherently sequential and runs as one ordered
# in-executor fold per monitored stream (the engine's holt/page-hinkley
# device). Monitored slice bounded to the first 5000 keys per stream by
# construction (a monitor watches a window, not the corpus).
# ---------------------------------------------------------------------------

# H0: p = 0.30, H1: p = 0.40; alpha = beta = 0.05 -> accept H1 when
# llr >= ln(19), accept H0 when llr <= -ln(19). Literals are shared text.
_SPRT_L1 = "0.2876820724517809"   # ln(0.40/0.30)
_SPRT_L0 = "-0.15415067982725836"  # ln(0.60/0.70)
_SPRT_A = "2.9444389791664403"    # ln(19)


def _sprt_fold(acc: str, e: str) -> str:
    llr = f"(({acc}[2] + {e}) * {_SPRT_L1} + ({acc}[1] + 1 - ({acc}[2] + {e})) * {_SPRT_L0})"
    return (
        f"[{acc}[1] + 1, {acc}[2] + {e}, "
        f"CASE WHEN {acc}[3] <> 0.0 THEN {acc}[3] "
        f"WHEN {llr} >= {_SPRT_A} THEN 1.0 "
        f"WHEN {llr} <= -{_SPRT_A} THEN -1.0 ELSE 0.0 END, "
        f"CASE WHEN {acc}[4] > 0.0 THEN {acc}[4] "
        f"WHEN {llr} >= {_SPRT_A} OR {llr} <= -{_SPRT_A} THEN {acc}[1] + 1 "
        f"ELSE 0.0 END]"
    )


@register(
    "analytic_sprt",
    f"""
    WITH s AS (
      SELECT o_orderpriority AS pri, count(*)::BIGINT AS n_seen,
             sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n1,
             list(CASE WHEN o_orderstatus = 'F' THEN CAST(1.0 AS DOUBLE)
                       ELSE CAST(0.0 AS DOUBLE) END ORDER BY o_orderkey) AS xs
      FROM orders WHERE o_orderkey < 5000 GROUP BY o_orderpriority
    ),
    r AS (
      SELECT pri, n_seen, n1,
             list_reduce(
               list_prepend(
                 [CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
                  CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)],
                 list_transform(xs, v -> [v])),
               (acc, e) -> {_sprt_fold('acc', 'e[1]')}
             ) AS st
      FROM s
    )
    SELECT pri AS o_orderpriority, n_seen, n1,
           round(st[2] * {_SPRT_L1} + (st[1] - st[2]) * {_SPRT_L0}, 6) AS llr_final,
           CASE WHEN st[3] > 0.5 THEN 'accept_h1'
                WHEN st[3] < -0.5 THEN 'accept_h0' ELSE 'continue' END AS decision,
           CAST(st[4] AS BIGINT) AS decided_at
    FROM r
    """,
    doc="Wald SPRT (1945), H0 p=0.30 vs H1 p=0.40, alpha=beta=0.05: the "
        "sequential test that decides at the FIRST llr threshold crossing "
        "— Bernoulli llr is linear in (n, successes), so the walk is one "
        "ordered fold with a flat 4-double accumulator per monitored "
        "stream (key-ordered, first-5000-keys window by construction); "
        "identical fold text on both engines",
)
def analytic_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    x = F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
    s = orders.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count("*").cast("long").alias("n_seen"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("long").alias("n1"),
        F.expr(
            "transform(array_sort(collect_list(struct(o_orderkey, "
            "CASE WHEN o_orderstatus = 'F' THEN CAST(1.0 AS DOUBLE) "
            "ELSE CAST(0.0 AS DOUBLE) END AS x))), p -> p.x)"
        ).alias("xs"),
    )
    body = _sprt_fold("acc", "e")
    assert body.startswith("[") and body.endswith("]")
    spark_body = (
        "array(" + body[1:-1].replace("acc[", "element_at(acc, ").replace("]", ")") + ")"
    )
    fold = (
        "aggregate(xs, array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), "
        "CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)), "
        f"(acc, e) -> {spark_body})"
    )
    return s.select(
        F.col("pri").alias("o_orderpriority"),
        "n_seen",
        "n1",
        F.expr(
            f"round(element_at({fold}, 2) * {_SPRT_L1} "
            f"+ (element_at({fold}, 1) - element_at({fold}, 2)) * {_SPRT_L0}, 6)"
        ).alias("llr_final"),
        F.expr(
            f"CASE WHEN element_at({fold}, 3) > 0.5 THEN 'accept_h1' "
            f"WHEN element_at({fold}, 3) < -0.5 THEN 'accept_h0' "
            f"ELSE 'continue' END"
        ).alias("decision"),
        F.expr(f"CAST(element_at({fold}, 4) AS BIGINT)").alias("decided_at"),
    )


# ---------------------------------------------------------------------------
# Exact Shapley attribution over 3 marketing channels (Shapley 1953; the
# data-driven attribution model behind ad platforms): coalition value
# v(S) = conversion rate of users whose touch-set is EXACTLY S, and with
# |N| = 3 the permutation average collapses to a closed form over the 8
# subset rates — all from ONE conditional aggregation of integer counts
# (map-side combinable; at 100 TB the shuffle is 16 longs), no
# permutation enumeration, no window. Weights: marginal from empty set
# 1/3, from 1-sets 1/6 each, completing the grand coalition 1/3.
# ---------------------------------------------------------------------------

def _shap_rate(c: str, v: str) -> str:
    return f"(CASE WHEN {c} = 0 THEN 0.0 ELSE CAST({v} AS DOUBLE) / {c} END)"


def _shap_phi(i: str, j: str, k: str) -> str:
    """Shapley value of channel i against the other two (j, k): shared-text
    expression over the subset count/conversion columns c_<set>, v_<set>
    where set names are sorted channel concatenations ('' for empty)."""
    def r(chans: str) -> str:
        key = "".join(sorted(chans)) or "none"
        return _shap_rate(f"c_{key}", f"v_{key}")

    return (
        f"(({r(i)} - {r('')}) / 3"
        f" + ({r(i + j)} - {r(j)}) / 6"
        f" + ({r(i + k)} - {r(k)}) / 6"
        f" + ({r(i + j + k)} - {r(j + k)}) / 3)"
    )


_SHAP_SETS = ["none", "c", "s", "v", "cs", "cv", "sv", "csv"]


def _shap_agg_sql() -> str:
    cols = []
    for key in _SHAP_SETS:
        cond = " AND ".join(
            f"has_{ch} = {1 if (key != 'none' and ch in key) else 0}" for ch in "csv"
        )
        cols.append(f"count(*) FILTER ({cond})::BIGINT AS c_{key}")
        cols.append(f"sum(CASE WHEN {cond} THEN conv ELSE 0 END)::BIGINT AS v_{key}")
    return ",\n             ".join(cols)


@register(
    "analytic_shapley_channels",
    f"""
    WITH touch AS (
      SELECT user_id,
             max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_c,
             max(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_s,
             max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_v,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ),
    agg AS (
      SELECT {_shap_agg_sql()}
      FROM touch
    ),
    chan AS (SELECT unnest(['click', 'signup', 'view']) AS channel)
    SELECT channel,
           round(CASE channel
                   WHEN 'click' THEN {_shap_phi('c', 's', 'v')}
                   WHEN 'signup' THEN {_shap_phi('s', 'c', 'v')}
                   ELSE {_shap_phi('v', 'c', 's')} END, 6) AS shapley,
           round({_shap_rate('c_csv', 'v_csv')} - {_shap_rate('c_none', 'v_none')}, 6)
             AS grand_minus_null
    FROM agg CROSS JOIN chan
    """,
    doc="exact 3-channel Shapley attribution (Shapley 1953): coalition "
        "value = conversion rate of users touched by EXACTLY that channel "
        "set; with |N|=3 the permutation average closes over the 8 subset "
        "rates — ONE conditional aggregation of 16 longs (map-side "
        "combinable), zero permutation enumeration; the additive credit "
        "split ad attribution uses when last-touch double-counts",
)
def analytic_shapley_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    touch = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("has_c"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("has_s"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("has_v"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("conv"),
    )
    aggs = []
    for key in _SHAP_SETS:
        cond = None
        for ch in "csv":
            want = 1 if (key != "none" and ch in key) else 0
            c = F.col(f"has_{ch}") == want
            cond = c if cond is None else (cond & c)
        aggs.append(F.count(F.when(cond, 1)).cast("long").alias(f"c_{key}"))
        aggs.append(F.sum(F.when(cond, F.col("conv")).otherwise(0)).cast("long").alias(f"v_{key}"))
    agg = touch.agg(*aggs)
    chan = spark.createDataFrame([("click",), ("signup",), ("view",)], "channel string")
    return agg.crossJoin(F.broadcast(chan)).select(
        "channel",
        F.expr(
            f"round(CASE channel WHEN 'click' THEN {_shap_phi('c', 's', 'v')} "
            f"WHEN 'signup' THEN {_shap_phi('s', 'c', 'v')} "
            f"ELSE {_shap_phi('v', 'c', 's')} END, 6)"
        ).alias("shapley"),
        F.expr(
            f"round({_shap_rate('c_csv', 'v_csv')} - {_shap_rate('c_none', 'v_none')}, 6)"
        ).alias("grand_minus_null"),
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes (beta-binomial) shrinkage: per-brand discounted-item
# rates shrunk toward a method-of-moments beta prior — the small-n
# correction every per-segment rate dashboard needs (a brand with 3 items
# should not show rate 1.0). Group sums are exact longs; the prior's
# mean/variance over the 25 brand rates is an ordered fold (deterministic
# double order), and the shrinkage is a shared-text expression.
# ---------------------------------------------------------------------------

@register(
    "analytic_empirical_bayes",
    """
    WITH g AS (
      SELECT p.p_brand, count(*)::BIGINT AS n,
             sum(CASE WHEN l.l_discount > 0 THEN 1 ELSE 0 END)::BIGINT AS x
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand
    ),
    rates AS (SELECT p_brand, n, x, CAST(x AS DOUBLE) / n AS r FROM g),
    prior AS (
      SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(r ORDER BY p_brand)), (a, b) -> a + b) / count(*) AS m,
             count(*)::BIGINT AS k
      FROM rates
    ),
    prior2 AS (
      SELECT prior.m,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((r - prior.m) * (r - prior.m) ORDER BY p_brand)),
               (a, b) -> a + b) / prior.k AS v
      FROM rates CROSS JOIN prior GROUP BY prior.m, prior.k
    ),
    ab AS (
      SELECT m, v, m * (m * (1 - m) / v - 1) AS alpha,
             (1 - m) * (m * (1 - m) / v - 1) AS beta
      FROM prior2
    )
    SELECT r.p_brand, r.n, r.x, round(r.r, 6) AS raw_rate,
           round((r.x + ab.alpha) / (r.n + ab.alpha + ab.beta), 6) AS shrunk_rate,
           round(ab.alpha, 6) AS prior_alpha, round(ab.beta, 6) AS prior_beta
    FROM rates r CROSS JOIN ab
    """,
    doc="empirical-Bayes beta-binomial shrinkage of per-brand discount "
        "rates: method-of-moments prior (alpha, beta) from the 25 brand "
        "rates' mean/variance (ordered fold — deterministic double order), "
        "shrunk = (x + alpha)/(n + alpha + beta); exact long group sums, "
        "shared-text float arithmetic — the small-n dashboard correction",
)
def analytic_empirical_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    g = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("l_discount") > 0, 1).otherwise(0)).cast("long").alias("x"),
        )
    )
    rates = g.select("p_brand", "n", "x", F.expr("CAST(x AS DOUBLE) / n").alias("r"))
    prior = rates.agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(p_brand, r))), "
            "p -> p.r), CAST(0.0 AS DOUBLE), (a, b) -> a + b) / count(*)"
        ).alias("m"),
        F.count("*").cast("long").alias("k"),
    )
    prior2 = (
        rates.crossJoin(F.broadcast(prior))
        .groupBy("m", "k")
        .agg(
            F.expr(
                "aggregate(transform(array_sort(collect_list(struct(p_brand, "
                "(r - m) * (r - m) AS d))), p -> p.d), CAST(0.0 AS DOUBLE), "
                "(a, b) -> a + b) / first(k)"
            ).alias("v")
        )
    )
    ab = prior2.select(
        "m", "v",
        F.expr("m * (m * (1 - m) / v - 1)").alias("alpha"),
        F.expr("(1 - m) * (m * (1 - m) / v - 1)").alias("beta"),
    )
    return rates.crossJoin(F.broadcast(ab)).select(
        "p_brand", "n", "x",
        F.round("r", 6).alias("raw_rate"),
        F.expr("round((x + alpha) / (n + alpha + beta), 6)").alias("shrunk_rate"),
        F.round("alpha", 6).alias("prior_alpha"),
        F.round("beta", 6).alias("prior_beta"),
    )


# ---------------------------------------------------------------------------
# Tukey-Kramer HSD post-hoc (Tukey 1949): after ANOVA says "some group
# differs", WHICH pairs differ — the studentized-range statistic per
# priority pair over order totals (cents). Every input (group counts,
# sums, sum of squares) is an EXACT value from ONE aggregation; the
# squared-cents power sum rides in DECIMAL(38,0) because its long twin
# overflows at sf0.1 (5e7 cents squared x 30k rows/group > 2^63 — caught
# by the round-9 bench; DuckDB auto-promotes the same sum to HUGEINT).
# MSW and the 10 pairwise q statistics are shared-text float expressions
# over a bounded 5x5 group self-join. Completes analytic_anova_oneway.
# ---------------------------------------------------------------------------

_TUKEY_Q = (
    "((ma - mb) / sqrt(msw / 2 * (1.0 / na + 1.0 / nb)))"
)


@register(
    "analytic_tukey_hsd",
    f"""
    WITH g AS (
      SELECT o_orderpriority AS pri, count(*)::BIGINT AS n,
             sum(CAST(round(o_totalprice * 100) AS BIGINT))::BIGINT AS s,
             sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                 * CAST(round(o_totalprice * 100) AS BIGINT) AS DECIMAL(38,0)))
               AS ss
      FROM orders GROUP BY o_orderpriority
    ),
    msw AS (
      SELECT (sum(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n))
             / (sum(n) - count(*)) AS msw
      FROM g
    ),
    pairs AS (
      SELECT a.pri AS pri_a, b.pri AS pri_b,
             a.n AS na_l, b.n AS nb_l,
             CAST(a.n AS DOUBLE) AS na, CAST(b.n AS DOUBLE) AS nb,
             CAST(a.s AS DOUBLE) / a.n AS ma, CAST(b.s AS DOUBLE) / b.n AS mb
      FROM g a JOIN g b ON a.pri < b.pri
    )
    SELECT pri_a, pri_b, na_l AS n_a, nb_l AS n_b,
           round(ma - mb, 6) AS mean_diff_cents,
           round({_TUKEY_Q}, 6) AS q_stat
    FROM pairs CROSS JOIN msw
    """,
    doc="Tukey-Kramer HSD post-hoc on order totals by priority: "
        "studentized-range q per group pair from exact long (n, sum, "
        "sum-of-squares) in one aggregation; MSW and the 10 pairwise "
        "statistics are shared-text floats over a bounded 5x5 self-join "
        "— the which-pair-differs step after analytic_anova_oneway",
)
def analytic_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    g = orders.groupBy(F.col("o_orderpriority").alias("pri")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(cents).cast("long").alias("s"),
        # DECIMAL(38,0): the long sum of squared cents overflows at sf0.1
        F.sum((cents * cents).cast("decimal(38,0)")).alias("ss"),
    )
    msw = g.agg(
        F.expr(
            "(sum(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n)) "
            "/ (sum(n) - count(*))"
        ).alias("msw")
    )
    a = g.select(
        F.col("pri").alias("pri_a"), F.col("n").alias("na_l"),
        F.expr("CAST(s AS DOUBLE) / n").alias("ma"),
    )
    b = g.select(
        F.col("pri").alias("pri_b"), F.col("n").alias("nb_l"),
        F.expr("CAST(s AS DOUBLE) / n").alias("mb"),
    )
    pairs = a.join(F.broadcast(b), F.col("pri_a") < F.col("pri_b")).select(
        "pri_a", "pri_b", "na_l", "nb_l",
        F.col("na_l").cast("double").alias("na"),
        F.col("nb_l").cast("double").alias("nb"),
        "ma", "mb",
    )
    return pairs.crossJoin(F.broadcast(msw)).select(
        "pri_a", "pri_b",
        F.col("na_l").alias("n_a"),
        F.col("nb_l").alias("n_b"),
        F.expr("round(ma - mb, 6)").alias("mean_diff_cents"),
        F.expr(f"round({_TUKEY_Q}, 6)").alias("q_stat"),
    )


# ---------------------------------------------------------------------------
# Simpson diversity per source (Simpson, Nature 1949): the probability two
# randomly drawn tokens differ — the corpus-health twin of per-doc entropy,
# EXACT in integer arithmetic (sum c(c-1) over N(N-1), no logs), so the
# score is reproducible bit-for-bit anywhere. One token groupBy, one
# source groupBy; both map-side combinable.
# ---------------------------------------------------------------------------

@register(
    "text_simpson_diversity",
    """
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tk
      FROM documents
    ),
    tc AS (SELECT source, tk, count(*)::BIGINT AS c FROM tok GROUP BY source, tk),
    s AS (
      SELECT source, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
             sum(c * (c - 1))::BIGINT AS same_pairs
      FROM tc GROUP BY source
    )
    SELECT source, n_tokens, n_types,
           CAST(((n_tokens * (n_tokens - 1) - same_pairs) * 1000000)
                // (n_tokens * (n_tokens - 1)) AS BIGINT) AS simpson_ppm
    FROM s
    """,
    doc="Simpson diversity index per source (1 - sum c(c-1)/N(N-1), the "
        "probability two random tokens differ): EXACT integer ppm — no "
        "logs, no floats, bit-reproducible on any engine; two map-side "
        "combinable groupBys, the corpus-health gauge that flags a source "
        "collapsing onto boilerplate vocabulary",
)
def text_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), "\\s+")).alias("tk"),
    )
    tc = tok.groupBy("source", "tk").agg(F.count("*").cast("long").alias("c"))
    s = tc.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count("*").cast("long").alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).cast("long").alias("same_pairs"),
    )
    return s.select(
        "source", "n_tokens", "n_types",
        F.expr(
            "((n_tokens * (n_tokens - 1) - same_pairs) * 1000000) "
            "div (n_tokens * (n_tokens - 1))"
        ).alias("simpson_ppm"),
    )


# ---------------------------------------------------------------------------
# k-truss filter (Cohen 2008): edges supported by >= k-2 triangles, the
# community-core detector denser than k-core (every surviving edge sits in
# k-2 triangles INSIDE the surviving subgraph). Two peel iterations, each
# exact: per-edge support = popcount of the two endpoints' adjacency
# BITMAP intersection (the engine's bitset device — the 400-id projected
# domain packs into 7 longs), so a round is one broadcast join against a
# 400-row bitmap table, never a wedge-enumeration join; the oracle
# recomputes supports independently by common-neighbor counting joins.
# ---------------------------------------------------------------------------

@register(
    "graph_k_truss",
    """
    WITH raw AS (
      SELECT DISTINCT least(o_custkey % 400, o_orderkey % 400) AS a,
             greatest(o_custkey % 400, o_orderkey % 400) AS b
      FROM orders
      WHERE o_orderkey % 5 = 0 AND o_custkey % 400 <> o_orderkey % 400
    ),
    d1 AS (SELECT a AS n, b AS m FROM raw UNION SELECT b, a FROM raw),
    s1 AS (
      SELECT r.a, r.b, count(*)::BIGINT AS sup
      FROM raw r JOIN d1 x ON x.n = r.a JOIN d1 y ON y.n = r.b AND y.m = x.m
      GROUP BY r.a, r.b
    ),
    e1 AS (SELECT a, b FROM s1 WHERE sup >= 2),
    d2 AS (SELECT a AS n, b AS m FROM e1 UNION SELECT b, a FROM e1),
    s2 AS (
      SELECT r.a, r.b, count(*)::BIGINT AS sup
      FROM e1 r JOIN d2 x ON x.n = r.a JOIN d2 y ON y.n = r.b AND y.m = x.m
      GROUP BY r.a, r.b
    )
    SELECT a, b, sup AS support FROM s2 WHERE sup >= 2
    """,
    doc="4-truss edge filter (Cohen 2008), two peel iterations: per-edge "
        "triangle support = popcount of the endpoints' adjacency-bitmap "
        "AND (bitset device, 7 longs per node on the projected domain) — "
        "each round is one broadcast bitmap join, no wedge-enumeration "
        "blowup; recomputed on the SURVIVING subgraph so support is "
        "truss-internal; oracle counts common neighbors via independent "
        "joins. Unbounded-domain path: degree-ordered wedge join "
        "(graph_triangle_count's shape) with per-edge aggregation",
)
def graph_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.col("o_custkey") % 400
    b = F.col("o_orderkey") % 400
    raw = (
        orders.filter((F.col("o_orderkey") % 5 == 0) & (a != b))
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_words = 7

    def adj_bitmaps(edges: DataFrame) -> DataFrame:
        d1 = edges.select(F.col("a").alias("n"), F.col("b").alias("m")).unionAll(
            edges.select(F.col("b").alias("n"), F.col("a").alias("m"))
        ).distinct()
        bit_of_m = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(m % 64 AS INT))")
        return d1.groupBy("n").agg(
            *[
                F.bit_or(
                    F.when(F.expr("m div 64") == w, bit_of_m).otherwise(F.lit(0).cast("long"))
                ).alias(f"w{w}")
                for w in range(n_words)
            ]
        )

    def support_filter(edges: DataFrame, k_minus_2: int) -> DataFrame:
        adj = adj_bitmaps(edges)
        aa = adj.select(F.col("n").alias("a"), *[F.col(f"w{w}").alias(f"aw{w}") for w in range(n_words)])
        bb = adj.select(F.col("n").alias("b"), *[F.col(f"w{w}").alias(f"bw{w}") for w in range(n_words)])
        sup = None
        for w in range(n_words):
            t = F.bit_count(F.col(f"aw{w}").bitwiseAND(F.col(f"bw{w}")))
            sup = t if sup is None else sup + t
        return (
            edges.join(F.broadcast(aa), "a")
            .join(F.broadcast(bb), "b")
            .select("a", "b", sup.cast("long").alias("support"))
            .filter(F.col("support") >= k_minus_2)
        )

    e1 = support_filter(raw, 2).select("a", "b").localCheckpoint(eager=False)
    return support_filter(e1, 2)


# ---------------------------------------------------------------------------
# Bloom-filter file skipping vs zone maps: the point-lookup pruning
# comparison behind Parquet column Blooms / Delta bloom indexes. Zone maps
# prune range-clustered keys; for a key UNCORRELATED with file order they
# prune nothing — the per-file Bloom (1024 bits, 4 md5 hashes, the
# engine's portable device) still skips most files at ~0.1% false-positive
# cost. Everything is file-METADATA-sized: blooms are 32 words per file,
# probes a fixed 40-key set, and the audit joins run on (files x probes).
# ---------------------------------------------------------------------------

@register(
    "layout_bloom_file_skipping",
    """
    WITH files AS (
      SELECT o_orderkey // 1000 AS file_id,
             min(o_custkey)::BIGINT AS zmin, max(o_custkey)::BIGINT AS zmax
      FROM orders GROUP BY o_orderkey // 1000
    ),
    nf AS (SELECT count(*)::BIGINT AS n_files FROM files),
    pos AS (
      SELECT o_orderkey // 1000 AS file_id,
             (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1 + 8*j.j, 8))::BIGINT
              % 1024) AS p
      FROM orders, unnest([0, 1, 2, 3]) AS j(j)
    ),
    bloom AS (
      SELECT file_id, CAST(p // 32 AS INT) AS word_idx,
             bit_or(1::BIGINT << CAST(p % 32 AS INT))::BIGINT AS bits
      FROM pos GROUP BY file_id, CAST(p // 32 AS INT)
    ),
    probes AS (SELECT unnest(generate_series(0, 39)) AS ck),
    ppos AS (
      SELECT ck,
             (('0x' || substr(md5(CAST(ck AS VARCHAR)), 1 + 8*j.j, 8))::BIGINT
              % 1024) AS p
      FROM probes, unnest([0, 1, 2, 3]) AS j(j)
    ),
    bloom_hits AS (
      SELECT pp.ck, f.file_id,
             count(*) FILTER (b.bits IS NOT NULL
                              AND (b.bits & (1::BIGINT << CAST(pp.p % 32 AS INT))) <> 0)
               ::BIGINT AS set_bits
      FROM ppos pp CROSS JOIN files f
      LEFT JOIN bloom b ON b.file_id = f.file_id AND b.word_idx = CAST(pp.p // 32 AS INT)
      GROUP BY pp.ck, f.file_id
    ),
    truth AS (
      SELECT DISTINCT o_custkey AS ck, o_orderkey // 1000 AS file_id
      FROM orders WHERE o_custkey < 40
    )
    SELECT p.ck AS probe_custkey, nf.n_files,
           (SELECT count(*) FROM files f
            WHERE p.ck < f.zmin OR p.ck > f.zmax)::BIGINT AS zone_skipped,
           (SELECT count(*) FROM bloom_hits bh
            WHERE bh.ck = p.ck AND bh.set_bits < 4)::BIGINT AS bloom_skipped,
           (nf.n_files - (SELECT count(*) FROM truth t WHERE t.ck = p.ck))::BIGINT
             AS truly_absent
    FROM probes p CROSS JOIN nf
    """,
    doc="Bloom vs zone-map file skipping for point lookups (the Parquet "
        "column-Bloom / Delta bloom-index trade): per simulated file a "
        "1024-bit 4-hash md5 Bloom (32 words — file METADATA scale), 40 "
        "probe keys; zone maps prune ~nothing for keys uncorrelated with "
        "file order while the Bloom skips every truly-absent file minus "
        "false positives (no false negatives — bloom_skipped <= "
        "truly_absent, asserted in tests)",
)
def layout_bloom_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sketches import bloom_positions

    orders = load_table(spark, sf_dir, "orders")
    fid = F.expr("o_orderkey div 1000")
    files = orders.groupBy(fid.alias("file_id")).agg(
        F.min("o_custkey").cast("long").alias("zmin"),
        F.max("o_custkey").cast("long").alias("zmax"),
    ).localCheckpoint(eager=False)
    nf = files.agg(F.count("*").cast("long").alias("n_files"))
    pos = orders.select(
        fid.alias("file_id"),
        F.explode(bloom_positions(F.col("o_custkey"))).alias("p"),
    )
    bloom = pos.groupBy(
        "file_id", F.expr("CAST(p div 32 AS INT)").alias("word_idx")
    ).agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")).alias("bits"))
    probes = spark.range(40).select(F.col("id").alias("ck"))
    ppos = probes.select("ck", F.explode(bloom_positions(F.col("ck"))).alias("p"))
    # (probe-position x file) LEFT join on the bloom word, then count set bits
    bh = (
        ppos.crossJoin(files.select("file_id"))
        .withColumn("word_idx", F.expr("CAST(p div 32 AS INT)"))
        .join(F.broadcast(bloom), ["file_id", "word_idx"], "left")
        .groupBy("ck", "file_id")
        .agg(
            F.count(
                F.when(
                    F.col("bits").isNotNull()
                    & (
                        F.col("bits").bitwiseAND(
                            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))")
                        )
                        != 0
                    ),
                    1,
                )
            )
            .cast("long")
            .alias("set_bits")
        )
    )
    bloom_skipped = bh.filter(F.col("set_bits") < 4).groupBy("ck").agg(
        F.count("*").cast("long").alias("bloom_skipped")
    )
    zone_skipped = (
        probes.crossJoin(F.broadcast(files))
        .filter((F.col("ck") < F.col("zmin")) | (F.col("ck") > F.col("zmax")))
        .groupBy("ck")
        .agg(F.count("*").cast("long").alias("zone_skipped"))
    )
    present = (
        orders.filter(F.col("o_custkey") < 40)
        .select(F.col("o_custkey").alias("ck"), fid.alias("file_id"))
        .distinct()
        .groupBy("ck")
        .agg(F.count("*").cast("long").alias("n_present"))
    )
    return (
        probes.crossJoin(F.broadcast(nf))
        .join(F.broadcast(zone_skipped), "ck", "left")
        .join(F.broadcast(bloom_skipped), "ck", "left")
        .join(F.broadcast(present), "ck", "left")
        .select(
            F.col("ck").alias("probe_custkey"),
            "n_files",
            F.coalesce(F.col("zone_skipped"), F.lit(0)).cast("long").alias("zone_skipped"),
            F.coalesce(F.col("bloom_skipped"), F.lit(0)).cast("long").alias("bloom_skipped"),
            (F.col("n_files") - F.coalesce(F.col("n_present"), F.lit(0)))
            .cast("long")
            .alias("truly_absent"),
        )
    )


# ---------------------------------------------------------------------------
# Personalized PageRank (the seed-biased variant behind related-item and
# trust propagation): teleport mass returns to the SEED set instead of
# all nodes, so rank localizes around the seeds. Same order-insensitive
# integer fixed-point device as graph_pagerank (value-oracle-exact via
# unrolled CTE stages); each iteration one edges-x-ranks join + one
# groupBy(dst).
# ---------------------------------------------------------------------------

_PPR_SCALE = 1_000_000_000_000


@register(
    "graph_personalized_pagerank",
    f"""
    WITH e AS (
      SELECT DISTINCT l_suppkey AS src, l_partkey % 100 AS dst FROM lineitem
    ),
    nodes AS (SELECT DISTINCT src AS node FROM e
              UNION SELECT DISTINCT dst AS node FROM e),
    deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
    seeds AS (SELECT node FROM nodes WHERE node % 10 = 0),
    ns AS (SELECT count(*) AS ns FROM seeds),
    r0 AS (SELECT nodes.node,
                  CASE WHEN nodes.node % 10 = 0 THEN {_PPR_SCALE} // ns.ns ELSE 0 END AS r
           FROM nodes CROSS JOIN ns),
    c1 AS (SELECT e.dst, sum(r0.r // d.deg) AS s
           FROM e JOIN r0 ON e.src = r0.node JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
    r1 AS (SELECT nodes.node,
                  CASE WHEN nodes.node % 10 = 0
                       THEN (15 * ({_PPR_SCALE} // ns.ns)) // 100 ELSE 0 END
                  + (85 * coalesce(c1.s, 0)) // 100 AS r
           FROM nodes CROSS JOIN ns LEFT JOIN c1 ON nodes.node = c1.dst),
    c2 AS (SELECT e.dst, sum(r1.r // d.deg) AS s
           FROM e JOIN r1 ON e.src = r1.node JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
    r2 AS (SELECT nodes.node,
                  CASE WHEN nodes.node % 10 = 0
                       THEN (15 * ({_PPR_SCALE} // ns.ns)) // 100 ELSE 0 END
                  + (85 * coalesce(c2.s, 0)) // 100 AS r
           FROM nodes CROSS JOIN ns LEFT JOIN c2 ON nodes.node = c2.dst),
    c3 AS (SELECT e.dst, sum(r2.r // d.deg) AS s
           FROM e JOIN r2 ON e.src = r2.node JOIN deg d ON e.src = d.src
           GROUP BY e.dst),
    r3 AS (SELECT nodes.node,
                  CASE WHEN nodes.node % 10 = 0
                       THEN (15 * ({_PPR_SCALE} // ns.ns)) // 100 ELSE 0 END
                  + (85 * coalesce(c3.s, 0)) // 100 AS r
           FROM nodes CROSS JOIN ns LEFT JOIN c3 ON nodes.node = c3.dst)
    SELECT node, r::BIGINT AS ppr FROM r3
    """,
    doc="personalized PageRank (3 iterations, damping 85/100, teleport to "
        "the node%10=0 seed set): rank localizes around seeds — the "
        "related-items / trust-propagation variant; same order-insensitive "
        "integer fixed-point as graph_pagerank, value-oracle-exact via "
        "unrolled CTEs, one join + one groupBy per iteration",
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_suppkey").alias("src"), (F.col("l_partkey") % 100).alias("dst")
    ).distinct().localCheckpoint(eager=False)
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ns = nodes.filter(F.col("node") % 10 == 0).agg(F.count("*").alias("ns"))
    seed_share = F.expr(f"CASE WHEN node % 10 = 0 THEN {_PPR_SCALE} div ns ELSE 0 END")
    seed_base = F.expr(
        f"CASE WHEN node % 10 = 0 THEN (15 * ({_PPR_SCALE} div ns)) div 100 ELSE 0 END"
    )
    ranks = nodes.crossJoin(F.broadcast(ns)).select("node", seed_share.alias("r"))
    for _ in range(3):
        contrib = (
            e.join(ranks, e.src == ranks.node)
            .join(deg, "src")
            .select("dst", F.expr("r div deg").alias("c"))
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.crossJoin(F.broadcast(ns))
            .join(incoming, nodes.node == incoming.dst, "left")
            .select(
                "node",
                (seed_base + F.expr("(85 * coalesce(s, 0)) div 100")).alias("r"),
            )
        )
    return ranks.select("node", F.col("r").cast("long").alias("ppr"))


# ---------------------------------------------------------------------------
# Multi-topic watermark alignment: a consumer over N partitioned CDC
# topics can only emit results up to the MINIMUM per-topic watermark (the
# slowest topic gates the join frontier — Structured Streaming's
# multi-source semantics, Kafka Streams' stream-time alignment). Per-topic
# max event time and the global min are two tiny aggregations; the lag
# column is the backpressure signal a rebalancer keys on.
# ---------------------------------------------------------------------------

@register(
    "cdc_watermark_alignment",
    """
    WITH t AS (
      SELECT 'orders_' || CAST(o_orderkey % 3 AS VARCHAR) AS topic,
             max(epoch(o_orderdate))::BIGINT AS wm_epoch_s,
             count(*)::BIGINT AS n_events
      FROM orders GROUP BY o_orderkey % 3
    ),
    g AS (SELECT min(wm_epoch_s)::BIGINT AS global_wm_s FROM t)
    SELECT topic, n_events, wm_epoch_s, g.global_wm_s,
           wm_epoch_s - g.global_wm_s AS lead_s
    FROM t CROSS JOIN g
    """,
    doc="multi-topic watermark alignment: the emit frontier of an N-topic "
        "consumer is the MIN of per-topic max event times (the slowest "
        "topic gates joins/windows — Structured Streaming multi-source "
        "semantics); per-topic lead over the global watermark is the "
        "skew/backpressure signal; two map-side-combinable aggregations",
)
def cdc_watermark_alignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    t = orders.groupBy(
        F.concat(F.lit("orders_"), (F.col("o_orderkey") % 3).cast("string")).alias("topic")
    ).agg(
        F.max(F.unix_timestamp("o_orderdate")).cast("long").alias("wm_epoch_s"),
        F.count("*").cast("long").alias("n_events"),
    )
    g = t.agg(F.min("wm_epoch_s").cast("long").alias("global_wm_s"))
    return t.crossJoin(F.broadcast(g)).select(
        "topic", "n_events", "wm_epoch_s", "global_wm_s",
        (F.col("wm_epoch_s") - F.col("global_wm_s")).alias("lead_s"),
    )


# ---------------------------------------------------------------------------
# IPF raking (Deming & Stephan 1940): calibrate cell weights so both
# marginals match targets — the survey-weighting / dataset-rebalancing
# device (e.g. force a training mix to uniform strata x segment without
# per-cell resampling). Three row/column scaling rounds over the bounded
# 5x5 cell table; every marginal sum is an ordered fold so the float
# arithmetic is deterministic on both engines.
# ---------------------------------------------------------------------------

def _ipf_round_sql(win: str, wout: str) -> str:
    """One IPF round (rows then columns) as DuckDB CTE text."""
    return f"""
    {wout}_r AS (
      SELECT stratum,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(w ORDER BY segment)), (x, y) -> x + y) AS rsum
      FROM {win} GROUP BY stratum
    ),
    {wout}_a AS (
      SELECT c.stratum, c.segment, c.n, c.w * (t.row_target / r.rsum) AS w
      FROM {win} c JOIN {wout}_r r ON r.stratum = c.stratum CROSS JOIN targets t
    ),
    {wout}_c AS (
      SELECT segment,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(w ORDER BY stratum)), (x, y) -> x + y) AS csum
      FROM {wout}_a GROUP BY segment
    ),
    {wout} AS (
      SELECT a.stratum, a.segment, a.n, a.w * (t.col_target / c.csum) AS w
      FROM {wout}_a a JOIN {wout}_c c ON c.segment = a.segment CROSS JOIN targets t
    )"""


@register(
    "sample_raking_ipf",
    f"""
    WITH cells AS (
      SELECT c_nationkey % 5 AS stratum, c_mktsegment AS segment,
             count(*)::BIGINT AS n, CAST(count(*) AS DOUBLE) AS w
      FROM customer GROUP BY c_nationkey % 5, c_mktsegment
    ),
    targets AS (
      SELECT CAST(sum(n) AS DOUBLE) / 5 AS row_target,
             CAST(sum(n) AS DOUBLE) / 5 AS col_target
      FROM cells
    ),{_ipf_round_sql('cells', 'w1')},{_ipf_round_sql('w1', 'w2')},{_ipf_round_sql('w2', 'w3')}
    SELECT stratum, segment, n, round(w, 6) AS w_raked
    FROM w3
    """,
    doc="IPF raking (Deming-Stephan 1940), 3 row/column rounds: calibrate "
        "the 5x5 (stratum, segment) cell weights until both marginals hit "
        "uniform targets — the survey-weighting / training-mix-rebalance "
        "device that needs no per-row resampling; marginal sums are "
        "ordered folds (deterministic doubles), the cell table is bounded "
        "so every round is marginal-table-sized",
)
def sample_raking_ipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cells = cust.groupBy(
        (F.col("c_nationkey") % 5).alias("stratum"),
        F.col("c_mktsegment").alias("segment"),
    ).agg(F.count("*").cast("long").alias("n")).withColumn(
        "w", F.col("n").cast("double")
    )
    targets = cells.agg(
        F.expr("CAST(sum(n) AS DOUBLE) / 5").alias("row_target"),
        F.expr("CAST(sum(n) AS DOUBLE) / 5").alias("col_target"),
    )

    def fold_sum(key_col: str, order_col: str) -> F.Column:
        return F.expr(
            f"aggregate(transform(array_sort(collect_list(struct({order_col}, w))), "
            "p -> p.w), CAST(0.0 AS DOUBLE), (x, y) -> x + y)"
        )

    w = cells
    for _ in range(3):
        rsum = w.groupBy("stratum").agg(fold_sum("stratum", "segment").alias("rsum"))
        w = (
            w.join(F.broadcast(rsum), "stratum")
            .crossJoin(F.broadcast(targets))
            .select(
                "stratum", "segment", "n",
                F.expr("w * (row_target / rsum)").alias("w"),
            )
        )
        csum = w.groupBy("segment").agg(fold_sum("segment", "stratum").alias("csum"))
        w = (
            w.join(F.broadcast(csum), "segment")
            .crossJoin(F.broadcast(targets))
            .select(
                "stratum", "segment", "n",
                F.expr("w * (col_target / csum)").alias("w"),
            )
        )
    return w.select("stratum", "segment", "n", F.round("w", 6).alias("w_raked"))


# ---------------------------------------------------------------------------
# Round-9 wave 3 — eval/causal/survival statistics, market structure, and
# the Adamic-Adar completion of the link-prediction family. Same discipline
# as every other registered query: exact integer aggregates wherever a value
# can be exact, shared-text float expressions for everything derived, zero
# global windows.
# ---------------------------------------------------------------------------

# Adamic-Adar link prediction (Adamic & Adar, Social Networks 2003) — the
# third member of the link-prediction family beside graph_jaccard_linkpred
# (set overlap) and graph_resource_allocation (1/deg): each common neighbor
# z contributes 1/ln(deg(z)), the classic "friends-of-friends weighted by
# how selective the mutual friend is" score. The per-neighbor weight is
# quantized to integer micro-units through ONE shared expression (a common
# neighbor always has deg >= 2, so ln(deg) >= ln 2 > 0), making the pair
# sum pure long arithmetic. Same hub cap + capped-world degree discipline
# as the other two.

_AA_W = "CAST(round(1000000.0 / ln(CAST(deg AS DOUBLE))) AS BIGINT)"


@register(
    "graph_adamic_adar",
    f"""
    WITH raw AS (
      SELECT DISTINCT least(o_custkey % 400, o_orderkey % 400) AS a,
             greatest(o_custkey % 400, o_orderkey % 400) AS b
      FROM orders
      WHERE o_orderkey % 3 = 0 AND o_custkey % 400 <> o_orderkey % 400
    ),
    adj AS (
      SELECT a AS n, b AS m FROM raw UNION ALL SELECT b, a FROM raw
    ),
    deg AS (SELECT n, count(*)::BIGINT AS deg FROM adj GROUP BY n),
    keep AS (SELECT n FROM deg WHERE deg <= 100),
    capped AS (
      SELECT adj.n, adj.m FROM adj
      JOIN keep k1 ON k1.n = adj.n
      JOIN keep k2 ON k2.n = adj.m
    ),
    cdeg AS (SELECT n, count(*)::BIGINT AS deg FROM capped GROUP BY n),
    wedges AS (
      SELECT l.m AS node_a, r.m AS node_b, {_AA_W} AS w
      FROM capped l
      JOIN capped r ON r.n = l.n AND l.m < r.m
      JOIN cdeg d ON d.n = l.n
    ),
    scored AS (
      SELECT node_a, node_b, count(*)::BIGINT AS n_common,
             sum(w)::BIGINT AS aa_micro
      FROM wedges GROUP BY node_a, node_b
      HAVING count(*) >= 2
    )
    SELECT s.node_a, s.node_b, s.n_common, s.aa_micro
    FROM scored s
    LEFT JOIN raw e ON e.a = s.node_a AND e.b = s.node_b
    WHERE e.a IS NULL
    """,
    doc="Adamic-Adar link prediction: non-adjacent pairs scored by "
        "sum over common neighbors of 1/ln(deg(z)), the weight quantized "
        "to exact integer micro-units through one shared expression (deg "
        ">= 2 for any common neighbor, so ln > 0) — the pair aggregation "
        "is pure long arithmetic; hubs (deg > 100) removed before the "
        "wedge expansion, degrees recomputed on the capped world, new "
        "links only (adjacent pairs anti-joined), min 2 common neighbors",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = F.col("o_custkey") % 400
    b = F.col("o_orderkey") % 400
    raw = (
        orders.filter((F.col("o_orderkey") % 3 == 0) & (a != b))
        .select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .distinct()
    )
    adj = raw.select(F.col("a").alias("n"), F.col("b").alias("m")).unionAll(
        raw.select(F.col("b").alias("n"), F.col("a").alias("m"))
    )
    deg = adj.groupBy("n").agg(F.count("*").cast("long").alias("deg"))
    keep = deg.filter(F.col("deg") <= 100).select("n")
    capped = adj.join(keep, "n", "left_semi").join(
        keep.select(F.col("n").alias("m")), "m", "left_semi"
    )
    cdeg = capped.groupBy("n").agg(F.count("*").cast("long").alias("deg"))
    l = capped.select(F.col("n").alias("c"), F.col("m").alias("x"))
    r = capped.select(F.col("n").alias("c"), F.col("m").alias("y"))
    wedges = (
        l.join(r, "c")
        .filter(F.col("x") < F.col("y"))
        .join(cdeg.select(F.col("n").alias("c"), "deg"), "c")
        .select(
            F.col("x").alias("node_a"),
            F.col("y").alias("node_b"),
            F.expr(_AA_W).alias("w"),
        )
    )
    scored = (
        wedges.groupBy("node_a", "node_b")
        .agg(
            F.count("*").cast("long").alias("n_common"),
            F.sum("w").cast("long").alias("aa_micro"),
        )
        .filter(F.col("n_common") >= 2)
    )
    return scored.join(
        raw.select(F.col("a").alias("node_a"), F.col("b").alias("node_b")),
        ["node_a", "node_b"],
        "left_anti",
    )


# ---------------------------------------------------------------------------
# McNemar's test (McNemar, Psychometrika 1947) — THE paired comparison of
# two classifiers evaluated on the SAME examples (model A vs model B on one
# eval set: are their error rates actually different, given that most
# examples are easy for both?). Two deterministic document classifiers for
# the label lang='en' (a length gate and a word-count gate) produce the
# 2x2 concordance table; only the DISCORDANT cells b (A right, B wrong)
# and c (A wrong, B right) carry information. Continuity-corrected
# chi-square from exact integers, one float division at the end.
# ---------------------------------------------------------------------------

_MCNEMAR_CHI2 = (
    "(CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE) / CAST(b + c AS DOUBLE))"
)


@register(
    "analytic_mcnemar",
    f"""
    WITH d AS (
      SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS truth,
             CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END AS pred_a,
             CASE WHEN length(trim(text)) - length(replace(trim(text), ' ', ''))
                       + 1 >= 50 THEN 1 ELSE 0 END AS pred_b
      FROM documents
    ),
    cells AS (
      SELECT count(*)::BIGINT AS n,
             sum(CASE WHEN pred_a = truth AND pred_b = truth THEN 1 ELSE 0 END)::BIGINT AS both_right,
             sum(CASE WHEN pred_a = truth AND pred_b <> truth THEN 1 ELSE 0 END)::BIGINT AS b,
             sum(CASE WHEN pred_a <> truth AND pred_b = truth THEN 1 ELSE 0 END)::BIGINT AS c,
             sum(CASE WHEN pred_a <> truth AND pred_b <> truth THEN 1 ELSE 0 END)::BIGINT AS both_wrong
      FROM d
    )
    SELECT n, both_right, b AS only_a_right, c AS only_b_right, both_wrong,
           CASE WHEN b + c > 0 THEN round({_MCNEMAR_CHI2}, 6) ELSE NULL END AS mcnemar_chi2,
           CASE WHEN b + c > 0 AND {_MCNEMAR_CHI2} > 3.841 THEN 1 ELSE 0 END AS significant
    FROM cells
    """,
    doc="McNemar's paired classifier comparison on the documents eval set: "
        "2x2 concordance cells for two deterministic lang='en' classifiers "
        "(char-length gate vs word-count gate) in ONE combinable "
        "aggregation; continuity-corrected chi-square (|b-c|-1)^2/(b+c) "
        "from exact integers — the statistically honest way to compare two "
        "models scored on the same examples (a two-proportion z-test on "
        "overlapping eval sets overstates significance)",
)
def analytic_mcnemar(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("truth"),
        F.when(F.col("n_chars") >= 300, 1).otherwise(0).alias("pred_a"),
        F.expr(
            "CASE WHEN length(trim(text)) - length(replace(trim(text), ' ', ''))"
            " + 1 >= 50 THEN 1 ELSE 0 END"
        ).alias("pred_b"),
    )
    cells = d.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(
            F.when((F.col("pred_a") == F.col("truth")) & (F.col("pred_b") == F.col("truth")), 1).otherwise(0)
        ).cast("long").alias("both_right"),
        F.sum(
            F.when((F.col("pred_a") == F.col("truth")) & (F.col("pred_b") != F.col("truth")), 1).otherwise(0)
        ).cast("long").alias("b"),
        F.sum(
            F.when((F.col("pred_a") != F.col("truth")) & (F.col("pred_b") == F.col("truth")), 1).otherwise(0)
        ).cast("long").alias("c"),
        F.sum(
            F.when((F.col("pred_a") != F.col("truth")) & (F.col("pred_b") != F.col("truth")), 1).otherwise(0)
        ).cast("long").alias("both_wrong"),
    )
    return cells.select(
        "n",
        "both_right",
        F.col("b").alias("only_a_right"),
        F.col("c").alias("only_b_right"),
        "both_wrong",
        F.when(F.col("b") + F.col("c") > 0, F.expr(f"round({_MCNEMAR_CHI2}, 6)")).alias("mcnemar_chi2"),
        F.when(
            (F.col("b") + F.col("c") > 0) & (F.expr(_MCNEMAR_CHI2) > 3.841), 1
        )
        .otherwise(0)
        .alias("significant"),
    )


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman market concentration (Herfindahl 1950; the DOJ/FTC
# merger-screen statistic) per supplier nation: HHI = sum over firms of
# (share_i)^2 = sum(rev_i^2) / total^2 — so with revenues as exact cents
# the WHOLE statistic reduces to two exact integer aggregates (the squared
# sum rides in DECIMAL(38,0); its long twin overflows at sf1) and one
# shared-text float at the end. The concentration gauge for corpus sources
# as much as markets: swap nation->source and revenue->bytes.
# ---------------------------------------------------------------------------

# exact integer ppm: int128/decimal floor division, so the monopoly case
# is exactly 1e6 (a double-floor form loses the last ulp once total^2
# exceeds 2^53)
_HHI_PPM_SQL = (
    "((ssq * 1000000) // (CAST(total AS HUGEINT) * total))::BIGINT"
)
_HHI_PPM_SPARK = (
    "CAST((ssq * 1000000) div (CAST(total AS DECIMAL(38,0))"
    " * CAST(total AS DECIMAL(38,0))) AS BIGINT)"
)


@register(
    "analytic_hhi_concentration",
    f"""
    WITH rev AS (
      SELECT s.s_nationkey AS nationkey, l.l_suppkey AS suppkey,
             sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))::BIGINT AS r
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ),
    m AS (
      SELECT nationkey, count(*)::BIGINT AS n_firms, sum(r)::BIGINT AS total,
             sum(CAST(r AS HUGEINT) * r) AS ssq
      FROM rev GROUP BY nationkey
    )
    SELECT m.nationkey, n.n_name AS nation, n_firms, total AS total_cents,
           {_HHI_PPM_SQL} AS hhi_ppm
    FROM m JOIN nation n ON n.n_nationkey = m.nationkey
    """,
    doc="Herfindahl-Hirschman concentration per supplier nation: "
        "HHI = sum(rev_i^2)/total^2 over per-supplier revenue in exact "
        "cents — two combinable aggregations (squared sum in "
        "DECIMAL(38,0)/HUGEINT, long twin overflows at sf1), ppm by "
        "EXACT int128 floor division (the monopoly case is exactly 1e6); "
        "the concentration gauge that flags "
        "a market (or a training-corpus source mix) dominated by few "
        "producers — 2500 ppm-scaled is the antitrust 'highly "
        "concentrated' line",
)
def analytic_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    cents = F.expr(
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
    )
    rev = (
        li.join(
            F.broadcast(supp.select("s_suppkey", "s_nationkey")),
            li.l_suppkey == F.col("s_suppkey"),
        )
        .groupBy(
            F.col("s_nationkey").alias("nationkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(F.sum(cents).cast("long").alias("r"))
    )
    m = rev.groupBy("nationkey").agg(
        F.count("*").cast("long").alias("n_firms"),
        F.sum("r").cast("long").alias("total"),
        F.expr("sum(CAST(r AS DECIMAL(38,0)) * r)").alias("ssq"),
    )
    return m.join(
        F.broadcast(nat.select(F.col("n_nationkey").alias("nationkey"), "n_name")),
        "nationkey",
    ).select(
        "nationkey",
        F.col("n_name").alias("nation"),
        "n_firms",
        F.col("total").alias("total_cents"),
        F.expr(_HHI_PPM_SPARK).alias("hhi_ppm"),
    )


# ---------------------------------------------------------------------------
# TOST equivalence test (Schuirmann, J. Pharmacokinet. 1987) — the flipped
# hypothesis the A/B toolkit above cannot answer: not "did the treatment
# change anything" but "can we CLAIM the arms are the same within a margin"
# (the ship-it test for a refactor, a cheaper model, a new data pipeline —
# absence of evidence is not evidence of absence; TOST is). Two one-sided
# z-tests against +/-delta, delta = 2% of the pooled mean; equivalent iff
# BOTH reject at 1.645. Exact integer power sums in one combinable pass,
# everything derived via shared-text float expressions.
# ---------------------------------------------------------------------------

_TOST_EXPRS: tuple[tuple[str, str], ...] = (
    ("mean_a", "CAST(s1a AS DOUBLE) / 100.0 / CAST(na AS DOUBLE)"),
    ("mean_b", "CAST(s1b AS DOUBLE) / 100.0 / CAST(nb AS DOUBLE)"),
    ("var_a",
     "(CAST(s2a AS DOUBLE) / 10000.0 - CAST(na AS DOUBLE) * mean_a * mean_a)"
     " / (CAST(na AS DOUBLE) - 1)"),
    ("var_b",
     "(CAST(s2b AS DOUBLE) / 10000.0 - CAST(nb AS DOUBLE) * mean_b * mean_b)"
     " / (CAST(nb AS DOUBLE) - 1)"),
    ("se", "sqrt(var_a / CAST(na AS DOUBLE) + var_b / CAST(nb AS DOUBLE))"),
    ("delta",
     "0.02 * ((CAST(s1a AS DOUBLE) + CAST(s1b AS DOUBLE)) / 100.0"
     " / (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)))"),
    ("t_lower", "((mean_a - mean_b) + delta) / se"),
    ("t_upper", "(delta - (mean_a - mean_b)) / se"),
)


@register(
    "analytic_tost_equivalence",
    f"""
    WITH x AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS y,
             CASE WHEN (('0x' || substr(md5('tost' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5
                  THEN 1 ELSE 0 END AS arm_a
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT sum(CASE WHEN arm_a = 1 THEN 1 ELSE 0 END)::BIGINT AS na,
             sum(CASE WHEN arm_a = 1 THEN y ELSE 0 END)::BIGINT AS s1a,
             sum(CASE WHEN arm_a = 1 THEN y * y ELSE 0 END)::BIGINT AS s2a,
             sum(CASE WHEN arm_a = 0 THEN 1 ELSE 0 END)::BIGINT AS nb,
             sum(CASE WHEN arm_a = 0 THEN y ELSE 0 END)::BIGINT AS s1b,
             sum(CASE WHEN arm_a = 0 THEN y * y ELSE 0 END)::BIGINT AS s2b
      FROM x
    ),
    m AS (SELECT *, {_TOST_EXPRS[0][1]} AS mean_a, {_TOST_EXPRS[1][1]} AS mean_b FROM s),
    vv AS (SELECT *, {_TOST_EXPRS[2][1]} AS var_a, {_TOST_EXPRS[3][1]} AS var_b FROM m),
    se AS (SELECT *, {_TOST_EXPRS[4][1]} AS se, {_TOST_EXPRS[5][1]} AS delta FROM vv),
    t AS (SELECT *, {_TOST_EXPRS[6][1]} AS t_lower, {_TOST_EXPRS[7][1]} AS t_upper FROM se)
    SELECT na AS n_a, nb AS n_b,
           round(mean_a, 6) AS mean_a, round(mean_b, 6) AS mean_b,
           round(delta, 6) AS margin,
           round(t_lower, 6) AS t_lower, round(t_upper, 6) AS t_upper,
           CASE WHEN t_lower > 1.645 AND t_upper > 1.645 THEN 1 ELSE 0 END AS equivalent
    FROM t
    """,
    doc="TOST equivalence test on the hashed 50/50 purchase-value split: "
        "two one-sided z-statistics against a +/-2%-of-pooled-mean margin "
        "from exact integer power sums in ONE combinable aggregation — "
        "equivalent iff BOTH one-sided tests reject at 1.645; the ship-it "
        "gate for claiming a refactor/cheaper-variant changed nothing, "
        "which a non-significant t-test can never license",
)
def analytic_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    x = ev.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100).cast("long").alias("y"),
        F.when(hash_fraction(F.col("user_id"), "tost") < 0.5, 1)
        .otherwise(0)
        .alias("arm_a"),
    )
    is_a = F.col("arm_a") == 1
    s = x.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("long").alias("na"),
        F.sum(F.when(is_a, F.col("y")).otherwise(0)).cast("long").alias("s1a"),
        F.sum(F.when(is_a, F.expr("y * y")).otherwise(0)).cast("long").alias("s2a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("long").alias("nb"),
        F.sum(F.when(~is_a, F.col("y")).otherwise(0)).cast("long").alias("s1b"),
        F.sum(F.when(~is_a, F.expr("y * y")).otherwise(0)).cast("long").alias("s2b"),
    )
    for name, expr in _TOST_EXPRS:
        s = s.withColumn(name, F.expr(expr))
    return s.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.expr("round(mean_a, 6)").alias("mean_a"),
        F.expr("round(mean_b, 6)").alias("mean_b"),
        F.expr("round(delta, 6)").alias("margin"),
        F.expr("round(t_lower, 6)").alias("t_lower"),
        F.expr("round(t_upper, 6)").alias("t_upper"),
        F.when((F.col("t_lower") > 1.645) & (F.col("t_upper") > 1.645), 1)
        .otherwise(0)
        .alias("equivalent"),
    )


# ---------------------------------------------------------------------------
# Pinball (quantile) loss backtest — the proper scoring rule for quantile
# forecasts (Koenker & Bassett 1978): train p10/p50/p90 on the first 20
# days of event values, score them on the holdout tail. A model that
# minimizes pinball loss at quantile q IS the q-quantile, so this is the
# evaluation beside analytic_forecast_backtest (which scores the mean
# path). Forecasts are the exact linear-interpolation percentiles (shared
# Spark percentile / DuckDB quantile_cont device); each holdout row's loss
# is quantized to an exact integer micro-unit through ONE shared-text
# expression, so the sum is pure long arithmetic — no float accumulation.
# ---------------------------------------------------------------------------

_PINBALL_TERM = (
    "CAST(round(CASE WHEN CAST(y AS DOUBLE) >= f"
    " THEN CAST(qt AS DOUBLE) * (CAST(y AS DOUBLE) - f)"
    " ELSE (10.0 - CAST(qt AS DOUBLE)) * (f - CAST(y AS DOUBLE)) END / 10.0)"
    " AS BIGINT)"
)


@register(
    "analytic_pinball_loss",
    f"""
    WITH v AS (
      SELECT CAST(round(value * 1000000) AS BIGINT) AS y,
             CASE WHEN strftime(ts, '%Y-%m-%d') < '2024-01-21' THEN 1 ELSE 0 END AS is_train
      FROM events
    ),
    q AS (
      SELECT quantile_cont(y, 0.1) AS p10, quantile_cont(y, 0.5) AS p50,
             quantile_cont(y, 0.9) AS p90
      FROM v WHERE is_train = 1
    ),
    f AS (
      SELECT 1::BIGINT AS qt, p10 AS f FROM q
      UNION ALL SELECT 5::BIGINT, p50 FROM q
      UNION ALL SELECT 9::BIGINT, p90 FROM q
    ),
    terms AS (
      SELECT f.qt, f.f, {_PINBALL_TERM} AS loss_micro
      FROM v CROSS JOIN f WHERE v.is_train = 0
    )
    SELECT qt AS quantile_tenths, count(*)::BIGINT AS n_eval,
           round(max(f) / 1000000.0, 6) AS forecast,
           sum(loss_micro)::BIGINT AS loss_sum_micro,
           round(CAST(sum(loss_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)
                 / 1000000.0, 9) AS mean_pinball
    FROM terms GROUP BY qt
    """,
    doc="pinball-loss backtest of p10/p50/p90 event-value forecasts: "
        "train quantiles on days 1-20 (shared percentile/quantile_cont "
        "device), score the holdout tail with the proper scoring rule for "
        "quantile forecasts — per-row losses quantized to exact integer "
        "micro-units through one shared expression so the aggregation is "
        "pure long arithmetic; 3-row broadcast forecast table, one "
        "combinable groupBy",
)
def analytic_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        F.round(F.col("value") * 1000000).cast("long").alias("y"),
        F.when(F.date_format("ts", "yyyy-MM-dd") < "2024-01-21", 1)
        .otherwise(0)
        .alias("is_train"),
    )
    q = v.filter(F.col("is_train") == 1).agg(
        F.expr("percentile(y, 0.1)").alias("p10"),
        F.expr("percentile(y, 0.5)").alias("p50"),
        F.expr("percentile(y, 0.9)").alias("p90"),
    )
    f = q.select(
        F.explode(
            F.expr(
                "array(struct(CAST(1 AS BIGINT) AS qt, p10 AS f),"
                " struct(CAST(5 AS BIGINT) AS qt, p50 AS f),"
                " struct(CAST(9 AS BIGINT) AS qt, p90 AS f))"
            )
        ).alias("r")
    ).select("r.qt", "r.f")
    terms = (
        v.filter(F.col("is_train") == 0)
        .crossJoin(F.broadcast(f))
        .select("qt", "f", F.expr(_PINBALL_TERM).alias("loss_micro"))
    )
    return terms.groupBy(F.col("qt").alias("quantile_tenths")).agg(
        F.count("*").cast("long").alias("n_eval"),
        F.expr("round(max(f) / 1000000.0, 6)").alias("forecast"),
        F.sum("loss_micro").cast("long").alias("loss_sum_micro"),
        F.expr(
            "round(CAST(sum(loss_micro) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
            " / 1000000.0, 9)"
        ).alias("mean_pinball"),
    )


# ---------------------------------------------------------------------------
# Log-rank test (Mantel 1966) — does survival DIFFER between two cohorts,
# the hypothesis test on top of the registered Kaplan-Meier curve (which
# only estimates one group's survival). Same lifetime/censoring derivation
# as analytic_kaplan_meier, cohorts from the hashed user split; at each
# death time the observed group-A deaths are compared with the
# hypergeometric expectation d*n_a/n. All d/n counts exact integers via
# the same bounded death-time table + broadcast non-equi join; E and V are
# ordered folds over the <= 64-row table (zero-seeded, identical addition
# order both engines); chi-square is one shared float expression.
# ---------------------------------------------------------------------------

_LOGRANK_CHI2 = "((CAST(o_a AS DOUBLE) - e_a) * (CAST(o_a AS DOUBLE) - e_a) / v)"


@register(
    "analytic_logrank_test",
    f"""
    WITH ev AS (
      SELECT user_id, epoch_ns(ts) // 1000000000 AS secs FROM events
    ),
    g AS (SELECT max(secs) AS gmax FROM ev),
    u AS (
      SELECT user_id,
             (max(secs) - min(secs)) // 3600 AS dur,
             CASE WHEN max(secs) <= (SELECT gmax FROM g) - 6 * 3600
                  THEN 1 ELSE 0 END AS churned,
             CASE WHEN (('0x' || substr(md5('logrank' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < 0.5
                  THEN 1 ELSE 0 END AS grp_a
      FROM ev GROUP BY user_id
    ),
    dt AS (
      SELECT dur AS t, count(*)::BIGINT AS d,
             sum(CASE WHEN grp_a = 1 THEN 1 ELSE 0 END)::BIGINT AS d_a
      FROM u WHERE churned = 1 GROUP BY dur ORDER BY t LIMIT 64
    ),
    risk AS (
      SELECT dt.t, count(*)::BIGINT AS n,
             sum(CASE WHEN u.grp_a = 1 THEN 1 ELSE 0 END)::BIGINT AS n_a
      FROM dt JOIN u ON u.dur >= dt.t GROUP BY dt.t
    ),
    l AS (
      SELECT list({{'t': dt.t, 'd': dt.d, 'da': dt.d_a,
                   'n': risk.n, 'na': risk.n_a}} ORDER BY dt.t) AS a
      FROM dt JOIN risk ON dt.t = risk.t
    ),
    s AS (
      SELECT
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(a, y -> y.da)), (p, q) -> p + q) AS o_a,
        list_reduce(list_prepend(0.0,
          list_transform(a, y -> CAST(y.d AS DOUBLE) * CAST(y.na AS DOUBLE)
                                 / CAST(y.n AS DOUBLE))),
          (p, q) -> p + q) AS e_a,
        list_reduce(list_prepend(0.0,
          list_transform(a, y -> CASE WHEN y.n > 1 THEN
            CAST(y.d AS DOUBLE) * (CAST(y.na AS DOUBLE) / CAST(y.n AS DOUBLE))
            * (1.0 - CAST(y.na AS DOUBLE) / CAST(y.n AS DOUBLE))
            * (CAST(y.n AS DOUBLE) - CAST(y.d AS DOUBLE))
            / (CAST(y.n AS DOUBLE) - 1.0) ELSE 0.0 END)),
          (p, q) -> p + q) AS v
      FROM l
    )
    SELECT o_a, round(e_a, 6) AS e_a, round(v, 6) AS v,
           round({_LOGRANK_CHI2}, 6) AS logrank_chi2,
           CASE WHEN {_LOGRANK_CHI2} > 3.841 THEN 1 ELSE 0 END AS significant
    FROM s
    """,
    doc="log-rank survival comparison between hashed user cohorts: same "
        "censored-lifetime derivation as analytic_kaplan_meier, observed "
        "vs hypergeometric-expected group-A deaths at each of the "
        "earliest 64 death times — exact integer d/n via the bounded "
        "death table + broadcast non-equi join, E/V as zero-seeded "
        "ordered folds (identical addition order both engines), "
        "chi-square one shared expression; the A/B test for retention "
        "curves, where a means test is biased by censoring",
)
def analytic_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", (F.unix_micros("ts") / 1_000_000).cast("long").alias("secs")
    )
    g = ev.agg(F.max("secs").alias("gmax"))
    u = (
        ev.groupBy("user_id")
        .agg(F.min("secs").alias("lo"), F.max("secs").alias("hi"))
        .crossJoin(F.broadcast(g))
        .select(
            "user_id",
            ((F.col("hi") - F.col("lo")) / 3600).cast("long").alias("dur"),
            F.when(F.col("hi") <= F.col("gmax") - 6 * 3600, 1)
            .otherwise(0)
            .alias("churned"),
            F.when(hash_fraction(F.col("user_id"), "logrank") < 0.5, 1)
            .otherwise(0)
            .alias("grp_a"),
        )
    )
    dt = (
        u.filter(F.col("churned") == 1)
        .groupBy(F.col("dur").alias("t"))
        .agg(
            F.count("*").cast("long").alias("d"),
            F.sum(F.when(F.col("grp_a") == 1, 1).otherwise(0)).cast("long").alias("d_a"),
        )
        .orderBy("t")
        .limit(64)
    )
    risk = (
        u.join(F.broadcast(dt), u.dur >= dt.t)
        .groupBy("t")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("grp_a") == 1, 1).otherwise(0)).cast("long").alias("n_a"),
        )
    )
    rows = dt.join(risk, "t")
    l = rows.agg(
        F.array_sort(F.collect_list(F.struct("t", "d", "d_a", "n", "n_a"))).alias("a")
    )
    s = l.select(
        F.expr(
            "aggregate(a, CAST(0 AS BIGINT), (acc, y) -> acc + y.d_a)"
        ).alias("o_a"),
        F.expr(
            "aggregate(a, 0.0D, (acc, y) -> acc"
            " + CAST(y.d AS DOUBLE) * CAST(y.n_a AS DOUBLE) / CAST(y.n AS DOUBLE))"
        ).alias("e_a"),
        F.expr(
            "aggregate(a, 0.0D, (acc, y) -> acc + CASE WHEN y.n > 1 THEN"
            " CAST(y.d AS DOUBLE) * (CAST(y.n_a AS DOUBLE) / CAST(y.n AS DOUBLE))"
            " * (1.0D - CAST(y.n_a AS DOUBLE) / CAST(y.n AS DOUBLE))"
            " * (CAST(y.n AS DOUBLE) - CAST(y.d AS DOUBLE))"
            " / (CAST(y.n AS DOUBLE) - 1.0D) ELSE 0.0D END)"
        ).alias("v"),
    )
    return s.select(
        "o_a",
        F.expr("round(e_a, 6)").alias("e_a"),
        F.expr("round(v, 6)").alias("v"),
        F.expr(f"round({_LOGRANK_CHI2}, 6)").alias("logrank_chi2"),
        F.when(F.expr(_LOGRANK_CHI2) > 3.841, 1).otherwise(0).alias("significant"),
    )


# Full Gopher quality-rule document filter (Rae et al. 2021, "Scaling
# Language Models: Gopher", Table A1) — the registered
# text_repetition_gopher covers the repetition rules; this is the REST of
# the rule card: word count bounds, mean-word-length band, stop-word
# presence, alphabetic-word ratio, and symbol-density caps, each emitted
# as its own flag so a curation pipeline can tune per-rule. Thresholds
# follow the paper where the synthetic corpus exercises them (word count,
# mean word length, stop words) and keep the paper's values elsewhere.
# Everything is exact integer arithmetic over one token explode + one
# combinable groupBy; zero windows, zero floats.

@register(
    "text_gopher_quality_full",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tk
      FROM documents
    ),
    agg AS (
      SELECT doc_id,
             count(*)::BIGINT AS wc,
             sum(length(tk))::BIGINT AS wchars,
             count(DISTINCT CASE WHEN tk IN ('the','be','to','of','and','that','have','with','a')
                            THEN tk END)::BIGINT AS n_stop,
             sum(CASE WHEN regexp_matches(tk, '[a-z]') THEN 1 ELSE 0 END)::BIGINT AS n_alpha
      FROM tok GROUP BY doc_id
    ),
    sym AS (
      SELECT doc_id,
             (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
             ((length(text) - length(replace(text, '...', ''))) // 3)::BIGINT AS n_ellipsis
      FROM documents
    ),
    flags AS (
      SELECT a.doc_id, a.wc, (a.wchars * 1000) // a.wc AS mean_wlen_milli,
             a.n_stop, a.n_alpha,
             CASE WHEN a.wc BETWEEN 20 AND 80 THEN 1 ELSE 0 END AS ok_word_count,
             CASE WHEN (a.wchars * 1000) // a.wc BETWEEN 3000 AND 10000
                  THEN 1 ELSE 0 END AS ok_mean_wlen,
             CASE WHEN a.n_stop >= 2 THEN 1 ELSE 0 END AS ok_stopwords,
             CASE WHEN a.n_alpha * 10 >= a.wc * 8 THEN 1 ELSE 0 END AS ok_alpha_ratio,
             CASE WHEN (s.n_hash + s.n_ellipsis) * 10 <= a.wc THEN 1 ELSE 0 END AS ok_symbols
      FROM agg a JOIN sym s ON s.doc_id = a.doc_id
    )
    SELECT doc_id, wc, mean_wlen_milli, n_stop,
           ok_word_count, ok_mean_wlen, ok_stopwords, ok_alpha_ratio, ok_symbols,
           CASE WHEN ok_word_count + ok_mean_wlen + ok_stopwords
                     + ok_alpha_ratio + ok_symbols = 5 THEN 1 ELSE 0 END AS gopher_pass
    FROM flags
    """,
    doc="full Gopher quality-rule card (Rae et al. 2021 Table A1, minus "
        "the repetition rules registered as text_repetition_gopher): "
        "word-count bounds, mean-word-length band, >= 2 distinct stop "
        "words, >= 80% alphabetic words, symbol-density cap — each rule "
        "its own flag plus the conjunction, ALL exact integer arithmetic "
        "(ratios compared cross-multiplied), one token explode + one "
        "combinable groupBy, zero windows; the doc-level keep/drop gate "
        "of a Gopher/MassiveText-style curation pipeline",
)
def text_gopher_quality_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tk")
    )
    agg = tok.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("wc"),
        F.sum(F.length("tk")).cast("long").alias("wchars"),
        F.count_distinct(
            F.when(
                F.col("tk").isin(
                    "the", "be", "to", "of", "and", "that", "have", "with", "a"
                ),
                F.col("tk"),
            )
        ).cast("long").alias("n_stop"),
        F.sum(F.when(F.col("tk").rlike("[a-z]"), 1).otherwise(0))
        .cast("long")
        .alias("n_alpha"),
    )
    sym = docs.select(
        "doc_id",
        (F.length("text") - F.length(F.expr("replace(text, '#', '')")))
        .cast("long")
        .alias("n_hash"),
        F.expr("CAST((length(text) - length(replace(text, '...', ''))) div 3 AS BIGINT)")
        .alias("n_ellipsis"),
    )
    flags = agg.join(sym, "doc_id").select(
        "doc_id", "wc",
        F.expr("(wchars * 1000) div wc").alias("mean_wlen_milli"),
        "n_stop", "n_alpha",
        F.when(F.col("wc").between(20, 80), 1).otherwise(0).alias("ok_word_count"),
        F.when(F.expr("(wchars * 1000) div wc").between(3000, 10000), 1)
        .otherwise(0)
        .alias("ok_mean_wlen"),
        F.when(F.col("n_stop") >= 2, 1).otherwise(0).alias("ok_stopwords"),
        F.when(F.col("n_alpha") * 10 >= F.col("wc") * 8, 1)
        .otherwise(0)
        .alias("ok_alpha_ratio"),
        F.when((F.col("n_hash") + F.col("n_ellipsis")) * 10 <= F.col("wc"), 1)
        .otherwise(0)
        .alias("ok_symbols"),
    )
    return flags.select(
        "doc_id", "wc", "mean_wlen_milli", "n_stop",
        "ok_word_count", "ok_mean_wlen", "ok_stopwords", "ok_alpha_ratio",
        "ok_symbols",
        F.when(
            F.col("ok_word_count") + F.col("ok_mean_wlen") + F.col("ok_stopwords")
            + F.col("ok_alpha_ratio") + F.col("ok_symbols")
            == 5,
            1,
        )
        .otherwise(0)
        .alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# Content-defined chunking dedup (the LBFS/FastCDC idea — Muthitacharoen
# SOSP'01, Xia ATC'16 — at word granularity): cut AFTER any word whose
# hash lands in 1/8 of the space, so chunk boundaries depend only on LOCAL
# content and survive insertions/deletions that shift byte offsets — the
# property fixed-size chunking lacks and the reason every dedup store
# (Venti, Data Domain, restic, casync) uses CDC. Per-doc prefix sums are
# windows over <= ~100 words (bounded by doc length, never corpus size);
# chunk hashes land in one combinable per-source groupBy.
# ---------------------------------------------------------------------------

@register(
    "dedup_cdc_chunks",
    """
    WITH tok AS (
      SELECT doc_id, pos - 1 AS pos, tk,
             CASE WHEN ('0x' || substr(md5(tk), 1, 8))::BIGINT % 8 = 0
                  THEN 1 ELSE 0 END AS is_cut
      FROM (
        SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tk,
               generate_subscripts(string_split_regex(lower(trim(text)), '\\s+'), 1) AS pos
        FROM documents
      )
    ),
    chunked AS (
      SELECT doc_id, pos, tk,
             coalesce(sum(is_cut) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_idx
      FROM tok
    ),
    chunks AS (
      SELECT doc_id, chunk_idx,
             md5(string_agg(tk, ' ' ORDER BY pos)) AS chunk_hash,
             count(*)::BIGINT AS chunk_words
      FROM chunked GROUP BY doc_id, chunk_idx
    ),
    src AS (SELECT doc_id, source FROM documents)
    SELECT s.source,
           count(*)::BIGINT AS n_chunks,
           count(DISTINCT c.chunk_hash)::BIGINT AS n_distinct,
           sum(c.chunk_words)::BIGINT AS total_words,
           ((count(*) - count(DISTINCT c.chunk_hash)) * 1000000 // count(*))::BIGINT
             AS dup_ratio_ppm
    FROM chunks c JOIN src s ON s.doc_id = c.doc_id
    GROUP BY s.source
    """,
    doc="content-defined chunking dedup (LBFS/FastCDC at word granularity): "
        "cut after words whose md5 lands in 1/8 of the space, so chunk "
        "boundaries are shift-resistant (insertions move offsets but not "
        "downstream cuts — the property fixed-size chunking lacks); chunk "
        "identity = md5 of the order-joined words; per-source chunk counts, "
        "distinct chunks, and duplicate-ratio ppm in exact integers. "
        "Prefix sums are per-doc windows (bounded by doc length); the "
        "chunk and source aggregations are combinable — no corpus-wide "
        "window anywhere",
)
def dedup_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("pos", "tk"),
    ).withColumn(
        "is_cut",
        F.when(
            F.conv(F.substring(F.md5("tk"), 1, 8), 16, 10).cast("long") % 8 == 0, 1
        ).otherwise(0),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    chunked = tok.withColumn(
        "chunk_idx", F.coalesce(F.sum("is_cut").over(w), F.lit(0))
    )
    chunks = chunked.groupBy("doc_id", "chunk_idx").agg(
        F.md5(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(pos, tk))),"
                " x -> x.tk), ' ')"
            )
        ).alias("chunk_hash"),
        F.count("*").cast("long").alias("chunk_words"),
    )
    src = docs.select("doc_id", "source")
    return (
        chunks.join(src, "doc_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.count_distinct("chunk_hash").cast("long").alias("n_distinct"),
            F.sum("chunk_words").cast("long").alias("total_words"),
            F.expr(
                "CAST((count(*) - count(DISTINCT chunk_hash)) * 1000000"
                " div count(*) AS BIGINT)"
            ).alias("dup_ratio_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Chi-square feature selection (Yang & Pedersen ICML'97) — which terms are
# DISCRIMINATIVE for each class label, the feature-selection step before
# training any shallow text classifier (and the "what words define this
# source" diagnostic). One-vs-rest 2x2 contingency per (term, lang) from
# exact integer counts; chi2 through one shared-text float expression;
# top-10 per class with a deterministic term tie-break. The ranking window
# is vocabulary-bounded (term-level rows), never corpus-bounded.
# ---------------------------------------------------------------------------

_CHI2_EXPR = (
    "(CAST(n AS DOUBLE)"
    " * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
    " * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE) - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))"
    " / (CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)"
    "    * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)))"
)


@register(
    "analytic_chi2_feature_select",
    f"""
    WITH tok AS (
      SELECT lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    lt AS (SELECT lang, term, count(*)::BIGINT AS n_lt FROM tok GROUP BY lang, term),
    t AS (SELECT term, sum(n_lt)::BIGINT AS n_t FROM lt GROUP BY term),
    l AS (SELECT lang, sum(n_lt)::BIGINT AS n_l FROM lt GROUP BY lang),
    tot AS (SELECT sum(n_lt)::BIGINT AS n FROM lt),
    cells AS (
      SELECT lt.lang, lt.term,
             lt.n_lt AS a, t.n_t - lt.n_lt AS b,
             l.n_l - lt.n_lt AS c, tot.n - t.n_t - l.n_l + lt.n_lt AS d,
             tot.n AS n
      FROM lt JOIN t USING (term) JOIN l USING (lang) CROSS JOIN tot
      WHERE t.n_t >= 5
    ),
    scored AS (
      SELECT lang, term, a AS n_term_in_class,
             round({_CHI2_EXPR}, 6) AS chi2,
             row_number() OVER (PARTITION BY lang
                                ORDER BY {_CHI2_EXPR} DESC, term ASC) AS rnk
      FROM cells
    )
    SELECT lang, term, n_term_in_class, chi2, rnk FROM scored WHERE rnk <= 10
    """,
    doc="chi-square feature selection (Yang-Pedersen ICML'97): top-10 "
        "discriminative terms per language label via one-vs-rest 2x2 "
        "contingency from exact integer counts (terms with >= 5 "
        "occurrences), chi2 one shared float expression, deterministic "
        "term tie-break; the ranking window is vocabulary-bounded — the "
        "feature-selection pass before any shallow classifier, and the "
        "what-words-define-this-slice corpus diagnostic",
)
def analytic_chi2_feature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term")
    )
    lt = tok.groupBy("lang", "term").agg(F.count("*").cast("long").alias("n_lt"))
    t = lt.groupBy("term").agg(F.sum("n_lt").cast("long").alias("n_t"))
    l = lt.groupBy("lang").agg(F.sum("n_lt").cast("long").alias("n_l"))
    tot = lt.agg(F.sum("n_lt").cast("long").alias("n"))
    cells = (
        lt.join(F.broadcast(t), "term")
        .join(F.broadcast(l), "lang")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_t") >= 5)
        .select(
            "lang", "term",
            F.col("n_lt").alias("a"),
            (F.col("n_t") - F.col("n_lt")).alias("b"),
            (F.col("n_l") - F.col("n_lt")).alias("c"),
            (F.col("n") - F.col("n_t") - F.col("n_l") + F.col("n_lt")).alias("d"),
            "n",
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.expr(_CHI2_EXPR).desc(), F.col("term").asc()
    )
    return (
        cells.select(
            "lang", "term",
            F.col("a").alias("n_term_in_class"),
            F.expr(f"round({_CHI2_EXPR}, 6)").alias("chi2"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 10)
    )


# ---------------------------------------------------------------------------
# Krippendorff's alpha (Krippendorff 1970; nominal data) — the
# inter-rater reliability statistic for a PANEL of raters (the registered
# analytic_cohens_kappa handles exactly two). Three deterministic
# synthetic raters relabel each document's language with 70% fidelity;
# with complete data and m=3 raters the whole coincidence-matrix
# computation collapses to THREE exact integers (doubled off-diagonal
# coincidences A, doubled marginals total B, doubled-marginal cross
# product C) and alpha = 1 - A(B-2)/C — one float division, everything
# else pure long arithmetic. The LLM-judge-panel agreement gate.
# ---------------------------------------------------------------------------

@register(
    "analytic_krippendorff_alpha",
    """
    WITH base AS (
      SELECT doc_id,
             CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1 WHEN 'es' THEN 2
                       WHEN 'fr' THEN 3 ELSE 4 END AS true_c
      FROM documents
    ),
    ru AS (
      SELECT b.doc_id, b.true_c,
             ('0x' || substr(md5('rater' || CAST(r.r AS VARCHAR) || ':'
              || CAST(b.doc_id AS VARCHAR)), 1, 8))::BIGINT AS u
      FROM base b CROSS JOIN (SELECT unnest([1, 2, 3]) AS r) r
    ),
    ratings AS (
      SELECT doc_id,
             CASE WHEN u % 10 < 7 THEN true_c
                  ELSE (true_c + 1 + ((u // 10) % 4)) % 5 END AS cat
      FROM ru
    ),
    uc AS (
      SELECT doc_id, cat, count(*)::BIGINT AS n_uc
      FROM ratings GROUP BY doc_id, cat
    ),
    o2 AS (
      SELECT a.cat AS c, b.cat AS k,
             sum(a.n_uc * (b.n_uc - CASE WHEN a.cat = b.cat THEN 1 ELSE 0 END))::BIGINT
               AS o2
      FROM uc a JOIN uc b ON a.doc_id = b.doc_id
      GROUP BY a.cat, b.cat
    ),
    marg AS (SELECT c, sum(o2)::BIGINT AS nc2 FROM o2 GROUP BY c),
    s AS (
      SELECT (SELECT sum(o2) FROM o2 WHERE c <> k)::BIGINT AS a,
             (SELECT sum(nc2) FROM marg)::BIGINT AS b,
             (SELECT sum(m1.nc2 * m2.nc2) FROM marg m1
              JOIN marg m2 ON m1.c <> m2.c)::BIGINT AS c
    )
    SELECT a AS off_diag_2, b AS n_pairable_2, c AS cross_marg_2,
           round(1.0 - CAST(a AS DOUBLE) * (CAST(b AS DOUBLE) - 2.0)
                       / CAST(c AS DOUBLE), 9) AS krippendorff_alpha
    FROM s
    """,
    doc="Krippendorff's alpha (nominal) over a 3-rater deterministic "
        "panel relabeling document language at 70% fidelity: with "
        "complete data the coincidence-matrix computation collapses to "
        "three exact integers — doubled off-diagonal coincidences A, "
        "doubled pairable total B, doubled marginal cross product C — and "
        "alpha = 1 - A(B-2)/C, ONE float division; the multi-rater "
        "agreement gate for LLM-judge panels that analytic_cohens_kappa "
        "(2 raters) cannot score",
)
def analytic_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.expr(
            "CASE lang WHEN 'en' THEN 0 WHEN 'de' THEN 1 WHEN 'es' THEN 2"
            " WHEN 'fr' THEN 3 ELSE 4 END"
        ).alias("true_c"),
    )
    raters = spark.range(1, 4).select(F.col("id").alias("r"))
    ratings = (
        d.crossJoin(F.broadcast(raters))
        .withColumn(
            "u",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("rater"),
                            F.col("r").cast("string"),
                            F.lit(":"),
                            F.col("doc_id").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
        )
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN u % 10 < 7 THEN true_c"
                " ELSE (true_c + 1 + ((u div 10) % 4)) % 5 END"
            ).alias("cat"),
        )
    )
    uc = ratings.groupBy("doc_id", "cat").agg(F.count("*").cast("long").alias("n_uc"))
    a_side = uc.select("doc_id", F.col("cat").alias("c"), F.col("n_uc").alias("na"))
    b_side = uc.select("doc_id", F.col("cat").alias("k"), F.col("n_uc").alias("nb"))
    o2 = (
        a_side.join(b_side, "doc_id")
        .groupBy("c", "k")
        .agg(
            F.sum(
                F.col("na")
                * (F.col("nb") - F.when(F.col("c") == F.col("k"), 1).otherwise(0))
            )
            .cast("long")
            .alias("o2")
        )
    )
    marg = o2.groupBy("c").agg(F.sum("o2").cast("long").alias("nc2"))
    a_val = o2.filter(F.col("c") != F.col("k")).agg(
        F.sum("o2").cast("long").alias("a")
    )
    b_val = marg.agg(F.sum("nc2").cast("long").alias("b"))
    c_val = (
        marg.select(F.col("c").alias("c1"), F.col("nc2").alias("m1"))
        .join(
            F.broadcast(marg.select(F.col("c").alias("c2"), F.col("nc2").alias("m2"))),
            F.col("c1") != F.col("c2"),
        )
        .agg(F.sum(F.col("m1") * F.col("m2")).cast("long").alias("c"))
    )
    s = a_val.crossJoin(F.broadcast(b_val)).crossJoin(F.broadcast(c_val))
    return s.select(
        F.col("a").alias("off_diag_2"),
        F.col("b").alias("n_pairable_2"),
        F.col("c").alias("cross_marg_2"),
        F.expr(
            "round(1.0 - CAST(a AS DOUBLE) * (CAST(b AS DOUBLE) - 2.0)"
            " / CAST(c AS DOUBLE), 9)"
        ).alias("krippendorff_alpha"),
    )


# Stratified inverse-propensity-weighted ATT (Rosenbaum & Rubin 1983;
# Horvitz-Thompson weighting) — the observational-causal estimator when
# treatment probability VARIES by stratum (here deterministically: the
# assignment rate rises with the day-of-month stratum, exactly the
# confounding IPTW exists to undo). Propensities are exact per-stratum
# rationals from ONE combinable aggregation; the control re-weighting
# e/(1-e) and the ATT contrast are zero-seeded ordered folds over the
# 5-row stratum table — identical addition order both engines.

@register(
    "analytic_iptw_att",
    """
    WITH x AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS y,
             (day(ts) % 5)::BIGINT AS stratum,
             CASE WHEN (('0x' || substr(md5('iptw' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                        / 4294967296.0) < (0.2 + 0.1 * (day(ts) % 5))
                  THEN 1 ELSE 0 END AS treated
      FROM events WHERE event_type = 'purchase'
    ),
    s AS (
      SELECT stratum,
             sum(CASE WHEN treated = 1 THEN 1 ELSE 0 END)::BIGINT AS n_t,
             sum(CASE WHEN treated = 1 THEN y ELSE 0 END)::BIGINT AS s_t,
             sum(CASE WHEN treated = 0 THEN 1 ELSE 0 END)::BIGINT AS n_c,
             sum(CASE WHEN treated = 0 THEN y ELSE 0 END)::BIGINT AS s_c
      FROM x GROUP BY stratum
    ),
    l AS (
      SELECT list({'st': stratum, 'nt': n_t, 'st_': s_t, 'nc': n_c, 'sc': s_c}
                  ORDER BY stratum) AS a
      FROM s
    ),
    f AS (
      SELECT
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(a, y -> y.nt)), (p, q) -> p + q) AS n_t_tot,
        list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(a, y -> y.st_)), (p, q) -> p + q) AS s_t_tot,
        list_reduce(list_prepend(0.0,
          list_transform(a, y ->
            CASE WHEN y.nc > 0 AND y.nt > 0 THEN
            (CAST(y.nt AS DOUBLE) / (CAST(y.nt AS DOUBLE) + CAST(y.nc AS DOUBLE)))
            / (1.0 - CAST(y.nt AS DOUBLE) / (CAST(y.nt AS DOUBLE) + CAST(y.nc AS DOUBLE)))
            * CAST(y.sc AS DOUBLE) ELSE 0.0 END)), (p, q) -> p + q) AS wnum,
        list_reduce(list_prepend(0.0,
          list_transform(a, y ->
            CASE WHEN y.nc > 0 AND y.nt > 0 THEN
            (CAST(y.nt AS DOUBLE) / (CAST(y.nt AS DOUBLE) + CAST(y.nc AS DOUBLE)))
            / (1.0 - CAST(y.nt AS DOUBLE) / (CAST(y.nt AS DOUBLE) + CAST(y.nc AS DOUBLE)))
            * CAST(y.nc AS DOUBLE) ELSE 0.0 END)), (p, q) -> p + q) AS wden
      FROM l
    )
    SELECT n_t_tot, s_t_tot,
           round(CAST(s_t_tot AS DOUBLE) / CAST(n_t_tot AS DOUBLE), 6)
             AS mean_treated_cents,
           round(wnum / wden, 6) AS mean_control_weighted_cents,
           round(CAST(s_t_tot AS DOUBLE) / CAST(n_t_tot AS DOUBLE)
                 - wnum / wden, 6) AS att_cents
    FROM f
    """,
    doc="stratified IPTW ATT: treatment assignment rate varies "
        "deterministically by day-of-month stratum (the confounder), "
        "propensities are exact per-stratum rationals from ONE combinable "
        "aggregation, controls re-weighted by e/(1-e) via zero-seeded "
        "ordered folds over the 5-row stratum table — the "
        "Horvitz-Thompson estimator beside the matching (CEM) and "
        "regression (DiD/CUPED) members of the causal family; a naive "
        "means contrast here is confounded by construction",
)
def analytic_iptw_att(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    x = ev.filter(F.col("event_type") == "purchase").select(
        F.round(F.col("value") * 100).cast("long").alias("y"),
        (F.dayofmonth("ts") % 5).cast("long").alias("stratum"),
        F.when(
            hash_fraction(F.col("event_id"), "iptw")
            < (F.lit(0.2) + F.lit(0.1) * (F.dayofmonth("ts") % 5)),
            1,
        )
        .otherwise(0)
        .alias("treated"),
    )
    s = x.groupBy("stratum").agg(
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0)).cast("long").alias("n_t"),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0))
        .cast("long")
        .alias("s_t"),
        F.sum(F.when(F.col("treated") == 0, 1).otherwise(0)).cast("long").alias("n_c"),
        F.sum(F.when(F.col("treated") == 0, F.col("y")).otherwise(0))
        .cast("long")
        .alias("s_c"),
    )
    l = s.agg(
        F.array_sort(
            F.collect_list(F.struct("stratum", "n_t", "s_t", "n_c", "s_c"))
        ).alias("a")
    )
    _E = "(CAST(y.n_t AS DOUBLE) / (CAST(y.n_t AS DOUBLE) + CAST(y.n_c AS DOUBLE)))"
    f = l.select(
        F.expr("aggregate(a, CAST(0 AS BIGINT), (acc, y) -> acc + y.n_t)").alias(
            "n_t_tot"
        ),
        F.expr("aggregate(a, CAST(0 AS BIGINT), (acc, y) -> acc + y.s_t)").alias(
            "s_t_tot"
        ),
        # ADVICE r9: an all-treated stratum has e = 1, so e/(1-e) * n_c is
        # Infinity * 0 = NaN and poisons the whole fold — guard each term
        # on both tallies being nonzero (a zero-treated stratum contributes
        # weight 0 anyway; skipping it keeps the addition order identical)
        F.expr(
            "aggregate(a, 0.0D, (acc, y) -> acc +"
            f" CASE WHEN y.n_c > 0 AND y.n_t > 0 THEN {_E} / (1.0D - {_E})"
            " * CAST(y.s_c AS DOUBLE) ELSE 0.0D END)"
        ).alias("wnum"),
        F.expr(
            "aggregate(a, 0.0D, (acc, y) -> acc +"
            f" CASE WHEN y.n_c > 0 AND y.n_t > 0 THEN {_E} / (1.0D - {_E})"
            " * CAST(y.n_c AS DOUBLE) ELSE 0.0D END)"
        ).alias("wden"),
    )
    return f.select(
        "n_t_tot",
        "s_t_tot",
        F.expr("round(CAST(s_t_tot AS DOUBLE) / CAST(n_t_tot AS DOUBLE), 6)").alias(
            "mean_treated_cents"
        ),
        F.expr("round(wnum / wden, 6)").alias("mean_control_weighted_cents"),
        F.expr(
            "round(CAST(s_t_tot AS DOUBLE) / CAST(n_t_tot AS DOUBLE)"
            " - wnum / wden, 6)"
        ).alias("att_cents"),
    )


# ---------------------------------------------------------------------------
# Count-Sketch top-k audit (Charikar, Chen & Farach-Colton ICALP 2002) —
# the SIGNED sibling of the registered count-min sketch: each item hashes
# to one bucket per depth with a +/-1 sign, collisions cancel in
# expectation instead of stacking (count-min only over-estimates;
# count-sketch is unbiased), and the point estimate is the MEDIAN over
# depths. All registers and estimates are exact integers — the median of
# five longs is an array sort + element pick — so the audit of estimate
# vs exact count is bit-reproducible on any engine.
# ---------------------------------------------------------------------------

@register(
    "sketch_countsketch_topk",
    """
    WITH src AS (SELECT CAST(user_id AS VARCHAR) AS v FROM events),
    d AS (SELECT unnest([0, 1, 2, 3, 4]) AS j),
    h AS (
      SELECT d.j,
             ('0x' || substr(md5(d.j || ':' || src.v), 1, 4))::BIGINT % 64 AS bucket,
             CASE WHEN ('0x' || substr(md5('s' || d.j || ':' || src.v), 1, 4))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM src CROSS JOIN d
    ),
    reg AS (
      SELECT j, bucket, sum(sgn)::BIGINT AS r FROM h GROUP BY j, bucket
    ),
    exact AS (
      SELECT v, count(*)::BIGINT AS cnt FROM src GROUP BY v
    ),
    top AS (
      SELECT v, cnt FROM exact
      ORDER BY cnt DESC, v ASC LIMIT 10
    ),
    probes AS (
      SELECT t.v, t.cnt, d.j,
             ('0x' || substr(md5(d.j || ':' || t.v), 1, 4))::BIGINT % 64 AS bucket,
             CASE WHEN ('0x' || substr(md5('s' || d.j || ':' || t.v), 1, 4))::BIGINT % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM top t CROSS JOIN d
    ),
    est AS (
      SELECT p.v, p.cnt,
             list_sort(list(p.sgn * r.r))[3] AS cs_estimate
      FROM probes p JOIN reg r ON r.j = p.j AND r.bucket = p.bucket
      GROUP BY p.v, p.cnt
    )
    SELECT v AS item, cnt AS exact_cnt, cs_estimate,
           abs(cnt - cs_estimate)::BIGINT AS abs_err
    FROM est
    """,
    doc="count-sketch top-k audit (Charikar 2002): 5x64 SIGNED integer "
        "registers over event user_ids (salted-md5 bucket + sign hashes), "
        "point estimate = median over depths of sign*register — unbiased "
        "where count-min only over-counts; estimates for the top-10 exact "
        "heavy hitters with absolute error, every value an exact integer "
        "(median of 5 longs = sorted-array pick), registers mergeable by "
        "elementwise sum across any partitioning",
)
def sketch_countsketch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    src = ev.select(F.col("user_id").cast("string").alias("v"))
    d = spark.range(0, 5).select(F.col("id").alias("j"))
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.col("j").cast("string"), F.lit(":"), F.col("v"))), 1, 4),
        16,
        10,
    ).cast("long") % 64
    sgn = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("s"), F.col("j").cast("string"), F.lit(":"), F.col("v"))),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        1,
    ).otherwise(-1)
    h = src.crossJoin(F.broadcast(d)).select(
        "j", bucket.alias("bucket"), sgn.alias("sgn")
    )
    reg = h.groupBy("j", "bucket").agg(F.sum("sgn").cast("long").alias("r"))
    exact = src.groupBy("v").agg(F.count("*").cast("long").alias("cnt"))
    top = exact.orderBy(F.col("cnt").desc(), F.col("v").asc()).limit(10)
    probes = top.crossJoin(F.broadcast(d)).select(
        "v", "cnt", "j", bucket.alias("bucket"), sgn.alias("sgn")
    )
    est = (
        probes.join(F.broadcast(reg), ["j", "bucket"])
        .groupBy("v", "cnt")
        .agg(
            F.expr(
                "element_at(array_sort(collect_list(sgn * r)), 3)"
            ).alias("cs_estimate")
        )
    )
    return est.select(
        F.col("v").alias("item"),
        F.col("cnt").alias("exact_cnt"),
        "cs_estimate",
        F.abs(F.col("cnt") - F.col("cs_estimate")).cast("long").alias("abs_err"),
    )


# Bradley-Terry pairwise-preference ranking (Bradley & Terry 1952; MM
# iterations per Hunter, Ann. Stat. 2004) — the model behind
# chatbot-arena leaderboards and RLHF preference aggregation: given
# "a beat b" counts, find strengths pi maximizing the likelihood
# prod (pi_a/(pi_a+pi_b))^w_ab. Matches are derived deterministically
# from events with a built-in skill gradient (higher player index wins
# more), so the recovered ranking is testable. The pair-count table is
# BOUNDED (16 players -> <= 240 ordered pairs) after one combinable
# aggregation; the 8 MM iterations run on a single collected row via
# identical nested array folds on both engines (fixed iteration count,
# fixed fold order -> bit-identical doubles).

_BT_PLAYERS = 16
_BT_ITERS = 8


# The MM loop runs at RUNTIME inside one fold (accumulator = the pi
# array, folded over a dummy iteration sequence), so the expression tree
# stays one-step-sized on both engines. Unrolling the iterations as
# chained projections is a trap on BOTH sides: Catalyst's CollapseProject
# (and DuckDB's CTE inlining) substitutes each stage into the next and
# the tree grows ~3^k — the optimizer hangs before the query runs.

# raw_i(pi) = W_i / sum over matches involving i of n_m/(pi_a+pi_b)
_BT_RAW_SQL = (
    f"list_transform(generate_series(0, {_BT_PLAYERS - 1}), i -> "
    f"list_reduce(list_prepend(0.0, list_transform(ms, m -> "
    f"CASE WHEN m.a = i THEN CAST(m.w AS DOUBLE) ELSE 0.0 END)), (p, q) -> p + q)"
    f" / list_reduce(list_prepend(0.0, list_transform(ms, m -> "
    f"CASE WHEN m.a = i OR m.b = i THEN CAST(m.n AS DOUBLE)"
    f" / (pi[m.a + 1] + pi[m.b + 1])"
    f" ELSE 0.0 END)), (p, q) -> p + q))"
)
# full solve: fold k = 1.._BT_ITERS, each step normalizes raw to sum 1
_BT_SOLVE_SQL = (
    f"list_reduce(list_transform(generate_series(0, {_BT_ITERS}), k -> "
    f"list_transform(generate_series(0, {_BT_PLAYERS - 1}), i -> 1.0 / {_BT_PLAYERS})),"
    f" (pi, x) -> list_transform({_BT_RAW_SQL}, v -> v /"
    f" list_reduce(list_prepend(0.0, {_BT_RAW_SQL}), (p, q) -> p + q)))"
)
_BT_RAW_SPARK = (
    f"transform(sequence(0, {_BT_PLAYERS - 1}), i -> "
    f"aggregate(ms, 0.0D, (p, m) -> p +"
    f" CASE WHEN m.a = i THEN CAST(m.w AS DOUBLE) ELSE 0.0D END)"
    f" / aggregate(ms, 0.0D, (p, m) -> p +"
    f" CASE WHEN m.a = i OR m.b = i THEN CAST(m.n AS DOUBLE)"
    f" / (element_at(pi, CAST(m.a + 1 AS INT)) + element_at(pi, CAST(m.b + 1 AS INT)))"
    f" ELSE 0.0D END))"
)
_BT_SOLVE_SPARK = (
    f"aggregate(sequence(1, {_BT_ITERS}),"
    f" transform(sequence(0, {_BT_PLAYERS - 1}), i -> 1.0D / {_BT_PLAYERS}),"
    f" (pi, k) -> transform({_BT_RAW_SPARK}, v -> v /"
    f" aggregate({_BT_RAW_SPARK}, 0.0D, (p, q) -> p + q)))"
)


@register(
    "analytic_bradley_terry",
    f"""
    WITH m0 AS (
      SELECT (user_id % {_BT_PLAYERS})::BIGINT AS pa,
             ((user_id // {_BT_PLAYERS} + event_id) % {_BT_PLAYERS})::BIGINT AS pb,
             ('0x' || substr(md5('bt' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM events
    ),
    m1 AS (
      SELECT pa, pb,
             CASE WHEN u < (CAST(pa AS DOUBLE) + 1.0)
                           / (CAST(pa AS DOUBLE) + CAST(pb AS DOUBLE) + 2.0)
                  THEN pa ELSE pb END AS winner
      FROM m0 WHERE pa <> pb
    ),
    pairs AS (
      SELECT least(pa, pb) AS a, greatest(pa, pb) AS b,
             count(*)::BIGINT AS n,
             sum(CASE WHEN winner = least(pa, pb) THEN 1 ELSE 0 END)::BIGINT AS w
      FROM m1 GROUP BY least(pa, pb), greatest(pa, pb)
    ),
    packed AS (
      SELECT list({{'a': a, 'b': b, 'n': n, 'w': w}} ORDER BY a, b) AS ms0
      FROM pairs
    ),
    mirrored AS (
      SELECT list_concat(ms0,
               list_transform(ms0, m -> {{'a': m.b, 'b': m.a, 'n': m.n, 'w': m.n - m.w}}))
             AS ms
      FROM packed
    ),
    solved AS (SELECT {_BT_SOLVE_SQL} AS pi FROM mirrored)
    SELECT CAST(i - 1 AS BIGINT) AS player,
           round(pi[i] * 1000.0, 6) AS strength_permille
    FROM solved, unnest(generate_series(1, {_BT_PLAYERS})) AS t(i)
    """,
    doc="Bradley-Terry preference ranking (the chatbot-arena/RLHF "
        "leaderboard model), solved by 8 Hunter-2004 MM iterations: "
        "deterministic skill-graded matches from events, ordered-pair "
        "win counts in ONE combinable aggregation (bounded at 16 players "
        "-> <= 240 pairs), iterations as identical nested array folds "
        "over the single packed row on both engines (fixed order -> "
        "bit-identical doubles), strengths normalized to sum 1",
)
def analytic_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    m0 = ev.select(
        (F.col("user_id") % _BT_PLAYERS).cast("long").alias("pa"),
        (
            (F.expr(f"user_id div {_BT_PLAYERS}") + F.col("event_id")) % _BT_PLAYERS
        ).cast("long").alias("pb"),
        hash_fraction(F.col("event_id"), "bt").alias("u"),
    )
    m1 = m0.filter(F.col("pa") != F.col("pb")).select(
        "pa",
        "pb",
        F.expr(
            "CASE WHEN u < (CAST(pa AS DOUBLE) + 1.0D)"
            " / (CAST(pa AS DOUBLE) + CAST(pb AS DOUBLE) + 2.0D)"
            " THEN pa ELSE pb END"
        ).alias("winner"),
    )
    pairs = (
        m1.groupBy(
            F.least("pa", "pb").alias("a"), F.greatest("pa", "pb").alias("b")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("winner") == F.least("pa", "pb"), 1).otherwise(0))
            .cast("long")
            .alias("w"),
        )
    )
    packed = pairs.agg(
        F.array_sort(F.collect_list(F.struct("a", "b", "n", "w"))).alias("ms0")
    )
    both = packed.select(
        F.expr(
            "concat(ms0, transform(ms0, m ->"
            " struct(m.b AS a, m.a AS b, m.n AS n, m.n - m.w AS w))) AS ms"
        )
    )
    solved = both.select(F.expr(_BT_SOLVE_SPARK).alias("pi"))
    return solved.select(
        F.posexplode("pi").alias("player", "strength")
    ).select(
        F.col("player").cast("long").alias("player"),
        F.expr("round(strength * 1000.0D, 6)").alias("strength_permille"),
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language ID (the classic text-classification
# baseline; McCallum & Nigam AAAI'98 workshop) trained and evaluated
# IN-ENGINE: word-given-class counts with Laplace +1 smoothing, per-doc
# class scores as ordered folds of count * ln(p) over the doc's sorted
# term table, argmax with a deterministic class tie-break — then the
# confusion matrix against the true labels. Count tables are
# vocabulary-bounded broadcasts (the bigram-LM discipline); scoring joins
# the per-doc term counts once; ln/products/adds run in identical order
# on both engines so scores are bit-identical.
# ---------------------------------------------------------------------------

@register(
    "analytic_naive_bayes_langid",
    """
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    wc AS (SELECT lang AS c, w, count(*)::BIGINT AS n_wc FROM tok GROUP BY lang, w),
    cls AS (SELECT c, sum(n_wc)::BIGINT AS n_c FROM wc GROUP BY c),
    vocab AS (SELECT count(DISTINCT w)::BIGINT AS v FROM wc),
    prior AS (
      SELECT lang AS c, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang
    ),
    n AS (SELECT count(*)::BIGINT AS n_all FROM documents),
    grid AS (
      SELECT dw.doc_id, dw.w, dw.cnt, cl.c,
             coalesce(wc2.n_wc, 0) AS n_wc, cls.n_c, vocab.v
      FROM (SELECT doc_id, w, count(*)::BIGINT AS cnt FROM tok GROUP BY doc_id, w) dw
      CROSS JOIN (SELECT DISTINCT c FROM cls) cl
      LEFT JOIN wc wc2 ON wc2.c = cl.c AND wc2.w = dw.w
      JOIN cls ON cls.c = cl.c
      CROSS JOIN vocab
    ),
    scores AS (
      SELECT doc_id, c,
             list_reduce(list_prepend(0.0, list(
               CAST(cnt AS DOUBLE)
               * ln((CAST(n_wc AS DOUBLE) + 1.0) / (CAST(n_c AS DOUBLE) + CAST(v AS DOUBLE)))
               ORDER BY w)), (p, q) -> p + q) AS loglik
      FROM grid GROUP BY doc_id, c
    ),
    full_scores AS (
      SELECT s.doc_id, s.c,
             s.loglik + ln(CAST(p.n_docs AS DOUBLE) / CAST(n.n_all AS DOUBLE)) AS score
      FROM scores s JOIN prior p ON p.c = s.c CROSS JOIN n
    ),
    pred AS (
      -- argmax on the MICRO-QUANTIZED score: ln() is not guaranteed
      -- bit-identical between JVM and C libm, so raw-double ordering
      -- could flip near-tied classes across engines; quantization makes
      -- the ordering identical unless scores differ by < 5e-7
      SELECT doc_id, c AS predicted,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY CAST(round(score * 1000000) AS BIGINT) DESC,
                                         c ASC) AS rnk
      FROM full_scores
    )
    SELECT d.lang AS true_lang, p.predicted, count(*)::BIGINT AS n_docs
    FROM pred p JOIN documents d ON d.doc_id = p.doc_id
    WHERE p.rnk = 1
    GROUP BY d.lang, p.predicted
    """,
    doc="multinomial Naive Bayes language ID trained AND evaluated "
        "in-engine: Laplace-smoothed word-given-class log-probabilities "
        "from exact vocabulary-bounded count broadcasts, per-doc class "
        "scores as ordered folds (identical ln/mul/add order both "
        "engines), argmax on the MICRO-QUANTIZED score (ln is not "
        "guaranteed bit-identical across libm implementations; "
        "quantization makes the ordering engine-stable) with a "
        "deterministic class tie-break, output = "
        "the confusion matrix vs true labels — the shallow-classifier "
        "baseline a corpus pipeline runs before reaching for a model; "
        "near-chance on this synthetic corpus (shared vocabulary), "
        "measured honestly like text_langid_confusion",
)
def analytic_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    )
    wc = tok.groupBy(F.col("lang").alias("c"), "w").agg(
        F.count("*").cast("long").alias("n_wc")
    )
    cls = wc.groupBy("c").agg(F.sum("n_wc").cast("long").alias("n_c"))
    vocab = wc.agg(F.count_distinct("w").cast("long").alias("v"))
    prior = docs.groupBy(F.col("lang").alias("c")).agg(
        F.count("*").cast("long").alias("n_docs")
    )
    n_all = docs.agg(F.count("*").cast("long").alias("n_all"))
    dw = tok.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("cnt"))
    classes = cls.select("c").distinct()
    grid = (
        dw.crossJoin(F.broadcast(classes))
        .join(F.broadcast(wc), ["c", "w"], "left")
        .fillna(0, subset=["n_wc"])
        .join(F.broadcast(cls), "c")
        .crossJoin(F.broadcast(vocab))
    )
    scores = grid.groupBy("doc_id", "c").agg(
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(w, cnt, n_wc, n_c, v))),"
            " x -> CAST(x.cnt AS DOUBLE)"
            " * ln((CAST(x.n_wc AS DOUBLE) + 1.0D)"
            " / (CAST(x.n_c AS DOUBLE) + CAST(x.v AS DOUBLE)))),"
            " 0.0D, (p, q) -> p + q)"
        ).alias("loglik")
    )
    full_scores = (
        scores.join(F.broadcast(prior), "c")
        .crossJoin(F.broadcast(n_all))
        .select(
            "doc_id", "c",
            F.expr(
                "loglik + ln(CAST(n_docs AS DOUBLE) / CAST(n_all AS DOUBLE))"
            ).alias("score"),
        )
    )
    # micro-quantized argmax key: see the oracle comment — raw-double
    # ordering is vulnerable to last-ulp ln() divergence across engines
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.expr("CAST(round(score * 1000000) AS BIGINT)").desc(), F.col("c").asc()
    )
    pred = (
        full_scores.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") == 1)
        .select("doc_id", F.col("c").alias("predicted"))
    )
    return (
        pred.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy(F.col("lang").alias("true_lang"), "predicted")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# AR(2) fit via Yule-Walker (Yule 1927; Walker 1931) per user series —
# the autoregression on top of the registered analytic_autocorrelation:
# phi1 = r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/(1-r1^2) from the same exact
# integer cross-sums, plus the one-step-ahead forecast
# mean + phi1(x_n - mean) + phi2(x_{n-1} - mean). Everything derived
# through shared-text float expressions over exact longs; one shuffle on
# user_id, per-series work linear in-executor.
# ---------------------------------------------------------------------------

_AR2_R = "({num} / " + _ACF_DEN + ")"
_AR2_R1 = _AR2_R.format(num=_ACF_NUM.format(k=1))
_AR2_R2 = _AR2_R.format(num=_ACF_NUM.format(k=2))
_AR2_PHI1 = f"({_AR2_R1} * (1.0 - {_AR2_R2}) / (1.0 - {_AR2_R1} * {_AR2_R1}))"
_AR2_PHI2 = f"(({_AR2_R2} - {_AR2_R1} * {_AR2_R1}) / (1.0 - {_AR2_R1} * {_AR2_R1}))"
_AR2_FC = (
    "((CAST(s AS DOUBLE) / n)"
    f" + {_AR2_PHI1} * (CAST(xn AS DOUBLE) - CAST(s AS DOUBLE) / n)"
    f" + {_AR2_PHI2} * (CAST(xp AS DOUBLE) - CAST(s AS DOUBLE) / n))"
)
# ADVICE r9: |r1| = 1 exactly (possible on short quantized series, e.g. a
# strictly alternating two-value sequence) makes 1 - r1^2 = 0 and the
# Yule-Walker system singular — NULL the fit rather than ship +-Infinity,
# whose serialization differs across engines. Zero-variance series are
# filtered with the EXACT integer predicate n*s2 <> s*s (no float round
# trip), mirroring the n > 4 length gate.
_AR2_SING = f"((1.0 - {_AR2_R1} * {_AR2_R1}) = 0.0)"


@register(
    "analytic_ar2_yule_walker",
    f"""
    WITH q AS (
      SELECT user_id, CAST(round(value * 1000) AS BIGINT) AS x, ts, event_id
      FROM events
    ),
    a AS (
      SELECT user_id, count(*) AS n, list(x ORDER BY ts, event_id) AS vs
      FROM q GROUP BY user_id
    ),
    sums AS (
      SELECT user_id, n,
             list_sum(vs) AS s,
             list_sum(list_transform(vs, v -> v * v)) AS s2,
             list_sum(list_transform(generate_series(1, len(vs)-1), i -> vs[i] * vs[i+1])) AS c1,
             list_sum(list_transform(generate_series(1, len(vs)-1), i -> vs[i])) AS sh1,
             list_sum(list_transform(generate_series(2, len(vs)), i -> vs[i])) AS st1,
             list_sum(list_transform(generate_series(1, len(vs)-2), i -> vs[i] * vs[i+2])) AS c2,
             list_sum(list_transform(generate_series(1, len(vs)-2), i -> vs[i])) AS sh2,
             list_sum(list_transform(generate_series(3, len(vs)), i -> vs[i])) AS st2,
             vs[len(vs)] AS xn, vs[len(vs)-1] AS xp
      FROM a WHERE n > 4
    )
    SELECT user_id, n::BIGINT AS n_events,
           CASE WHEN {_AR2_SING} THEN NULL ELSE round({_AR2_PHI1}, 9) END AS phi1,
           CASE WHEN {_AR2_SING} THEN NULL ELSE round({_AR2_PHI2}, 9) END AS phi2,
           CASE WHEN {_AR2_SING} THEN NULL ELSE round({_AR2_FC} / 1000.0, 9) END AS forecast_next
    FROM sums
    WHERE n::HUGEINT * s2::HUGEINT <> s::HUGEINT * s::HUGEINT
    """,
    doc="AR(2) autoregression per user series via Yule-Walker: phi1/phi2 "
        "in closed form from the SAME exact integer cross-sums as "
        "analytic_autocorrelation (shared-text float expressions, "
        "bit-identical), plus the one-step-ahead mean-reverting forecast "
        "— the minimal linear-dynamics model before reaching for "
        "Holt-Winters/ARIMA; one shuffle on user_id, per-series work "
        "linear in-executor",
)
def analytic_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 1000).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.unix_micros("ts").alias("t"),
                F.col("event_id").alias("e"),
                x.alias("v"),
            )
        )
    )
    g = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), arr.alias("a"))
        .filter(F.col("n") > 4)
        .withColumn("vs", F.expr("transform(a, p -> p.v)"))
    )
    sums = g.select(
        "user_id",
        "n",
        F.expr("aggregate(vs, 0L, (acc, v) -> acc + v)").alias("s"),
        F.expr("aggregate(vs, 0L, (acc, v) -> acc + v * v)").alias("s2"),
        F.expr(
            "aggregate(zip_with(slice(vs, 1, size(vs)-1), slice(vs, 2, size(vs)-1),"
            " (a, b) -> a * b), 0L, (acc, v) -> acc + v)"
        ).alias("c1"),
        F.expr("aggregate(slice(vs, 1, size(vs)-1), 0L, (acc, v) -> acc + v)").alias("sh1"),
        F.expr("aggregate(slice(vs, 2, size(vs)-1), 0L, (acc, v) -> acc + v)").alias("st1"),
        F.expr(
            "aggregate(zip_with(slice(vs, 1, size(vs)-2), slice(vs, 3, size(vs)-2),"
            " (a, b) -> a * b), 0L, (acc, v) -> acc + v)"
        ).alias("c2"),
        F.expr("aggregate(slice(vs, 1, size(vs)-2), 0L, (acc, v) -> acc + v)").alias("sh2"),
        F.expr("aggregate(slice(vs, 3, size(vs)-2), 0L, (acc, v) -> acc + v)").alias("st2"),
        F.expr("element_at(vs, -1)").alias("xn"),
        F.expr("element_at(vs, -2)").alias("xp"),
    )
    # exact zero-variance predicate in 38-digit decimal: s*s reaches ~1e20
    # on long high-magnitude series, past BIGINT — the tukey_hsd r9
    # overflow class (DuckDB side uses native int128 HUGEINT)
    return sums.filter(
        F.expr(
            "CAST(n AS DECIMAL(38,0)) * CAST(s2 AS DECIMAL(38,0))"
            " <> CAST(s AS DECIMAL(38,0)) * CAST(s AS DECIMAL(38,0))"
        )
    ).select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        F.expr(f"CASE WHEN {_AR2_SING} THEN NULL ELSE round({_AR2_PHI1}, 9) END").alias("phi1"),
        F.expr(f"CASE WHEN {_AR2_SING} THEN NULL ELSE round({_AR2_PHI2}, 9) END").alias("phi2"),
        F.expr(
            f"CASE WHEN {_AR2_SING} THEN NULL ELSE round({_AR2_FC} / 1000.0, 9) END"
        ).alias("forecast_next"),
    )


# Audio clipping / DC-offset QA through the real RIFF/WAVE decode — the
# first gate of a speech-data pipeline: clipped samples mean the recording
# chain saturated (features computed on them are garbage), a nonzero DC
# mean betrays a miswired ADC or a broken decode. The Arrow kernel ships
# only exact integers (clip tally at |s| >= 28, DC sum, absolute peak)
# over the decoded PCM; the clip ratio is exact integer ppm; the oracle
# replays the deterministic synthesis arithmetic sample-for-sample.

@register(
    "mm_audio_clipping_detect",
    """
    WITH d AS (SELECT doc_id, md5(text) AS hx FROM documents),
    s AS (
      SELECT doc_id, ascii(substr(hx, u.i, 1)) - 77 AS v
      FROM d, unnest(generate_series(1, 32)) AS u(i)
    )
    SELECT doc_id AS media_id,
           count(*)::BIGINT AS n_samples,
           sum(CASE WHEN abs(v) >= 28 THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
           sum(v)::BIGINT AS dc_sum,
           max(abs(v))::BIGINT AS peak_abs,
           (CASE WHEN count(*) > 0 THEN
              sum(CASE WHEN abs(v) >= 28 THEN 1 ELSE 0 END) * 1000000 // count(*)
            ELSE NULL END)::BIGINT AS clip_ppm
    FROM s GROUP BY doc_id
    """,
    doc="audio clipping / DC-offset QA through the REAL RIFF/WAVE decode: "
        "exact integer clip tally at |s| >= 28 full-scale, DC sum, and "
        "absolute peak per clip from the Arrow kernel, clip ratio in "
        "exact integer ppm — the saturation gate a speech pipeline runs "
        "before loudness normalization; Python touches bytes only inside "
        "the decode kernel, the oracle replays the synthesis "
        "sample-for-sample",
)
def mm_audio_clipping_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_wav_media_table(docs, "doc_id", "text")
    stats = M.audio_clip_stats(media, threshold=28)
    return stats.select(
        "media_id",
        "n_samples",
        "n_clipped",
        "dc_sum",
        "peak_abs",
        # ADVICE r9: a zero-sample WAV (none synthesized today, but the
        # kernel admits one) would make the integer div an ANSI error —
        # NULL the ratio instead, keeping the row
        F.expr(
            "CASE WHEN n_samples > 0"
            " THEN CAST(n_clipped * 1000000 div n_samples AS BIGINT) END"
        ).alias("clip_ppm"),
    )


# ---------------------------------------------------------------------------
# Letterbox detection through the real PPM decode — the crop-before-embed
# QA gate of a vision pipeline: constant bars (letterbox/pillarbox,
# black borders from aspect-ratio padding) dilute patch embeddings and
# perceptual hashes, so frames are scanned for uniform edge rows before
# feature extraction. The synthesis plants REAL constant bars on every
# third image (Spark string expressions, byte-replayable in SQL); the
# Arrow kernel decodes the PPM and counts leading/trailing uniform rows;
# the oracle replays both the synthesis and the detection byte-for-byte.
# ---------------------------------------------------------------------------

@register(
    "mm_image_letterbox_detect",
    """
    WITH r AS (
      SELECT doc_id, (8 + length(text) % 8) AS w,
             substr(repeat(md5(text), 6), 1, (8 + length(text) % 8) * 12) AS ful,
             md5(text) AS hx
      FROM documents
    ),
    rws AS (
      SELECT doc_id, w,
             CASE WHEN doc_id % 3 = 0 THEN repeat(substr(hx, 1, 1), w * 3)
                  ELSE substr(ful, 1, w * 3) END AS r0,
             substr(ful, w * 3 + 1, w * 3) AS r1,
             substr(ful, w * 6 + 1, w * 3) AS r2,
             CASE WHEN doc_id % 3 = 0 THEN repeat(substr(hx, 1, 1), w * 3)
                  ELSE substr(ful, w * 9 + 1, w * 3) END AS r3
      FROM r
    ),
    u AS (
      SELECT doc_id, w,
             CASE WHEN r0 = repeat(substr(r0, 1, 1), w * 3) THEN 1 ELSE 0 END AS u0,
             CASE WHEN r1 = repeat(substr(r1, 1, 1), w * 3) THEN 1 ELSE 0 END AS u1,
             CASE WHEN r2 = repeat(substr(r2, 1, 1), w * 3) THEN 1 ELSE 0 END AS u2,
             CASE WHEN r3 = repeat(substr(r3, 1, 1), w * 3) THEN 1 ELSE 0 END AS u3
      FROM rws
    ),
    tb AS (
      SELECT doc_id, w,
             CASE WHEN u0 = 0 THEN 0 WHEN u1 = 0 THEN 1
                  WHEN u2 = 0 THEN 2 WHEN u3 = 0 THEN 3 ELSE 4 END AS top_rows,
             CASE WHEN u0 = 1 AND u1 = 1 AND u2 = 1 AND u3 = 1 THEN 0
                  WHEN u3 = 0 THEN 0 WHEN u2 = 0 THEN 1
                  WHEN u1 = 0 THEN 2 ELSE 3 END AS bottom_rows
      FROM u
    )
    SELECT doc_id AS media_id, w::INT AS width, 4::INT AS height,
           top_rows::INT AS top_rows, bottom_rows::INT AS bottom_rows,
           (CASE WHEN top_rows > 0 AND bottom_rows > 0 THEN 1 ELSE 0 END)::INT
             AS letterboxed
    FROM tb
    """,
    doc="letterbox detection through the REAL PPM decode: the synthesis "
        "plants constant top/bottom bars on every third image (pure Spark "
        "string expressions, byte-replayable), the Arrow kernel decodes "
        "the raster and counts leading/trailing uniform rows (every byte "
        "of the row equals its first — all channels, all columns), "
        "letterboxed = bars on BOTH edges; the crop-before-embed QA gate "
        "run before patch embeddings or perceptual hashes, which constant "
        "bars dilute",
)
def mm_image_letterbox_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_letterboxed_media_table(docs, "doc_id", "text")
    return M.letterbox_stats(media)


# Per-day Elo ratings (Elo 1978; the online sibling of the registered
# Bradley-Terry batch solve) — the sequential rating update every arena
# leaderboard publishes between batch re-fits. Online ratings are
# inherently order-dependent, so the fold is partitioned by DAY (each
# day's ladder starts fresh at 1000): per-group work is linear and
# bounded by the day's match count, groups parallelize across the
# cluster, and no global sequential pass exists anywhere. The update
# runs at RUNTIME inside one array fold (the analytic_bradley_terry
# device); the expected-score/pow arithmetic is identical text on both
# engines.

_ELO_K = "16.0"
# expected score of player a in match m given the rating array r.
# power(10, x) is NOT bit-identical between Java Math.pow and C libm
# (measured: ~10% of values differ in the last ulp), so a raw float fold
# would diverge across engines. The per-match rating DELTA is therefore
# quantized to integer micro-points — K*(s-e) agrees to ~1e-16 relative,
# so round(.*1e6) flips only within ~1e-10 of a boundary — and both
# players move by the same quantized delta (zero-sum preserved exactly).
_ELO_E_SPARK = (
    "(1.0D / (1.0D + power(10.0D,"
    " (element_at(r, CAST(m.pb + 1 AS INT)) - element_at(r, CAST(m.pa + 1 AS INT)))"
    " / 400.0D)))"
)
_ELO_S_SPARK = "(CASE WHEN m.winner = m.pa THEN 1.0D ELSE 0.0D END)"
_ELO_D_SPARK = (
    f"(CAST(round({_ELO_K}D * ({_ELO_S_SPARK} - {_ELO_E_SPARK}) * 1000000.0D)"
    f" AS BIGINT) / 1000000.0D)"
)
_ELO_E_SQL = (
    "(1.0 / (1.0 + power(10.0, (a.r[m.pb + 1] - a.r[m.pa + 1]) / 400.0)))"
)
_ELO_S_SQL = "(CASE WHEN m.winner = m.pa THEN 1.0 ELSE 0.0 END)"
_ELO_D_SQL = (
    f"(CAST(round({_ELO_K} * ({_ELO_S_SQL} - {_ELO_E_SQL}) * 1000000.0)"
    f" AS BIGINT) / 1000000.0)"
)


@register(
    "analytic_elo_per_day",
    f"""
    WITH m0 AS (
      SELECT day(ts)::BIGINT AS d, epoch_ns(ts) AS t, event_id,
             (user_id % 16)::BIGINT AS pa,
             ((user_id // 16 + event_id) % 16)::BIGINT AS pb,
             ('0x' || substr(md5('bt' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               / 4294967296.0 AS u
      FROM events
    ),
    m1 AS (
      SELECT d, t, event_id, pa, pb,
             CASE WHEN u < (CAST(pa AS DOUBLE) + 1.0)
                           / (CAST(pa AS DOUBLE) + CAST(pb AS DOUBLE) + 2.0)
                  THEN pa ELSE pb END AS winner
      FROM m0 WHERE pa <> pb
    ),
    packed AS (
      SELECT d, list({{'t': t, 'e': event_id, 'pa': pa, 'pb': pb, 'winner': winner,
                       'r': CAST(NULL AS DOUBLE[])}}
                     ORDER BY t, event_id) AS ms
      FROM m1 GROUP BY d
    ),
    folded AS (
      SELECT d,
             list_reduce(list_prepend(
               {{'t': 0::BIGINT, 'e': 0::BIGINT, 'pa': 0::BIGINT, 'pb': 0::BIGINT,
                 'winner': 0::BIGINT,
                 'r': list_transform(generate_series(0, 15), i -> 1000.0)}}, ms),
               (a, m) -> {{'t': 0::BIGINT, 'e': 0::BIGINT, 'pa': 0::BIGINT,
                           'pb': 0::BIGINT, 'winner': 0::BIGINT,
                 'r': list_transform(generate_series(0, 15), i ->
                   CASE WHEN i = m.pa THEN a.r[m.pa + 1] + {_ELO_D_SQL}
                        WHEN i = m.pb THEN a.r[m.pb + 1] - {_ELO_D_SQL}
                        ELSE a.r[i + 1] END)}}).r AS r
      FROM packed
    )
    SELECT d AS day, CAST(i - 1 AS BIGINT) AS player,
           round(r[i], 6) AS rating
    FROM folded, unnest(generate_series(1, 16)) AS t(i)
    """,
    doc="per-day Elo ladder (K=16, start 1000) over the same "
        "deterministic skill-graded matches as analytic_bradley_terry: "
        "the ORDER-DEPENDENT online rating update runs as a runtime array "
        "fold per day partition (linear per group, parallel across days, "
        "no global sequential pass), expected score 1/(1+10^(dr/400)) as "
        "identical text both engines — the live-leaderboard companion to "
        "the batch MM solve",
)
def analytic_elo_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.sampling import hash_fraction

    ev = load_table(spark, sf_dir, "events")
    m0 = ev.select(
        F.dayofmonth("ts").cast("long").alias("d"),
        F.unix_micros("ts").alias("t"),
        "event_id",
        (F.col("user_id") % 16).cast("long").alias("pa"),
        ((F.expr("user_id div 16") + F.col("event_id")) % 16)
        .cast("long")
        .alias("pb"),
        hash_fraction(F.col("event_id"), "bt").alias("u"),
    )
    m1 = m0.filter(F.col("pa") != F.col("pb")).select(
        "d", "t", "event_id", "pa", "pb",
        F.expr(
            "CASE WHEN u < (CAST(pa AS DOUBLE) + 1.0D)"
            " / (CAST(pa AS DOUBLE) + CAST(pb AS DOUBLE) + 2.0D)"
            " THEN pa ELSE pb END"
        ).alias("winner"),
    )
    packed = m1.groupBy("d").agg(
        F.array_sort(
            F.collect_list(F.struct("t", F.col("event_id").alias("e"), "pa", "pb", "winner"))
        ).alias("ms")
    )
    upd = (
        f"transform(sequence(0, 15), i ->"
        f" CASE WHEN i = m.pa THEN element_at(r, CAST(m.pa + 1 AS INT)) + {_ELO_D_SPARK}"
        f" WHEN i = m.pb THEN element_at(r, CAST(m.pb + 1 AS INT)) - {_ELO_D_SPARK}"
        f" ELSE element_at(r, i + 1) END)"
    )
    folded = packed.select(
        "d",
        F.expr(
            f"aggregate(ms, transform(sequence(0, 15), i -> 1000.0D),"
            f" (r, m) -> {upd})"
        ).alias("r"),
    )
    return folded.select(
        F.col("d").alias("day"), F.posexplode("r").alias("player", "rating")
    ).select(
        "day",
        F.col("player").cast("long").alias("player"),
        F.expr("round(rating, 6)").alias("rating"),
    )


# ---------------------------------------------------------------------------
# Change data feed between two table versions (the Delta Lake CDF output
# contract: _change_type in insert/delete/update_preimage/update_postimage,
# updates emitting BOTH images as separate rows) — what a downstream
# incremental consumer subscribes to instead of diffing snapshots itself.
# The registered cdc_state_diff classifies one row per changed key; this
# emits the row-per-image feed form. Versions are two prefixes of the same
# synthetic keyed log (thresholds relative to the key domain, so the
# semantics are sf-stable); per-version latest-row resolution is the
# compacted-log device (one key-partitioned ranking window each).
# ---------------------------------------------------------------------------

@register(
    "cdc_change_data_feed",
    """
    WITH log AS (
      SELECT o_orderkey AS k, o_orderkey * 2 AS pos, 'upsert' AS op,
             o_totalprice AS v
      FROM orders WHERE o_orderkey % 4 <> 3
      UNION ALL
      SELECT o_orderkey, o_orderkey * 2 + 1, 'delete', NULL
      FROM orders WHERE o_orderkey % 16 = 1
      UNION ALL
      SELECT o_orderkey, o_orderkey * 2 + 2, 'upsert', o_totalprice + 77.0
      FROM orders WHERE o_orderkey % 8 = 2
    ),
    cut AS (SELECT max(k) AS maxk FROM log),
    v1 AS (
      SELECT k, v FROM (
        SELECT k, op, v, row_number() OVER (PARTITION BY k ORDER BY pos DESC) AS rn
        FROM log, cut WHERE pos <= maxk
      ) WHERE rn = 1 AND op = 'upsert'
    ),
    v2 AS (
      SELECT k, v FROM (
        SELECT k, op, v, row_number() OVER (PARTITION BY k ORDER BY pos DESC) AS rn
        FROM log
      ) WHERE rn = 1 AND op = 'upsert'
    ),
    joined AS (
      SELECT coalesce(v1.k, v2.k) AS k, v1.v AS v_old, v2.v AS v_new,
             v1.k IS NOT NULL AS in1, v2.k IS NOT NULL AS in2
      FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    )
    SELECT 'insert' AS _change_type, k, v_new AS v FROM joined
      WHERE NOT in1 AND in2
    UNION ALL
    SELECT 'delete', k, v_old FROM joined WHERE in1 AND NOT in2
    UNION ALL
    SELECT 'update_preimage', k, v_old FROM joined
      WHERE in1 AND in2 AND v_old IS DISTINCT FROM v_new
    UNION ALL
    SELECT 'update_postimage', k, v_new FROM joined
      WHERE in1 AND in2 AND v_old IS DISTINCT FROM v_new
    """,
    doc="change data feed between two versions of a keyed log (the Delta "
        "CDF contract): _change_type insert/delete/update_preimage/"
        "update_postimage with updates emitting BOTH images as rows — the "
        "subscription feed for incremental downstream consumers; two "
        "compacted-log snapshots (key-partitioned ranking windows), one "
        "full-outer key join, null-safe change classification; version "
        "thresholds relative to the key domain so semantics are sf-stable",
)
def cdc_change_data_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    up1 = orders.filter(F.col("o_orderkey") % 4 != 3).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") * 2).alias("pos"),
        F.lit("upsert").alias("op"),
        F.col("o_totalprice").alias("v"),
    )
    dels = orders.filter(F.col("o_orderkey") % 16 == 1).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") * 2 + 1).alias("pos"),
        F.lit("delete").alias("op"),
        F.lit(None).cast("double").alias("v"),
    )
    up2 = orders.filter(F.col("o_orderkey") % 8 == 2).select(
        F.col("o_orderkey").alias("k"),
        (F.col("o_orderkey") * 2 + 2).alias("pos"),
        F.lit("upsert").alias("op"),
        (F.col("o_totalprice") + 77.0).alias("v"),
    )
    log = up1.unionAll(dels).unionAll(up2)
    cut = log.agg(F.max("k").alias("maxk"))

    def snapshot(df):
        w = Window.partitionBy("k").orderBy(F.col("pos").desc())
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") == "upsert"))
            .select("k", "v")
        )

    v1 = snapshot(log.crossJoin(F.broadcast(cut)).filter(F.col("pos") <= F.col("maxk")))
    v2 = snapshot(log)
    j = (
        v1.select(F.col("k").alias("k1"), F.col("v").alias("v_old"))
        .join(
            v2.select(F.col("k").alias("k2"), F.col("v").alias("v_new")),
            F.col("k1") == F.col("k2"),
            "full_outer",
        )
        .select(
            F.coalesce("k1", "k2").alias("k"),
            "v_old",
            "v_new",
            F.col("k1").isNotNull().alias("in1"),
            F.col("k2").isNotNull().alias("in2"),
        )
    )
    ins = j.filter(~F.col("in1") & F.col("in2")).select(
        F.lit("insert").alias("_change_type"), "k", F.col("v_new").alias("v")
    )
    dele = j.filter(F.col("in1") & ~F.col("in2")).select(
        F.lit("delete").alias("_change_type"), "k", F.col("v_old").alias("v")
    )
    changed = j.filter(
        F.col("in1") & F.col("in2") & ~F.col("v_old").eqNullSafe(F.col("v_new"))
    )
    pre = changed.select(
        F.lit("update_preimage").alias("_change_type"), "k", F.col("v_old").alias("v")
    )
    post = changed.select(
        F.lit("update_postimage").alias("_change_type"), "k", F.col("v_new").alias("v")
    )
    return ins.unionAll(dele).unionAll(pre).unionAll(post)


# Item-item collaborative filtering (Sarwar et al. WWW'01; the
# "customers who bought X also bought Y" primitive behind every
# recommender shelf) over order baskets: co-occurrence counts are exact
# integers from a self-join bounded by basket size (<= 7 items per order
# in this schema — the analytic_market_basket discipline, linear in
# lineitems), cosine similarity co/sqrt(n_i*n_j) is one shared float
# expression, and the top-5 neighbor ranking windows are item-bounded
# (vocabulary-scale, never corpus-scale). Distinct from
# analytic_market_basket (rules with support/confidence thresholds):
# this emits the per-item NEIGHBOR LIST a serving layer would cache.

_IICF_COS = (
    "(CAST(co AS DOUBLE) / sqrt(CAST(n_i AS DOUBLE) * CAST(n_j AS DOUBLE)))"
)


@register(
    "analytic_item_item_cf",
    f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS o, (l_partkey % 200)::BIGINT AS item
      FROM lineitem
    ),
    n AS (SELECT item, count(*)::BIGINT AS n_orders FROM baskets GROUP BY item),
    co AS (
      SELECT a.item AS i, b.item AS j, count(*)::BIGINT AS co
      FROM baskets a JOIN baskets b ON a.o = b.o AND a.item < b.item
      GROUP BY a.item, b.item HAVING count(*) >= 2
    ),
    sym AS (
      SELECT i, j, co FROM co
      UNION ALL
      SELECT j, i, co FROM co
    ),
    scored AS (
      SELECT s.i AS item, s.j AS neighbor, s.co,
             ni.n_orders AS n_i, nj.n_orders AS n_j
      FROM sym s
      JOIN n ni ON ni.item = s.i
      JOIN n nj ON nj.item = s.j
    ),
    ranked AS (
      SELECT item, neighbor, co, n_i, n_j,
             round({_IICF_COS}, 9) AS cosine,
             row_number() OVER (PARTITION BY item
                                ORDER BY {_IICF_COS} DESC, neighbor ASC) AS rnk
      FROM scored
    )
    SELECT item, neighbor, co AS n_co_orders, cosine, rnk
    FROM ranked WHERE rnk <= 5
    """,
    doc="item-item collaborative filtering (Sarwar WWW'01): top-5 "
        "also-bought neighbors per item by cosine over order-basket "
        "co-occurrence — exact integer co/marginal counts (pair expansion "
        "bounded by basket size, the market-basket discipline), cosine "
        "one shared float expression, ranking windows item-bounded; the "
        "neighbor-list build a recommender serving layer caches, distinct "
        "from the support/confidence RULES of analytic_market_basket",
)
def analytic_item_item_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("o"),
        (F.col("l_partkey") % 200).cast("long").alias("item"),
    ).distinct()
    n = baskets.groupBy("item").agg(F.count("*").cast("long").alias("n_orders"))
    a = baskets.select("o", F.col("item").alias("i"))
    b = baskets.select("o", F.col("item").alias("j"))
    co = (
        a.join(b, "o")
        .filter(F.col("i") < F.col("j"))
        .groupBy("i", "j")
        .agg(F.count("*").cast("long").alias("co"))
        .filter(F.col("co") >= 2)
    )
    sym = co.unionAll(co.select(F.col("j").alias("i"), F.col("i").alias("j"), "co"))
    scored = (
        sym.join(F.broadcast(n.select(F.col("item").alias("i"), F.col("n_orders").alias("n_i"))), "i")
        .join(F.broadcast(n.select(F.col("item").alias("j"), F.col("n_orders").alias("n_j"))), "j")
        .select(
            F.col("i").alias("item"),
            F.col("j").alias("neighbor"),
            "co", "n_i", "n_j",
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.expr(_IICF_COS).desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "item",
            "neighbor",
            F.col("co").alias("n_co_orders"),
            F.expr(f"round({_IICF_COS}, 9)").alias("cosine"),
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Word burstiness / Fano factor (Church & Gale 1995): variance-to-mean
# ratio of a word's per-document counts across the WHOLE corpus (zeros
# included — they enter the power sums implicitly, so no densification
# is ever materialized). VMR = 1 is Poisson scatter; content words burst
# (VMR >> 1: absent from most docs, dense where they appear) while
# function words hug 1 — the signal separating topical terms from glue,
# and a corpus-QA check that synthetic or deduplicated text hasn't lost
# natural burstiness. Exact integer power sums, one shared float, a
# vocabulary-bounded top-20 ranking.
# ---------------------------------------------------------------------------

_VMR = (
    "((CAST(s2 AS DOUBLE) - CAST(n_docs AS DOUBLE)"
    " * (CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    " * (CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE)))"
    " / (CAST(n_docs AS DOUBLE) - 1.0)"
    " / (CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE)))"
)


@register(
    "text_burstiness",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
      FROM documents
    ),
    dc AS (SELECT doc_id, w, count(*)::BIGINT AS c FROM tok GROUP BY doc_id, w),
    n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
    agg AS (
      SELECT w, count(*)::BIGINT AS df,
             sum(c)::BIGINT AS s, sum(c * c)::BIGINT AS s2
      FROM dc GROUP BY w
    ),
    scored AS (
      SELECT w, df, s AS total_count,
             round({_VMR}, 9) AS vmr,
             row_number() OVER (ORDER BY {_VMR} DESC, w ASC) AS rnk
      FROM agg CROSS JOIN n
      WHERE df >= 5
    )
    SELECT w AS word, df, total_count, vmr, rnk FROM scored WHERE rnk <= 20
    """,
    doc="word burstiness / Fano factor (Church-Gale 1995): top-20 words "
        "by variance-to-mean ratio of per-doc counts across the corpus, "
        "zeros entering the power sums implicitly (no densification) — "
        "VMR ~ 1 is Poisson glue, VMR >> 1 is topical burst; exact "
        "integer (df, sum, sum-of-squares) in one combinable pass, VMR "
        "one shared float expression, vocabulary-bounded ranking; the "
        "topicality signal and the corpus-QA check that dedup/synthesis "
        "hasn't flattened natural burstiness",
)
def text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    dc = tok.groupBy("doc_id", "w").agg(F.count("*").cast("long").alias("c"))
    n = docs.agg(F.count("*").cast("long").alias("n_docs"))
    agg = dc.groupBy("w").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.expr("c * c")).cast("long").alias("s2"),
    )
    scored = agg.crossJoin(F.broadcast(n)).filter(F.col("df") >= 5)
    # TakeOrderedAndProject (per-partition top-k + merge), then ranks from
    # the packed 20-row array — no global window anywhere in the plan
    top = scored.orderBy(F.expr(_VMR).desc(), F.col("w").asc()).limit(20)
    packed = top.agg(
        F.expr(
            f"array_sort(collect_list(struct(-({_VMR}) AS nk, w, df,"
            f" s, round({_VMR}, 9) AS vmr)))"
        ).alias("a")
    )
    return packed.select(F.posexplode("a").alias("pos", "r")).select(
        F.col("r.w").alias("word"),
        F.col("r.df").alias("df"),
        F.col("r.s").alias("total_count"),
        F.col("r.vmr").alias("vmr"),
        (F.col("pos") + 1).cast("int").alias("rnk"),
    )


# ---------------------------------------------------------------------------
# Top principal component via power iteration on the embedding Gram
# matrix (von Mises & Pollaczek-Geiringer 1929; the dominant-eigenvector
# step of PCA/spectral methods) — run ENTIRELY in-engine: embeddings are
# quantized to integer milli-units (the kmeans device) so the 64x64 Gram
# matrix is EXACT long sums (one combinable element-wise aggregation —
# per-row work is d^2, linear in rows, mergeable across any partitioning);
# the 8 power iterations then run at runtime inside one array fold over
# the packed 4096-long Gram row (the Bradley-Terry device), with
# matrix-vector products and normalizations in identical op order on both
# engines. Output: the dominant eigenvector and its Rayleigh-quotient
# eigenvalue — the direction embedding whitening/deduplication would
# remove first.
# ---------------------------------------------------------------------------

_PI_DIM = 64
# 64 iterations: the synthetic spectrum is nearly degenerate
# (lambda2/lambda1 ~ 0.93), so 8 rounds leave ~10% Rayleigh error while
# 64 reach ~5e-5 (measured); each round is ~8k flops on one packed row,
# so the count is free
_PI_ITERS = 64

# matrix-vector product over the packed gram g (1-based list) and v
# matrix-vector product over the TRACE-SCALED gram gd (1-based lists)
# and the bound accumulator v — referenced only where the accumulator is
# a bound lambda variable, so it is evaluated exactly once per use
_PI_GV_SQL = (
    f"list_transform(generate_series(0, {_PI_DIM - 1}), i ->"
    f" list_reduce(list_prepend(0.0, list_transform(generate_series(0, {_PI_DIM - 1}),"
    f" j -> gd[i * {_PI_DIM} + j + 1] * v[j + 1])), (p, q) -> p + q))"
)
# ONE fold does everything: 64 un-normalized GV steps on the trace-scaled
# matrix (lambda_scaled is in [1/d, 1], so 64 steps can shrink the iterate
# to ~1e-116 at worst — far above double underflow — and the DIRECTION is
# what matters), then step 65 normalizes (the accumulator is bound, so the
# norm costs 2 passes over 64 elements, not a second GV), then step 66
# appends the Rayleigh quotient as element d+1 (zip_with evaluates its GV
# argument once). The old form normalized inside every step and computed
# the Rayleigh product per-element: ~3x the GV count, and Catalyst's
# projection collapse re-evaluated the whole fold in each downstream
# reference — measured 8.1s; this form + localCheckpoint is ~1.5s.
_PI_NORM_SQL = (
    "list_transform(v, x -> x / sqrt(list_reduce(list_prepend(0.0,"
    " list_transform(v, y -> y * y)), (p, q) -> p + q)))"
)
_PI_RAYLEIGH_SQL = (
    f"list_reduce(list_prepend(0.0, list_transform({_PI_GV_SQL},"
    f" (w, i) -> w * v[i])), (p, q) -> p + q)"
)
_PI_SOLVE_SQL = (
    # 0.125 must be cast: a bare DuckDB float literal is DECIMAL and the
    # whole fold silently runs in decimal arithmetic (measured: 3-decimal
    # precision on the eigvec) — Spark's 0.125D twin is DOUBLE
    f"list_reduce(list_transform(generate_series(0, {_PI_ITERS + 2}), k ->"
    f" list_transform(generate_series(1, {_PI_DIM}), i -> 0.125::DOUBLE)),"
    f" (v, x, k) -> CASE WHEN k <= {_PI_ITERS} THEN {_PI_GV_SQL}"
    f" WHEN k = {_PI_ITERS + 1} THEN {_PI_NORM_SQL}"
    f" ELSE list_append(v, {_PI_RAYLEIGH_SQL}) END)"
)
_PI_GV_SPARK = (
    f"transform(sequence(0, {_PI_DIM - 1}), i ->"
    f" aggregate(sequence(0, {_PI_DIM - 1}), 0.0D, (p, j) -> p"
    f" + element_at(gd, i * {_PI_DIM} + j + 1) * element_at(v, j + 1)))"
)
_PI_NORM_SPARK = (
    "transform(v, x -> x / sqrt(aggregate(transform(v, y -> y * y), 0.0D,"
    " (p, q) -> p + q)))"
)
_PI_RAYLEIGH_SPARK = (
    f"aggregate(zip_with(v, {_PI_GV_SPARK}, (a, b) -> a * b), 0.0D,"
    f" (p, q) -> p + q)"
)
_PI_SOLVE_SPARK = (
    f"aggregate(sequence(1, {_PI_ITERS + 2}),"
    f" transform(sequence(1, {_PI_DIM}), i -> 0.125D),"
    f" (v, k) -> CASE WHEN k <= {_PI_ITERS} THEN {_PI_GV_SPARK}"
    f" WHEN k = {_PI_ITERS + 1} THEN {_PI_NORM_SPARK}"
    f" ELSE concat(v, array({_PI_RAYLEIGH_SPARK})) END)"
)
_PI_TRACE_SQL = (
    f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
    f" list_transform(generate_series(0, {_PI_DIM - 1}), i -> g[i * {_PI_DIM + 1} + 1])),"
    f" (p, q) -> p + q)"
)
_PI_TRACE_SPARK = (
    f"aggregate(sequence(0, {_PI_DIM - 1}), CAST(0 AS BIGINT),"
    f" (p, i) -> p + element_at(g, i * {_PI_DIM + 1} + 1))"
)


@register(
    "sim_gram_power_iteration",
    f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(round(x * 1000) AS BIGINT)) AS qe
      FROM embeddings
    ),
    cells AS (
      SELECT (i - 1) * {_PI_DIM} + (j - 1) AS idx,
             sum(qe[i] * qe[j])::BIGINT AS gsum
      FROM q, unnest(generate_series(1, {_PI_DIM})) AS a(i),
             unnest(generate_series(1, {_PI_DIM})) AS b(j)
      GROUP BY (i - 1) * {_PI_DIM} + (j - 1)
    ),
    packed AS (SELECT list(gsum ORDER BY idx) AS g FROM cells),
    prep AS (SELECT g, {_PI_TRACE_SQL} AS tr FROM packed),
    scaled AS (
      SELECT tr, list_transform(g, x -> CAST(x AS DOUBLE) / CAST(tr AS DOUBLE)) AS gd
      FROM prep
    ),
    solved AS (SELECT tr, {_PI_SOLVE_SQL} AS sol FROM scaled)
    SELECT CAST(i - 1 AS BIGINT) AS component,
           round(sol[i], 9) AS eigvec,
           round(sol[{_PI_DIM} + 1] * CAST(tr AS DOUBLE), 3) AS eigenvalue
    FROM solved, unnest(generate_series(1, {_PI_DIM})) AS t(i)
    """,
    doc="dominant principal component of the embedding set via 64 power "
        "iterations on the Gram matrix: embeddings quantized to integer "
        "milli-units so the 64x64 Gram is EXACT long sums (element-wise "
        "combinable aggregation, per-row work d^2 — linear in rows, "
        "mergeable across any partitioning); iterations run at runtime "
        "inside one array fold (the Bradley-Terry device) with identical "
        "op order both engines; output the eigenvector + Rayleigh "
        "eigenvalue — the direction embedding whitening removes first, "
        "and the spectral summary of a vector corpus",
    scale_safe=True,
)
def sim_gram_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions.similarity import gram_matrix_long

    emb = load_table(spark, sf_dir, "embeddings")
    # one integer matmul per Arrow batch (d^2 rows per PARTITION on the
    # shuffle) instead of a d^2-per-ROW explode — same exact integers,
    # measured 2.3x at sf0.01 and the gap grows linearly with rows
    cells = gram_matrix_long(emb, "embedding", _PI_DIM, scale=1000)
    packed = cells.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(idx, gsum))), x -> x.gsum)"
        ).alias("g")
    )
    solved = (
        packed.withColumn("tr", F.expr(_PI_TRACE_SPARK))
        .withColumn(
            "gd",
            F.expr("transform(g, x -> CAST(x AS DOUBLE) / CAST(tr AS DOUBLE))"),
        )
        .select("tr", F.expr(_PI_SOLVE_SPARK).alias("sol"))
        # materialize the 1-row fold result: downstream references the sol
        # column twice (eigvec slice + eigenvalue element) and Catalyst's
        # projection collapse would otherwise re-run the whole fold per
        # reference (measured: most of an 8s wall)
        .localCheckpoint()
    )
    return solved.select(
        F.posexplode(F.expr(f"slice(sol, 1, {_PI_DIM})")).alias("c", "ev"),
        F.expr(
            f"round(element_at(sol, {_PI_DIM} + 1) * CAST(tr AS DOUBLE), 3)"
        ).alias("eigenvalue"),
    ).select(
        F.col("c").cast("long").alias("component"),
        F.expr("round(ev, 9)").alias("eigvec"),
        "eigenvalue",
    )


# Log-likelihood-ratio (G-test) collocations (Dunning, Computational
# Linguistics 1993) — the statistically honest collocation ranker beside
# the registered text_pmi_collocations: PMI overweights rare pairs
# (a hapax bigram of two hapax words maxes PMI), while Dunning's LLR
# scores the full 2x2 contingency so evidence mass matters. All four
# cells are exact integers from the same adjacent-bigram counts; LLR is
# one shared float expression (x*ln(x/E) terms written in a fixed order,
# 0*ln(0) guarded to 0); top-20 via TakeOrdered.

def _llr_term(o: str, e: str) -> str:
    return (
        f"(CASE WHEN {o} > 0 THEN CAST({o} AS DOUBLE)"
        f" * ln(CAST({o} AS DOUBLE) / ({e})) ELSE 0.0 END)"
    )


# expected cell counts under independence: E_ij = row_i * col_j / n
_LLR_E11 = "(CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE) / CAST(n_pairs AS DOUBLE))"
_LLR_E12 = "(CAST(c_a AS DOUBLE) * CAST(n_pairs - c_b AS DOUBLE) / CAST(n_pairs AS DOUBLE))"
_LLR_E21 = "(CAST(n_pairs - c_a AS DOUBLE) * CAST(c_b AS DOUBLE) / CAST(n_pairs AS DOUBLE))"
_LLR_E22 = (
    "(CAST(n_pairs - c_a AS DOUBLE) * CAST(n_pairs - c_b AS DOUBLE)"
    " / CAST(n_pairs AS DOUBLE))"
)
_LLR_EXPR = (
    "(2.0 * ("
    + _llr_term("c_ab", _LLR_E11)
    + " + " + _llr_term("(c_a - c_ab)", _LLR_E12)
    + " + " + _llr_term("(c_b - c_ab)", _LLR_E21)
    + " + " + _llr_term("(n_pairs - c_a - c_b + c_ab)", _LLR_E22)
    + "))"
)


@register(
    "analytic_gtest_collocations",
    f"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '[^a-z]+') AS ws
      FROM documents
    ),
    pairs AS (
      SELECT ws[i] AS a, ws[i + 1] AS b
      FROM toks, unnest(generate_series(1, len(ws) - 1)) AS u(i)
      WHERE length(ws[i]) >= 2 AND length(ws[i + 1]) >= 2
    ),
    pc AS (SELECT a, b, count(*)::BIGINT AS c_ab FROM pairs GROUP BY a, b),
    tot AS (SELECT count(*)::BIGINT AS n_pairs FROM pairs),
    ua AS (SELECT a, count(*)::BIGINT AS c_a FROM pairs GROUP BY a),
    ub AS (SELECT b, count(*)::BIGINT AS c_b FROM pairs GROUP BY b),
    scored AS (
      SELECT pc.a, pc.b, pc.c_ab, ua.c_a, ub.c_b, tot.n_pairs,
             {_LLR_EXPR} AS llr
      FROM pc JOIN ua ON ua.a = pc.a JOIN ub ON ub.b = pc.b, tot
      WHERE pc.c_ab >= 5
    )
    SELECT a, b, c_ab, c_a, c_b, round(llr, 9) AS llr
    FROM scored ORDER BY llr DESC, a, b LIMIT 20
    """,
    doc="Dunning G-test (log-likelihood ratio) collocations, top-20: the "
        "full 2x2 adjacent-bigram contingency in exact integers, LLR = "
        "2*sum O*ln(O/E) as one shared float expression with fixed term "
        "order and 0*ln(0)=0 guarded — the evidence-weighted collocation "
        "ranker that fixes PMI's rare-pair bias (Dunning CL 1993); "
        "vocabulary-bounded count tables, global top via TakeOrdered",
)
def analytic_gtest_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.split(F.trim(F.lower(F.col("text"))), "[^a-z]+").alias("ws")
    )
    pairs = toks.select(
        F.explode(
            F.expr(
                # slices degrade to empty for 1-token docs, where
                # sequence(0,-1) = [0,-1] would index ws[-1] (ANSI throw)
                "filter(zip_with(slice(ws, 1, greatest(size(ws) - 1, 0)), "
                "slice(ws, 2, greatest(size(ws) - 1, 0)), "
                "(a, b) -> struct(a, b)), "
                "p -> length(p.a) >= 2 AND length(p.b) >= 2)"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pc = pairs.groupBy("a", "b").agg(F.count("*").cast("long").alias("c_ab"))
    tot = pairs.agg(F.count("*").cast("long").alias("n_pairs"))
    ua = pairs.groupBy("a").agg(F.count("*").cast("long").alias("c_a"))
    ub = pairs.groupBy("b").agg(F.count("*").cast("long").alias("c_b"))
    scored = (
        pc.filter(F.col("c_ab") >= 5)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .withColumn("llr", F.expr(_LLR_EXPR))
    )
    return (
        scored.orderBy(F.col("llr").desc(), "a", "b")
        .limit(20)
        .select("a", "b", "c_ab", "c_a", "c_b", F.expr("round(llr, 9)").alias("llr"))
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test + Sen's slope (Mann 1945; Kendall 1975; Sen,
# JASA 1968) per event-type daily-revenue series — the NONPARAMETRIC
# trend detector: no normality assumption, robust to outliers, the
# standard of environmental/ops monitoring (and the honest alternative
# to fitting OLS on 30 points). The daily series is bounded (31 days),
# so the O(n^2) pairwise statistics are in-row array folds over exact
# integer daily cents; S, the tie-corrected variance, and Sen's median
# slope are all engine-identical.
# ---------------------------------------------------------------------------

@register(
    "analytic_mann_kendall",
    """
    WITH daily AS (
      SELECT event_type, day(ts)::BIGINT AS d,
             sum(CAST(round(value * 100) AS BIGINT))::BIGINT AS x
      FROM events GROUP BY event_type, day(ts)
    ),
    packed AS (
      -- n >= 2: a single-day series has no pairs (and the engine's fold
      -- ranges would go descending/ANSI-throw); a 1-point trend is moot
      SELECT event_type, count(*)::BIGINT AS n,
             list(x ORDER BY d) AS xs, list(d ORDER BY d) AS ds
      FROM daily GROUP BY event_type
      HAVING count(*) >= 2
    ),
    stats AS (
      SELECT event_type, n, xs, ds,
             list_reduce(list_prepend(CAST(0 AS BIGINT), flatten(
               list_transform(generate_series(1, len(xs) - 1), i ->
                 list_transform(generate_series(i + 1, len(xs)), j ->
                   CASE WHEN xs[j] > xs[i] THEN 1
                        WHEN xs[j] < xs[i] THEN -1 ELSE 0 END::BIGINT)))),
               (p, q) -> p + q) AS s,
             list_sort(flatten(
               list_transform(generate_series(1, len(xs) - 1), i ->
                 list_transform(generate_series(i + 1, len(xs)), j ->
                   CAST(xs[j] - xs[i] AS DOUBLE) / CAST(ds[j] - ds[i] AS DOUBLE)))))
               AS slopes
      FROM packed
    ),
    ties AS (
      SELECT event_type,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
               list_transform(l.cnts, t -> t * (t - 1) * (2 * t + 5))),
               (p, q) -> p + q) AS tie_term
      FROM (
        SELECT event_type, list(c) AS cnts FROM (
          SELECT event_type, x, count(*)::BIGINT AS c FROM daily
          GROUP BY event_type, x
        ) GROUP BY event_type
      ) l
    ),
    z AS (
      SELECT s.event_type, s.n, s.s, s.slopes, t.tie_term,
             (CAST(s.n * (s.n - 1) * (2 * s.n + 5) - t.tie_term AS DOUBLE) / 18.0)
               AS var_s
      FROM stats s JOIN ties t ON t.event_type = s.event_type
    )
    SELECT event_type, n AS n_days, s,
           round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
                      WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
                      ELSE 0.0 END, 9) AS z_stat,
           round(CASE WHEN len(slopes) % 2 = 1 THEN slopes[(len(slopes) + 1) // 2]
                      ELSE (slopes[len(slopes) // 2] + slopes[len(slopes) // 2 + 1]) / 2.0
                 END / 100.0, 9) AS sen_slope_per_day,
           CASE WHEN abs(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)
                              WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)
                              ELSE 0.0 END) > 1.96 THEN 1 ELSE 0 END AS significant
    FROM z
    """,
    doc="Mann-Kendall nonparametric trend test + Sen's slope per "
        "event-type daily-revenue series: pairwise sign statistic S and "
        "the tie-corrected variance from exact integer daily cents, Sen's "
        "slope = the exact median of pairwise slopes — all O(n^2) work is "
        "in-row folds over the BOUNDED (<= 31-day) series, z continuity-"
        "corrected at 1.96; the outlier-robust trend monitor beside the "
        "parametric OLS/Theil-Sen family",
)
def analytic_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.dayofmonth("ts").cast("long").alias("d")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias("x"))
    packed = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.expr("transform(array_sort(collect_list(struct(d, x))), p -> p.x)").alias("xs"),
        F.expr("transform(array_sort(collect_list(struct(d, x))), p -> p.d)").alias("ds"),
    ).filter(F.col("n") >= 2)
    stats = packed.select(
        "event_type", "n", "xs", "ds",
        F.expr(
            "aggregate(flatten(transform(sequence(1, size(xs) - 1), i ->"
            " transform(sequence(i + 1, size(xs)), j ->"
            " CAST(CASE WHEN element_at(xs, j) > element_at(xs, i) THEN 1"
            " WHEN element_at(xs, j) < element_at(xs, i) THEN -1 ELSE 0 END AS BIGINT)))),"
            " CAST(0 AS BIGINT), (p, q) -> p + q)"
        ).alias("s"),
        F.expr(
            "array_sort(flatten(transform(sequence(1, size(xs) - 1), i ->"
            " transform(sequence(i + 1, size(xs)), j ->"
            " CAST(element_at(xs, j) - element_at(xs, i) AS DOUBLE)"
            " / CAST(element_at(ds, j) - element_at(ds, i) AS DOUBLE)))))"
        ).alias("slopes"),
    )
    ties = (
        daily.groupBy("event_type", "x")
        .agg(F.count("*").cast("long").alias("c"))
        .groupBy("event_type")
        .agg(
            F.expr(
                "aggregate(collect_list(c * (c - 1) * (2 * c + 5)),"
                " CAST(0 AS BIGINT), (p, q) -> p + q)"
            ).alias("tie_term")
        )
    )
    z = stats.join(ties, "event_type").withColumn(
        "var_s",
        F.expr(
            "CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE) / 18.0D"
        ),
    )
    z_expr = (
        "CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0) / sqrt(var_s)"
        " WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0) / sqrt(var_s)"
        " ELSE 0.0 END"
    )
    return z.select(
        "event_type",
        F.col("n").alias("n_days"),
        "s",
        F.expr(f"round({z_expr}, 9)").alias("z_stat"),
        F.expr(
            "round(CASE WHEN size(slopes) % 2 = 1"
            " THEN element_at(slopes, CAST((size(slopes) + 1) div 2 AS INT))"
            " ELSE (element_at(slopes, CAST(size(slopes) div 2 AS INT))"
            " + element_at(slopes, CAST(size(slopes) div 2 + 1 AS INT))) / 2.0"
            " END / 100.0, 9)"
        ).alias("sen_slope_per_day"),
        F.when(F.expr(f"abs({z_expr})") > 1.96, 1).otherwise(0).alias("significant"),
    )


# Pixel-entropy image QA through the real PPM decode (Shannon 1948;
# the blank-frame/noise-screen detector every vision-data pipeline runs:
# near-zero entropy is a solid card or letterbox slate, maximal entropy
# is sensor noise or encrypted garbage — both are drop candidates before
# feature extraction). The Arrow kernel ships only EXACT integer
# (value, count) histogram rows from the decoded raster; the per-image
# entropy is a value-ordered in-row fold of -(c/n)ln(c/n) — identical
# op order on both engines — and the oracle replays the deterministic
# raster byte-for-byte.

@register(
    "mm_image_entropy",
    f"""
    WITH {_MM_RASTER_CTE},
    px AS (
      SELECT doc_id, ascii(substr(ras, u.i, 1)) AS v, length(ras) AS n
      FROM r, unnest(generate_series(1, length(ras))) AS u(i)
    ),
    hist AS (SELECT doc_id, v, max(n) AS n, count(*)::BIGINT AS cnt
             FROM px GROUP BY doc_id, v),
    packed AS (
      SELECT doc_id, max(n)::BIGINT AS n_px, count(*)::INT AS n_levels,
             list(cnt ORDER BY v) AS cs
      FROM hist GROUP BY doc_id
    )
    SELECT doc_id AS media_id, n_px, n_levels,
           round(list_reduce(list_prepend(0.0, list_transform(cs, c ->
             -(CAST(c AS DOUBLE) / CAST(n_px AS DOUBLE))
             * ln(CAST(c AS DOUBLE) / CAST(n_px AS DOUBLE)))),
             (p, q) -> p + q), 9) AS entropy_nats
    FROM packed
    """,
    doc="pixel-entropy image QA through the REAL PPM decode: the Arrow "
        "kernel ships exact integer (value, count) histogram rows from "
        "the decoded raster, per-image Shannon entropy is a value-ordered "
        "in-row fold of -(c/n)ln(c/n) (identical op order both engines) "
        "— near-zero flags solid/blank frames, maximal flags noise; the "
        "keep/drop signal beside blur (variance-of-Laplacian) and "
        "letterbox detection; oracle replays the raster byte-for-byte",
)
def mm_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_consumer_spark.extensions import multimodal as M

    docs = load_table(spark, sf_dir, "documents")
    media = M.synthesize_media_table(docs, "doc_id", "text")
    hist = M.raster_value_counts(media)
    packed = hist.groupBy("media_id").agg(
        F.sum("cnt").cast("long").alias("n_px"),
        F.count("*").cast("int").alias("n_levels"),
        F.expr("transform(array_sort(collect_list(struct(v, cnt))), x -> x.cnt)").alias(
            "cs"
        ),
    )
    return packed.select(
        "media_id",
        "n_px",
        "n_levels",
        F.expr(
            "round(aggregate(cs, 0.0D, (p, c) ->"
            " p + -(CAST(c AS DOUBLE) / CAST(n_px AS DOUBLE))"
            " * ln(CAST(c AS DOUBLE) / CAST(n_px AS DOUBLE))), 9)"
        ).alias("entropy_nats"),
    )


# ---------------------------------------------------------------------------
# Driver verification window ordering (round 10).
#
# The driver's correctness snapshot covers the FIRST 50 entries of queries()
# in iteration order. VERDICT r9 #1: this round's window is exactly the
# 35-name round-9 backlog (waves 2-5, the only registered queries without a
# driver row — all 35 pre-verified green by the round-9 judge) plus 15
# already-driver-verified fast names as padding; after this round's driver
# run the registry is 100% driver-proven. The rotation hedge stays
# mechanical: the full-registry replica (tools/check_oracle.py --vanilla)
# must be green for the CURRENT ordering — enforced by
# tests/test_driver_window.py against REPLICA_STAMP.json, which only a
# green full-registry run can refresh.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW: tuple[str, ...] = (
    # the round-9 backlog (waves 2-5), in registration order
    "analytic_sprt",
    "analytic_shapley_channels",
    "analytic_empirical_bayes",
    "analytic_tukey_hsd",
    "text_simpson_diversity",
    "graph_k_truss",
    "layout_bloom_file_skipping",
    "graph_personalized_pagerank",
    "cdc_watermark_alignment",
    "sample_raking_ipf",
    "graph_adamic_adar",
    "analytic_mcnemar",
    "analytic_hhi_concentration",
    "analytic_tost_equivalence",
    "analytic_pinball_loss",
    "analytic_logrank_test",
    "text_gopher_quality_full",
    "dedup_cdc_chunks",
    "analytic_chi2_feature_select",
    "analytic_krippendorff_alpha",
    "analytic_iptw_att",
    "sketch_countsketch_topk",
    "analytic_bradley_terry",
    "analytic_naive_bayes_langid",
    "analytic_ar2_yule_walker",
    "mm_audio_clipping_detect",
    "mm_image_letterbox_detect",
    "analytic_elo_per_day",
    "cdc_change_data_feed",
    "analytic_item_item_cf",
    "text_burstiness",
    "sim_gram_power_iteration",
    "analytic_gtest_collocations",
    "analytic_mann_kendall",
    "mm_image_entropy",
    # 15 fast already-driver-verified names (green since r3) as padding to
    # fill the 50-slot window; re-verification is free signal, and slots
    # 36-50 rotate out for round-10 debuts if a wave lands this round
    "f1_decimal_roundtrip",
    "f2_epoch_day",
    "f3_epoch_ms",
    "f4_micro_time",
    "f5_zoned_ts",
    "f6_f7_bool_quote",
    "f8_clean_text",
    "f9_f10_clean_sanitize",
    "f11_f12_topic_ddlstrip",
    "p1_s7_route_tombstones",
    "p3_p4_schema_filters",
    "p5_p6_ddl_guards",
    "p7_passthrough",
    "e1_e2_retry_gate",
    "c1_c3_classify",
)

# Round-10 registrations that miss this round's driver window go here
# (deliberate growth per VERDICT r8 #1's "freeze or resume deliberately";
# the lint keeps the unverified backlog <= one window).
_R11_BACKLOG: tuple[str, ...] = ()


def _ordered_names() -> list[str]:
    """Window names first, then every other registered query in registration
    order. Guard: the window must reference only registered names, with no
    duplicates, so a typo cannot silently drop a query from the registry."""
    assert len(set(_DRIVER_WINDOW)) == len(_DRIVER_WINDOW), "duplicate in window"
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    assert not missing, f"window names not registered: {missing}"
    rest = [n for n in QUERIES if n not in set(_DRIVER_WINDOW)]
    return list(_DRIVER_WINDOW) + rest
