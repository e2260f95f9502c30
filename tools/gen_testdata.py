"""Distribution-matched testdata generator for PERFORMANCE scale points.

The driver's `/root/testdata/sf*` parquet is read-only and stops at sf0.1;
VERDICT r8 #6 asks for an sf1.0 measurement of the frozen headline-core
set so round-over-round scaling claims are measurable. This generator
produces the same ten tables with the same schemas, cardinality ratios,
and value distributions (verified against sf0.1: priority/status/segment
uniformity, date ranges, per-order line counts 1-7, 1500 event users, 20
doc sources, 64-dim embeddings, 10 labels) at an arbitrary sf — entirely
with deterministic md5/xxhash-derived columns, no RNG, so two runs are
byte-identical.

NOT the driver's seed-42 data: CORRECTNESS always runs against the
driver's parquet; this output is only for throughput scale points
(PERFORMANCE.md documents the distinction).

Usage: python tools/gen_testdata.py <sf> <out_dir> [cpus]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import DataFrame, functions as F


def _u(tag: str, *cols) -> "F.Column":
    """Deterministic uniform in [0, 1) from a salted md5 of the id cols."""
    key = F.concat(F.lit(tag), *[F.col(c).cast("string") for c in cols])
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") / 4294967296.0


def _h(tag: str, *cols) -> "F.Column":
    """Deterministic non-negative 31-bit int from the same device."""
    key = F.concat(F.lit(tag), *[F.col(c).cast("string") for c in cols])
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % 2147483647


MKTSEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
STATUSES = ["F", "O", "P"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PADJ = ["large", "hot", "blue", "old", "small", "red", "new", "cold"]
PNOUN = ["ring", "bolt", "plate", "case", "gear", "pipe", "disk", "rod"]
ETYPES = ["click", "view", "purchase", "signup", "error"]
DOCWORDS = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data a vector index page join"
).split()
LANGS = ["en", "en", "en", "de", "fr", "es", "zh"]  # ~40% en, rest even-ish


def _pick(arr: list[str], h) -> "F.Column":
    return F.element_at(F.array(*[F.lit(x) for x in arr]), (h % len(arr) + 1).cast("int"))


def gen(spark, sf: float, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_orders = int(1_500_000 * sf)
    n_events = int(1_000_000 * sf)
    n_docs = int(50_000 * sf)
    n_emb = max(500, int(20_000 * sf))  # driver floor: sf0.01 ships 500 vectors

    def write(df: DataFrame, name: str, parts: int) -> None:
        df.repartition(parts).write.mode("overwrite").parquet(f"{out}/{name}.parquet")
        print(f"wrote {name}: {spark.read.parquet(f'{out}/{name}.parquet').count()} rows")

    region = spark.createDataFrame(
        list(enumerate(["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"])),
        "r_regionkey int, r_name string",
    )
    write(region, "region", 1)
    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.format_string("NATION_%d", "id").alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    write(nation, "nation", 1)

    cust = spark.range(n_cust).select(
        F.col("id").alias("c_custkey"),
        F.format_string("Customer#%09d", "id").alias("c_name"),
        (_h("cn", "id") % 25).alias("c_nationkey"),
        F.round(_u("cb", "id") * 9000 + 500, 2).alias("c_acctbal"),
        _pick(MKTSEGMENTS, _h("cm", "id")).alias("c_mktsegment"),
    )
    write(cust, "customer", max(1, int(4 * sf)))

    supp = spark.range(n_supp).select(
        F.col("id").alias("s_suppkey"),
        F.format_string("Supplier#%09d", "id").alias("s_name"),
        (_h("sn", "id") % 25).alias("s_nationkey"),
        F.round(_u("sb", "id") * 11000 - 1000, 2).alias("s_acctbal"),
    )
    write(supp, "supplier", 1)

    part = spark.range(n_part).select(
        F.col("id").alias("p_partkey"),
        F.concat(
            _pick(PADJ, _h("pa", "id")), F.lit(" "), _pick(PNOUN, _h("pn", "id"))
        ).alias("p_name"),
        F.format_string("Brand#%d", (_h("pb", "id") % 25 + 1).cast("int")).alias("p_brand"),
        _pick(PTYPES, _h("pt", "id")).alias("p_type"),
        (_h("ps", "id") % 50 + 1).cast("int").alias("p_size"),
        F.round(_u("pp", "id") * 99.9 + 900, 2).alias("p_retailprice"),
    )
    write(part, "part", max(1, int(4 * sf)))

    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        (_h("oc", "id") % n_cust).alias("o_custkey"),
        _pick(STATUSES, _h("os", "id")).alias("o_orderstatus"),
        F.round(_u("op", "id") * 498991 + 1002, 2).alias("o_totalprice"),
        (
            F.to_timestamp(F.lit("1995-01-01"))
            + F.make_dt_interval(days=(_h("od", "id") % 2404).cast("int"))
        ).alias("o_orderdate"),
        _pick(PRIORITIES, _h("opri", "id")).alias("o_orderpriority"),
    )
    write(orders, "orders", max(1, int(16 * sf)))

    li = (
        spark.range(n_orders)
        .select(
            F.col("id").alias("l_orderkey"),
            F.explode(
                F.sequence(F.lit(1), (_h("ln", "id") % 7 + 1).cast("int"))
            ).alias("l_linenumber"),
        )
        .select(
            "l_orderkey",
            (_h("lp", "l_orderkey", "l_linenumber") % n_part).alias("l_partkey"),
            (_h("ls", "l_orderkey", "l_linenumber") % n_supp).alias("l_suppkey"),
            F.col("l_linenumber").cast("int"),
            (_h("lq", "l_orderkey", "l_linenumber") % 50 + 1).cast("double").alias("l_quantity"),
            F.round(
                _u("le", "l_orderkey", "l_linenumber") * 104099 + 900, 2
            ).alias("l_extendedprice"),
            ((_h("ld", "l_orderkey", "l_linenumber") % 11) / 100.0).alias("l_discount"),
            ((_h("lt", "l_orderkey", "l_linenumber") % 9) / 100.0).alias("l_tax"),
            _pick(["A", "N", "R"], _h("lr", "l_orderkey", "l_linenumber")).alias("l_returnflag"),
            _pick(["F", "O"], _h("ll", "l_orderkey", "l_linenumber")).alias("l_linestatus"),
            (
                F.to_timestamp(F.lit("1995-01-01"))
                + F.make_dt_interval(
                    days=(
                        _h("od", "l_orderkey") % 2404
                        + _h("lsd", "l_orderkey", "l_linenumber") % 95
                        + 1
                    ).cast("int")
                )
            ).alias("l_shipdate"),
        )
    )
    write(li, "lineitem", max(1, int(32 * sf)))

    events = spark.range(n_events).select(
        F.col("id").alias("event_id"),
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_dt_interval(secs=F.round(_u("ets", "id") * 2591940, 6))
        ).alias("ts"),
        (_h("eu", "id") % 1500).alias("user_id"),
        _pick(ETYPES, _h("et", "id")).alias("event_type"),
        F.round(_u("ev", "id") * 560, 2).alias("value"),
        F.format_string('{"k": %d}', (_h("ek", "id") % 100).cast("int")).alias("props"),
    )
    write(events, "events", max(1, int(8 * sf)))

    vocab = F.array(*[F.lit(w) for w in DOCWORDS])
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.array_join(
            F.transform(
                F.sequence(F.lit(1), (_h("dn", "id") % 50 + 10).cast("int")),
                lambda i: F.element_at(
                    vocab,
                    (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit("dw"), F.col("id").cast("string"), F.lit("_"), i.cast("string"))),
                                1, 8,
                            ), 16, 10,
                        ).cast("long") % len(DOCWORDS) + 1
                    ).cast("int"),
                ),
            ),
            " ",
        ).alias("text"),
        _pick(LANGS, _h("dl", "id")).alias("lang"),
        F.format_string("src%d", (_h("ds", "id") % 20).cast("int")).alias("source"),
    ).withColumn("n_chars", F.length("text").cast("long"))
    write(docs, "documents", max(1, int(4 * sf)))

    emb = spark.range(n_emb).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                (
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit("em"), F.col("id").cast("string"), F.lit("_"), i.cast("string"))),
                            1, 8,
                        ), 16, 10,
                    ).cast("long") / 4294967296.0
                    - 0.5
                )
                * 0.6
            ).cast("float"),
        ).alias("embedding"),
        (_h("el", "id") % 10).cast("int").alias("label"),
    )
    write(emb, "embeddings", max(1, int(2 * sf)))


def main() -> None:
    sf = float(sys.argv[1])
    out = sys.argv[2]
    cpus = sys.argv[3] if len(sys.argv) > 3 else "16"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from etl_consumer_spark.session import get_spark

    spark = get_spark(
        app_name="gen_testdata", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    gen(spark, sf, out)


if __name__ == "__main__":
    main()
