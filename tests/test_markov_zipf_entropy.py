"""Session-4 wave 2: Markov transitions, Zipf fit, per-doc entropy."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_markov_transitions_tiny_sequence(spark):
    # user 1: a->b->a->b ; user 2: a->a->c
    rows = [
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:00:01", "b"),
        (3, 1, "2024-01-01 00:00:02", "a"),
        (4, 1, "2024-01-01 00:00:03", "b"),
        (5, 2, "2024-01-01 00:00:00", "a"),
        (6, 2, "2024-01-01 00:00:01", "a"),
        (7, 2, "2024-01-01 00:00:02", "c"),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts string, event_type string")
    df = df.withColumn("ts", F.to_timestamp("ts"))
    from pyspark.sql import Window

    seq = df.select(
        "user_id", "event_type",
        F.lag("event_type").over(Window.partitionBy("user_id").orderBy("ts", "event_id")).alias("prev"),
    )
    got = {
        (r["prev"], r["event_type"]): r["n"]
        for r in seq.filter(F.col("prev").isNotNull())
        .groupBy("prev", "event_type").agg(F.count("*").alias("n")).collect()
    }
    assert got == {("a", "b"): 2, ("b", "a"): 1, ("a", "a"): 1, ("a", "c"): 1}


def test_markov_registry_probs_are_row_normalized(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    rows = QUERIES["analytic_markov_transitions"].fn(spark, SF_DIR).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    for prev, rs in by_prev.items():
        assert sum(r["prob"] for r in rs) == pytest.approx(1.0, abs=1e-9), prev
        total = sum(r["n_transitions"] for r in rs)
        for r in rs:
            assert r["prob"] == pytest.approx(r["n_transitions"] / total, rel=1e-12)


def test_zipf_fit_recovers_slope_on_true_zipf_counts(spark):
    # construct counts ~ C / rank (slope -1): cnt_r = round(100000 / r)
    docs = [(0, " ".join(f"w{r:03d}" for r in range(1, 121) for _ in range(round(12000 / r))))]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    from pyspark.sql import Window

    wc = df.select(F.explode(F.split("text", " ")).alias("word")).groupBy("word").agg(
        F.count("*").alias("cnt")
    )
    ranked = (
        wc.orderBy(F.desc("cnt"), "word").limit(100)
        .select(F.row_number().over(Window.orderBy(F.desc("cnt"), "word")).alias("rank"), "cnt")
    )
    pts = [(r["rank"], r["cnt"]) for r in ranked.collect()]
    xs = np.log([r for r, _ in pts]); ys = np.log([c for _, c in pts])
    slope = np.polyfit(xs, ys, 1)[0]
    assert slope == pytest.approx(-1.0, abs=0.01)
    # and the registry query's fold-based OLS agrees with numpy's on its data
    from etl_consumer_spark.plans.queries import QUERIES

    row = QUERIES["text_zipf_fit"].fn(spark, SF_DIR).collect()[0]
    assert row["n_words"] == 100


def test_zipf_fold_matches_numpy_ols(spark):
    from etl_consumer_spark.plans.queries import QUERIES
    import duckdb

    row = QUERIES["text_zipf_fit"].fn(spark, SF_DIR).collect()[0]
    wc = duckdb.sql(
        f"""SELECT w, count(*) c FROM (SELECT unnest(string_split(text,' ')) w
            FROM '{SF_DIR}/documents.parquet') GROUP BY w ORDER BY c DESC, w LIMIT 100"""
    ).fetchall()
    xs = np.log(np.arange(1, len(wc) + 1, dtype=np.float64))
    ys = np.log(np.array([c for _, c in wc], dtype=np.float64))
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row["slope"] == pytest.approx(slope, rel=1e-9)
    assert row["intercept"] == pytest.approx(intercept, rel=1e-9)


def test_entropy_per_doc_orders_uniform_above_repetitive(spark):
    docs = [
        (0, " ".join(f"w{i}" for i in range(32))),      # 32 unique words
        (1, " ".join(["spam"] * 32)),                   # 1 word repeated
        (2, " ".join(["a", "b"] * 16)),                 # 2 words
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    wc = df.select("doc_id", F.explode(F.split("text", " ")).alias("w")).groupBy(
        "doc_id", "w"
    ).agg(F.count("*").alias("c"))
    agg = wc.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.sum(F.expr("c * ln(CAST(c AS DOUBLE))")).alias("s")
    )
    got = {
        r["doc_id"]: math.log(r["n"]) - r["s"] / r["n"] for r in agg.collect()
    }
    assert got[0] == pytest.approx(math.log(32), rel=1e-12)
    assert got[1] == pytest.approx(0.0, abs=1e-12)
    assert got[2] == pytest.approx(math.log(2), rel=1e-12)
    assert got[1] < got[2] < got[0]


def test_stream_moments_merges_across_multiple_microbatches(spark, tmp_path):
    """The state store must see >1 batch (maxFilesPerTrigger=1 over 4
    files) and the merged power sums must equal the one-shot batch agg."""
    import uuid

    from pyspark.sql import functions as F
    from etl_consumer_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events")
    ev.repartition(4).write.mode("overwrite").parquet(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp_path / "in"))
    )
    x = F.floor(F.col("value")).cast("long")
    sums = (
        stream.select("event_type", x.alias("x"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("x").alias("s1"), F.sum(F.expr("x*x")).alias("s2"))
    )
    sink = f"t_mom_{uuid.uuid4().hex[:8]}"
    q = (
        sums.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 4, f"expected >= 4 micro-batches, got {n_batches}"
    got = {r["event_type"]: (r["n"], r["s1"], r["s2"]) for r in spark.table(sink).collect()}
    want = {
        r["event_type"]: (r["n"], r["s1"], r["s2"])
        for r in ev.select("event_type", x.alias("x"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("x").alias("s1"), F.sum(F.expr("x*x")).alias("s2"))
        .collect()
    }
    assert got == want


def test_window_distinct_count_tiny(spark):
    """Distinct count in a trailing 2-second RANGE window, peers included."""
    rows = [
        (1, 1, 0, "a"),
        (2, 1, 1, "b"),
        (3, 1, 2, "a"),   # window [0,2]: {a,b} -> 2
        (4, 1, 5, "c"),   # window [3,5]: {c} -> 1
        (5, 1, 5, "a"),   # peer of event 4: both see {c,a} -> 2
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, es long, event_type string")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("es").rangeBetween(-2, Window.currentRow)
    got = {
        r["event_id"]: r["d"]
        for r in df.select(
            "event_id", F.size(F.collect_set("event_type").over(w)).alias("d")
        ).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 2, 5: 2}


def test_sliding_windows_cover_each_event_twice(spark):
    from etl_consumer_spark.plans.queries import QUERIES
    from etl_consumer_spark.sources.tables import load_table

    out = QUERIES["stream_sliding_windowed_agg"].fn(spark, SF_DIR)
    n_events = load_table(spark, SF_DIR, "events").count()
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == 2 * n_events  # 2h window, 1h slide -> exactly 2 windows/event


def test_shard_assignment_is_balanced_and_covers(spark):
    from etl_consumer_spark.plans.queries import QUERIES
    from etl_consumer_spark.sources.tables import load_table

    rows = QUERIES["sample_shard_assignment"].fn(spark, SF_DIR).collect()
    docs = load_table(spark, SF_DIR, "documents")
    assert len(rows) == 8
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert sum(r["total_chars"] for r in rows) == docs.agg(F.sum("n_chars")).collect()[0][0]
    totals = [r["total_chars"] for r in rows]
    max_item = docs.agg(F.max("n_chars")).collect()[0][0]
    # round-robin by size rank: spread bounded by a few max-item sizes
    assert max(totals) - min(totals) <= 3 * max_item
