"""Round-8 targeted tests: epoch-keyed transactional stream results
(ADVICE r7 #3) and the min-ring harmonic-centrality rewrite (VERDICT r7
#5) equivalence against the retained anti-join formulation."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

import etl_consumer_spark.plans.queries as Q

SF = "/root/testdata/sf0.001"


def test_stream_tx_results_are_epoch_keyed_and_unique(spark, monkeypatch):
    """stream_cdc_transactional writes released transactions to
    epoch-partitioned result paths with overwrite semantics, so a retried
    microbatch rewrites its own partition instead of double-appending.
    Captured via the tempdir the harness creates."""
    captured = {}
    orig = tempfile.mkdtemp

    def capture(prefix=None, **kw):
        p = orig(prefix=prefix, **kw) if prefix else orig(**kw)
        if prefix == "stream_tx_":
            captured["base"] = p
        return p

    monkeypatch.setattr(tempfile, "mkdtemp", capture)
    rows = Q.QUERIES["stream_cdc_transactional"].fn(spark, SF).collect()
    base = captured["base"]
    eps = sorted(
        d for d in os.listdir(f"{base}/results") if d.startswith("epoch=")
    )
    # seed partition + one partition per microbatch epoch
    assert "epoch=-1" in eps
    assert len(eps) >= 3, f"expected per-epoch result partitions, got {eps}"
    # atomic release: no transaction ever appears in two epochs
    ids = [r["tx_id"] for r in rows]
    assert len(ids) == len(set(ids))
    # overwrite-idempotence of the epoch partition: rewriting the same
    # epoch path (what a Spark microbatch retry does) leaves ONE copy
    ep_dirs = [d for d in eps if d != "epoch=-1"]
    target = f"{base}/results/{ep_dirs[0]}"
    before = spark.read.parquet(target)
    n_before = before.count()
    before.localCheckpoint(eager=True).write.mode("overwrite").parquet(target)
    assert spark.read.parquet(target).count() == n_before


def test_harmonic_min_ring_equals_antijoin_formulation(spark):
    """The min-ring aggregation (shipped plan) must agree exactly with the
    per-ring anti-join exclusion it replaced — recomputed here as the
    independent reference implementation."""
    shipped = {
        (r["node"], r["n_reach3"], r["harmonic_micro"])
        for r in Q.QUERIES["graph_harmonic_centrality"].fn(spark, SF).collect()
    }

    orders = Q.load_table(spark, SF, "orders")
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
    )
    step = d1.select(F.col("n").alias("hop_n"), F.col("m").alias("hop_m"))
    d2 = (
        d1.join(step, d1.m == F.col("hop_n"))
        .select("n", F.col("hop_m").alias("m"))
        .filter(F.col("m") != F.col("n"))
        .distinct()
        .join(d1, ["n", "m"], "left_anti")
    )
    d3 = (
        d2.join(step, d2.m == F.col("hop_n"))
        .select("n", F.col("hop_m").alias("m"))
        .filter(F.col("m") != F.col("n"))
        .distinct()
        .join(d1, ["n", "m"], "left_anti")
        .join(d2, ["n", "m"], "left_anti")
    )
    contrib = (
        d1.select("n", F.lit(1000000).alias("w"))
        .unionAll(d2.select("n", F.lit(500000).alias("w")))
        .unionAll(d3.select("n", F.lit(333333).alias("w")))
    )
    reference = {
        (r["node"], r["n_reach3"], r["harmonic_micro"])
        for r in contrib.groupBy(F.col("n").alias("node"))
        .agg(
            F.count("*").cast("long").alias("n_reach3"),
            F.sum("w").cast("long").alias("harmonic_micro"),
        )
        .collect()
    }
    assert shipped == reference


def test_harmonic_bitset_plan_shape(spark):
    """The bitset plan must keep its joins broadcast (the bitmap tables are
    <= 400 rows) and contain no per-pair expansion artifacts: no sort-merge
    join, no cartesian product anywhere in the physical plan."""
    df = Q.QUERIES["graph_harmonic_centrality"].fn(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Cartesian" not in plan
