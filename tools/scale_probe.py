"""Scale probe: time registry queries at 1x vs Nx synthesized data.

Answers the only question that matters for a 100 TB target: how does each
operator's wall time GROW when the data grows? Copies are id-shifted on
fact keys while dimensions and shared keys (customers, parts, suppliers,
shingled vocabulary) stay fixed — so join keys get HOTTER with scale, as
they would in reality, instead of the embarrassingly-parallel disjoint-copy
setup that hides skew.

Synthesis rules (deterministic, no RNG):
- orders/lineitem: orderkey += i * (max+1) per copy i; custkey/partkey/
  suppkey unchanged (hot dims); dates unchanged.
- documents: doc_id shift; copy 0 keeps the text verbatim, later copies
  append a 2-token suffix — each base doc becomes a genuine near-dup
  clique of size N (the adversarial case for candidate joins and
  connected components).
- embeddings: vec_id shift; one dimension nudged by copy index so copies
  are near- but not exact-duplicate vectors.
- events: event_id shift; user_id unchanged (hotter sessions).
- dims (region/nation/customer/supplier/part): single copy.

Usage:
  python tools/scale_probe.py [N] [query ...]     # default N=4, default set below
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etl_consumer_spark.plans.queries import QUERIES  # noqa: E402
from etl_consumer_spark.session import get_spark  # noqa: E402
from etl_consumer_spark.sources.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT_QUERIES = [
    # round-3 additions
    "olap_q6_forecast_revenue",
    "olap_q7_volume_shipping",
    "olap_q10_returned_items",
    "olap_q14_promo_revenue",
    "olap_q18_large_orders",
    "olap_q19_disjunctive_pred",
    "text_repetition_gopher",
    "mm_png_features",
    "sim_ivf_rerank",
    "dedup_connected_components",
    "dedup_connected_components_star",
    # round-5 session-2 additions
    "text_line_dedup",
    "text_bigram_lm",
    "text_subword_tokenize",
    "layout_bucketed_join",
    "sketch_hll_per_group",
    "sample_temperature_mix",
    "dedup_embedding_clusters",
    "analytic_concurrency_sweep",
    "source_dynamic_partition_pruning",
    "sim_ann_recall_eval",
    "dedup_minhash_accuracy_eval",
]

DIMS = ("region", "nation", "customer", "supplier", "part")


def synthesize(spark, out_dir: str, n_copies: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for t in DIMS:
        load_table(spark, SF_DIR, t).write.mode("overwrite").parquet(f"{out_dir}/{t}.parquet")

    orders = load_table(spark, SF_DIR, "orders")
    okey_span = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    copies = [
        orders.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * okey_span))
        for i in range(n_copies)
    ]
    df = copies[0]
    for c in copies[1:]:
        df = df.unionByName(c)
    df.write.mode("overwrite").parquet(f"{out_dir}/orders.parquet")

    li = load_table(spark, SF_DIR, "lineitem")
    lcopies = [
        li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * okey_span))
        for i in range(n_copies)
    ]
    df = lcopies[0]
    for c in lcopies[1:]:
        df = df.unionByName(c)
    df.write.mode("overwrite").parquet(f"{out_dir}/lineitem.parquet")

    docs = load_table(spark, SF_DIR, "documents")
    dkey_span = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    dcopies = []
    for i in range(n_copies):
        c = docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * dkey_span))
        if i > 0:
            c = c.withColumn("text", F.concat("text", F.lit(f" copymark {i}")))
        dcopies.append(c)
    df = dcopies[0]
    for c in dcopies[1:]:
        df = df.unionByName(c)
    df.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    emb = load_table(spark, SF_DIR, "embeddings")
    vkey_span = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    ecopies = []
    for i in range(n_copies):
        c = emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vkey_span))
        if i > 0:
            c = c.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda v, ix: F.when(ix == 0, v + F.lit(float(i)) * 0.01).otherwise(v).cast("float"),
                ),
            )
        ecopies.append(c)
    df = ecopies[0]
    for c in ecopies[1:]:
        df = df.unionByName(c)
    df.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    ev = load_table(spark, SF_DIR, "events")
    ekey_span = ev.agg(F.max("event_id")).collect()[0][0] + 1
    vcopies = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * ekey_span))
        for i in range(n_copies)
    ]
    df = vcopies[0]
    for c in vcopies[1:]:
        df = df.unionByName(c)
    df.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")


def time_query(spark, name: str, sf_dir: str) -> float:
    fn = QUERIES[name].fn
    times = []
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return round(min(times), 3)


def main() -> None:
    args = sys.argv[1:]
    n = int(args[0]) if args and args[0].isdigit() else 4
    names = [a for a in args if not a.isdigit()] or DEFAULT_QUERIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="scale_probe", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warmup

    scaled_dir = tempfile.mkdtemp(prefix=f"scale{n}x_")
    try:
        synthesize(spark, scaled_dir, n)
        rows = []
        for name in names:
            t1 = time_query(spark, name, SF_DIR)
            tn = time_query(spark, name, scaled_dir)
            ratio = round(tn / t1, 2) if t1 > 0 else None
            rows.append({"query": name, "t_1x": t1, f"t_{n}x": tn, "ratio": ratio})
            print(f"{name:36s} 1x={t1:7.3f}s  {n}x={tn:7.3f}s  ratio={ratio}", flush=True)
        print(json.dumps({"metric": f"scale_probe_{n}x", "sf_base": SF_DIR, "rows": rows}))
    finally:
        shutil.rmtree(scaled_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
