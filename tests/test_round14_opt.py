"""Round-14 optimization regressions: the changed operator internals.

Each optimization that altered HOW an operator computes (never WHAT it
computes) gets a focused probe here: the single-scan upsert-mode
apply_cdc (results identical to the sort-merge backfill plan, state
scanned once), the mm extract kernels' chained-call spread opt-out, and
the semdedup capped-pair-side broadcast.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_consumer_spark.operators.apply import apply_cdc


def _events(spark, rows):
    """rows: (key, before_val, after_val, pos) with None for null images."""
    img = "struct<k:long,v:long>"
    data = [
        (
            {"k": k, "v": bv} if bv is not None else None,
            {"k": k, "v": av} if av is not None else None,
            pos,
        )
        for k, bv, av, pos in rows
    ]
    return spark.createDataFrame(
        data, f"before {img}, after {img}, pos long"
    ).withColumn("ts_ms", F.lit(0).cast("long"))


def _state(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


# every outcome class in the upsert matrix: untouched key, update of an
# existing key, insert of an EXISTING key (after-image wins in upsert
# mode), insert of a new key, update of a MISSING key (upsert-mode
# creates it), delete of an existing key, delete of a missing key,
# and an at-least-once replay duplicate
_UPSERT_STATE = [(1, 100), (2, 200), (3, 300), (4, 400), (5, 500)]
_UPSERT_EVENTS = [
    (2, 200, 201, 10),          # update existing
    (3, None, 301, 10),         # insert over existing key
    (6, None, 600, 10),         # insert new key
    (7, 700, 701, 10),          # update missing key -> upserted
    (4, 400, None, 10),         # delete existing
    (8, 800, None, 10),         # delete missing -> no-op
    (6, None, 600, 10),         # replay duplicate
]
_UPSERT_EXPECTED = {(1, 100), (2, 201), (3, 301), (5, 500), (6, 600), (7, 701)}


def test_apply_cdc_upsert_broadcast_matches_backfill(spark):
    """The r14 single-scan upsert branch (state LEFT ANTI broadcast keys +
    after-image union) must produce exactly the rows the sort-merge
    backfill formulation produces — the cross-plan equivalence that pins
    the rewrite's semantics."""
    state = _state(spark, _UPSERT_STATE)
    ev = _events(spark, _UPSERT_EVENTS)
    fast = apply_cdc(state, ev, ["k"], missing_update="upsert", broadcast_batch=True)
    slow = apply_cdc(state, ev, ["k"], missing_update="upsert", broadcast_batch=False)
    rows_fast = {(r["k"], r["v"]) for r in fast.collect()}
    rows_slow = {(r["k"], r["v"]) for r in slow.collect()}
    assert rows_fast == rows_slow == _UPSERT_EXPECTED


def test_apply_cdc_upsert_plan_scans_state_once(spark):
    """Upsert mode must stream state through ONE left-anti broadcast join —
    no matched-keys semi probe (the noop branch's second state pass)."""
    state = _state(spark, _UPSERT_STATE)
    ev = _events(spark, _UPSERT_EVENTS)
    plan = (
        apply_cdc(state, ev, ["k"], missing_update="upsert", broadcast_batch=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan
    assert "LeftSemi" not in plan
    # the strict noop branch still carries its existence probe
    noop_plan = (
        apply_cdc(state, ev, ["k"], missing_update="noop", broadcast_batch=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in noop_plan


def test_apply_cdc_noop_semantics_unchanged(spark):
    """Strict mode (C6 dup skip, update-of-missing no-ops) is untouched by
    the upsert-branch rewrite."""
    state = _state(spark, _UPSERT_STATE)
    ev = _events(spark, _UPSERT_EVENTS)
    out = {(r["k"], r["v"]) for r in
           apply_cdc(state, ev, ["k"], missing_update="noop").collect()}
    # insert over existing key 3 keeps the STATE row; update of missing 7 no-ops
    assert out == {(1, 100), (2, 201), (3, 300), (5, 500), (6, 600)}


def test_mm_extract_spread_flag_drops_chained_exchange(spark):
    """spread=False must remove the extract-side round-robin exchange from
    a chained synthesize -> extract pipeline (the blob re-shuffle), and
    the default must keep it for raw under-partitioned inputs."""
    from etl_consumer_spark.extensions import multimodal as M

    docs = spark.createDataFrame(
        [(i, f"payload {i}") for i in range(20)], "doc_id long, text string"
    )
    media = M.synthesize_jpeg_media_table(docs, "doc_id", "text")

    def n_exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("Exchange RoundRobinPartitioning")

    chained = M.extract_image_features(media, spread=False)
    spread = M.extract_image_features(media)
    assert n_exchanges(chained) == n_exchanges(spread) - 1
    # same rows either way
    a = sorted((r["media_id"], r["mean_px"]) for r in chained.collect())
    b = sorted((r["media_id"], r["mean_px"]) for r in spread.collect())
    assert a == b


def test_semdedup_capped_pair_join_broadcasts(spark):
    """With max_rank bound, the within-cluster pair join must be a
    broadcast hash join (the a side is bounded by k*max_rank rows), not a
    sort-merge join shuffling full vectors on a k-valued key."""
    from etl_consumer_spark.extensions.dedup import semdedup_flags

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 13) / 13.0 for j in range(8)], i % 3)
         for i in range(60)],
        "vec_id long, embedding array<double>, label long",
    )
    out = semdedup_flags(emb, k=4, iterations=1, max_rank=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # and the flags stay sane: exactly one representative per cluster with
    # max_cos_earlier == -1
    rows = out.collect()
    reps = [r for r in rows if r["rnk"] == 1]
    assert all(r["max_cos_earlier"] == -1.0 and r["is_dup"] == 0 for r in reps)
    assert len(rows) == 60
