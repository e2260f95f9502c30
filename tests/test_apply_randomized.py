"""Randomized differential testing of the CDC apply family.

200 seeded random event sequences (mixed insert/update/delete chains over a
small key space, with and without pre-existing state) run through:

- ``apply_cdc_sequential`` vs a Python ONE-AT-A-TIME reference (the
  reference engine's per-statement semantics: dup-insert skip, update of
  a missing key no-ops, delete removes);
- ``apply_cdc`` strict mode vs a Python LATEST-PER-KEY reference (each
  key's final event judged against pre-batch state);
- ``apply_cdc`` upsert mode vs a Python latest-after-image-wins reference.

All sequences share ONE Spark job per mode: sequence i owns keys
[i*100, i*100+K), so a single state/events DataFrame carries every case
and the comparison is a dict diff — 200 cases for three jobs' cost.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from etl_consumer_spark.operators.apply import apply_cdc, apply_cdc_sequential

N_SEQ = 200
KEYS_PER_SEQ = 4
MAX_EVENTS = 10
IMG_T = "struct<k:bigint,v:bigint>"


def _gen(seed: int):
    """One random case: (initial_state dict, events list)."""
    rng = random.Random(seed)
    base = seed * 100
    state = {}
    for k in range(KEYS_PER_SEQ):
        if rng.random() < 0.5:
            state[base + k] = rng.randrange(1000)
    events = []
    for pos in range(rng.randrange(1, MAX_EVENTS + 1)):
        k = base + rng.randrange(KEYS_PER_SEQ)
        op = rng.choice(["insert", "update", "delete"])
        v = rng.randrange(1000)
        events.append((k, op, v, pos))
    return state, events


def _ref_sequential(state: dict, events: list) -> dict:
    """Reference one-at-a-time fold (reference main.go semantics)."""
    st = dict(state)
    for k, op, v, _pos in events:
        if op == "insert":
            if k not in st:
                st[k] = v
        elif op == "update":
            if k in st:
                st[k] = v
        else:  # delete
            st.pop(k, None)
    return st


def _ref_set_based(state: dict, events: list, upsert: bool) -> dict:
    """Reference for the compacted set-based apply: ONLY each key's latest
    event acts, judged against PRE-batch state."""
    latest = {}
    for k, op, v, pos in events:
        latest[k] = (op, v)  # events arrive in pos order
    st = dict(state)
    for k, (op, v) in latest.items():
        existed = k in state
        if op == "delete":
            st.pop(k, None)
        elif upsert:
            st[k] = v
        elif op == "insert":
            if not existed:
                st[k] = v
        else:  # update, strict
            if existed:
                st[k] = v
    return st


def _frames(spark, cases):
    state_rows, event_rows = [], []
    for seed, (state, events) in cases:
        state_rows += [(k, v) for k, v in state.items()]
        for k, op, v, pos in events:
            before = (k, 0) if op in ("update", "delete") else None
            after = (k, v) if op in ("insert", "update") else None
            event_rows.append((before, after, seed * 1000 + pos, 0))
    state_df = spark.createDataFrame(state_rows or [(None, None)], "k bigint, v bigint")
    if not state_rows:
        state_df = state_df.filter(F.col("k").isNotNull())
    events_df = spark.createDataFrame(
        event_rows, f"before {IMG_T}, after {IMG_T}, pos bigint, ts_ms bigint"
    )
    return state_df, events_df


def _collect(df) -> dict:
    return {r["k"]: r["v"] for r in df.collect()}


def test_apply_family_vs_references(spark):
    cases = [(s, _gen(s)) for s in range(1, N_SEQ + 1)]
    state_df, events_df = _frames(spark, cases)

    got_seq = _collect(apply_cdc_sequential(state_df, events_df, ["k"]))
    got_strict = _collect(apply_cdc(state_df, events_df, ["k"]))
    got_upsert = _collect(
        apply_cdc(state_df, events_df, ["k"], missing_update="upsert")
    )
    # backfill branch must agree with the broadcast branch
    got_backfill = _collect(
        apply_cdc(state_df, events_df, ["k"], broadcast_batch=False)
    )

    exp_seq, exp_strict, exp_upsert = {}, {}, {}
    for seed, (state, events) in cases:
        exp_seq.update(_ref_sequential(state, events))
        exp_strict.update(_ref_set_based(state, events, upsert=False))
        exp_upsert.update(_ref_set_based(state, events, upsert=True))

    for name, got, exp in (
        ("sequential", got_seq, exp_seq),
        ("strict", got_strict, exp_strict),
        ("upsert", got_upsert, exp_upsert),
        ("backfill-strict", got_backfill, exp_strict),
    ):
        diff = {
            k: (got.get(k), exp.get(k))
            for k in set(got) | set(exp)
            if got.get(k) != exp.get(k)
        }
        assert not diff, f"{name}: {len(diff)} mismatches, e.g. {list(diff.items())[:5]}"
