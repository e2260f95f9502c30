"""Mechanical enforcement of the driver-window rotation hedge.

The driver's correctness gate samples only the first 50 ``queries()``
entries, so ``_DRIVER_WINDOW`` ordering is load-bearing for external
verification. The hedge is that the FULL registry must be replica-green
(``python tools/check_oracle.py --vanilla``) for the current ordering before
any commit that touches it. These tests make that mechanical: a green
full-registry check_oracle run writes ``REPLICA_STAMP.json`` with a
fingerprint of the full iteration order; if the ordering (or registry
membership) changes without a fresh green replica, the fingerprint drifts
and pytest fails.
"""

import json
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from check_oracle import registry_fingerprint  # noqa: E402

from etl_consumer_spark.plans.queries import (
    QUERIES,
    _DRIVER_WINDOW,
    _R13_BACKLOG,
    _ordered_names,
)


def test_window_is_50_registered_unique_names():
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50
    missing = [n for n in _DRIVER_WINDOW if n not in QUERIES]
    assert not missing, f"window names not registered: {missing}"


def test_ordered_names_cover_registry_exactly_once():
    names = _ordered_names()
    assert names[: len(_DRIVER_WINDOW)] == list(_DRIVER_WINDOW)
    assert sorted(names) == sorted(QUERIES)


def test_replica_stamp_matches_current_ordering():
    """Fails whenever queries() iteration order changed since the last green
    full-registry replica — run `python tools/check_oracle.py --vanilla` (all
    queries green) to refresh REPLICA_STAMP.json."""
    try:
        with open("/root/repo/REPLICA_STAMP.json") as f:
            stamp = json.load(f)
    except FileNotFoundError:
        pytest.fail(
            "REPLICA_STAMP.json missing — run `python tools/check_oracle.py "
            "--vanilla` with the full registry green to create it"
        )
    current = registry_fingerprint(_ordered_names())
    assert stamp["fingerprint"] == current, (
        "queries() ordering changed since the last green full-registry "
        "replica — run `python tools/check_oracle.py --vanilla` before "
        "committing a driver-window rotation"
    )
    assert stamp["failures"] == 0
    assert stamp["n_queries"] == len(QUERIES)


def _driver_verified_names() -> set:
    """Union of green rows across every CORRECTNESS_r*.json the driver has
    written so far (rows_match + no error = that query has external
    verification)."""
    import glob

    verified = set()
    for path in sorted(glob.glob("/root/repo/CORRECTNESS_r*.json")):
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if isinstance(row, dict) and row.get("rows_match") and row.get("err") is None:
                verified.add(name)
    return verified


def test_unverified_backlog_is_bounded_and_enumerated():
    """VERDICT r7 #2: the registry must never again grow more unverified
    entries than a driver window can absorb. Every registered query must be
    (a) driver-verified in some CORRECTNESS_r*.json, (b) in the current
    _DRIVER_WINDOW (scheduled for this round's verification), or (c) in the
    explicit, bounded _R13_BACKLOG. Adding a new query therefore forces a
    conscious scheduling decision, and the backlog can never exceed one
    window (50)."""
    verified = _driver_verified_names()
    scheduled = set(_DRIVER_WINDOW) | set(_R13_BACKLOG)
    orphans = [n for n in QUERIES if n not in verified and n not in scheduled]
    assert not orphans, (
        f"{len(orphans)} registry entries are neither driver-verified nor "
        f"scheduled in _DRIVER_WINDOW/_R13_BACKLOG: {orphans[:10]} — schedule "
        "them (and keep the backlog <= 50) before registering more queries"
    )
    backlog = [n for n in QUERIES if n not in verified and n not in set(_DRIVER_WINDOW)]
    assert len(backlog) <= 50, (
        f"unverified backlog beyond the current window is {len(backlog)} > 50 "
        "— registry growth is frozen until the backlog fits one driver window"
    )


def test_backlog_names_are_registered_and_disjoint_from_window():
    assert len(set(_R13_BACKLOG)) == len(_R13_BACKLOG)
    missing = [n for n in _R13_BACKLOG if n not in QUERIES]
    assert not missing, f"backlog names not registered: {missing}"
    overlap = set(_R13_BACKLOG) & set(_DRIVER_WINDOW)
    assert not overlap, f"names both in window and backlog: {sorted(overlap)}"
