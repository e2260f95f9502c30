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

from etl_consumer_spark.plans.queries import QUERIES, _DRIVER_WINDOW, _ordered_names


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
