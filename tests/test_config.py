"""Config env-parsing parity with reference config/config.go."""

from __future__ import annotations

from etl_consumer_spark import config as C


def test_defaults_match_reference(monkeypatch):
    for var in ("SERVER", "DBNAME", "TABLE", "REPUBLISH_LIMIT", "ACTIVE_SCHEME"):
        monkeypatch.delenv(var, raising=False)
    cfg = C.get()
    # reference defaults (config/config.go:9-29)
    assert cfg.republish_limit == 3
    assert cfg.republish is True
    assert cfg.reclaim is False
    assert cfg.replace_all_scheme is True
    assert cfg.with_timezone is False
    assert cfg.timezone_hours == 7
    assert cfg.auto_offset == "latest"


def test_topics_per_table(monkeypatch):
    monkeypatch.setenv("SERVER", "srv")
    monkeypatch.setenv("DBNAME", "db")
    monkeypatch.setenv("TABLE", "t1, t2 ,t3")
    monkeypatch.delenv("ACTIVE_SCHEME", raising=False)
    cfg = C.get()
    # reference main.go:50-53: {server}.{db}.{table} per table
    assert cfg.topics() == ["srv.db.t1", "srv.db.t2", "srv.db.t3"]


def test_topics_active_scheme(monkeypatch):
    monkeypatch.setenv("SERVER", "srv")
    monkeypatch.setenv("ACTIVE_SCHEME", "true")
    cfg = C.get()
    # reference main.go:55-58: schema topic only
    assert cfg.topics() == ["srv"]


def test_bool_and_int_parsing(monkeypatch):
    monkeypatch.setenv("RECLAIM", "TRUE")
    monkeypatch.setenv("REPUBLISH", "0")
    monkeypatch.setenv("REPUBLISH_LIMIT", "not_a_number")
    cfg = C.get()
    assert cfg.reclaim is True
    assert cfg.republish is False
    assert cfg.republish_limit == 3  # fallback to default
