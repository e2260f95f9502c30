"""Engine configuration, env-driven.

Mirrors the reference's envconfig surface (reference: config/config.go:6-30)
so a user of the reference can carry their environment over unchanged.
Spark-only knobs (checkpoint dir, trigger, shuffle partitions) are additive.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _env_bool(name: str, default: bool) -> bool:
    raw = os.environ.get(name)
    if raw is None:
        return default
    return raw.strip().lower() in ("1", "true", "yes", "on")


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name)
    if raw is None:
        return default
    try:
        return int(raw)
    except ValueError:
        return default


def _env_list(name: str, default: list[str]) -> list[str]:
    raw = os.environ.get(name)
    if raw is None:
        return list(default)
    return [t.strip() for t in raw.split(",") if t.strip()]


@dataclass
class Config:
    """Runtime configuration.

    Field-for-field parity with reference config/config.go:6-30; JDBC target
    fields are kept for the optional JDBC sink, Kafka fields for the
    streaming source/republish sink.
    """

    # Target database (reference: DBADDRESS/DBSOURCE/DBUSER/DBPASSWORD/DBPORT)
    db_address: str = field(default_factory=lambda: os.environ.get("DBADDRESS", "localhost"))
    db_source_name: str = field(default_factory=lambda: os.environ.get("DBSOURCE", "master_etl"))
    db_user: str = field(default_factory=lambda: os.environ.get("DBUSER", "etl_master"))
    db_password: str = field(default_factory=lambda: os.environ.get("DBPASSWORD", ""))
    db_port: int = field(default_factory=lambda: _env_int("DBPORT", 3306))
    db_log: bool = field(default_factory=lambda: _env_bool("DB_LOG", False))

    # Kafka (reference: KAFKA/GROUP/AUTO_OFFSET)
    kafka: str = field(default_factory=lambda: os.environ.get("KAFKA", "localhost:9092"))
    group: str = field(default_factory=lambda: os.environ.get("GROUP", "name-group"))
    auto_offset: str = field(default_factory=lambda: os.environ.get("AUTO_OFFSET", "latest"))

    # Topology (reference: SERVER/DBNAME/TABLE)
    server: str = field(default_factory=lambda: os.environ.get("SERVER", "dbserver_name"))
    db_name: str = field(default_factory=lambda: os.environ.get("DBNAME", "db_name"))
    tables: list[str] = field(default_factory=lambda: _env_list("TABLE", ["table_name1", "table2"]))

    # Behavior flags (reference: RECLAIM/REPUBLISH/REPUBLISH_LIMIT/ACTIVE_SCHEME/
    # REPLACE_ALL_SCHEME/WITH_TIMEZONE/TIMEZONE)
    reclaim: bool = field(default_factory=lambda: _env_bool("RECLAIM", False))
    republish: bool = field(default_factory=lambda: _env_bool("REPUBLISH", True))
    republish_limit: int = field(default_factory=lambda: _env_int("REPUBLISH_LIMIT", 3))
    # E3: pre-republish delay (reference hardcodes 100 ms, main.go:180) —
    # carried as a not_before header and honored by split_due on consume
    republish_delay_ms: int = field(default_factory=lambda: _env_int("REPUBLISH_DELAY_MS", 100))
    active_scheme: bool = field(default_factory=lambda: _env_bool("ACTIVE_SCHEME", False))
    replace_all_scheme: bool = field(default_factory=lambda: _env_bool("REPLACE_ALL_SCHEME", True))
    with_timezone: bool = field(default_factory=lambda: _env_bool("WITH_TIMEZONE", False))
    # Reference declares TIMEZONE=7 but hardcodes ±7h (main.go:271,296);
    # we parameterize and default to the reference's effective behavior.
    timezone_hours: int = field(default_factory=lambda: _env_int("TIMEZONE", 7))

    # Debezium Connect REST (reference: CONNECTOR/DEBEZIUM_ADDR/DEBEZIUM_PORT)
    connector: str = field(default_factory=lambda: os.environ.get("CONNECTOR", "etl-connector-name"))
    debezium_addr: str = field(default_factory=lambda: os.environ.get("DEBEZIUM_ADDR", "localhost"))
    debezium_port: str = field(default_factory=lambda: os.environ.get("DEBEZIUM_PORT", "8083"))

    # Spark-only knobs (additive; no reference counterpart)
    checkpoint_dir: str = field(
        default_factory=lambda: os.environ.get("CHECKPOINT_DIR", "/tmp/etl_consumer_spark/checkpoints")
    )
    max_offsets_per_trigger: int = field(default_factory=lambda: _env_int("MAX_OFFSETS_PER_TRIGGER", 100_000))
    shuffle_partitions: int = field(default_factory=lambda: _env_int("SHUFFLE_PARTITIONS", 32))
    # P7 flood guard: max passthrough statements executed per micro-batch;
    # overflow is dead-lettered (the reference executes them one-at-a-time on
    # the driver-equivalent, main.go:357-359 — unbounded there)
    passthrough_limit: int = field(default_factory=lambda: _env_int("PASSTHROUGH_LIMIT", 100))
    # driver-side observability ring buffer (BatchResult retention)
    max_results: int = field(default_factory=lambda: _env_int("MAX_RESULTS", 256))

    def topics(self) -> list[str]:
        """CDC topic list ``{server}.{db}.{table}`` per table, or the schema
        topic ``{server}`` alone when active_scheme (reference: main.go:50-58)."""
        if self.active_scheme:
            return [self.server]
        return [f"{self.server}.{self.db_name}.{t}" for t in self.tables]


def get() -> Config:
    """Build a fresh Config from the environment (reference: config.Get —
    singleton there; fresh here so tests can monkeypatch env)."""
    return Config()
