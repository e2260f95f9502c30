"""etl_consumer_spark — a PySpark-native CDC/ETL analytics engine.

A brand-new engine with the query & data-processing capabilities of the
reference Debezium CDC consumer (``zokypesch/etl-consumer``), re-expressed
Spark-first: declarative DataFrame plans (Catalyst optimizes), columnar
micro-batches instead of row-at-a-time SQL string generation, and
``foreachBatch`` upsert sinks instead of per-row JDBC execs.

Layout
------
- ``config``     — env-driven configuration (reference: config/config.go)
- ``schemas``    — Debezium envelope StructTypes (reference: data/model.go, scheme/model.go)
- ``functions``  — scalar decoders & string functions F1–F12 (reference: main.go:205-346, utils/clean.go)
- ``sources``    — Kafka / file envelope sources S1–S7 (reference: main.go:30-68)
- ``operators``  — routing P1–P7, CDC apply C1–C7, retry E1–E3 (reference: main.go:348-424)
- ``sinks``      — state upsert, dead-letter K2, Kafka republish K3
- ``streaming``  — Structured Streaming pipeline wiring (foreachBatch)
- ``client``     — Debezium Connect REST pause/resume X1/X2 (reference: client/debezium.go)
- ``extensions`` — scale ops: dedup, similarity search, text analysis, multimodal
"""

__version__ = "0.1.0"
