"""Scale extensions: dedup, similarity search, text analysis, multimodal
(SURVEY §7 Phase 5 — the training-data-pipeline operator family)."""

from etl_consumer_spark.extensions import (
    dedup,
    multimodal,
    sampling,
    similarity,
    sketches,
    text_analysis,
)

__all__ = ["dedup", "multimodal", "sampling", "similarity", "sketches", "text_analysis"]
