"""Product quantization: encode/ADC invariants that must hold regardless
of data — codebook vectors encode to themselves with zero error, and ADC
distance equals exact distance for vectors that coincide with codebook
entries (quantization error is zero there)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_consumer_spark.extensions.similarity import pq_adc_topk, pq_encode
from etl_consumer_spark.sources.tables import load_table
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings")


def test_codebook_vectors_encode_to_themselves(spark, emb):
    """The first k vectors ARE the codebook — each must pick itself (zero
    distance beats everything, tie-break can't interfere)."""
    codes = pq_encode(emb, n_sub=4, sub_dim=16, k=8)
    first8 = [r["vec_id"] for r in emb.orderBy("vec_id").limit(8).collect()]
    own = codes.filter(F.col("vec_id").isin(first8))
    assert own.count() == 8 * 4
    mismatches = own.filter(F.col("code") != F.col("vec_id")).count()
    assert mismatches == 0


def test_every_vector_gets_full_code(spark, emb):
    codes = pq_encode(emb, n_sub=4, sub_dim=16, k=8)
    per_vec = codes.groupBy("vec_id").agg(F.count("*").alias("n"))
    assert per_vec.filter(F.col("n") != 4).count() == 0


def test_adc_exact_for_codebook_queries(spark, emb):
    """A query that coincides with a codebook entry has ADC distance 0 to
    itself (its codes point at its own subvectors), so it must rank #1."""
    queries = emb.orderBy("vec_id").limit(2)
    top = pq_adc_topk(queries, emb, n_sub=4, sub_dim=16, k_codebook=8, topk=3)
    r1 = {r["q_id"]: (r["vec_id"], r["adc_dist2"]) for r in top.filter(F.col("rnk") == 1).collect()}
    for q_id, (vec_id, dist) in r1.items():
        assert vec_id == q_id
        assert dist == 0.0
