"""Twin-equivalence cross-checks for the unregistered dedup baselines.

``dedup_ngram_jaccard`` and ``dedup_lsh_candidates`` were removed from the
public ``queries()`` surface in round 5 (their uncapped self-joins are
quadratic under skew — not something a user should run at 100 TB). They are
retained in ``plans.queries.BASELINES`` purely as correctness oracles for the
capped production paths: with a non-binding cap, the capped implementation
must produce exactly the baseline's result. That is what these tests pin.

``python tools/check_oracle.py --baselines`` additionally runs their DuckDB
value oracles.
"""

from pyspark.sql import functions as F

from etl_consumer_spark.extensions import dedup as D
from etl_consumer_spark.plans.queries import BASELINES, QUERIES
from etl_consumer_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_baselines_are_unregistered_but_retained():
    assert set(BASELINES) == {"dedup_ngram_jaccard", "dedup_lsh_candidates"}
    assert not set(BASELINES) & set(QUERIES)
    # the production twins stay on the public surface, scale-safe
    assert QUERIES["dedup_ngram_jaccard_capped"].scale_safe
    assert QUERIES["dedup_lsh_candidates_capped"].scale_safe


def test_grouped_capped_jaccard_equals_uncapped_baseline(spark):
    """jaccard_pairs_grouped with a non-binding doc-frequency cap reproduces
    the naive shingle self-join exactly (pair set and jaccard values)."""
    docs = load_table(spark, SF, "documents")
    sh = D.exploded_shingles(docs)
    baseline = D.jaccard_pairs(sh, threshold=0.05)
    capped = D.jaccard_pairs_grouped(sh, threshold=0.05, max_doc_freq=10**9)
    cols = ["a", "b", "jaccard"]
    bl = baseline.select(*[F.col(c) for c in cols])
    cp = capped.select(*[F.col(c) for c in cols])
    assert bl.exceptAll(cp).count() == 0
    assert cp.exceptAll(bl).count() == 0
    assert bl.count() > 0  # fixtures contain near-dup pairs; not vacuous


def test_capped_candidate_pairs_equal_uncapped_baseline(spark):
    """candidate_pairs with a non-binding bucket cap reproduces the naive
    bucket self-join exactly."""
    docs = load_table(spark, SF, "documents")
    sigs = D.minhash_signatures(D.exploded_shingles(docs), num_hashes=8)
    buckets = D.lsh_buckets(sigs, num_hashes=8, bands=8)
    baseline = D.candidate_pairs(buckets)
    capped = D.candidate_pairs(buckets, max_bucket_size=10**9)
    assert baseline.exceptAll(capped).count() == 0
    assert capped.exceptAll(baseline).count() == 0
    assert baseline.count() > 0


def test_baseline_query_functions_still_run(spark):
    """The BASELINES entries remain runnable end-to-end (check_oracle
    --baselines exercises their DuckDB oracles)."""
    for name, qd in BASELINES.items():
        df = qd.fn(spark, SF)
        assert df.count() >= 0, name
        assert qd.oracle, name
