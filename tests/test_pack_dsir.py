"""Sequence packing and DSIR importance: property tests on hand-built docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_consumer_spark.extensions.sampling import pack_contexts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )


def test_pack_conserves_tokens_and_counts_docs(spark):
    texts = ["a b c", "d e", "", "f g h i j", "k"]
    out = pack_contexts(_docs(spark, texts), ctx_tokens=4, n_buckets=2).collect()
    total = sum(r.n_tokens for r in out)
    assert total == 3 + 2 + 5 + 1  # empty doc excluded, nothing lost
    by_ctx = {r.ctx_id: r for r in out}
    # stream: [a b c | d e] [f g h i] [j k] -> ctx0: docs 0,1; tokens 4
    assert by_ctx[0].n_tokens == 4 and by_ctx[0].n_docs == 2
    assert by_ctx[1].n_tokens == 4
    assert by_ctx[2].n_tokens == 3  # partial tail


def test_pack_doc_spanning_multiple_contexts(spark):
    texts = ["x " * 10]  # 10 tokens, ctx=4 -> spans ctx 0,1,2
    out = {r.ctx_id: r for r in pack_contexts(_docs(spark, texts), ctx_tokens=4, n_buckets=2).collect()}
    assert {k: (v.n_docs, v.n_tokens) for k, v in out.items()} == {
        0: (1, 4), 1: (1, 4), 2: (1, 2)
    }


def test_pack_exact_boundary_no_empty_context(spark):
    texts = ["a b c d", "e f g h"]  # exactly 2 full contexts
    out = pack_contexts(_docs(spark, texts), ctx_tokens=4, n_buckets=2).collect()
    assert sorted((r.ctx_id, r.n_docs, r.n_tokens) for r in out) == [
        (0, 1, 4), (1, 1, 4)
    ]


def test_pack_bucketing_invariant(spark):
    # the two-level prefix sum must not depend on the bucket count
    texts = [f"{'t ' * (i % 7 + 1)}" for i in range(50)]
    a = sorted(map(tuple, pack_contexts(_docs(spark, texts), ctx_tokens=8, n_buckets=1).collect()))
    b = sorted(map(tuple, pack_contexts(_docs(spark, texts), ctx_tokens=8, n_buckets=16).collect()))
    assert a == b


def test_dsir_prefers_target_like_docs(spark):
    # docs whose words come from the target slice score higher
    from etl_consumer_spark.plans.queries import QUERIES

    rows = []
    for i in range(20):
        rows.append((i, "the quick brown fox jumps over lazy dogs", "en", "web", 40))
    for i in range(20, 40):
        rows.append((i, "der schnelle braune fuchs springt faul hunde", "de", "web", 44))
    # one 'de'-labelled doc written in target-like words: must outscore its peers
    rows.append((99, "the quick brown fox", "de", "web", 19))
    df = spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    )
    import tempfile, os

    d = tempfile.mkdtemp(prefix="dsir_")
    df.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    out = {r.doc_id: r.avg_importance
           for r in QUERIES["text_dsir_importance"].fn(spark, d).collect()}
    en_mean = sum(out[i] for i in range(20)) / 20
    de_mean = sum(out[i] for i in range(20, 40)) / 20
    assert en_mean > de_mean
    assert out[99] > de_mean
