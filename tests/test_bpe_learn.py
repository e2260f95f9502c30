"""BPE merge learning vs an independent pure-Python reference
(the Sennrich ACL'16 get_stats/merge_vocab algorithm, dict-based)."""

from __future__ import annotations

import re
from collections import Counter

from etl_consumer_spark.extensions.text_analysis import bpe_learn


def _ref_bpe(texts: list[str], n_merges: int, min_word_len: int = 2):
    vocab = Counter()
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if len(w) >= min_word_len:
                vocab[tuple(w)] += 1
    merges = []
    for rank in range(1, n_merges + 1):
        stats = Counter()
        for syms, freq in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += freq
        if not stats:
            break
        # most frequent, ties lexicographic on (l, r)
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1], best[0] + best[1], stats[best]))
        new_vocab = Counter()
        for syms, freq in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += freq
        vocab = new_vocab
    return merges


def _run(spark, texts, n):
    docs = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = bpe_learn(docs, n_merges=n)
    return [
        (r.merge_rank, r.merge_left, r.merge_right, r.merged, r.pair_count)
        for r in got.orderBy("merge_rank").collect()
    ]


def test_bpe_matches_reference_on_classic_corpus(spark):
    # the classic low/lower/newest/widest example (Sennrich Fig. 1 shape)
    texts = ["low low low lower lower newest newest newest newest widest widest"]
    assert _run(spark, texts, 5) == _ref_bpe(texts, 5)


def test_bpe_matches_reference_with_repeats_and_ties(spark):
    # aaaa stresses overlapping-pair counting + left-to-right merge folding;
    # 'ab ba' and symmetric counts stress the lexicographic tie-break
    texts = [
        "aaaa aaaa aa baab",
        "ab ba ab ba cd dc",
        "the quick brown fox the quick fox",
    ]
    assert _run(spark, texts, 6) == _ref_bpe(texts, 6)


def test_bpe_merged_symbol_participates_in_later_merges(spark):
    # after merging (e,s) -> es, (es,t) -> est must be countable: merges
    # compose into multi-char symbols
    texts = ["test test test rest rest best"]
    got = _run(spark, texts, 4)
    assert got == _ref_bpe(texts, 4)
    merged = [m[3] for m in got]
    assert any(len(m) > 2 for m in merged)  # a merge built on a merge


def test_bpe_matches_reference_on_random_corpora(spark):
    """Randomized differential: small random corpora over a 3-letter
    alphabet (maximizing repeated-pair and tie cases) must match the
    reference merge-for-merge. Deterministic seeds — reproducible."""
    import random

    for seed in (7, 21, 99):
        rng = random.Random(seed)
        texts = [
            " ".join(
                "".join(rng.choice("aab") for _ in range(rng.randint(2, 6)))
                for _ in range(rng.randint(3, 12))
            )
            for _ in range(4)
        ]
        assert _run(spark, texts, 5) == _ref_bpe(texts, 5), f"seed {seed}: {texts}"
