"""Round-12 wave-5 replay tests: the exact sign test replays through
python's own math.comb (independent of both engines' stepwise folds),
Wilcoxon through true float midranks, and the vocabulary profile through
a plain Counter."""

from __future__ import annotations

import math
import re
from collections import Counter, defaultdict

import etl_consumer_spark.plans.queries as Q
from tests.test_round10_wave123 import raw

SF = "/root/testdata/sf0.001"


def _paired_diffs():
    counts = defaultdict(int)
    for dy, in raw(
        f"SELECT day(ts) FROM '{SF}/events.parquet' WHERE event_type = 'purchase'"
    ):
        counts[int(dy)] += 1
    return [
        (counts[d], counts[d + 15])
        for d in range(1, 16)
        if d in counts and (d + 15) in counts
    ]


def test_sign_test_matches_comb_replay(spark):
    row = Q.QUERIES["analytic_sign_test"].fn(spark, SF).collect()[0]
    pairs = _paired_diffs()
    pos = sum(1 for a, b in pairs if a > b)
    neg = sum(1 for a, b in pairs if a < b)
    tie = len(pairs) - pos - neg
    m = pos + neg
    k = min(pos, neg)
    num = 2 * sum(math.comb(m, i) for i in range(k + 1))
    if m % 2 == 0 and k == m // 2:
        num -= math.comb(m, k)
    p = num / 2**m
    assert (row["n_pairs"], row["n_pos"], row["n_neg"], row["n_tie"]) == (
        len(pairs), pos, neg, tie,
    )
    assert abs(row["p_exact"] - p) < 1e-9
    assert 0 < row["p_exact"] <= 1


def test_wilcoxon_signed_rank_matches_midrank_replay(spark):
    row = Q.QUERIES["analytic_wilcoxon_signed_rank"].fn(spark, SF).collect()[0]
    diffs = [a - b for a, b in _paired_diffs() if a != b]
    ads = sorted(abs(d) for d in diffs)
    rank = {}
    i = 0
    while i < len(ads):
        j = i
        while j < len(ads) and ads[j] == ads[i]:
            j += 1
        rank[ads[i]] = (i + 1 + j) / 2
        i = j
    m = len(diffs)
    w_plus = sum(rank[abs(d)] for d in diffs if d > 0)
    tt = sum(f**3 - f for f in Counter(ads).values())
    var = m * (m + 1) * (2 * m + 1) / 24 - tt / 48
    z = (w_plus - m * (m + 1) / 4) / math.sqrt(var)
    assert row["n_nonzero_pairs"] == m
    assert row["w_plus_x2"] == round(2 * w_plus)
    assert abs(row["e_w"] - m * (m + 1) / 4) < 0.01
    assert abs(row["z_wilcoxon"] - z) < 1e-8


def test_vocab_hapax_matches_counter_replay(spark):
    row = Q.QUERIES["text_vocab_hapax"].fn(spark, SF).collect()[0]
    freq = Counter()
    for text, in raw(f"SELECT text FROM '{SF}/documents.parquet'"):
        freq.update(re.split(r"\s+", text.strip().lower()))
    n = sum(freq.values())
    v = len(freq)
    hapax = sum(1 for c in freq.values() if c == 1)
    dis = sum(1 for c in freq.values() if c == 2)
    assert (row["n_tokens"], row["vocab"], row["hapax"], row["dis_legomena"]) == (
        n, v, hapax, dis,
    )
    assert abs(row["type_token_ratio"] - v / n) < 1e-9
    assert abs(row["hapax_share"] - hapax / v) < 1e-9
