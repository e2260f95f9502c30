"""Round-6 operator unit tests: Welch t-test vs a numpy reference, Jaccard
link prediction vs brute force, epoch-shuffle permutation properties, and
scene-cut detection on planted boundaries."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F


def test_welch_ttest_matches_numpy(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    row = QUERIES["analytic_welch_ttest"].fn(spark, "/root/testdata/sf0.001").collect()[0]
    import pandas as pd

    ev = pd.read_parquet("/root/testdata/sf0.001/events.parquet")
    a = np.round(ev.loc[ev.event_type == "purchase", "value"].to_numpy() * 1000) / 1000
    b = np.round(ev.loc[ev.event_type == "error", "value"].to_numpy() * 1000) / 1000
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t = (a.mean() - b.mean()) / math.sqrt(se2)
    df = se2 * se2 / (
        (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
    )
    assert row["n_a"] == len(a) and row["n_b"] == len(b)
    assert abs(row["t_stat"] - t) < 1e-9
    assert abs(row["welch_df"] - df) < 1e-6


def test_jaccard_linkpred_matches_bruteforce(spark):
    from etl_consumer_spark.extensions.graph import jaccard_link_prediction

    # two triangles sharing node 2, plus a pendant — known common-neighbor
    # structure
    E = [(0, 1), (0, 2), (1, 2), (2, 3), (2, 4), (3, 4), (4, 5)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {
        (r.node_a, r.node_b): (r.n_common, round(r.jaccard, 9))
        for r in jaccard_link_prediction(edges, max_degree=100, min_common=1).collect()
    }
    # brute force
    import itertools
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in E:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for a, b in itertools.combinations(sorted(adj), 2):
        if b in adj[a]:
            continue
        common = adj[a] & adj[b]
        if len(common) >= 1:
            want[(a, b)] = (
                len(common),
                round(len(common) / len(adj[a] | adj[b]), 9),
            )
    assert got == want


def test_jaccard_linkpred_degree_cap_removes_hub(spark):
    from etl_consumer_spark.extensions.graph import jaccard_link_prediction

    # star: hub 0 connected to 1..9; spokes share ONLY the hub, so with the
    # hub removed by the cap no candidate pair survives
    E = [(0, i) for i in range(1, 10)]
    edges = spark.createDataFrame(E, "src long, dst long")
    assert jaccard_link_prediction(edges, max_degree=5, min_common=1).count() == 0
    # uncapped, every spoke pair shares the hub
    n = jaccard_link_prediction(edges, max_degree=100, min_common=1).count()
    assert n == 9 * 8 // 2


def test_epoch_shuffle_is_complete_and_epoch_varying(spark):
    from etl_consumer_spark.plans.queries import QUERIES

    out = QUERIES["sample_epoch_shuffle"].fn(spark, "/root/testdata/sf0.001").toPandas()
    n_docs = out[out.epoch == 0].doc_id.nunique()
    # every doc exactly once per epoch
    for e in (0, 1, 2):
        sl = out[out.epoch == e]
        assert len(sl) == n_docs and sl.doc_id.nunique() == n_docs
        # positions are 1..k within each shard
        for _, g in sl.groupby("shard"):
            assert sorted(g.pos) == list(range(1, len(g) + 1))
    # different epochs produce different permutations (shard+pos differ for
    # the vast majority of docs)
    a = out[out.epoch == 0].set_index("doc_id")[["shard", "pos"]]
    b = out[out.epoch == 1].set_index("doc_id")[["shard", "pos"]]
    same = (a.join(b, lsuffix="_a").query("shard_a == shard and pos_a == pos")).shape[0]
    assert same < n_docs * 0.05


def test_scene_cuts_detects_planted_boundary(spark):
    from etl_consumer_spark.extensions import multimodal as M

    # craft payloads whose md5-derived frame means are known: just verify the
    # query agrees with a direct recomputation from the decoded frames
    docs = spark.createDataFrame(
        [(i, f"payload-{i}") for i in range(20)], "doc_id long, text string"
    )
    media = M.synthesize_avi_media_table(docs, "doc_id", "text", n_frames=4)
    feats = M.extract_video_frame_features(media).toPandas()
    assert set(feats.groupby("media_id").frame_idx.count()) == {4}
    import hashlib

    for mid, g in feats.groupby("media_id"):
        hx = hashlib.md5(f"payload-{mid}".encode()).hexdigest()
        for _, r in g.iterrows():
            want = sum(ord(c) for c in hx[8 * int(r.frame_idx): 8 * int(r.frame_idx) + 8]) / 8
            assert abs(r.mean_px - want) < 1e-12
