"""LogCommitStateStore: optimistic-concurrency commits for TRUE concurrent
writers — the capability gap the staged-manifest store documents in
COVERAGE.md §K1 (its tests show an interleaved second writer discarding
the first's staging; here both commit)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_consumer_spark.sinks.log_commit import CommitConflictError, LogCommitStateStore


def ev_rows(spark, rows):
    return spark.createDataFrame(
        rows,
        "before struct<id:long,v:long>, after struct<id:long,v:long>, pos long, ts_ms long",
    )


def seed(spark, store, n=8):
    state = spark.createDataFrame([(i, i * 10) for i in range(1, n + 1)], "id long, v long")
    store.init("t", state, ["id"])
    return {(i, i * 10) for i in range(1, n + 1)}


def contents(store):
    return {(r["id"], r["v"]) for r in store.read("t").collect()}


def _distinct_bucket_ids(spark, n_buckets, how_many=2, start=100):
    """Pick ids landing in pairwise-distinct hash buckets."""
    rows = (
        spark.range(start, start + 500)
        .select(F.col("id"), F.pmod(F.hash("id"), F.lit(n_buckets)).alias("b"))
        .collect()
    )
    picked, seen = [], set()
    for r in rows:
        if r["b"] not in seen:
            picked.append(int(r["id"]))
            seen.add(r["b"])
        if len(picked) == how_many:
            return picked
    raise AssertionError("could not find distinct buckets")


def test_upsert_matrix_and_versions(spark, tmp_path):
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    base = seed(spark, store)
    v = store.upsert(
        "t",
        ev_rows(
            spark,
            [
                (None, Row(id=100, v=1), 1, 0),            # insert
                (Row(id=2, v=20), Row(id=2, v=21), 2, 0),  # update
                (Row(id=3, v=30), None, 3, 0),             # delete
            ],
        ),
    )
    assert v == 1
    expect = {t for t in base if t[0] not in (2, 3)} | {(2, 21), (100, 1)}
    assert contents(store) == expect
    # time travel: version 0 is still the seeded state
    assert {(r["id"], r["v"]) for r in store.read("t", version=0).collect()} == base


def test_true_interleave_disjoint_buckets_both_commit(spark, tmp_path):
    """Writer A writes its data files; writer B commits a full batch before
    A claims; A's claim sees a DISJOINT winner and REBASES — both batches
    land, no data rewrite, versions 1 and 2."""
    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    base = seed(spark, a)
    id_a, id_b = _distinct_bucket_ids(spark, 8, 2)

    def b_commits(table):
        a._pre_claim_hook = None
        b.upsert("t", ev_rows(spark, [(None, Row(id=id_b, v=2), 1, 0)]))

    a._pre_claim_hook = b_commits
    v = a.upsert("t", ev_rows(spark, [(None, Row(id=id_a, v=1), 1, 0)]))
    assert v == 2  # B won version 1; A rebased onto it
    assert contents(a) == base | {(id_a, 1), (id_b, 2)}


def test_true_interleave_overlapping_buckets_remerges(spark, tmp_path):
    """Same key from both writers: A's claim detects the overlap, discards
    its stale merge, RE-MERGES from B's committed state, and commits —
    the outcome equals the serial order B-then-A."""
    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    base = seed(spark, a)

    def b_commits(table):
        a._pre_claim_hook = None  # fire once
        b.upsert("t", ev_rows(spark, [(None, Row(id=500, v=2), 1, 0)]))

    a._pre_claim_hook = b_commits
    v = a.upsert("t", ev_rows(spark, [(Row(id=500, v=2), Row(id=500, v=1), 2, 0)]))
    assert v == 2
    # serial B-then-A: B inserts (500, 2), A updates it to (500, 1)
    assert contents(a) == base | {(500, 1)}


def test_crash_before_claim_leaves_state_unchanged(spark, tmp_path):
    """A writer dying after its data write but before its claim changes
    nothing: the directory is unreferenced garbage, removed by vacuum."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    base = seed(spark, store)

    def die(table):
        raise RuntimeError("writer crashed before claim")

    store._pre_claim_hook = die
    with pytest.raises(RuntimeError, match="before claim"):
        store.upsert("t", ev_rows(spark, [(None, Row(id=100, v=1), 1, 0)]))
    store._pre_claim_hook = None
    assert contents(store) == base
    data_dirs = os.listdir(str(tmp_path / "t" / "data"))
    assert len(data_dirs) == 2  # seed + orphan
    # retention guard: the orphan is YOUNG, so default vacuum must keep it
    # (an unreferenced young dir could be a live writer's unclaimed data)
    assert store.vacuum("t") == []
    removed = store.vacuum("t", retention_s=0)
    assert len(removed) == 1
    assert contents(store) == base  # vacuum never touches referenced data


def test_contended_same_bucket_gives_up_cleanly(spark, tmp_path):
    """A writer that loses EVERY re-merge raises CommitConflictError rather
    than spinning or corrupting — bounded optimism."""
    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=8, max_retries=1)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    seed(spark, a)
    counter = {"n": 0}

    def always_conflict(table):
        counter["n"] += 1
        b.upsert("t", ev_rows(spark, [(None, Row(id=500, v=counter["n"]), counter["n"], 0)]))

    a._pre_claim_hook = always_conflict
    with pytest.raises(CommitConflictError, match="gave up"):
        a.upsert("t", ev_rows(spark, [(Row(id=500, v=1), Row(id=500, v=99), 50, 0)]))
    a._pre_claim_hook = None
    # B's commits all landed; A's failed batch left no trace in the log
    got = contents(a)
    assert (500, counter["n"]) in got
    assert not any(v == 99 for _, v in got)


def test_evolve_is_full_barrier_commit(spark, tmp_path):
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    base = seed(spark, store)
    store.evolve("t", "ALTER TABLE t ADD COLUMNS (note string)")
    got = {(r["id"], r["v"], r["note"]) for r in store.read("t").collect()}
    assert got == {(i, v, None) for i, v in base}
    # the evolve commit carries the new schema; later upserts see it
    ev = spark.createDataFrame(
        [(None, Row(id=99, v=9, note="x"), 1, 0)],
        "before struct<id:long,v:long,note:string>, "
        "after struct<id:long,v:long,note:string>, pos long, ts_ms long",
    )
    store.upsert("t", ev, ["id"])
    assert (99, 9, "x") in {
        (r["id"], r["v"], r["note"]) for r in store.read("t").collect()
    }


def test_pipeline_e2e_with_log_commit_store(spark, tmp_path):
    """The full Structured-Streaming CDC pipeline (envelope parse -> route
    -> decode -> apply) committing through the log-arbitrated store: same
    final state as the harness's expected batch semantics."""
    from pyspark.sql import functions as SF

    from etl_consumer_spark.plans.queries import _stream_cdc_run
    from etl_consumer_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    store = LogCommitStateStore(spark, str(tmp_path / "state"), n_buckets=16)
    got_df = _stream_cdc_run(spark, sf, store=store)
    got = {
        (r["o_orderkey"], r["o_custkey"], r["o_orderstatus"], round(r["o_totalprice"], 2))
        for r in got_df.collect()
    }
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    # harness semantics: seed = k != 3; events k==0 update(+1000),
    # k==1 delete, k==3 insert, k==2 untouched — final state is every
    # order except k==1, with k==0 prices bumped
    k = SF.col("o_orderkey") % 4
    expected_df = orders.filter(k != 1).withColumn(
        "o_totalprice",
        SF.when(k == 0, SF.col("o_totalprice") + 1000.0).otherwise(SF.col("o_totalprice")),
    )
    expected = {
        (r["o_orderkey"], r["o_custkey"], r["o_orderstatus"], round(r["o_totalprice"], 2))
        for r in expected_df.collect()
    }
    assert got == expected
    # the log recorded one init commit plus one commit per applied microbatch
    assert store.current_version("orders") >= 1


def test_threaded_writers_all_commit(spark, tmp_path):
    """REAL concurrency: four threads each commit three disjoint-key
    batches against one table with no scripted interleaving. Every batch
    must land (rebase absorbs lost races), versions must be a gap-free
    sequence, and the final state must be the union of all batches."""
    from concurrent.futures import ThreadPoolExecutor

    n_writers, n_batches = 4, 3
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=16, max_retries=10)
    base = seed(spark, store)

    def writer(w):
        s = LogCommitStateStore(spark, str(tmp_path), n_buckets=16, max_retries=10)
        got_versions = []
        for i in range(n_batches):
            key = 1000 + w * 100 + i  # unique per (writer, batch): no overlap
            v = s.upsert("t", ev_rows(spark, [(None, Row(id=key, v=w * 10 + i), 1, 0)]))
            got_versions.append(v)
        return got_versions

    with ThreadPoolExecutor(max_workers=n_writers) as pool:
        all_versions = [v for vs in pool.map(writer, range(n_writers)) for v in vs]

    # exactly one commit per batch, versions 1..12 with no gaps or dupes
    assert sorted(all_versions) == list(range(1, n_writers * n_batches + 1))
    assert store.current_version("t") == n_writers * n_batches
    expect = base | {
        (1000 + w * 100 + i, w * 10 + i)
        for w in range(n_writers)
        for i in range(n_batches)
    }
    assert contents(store) == expect


def test_randomized_serial_equivalence_with_partitioned_store(spark, tmp_path):
    """Differential store test: the same seeded random batch sequence
    applied serially through the staged-manifest store and the log-commit
    store must land on IDENTICAL state (both delegate merging to
    apply_cdc; this pins the read-slice/rewrite plumbing of each)."""
    import random

    from etl_consumer_spark.sinks.partitioned_state import PartitionedParquetStateStore

    rng = random.Random(88)
    seed_rows = [(k, rng.randrange(1000)) for k in range(40) if rng.random() < 0.6]
    state = spark.createDataFrame(seed_rows, "id long, v long")
    p = PartitionedParquetStateStore(spark, str(tmp_path / "p"), n_buckets=8)
    lc = LogCommitStateStore(spark, str(tmp_path / "lc"), n_buckets=8)
    p.init("t", state, ["id"])
    lc.init("t", state, ["id"])

    for _ in range(4):  # 4 batches of mixed ops over a hot 40-key space
        rows = []
        for pos in range(rng.randrange(3, 9)):
            k = rng.randrange(40)
            op = rng.choice(["insert", "update", "delete"])
            v = rng.randrange(1000)
            if op == "insert":
                rows.append((None, Row(id=k, v=v), pos, 0))
            elif op == "update":
                rows.append((Row(id=k, v=0), Row(id=k, v=v), pos, 0))
            else:
                rows.append((Row(id=k, v=0), None, pos, 0))
        batch = ev_rows(spark, rows)
        p.upsert("t", batch, ["id"])
        lc.upsert("t", batch, ["id"])

    got_p = {(r["id"], r["v"]) for r in p.read("t").collect()}
    got_lc = contents(lc)
    assert got_p == got_lc


def test_read_plan_prunes_partitions(spark, tmp_path):
    """read() must reach the scans with _bucket partition filters — each
    data directory is read only for the buckets its manifest rows still
    own, so a point-lookup-ish read never scans superseded bucket data."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    seed(spark, store)
    store.upsert("t", ev_rows(spark, [(None, Row(id=100, v=1), 1, 0)]))
    plan = store.read("t")._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "_bucket" in plan


def test_read_keys_pruned_lookup(spark, tmp_path):
    """read_keys returns exactly the requested rows, prunes to the keys'
    buckets (PartitionFilters in the plan), and reads only the manifest
    directories owning those buckets."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    state = spark.createDataFrame([(i, i * 7) for i in range(1, 101)], "id long, v long")
    store.init("t", state, ["id"])
    store.upsert("t", ev_rows(spark, [(Row(id=15, v=105), Row(id=15, v=999), 1, 0)]))
    out = store.read_keys("t", [15, 16, 55])
    rows = {r["id"]: r["v"] for r in out.collect()}
    assert rows == {15: 999, 16: 112, 55: 385}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert store.read_keys("t", []).count() == 0


def test_upsert_never_rewrites_untouched_data_dirs(spark, tmp_path):
    """Per-batch I/O is O(touched buckets): an upsert adds ONE new data
    directory and leaves every existing directory byte-identical (mtime
    check, the partitioned store's invariance test applied here)."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=16)
    state = spark.createDataFrame([(i, i) for i in range(200)], "id long, v long")
    store.init("t", state, ["id"])
    root = str(tmp_path / "t" / "data")

    def mtimes():
        out = {}
        for d in os.listdir(root):
            for sub, _, files in os.walk(os.path.join(root, d)):
                for f in files:
                    p = os.path.join(sub, f)
                    out[p] = os.path.getmtime(p)
        return out

    before = mtimes()
    store.upsert("t", ev_rows(spark, [(Row(id=5, v=5), Row(id=5, v=99), 1, 0)]))
    after = mtimes()
    changed = [p for p in before if after.get(p) != before[p]]
    assert changed == []  # existing files immutable
    assert len(os.listdir(root)) == 2  # exactly one new data dir


def test_writer_with_different_bucket_hint_uses_committed_layout(spark, tmp_path):
    """A store instance opened with a DIFFERENT n_buckets hint must bucket
    its writes with the table's COMMITTED count — otherwise the manifest
    keys (committed count) and the data partition values (instance hint)
    diverge and the batch silently vanishes."""
    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=16)
    base = seed(spark, a)
    b = LogCommitStateStore(spark, str(tmp_path))  # default hint: 64
    b.upsert("t", ev_rows(spark, [(None, Row(id=300, v=3), 1, 0)]))
    assert contents(a) == base | {(300, 3)}
    assert {r["id"] for r in a.read_keys("t", [300]).collect()} == {300}


# --- round 9: checkpointing/truncation, supersession vacuum, claim bound,
# --- pk-rename grammar, and the unscripted two-pipeline e2e ----------------


def test_checkpoint_truncation_bounds_log_500_commits(spark, tmp_path):
    """VERDICT r8 #5: a 500-commit table keeps O(1) snapshot reads and a
    BOUNDED _log/ after truncation. The 500 commits are synthesized at the
    log layer (each carries the full manifest, exactly what upsert writes)
    so the test runs in milliseconds; the real-upsert path is covered by
    test_real_commits_checkpoint_and_truncate below."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8, checkpoint_interval=20)
    base = seed(spark, store)
    meta = store._meta("t")
    for v in range(1, 501):
        commit = {
            "version": v,
            "manifest": dict(meta["manifest"]),
            "touched": [],
            "pk": meta["pk"],
            "n_buckets": meta["n_buckets"],
            "schema": meta["schema"],
            "writer": "synth",
        }
        assert store._claim("t", v, commit)
        store._maybe_checkpoint("t", v)
    assert store.current_version("t") == 500
    assert store.latest_checkpoint("t") == 500
    removed = store.truncate_log("t", retention_s=0)
    assert len(removed) == 500  # versions 0..499
    assert store._log_versions("t") == [500]
    # snapshot read is one commit-file read; state fully intact
    assert contents(store) == base
    assert store.exists("t")
    assert store._meta("t")["pk"] == ["id"]
    # further commits continue from the truncated log
    v = store.upsert("t", ev_rows(spark, [(None, Row(id=900, v=9), 1, 0)]))
    assert v == 501
    assert (900, 9) in contents(store)


def test_real_commits_checkpoint_and_truncate(spark, tmp_path):
    """Real upsert-driven checkpoints: markers land every N commits,
    truncation keeps [checkpoint, latest], time travel above the
    checkpoint survives, below it raises."""
    import pytest as _pytest

    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8, checkpoint_interval=10)
    base = seed(spark, store)
    for i in range(1, 13):
        store.upsert("t", ev_rows(spark, [(None, Row(id=100 + i, v=i), i, 0)]))
    assert store.latest_checkpoint("t") == 10
    removed = store.truncate_log("t", retention_s=0)
    assert removed == list(range(0, 10))
    assert store._log_versions("t") == [10, 11, 12]
    assert contents(store) == base | {(100 + i, i) for i in range(1, 13)}
    # time travel: retained version readable, truncated version gone
    assert (100 + 11, 11) in {
        (r["id"], r["v"]) for r in store.read("t", version=11).collect()
    }
    with _pytest.raises(FileNotFoundError):
        store.read("t", version=5)


def test_vacuum_retention_keys_on_supersession_not_creation(spark, tmp_path):
    """ADVICE r8: a data directory created HOURS ago but superseded SECONDS
    ago must survive vacuum's retention window (a concurrent reader of the
    previous snapshot may still be scanning it); only when the SUPERSEDING
    commit ages past retention does it become removable. Orphans (never
    referenced) still age by directory mtime."""
    import time

    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=2)
    seed(spark, store, n=8)
    data_root = str(tmp_path / "t" / "data")
    (seed_dir,) = os.listdir(data_root)
    # age the seed directory far past retention
    old = time.time() - 7200
    os.utime(f"{data_root}/{seed_dir}", (old, old))
    # supersede EVERY bucket of the seed dir just now (ids 1..8 cover both
    # buckets of n_buckets=2 with overwhelming probability; assert it)
    store.upsert(
        "t",
        ev_rows(spark, [(Row(id=i, v=i * 10), Row(id=i, v=i * 10 + 1), i, 0) for i in range(1, 9)]),
    )
    live = set(store._read_commit("t", 1)["manifest"].values())
    assert f"{data_root}/{seed_dir}" not in live, "seed dir must be fully superseded"
    # OLD behavior would remove the 2h-old dir; supersession was seconds ago
    assert store.vacuum("t", retention_s=3600) == []
    # age the superseding commit file past retention -> now removable
    os.utime(store._commit_path("t", 1), (old, old))
    removed = store.vacuum("t", retention_s=3600)
    assert removed == [f"{data_root}/{seed_dir}"]
    # orphan path unchanged: an unreferenced OLD dir goes by its own mtime
    orphan = f"{data_root}/deadbeefcafe"
    os.makedirs(orphan)
    os.utime(orphan, (old, old))
    assert store.vacuum("t", retention_s=3600) == [orphan]


def test_lost_claim_races_are_bounded(spark, tmp_path, monkeypatch):
    """ADVICE r8: a writer that loses every CLAIM race to disjoint winners
    (so the re-merge counter never increments) must raise instead of
    spinning forever."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8, max_retries=1)
    seed(spark, store)
    monkeypatch.setattr(
        LogCommitStateStore, "_claim", lambda self, *a, **kw: False
    )
    with pytest.raises(CommitConflictError, match="lost claim races"):
        store.upsert("t", ev_rows(spark, [(None, Row(id=100, v=1), 1, 0)]))
    monkeypatch.undo()
    # the loser's data directory was cleaned up: only the seed dir remains
    assert len(os.listdir(str(tmp_path / "t" / "data"))) == 1
    # and the store still works
    store.upsert("t", ev_rows(spark, [(None, Row(id=100, v=1), 1, 0)]))
    assert (100, 1) in contents(store)


def test_evolve_pk_rename_handles_quoted_and_qualified(spark, tmp_path):
    """ADVICE r8: backtick-quoted / db-qualified RENAME COLUMN (the shape
    the captured Debezium fixtures carry) must update the committed pk
    list, or the bucket expression binds a stale name and every later
    upsert fails."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    base = seed(spark, store)
    store.evolve("t", "ALTER TABLE `db`.`t` RENAME COLUMN `id` TO `entity_id`")
    assert store._meta("t")["pk"] == ["entity_id"]
    ev = spark.createDataFrame(
        [(None, Row(entity_id=700, v=7), 1, 0)],
        "before struct<entity_id:long,v:long>, "
        "after struct<entity_id:long,v:long>, pos long, ts_ms long",
    )
    store.upsert("t", ev, ["entity_id"])
    got = {(r["entity_id"], r["v"]) for r in store.read("t").collect()}
    assert got == base | {(700, 7)}


def test_two_pipelines_concurrent_commits_equal_serial(spark, tmp_path):
    """VERDICT r8 #7: two FULL CDCPipeline instances (separate file
    transports and checkpoints, one shared table, log-commit backend) run
    CONCURRENTLY with no seam hooks — multi-batch triggers force their
    commits to interleave, and the final state must equal a serial apply
    of both streams."""
    import json as _json
    import threading

    from pyspark.sql import functions as SF

    from etl_consumer_spark.config import Config
    from etl_consumer_spark.sources.envelope import WireField
    from etl_consumer_spark.sources.kafka import file_envelope_stream
    from etl_consumer_spark.streaming.pipeline import CDCPipeline, TableSpec

    server, db, tbl = "dbserver2", "batch", "batch_seq"
    topic = f"{server}.{db}.{tbl}"
    store = LogCommitStateStore(spark, str(tmp_path / "state"), n_buckets=4, max_retries=20)
    store.init(tbl, spark.createDataFrame([], "id long, seq long"), ["id"])

    def envelope(id_, seq, pos):
        return _json.dumps(
            {
                "payload": {
                    "before": None,
                    "after": {"id": id_, "seq": seq},
                    "source": {"name": server, "db": db, "table": tbl,
                                "file": "mysql-bin.000082", "pos": pos, "row": 0,
                                "query": None},
                    "op": "c",
                    "ts_ms": 1587202401764,
                }
            }
        )

    def write_transport(path, ids):
        # one file per id -> with maxFilesPerTrigger=1, one COMMIT per id,
        # so the two pipelines' OCC claims genuinely interleave
        for i, id_ in enumerate(ids):
            spark.createDataFrame(
                [(topic, envelope(id_, id_ % 97, 100 + i).encode(), None, None)],
                "topic string, value binary, "
                "headers array<struct<key:string,value:binary>>, timestamp timestamp",
            ).coalesce(1).write.mode("append").parquet(path)

    ids_a = list(range(1000, 1008))
    ids_b = list(range(2000, 2008))
    ta, tb = str(tmp_path / "ta"), str(tmp_path / "tb")
    write_transport(ta, ids_a)
    write_transport(tb, ids_b)

    def mk_pipe(name):
        cfg = Config()
        cfg.server, cfg.db_name, cfg.tables = server, db, [tbl]
        return CDCPipeline(
            spark,
            cfg,
            [TableSpec(tbl, [WireField("id", "int64"), WireField("seq", "int32")], ["id"])],
            LogCommitStateStore(spark, str(tmp_path / "state"), n_buckets=4, max_retries=20),
            dead_letter_path=str(tmp_path / f"dl_{name}"),
            republish_path=str(tmp_path / f"rp_{name}"),
        )

    errs = []

    def run(name, transport):
        try:
            pipe = mk_pipe(name)
            q = pipe.start(
                file_envelope_stream(spark, transport, max_files_per_trigger=1),
                checkpoint_dir=str(tmp_path / f"ck_{name}"),
                trigger_available_now=True,
            )
            q.awaitTermination(300)
            if any(r.dead_letters for r in pipe.results):
                errs.append(f"{name}: dead letters on a clean stream")
        except Exception as exc:  # noqa: BLE001
            errs.append(f"{name}: {exc}")

    th_a = threading.Thread(target=run, args=("a", ta))
    th_b = threading.Thread(target=run, args=("b", tb))
    th_a.start(); th_b.start()
    th_a.join(); th_b.join()
    assert not errs, errs

    got = {(r["id"], r["seq"]) for r in store.read(tbl).collect()}
    expected = {(i, i % 97) for i in ids_a + ids_b}
    assert got == expected
    # both streams committed: the log holds >= 2 DML commits and is gap-free
    versions = store._log_versions(tbl)
    assert versions == list(range(0, versions[-1] + 1))


def test_checkpoint_rejects_nonexistent_version(spark, tmp_path):
    """Review r9 finding #4: a marker for a version with no commit file
    would make the next truncate_log delete EVERY real commit."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    seed(spark, store)
    with pytest.raises(ValueError, match="no such commit"):
        store.checkpoint("t", 999)
    # the guard kept the log intact
    assert store.truncate_log("t", retention_s=0) == []
    assert store.current_version("t") == 0


def test_truncate_removes_superseded_markers(spark, tmp_path):
    """Review r9 finding #5: markers below the newest checkpoint are dead
    (only max is consulted) and must go with the truncated commits, or
    _log/ regrows one marker per interval forever."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=8, checkpoint_interval=2)
    seed(spark, store)
    for i in range(1, 7):
        store.upsert("t", ev_rows(spark, [(None, Row(id=100 + i, v=i), i, 0)]))
    assert store.latest_checkpoint("t") == 6
    store.truncate_log("t", retention_s=0)
    names = os.listdir(str(tmp_path / "t" / "_log"))
    markers = sorted(n for n in names if n.endswith(".checkpoint"))
    assert markers == ["00000006.checkpoint"]
    assert store._log_versions("t") == [6]


def test_partial_remerge_keeps_disjoint_bucket_files(spark, tmp_path):
    """Round-9 partial re-merge: when a writer's batch touches buckets
    {X, Y} and a concurrent winner touches only X, the retry must
    re-merge ONLY X — Y's already-written file stays in the final
    manifest (no second write of Y), and the result still equals the
    serial order winner-then-us."""
    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    base = seed(spark, a)
    id_x, id_y = _distinct_bucket_ids(spark, 8, 2)

    def b_commits_on_x(table):
        a._pre_claim_hook = None  # fire once
        b.upsert("t", ev_rows(spark, [(None, Row(id=id_x, v=111), 1, 0)]))

    a._pre_claim_hook = b_commits_on_x
    # A updates the same key id_x (bucket X conflicts) AND inserts id_y
    # (bucket Y stays disjoint)
    v = a.upsert(
        "t",
        ev_rows(
            spark,
            [
                (Row(id=id_x, v=111), Row(id=id_x, v=222), 2, 0),
                (None, Row(id=id_y, v=7), 2, 0),
            ],
        ),
    )
    assert v == 2
    # serial B-then-A: B inserts (id_x, 111), A updates it to 222 + adds id_y
    assert contents(a) == base | {(id_x, 222), (id_y, 7)}
    # partial property: bucket Y's manifest entry is a DIFFERENT directory
    # from bucket X's (X was re-merged into a fresh dir; Y kept its first
    # write), proving the retry did not rewrite the disjoint bucket
    commit = a._read_commit("t", 2)

    def bucket_of(key: int) -> str:
        # same typed hash the store uses: the pk column is LONG
        row = spark.range(1).select(
            F.pmod(F.hash(F.lit(key).cast("long")), F.lit(8)).alias("b")
        ).collect()[0]
        return str(row["b"])

    assert commit["manifest"][bucket_of(id_x)] != commit["manifest"][bucket_of(id_y)]


def test_partial_remerge_rewrites_only_conflicted_slice(spark, tmp_path):
    """Quantitative partial-re-merge probe: a 400-key batch over 8 buckets
    that conflicts on ONE bucket must rewrite ~1/8 of the batch on retry —
    the retry directory holds only the conflicted bucket's rows, the first
    write keeps serving the other seven."""
    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=8)
    seed(spark, a, n=2)
    conflict_key = _distinct_bucket_ids(spark, 8, 1)[0]

    def b_commits(table):
        a._pre_claim_hook = None
        b.upsert("t", ev_rows(spark, [(None, Row(id=conflict_key, v=1), 1, 0)]))

    a._pre_claim_hook = b_commits
    batch = [(None, Row(id=10_000 + i, v=i), 2, 0) for i in range(400)]
    batch.append((Row(id=conflict_key, v=1), Row(id=conflict_key, v=2), 3, 0))
    a.upsert("t", ev_rows(spark, batch))
    commit = a._read_commit("t", 2)
    by_dir: dict[str, int] = {}
    for bk, d in commit["manifest"].items():
        by_dir[d] = by_dir.get(d, 0) + 1
    # three dirs referenced: seed remainder, A's first write, A's retry
    dirs = sorted(by_dir, key=by_dir.get)
    retry_rows = spark.read.parquet(dirs[0]).count()
    first_rows = spark.read.parquet(dirs[1]).count() if len(dirs) > 2 else None
    # the retry dir serves few buckets and holds a ~1/8 slice, not the batch
    assert by_dir[dirs[0]] <= 2
    assert retry_rows < 150, f"retry rewrote too much: {retry_rows} rows"
    total = sum(spark.read.parquet(d).count() for d in set(by_dir))
    assert total >= 400  # nothing lost
    got = contents(a)
    assert (conflict_key, 2) in got and (10_399, 399) in got


def test_same_bucket_disjoint_keys_splice_without_remerge(spark, tmp_path, monkeypatch):
    """VERDICT r9 #3: two writers touching DISJOINT keys in the SAME bucket
    must both commit WITHOUT a re-merge — the per-commit key Blooms prove
    disjointness and the conflicted bucket is reconciled by the key
    splice (anti-join + semi-join), never by a second apply_cdc. The
    apply_cdc call count is the proof: one merge for A, one for B,
    nothing else."""
    import etl_consumer_spark.sinks.log_commit as lc

    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=1)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=1)
    base = seed(spark, a)

    calls = {"n": 0}
    real = lc.apply_cdc

    def counting(*args, **kw):
        calls["n"] += 1
        return real(*args, **kw)

    monkeypatch.setattr(lc, "apply_cdc", counting)

    def b_commits(table):
        a._pre_claim_hook = None
        b.upsert("t", ev_rows(spark, [(None, Row(id=901, v=2), 1, 0)]))

    a._pre_claim_hook = b_commits
    # A: update key 2 + delete key 3 + insert 902 — all keys disjoint from
    # B's 901, all in the single bucket
    v = a.upsert(
        "t",
        ev_rows(
            spark,
            [
                (Row(id=2, v=20), Row(id=2, v=21), 2, 0),
                (Row(id=3, v=30), None, 3, 0),
                (None, Row(id=902, v=5), 4, 0),
            ],
        ),
    )
    assert v == 2
    # exactly two merges ever ran: A's original and B's — the conflict was
    # resolved by splice, not re-merge
    assert calls["n"] == 2, f"expected 2 apply_cdc calls, saw {calls['n']}"
    expect = {t for t in base if t[0] not in (2, 3)} | {(2, 21), (901, 2), (902, 5)}
    assert contents(a) == expect
    # the commit carries the Bloom future writers will test against
    assert "key_blooms" in a._read_commit("t", 2)
    assert a._read_commit("t", 2)["key_blooms"].keys() == {"0"}


def test_same_bucket_disjoint_keys_differential_vs_remerge(spark, tmp_path, monkeypatch):
    """Differential check (VERDICT r9 #3 'done' criterion): the splice path
    and the legacy re-merge path (row_level_splice=False) produce the
    IDENTICAL final state for the same interleaving — and the legacy path
    really does one extra apply_cdc."""
    import etl_consumer_spark.sinks.log_commit as lc

    results = {}
    for splice_on in (True, False):
        root = str(tmp_path / f"splice_{splice_on}")
        a = LogCommitStateStore(spark, root, n_buckets=1, row_level_splice=splice_on)
        b = LogCommitStateStore(spark, root, n_buckets=1, row_level_splice=splice_on)
        seed(spark, a)

        calls = {"n": 0}
        real = lc.apply_cdc

        def counting(*args, **kw):
            calls["n"] += 1
            return real(*args, **kw)

        monkeypatch.setattr(lc, "apply_cdc", counting)

        def b_commits(table, b=b):
            a._pre_claim_hook = None
            b.upsert("t", ev_rows(spark, [(None, Row(id=901, v=2), 1, 0)]))

        a._pre_claim_hook = b_commits
        a.upsert(
            "t",
            ev_rows(
                spark,
                [
                    (Row(id=2, v=20), Row(id=2, v=21), 2, 0),
                    (None, Row(id=902, v=5), 4, 0),
                ],
            ),
        )
        results[splice_on] = (contents(a), calls["n"])
        monkeypatch.undo()

    assert results[True][0] == results[False][0], "splice changed the state"
    assert results[True][1] == 2   # merge(A) + merge(B)
    assert results[False][1] == 3  # + the re-merge the splice avoids


def test_same_bucket_same_key_still_remerges_with_blooms(spark, tmp_path, monkeypatch):
    """Bloom soundness guard: writers sharing a KEY must take the re-merge
    path (their Blooms intersect), and the outcome equals serial
    B-then-A — the splice can only ever replace a re-merge when no key is
    shared."""
    import etl_consumer_spark.sinks.log_commit as lc

    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=1)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=1)
    base = seed(spark, a)

    calls = {"n": 0}
    real = lc.apply_cdc

    def counting(*args, **kw):
        calls["n"] += 1
        return real(*args, **kw)

    monkeypatch.setattr(lc, "apply_cdc", counting)

    def b_commits(table):
        a._pre_claim_hook = None
        b.upsert("t", ev_rows(spark, [(None, Row(id=700, v=1), 1, 0)]))

    a._pre_claim_hook = b_commits
    a.upsert("t", ev_rows(spark, [(Row(id=700, v=1), Row(id=700, v=9), 2, 0)]))
    assert calls["n"] == 3  # merge(A) + merge(B) + A's re-merge
    assert contents(a) == base | {(700, 9)}


def test_threaded_same_bucket_disjoint_writers_all_commit(spark, tmp_path):
    """Real-race stress for the splice: four writers, ONE bucket, disjoint
    key ranges — every writer commits, the final state is the union, and
    the log is gap-free."""
    import threading

    stores = [LogCommitStateStore(spark, str(tmp_path), n_buckets=1) for _ in range(4)]
    base = seed(spark, stores[0])
    errs = []

    def work(i):
        try:
            rows = [(None, Row(id=1000 * (i + 1) + j, v=j), j + 1, 0) for j in range(5)]
            stores[i].upsert("t", ev_rows(spark, rows))
        except Exception as e:  # pragma: no cover - surfaced by assert below
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs
    expect = set(base)
    for i in range(4):
        expect |= {(1000 * (i + 1) + j, j) for j in range(5)}
    assert contents(stores[0]) == expect
    versions = stores[0]._log_versions("t")
    assert versions == list(range(5))  # init + four commits, gap-free


def test_protocol_versioning_forward_compat(spark, tmp_path):
    """Delta-style protocol floor: a table upgraded past this code's
    writer version refuses writes (and past the reader version, reads)
    LOUDLY instead of corrupting invariants newer code added; tables at
    or below the floor behave normally, DML commits carry the floor
    forward, and upgrade never lowers it."""
    import pytest as _pytest

    from etl_consumer_spark.sinks.log_commit import ProtocolVersionError

    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=4)
    base = seed(spark, store)

    # a format-2 Bloom-carrying upsert stamps the splice writer floor
    # (ADVICE r11: fences pre-format-gate writer-2 binaries that would
    # trust a cross-family Bloom AND) — still writable by this code
    store.upsert("t", ev_rows(spark, [(None, Row(id=100, v=1), 1, 0)]))
    assert store._protocol("t") == (1, LogCommitStateStore._SPLICE_MIN_WRITER)

    # upgrade never lowers the floor: a request BELOW the stamped floor
    # is a no-op max, and the floor rides on later DML commits
    v = store.upgrade_protocol("t", min_reader=1, min_writer=2)
    assert store._protocol("t") == (1, 3)
    store.upsert("t", ev_rows(spark, [(None, Row(id=101, v=2), 2, 0)]))
    assert store._protocol("t") == (1, 3)  # carried forward by the upsert
    assert contents(store) == base | {(100, 1), (101, 2)}

    # a concurrent-era table demanding a FUTURE writer: writes refused,
    # reads still fine (reader floor unchanged)
    store.upgrade_protocol("t", min_reader=1, min_writer=99)
    with _pytest.raises(ProtocolVersionError):
        store.upsert("t", ev_rows(spark, [(None, Row(id=102, v=3), 3, 0)]))
    with _pytest.raises(ProtocolVersionError):
        store.evolve("t", "ALTER TABLE t ADD COLUMN extra INT")
    assert contents(store) == base | {(100, 1), (101, 2)}  # readable, untouched

    # future READER floor: even reads refuse
    # (write the commit by hand — upgrade_protocol itself would refuse
    # to WRITE to a min_writer-99 table, which is exactly the contract)
    latest = store.current_version("t")
    commit = store._read_commit("t", latest)
    commit = dict(commit, version=latest + 1, protocol={"min_reader": 99, "min_writer": 99})
    assert store._claim("t", latest + 1, commit)
    with _pytest.raises(ProtocolVersionError):
        store.read("t")


def test_concurrent_upgrade_not_erased_by_dml_carry(spark, tmp_path):
    """Review r10 finding #1: a protocol upgrade committed while a DML
    writer is in flight (touched=[] -> never a conflict) must NOT be
    erased by the DML commit's floor carry — the claim-time re-read takes
    the max of the captured and latest floors.

    Splicing is disabled so the commit carries no Blooms and therefore no
    _SPLICE_MIN_WRITER stamp: with the stamp the floor would read (1, 3)
    whether or not the carry worked, and min_writer=2 would no longer be
    a sensitive probe for erasure."""
    from etl_consumer_spark.sinks.log_commit import ProtocolVersionError

    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=4, row_level_splice=False)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=4, row_level_splice=False)
    seed(spark, a)

    def b_upgrades(table):
        a._pre_claim_hook = None
        b.upgrade_protocol("t", min_reader=1, min_writer=2)

    a._pre_claim_hook = b_upgrades
    a.upsert("t", ev_rows(spark, [(None, Row(id=900, v=1), 1, 0)]))
    # A's commit is the latest; it must carry B's raised floor forward
    assert a._protocol("t") == (1, 2), "DML carry erased the concurrent upgrade"

    # and the same guarantee through read_keys' new reader-floor check
    b.upgrade_protocol("t", min_reader=99, min_writer=99)
    import pytest as _pytest

    with _pytest.raises(ProtocolVersionError):
        a.read_keys("t", [1])


def test_inflight_upgrade_above_writer_version_aborts_dml(spark, tmp_path):
    """ADVICE r10 #1: a concurrent upgrade_protocol that raises the floor
    ABOVE this code's WRITER_VERSION while a DML write is in flight must
    abort that write (Delta fails transactions on a concurrent protocol
    commit) — NOT be max-carried into a commit the writer is no longer
    allowed to make. The old behavior committed version 3 here."""
    from etl_consumer_spark.sinks.log_commit import ProtocolVersionError

    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=4)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=4)
    base = seed(spark, a)

    def b_upgrades_past_us(table):
        a._pre_claim_hook = None
        b.upgrade_protocol("t", min_reader=1, min_writer=99)

    a._pre_claim_hook = b_upgrades_past_us
    with pytest.raises(ProtocolVersionError):
        a.upsert("t", ev_rows(spark, [(None, Row(id=900, v=1), 1, 0)]))
    # the aborted write left no trace: the floor is B's upgrade, the state
    # is untouched, and A's staged data directory was cleaned up
    assert a._protocol("t") == (1, 99)
    # reading still works (reader floor stayed at 1)
    assert contents(a) == base
    data_root = a._data_root("t")
    committed = {d for v in a._log_versions("t") for d in a._read_commit("t", v)["manifest"].values()}
    on_disk = {f"{data_root}/{d}" for d in os.listdir(data_root)}
    assert on_disk <= committed, "aborted upsert leaked an uncommitted data dir"


def test_bloom_format_mismatch_disables_splice(spark, tmp_path, monkeypatch):
    """The key-splice shortcut is only sound when both Blooms come from the
    SAME hash family: a winner commit carrying a different bloom_format
    (older code) must force the re-merge path even if the stale-format
    bitsets happen to AND to zero. Proof by apply_cdc call count: 3 calls
    (A's original, B's, and A's re-merge) instead of the splice path's 2."""
    import etl_consumer_spark.sinks.log_commit as lc

    a = LogCommitStateStore(spark, str(tmp_path), n_buckets=1)
    b = LogCommitStateStore(spark, str(tmp_path), n_buckets=1)
    b._BLOOM_FORMAT = 1  # instance shadow: B stamps its commits as format 1
    base = seed(spark, a)

    calls = {"n": 0}
    real = lc.apply_cdc

    def counting(*args, **kw):
        calls["n"] += 1
        return real(*args, **kw)

    monkeypatch.setattr(lc, "apply_cdc", counting)

    def b_commits(table):
        a._pre_claim_hook = None
        b.upsert("t", ev_rows(spark, [(None, Row(id=901, v=2), 1, 0)]))

    a._pre_claim_hook = b_commits
    a.upsert("t", ev_rows(spark, [(None, Row(id=902, v=5), 1, 0)]))
    assert calls["n"] == 3, (
        f"expected re-merge (3 apply_cdc calls) on bloom-format mismatch, saw {calls['n']}"
    )
    assert contents(a) == base | {(901, 2), (902, 5)}


def test_format2_bloom_commit_fences_pre_gate_writers(spark, tmp_path):
    """ADVICE r11: the bloom_format gate is one-sided — a pre-gate
    writer-2 binary never CHECKS bloom_format, so its format-1 Blooms
    ANDed against a format-2 commit's can falsely prove key-disjointness
    and splice away concurrent updates. The commit-side fence: any commit
    carrying format-2 Blooms stamps min_writer=_SPLICE_MIN_WRITER, so the
    old binary's own _check_protocol refuses the write BEFORE it can
    compare Blooms. Reads stay allowed (reader floor untouched)."""
    from etl_consumer_spark.sinks.log_commit import ProtocolVersionError

    new = LogCommitStateStore(spark, str(tmp_path), n_buckets=2)
    base = seed(spark, new)
    new.upsert("t", ev_rows(spark, [(None, Row(id=300, v=1), 1, 0)]))
    assert new._protocol("t")[1] == LogCommitStateStore._SPLICE_MIN_WRITER

    old = LogCommitStateStore(spark, str(tmp_path), n_buckets=2)
    old.WRITER_VERSION = 2  # instance shadow: a pre-format-gate binary
    old._BLOOM_FORMAT = 1
    with pytest.raises(ProtocolVersionError):
        old.upsert("t", ev_rows(spark, [(None, Row(id=301, v=2), 2, 0)]))
    # fenced before any data moved; the new-format table is intact and
    # still readable by the old binary (reader floor is 1)
    assert contents(old) == base | {(300, 1)}


def test_upgrade_protocol_claim_races_are_bounded(spark, tmp_path, monkeypatch):
    """ADVICE r10 #3: upgrade_protocol must not spin forever under
    sustained DML contention — it bounds lost claim races exactly like
    upsert and raises CommitConflictError."""
    store = LogCommitStateStore(spark, str(tmp_path), n_buckets=2, max_retries=1)
    seed(spark, store)
    monkeypatch.setattr(LogCommitStateStore, "_claim", lambda self, *a, **kw: False)
    import random as _random

    monkeypatch.setattr(_random, "uniform", lambda a, b: 0.0)  # no backoff sleep in CI
    with pytest.raises(CommitConflictError):
        store.upgrade_protocol("t", min_reader=1, min_writer=2)
