"""K1 (multi-writer variant) — log-arbitrated state store with optimistic
concurrency: the dependency-free core of what Delta Lake's transaction log
does for MERGE, closing the single-writer gap documented in COVERAGE.md
§K1 for deployments where two pipelines must commit to one table.

Protocol (Delta-style OCC on a shared POSIX filesystem):

1. **Snapshot read** — the table's current version V is the highest
   ``_log/{v:08d}.json`` commit file; each commit carries the FULL bucket
   manifest (bucket id → immutable data directory), so a snapshot is one
   file read, and any historical version remains readable (time travel).
2. **Write data files first** — the merged slice for the batch's touched
   buckets is written to a fresh UUID-named directory under ``data/``.
   Data directories are immutable and never renamed; until a commit
   references them they are invisible garbage (crash before commit = no
   state change, cleaned by :meth:`vacuum`).
3. **Atomic claim** — the writer composes the next manifest and claims
   version V+1 by ``os.link``-ing a fully-written temp file to
   ``_log/{V+1:08d}.json``. Hard-link creation is atomic and fails with
   EEXIST if another writer got there first — the commit point, exactly
   one winner per version.
4. **Conflict resolution on EEXIST** — read the winning commit(s):
   * winners' touched buckets DISJOINT from ours → **rebase**: our merged
     data is still valid (state in our buckets is unchanged); re-compose
     the manifest on top of the new snapshot and claim the next version.
     No data rewrite.
   * OVERLAP → **partial re-merge**: only the overlapping buckets read
     stale state; they are re-merged against the new snapshot (event
     slice bucket-filtered, cost O(conflicted slice) not O(batch)) while
     disjoint buckets keep their written files — per-bucket validity
     versions keep the conflict scan sound across rounds. A winning
     EVOLVE (pk/schema/bucketing change) forces a full restart. Bounded
     attempts, then raise.

   * OVERLAP with PROVABLY DISJOINT keys (round 10) → **key splice**:
     every commit carries a per-bucket Bloom filter of the keys its
     events touched; when every winner's Bloom for an overlapping bucket
     has an empty intersection with ours (Blooms have no false
     negatives, so an empty AND proves no shared key), the bucket is
     reconciled WITHOUT re-running the merge: new bucket content =
     winner's bucket rows minus our keys, plus our merged rows for our
     keys (per-key CDC apply is local to the key, so this equals
     apply_cdc(winner_state, our_events) exactly). No event re-read, no
     apply_cdc re-run — two writers upserting disjoint keys into the
     SAME bucket both commit with one merge each. Bloom collisions (or
     winners from older code without Blooms) fall back to the partial
     re-merge, which is always safe.

Equivalence: any successful interleaving is identical to SOME serial
order of the same batches — the linearizability contract a real Delta
MERGE provides. Protocol versioning (round 10, Delta PROTOCOL-action
style): every commit carries ``min_reader`` / ``min_writer``; a store
opened by older code refuses to read past a table whose committed
min_reader exceeds what it understands, and refuses to WRITE when
min_writer does (rather than corrupting invariants it doesn't know
about — exactly Delta's forward-compatibility contract).
``upgrade_protocol`` raises the floor as a normal arbitrated commit.
What this deliberately does NOT replicate: Delta's log
checkpoints-as-consolidation (conflict granularity is KEY level via
the Bloom splice, finer than Delta's file level, at the cost of a
bounded per-commit Bloom).

Reference anchor: the reference consumer relies on MySQL transactions for
this arbitration (main.go:135 — one db.Exec per event inside the target's
own locking); this store supplies the equivalent guarantee for the
parquet backend.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_consumer_spark.operators.apply import apply_cdc


class CommitConflictError(RuntimeError):
    """Raised when a writer exhausts its optimistic-concurrency retries."""


class ProtocolVersionError(RuntimeError):
    """Raised when a table's committed protocol floor exceeds what this
    code understands — refusing is the forward-compatibility contract
    (an old writer must not corrupt invariants newer code added)."""


class LogCommitStateStore:
    """Hash-bucketed state table whose commits are arbitrated by a numbered
    log — safe for MULTIPLE concurrent writers (optimistic concurrency),
    unlike the staged-manifest :class:`PartitionedParquetStateStore` whose
    staging directory is single-writer per table."""

    # test seam: called after the batch's data directory is fully written,
    # before the first claim attempt — the window concurrent-writer tests
    # interleave into (precedent: PartitionedParquetStateStore's hooks)
    _pre_claim_hook = None

    # protocol understood by THIS code: reader 1 = manifest/time-travel
    # layout; writer 2 = key-Bloom splice commits (writer-1 tables are
    # writable by this code — Blooms are additive); writer 3 =
    # bloom_format-GATED splice (disjointness trusted only within one
    # hash family). A table whose committed floor exceeds these raises
    # ProtocolVersionError.
    READER_VERSION = 1
    WRITER_VERSION = 3

    # per-bucket key-Bloom sizing: 1024 bits (16 long words) x 4 probes.
    # At ~100 event keys per bucket the pairwise false-intersection rate
    # is ~1% (falls back to re-merge, never wrong); the commit grows by a
    # bounded 16 words x touched buckets, independent of batch size.
    _BLOOM_WORDS = 16
    _BLOOM_K = 4
    # Bloom hash-family version, carried on every splice-capable commit.
    # Disjointness across two Blooms is only provable when BOTH were built
    # by the same hash family; a winner whose commit carries a different
    # (or missing) format falls back to the re-merge path. Format 2 salts
    # h2 with a distinct xxhash64 seed column so it is independent of the
    # bucket-assignment hash (ADVICE r10: format 1's h2 used the same
    # F.hash as bucketing, collapsing to m/n_buckets distinct values
    # within a bucket).
    _BLOOM_FORMAT = 2
    # Floor stamped on every commit that CARRIES format-2 Blooms. The
    # format gate above is one-sided on its own: writer-2 binaries
    # (pre-gate) never check bloom_format, so their format-1 Blooms
    # ANDed against a format-2 commit's can falsely prove disjointness
    # and splice away concurrent updates (ADVICE r11). Raising
    # min_writer to 3 on format-2 commits fences those binaries through
    # the existing _check_protocol / in-flight-upgrade guards instead.
    # Residual one-time migration race (ADVICE r12): a writer-2 binary
    # from the narrow pre-r10 era — Bloom splice but no claim-time
    # in-flight floor abort — that is ALREADY mid-commit when the first
    # format-2 commit lands can still complete one cross-family splice
    # before the fence takes effect (it re-reads the floor only at
    # entry). Operationally: quiesce writers once before first running a
    # writer-3 binary against a shared table; every later interleaving
    # is covered by the entry check + claim-time abort.
    _SPLICE_MIN_WRITER = 3

    def __init__(
        self,
        spark: SparkSession,
        base_path: str,
        n_buckets: int = 64,
        max_retries: int = 5,
        checkpoint_interval: int = 20,
        row_level_splice: bool = True,
    ):
        self.spark = spark
        self.base = base_path.rstrip("/")
        self.n_buckets = n_buckets
        self.max_retries = max_retries
        # a checkpoint marker is dropped every N commits by whichever
        # writer lands version N*k; truncate_log() may then drop commit
        # files below the newest marker (see checkpoint()/truncate_log())
        self.checkpoint_interval = checkpoint_interval
        # VERDICT r9 #3: key-level conflict resolution via per-commit key
        # Blooms. Off => every bucket overlap re-merges (the pre-round-10
        # behavior; kept as a flag so the differential test can compare)
        self.row_level_splice = row_level_splice

    # -- paths ---------------------------------------------------------------

    def _path(self, table: str) -> str:
        return f"{self.base}/{table}"

    def _log_dir(self, table: str) -> str:
        return f"{self._path(table)}/_log"

    def _data_root(self, table: str) -> str:
        return f"{self._path(table)}/data"

    def _commit_path(self, table: str, version: int) -> str:
        return f"{self._log_dir(table)}/{version:08d}.json"

    # -- log primitives -------------------------------------------------------

    def current_version(self, table: str) -> int | None:
        try:
            names = [
                n for n in os.listdir(self._log_dir(table)) if n.endswith(".json")
            ]
        except FileNotFoundError:
            return None
        return max((int(n[:-5]) for n in names), default=None)

    def _read_commit(self, table: str, version: int) -> dict:
        with open(self._commit_path(table, version)) as fh:
            return json.loads(fh.read())

    def _snapshot(self, table: str) -> tuple[int, dict]:
        v = self.current_version(table)
        if v is None:
            raise FileNotFoundError(f"table {table!r} has no commits")
        return v, self._read_commit(table, v)

    def _claim(self, table: str, version: int, commit: dict) -> bool:
        """Atomically claim ``version``: hard-link a fully-written temp file
        to the commit path. Exactly one writer can win a given version."""
        tmp = f"{self._log_dir(table)}/.tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            fh.write(json.dumps(commit))
        try:
            os.link(tmp, self._commit_path(table, version))
            return True
        except FileExistsError:
            return False
        finally:
            os.remove(tmp)

    # -- table lifecycle -------------------------------------------------------

    def _bucket(self, pk_cols: list[str], n_buckets: int):
        """Bucket expression for a GIVEN bucket count — callers must pass
        the table's COMMITTED count (meta['n_buckets']), never the
        constructor hint: a store instance opened with a different
        n_buckets would otherwise write data under bucket ids the
        manifest keys (computed from the committed count) never match,
        silently losing the batch."""
        return F.pmod(F.hash(*[F.col(c) for c in pk_cols]), F.lit(n_buckets))

    def init(self, table: str, df: DataFrame, pk_cols: list[str]) -> None:
        # explicit, not just the version-0 claim: after truncate_log the
        # 00000000.json file may be gone while the table very much exists —
        # a re-init would otherwise claim version 0 under a live table
        if self.exists(table):
            raise CommitConflictError(f"table {table!r} already initialized")
        os.makedirs(self._log_dir(table), exist_ok=True)
        data_dir = f"{self._data_root(table)}/{uuid.uuid4().hex}"
        (
            df.withColumn("_bucket", self._bucket(pk_cols, self.n_buckets))
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(data_dir)
        )
        manifest = {
            d.split("=", 1)[1]: data_dir
            for d in os.listdir(data_dir)
            if d.startswith("_bucket=")
        }
        commit = {
            "version": 0,
            "manifest": manifest,
            "touched": sorted(manifest),
            "pk": pk_cols,
            "n_buckets": self.n_buckets,
            "schema": df.schema.json(),
            "writer": "init",
        }
        if not self._claim(table, 0, commit):
            raise CommitConflictError(f"table {table!r} already initialized")

    def _protocol(self, table: str) -> tuple[int, int]:
        """The table's committed (min_reader, min_writer) floor — carried
        on the latest commit like pk/schema; absent on pre-protocol
        tables, which default to (1, 1)."""
        _, commit = self._snapshot(table)
        proto = commit.get("protocol", {})
        return int(proto.get("min_reader", 1)), int(proto.get("min_writer", 1))

    def _check_protocol(self, table: str, write: bool) -> None:
        min_r, min_w = self._protocol(table)
        if min_r > self.READER_VERSION:
            raise ProtocolVersionError(
                f"table {table!r} requires reader version {min_r}; this code "
                f"understands {self.READER_VERSION} — upgrade before reading"
            )
        if write and min_w > self.WRITER_VERSION:
            raise ProtocolVersionError(
                f"table {table!r} requires writer version {min_w}; this code "
                f"understands {self.WRITER_VERSION} — refusing to write"
            )

    def upgrade_protocol(self, table: str, min_reader: int, min_writer: int) -> int:
        """Raise the table's protocol floor as a normal arbitrated commit
        (Delta's PROTOCOL action): touches no buckets, so concurrent DML
        rebases past it, but every LATER open sees the new floor. The
        floor never lowers (max with the committed one)."""
        import random
        import time

        self._check_protocol(table, write=True)
        # bounded like upsert's claim loop (ADVICE r10 #3): under sustained
        # DML contention an unbounded spin could starve; each lost race
        # backs off with the same jitter so herds de-synchronize
        failures = 0
        max_claim_failures = max(self.max_retries * 8, 16)
        while True:
            v, commit = self._snapshot(table)
            meta = self._meta(table)
            cur_r, cur_w = self._protocol(table)
            next_commit = {
                "version": v + 1,
                "manifest": dict(commit["manifest"]),
                "touched": [],
                "pk": list(meta["pk"]),
                "n_buckets": meta["n_buckets"],
                "schema": meta["schema"],
                "writer": "protocol",
                "protocol": {
                    "min_reader": max(min_reader, cur_r),
                    "min_writer": max(min_writer, cur_w),
                },
            }
            if self._claim(table, v + 1, next_commit):
                return v + 1
            failures += 1
            if failures > max_claim_failures:
                raise CommitConflictError(
                    f"gave up after {failures} lost protocol-claim races on "
                    f"{table!r} (DML writers outpacing the upgrade)"
                )
            time.sleep(random.uniform(0, 0.02) * min(failures, 10))

    def _meta(self, table: str) -> dict:
        """pk / bucket-count / schema ride on EVERY commit (copied forward
        by upsert, rewritten by evolve), so the latest commit answers in
        O(1); the backwards walk only runs for tables written by older
        code whose DML commits did not carry them."""
        v, commit = self._snapshot(table)
        while "pk" not in commit:
            v -= 1
            commit = self._read_commit(table, v)
        return commit

    def _scan_buckets(self, table: str, manifest: dict) -> DataFrame:
        """Union the data-directory scans for a bucket->dir manifest subset,
        each pruned to the buckets that directory still owns (partition
        filters on _bucket); empty manifest -> typed empty frame."""
        if not manifest:
            return self._empty(table)
        by_dir: dict[str, list[int]] = {}
        for b, d in manifest.items():
            by_dir.setdefault(d, []).append(int(b))
        parts = [
            self.spark.read.parquet(d).filter(F.col("_bucket").isin(bs))
            for d, bs in by_dir.items()
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.drop("_bucket")

    def _pk_cols(self, table: str) -> list[str]:
        return list(self._meta(table)["pk"])

    def exists(self, table: str) -> bool:
        # any commit file counts: version 0 may have been truncated away
        return self.current_version(table) is not None

    def _empty(self, table: str) -> DataFrame:
        schema = T.StructType.fromJson(json.loads(self._meta(table)["schema"]))
        return self.spark.createDataFrame([], schema)

    def read_keys(self, table: str, keys: list) -> DataFrame:
        """Point/batch lookup with manifest + partition pruning: only the
        data directories owning the requested keys' buckets are scanned,
        and each scan carries a _bucket partition filter — O(|keys|/
        n_buckets · state) I/O, the log-store twin of the partitioned
        store's indexed SELECT path."""
        self._check_protocol(table, write=False)
        meta = self._meta(table)
        pk = meta["pk"]
        if not keys:
            return self._empty(table)
        key_rows = [k if isinstance(k, tuple) else (k,) for k in keys]
        state = self._empty(table)
        key_df = self.spark.createDataFrame(
            key_rows, T.StructType([state.schema[c] for c in pk])
        )
        wanted = {
            str(r["_b"])
            for r in key_df.select(
                F.pmod(F.hash(*[F.col(c) for c in pk]), F.lit(meta["n_buckets"])).alias("_b")
            )
            .distinct()
            .collect()
        }
        _, commit = self._snapshot(table)
        manifest = {b: d for b, d in commit["manifest"].items() if b in wanted}
        return self._scan_buckets(table, manifest).join(
            F.broadcast(key_df), pk, "left_semi"
        )

    def read(self, table: str, version: int | None = None) -> DataFrame:
        """Current state (or the exact state at any historical ``version`` —
        commits are immutable, so time travel is a manifest lookup)."""
        self._check_protocol(table, write=False)
        if version is None:
            version, commit = self._snapshot(table)
        else:
            commit = self._read_commit(table, version)
        return self._scan_buckets(table, commit["manifest"])

    # -- key Blooms (row-level conflict detection, VERDICT r9 #3) ---------------

    def _key_blooms(self, events: DataFrame, key_cols, bucket_expr) -> dict[str, list[int]]:
        """Per-bucket Bloom filter over the batch's event KEYS, computed in
        one distributed aggregation: k probe positions per key via double
        hashing (xxhash64 + murmur), OR-folded into 64-bit words with
        ``bit_or``. The driver materializes at most
        n_buckets x _BLOOM_WORDS rows — bounded by table geometry, never by
        batch size (the bounded-collect discipline of the plan lint)."""
        m = self._BLOOM_WORDS * 64
        # pre-mod both hashes: xxhash64 spans the full int64 range, so a
        # raw h1 + i*h2 can overflow near Long.MIN/MAX and abort the whole
        # upsert under Spark's default ANSI mode (review r10 finding #4);
        # after pmod both terms are < m, far from any overflow
        # h2 is salted with a distinct literal AND mapped to [1, m-1]:
        # unsalted, h2 came from the same F.hash(*key_cols) that assigns
        # buckets, so within a bucket h2 was congruent to the bucket id
        # (mod n_buckets) — only m/n_buckets distinct values — and h2=0
        # collapsed all k probes onto one bit (ADVICE r10 #2). The +1
        # keeps the double-hash stride nonzero for every key.
        rows = events.select(
            bucket_expr.alias("_b"),
            F.pmod(F.xxhash64(*key_cols), F.lit(m)).alias("h1"),
            (F.pmod(F.xxhash64(F.lit("bloom-h2"), *key_cols), F.lit(m - 1)) + F.lit(1)).alias(
                "h2"
            ),
        )
        pos = rows.select(
            "_b",
            F.explode(
                F.array(
                    *[
                        F.pmod(F.col("h1") + F.lit(i) * F.col("h2"), F.lit(m))
                        for i in range(self._BLOOM_K)
                    ]
                )
            ).alias("p"),
        )
        words = (
            pos.groupBy("_b", (F.col("p") / 64).cast("int").alias("w"))
            .agg(F.expr("bit_or(shiftleft(1L, CAST(p % 64 AS INT)))").alias("mask"))
            .collect()
        )
        out: dict[str, list[int]] = {}
        for r in words:
            out.setdefault(str(r["_b"]), [0] * self._BLOOM_WORDS)
            out[str(r["_b"])][r["w"]] |= r["mask"]
        return out

    @staticmethod
    def _blooms_disjoint(a: list[int] | None, b: list[int] | None) -> bool:
        """True only when the two key sets are PROVABLY disjoint: Blooms
        have no false negatives, so an all-zero AND means no shared key.
        A missing Bloom (older-code commit) is never provably disjoint."""
        if a is None or b is None or len(a) != len(b):
            return False
        return all((x & y) == 0 for x, y in zip(a, b))

    def _splice_buckets(
        self,
        table: str,
        splice_bs: list[str],
        events: DataFrame,
        bucket_of_event,
        merge_pk: list[str],
        meta: dict,
        latest: int,
        dir_of: dict[str, str],
        valid_v: dict[str, int],
        owned_dirs: list[str],
    ) -> None:
        """Reconcile buckets whose winners are ALL key-disjoint from this
        batch, without re-running the merge: per key, apply_cdc depends
        only on that key's state and events, so when no key is shared,
        ``apply_cdc(winner_state, our_events)`` restricted to our keys
        equals our ALREADY-WRITTEN merge restricted to our keys — the new
        bucket content is simply the winner's rows for keys we did not
        touch plus our merged rows for keys we did (including our deletes,
        which appear as absences on both sides). One anti-join + one
        semi-join + a bucket-partitioned write; the events frame is only
        consulted for its key projection, never re-merged."""
        lmanifest = self._read_commit(table, latest)["manifest"]
        our_slice = self._scan_buckets(
            table, {b: dir_of[b] for b in splice_bs if b in dir_of}
        )
        win_slice = self._scan_buckets(
            table, {b: lmanifest[b] for b in splice_bs if b in lmanifest}
        )
        our_keys = (
            events.filter(bucket_of_event.isin([int(b) for b in splice_bs]))
            .select(
                *[
                    F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(k)
                    for k in merge_pk
                ]
            )
            .distinct()
        )
        # no broadcast hint: our_keys is O(batch-slice keys) — AQE
        # broadcasts it when small and shuffles when not
        spliced = win_slice.join(our_keys, merge_pk, "left_anti").unionByName(
            our_slice.join(our_keys, merge_pk, "left_semi")
        )
        splice_dir = f"{self._data_root(table)}/{uuid.uuid4().hex}"
        (
            spliced.withColumn("_bucket", self._bucket(merge_pk, meta["n_buckets"]))
            .repartition(max(len(splice_bs), 1), "_bucket")
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(splice_dir)
        )
        owned_dirs.append(splice_dir)
        surviving = {
            d.split("=", 1)[1]
            for d in os.listdir(splice_dir)
            if d.startswith("_bucket=")
        }
        for b in splice_bs:
            valid_v[b] = latest
            if b in surviving:
                dir_of[b] = splice_dir
            else:
                dir_of.pop(b, None)

    # -- the OCC upsert ---------------------------------------------------------

    def upsert(
        self,
        table: str,
        events: DataFrame,
        pk_cols: list[str] | None = None,
        missing_update: str = "upsert",
    ) -> int:
        """Apply one micro-batch under optimistic concurrency; returns the
        committed version. Safe to call from multiple writers on one table.
        ``pk_cols``, when given (the CDCPipeline call shape), must match the
        table's committed pk — the key decides bucketing, so a mismatch
        would silently mis-route rows."""
        import random
        import time

        self._check_protocol(table, write=True)
        attempt = 0
        # ADVICE r8: bound CLAIM races too, not just overlap re-merges — a
        # writer that repeatedly loses the version race to DISJOINT winners
        # must eventually raise instead of spinning forever (system-wide
        # progress holds either way; this protects the individual writer)
        claim_failures = 0
        max_claim_failures = max(self.max_retries * 8, 16)
        # PARTIAL re-merge state (round 9, the "finer conflict resolution"
        # delta vs a full restart): dir_of maps each touched bucket to the
        # newest data directory holding its merged rows; a conflict only
        # invalidates the OVERLAPPING buckets, so the next round re-merges
        # just those (`pending`) while disjoint buckets keep their already-
        # written files. valid_v records, per bucket, the snapshot version
        # its current merge incorporated — the conflict scan compares each
        # winner against the PER-BUCKET validity (after a partial round,
        # different buckets are valid as of different versions; a single
        # scan cursor would miss winners that landed between the original
        # scan and the partial round's snapshot for the buckets that were
        # NOT re-merged). owned_dirs tracks every directory this call
        # wrote, for cleanup on failure (uncommitted dirs are garbage).
        dir_of: dict[str, str] = {}
        valid_v: dict[str, int] = {}
        owned_dirs: list[str] = []
        pending: list[str] | None = None  # None => merge every touched bucket
        touched: list[str] = []

        def _cleanup() -> None:
            for d in owned_dirs:
                shutil.rmtree(d, ignore_errors=True)

        while True:
            # meta is re-read EVERY attempt: a concurrent evolve() commits
            # a new pk/schema as a full-barrier conflict, and the re-merge
            # must run against the evolved definition, not the stale one
            meta = self._meta(table)
            # the captured floor is only a fallback: the commit composed in
            # the claim loop re-reads the LATEST floor (finding #1 below)
            mproto = meta.get("protocol", {})
            proto_floor = (
                int(mproto.get("min_reader", 1)),
                int(mproto.get("min_writer", 1)),
            )
            if pk_cols is not None and list(pk_cols) != list(meta["pk"]):
                _cleanup()
                raise ValueError(
                    f"pk_cols {list(pk_cols)} do not match committed pk "
                    f"{list(meta['pk'])} for table {table!r}"
                )
            merge_pk = meta["pk"]
            key_cols = [
                F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")) for k in merge_pk
            ]
            bucket_of_event = F.pmod(F.hash(*key_cols), F.lit(meta["n_buckets"]))
            if self.row_level_splice:
                # one aggregation yields both the touched-bucket set and the
                # per-bucket key Blooms the commit will carry
                blooms = self._key_blooms(events, key_cols, bucket_of_event)
                touched = sorted(blooms)
            else:
                blooms = {}
                touched = sorted(
                    str(r["_b"])
                    for r in events.select(bucket_of_event.alias("_b"))
                    .distinct()
                    .collect()
                )
            if not touched:
                return self.current_version(table)
            to_merge = touched if pending is None else pending
            base_v, commit = self._snapshot(table)
            manifest = dict(commit["manifest"])
            # merge against the SNAPSHOT's view of the buckets being
            # (re)computed this round; on a partial round the event slice
            # is bucket-filtered, so re-merge cost is O(conflicted slice),
            # not O(batch)
            round_events = events
            if to_merge is not touched:
                round_events = events.filter(
                    bucket_of_event.isin([int(b) for b in to_merge])
                )
            state_slice = self._scan_buckets(
                table, {b: manifest[b] for b in to_merge if b in manifest}
            )
            merged = apply_cdc(
                state_slice, round_events, merge_pk, missing_update=missing_update
            )
            data_dir = f"{self._data_root(table)}/{uuid.uuid4().hex}"
            (
                # bucket with the COMMITTED count — see _bucket's docstring
                merged.withColumn("_bucket", self._bucket(merge_pk, meta["n_buckets"]))
                .repartition(max(len(to_merge), 1), "_bucket")
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(data_dir)
            )
            owned_dirs.append(data_dir)
            surviving = {
                d.split("=", 1)[1]
                for d in os.listdir(data_dir)
                if d.startswith("_bucket=")
            }
            for b in to_merge:
                valid_v[b] = base_v
                if b in surviving:
                    dir_of[b] = data_dir
                else:
                    # every row of the bucket deleted: drop it from the
                    # manifest rather than pointing at a missing partition
                    dir_of.pop(b, None)
            if self._pre_claim_hook is not None:
                self._pre_claim_hook(table)

            # claim loop: rebase past disjoint winners without rewriting
            # data. A winner at version v conflicts with bucket b only when
            # it touches b AND v > valid_v[b] — a winner the partial round
            # already merged against is absorbed, not a conflict. Bucket
            # overlaps whose winners are ALL Bloom-proven key-disjoint are
            # resolved by the KEY SPLICE below instead of a re-merge.
            while True:
                latest = self.current_version(table)
                scan_from = min(valid_v[b] for b in touched)
                conflicted: set[str] = set()
                spliceable: set[str] = set()
                meta_changed = False
                for v in range(scan_from + 1, latest + 1):
                    winner = self._read_commit(table, v)
                    overlap = {
                        b
                        for b in set(winner["touched"]) & set(touched)
                        if v > valid_v[b]
                    }
                    if overlap:
                        if (
                            winner.get("pk", meta["pk"]) != meta["pk"]
                            or winner.get("n_buckets", meta["n_buckets"]) != meta["n_buckets"]
                            or winner.get("schema", meta["schema"]) != meta["schema"]
                        ):
                            meta_changed = True
                        # disjointness is only provable within one hash
                        # family: a winner written by a different Bloom
                        # format (or none) gets an empty map, so every
                        # overlap with it re-merges instead of splicing
                        wblooms = (
                            winner.get("key_blooms", {})
                            if winner.get("bloom_format") == self._BLOOM_FORMAT
                            else {}
                        )
                        for b in overlap:
                            if self.row_level_splice and self._blooms_disjoint(
                                blooms.get(b), wblooms.get(b)
                            ):
                                spliceable.add(b)
                            else:
                                conflicted.add(b)
                # a bucket with ANY non-disjoint winner must re-merge; the
                # splice only covers buckets where EVERY new winner is
                # provably key-disjoint
                spliceable -= conflicted
                if meta_changed:
                    # an evolve won: bucketing/pk/schema moved under us —
                    # nothing we wrote is trustworthy; full restart
                    _cleanup()
                    dir_of.clear()
                    valid_v.clear()
                    owned_dirs.clear()
                    pending = None
                    break
                if spliceable:
                    self._splice_buckets(
                        table,
                        sorted(spliceable),
                        events,
                        bucket_of_event,
                        merge_pk,
                        meta,
                        latest,
                        dir_of,
                        valid_v,
                        owned_dirs,
                    )
                    claim_failures += 1  # progress-bounded like claim races
                    if claim_failures > max_claim_failures:
                        _cleanup()
                        raise CommitConflictError(
                            f"gave up after {claim_failures} splice/claim "
                            f"rounds on {table!r} (writers outpacing this one)"
                        )
                    continue  # re-scan: new winners may have landed mid-splice
                if conflicted:
                    # PARTIAL re-merge: only the overlapping buckets are
                    # stale; disjoint buckets keep their written files
                    pending = sorted(conflicted)
                    break
                # disjoint winners: rebase our manifest onto the latest
                if latest > base_v:
                    latest_commit = self._read_commit(table, latest)
                    base = latest_commit["manifest"]
                    lproto = latest_commit.get("protocol", {})
                else:
                    base = manifest
                    lproto = commit.get("protocol", {})
                # floor = max(captured, latest): a protocol-only upgrade
                # (touched=[]) never conflicts, so without this re-read a
                # concurrent upgrade would be silently ERASED by our carry
                # (review r10 finding #1). A still-newer upgrade landing
                # after this read makes our claim fail -> loop re-reads,
                # so a successful claim always carries the current max.
                carry_floor = (
                    max(proto_floor[0], int(lproto.get("min_reader", 1))),
                    max(proto_floor[1], int(lproto.get("min_writer", 1))),
                )
                # a concurrent upgrade_protocol that raised the floor ABOVE
                # what this code understands must abort the in-flight write,
                # not be max-carried into a commit this writer is no longer
                # allowed to make (ADVICE r10 #1 — Delta likewise fails
                # transactions on a concurrent protocol commit)
                if carry_floor[1] > self.WRITER_VERSION or carry_floor[0] > self.READER_VERSION:
                    _cleanup()
                    raise ProtocolVersionError(
                        f"table {table!r} protocol floor rose to "
                        f"reader={carry_floor[0]}/writer={carry_floor[1]} while this "
                        f"write was in flight; this code understands "
                        f"reader={self.READER_VERSION}/writer={self.WRITER_VERSION} — "
                        "aborting instead of committing past the upgrade"
                    )
                new_manifest = {
                    b: d for b, d in base.items() if b not in set(touched)
                }
                new_manifest.update(dir_of)
                next_commit = {
                    "version": latest + 1,
                    "manifest": new_manifest,
                    "touched": touched,
                    # carry the table definition forward so _meta answers
                    # from the latest commit in O(1) at any table age
                    "pk": list(merge_pk),
                    "n_buckets": meta["n_buckets"],
                    "schema": meta["schema"],
                    "writer": uuid.uuid4().hex[:8],
                    # per-bucket key Blooms: later writers overlapping these
                    # buckets can prove key-disjointness and splice instead
                    # of re-merging (bounded: words x touched buckets)
                    "key_blooms": blooms,
                    "bloom_format": self._BLOOM_FORMAT,
                    # carry the protocol floor forward so _protocol answers
                    # from the latest commit (absent -> (1, 1)). A commit
                    # carrying format-2 Blooms raises the writer floor to
                    # _SPLICE_MIN_WRITER so pre-format-gate (writer-2)
                    # binaries are fenced out before they can AND a
                    # cross-family Bloom pair into a false splice.
                    "protocol": {
                        "min_reader": carry_floor[0],
                        "min_writer": (
                            max(carry_floor[1], self._SPLICE_MIN_WRITER)
                            if blooms and self._BLOOM_FORMAT >= 2
                            else carry_floor[1]
                        ),
                    },
                }
                if self._claim(table, latest + 1, next_commit):
                    self._maybe_checkpoint(table, latest + 1)
                    return latest + 1
                claim_failures += 1
                if claim_failures > max_claim_failures:
                    _cleanup()
                    raise CommitConflictError(
                        f"gave up after {claim_failures} lost claim races on "
                        f"{table!r} (disjoint writers outpacing this one)"
                    )
                # small randomized backoff before re-claiming: without it,
                # N writers that lose together retry in lockstep and keep
                # colliding (the thundering-herd shape of optimistic locks)
                time.sleep(random.uniform(0, 0.02) * min(claim_failures, 10))
                # lost the race: loop re-scans; the per-bucket valid_v check
                # keeps already-absorbed winners from re-flagging
            attempt += 1
            if attempt > self.max_retries:
                _cleanup()
                raise CommitConflictError(
                    f"gave up after {self.max_retries} re-merges on {table!r} "
                    f"(buckets {touched} contended)"
                )

    def evolve(self, table: str, statement: str) -> None:
        """Apply one translated DDL statement as a FULL-BARRIER commit: the
        evolved table is rewritten to a fresh data directory and committed
        with every bucket marked touched, so any concurrent DML writer's
        claim conflicts and re-merges against the evolved schema. The
        commit carries the new schema/pk, which _meta resolves from the
        latest carrier — commit 0 stays immutable. DDL is rare (the
        reference pauses the connector around it, main.go:70-121), so the
        full rewrite is acceptable; per-batch DML stays partial."""
        from etl_consumer_spark.sinks.state import evolve_frame, parse_rename_column

        self._check_protocol(table, write=True)
        while True:
            base_v, _ = self._snapshot(table)
            meta = self._meta(table)
            pk = list(meta["pk"])
            n_buckets = meta["n_buckets"]
            evolved = evolve_frame(self.read(table, version=base_v), statement)
            # pk-rename detection shares evolve_frame's identifier grammar
            # (ADVICE r8): any statement shape that renames a column in the
            # frame also renames it in the pk list, or the bucket expression
            # would bind a stale name and every later upsert would fail
            renamed = parse_rename_column(statement)
            if renamed and renamed[1] in pk:
                pk = [renamed[2] if c == renamed[1] else c for c in pk]
            data_dir = f"{self._data_root(table)}/{uuid.uuid4().hex}"
            (
                evolved.withColumn(
                    "_bucket", F.pmod(F.hash(*[F.col(c) for c in pk]), F.lit(n_buckets))
                )
                .write.mode("overwrite")
                .partitionBy("_bucket")
                .parquet(data_dir)
            )
            manifest = {
                d.split("=", 1)[1]: data_dir
                for d in os.listdir(data_dir)
                if d.startswith("_bucket=")
            }
            floor = self._protocol(table)
            # same in-flight-upgrade guard as upsert's claim loop (ADVICE
            # r10 #1): the floor re-read on retry may exceed what this code
            # understands — refuse to commit the evolve past it
            if floor[1] > self.WRITER_VERSION or floor[0] > self.READER_VERSION:
                shutil.rmtree(data_dir, ignore_errors=True)
                raise ProtocolVersionError(
                    f"table {table!r} protocol floor rose to "
                    f"reader={floor[0]}/writer={floor[1]} during evolve; this code "
                    f"understands reader={self.READER_VERSION}/"
                    f"writer={self.WRITER_VERSION} — aborting"
                )
            commit = {
                "version": base_v + 1,
                "manifest": manifest,
                "touched": [str(b) for b in range(n_buckets)],
                "pk": pk,
                "n_buckets": n_buckets,
                "schema": evolved.schema.json(),
                "writer": "evolve",
                "protocol": {"min_reader": floor[0], "min_writer": floor[1]},
            }
            if self._claim(table, base_v + 1, commit):
                self._maybe_checkpoint(table, base_v + 1)
                return
            shutil.rmtree(data_dir, ignore_errors=True)

    # -- log checkpointing / truncation ------------------------------------------

    def _checkpoint_marker(self, table: str, version: int) -> str:
        return f"{self._log_dir(table)}/{version:08d}.checkpoint"

    def _maybe_checkpoint(self, table: str, version: int) -> None:
        """Drop a checkpoint marker when ``version`` lands on the interval.
        Every commit already carries the FULL manifest + table meta, so the
        commit file at a marker version IS the checkpoint (unlike Delta,
        which must consolidate deltas); the marker just records that commits
        BELOW it are no longer needed to reconstruct any current state and
        may be truncated (truncate_log). Marker creation is idempotent and
        race-free: losing a create race means another writer already
        checkpointed the same version."""
        if self.checkpoint_interval and version % self.checkpoint_interval == 0:
            self.checkpoint(table, version)

    def checkpoint(self, table: str, version: int | None = None) -> int:
        """Mark ``version`` (default: current) as a log checkpoint; returns
        the checkpointed version."""
        if version is None:
            version = self.current_version(table)
            if version is None:
                raise FileNotFoundError(f"table {table!r} has no commits")
        # a marker for a version with no commit file would make the NEXT
        # truncate_log delete every real commit (all v < bogus marker) —
        # total state loss from a one-argument typo (review r9 finding #4)
        if not os.path.exists(self._commit_path(table, version)):
            raise ValueError(
                f"cannot checkpoint {table!r} at version {version}: no such commit"
            )
        try:
            with open(self._checkpoint_marker(table, version), "x") as fh:
                fh.write(json.dumps({"version": version}))
        except FileExistsError:
            pass  # another writer checkpointed this version — same outcome
        return version

    def latest_checkpoint(self, table: str) -> int | None:
        try:
            names = os.listdir(self._log_dir(table))
        except FileNotFoundError:
            return None
        cps = [int(n[:8]) for n in names if n.endswith(".checkpoint")]
        return max(cps, default=None)

    def truncate_log(self, table: str, retention_s: float = 3600.0) -> list[int]:
        """Delete commit files below the newest checkpoint — the log-size
        bound of VERDICT r8 #5. Snapshot reads were already O(1) (every
        commit carries the full manifest); truncation keeps ``_log/`` itself
        bounded for long-lived tables. Time travel below the checkpoint is
        lost — the same trade Delta's log retention makes.

        ``retention_s`` guards BOTH concurrent writers and vacuum's
        supersession arithmetic: a commit file younger than it is never
        deleted, so (a) an in-flight writer that snapshotted before the
        checkpoint still finds every commit in its conflict-detection range
        (those are all younger than the writer itself), and (b) any data
        directory superseded within the retention window keeps the commit
        file vacuum() uses to date the supersession."""
        import time

        cp = self.latest_checkpoint(table)
        if cp is None:
            return []
        now = time.time()
        removed = []
        for v in self._log_versions(table):
            if v >= cp:
                continue
            path = self._commit_path(table, v)
            if now - os.path.getmtime(path) < retention_s:
                continue
            os.remove(path)
            removed.append(v)
            # superseded checkpoint markers are dead weight (only the max
            # is ever consulted); leaving them would regrow _log/ one
            # marker per interval forever (review r9 finding #5)
            marker = self._checkpoint_marker(table, v)
            if os.path.exists(marker):
                os.remove(marker)
        return removed

    def _log_versions(self, table: str) -> list[int]:
        try:
            names = os.listdir(self._log_dir(table))
        except FileNotFoundError:
            return []
        return sorted(int(n[:-5]) for n in names if n.endswith(".json"))

    # -- maintenance -------------------------------------------------------------

    def vacuum(self, table: str, retention_s: float = 3600.0) -> list[str]:
        """Remove data directories no commit's CURRENT manifest references
        and orphans from crashed writers. Readers of historical versions
        lose time travel to vacuumed versions — same trade as Delta VACUUM.

        ``retention_s`` is measured from the moment a directory became
        removable, which differs by case (ADVICE r8: keying retention to
        directory mtime deleted long-lived dirs superseded SECONDS ago,
        breaking concurrent readers inside the nominal window — Delta keys
        retention to the tombstone time, not file creation):

        * a directory referenced by some retained commit but absent from
          the CURRENT manifest was superseded when the first later commit
          dropped it — age = now - mtime(that commit file);
        * a directory referenced by NO retained commit is a crashed (or
          still in-flight, unclaimed) writer's data — age = now - dir
          mtime, because an unreferenced young directory is
          indistinguishable from a LIVE writer's pre-claim write.

        Pass 0 only when no other writer or reader can be active."""
        import time

        _, commit = self._snapshot(table)
        live = set(commit["manifest"].values())
        # highest retained version referencing each directory; retained
        # versions are contiguous (truncate_log removes only an old prefix),
        # so the supersession commit is simply last_ref + 1
        last_ref: dict[str, int] = {}
        for v in self._log_versions(table):
            for d in set(self._read_commit(table, v)["manifest"].values()):
                last_ref[d] = max(last_ref.get(d, v), v)
        removed = []
        root = self._data_root(table)
        now = time.time()
        for d in os.listdir(root):
            full = f"{root}/{d}"
            if full in live:
                continue
            if full in last_ref:
                superseded_at = os.path.getmtime(
                    self._commit_path(table, last_ref[full] + 1)
                )
            else:
                superseded_at = os.path.getmtime(full)
            if now - superseded_at < retention_s:
                continue  # inside the reader/in-flight-writer window
            shutil.rmtree(full, ignore_errors=True)
            removed.append(full)
        return removed
