"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
at sf0.01, then compares row count, column names, and an order-insensitive
value hash (columns sorted by name, rows sorted by stringified values).

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import json
import sys
import time

import duckdb
import pandas as pd


def registry_fingerprint(ordered_names: list[str]) -> str:
    """Fingerprint of the full queries() iteration order (encodes both the
    driver-window ordering and registry membership)."""
    return hashlib.sha256(json.dumps(ordered_names).encode()).hexdigest()

sys.path.insert(0, "/root/repo")

SF_DIR = __import__("os").environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = pd.to_datetime(col).dt.strftime("%Y-%m-%d %H:%M:%S.%f")
        elif pd.api.types.is_float_dtype(col):
            df[c] = col.round(9)
        elif col.dtype == object:
            df[c] = col.map(lambda v: str(v) if v is not None else None)
    rows = sorted(df.astype(str).values.tolist())
    return rows


def main():
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    only = {a for a in args if not a.startswith("--")}
    import __spark_entry__ as e

    if vanilla:
        # mimic the driver: a plain session with none of the engine's configs
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName("vanilla_check").getOrCreate()
    else:
        from etl_consumer_spark.session import get_spark

        spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    if "--baselines" in args:
        # the unregistered correctness baselines (quadratic twins kept only
        # to cross-check the capped production paths)
        from etl_consumer_spark.plans.queries import BASELINES

        qs = {n: d.fn for n, d in BASELINES.items()}
        oracles = {n: d.oracle for n, d in BASELINES.items() if d.oracle}
    else:
        qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {exc}")
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {exc}")
            continue
        status = []
        if len(sdf) != len(odf):
            status.append(f"rowcount {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            status.append(f"columns {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        else:
            a, b = normalize(sdf), normalize(odf)
            if a != b:
                n_bad = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
                status.append(f"values differ ({n_bad} rows)")
                for x, y in list(zip(a, b))[:3000]:
                    if x != y:
                        status.append(f"  spark={x} oracle={y}")
                        break
        if status:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(status[:3])} [{time.time()-t0:.1f}s]")
        else:
            print(f"OK    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    # A green FULL-registry run (no name filter) refreshes REPLICA_STAMP.json.
    # tests/test_driver_window.py compares the stamp's fingerprint against the
    # current queries() ordering, so the driver-window order cannot change
    # without a fresh green full replica — the rotation hedge, mechanized.
    if not only and not failures and "--baselines" not in args:
        fingerprint = registry_fingerprint(list(qs))
        with open("/root/repo/REPLICA_STAMP.json", "w") as f:
            json.dump(
                {
                    "fingerprint": fingerprint,
                    "n_queries": len(qs),
                    "failures": 0,
                    "session": "vanilla" if vanilla else "engine",
                    "sf_dir": SF_DIR,
                    "ran_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                },
                f,
                indent=1,
            )
        print(f"REPLICA_STAMP.json refreshed (fingerprint {fingerprint[:12]})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
