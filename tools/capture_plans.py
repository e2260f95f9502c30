"""Dump ``.explain("formatted")`` for named registry queries to files.

Usage: python tools/capture_plans.py <outdir> <suffix> <query> [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` for each name — the optimization
rounds' evidence trail (plans/r13/<query>_before.txt / _after.txt). Plan
capture only BUILDS the DataFrame; for batch queries nothing executes
beyond what the query fn itself runs at build time. Stream-harness
queries execute their pipeline inside fn() — capture those with their
dedicated probes instead (tools/stream_probe.py), not this tool.

Env: PLAN_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")

    from etl_consumer_spark.plans import QUERIES
    from etl_consumer_spark.session import get_spark

    spark = get_spark(
        app_name="capture_plans", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)", flush=True)


if __name__ == "__main__":
    main()
