"""Full-registry sf1.0 smoke sweep (VERDICT r9 #4; quiet-machine guard r13).

The sf0.1 -> sf1.0 scale point caught a real long-sum overflow in
``analytic_tukey_hsd`` that no sf0.01 oracle could (the value range, not
the logic, was the bug) — but only the 72-query frozen core plus the
round-9 additions had ever executed above sf0.1. This sweep runs EVERY
public registry query at sf1.0 (tools/gen_testdata.py data), records the
per-query wall time and the ratio against a same-session sf0.1 pass, and
flags (a) any error — the overflow/ANSI-edge class — and (b) any ratio
above the 12x threshold the scale methodology uses (data grows 10x, so a
sublinear plan stays well under it; the threshold tolerates fixed-cost
amortization noise on sub-second queries).

One timed run per query per scale (this is a smoke sweep for errors and
gross scaling breaks, not a steady-state benchmark — bench.py owns those
numbers). Stream-harness queries execute their full micro-batch protocol
at both scales like any other query.

Quiet-machine discipline (VERDICT r12 #1 — the r12 final sweep ran with
its sf0.1 leg concurrent to the pytest suite and inflated walls up to
6.5x without tripping the >12x flag): the sweep now reuses bench.py's
guards — a loadavg quiet-wait before each pass, the single-thread and
16-process CPU calibrations bracketing each pass, a ``degraded`` verdict
when parallel calibration drifts >1.5x across a pass, and an automatic
warm re-measure of any row whose sf1/sf0.1 ratio exceeds
SWEEP_REMEASURE_RATIO (default 3x) so a contended moment can never
masquerade as a scaling break in the committed artifact. A degraded
artifact is still written (evidence must never vanish) but exits nonzero
so run_all_gates.sh refuses the round on it.

Usage: python tools/sf1_sweep.py [out_json]
Env:   SF1_DIR (default /root/repo/testdata_sf1),
       SF01_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS,
       SWEEP_REMEASURE_RATIO (default 3.0).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def run_pass(spark, sf_dir: str) -> tuple[dict[str, float], dict[str, str]]:
    from etl_consumer_spark.plans import QUERIES

    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name, entry in QUERIES.items():
        t0 = time.time()
        try:
            entry.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — the sweep exists to catch these
            errors[name] = str(exc)[:300]
            times[name] = round(time.time() - t0, 3)
        print(f"{name}: {times[name]}s" + (" ERROR" if name in errors else ""), flush=True)
    return times, errors


def main() -> None:
    from etl_consumer_spark.session import get_spark

    # bench.py owns the quiet-machine guards; the sweep reuses them verbatim
    # so the two gate artifacts share one calibration methodology
    from bench import _cpu_calibration, _cpu_calibration_parallel, _wait_for_quiet

    sf1_dir = os.environ.get("SF1_DIR", "/root/repo/testdata_sf1")
    sf01_dir = os.environ.get("SF01_DIR", "/root/testdata/sf0.1")
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/SF1_SWEEP.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    quiet_wait = _wait_for_quiet()
    spark = get_spark(
        app_name="sf1_sweep", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm

    calib: dict[str, float] = {"quiet_wait_sec": quiet_wait}
    drift = 1.0

    def bracketed_pass(label: str, sf_dir: str):
        """One run_pass with loadavg quiet-wait before and the single-thread +
        parallel16 CPU calibrations bracketing it; records the drift."""
        nonlocal drift
        calib[f"quiet_wait_{label}_sec"] = _wait_for_quiet()
        calib[f"loadavg_{label}_before"] = round(os.getloadavg()[0], 2)
        calib[f"calib_{label}_before_sec"] = _cpu_calibration()
        calib[f"calib_parallel16_{label}_before_sec"] = _cpu_calibration_parallel()
        times, errors = run_pass(spark, sf_dir)
        calib[f"calib_{label}_after_sec"] = _cpu_calibration()
        after_p = _cpu_calibration_parallel()
        calib[f"calib_parallel16_{label}_after_sec"] = after_p
        calib[f"loadavg_{label}_after"] = round(os.getloadavg()[0], 2)
        before_p = calib[f"calib_parallel16_{label}_before_sec"]
        drift = max(drift, after_p / before_p, before_p / after_p)
        return times, errors

    print("=== sf0.1 pass ===", flush=True)
    t01, e01 = bracketed_pass("sf01", sf01_dir)
    print("=== sf1.0 pass ===", flush=True)
    t1, e1 = bracketed_pass("sf1", sf1_dir)
    degraded = drift > 1.5

    ratios = {
        n: round(t1[n] / t01[n], 2)
        for n in t1
        if n in t01 and t01[n] > 0 and n not in e1 and n not in e01
    }
    from etl_consumer_spark.plans import QUERIES

    # Auto re-measure (VERDICT r12 #1): any row whose single-shot ratio
    # exceeds SWEEP_REMEASURE_RATIO gets one warm-up + one timed run per
    # scale AFTER a quiet-wait, and the committed row becomes the warm
    # number — a contended moment must not be recorded as a scaling break.
    # Both measurements are kept (first_pass_*) so evidence never vanishes.
    remeasure_ratio = float(os.environ.get("SWEEP_REMEASURE_RATIO", "3.0"))
    remeasured: dict[str, dict[str, float]] = {}
    for n in sorted(ratios):
        if ratios[n] <= remeasure_ratio or n in e01 or n in e1:
            continue
        _wait_for_quiet()
        warm: dict[str, float] = {}
        try:
            for label, d in (("sf01", sf01_dir), ("sf1", sf1_dir)):
                QUERIES[n].fn(spark, d).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                QUERIES[n].fn(spark, d).write.format("noop").mode("overwrite").save()
                warm[label] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — keep the cold row on re-measure failure
            print(f"re-measure {n}: ERROR ({str(exc)[:120]}) — keeping cold row", flush=True)
            continue
        if warm["sf01"] > 0:
            warm_ratio = round(warm["sf1"] / warm["sf01"], 2)
            remeasured[n] = {
                "first_pass_sf01": t01[n],
                "first_pass_sf1": t1[n],
                "first_pass_ratio": ratios[n],
                "warm_sf01": warm["sf01"],
                "warm_sf1": warm["sf1"],
                "warm_ratio": warm_ratio,
            }
            # ADVICE r13 #1: only adopt the warm row when it is BETTER — a
            # contended re-measure must not overwrite a passing cold ratio
            # (r13's olap_q11 6.08x cold became a false 29.68x "warm" flag).
            if warm_ratio < ratios[n]:
                t01[n], t1[n] = warm["sf01"], warm["sf1"]
                ratios[n] = warm_ratio
            else:
                remeasured[n]["kept_first_pass"] = True
            print(
                f"re-measure {n}: {remeasured[n]['first_pass_ratio']}x cold -> "
                f"{warm_ratio}x warm ({warm['sf01']}s -> {warm['sf1']}s)"
                + (" [kept cold row]" if remeasured[n].get("kept_first_pass") else ""),
                flush=True,
            )

    # sub-second sf0.1 queries are dominated by fixed per-query cost; the
    # 12x flag only means something when the numerator had room to scale.
    # scale_safe=False queries are RETAINED CORRECTNESS BASELINES (the
    # registry convention: deliberately-unbounded exact twins of capped
    # scale paths, e.g. the exact in-cluster IVF beside the derived-plane
    # LSH) — their ratios are reported separately, never as regressions.
    flagged = {
        n: r
        for n, r in ratios.items()
        if r > 12.0 and t1.get(n, 0) > 2.0 and QUERIES[n].scale_safe
    }
    # Confirmation pass (round 11): single-shot ratios are noisy — a query
    # that lands on a contended scheduler moment shows a phantom 12x (all
    # four round-11 first-pass flags warm-measured sublinear or flat).
    # Each flagged query gets one warm-up + one timed run per scale; only
    # a CONFIRMED ratio gates. Both passes are recorded so a flag can
    # never silently vanish.
    first_pass_flags = dict(flagged)
    confirmed = {}
    for n in flagged:
        retimed = {}
        try:
            for label, d in (("sf01", sf01_dir), ("sf1", sf1_dir)):
                QUERIES[n].fn(spark, d).write.format("noop").mode("overwrite").save()
                t0 = time.time()
                QUERIES[n].fn(spark, d).write.format("noop").mode("overwrite").save()
                retimed[label] = time.time() - t0
        except Exception as exc:  # noqa: BLE001 — keep the flag, never lose the sweep
            print(f"flag-confirm {n}: ERROR during re-measure ({str(exc)[:120]}) "
                  "— keeping the first-pass flag", flush=True)
            confirmed[n] = flagged[n]
            continue
        if retimed["sf01"] > 0:
            r2 = round(retimed["sf1"] / retimed["sf01"], 2)
            print(f"flag-confirm {n}: warm ratio {r2} "
                  f"({retimed['sf01']:.2f}s -> {retimed['sf1']:.2f}s)", flush=True)
            if r2 > 12.0 and retimed["sf1"] > 2.0:
                confirmed[n] = r2
    flagged = confirmed
    baseline_ratios = {
        n: r for n, r in ratios.items() if not QUERIES[n].scale_safe
    }
    result = {
        "sf01_total": round(sum(t01.values()), 1),
        "sf1_total": round(sum(t1.values()), 1),
        "n_queries": len(t1),
        "degraded": degraded,
        "calib_drift": round(drift, 3),
        "calibration": calib,
        "remeasured_over_threshold": remeasured,
        "remeasure_ratio_threshold": remeasure_ratio,
        "errors_sf01": e01,
        "errors_sf1": e1,
        "flagged_over_12x": flagged,
        "flagged_first_pass_unconfirmed": {
            n: r for n, r in first_pass_flags.items() if n not in flagged
        },
        "baseline_ratios_over_12x": {n: r for n, r in baseline_ratios.items() if r > 12.0},
        "ratio_median": sorted(ratios.values())[len(ratios) // 2] if ratios else None,
        "ratios": ratios,
        "times_sf1": t1,
    }
    with open(out, "w") as fh:
        fh.write(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("ratios", "times_sf1", "calibration", "remeasured_over_threshold")}))
    # ADVICE r10 #4: the sweep must GATE, not just report — run_all_gates.sh
    # runs under `set -e`, so a nonzero exit on any error or scaling flag is
    # what makes the overflow/superlinearity class actually block a round.
    # r13: a degraded (calib-drift >1.5x) pass also refuses to gate — the
    # artifact is written for evidence but the round must re-run it quiet.
    if e01 or e1 or flagged or degraded:
        sys.exit(1)


if __name__ == "__main__":
    main()
