"""Per-query micro-bench + plan capture for optimization work.

Usage:
    python tools/qbench.py QUERY [QUERY ...] [--reps N] [--explain DIR]
                           [--tag SUFFIX]

For each named registry query: run it REPS times against
$SPARK_GRAFT_SF_DIR (default sf0.1) through the noop sink (guide
§1.4 — times the computation, not the sink), print cold/warm
timings, and optionally write ``<DIR>/<query>_<SUFFIX>.txt`` with the
``.explain("formatted")`` output (guide §1 — plan evidence for every
claim). Jobs are labelled with setJobDescription (guide §1.5).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydra_map_reduce_spark.plans import REGISTRY  # noqa: E402
from pydra_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for plan dumps")
    ap.add_argument("--tag", default="before", help="plan-file suffix")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="qbench")
    # steady-state warmup (same inline scan+agg bench.py uses)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "sum(l_quantity) AS s", "count(*) AS n"
    ).write.mode("overwrite").format("noop").save()

    for name in args.queries:
        if name not in REGISTRY:
            print(f"{name}: NOT IN REGISTRY")
            continue
        fn = REGISTRY[name].fn
        runs = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"qbench:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        if args.explain:
            # AFTER the timed reps: building the plan invokes fn(), and
            # queries with eager work during plan build (session-cache
            # builds, localCheckpoint(eager=True)) would otherwise run
            # then, turning the reported 'cold' rep warm (r14 ADVICE).
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.explain, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(plan)
        rs = " ".join(f"{r:.3f}" for r in runs)
        print(f"{name}: cold={runs[0]:.3f} warm_min={min(runs[1:] or runs):.3f} runs=[{rs}]")


if __name__ == "__main__":
    main()
