"""Capture the FULL .explain("formatted") plan for registry queries.

Queries that end in (or pass through) ``localCheckpoint(eager=True)``
have trivial tail plans — the explain of the returned frame is just a
scan of the checkpointed RDD, and the real work ran eagerly while the
plan was being built. For PLAN EVIDENCE ONLY this tool monkeypatches
``DataFrame.localCheckpoint`` to the identity function while building
the plan, so the dumped plan shows the complete lineage the query
executes. Nothing is executed here (no action is taken) and bench
timings are never captured through this path — qbench/bench run the
unpatched code.

Usage: python tools/plancap.py QUERY [QUERY ...] [--dir plans/r14] [--tag before]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pydra_map_reduce_spark.plans import REGISTRY  # noqa: E402
from pydra_map_reduce_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--dir", default="plans/r14")
    ap.add_argument("--tag", default="before")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="plancap")
    os.makedirs(args.dir, exist_ok=True)

    # Spark 4: the concrete (classic-mode) DataFrame class lives in
    # pyspark.sql.classic.dataframe; pyspark.sql.dataframe is a facade.
    # Patch whichever classes exist so the identity stub takes effect.
    mods = []
    import pyspark.sql.dataframe as dfmod

    mods.append(dfmod)
    try:
        import pyspark.sql.classic.dataframe as cdfmod

        mods.append(cdfmod)
    except ImportError:
        pass
    origs = [m.DataFrame.localCheckpoint for m in mods]
    for m in mods:
        m.DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore[assignment]
    try:
        for name in args.queries:
            if name not in REGISTRY:
                print(f"{name}: NOT IN REGISTRY")
                continue
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(args.dir, f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(
                    "(plan captured with localCheckpoint patched to identity"
                    " so the full lineage is visible; execution uses the"
                    " unpatched code)\n\n"
                )
                f.write(plan)
            print(f"{name}: wrote {path}")
    finally:
        for m, o in zip(mods, origs):
            m.DataFrame.localCheckpoint = o  # type: ignore[assignment]


if __name__ == "__main__":
    main()
