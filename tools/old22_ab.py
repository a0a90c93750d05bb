#!/usr/bin/env python
"""Isolated old-22 subset runner for cross-checkout A/B benchmarking.

Usage: python tools/old22_ab.py <repo_dir> <reps> [sf_dir]

Runs the ORIGINAL 22-query headline subset (the first 22 entries of
bench.py's HEADLINE — the cross-round comparison anchor BASELINE.md
tracks as "old-22") against <repo_dir>'s code in THIS fresh process:
<reps> timed repetitions per query, `noop` sink, per-query best
(warm) reported. Prints one JSON line:
  {"repo": ..., "sum_best_sec": N, "queries": {name: best_sec},
   "queries_first": {name: first_rep_sec}, "loadavg": [...]}

Protocol notes (VERDICT r12 next #1):
- run ONLY after a long-idle window (the caller gates on loadavg);
- isolated runs pay their own session-cache builds in the first rep
  of the affected queries — the per-query BEST prices the warm
  steady state, `queries_first` records the cold rep so cache-build
  cost is visible instead of folded silently into either framing;
- run the two checkouts back-to-back in BOTH orders (A,B then B,A)
  so slow host drift cancels in the paired comparison.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo)
    os.chdir(repo)

    # Prefer the named OLD22 anchor exported by bench.py (r13 advice);
    # fall back to the regex scrape only for historical checkouts that
    # predate the constant (r13 and earlier).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ab_bench", os.path.join(repo, "bench.py")
    )
    # bench.py triggers a Spark import at module load; that is fine
    # here (this tool creates a session anyway) but historical
    # checkouts may fail to import — regex fallback covers them.
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        names = list(getattr(mod, "OLD22", mod.HEADLINE[:22]))[:22]
    except Exception:
        bench_src = open(os.path.join(repo, "bench.py")).read()
        names = re.findall(r'^\s+"([a-z0-9_]+)",\s+#', bench_src, re.M)[:22]

    from pydra_map_reduce_spark.plans import REGISTRY  # noqa: E402
    from pydra_map_reduce_spark.session import get_spark  # noqa: E402

    load0 = [round(x, 2) for x in os.getloadavg()]
    spark = get_spark(app_name="old22-ab")
    # same inline warmup as bench.py (JVM/codegen/parquet path)
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
        "sum(l_quantity) AS s", "count(*) AS n"
    ).write.mode("overwrite").format("noop").save()

    best: dict[str, float] = {}
    first: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        runs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            runs.append(time.perf_counter() - t0)
        first[name] = round(runs[0], 3)
        best[name] = round(min(runs), 3)
    print(
        json.dumps(
            {
                "repo": repo,
                "reps": reps,
                "sf_dir": sf_dir,
                "sum_best_sec": round(sum(best.values()), 3),
                "sum_first_sec": round(sum(first.values()), 3),
                "queries": best,
                "queries_first": first,
                "loadavg_start": load0,
                "loadavg_end": [round(x, 2) for x in os.getloadavg()],
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
