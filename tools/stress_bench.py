#!/usr/bin/env python
"""Scale-curve bench: sf0.1 vs the derived ~10x stress tier.

Usage: python tools/stress_bench.py [tier_dir] [--queries a,b,c | --window]

`--queries` overrides the default scale-sensitive list; `--window`
runs the driver window (the first 50 entries of __spark_entry__'s
queries()) — the r14 whole-window sweep. SPARK_GRAFT_DRIVER_MEM sets
the driver heap (default 1g — the driver-parity heap; the r13 GCLocker
floor measurements used 4g).

Runs the scale-sensitive query families (VERDICT r12 next #4) at
/root/testdata/sf0.1 AND the derived tier (default /tmp/pydra_sf1,
built by tools/build_stress_tier.py), 2 reps each (warm = min), with
per-query SHUFFLE READ/WRITE BYTES and task counts from the Spark
status REST API (this harness runs its own session with the UI
enabled; the production factory keeps it off). Prints one JSON line
per query and a final summary with the 10x wall-clock ratio — the
number that converts "the plan shape is linear" from an argument
into a measurement. Interpreting the ratio at fixture scale: a query
whose sf0.1 cost is dominated by the fixed job-overhead floor reads
well below 10x; anything reading far ABOVE ~10x (superlinear) is the
regression this tool exists to catch.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRESS_QUERIES = [
    # dedup family (banded/blocked candidate generation)
    "exact_dedup", "minhash_lsh_portable", "dedup_clusters_minhash",
    "ngram_jaccard_capped", "semantic_dedup",
    # ANN family (train + serve)
    "ivf_ann_topk", "ivf_ann_serve", "cosine_topk",
    # trained gate
    "quality_classifier_gate",
    # window heavies
    "sessionization", "window_running_sum", "pergroup_topk",
    "tumbling_window",
    # TPC-H join chains + flagship agg
    "shipping_priority", "local_supplier_volume", "pricing_summary",
    # corpus text path
    "word_count", "tf_idf", "corpus_pipeline",
]


def _stage_totals(ui: str) -> dict[str, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages?status=complete")
    )
    tot = {"shuffle_read": 0, "shuffle_write": 0, "input": 0, "tasks": 0}
    for s in stages:
        tot["shuffle_read"] += s.get("shuffleReadBytes", 0)
        tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
        tot["input"] += s.get("inputBytes", 0)
        tot["tasks"] += s.get("numCompleteTasks", 0)
    return tot


def main() -> None:
    args = [a for a in sys.argv[1:]]
    tier = "/tmp/pydra_sf1"
    queries = list(STRESS_QUERIES)
    while args:
        a = args.pop(0)
        if a == "--queries":
            queries = args.pop(0).split(",")
        elif a == "--window":
            import __spark_entry__ as entry

            queries = list(entry.queries())[:50]
        else:
            tier = a
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("pydra-stress-bench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        .config("spark.ui.enabled", "true")
        .config(
            "spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "1g")
        )
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    ui = f"http://127.0.0.1:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[1]}" if spark.sparkContext.uiWebUrl else "http://127.0.0.1:4040"

    from pydra_map_reduce_spark.plans import REGISTRY

    results: dict[str, dict] = {}
    # QUERY-OUTER order (r14): a JVM-killing query loses only its own
    # remaining tiers, and the resume wrapper (tools/stress_window.py)
    # can restart from the next query. Reader warmup once per tier.
    for sf_dir, _label in (("/root/testdata/sf0.1", "sf0.1"), (tier, "sf1")):
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").selectExpr(
            "count(*) AS n"
        ).write.mode("overwrite").format("noop").save()
    for name in queries:
        for sf_dir, label in (("/root/testdata/sf0.1", "sf0.1"), (tier, "sf1")):
            fn = REGISTRY[name].fn
            runs = []
            m0 = m1 = None
            for rep in range(2):
                if rep == 1:
                    m0 = _stage_totals(ui)
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                dt = time.perf_counter() - t0
                if rep == 1:
                    m1 = _stage_totals(ui)
                runs.append(dt)
            row = results.setdefault(name, {})
            row[label] = {
                "warm_sec": round(min(runs), 3),
                "cold_sec": round(runs[0], 3),
                "shuffle_write_mb": round(
                    (m1["shuffle_write"] - m0["shuffle_write"]) / 1e6, 2
                ),
                "shuffle_read_mb": round(
                    (m1["shuffle_read"] - m0["shuffle_read"]) / 1e6, 2
                ),
                "input_mb": round((m1["input"] - m0["input"]) / 1e6, 2),
                "tasks": m1["tasks"] - m0["tasks"],
            }
            print(json.dumps({"query": name, "tier": label, **row[label]}), flush=True)
    summary = {
        name: {
            "ratio_wall": round(
                r["sf1"]["warm_sec"] / max(r["sf0.1"]["warm_sec"], 1e-9), 2
            ),
            "ratio_shuffle_w": round(
                r["sf1"]["shuffle_write_mb"]
                / max(r["sf0.1"]["shuffle_write_mb"], 1e-9),
                2,
            ),
            "sf01_sec": r["sf0.1"]["warm_sec"],
            "sf1_sec": r["sf1"]["warm_sec"],
        }
        for name, r in results.items()
    }
    print(json.dumps({"summary": summary}, indent=1))


if __name__ == "__main__":
    main()
