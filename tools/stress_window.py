#!/usr/bin/env python
"""Crash-resilient whole-window stress sweep (r13 verdict next #6).

Usage: python tools/stress_window.py [out_json] [tier_dir]

Runs every driver-window query (the first 50 of __spark_entry__'s
queries()) through tools/stress_bench.py at sf0.1 AND the ~10x tier,
in SUBPROCESS BATCHES with resume: a query that kills the JVM (the
1 GB-heap GCLocker floor class) is recorded as {"err": "jvm_died"}
and the sweep continues from the next query — one bad query no
longer loses the rest of the sweep (how the r14 first attempt died
on query #1). Heap comes from SPARK_GRAFT_DRIVER_MEM (default 1g).
Writes one JSON object per query to <out_json> (default
/tmp/stress_window.json).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stress_window.json"
    tier = sys.argv[2] if len(sys.argv) > 2 else "/tmp/pydra_sf1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entry

    queue = list(entry.queries())[:50]
    here = os.path.dirname(os.path.abspath(__file__))
    results: dict[str, dict] = {}
    while queue:
        cmd = [
            sys.executable, os.path.join(here, "stress_bench.py"),
            tier, "--queries", ",".join(queue),
        ]
        proc = subprocess.run(
            cmd, capture_output=True, text=True,
            cwd=os.path.dirname(here),
        )
        done_pairs: dict[str, dict] = {}
        for line in proc.stdout.splitlines():
            try:
                rec = json.loads(line)
            except ValueError:
                continue
            if "query" in rec:
                done_pairs.setdefault(rec["query"], {})[rec["tier"]] = rec
        for name in list(queue):
            tiers = done_pairs.get(name, {})
            if "sf0.1" in tiers and "sf1" in tiers:
                results[name] = {
                    "sf0.1": tiers["sf0.1"], "sf1": tiers["sf1"],
                }
                queue.remove(name)
            else:
                if proc.returncode == 0:
                    # clean exit but missing output — record and skip
                    results[name] = {"err": "no_output", **tiers}
                    queue.remove(name)
                else:
                    # the crash happened ON this query (first without
                    # both tiers): record which tier it died at
                    died_at = "sf1" if "sf0.1" in tiers else "sf0.1"
                    results[name] = {"err": f"jvm_died@{died_at}", **tiers}
                    queue.remove(name)
                break  # restart a fresh subprocess for the remainder
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"[stress_window] {len(results)}/50 done, {len(queue)} queued",
              flush=True)
    print(json.dumps({"done": len(results), "out": out_path}))


if __name__ == "__main__":
    main()
