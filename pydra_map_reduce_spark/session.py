"""SparkSession factory.

Local mode is a correctness/dev harness; configs are chosen so the same
logical plans scale to a multi-executor cluster:

- AQE on (runtime re-plan, partition coalescing, skew-join splitting) —
  at 100 TB the static plan is always wrong somewhere.
- shuffle.partitions sized to cores locally; on a real cluster AQE's
  coalescing makes the initial number much less sensitive.
- Arrow enabled for every Python<->JVM hop (pandas UDFs, toPandas).
- Session timezone pinned to UTC so event-time semantics are identical
  to the DuckDB oracle and to any other engine reading the same parquet.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _defaults_conf_has_master() -> bool:
    """True when spark-defaults.conf configures spark.master.

    Probed from the FILE: a pre-JVM ``SparkConf()`` is an empty dict
    (pyspark only loads JVM-side defaults once the gateway exists), so
    ``SparkConf().contains("spark.master")`` is constant-False here —
    checking it would silently override a cluster master configured in
    spark-defaults.conf with local[N]. Java-properties format: the key
    is the first whitespace-/'='-/':'-delimited token of a non-comment
    line."""
    conf_dir = os.environ.get("SPARK_CONF_DIR")
    if not conf_dir:
        home = os.environ.get("SPARK_HOME")
        if not home:
            try:
                import pyspark

                home = os.path.dirname(pyspark.__file__)
            except ImportError:  # pragma: no cover
                return False
        conf_dir = os.path.join(home, "conf")
    try:
        with open(os.path.join(conf_dir, "spark-defaults.conf")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith(("#", "!")):
                    continue
                key = line.replace("=", " ").replace(":", " ").split(None, 1)[0]
                if key == "spark.master":
                    return True
    except OSError:
        return False
    return False


def get_spark(
    app_name: str = "pydra_map_reduce_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS or all cores. On a real
    cluster the master/resource settings come from spark-submit and the
    builder inherits them — only the SQL confs below matter.

    ``driver_memory`` is a static conf: it only takes effect for the
    FIRST session created in a process (getOrCreate silently ignores
    it, and master, afterwards). For spark-submit deployments set it
    via --driver-memory instead.
    """
    if cpus is None:
        raw = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
        try:
            cpus = int(raw) if raw else 0
        except ValueError:
            cpus = 0
    # non-positive cpus — from the env var OR an explicit argument
    # (e.g. a caller computing cores-2 on a 1-core box) — would build
    # an invalid master URL (local[-2]/local[0]) and crash obscurely
    # deep in JVM context creation; fall back to all cores either way
    cpus = cpus if cpus > 0 else (os.cpu_count() or 4)
    if shuffle_partitions is None:
        # local: ~cores. Cluster: AQE coalesces down from a higher start.
        shuffle_partitions = max(cpus, 8)

    builder = SparkSession.builder
    # Only force local mode when no master was supplied anywhere else:
    # programmatic .master() overrides spark-submit, which would
    # silently run a cluster job on the driver node. In Python client
    # mode `--master` lives in PYSPARK_SUBMIT_ARGS (it is NOT a JVM
    # system property before context creation — verified empirically),
    # so check that, spark-defaults.conf (probed from the FILE — a
    # pre-JVM SparkConf() is an empty dict, so .contains() is
    # constant-False and would not guard anything), and $MASTER — PLUS
    # the spark-submit PythonRunner path, where NONE of those are
    # visible from Python (the runner pre-launches the gateway JVM
    # carrying --master and exports only PYSPARK_GATEWAY_PORT/SECRET):
    # if a gateway already exists, the master decision was already
    # made out-of-process and must not be overridden here.
    master_given = (
        "--master" in os.environ.get("PYSPARK_SUBMIT_ARGS", "")
        or "PYSPARK_GATEWAY_PORT" in os.environ
        or _defaults_conf_has_master()
        or bool(os.environ.get("MASTER"))
    )
    if not master_given:
        builder = builder.master(f"local[{cpus}]")
    builder = (
        builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # dims like region/nation/part are broadcast-join candidates;
        # 32 MB leaves headroom over the 10 MB default without risking OOM
        # on 4-8 GB executors.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Storage must yield to execution (guide §5): a long session
        # accumulates MEMORY_AND_DISK session caches (index frames,
        # shared model tables) that all degrade gracefully to disk,
        # while an execution-starved hash aggregate dies with a heap
        # OOM — observed in a 178-query bench session at the 1 GB
        # default heap (a corpus-pair partial agg OOM'd once pinned
        # caches filled the default 0.5 protected-storage region).
        # 0.2 keeps a working set protected but lets execution reclaim
        # the rest; it is heap-size-relative, so larger deployments
        # are unaffected in kind.
        .config("spark.memory.storageFraction", "0.2")
        .config("spark.ui.enabled", "false")
    )
    if not master_given:
        # loopback pin is LOCAL-mode only: on a real cluster the
        # executors must reach the driver at a routable address, and a
        # hardcoded 127.0.0.1 would send every task's callback to the
        # executor itself (the deployment path master_given preserves)
        builder = builder.config("spark.driver.host", "127.0.0.1")
    if driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM"):
        builder = builder.config(
            "spark.driver.memory",
            driver_memory or os.environ["SPARK_GRAFT_DRIVER_MEM"],
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
