"""SparkSession factory and fixture catalog.

Scale posture (100 TB): every table is exposed as a named temp view over
a parquet scan, so all operators compose as Catalyst logical plans and
get predicate pushdown, column pruning, partition pruning, AQE join
re-planning and whole-stage codegen for free. Nothing here collects to
the driver.

ns-timestamp note: ``events.ts`` is parquet TIMESTAMP(NANOS), which the
vanilla Spark parquet reader rejects (PARQUET_TYPE_ILLEGAL). We read it
via ``spark.sql.legacy.parquet.nanosAsLong`` and convert nanos → µs
TimestampType inside the view with integer arithmetic (``ts div 1000``),
keeping the scan distributed and codegen'd (no UDF, no driver round
trip). DuckDB oracles see the original ns values, so every verified
query buckets/orders through `date_trunc`/epoch-µs, never raw ns.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession, functions as F

#: All fixture tables (TESTDATA.md / FIXTURES.md).
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: Runtime SQL confs applied to *any* session we are handed (the driver
#: owns the SparkSession in verification runs, so these must be
#: runtime-settable — verified: they are).
_RUNTIME_CONFS = {
    # events.ts is TIMESTAMP(NANOS) parquet — see module docstring.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deterministic timestamp semantics vs the (naive-UTC) DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime join re-planning, skew-join splitting, partition
    # coalescing — the main 100 TB levers that are pure configuration.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas UDF / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Write timestamps as INT64 TIMESTAMP(MICROS), not legacy INT96:
    # INT96 chunks carry NO footer statistics, so every lakehouse
    # stats lever (delete_dataset file pruning, read_snapshot between,
    # cluster_by file indexes) is blind on timestamp columns — and
    # INT96 is deprecated in the format spec anyway (r15).
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Shuffle parallelism sized to the host, not the 200 default — at
    # fixture scale 200-partition exchanges are pure scheduling overhead
    # (AQE coalescing shrinks data partitions but not the task floor in
    # iterative loops). On a real cluster this is sized to data volume.
    "spark.sql.shuffle.partitions": str(max(os.cpu_count() or 8, 8)),
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-owned or ours)."""
    for k, v in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - conf locked by a custom setup
            pass
    return spark


def get_spark(app_name: str = "hive-gateway-spark") -> SparkSession:
    """Build the engine's own session (tests, bench) on local[$SPARK_GRAFT_CPUS].

    On a real cluster only ``master``/memory change; the SQL confs are
    identical. Shuffle partitions default to the core count locally —
    on a 1000-executor cluster this is sized to data volume instead
    (or left to AQE coalescing, which is enabled).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # shuffle partitions come from _RUNTIME_CONFS below
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in _RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    # Hive-enabled per BASELINE.json ("Spark SQL + HiveContext"); fall
    # back to in-memory catalog if hive classes are unavailable.
    try:
        spark = builder.enableHiveSupport().getOrCreate()
    except Exception:  # pragma: no cover
        spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: session → {sf_dir: loaded DataFrames}. Schema reads cost ~0.5 s per
#: call across the 10 tables; every query calls load_tables, so caching
#: removes a constant from each operator's latency. Weak-keyed on the
#: SparkSession object itself: a stopped/garbage-collected session drops
#: its entries, so a new session can never inherit DataFrames bound to a
#: dead SparkContext (id(spark) reuse would allow exactly that).
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)
#: session → sf_dir whose tables currently own the temp views (SQL-
#: string queries read views; switching sf_dir must re-register them).
_VIEW_OWNER: "weakref.WeakKeyDictionary[SparkSession, str]" = weakref.WeakKeyDictionary()


def _normalize_timestamps(name: str, df: DataFrame) -> DataFrame:
    """Normalize fixture timestamp encodings to TimestampType (LTZ).

    The driver regenerates the parquet fixtures between rounds and the
    physical encoding of ``events.ts`` has drifted across three forms so
    far: int64 nanos-as-long, TIMESTAMP_MICROS isAdjustedToUTC=0 (read
    as TIMESTAMP_NTZ), and plain TIMESTAMP (LTZ). Operators assume LTZ
    ``timestamp`` (``unix_micros`` rejects NTZ), so every timestamp-ish
    column is coerced here, in one place. With the session timezone
    pinned to UTC (``configure``), the NTZ→LTZ cast is value-identical
    and the DuckDB oracles (naive-UTC epoch_us) need no change.
    """
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
        elif name == "events" and col == "ts" and dtype == "bigint":
            # nanos → µs, integer division (no double round-trip: ns
            # epoch values exceed 2^53 and would lose precision).
            df = df.withColumn(col, F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all fixture tables as temp views; return them by name.

    Idempotent and cheap — loaded tables are cached per (session,
    sf_dir), and views are (re)registered only when the session's
    current sf_dir changes. The ``events`` view converts the
    nanos-as-long ``ts`` back to a µs TimestampType column with integer
    division (codegen'd projection).
    """
    configure(spark)
    per_session = _TABLE_CACHE.setdefault(spark, {})
    out = per_session.get(sf_dir)
    if out is None:
        out = {}
        for name in TABLES:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            df = _normalize_timestamps(name, df)
            out[name] = df
        per_session[sf_dir] = out
    if _VIEW_OWNER.get(spark) != sf_dir:
        for name, df in out.items():
            df.createOrReplaceTempView(name)
        _VIEW_OWNER[spark] = sf_dir
    return out


def invalidate(spark: SparkSession, sf_dir: str) -> None:
    """Drop the session's cached frames (and temp views) for ``sf_dir``
    so the next load_tables() re-lists the files — the public way to
    observe a table that grew after first load (a cached frame pins the
    FileIndex captured at load time). Scoped: other sf_dirs' cache
    entries are untouched, so lazy plans over THEIR frames stay valid
    (ADVICE r12 #2 — the old private-state clear evicted everything).
    """
    per_session = _TABLE_CACHE.get(spark)
    if per_session is not None:
        per_session.pop(sf_dir, None)
    if _VIEW_OWNER.get(spark) == sf_dir:
        del _VIEW_OWNER[spark]
    for name in TABLES:
        try:
            spark.catalog.refreshByPath(f"{sf_dir}/{name}.parquet")
        except Exception:  # pragma: no cover - path never read yet
            pass
