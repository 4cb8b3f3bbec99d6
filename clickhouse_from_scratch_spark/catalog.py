"""Testdata catalog: load the driver's parquet tables and register views.

Mirrors the reference's ``database.table`` namespace model
(reference ``src/Interpreters/StorageID.h``): tables are fixed-schema,
columnar, named — here Parquet-backed DataFrames + temp views.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Table-metadata memo: (session, sf_dir, name) -> DataFrame.
# A DataFrame is an immutable LAZY plan — reusing it never reuses *data*
# (every action recomputes from the parquet files); what it skips is the
# per-call footer schema inference + source re-resolution (~120 ms per
# spark.read.parquet on this box), which any real deployment would also
# skip by resolving tables from catalog metadata (spark.table()).
# Keyed by the SESSION object, not applicationId: a DataFrame belongs to
# the session that created it (temp views registered from it land in
# THAT session's catalog — two sessions over one SparkContext share an
# applicationId but not a view catalog), and a stopped/restarted session
# is a new object so it never sees a stale plan from a dead context.
# The held session reference in the value keeps id() stable.
_TABLE_MEMO: dict[tuple[int, str, str],
                  tuple[SparkSession, DataFrame]] = {}

# Sessions whose confs are already pinned. Each conf.set /
# applicationId read is a py4j round trip; a 6-table query paid 18+ of
# them per plan build (inside the bench's timed region, guide §1.2).
# Keyed by the SESSION object (spark.conf is per-session SQLConf —
# two sessions over one SparkContext each need their own pinning; the
# held reference keeps the id stable) — a restarted session is a NEW
# object, so it re-pins.
_PINNED_APPS: dict[int, tuple[SparkSession, str]] = {}


def _session_stopped(s: SparkSession) -> bool:
    try:
        return s.sparkContext._jsc.sc().isStopped()
    except Exception:
        return True


def _prune_dead_sessions() -> None:
    """Drop memo entries whose session's SparkContext is stopped.

    The memos hold strong session references (to keep ``id()`` stable),
    so a long-lived driver that repeatedly builds sessions would
    otherwise grow them without bound and pin dead JVM handles (r13
    ADVICE). Called only when a brand-new session is first pinned —
    O(#sessions) py4j probes, never on the per-query path."""
    dead = {sid for sid, (s, _) in list(_PINNED_APPS.items())
            if _session_stopped(s)}
    if not dead:
        return
    for sid in dead:
        _PINNED_APPS.pop(sid, None)
    for key in [k for k, (s, _) in list(_TABLE_MEMO.items())
                if id(s) in dead or _session_stopped(s)]:
        _TABLE_MEMO.pop(key, None)
    for key in [k for k, s in list(_VIEW_MEMO.items())
                if id(s) in dead or _session_stopped(s)]:
        _VIEW_MEMO.pop(key, None)


def _app_id(spark: SparkSession) -> str:
    """applicationId with per-session conf pinning on first sight."""
    entry = _PINNED_APPS.get(id(spark))
    if entry is not None and entry[0] is spark:
        return entry[1]
    _prune_dead_sessions()
    app_id = spark.sparkContext.applicationId
    # Pin the semantics the engine is defined under even on a session
    # we didn't build (e.g. the driver harness's own SparkSession):
    # nanosAsLong (testdata events.ts is TIMESTAMP(NANOS)), UTC
    # (oracle comparability), ANSI off (ClickHouse is
    # overflow-lenient; Spark 4 defaults ANSI on).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    # dedup bucket caps rely on InferWindowGroupLimit to bound hot-
    # bucket shuffle map-side; the default threshold (1000) is below
    # the 10000 cap (see session.py — semantics-preserving rule)
    spark.conf.set("spark.sql.optimizer.windowGroupLimitThreshold",
                   str(1 << 20))
    _PINNED_APPS[id(spark)] = (spark, app_id)
    return app_id


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Plain parquet scan — keeps Catalyst pushdown/pruning available.

    ``events.ts`` is TIMESTAMP(NANOS) in the parquet files; with
    ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as long
    nanoseconds and is converted here to a µs timestamp (integer div —
    double math would lose precision above 2^53 ns).
    """
    _app_id(spark)  # conf pinning (nanosAsLong / UTC / ANSI off)
    key = (id(spark), os.path.abspath(sf_dir), name)
    cached = _TABLE_MEMO.get(key)
    if cached is not None and cached[0] is spark:
        return cached[1]
    df = spark.read.parquet(table_path(sf_dir, name))
    for field in df.schema.fields:
        if field.name == "ts" and field.dataType.simpleString() == "bigint":
            from pyspark.sql import functions as F
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _TABLE_MEMO[key] = (spark, df)
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES
            if os.path.exists(table_path(sf_dir, t))}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for the SQL path)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


# Memo of views already registered via table_view(), keyed by the
# SESSION object (temp views are session-scoped: two SparkSessions over
# one SparkContext share an applicationId but NOT a temp-view catalog).
# View names encode the data directory, so two sf_dirs never collide
# and a registered view never needs refreshing (the name is a pure
# function of (dir, table); the underlying DataFrame is the same lazy
# plan load_table returns — every action still recomputes from the
# parquet files). The held session reference keeps id() stable.
_VIEW_MEMO: dict[tuple[int, str], SparkSession] = {}


def table_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Register ``name`` as a dir-scoped temp view and return the view
    name, memoized per (session, view).

    Lets query builders run ONE ``spark.sql`` over named tables — a
    single parse + one analyzer fixed-point for the whole tree —
    instead of a chain of eagerly-analyzed DataFrame transformations
    (each ``.join``/``.agg``/`.select`` re-analyzes the growing plan;
    a 6-table join chain paid ~60-90 ms of driver time per build,
    guide §1.2; the one-shot SQL build is ~20 ms). The `__cat_` prefix
    + path hash keeps the namespace disjoint from user/frontend views.
    """
    import hashlib

    path = os.path.abspath(sf_dir)
    digest = hashlib.md5(path.encode()).hexdigest()[:8]
    view = f"__cat_{digest}_{name}"
    key = (id(spark), view)
    if _VIEW_MEMO.get(key) is not spark:
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        _VIEW_MEMO[key] = spark
    return view
