"""Table loaders for the driver's synthetic star schema (TESTDATA.md).

All queries read through :func:`table` so the parquet scan is declared
once — Catalyst handles column pruning and predicate pushdown from the
downstream plan into the scan (verify with ``.explain``: ``PushedFilters``
/ ``ReadSchema``).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

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


# path -> (stat signature, unit). Keyed by PATH with the signature in
# the value (not the key): a fixture regenerated in-process replaces
# its entry instead of accumulating one dead 10k-element key per
# rewrite (r10 review wave).
_TS_UNIT_CACHE: dict[str, tuple] = {}


def _stat_sig(paths: list[str]) -> tuple:
    """Per-file (path, size, mtime_ns) signature — ONE stat per file.

    The shared cheap-invalidation fingerprint idiom (same shape as
    caches.corpus_fingerprint and runner._stage_dir's sig; those hash
    theirs because their keys travel, this one stays in-process)."""
    out = []
    for p in paths:
        st = os.stat(p)
        out.append((p, st.st_size, st.st_mtime_ns))
    return tuple(out)


def _table_files(sf_dir: str, name: str) -> list[str]:
    """The parquet file list backing one table (single file or dir)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        return [
            os.path.join(path, n)
            for n in sorted(os.listdir(path))
            if n.endswith(".parquet")
        ]
    return [path]


def events_ts_unit(path: str) -> str:
    """Physical parquet type of ``events.ts``, probed from the footer.

    Returns ``"ns"`` (TIMESTAMP(NANOS) — Spark's vectorized reader
    rejects it, so we must read nanos-as-long), or ``"ts"`` for any
    native timestamp precision Spark loads directly. The fixture has
    drifted between rounds (ns in r1, µs since r2), so this is probed,
    never assumed. Footer-only read: O(KB) regardless of file size.
    """
    probes = [path]
    if os.path.isdir(path):
        names = sorted(n for n in os.listdir(path) if n.endswith(".parquet"))
        if not names:
            raise RuntimeError(
                f"fixture schema changed: no .parquet files under {path} — "
                f"update catalog.py / FIXTURES.md for the new layout"
            )
        probes = [os.path.join(path, n) for n in names]
    # Stat-signature invalidation — a file regenerated IN-PROCESS at
    # the same path with a different ts unit previously kept the stale
    # classification and read µs values through div-1000 with no error
    # (r9 review wave 6). Stat-only, one syscall per file.
    sig = _stat_sig(probes)
    cached = _TS_UNIT_CACHE.get(path)
    if cached is not None and cached[0] == sig:
        return cached[1]
    import pyarrow as pa
    import pyarrow.parquet as pq

    # Bounded probe set: first + last + evenly spaced middles (≤8
    # footers). Mixed-unit dirs are pathological (the generator writes
    # one unit) — the check is a tripwire, not a guarantee, and a
    # 10k-file staged dir must not pay 10k synchronous footer reads
    # before the first query (r9 review wave 6).
    if len(probes) > 8:
        step = max(1, len(probes) // 8)
        probes = probes[::step][:7] + [probes[-1]]

    def classify(probe: str) -> str:
        t = pq.read_schema(probe).field("ts").type
        unit = getattr(t, "unit", None)
        if unit == "ns" or t == pa.int64():
            # Arrow reports BOTH parquet TIMESTAMP(NANOS) and INT96 as
            # timestamp[ns]; Spark loads INT96 natively but rejects
            # TIMESTAMP(NANOS) — distinguish via the PHYSICAL type
            # (r8: an INT96-written fixture broke the ns branch with a
            # 'ts div 1000' type error).
            pf_schema = pq.ParquetFile(probe).schema
            idx = pf_schema.names.index("ts")
            if pf_schema.column(idx).physical_type == "INT96":
                return "ts"
            return "ns"  # nanos: legacy long read + div-1000 conversion
        if unit in ("s", "ms", "us"):
            return "ts"  # Spark loads these natively
        raise RuntimeError(
            f"fixture schema changed: events.ts is now {t} (expected a "
            f"parquet timestamp or int64 nanos) — update catalog.py / "
            f"FIXTURES.md for the new type"
        )

    units = {classify(p) for p in probes}
    if len(units) > 1:
        # A mixed-unit dir cannot be read with one reader config; the
        # ns branch flips a session-wide legacy flag.
        raise RuntimeError(
            f"fixture schema changed: events dir {path} mixes ts units "
            f"{sorted(units)} across files — update catalog.py for a "
            f"per-file read strategy"
        )
    out = units.pop()
    _TS_UNIT_CACHE[path] = (sig, out)
    return out


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table of the schema as a DataFrame (lazy parquet scan).

    ``events.ts`` is normalized to TIMESTAMP_NTZ whatever the fixture
    writes: parquet TIMESTAMP(NANOS) is read as raw nanos
    (``spark.sql.legacy.parquet.nanosAsLong`` — the vectorized reader
    rejects ns timestamps) and converted with integer ``div`` (lossless:
    the generator emits µs-precision values); native µs timestamps pass
    straight through with a no-op-or-tz-strip cast. The branch is driven
    by a footer probe (:func:`events_ts_unit`), not a hard-coded
    assumption — the fixture changed ns→µs between rounds once already.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        # The LTZ→NTZ cast below renders wall-clock in the SESSION
        # zone: on a non-UTC session every events.ts would silently
        # shift by the UTC offset vs the naive-timestamp DuckDB oracle
        # (r9 review wave 6). get_spark pins UTC; an externally built
        # session must too — fail loudly instead of diverging quietly.
        tz = spark.conf.get("spark.sql.session.timeZone")
        if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
            raise RuntimeError(
                f"events requires spark.sql.session.timeZone=UTC (got "
                f"{tz!r}): the ts normalization and every oracle compare "
                "wall-clocks in UTC — build the session via "
                "frinesis_spark.session.get_spark or set the conf"
            )
        path = os.path.join(sf_dir, f"{name}.parquet")
        if events_ts_unit(path) == "ns":
            # NOTE the same flag+div-1000 branch exists in
            # streaming/runner.events_stream — change BOTH. The flag
            # is session-global by Spark's design (analysis-time), so
            # it is deliberately not restored: restoring it would
            # break this DataFrame's own lazy re-analysis.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            return df.withColumn(
                "ts", F.expr("CAST(timestamp_micros(ts div 1000) AS timestamp_ntz)")
            )
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread(df: DataFrame, min_parts: int = 0) -> DataFrame:
    """Repartition ONLY when the scan yields fewer partitions than
    the target: an unconditional repartition is a full shuffle of the
    corpus, never the advertised no-op — at real scale the scan
    already has many splits and this returns df as-is. (Hoisted from
    similarity.py so the dedup artifact builders share one
    definition — they each carried the unconditional form.)

    ``min_parts`` (r15): row-expanding builders pass a DATA-
    PROPORTIONAL floor so per-task output stays bounded as the corpus
    grows — the shingle-index explode at 5M docs OOMed a 96 GiB heap
    when 32 fixed partitions each had to materialize ~8M string rows
    (measured, tools/bench_scaling100.py); partition count must scale
    with volume, not core count (SCALE.md principles)."""
    par = max(
        df.sparkSession.sparkContext.defaultParallelism, min_parts
    )
    if df.rdd.getNumPartitions() >= par:
        return df
    return df.repartition(par)


def session_key(spark: SparkSession) -> tuple[str, int]:
    """Stable cache key for per-session derived state.

    ``(applicationId, id(session))``: the applicationId changes whenever
    the SparkContext is stopped and recreated, so an ``id()`` recycled
    across contexts cannot collide with stale entries bound to a dead
    context (the ADVICE r4 session-id-reuse hazard); ``id(session)``
    disambiguates sibling sessions sharing one context
    (``newSession()``), since temp views and cached DataFrames are
    session-scoped. Within ONE context a recycled ``id()`` CAN still
    collide (ADVICE r5) — safe only for caches whose values hold a
    reference to the session (all the DataFrame caches do, which pins
    the session alive for the entry's lifetime). Caches with
    session-free values must key weakly on the session object instead
    (see ``_VIEWS_CACHE``).
    """
    return (spark.sparkContext.applicationId, id(spark))


# session -> sf_dir of the last registration. Temp views are
# session-scoped and the scans are lazy, so re-registering the same dir
# is pure overhead (10 footer/schema reads per SQL query call — measured
# as sql_tpch_q3's r3 1.36× drift vs r1). Keyed WEAKLY on the session
# object itself (ADVICE r5): the value is a plain string that pins
# nothing, so an id()-based key could be recycled by a later sibling
# session and wrongly skip its registration; a WeakKeyDictionary entry
# dies with its session, so a recycled id can never alias a live entry.
_VIEWS_CACHE: "weakref.WeakKeyDictionary[SparkSession, tuple]" = (
    weakref.WeakKeyDictionary()
)

# The TPC-H suite's view set — registering ONLY these contains the
# blast radius: an events/documents/embeddings fixture problem (ts
# type the probe rejects, missing file) must not error all 22 SQL
# queries that never read those tables (r9 review wave 6).
RELATIONAL_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)


def register_views(
    spark: SparkSession,
    sf_dir: str,
    force: bool = False,
    tables: tuple = TABLES,
) -> None:
    """Register tables as temp views for the SQL-string API.

    Idempotent and INCREMENTAL per (session, sf_dir): repeat calls
    register only the not-yet-registered subset; a different sf_dir
    re-registers from scratch. Each registration records the table's
    stat signature, so a fixture regenerated IN-PROCESS at the same
    path re-registers instead of serving a stale view plan (r10 review
    wave — the same hazard events_ts_unit stat-invalidates; cost is
    ~one stat syscall per table per call, preserving the footer-read
    savings the cache exists for). Keyed weakly on the session object,
    so a dead session's entry vanishes with it (no id-reuse aliasing)
    and a stopped-then-recreated context re-registers; ``force=True``
    re-registers the REQUESTED tables only (e.g. after dropping a
    view), leaving the others' records intact.
    """
    cached_dir, done = _VIEWS_CACHE.get(spark, (None, {}))
    if cached_dir != sf_dir:
        done = {}
    elif force:
        done = {n: s for n, s in done.items() if n not in tables}
    done = dict(done)
    for name in tables:
        try:
            sig = _stat_sig(_table_files(sf_dir, name))
        except OSError:
            # Table files vanished (or a listing raced a rewrite)
            # AFTER a successful registration (ADVICE r10): keep
            # serving the existing view — the pre-stat-invalidation
            # no-op behavior — and let the actual scan raise if a
            # query really touches the missing table. A
            # never-registered table registers anyway, so the eager
            # schema read surfaces Spark's own PATH_NOT_FOUND (clearer
            # than this probe's FileNotFoundError, and only for a
            # table someone actually asked for).
            if name in done:
                continue
            table(spark, sf_dir, name).createOrReplaceTempView(name)
            continue
        if done.get(name) != sig:
            table(spark, sf_dir, name).createOrReplaceTempView(name)
            done[name] = sig
    _VIEWS_CACHE[spark] = (sf_dir, done)
