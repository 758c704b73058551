"""File sink surface: partitioned parquet layout and bucketed tables.

The two physical-layout tools that matter at 100 TB:

- **Partitioning** (directory-level): one subdirectory per partition
  value → partition PRUNING at read time (a filter on the partition
  column skips whole directories before any I/O).
- **Bucketing** (file-level): rows hash-distributed into a fixed
  number of buckets per partition → joins/aggregations on the bucket
  key need NO shuffle (the layout IS the shuffle, paid once at write
  time and amortized over every subsequent query).

Each query round-trips through the layout and aggregates the re-read
copy; the oracle runs on the original parquet, so layout-induced row
loss/duplication or type drift fails the hash compare. The bucketed
join's no-shuffle property is asserted in tests (plan contains no
Exchange).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frinesis_spark.catalog import table
from frinesis_spark.functions.numeric import dsum, oracle_dsum

_N_BUCKETS = 8

# Range-partition count for the clustered-sort layout — intentionally
# its own knob (review wave 3): retuning the join bucketing must not
# silently change the clustered file geometry the skipping tests pin.
_N_CLUSTER_FILES = 8


_SCRATCH_BASES: set = set()


def scratch_dir(namespace: str, kind: str) -> str:
    """Per-PROCESS scratch path (review wave 3): the earlier fixed
    shared path let two processes on one host (bench + pytest, two CI
    jobs) overwrite/delete each other's artifacts mid-read — and on a
    multi-user host the first creator owned the shared base. One
    helper for both connector modules so the scheme cannot drift.
    Per-pid bases are reclaimed atexit (unlike the old fixed path,
    which each run overwrote in place, per-pid dirs would otherwise
    accumulate a fixture-sized copy per run — review find). atexit
    never fires on SIGKILL/OOM-kill, so first use also best-effort
    sweeps sibling dirs whose owning pid is DEAD (r9 review wave 7:
    crashed bench/CI runs otherwise grow /tmp without bound — no run
    ever reclaimed a dead sibling)."""
    base = os.path.join(
        tempfile.gettempdir(), f"{namespace}_{os.getpid()}"
    )
    if base not in _SCRATCH_BASES:
        _SCRATCH_BASES.add(base)
        atexit.register(shutil.rmtree, base, ignore_errors=True)
        _sweep_dead_siblings(namespace)
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, kind)


def _sweep_dead_siblings(namespace: str) -> None:
    """Remove scratch dirs left by crashed processes: same namespace,
    numeric pid suffix, pid no longer alive. Best-effort — a raced
    deletion or a recycled pid (which keeps a LIVE process's dir,
    never deletes one) is harmless."""
    tmp = tempfile.gettempdir()
    try:
        entries = os.listdir(tmp)
    except OSError:
        return
    prefix = f"{namespace}_"
    for e in entries:
        if not e.startswith(prefix):
            continue
        suffix = e[len(prefix):]
        if not suffix.isdigit() or int(suffix) == os.getpid():
            continue
        try:
            os.kill(int(suffix), 0)  # signal 0: existence probe only
        except ProcessLookupError:
            shutil.rmtree(os.path.join(tmp, e), ignore_errors=True)
        except OSError:
            pass  # alive but not ours (EPERM) — leave it


def _sink_dir(kind: str) -> str:
    return scratch_dir("frinesis_spark_sinks", kind)


def q_sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write `orders` as parquet partitioned by order status, read it
    back WITH a partition filter, aggregate.

    The read applies ``o_orderstatus = 'O'`` — against the partitioned
    layout this is partition pruning (``.explain`` shows
    ``PartitionFilters``, non-matching directories are never opened),
    the 100 TB reason this layout exists.
    """
    o = table(spark, sf_dir, "orders")
    path = _sink_dir("orders_by_status")
    o.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
    back = spark.read.parquet(path).where(F.col("o_orderstatus") == "O")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total"),
    )


def bucketed_join_tables(spark: SparkSession, sf_dir: str) -> None:
    """Materialize `orders` and `lineitem` as bucketed+sorted external
    tables on the join key (idempotent).

    Skips the rewrite when the catalog already holds both tables built
    from the same ``sf_dir`` — bucketing's whole point is that the
    layout cost is paid once and amortized, so re-paying it on every
    query call would misstate both the bench number and the driver's
    per-query budget.
    """
    path_o = _sink_dir("orders_bucketed")
    path_l = _sink_dir("lineitem_bucketed")
    marker = _sink_dir("bucketed_marker.txt")
    if (
        os.path.exists(marker)
        and spark.catalog.tableExists("orders_bucketed")
        and spark.catalog.tableExists("lineitem_bucketed")
    ):
        with open(marker) as fh:
            if fh.read().strip() == sf_dir:
                return
    # Invalidate BEFORE rebuilding (review wave 3): a failure between
    # the saveAsTable calls and the marker write must not leave a
    # stale marker vouching for tables built from a different sf_dir.
    if os.path.exists(marker):
        os.remove(marker)
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")
    (
        table(spark, sf_dir, "orders")
        .write.mode("overwrite")
        .bucketBy(_N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", path_o)
        .saveAsTable("orders_bucketed")
    )
    (
        table(spark, sf_dir, "lineitem")
        .write.mode("overwrite")
        .bucketBy(_N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", path_l)
        .saveAsTable("lineitem_bucketed")
    )
    with open(marker, "w") as fh:
        fh.write(sf_dir)


def q_join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free big-big join via bucketing: both tables bucketed
    and sorted on orderkey, so the sort-merge join reads co-located
    buckets directly — zero Exchange in the plan (asserted in
    tests/test_bucketed.py), and the bucket sort order also elides the
    SMJ sort.

    At 100 TB this converts the single most expensive shuffle of a
    fact-fact join into a one-time write-side cost shared by every
    downstream query on the same key.
    """
    bucketed_join_tables(spark, sf_dir)
    o = spark.table("orders_bucketed")
    li = spark.table("lineitem_bucketed")
    joined = li.join(o, li.l_orderkey == o.o_orderkey)
    return joined.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


# Compaction targets: many-small-files input sharding and the
# records-per-file ceiling the compactor rewrites toward.
_FRAGMENT_FILES = 64
_COMPACT_MAX_RECORDS = 100_000


def compact_parquet(
    df: DataFrame, path: str, target_files: int
) -> None:
    """Rewrite a DataFrame into ``target_files`` parquet files (small-
    files compaction): ``repartition(target_files)`` so every output
    file carries an even share, with ``maxRecordsPerFile`` as the
    ceiling that keeps any one file scan-task-sized.

    At 100 TB this is THE table-maintenance operation: streaming
    ingest and fine-grained partitioning strand data in thousands of
    KB-sized files, and every downstream scan then pays one task +
    one footer read per fragment. Compaction trades one bounded
    rewrite for every future scan's speedup. (Table formats ship this
    as OPTIMIZE/rewrite_data_files; on raw parquet it is exactly this
    repartition+write.)

    Precondition (review wave 3): ``path`` must be DISTINCT from the
    frame's own source — Spark refuses to overwrite a path it is
    reading ("Cannot overwrite a path that is also being read from"),
    so in-place compaction needs a side-dir write + rename on top of
    this helper.
    """
    (
        df.repartition(target_files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(_COMPACT_MAX_RECORDS))
        .parquet(path)
    )


def q_sink_compacted_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction roundtrip: fragment `lineitem` into
    ``_FRAGMENT_FILES`` tiny parquet files (simulating streaming-ingest
    debris), compact to 4 right-sized files, and aggregate the
    COMPACTED copy — the oracle on the original table proves the
    rewrite lost/duplicated/retyped nothing. The file-count reduction
    itself is asserted in tests (an aggregate can't see layout).
    """
    li = table(spark, sf_dir, "lineitem")
    frag_path = _sink_dir("lineitem_fragmented")
    li.repartition(_FRAGMENT_FILES).write.mode("overwrite").parquet(frag_path)
    compacted_path = _sink_dir("lineitem_compacted")
    compact_parquet(spark.read.parquet(frag_path), compacted_path, 4)
    back = spark.read.parquet(compacted_path)
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("price_sum"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


def q_sink_sorted_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-clustered + sorted parquet layout: ``repartitionByRange``
    on ``l_shipdate`` gives each output file a DISJOINT date range,
    and ``sortWithinPartitions`` makes every row-group's min/max
    statistics tight — so a date-range readback filter skips whole
    files and row-groups from footer stats alone. This is clustering
    (1-D Z-order / liquid clustering) as opposed to directory
    partitioning: the skipping column stays a normal high-cardinality
    column, no directory explosion, which is why warehouses cluster
    on date/id columns they could never partition on.

    The query re-reads one year out of the ~7-year span and
    aggregates it; the oracle runs the same filter on the original
    table, so the layout rewrite proves it lost/duplicated/retyped
    nothing. File-level min/max disjointness and actual row-group
    skipping are asserted in tests (an aggregate can't see layout).
    At 100 TB the range-repartition is one shuffle paid at write
    time — amortized over every later time-windowed scan, the same
    trade as bucketing.
    """
    li = table(spark, sf_dir, "lineitem")
    path = _sink_dir("lineitem_clustered")
    (
        li.repartitionByRange(_N_CLUSTER_FILES, "l_shipdate")
        .sortWithinPartitions("l_shipdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path).where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return back.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_extendedprice").alias("price_sum"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


QUERIES = {
    "sink_partitioned_parquet": q_sink_partitioned_parquet,
    "join_bucketed_colocated": q_join_bucketed_colocated,
    "sink_compacted_parquet": q_sink_compacted_parquet,
    "sink_sorted_clustered": q_sink_sorted_clustered,
}

ORACLE = {
    "sink_sorted_clustered": f"""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               {oracle_dsum('l_extendedprice')} AS price_sum,
               MIN(l_shipdate) AS first_ship,
               MAX(l_shipdate) AS last_ship
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l_returnflag
    """,
    "sink_compacted_parquet": f"""
        SELECT l_returnflag,
               COUNT(*) AS n_rows,
               {oracle_dsum('l_extendedprice')} AS price_sum,
               COUNT(DISTINCT l_orderkey) AS n_orders
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "sink_partitioned_parquet": f"""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               {oracle_dsum('o_totalprice')} AS total
        FROM orders
        WHERE o_orderstatus = 'O'
        GROUP BY o_orderpriority
    """,
    "join_bucketed_colocated": f"""
        SELECT o_orderstatus,
               COUNT(*) AS n_lines,
               {oracle_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderstatus
    """,
}
